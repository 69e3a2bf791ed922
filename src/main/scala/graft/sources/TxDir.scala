package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

/**
 * Poor-man's transactional file publishing for a parquet directory —
 * enough to make streaming ingest and compaction CRASH-CONVERGENT
 * without a full table format:
 *
 * a unit of work (one micro-batch, one file split) publishes its output
 * files under deterministic names `<prefix>-<i>-of-<n>.parquet`. A
 * replay can then decide exactly what happened:
 *
 *  - complete set present  → the work finished; only cleanup remains;
 *  - partial set present   → the work died mid-publish; delete the
 *    partial set and redo (outputs are deterministic, so redo is safe);
 *  - nothing present       → redo from scratch.
 *
 * Single-writer assumption (one maintenance/ingest job per store), the
 * same assumption every file-layout table format makes per commit.
 */
object TxDir {

  private val NamePattern = """(.+)-(\d+)-of-(\d+)\.parquet""".r

  /** Move every data file of `scratch` into `dest` under the prefix.
    * Call only after the scratch content is fully written. */
  def publish(fs: FileSystem, scratch: Path, dest: Path, prefix: String): Unit = {
    val parts = fs.listStatus(scratch).map(_.getPath)
      .filter(p => p.getName.startsWith("part-") && p.getName.endsWith(".parquet"))
      .sortBy(_.getName)
    val n = parts.length
    parts.zipWithIndex.foreach { case (p, i) =>
      fs.rename(p, new Path(dest, s"$prefix-$i-of-$n.parquet"))
    }
    fs.delete(scratch, true)
    ()
  }

  /** Is a complete `<prefix>-*-of-n` set present in `dest`? */
  def isComplete(fs: FileSystem, dest: Path, prefix: String): Boolean = {
    val mine = published(fs, dest, prefix)
    mine.nonEmpty && {
      val n = mine.head._3
      mine.length == n && mine.map(_._2).sorted.sameElements(0 until n)
    }
  }

  /** Remove an incomplete published set (no-op when complete or absent). */
  def cleanPartial(fs: FileSystem, dest: Path, prefix: String): Unit =
    if (!isComplete(fs, dest, prefix)) {
      published(fs, dest, prefix).foreach { case (p, _, _) => fs.delete(p, false) }
    }

  private def published(fs: FileSystem, dest: Path, prefix: String): Array[(Path, Int, Int)] =
    if (!fs.exists(dest)) Array.empty
    else fs.listStatus(dest).map(_.getPath).flatMap { p =>
      p.getName match {
        case NamePattern(pfx, i, n) if pfx == prefix => Some((p, i.toInt, n.toInt))
        case _ => None
      }
    }
}
