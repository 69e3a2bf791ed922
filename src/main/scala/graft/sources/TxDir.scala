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

  /** Move every data file of `scratch` into `dest` under the prefix,
    * then return the published file names. Call only after the scratch
    * content is fully written. Rename failures throw — silently
    * dropping a batch is never acceptable — and the scratch dir is only
    * removed once every rename succeeded. */
  def publish(fs: FileSystem, scratch: Path, dest: Path, prefix: String): Seq[String] = {
    val parts = fs.listStatus(scratch).map(_.getPath)
      .filter(p => p.getName.startsWith("part-") && p.getName.endsWith(".parquet"))
      .sortBy(_.getName)
    val n = parts.length
    fs.mkdirs(dest) // HDFS rename into a missing parent returns false
    val names = parts.zipWithIndex.map { case (p, i) =>
      val target = new Path(dest, s"$prefix-$i-of-$n.parquet")
      if (!fs.rename(p, target))
        throw new java.io.IOException(s"TxDir.publish: rename $p -> $target failed")
      target.getName
    }
    fs.delete(scratch, true)
    names.toSeq
  }

  /** Is a complete `<prefix>-*-of-n` set present in `dest`? All members
    * must agree on `n` (a stale file from an older generation that a
    * failed delete left behind must not validate a newer partial set). */
  def isComplete(fs: FileSystem, dest: Path, prefix: String): Boolean = {
    val mine = published(fs, dest, prefix)
    mine.nonEmpty && {
      val n = mine.head._3
      mine.forall(_._3 == n) && mine.length == n &&
        mine.map(_._2).distinct.sorted.sameElements(0 until n)
    }
  }

  /** File names of a published set (complete or not). */
  def publishedNames(fs: FileSystem, dest: Path, prefix: String): Seq[String] =
    published(fs, dest, prefix).map(_._1.getName).toSeq

  /** Remove an incomplete published set (no-op when complete or absent). */
  def cleanPartial(fs: FileSystem, dest: Path, prefix: String): Unit =
    if (!isComplete(fs, dest, prefix)) {
      published(fs, dest, prefix).foreach { case (p, _, _) => fs.delete(p, false) }
    }

  /** ONE-LISTING view of every published set in `dest`: prefix → member
    * (name, i, n) triples. Maintenance sweeps that touch many prefixes
    * must use this instead of per-prefix [[isComplete]]/[[cleanPartial]]
    * — those re-list the directory per call, O(files²) at store scale. */
  def allSets(fs: FileSystem, dest: Path): Map[String, Seq[(String, Int, Int)]] =
    if (!fs.exists(dest)) Map.empty
    else fs.listStatus(dest).map(_.getPath.getName).toSeq
      .flatMap {
        case n @ NamePattern(pfx, i, c) => Some((pfx, (n, i.toInt, c.toInt)))
        case _ => None
      }
      .groupMap(_._1)(_._2)

  /** The complete sets among [[allSets]] output (same rule as
    * [[isComplete]]: all members agree on n, exactly 0..n-1 present). */
  def completePrefixes(sets: Map[String, Seq[(String, Int, Int)]]): Set[String] =
    sets.collect { case (pfx, members) if {
      val n = members.head._3
      members.forall(_._3 == n) && members.length == n &&
        members.map(_._2).distinct.sorted == (0 until n).toList
    } => pfx }.toSet

  private def published(fs: FileSystem, dest: Path, prefix: String): Array[(Path, Int, Int)] =
    if (!fs.exists(dest)) Array.empty
    else fs.listStatus(dest).map(_.getPath).flatMap { p =>
      p.getName match {
        case NamePattern(pfx, i, n) if pfx == prefix => Some((p, i.toInt, n.toInt))
        case _ => None
      }
    }
}
