package graft.operators

import java.util.concurrent.ConcurrentHashMap

/**
 * Per-process memo of materialized parquet tables keyed by an opaque
 * caller-supplied key — the "compute once, consume many times" seam
 * behind [[Dedup.sharedClusters]] and [[Similarity.sharedKnnJoin]].
 *
 * STALENESS CONTRACT: the memo trusts the key ALONE — it never
 * inspects the data. A fresh process always recomputes, but WITHIN one
 * process the first result for a key is served forever: if the corpus
 * behind a key changes (data rewritten at the same path, or a
 * different DataFrame passed with the same key), the caller MUST
 * supply a new key (e.g. append a version/snapshot id) or stale
 * results are returned by design.
 *
 * Concurrency: `computeIfAbsent` only constructs a cheap holder under
 * the map's bin lock; the Spark job runs on first `path` access,
 * guarded by that holder's own lazy-val lock — so two first-consumers
 * of DIFFERENT keys never serialize behind each other's jobs, while
 * two first-consumers of the SAME key still compute exactly once.
 */
private[graft] final class TableMemo(prefix: String) {
  final class Holder(compute: () => String) {
    lazy val path: String = compute()
  }

  private[graft] val entries = new ConcurrentHashMap[String, Holder]()

  /** Number of memo entries whose key starts with `keyPrefix` (spec hook). */
  private[graft] def countKeys(keyPrefix: String): Long =
    entries.entrySet().stream().filter(e => e.getKey.startsWith(keyPrefix)).count()

  /** Materialized path for `key`, if any (spec hook). */
  private[graft] def pathOf(key: String): Option[String] =
    Option(entries.get(key)).map(_.path)

  /** Path of the memoized table for `key`, computing + writing it on
    * first access via `write(dir)` into a fresh tmpdir (deleted on JVM
    * exit). */
  def getOrCreate(key: String)(write: String => Unit): String =
    entries.computeIfAbsent(key, { _ =>
      new Holder(() => {
        val dir = java.nio.file.Files.createTempDirectory(prefix)
        sys.addShutdownHook {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
            .foreach(p => java.nio.file.Files.deleteIfExists(p))
        }
        write(dir.toString)
        dir.toString
      })
    }).path
}
