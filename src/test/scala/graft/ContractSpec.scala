package graft

/**
 * Guards the driver contract: the oracle map must reference real
 * queries, rows-only queries are a known closed set, and every
 * registered query must at least execute and produce its schema on the
 * smallest scale factor (catching per-query runtime breakage before
 * the driver's gate does).
 */
class ContractSpec extends SparkSpec {

  // empty since round 4: even the approximate LSH path is oracle-gated
  // (md5-derived hyperplanes are reproducible in DuckDB SQL)
  private val rowsOnlyByDesign = Set.empty[String]

  test("every oracle entry has a registered query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("every query is oracle-gated unless explicitly rows-only") {
    val ungated = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(ungated === rowsOnlyByDesign, s"unexpected rows-only queries: $ungated")
  }

  test("every registered query executes at sf0.001 (schema + evaluation)") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val df = fn(spark, sf())
        assert(df.schema.nonEmpty)
        df.count() // force evaluation
        None
      } catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("entry() smoke returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
