package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class JoinOpsSpec extends SparkSpec {

  test("asof: matches latest right at-or-before left, inclusive, per key") {
    import spark.implicits._
    val left = Seq((1L, 100L, 10L), (1L, 205L, 11L), (2L, 50L, 12L), (3L, 10L, 13L))
      .toDF("k", "ts", "l_id")
    val right = Seq((1L, 100L, 500L), (1L, 200L, 501L), (1L, 300L, 502L), (2L, 60L, 503L))
      .toDF("k", "ts", "r_id")
    val got = AsOfJoin.asof(left, right, "k", "ts", "r_id")
      .select("l_id", "r_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got === Map(
      10L -> 500L, // simultaneous right matches (inclusive)
      11L -> 501L, // latest at-or-before 205
      12L -> -1L,  // right exists only later
      13L -> -1L)) // no right rows for key 3
  }

  test("asof: same-(key,ts) right duplicates resolve to the greatest value") {
    import spark.implicits._
    val left = Seq((1L, 100L, 10L)).toDF("k", "ts", "l_id")
    val right = Seq((1L, 90L, 7L), (1L, 90L, 9L), (1L, 90L, 8L)).toDF("k", "ts", "r_id")
    val got = AsOfJoin.asof(left, right, "k", "ts", "r_id").select("r_id").head().getLong(0)
    assert(got === 9L)
  }

  test("asofForward: earliest right at-or-after, inclusive; equal-ts ties take the greatest") {
    import spark.implicits._
    val left = Seq((1L, 100L, 10L), (1L, 205L, 11L), (2L, 70L, 12L), (3L, 10L, 13L))
      .toDF("k", "ts", "l_id")
    val right = Seq((1L, 100L, 500L), (1L, 100L, 499L), (1L, 300L, 502L), (2L, 60L, 503L))
      .toDF("k", "ts", "r_id")
    val got = AsOfJoin.asofForward(left, right, "k", "ts", "r_id")
      .select("l_id", "r_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got === Map(
      10L -> 500L, // simultaneous matches (inclusive), max value on the tie
      11L -> 502L, // earliest at-or-after 205
      12L -> -1L,  // right exists only earlier
      13L -> -1L)) // no right rows for key 3
  }

  test("asofTolerance: nearest-behind match nulled beyond the tolerance") {
    import spark.implicits._
    val left = Seq((1L, 100L, 10L), (1L, 500L, 11L), (1L, 130L, 12L))
      .toDF("k", "ts", "l_id")
    val right = Seq((1L, 90L, 7L), (1L, 120L, 8L)).toDF("k", "ts", "r_id")
    val got = AsOfJoin.asofTolerance(left, right, "k", "ts", "r_id", tol = 50L)
      .select("l_id", "r_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got === Map(
      10L -> 7L,  // 100-90=10 within 50
      11L -> -1L, // nearest behind is 120, but 380 > 50 → null
      12L -> 8L)) // 130-120=10 within 50
  }

  test("asofLookup past the literal cap takes the chunked broadcast path, same results") {
    import spark.implicits._
    val stats = (0 until 100).map(i => i.toLong * 10).toDF("bucket_key")
    val probes = (0 until 500).map(i => i.toLong * 2 - 5).toDF("zkey")
    def run(df: org.apache.spark.sql.DataFrame) =
      df.select("zkey", "bucket_key").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
        .sortBy(_._1).toSeq
    val literal = graft.sources.StatsTable.asofLookup(
      spark, probes, "zkey", stats, "bucket_key")
    val chunked = graft.sources.StatsTable.asofLookup(
      spark, probes, "zkey", stats, "bucket_key", maxLiteralKeys = 8)
    assert(run(chunked) === run(literal))
    // below-minimum probes are null on both paths
    assert(run(chunked).head._2 === -1L)
    // the fallback routes via a broadcast EQUALITY join — never a
    // nested loop — and keeps the floor search in SortedFloor
    val plan = chunked.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("sorted_floor"), plan)
  }

  test("intervalJoin equals the naive overlap join, each pair exactly once") {
    import spark.implicits._
    // deterministic variable-length intervals, many sharing grid cells
    val mk = (n: Int, tag: Long) => (0 until n).map { i =>
      val s = (i * 37L + tag * 11L) % 500L
      (i.toLong % 5L, tag * 1000L + i, s, s + (i * 13L + tag) % 90L)
    }
    val left = mk(60, 1).toDF("k", "id", "s", "e")
    val right = mk(60, 2).toDF("k", "id", "s", "e")
    val got = RangeJoin.intervalJoin(
        left.withColumnRenamed("id", "l_id")
          .withColumnRenamed("s", "ls").withColumnRenamed("e", "le"),
        right.withColumnRenamed("id", "r_id")
          .withColumnRenamed("s", "rs").withColumnRenamed("e", "re"),
        "k", "ls", "le", "rs", "re", cellWidth = 64L)
      .select("l_id", "r_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val naive = left.as("a").join(right.as("b"),
        col("a.k") === col("b.k") &&
          col("a.s") <= col("b.e") && col("b.s") <= col("a.e"))
      .select(col("a.id"), col("b.id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length === naive.length, "no duplicate pair from multi-cell overlap")
    assert(got.toSet === naive.toSet)
    assert(naive.nonEmpty)
  }

  test("band join equals the naive quadratic definition on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val l = (1 to 300).map(i => (rnd.nextInt(5).toLong, rnd.nextInt(10000).toLong, i.toLong))
    val r = (1 to 300).map(i => (rnd.nextInt(5).toLong, rnd.nextInt(10000).toLong, 1000L + i))
    val tol = 137L
    val expect = (for {
      (lk, lt, lid) <- l
      (rk, rt, rid) <- r
      if lk == rk && math.abs(lt - rt) <= tol
    } yield (lid, rid)).toSet
    val got = RangeJoin.bandJoin(
        l.toDF("k", "lts", "l_id"), r.toDF("k", "rts", "r_id"), "k", "lts", "rts", tol)
      .select("l_id", "r_id").collect()
      .map(row => (row.getLong(0), row.getLong(1))).toSet
    assert(got === expect)
    assert(got.nonEmpty)
  }

  test("chunking: windows cover all tokens with the configured overlap") {
    import spark.implicits._
    val df = Seq((1L, (1 to 95).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    val chunks = TextAnalysis.chunk(df, window = 50, stride = 40)
      .orderBy("chunk_idx").collect()
    assert(chunks.length === 3) // starts 0, 40, 80
    assert(chunks.map(_.getLong(3)).toSeq === Seq(50L, 50L, 15L))
    // overlap: chunk 1 starts at token 41
    assert(chunks(1).getString(2).startsWith("w41 "))
    // full coverage: last token present in the last chunk
    assert(chunks(2).getString(2).endsWith("w95"))
  }
}
