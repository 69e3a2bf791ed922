package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class NfcNormalizeSpec extends SparkSpec {
  import spark.implicits._

  // decomposed inputs spelled with explicit combining-mark escapes so
  // no editor/toolchain can silently precompose them
  private val cases = Seq(
    ("e\u0301", "\u00e9"),  // e + combining acute -> precomposed e-acute
    ("n\u0303", "\u00f1"),  // n + combining tilde -> precomposed n-tilde
    ("A\u030A", "\u00c5"),  // A + combining ring  -> precomposed A-ring
    ("\u00e9", "\u00e9"),  // already precomposed: unchanged
    ("plain ascii", "plain ascii"),
    ("", ""))

  test("composes combining sequences exactly like java.text.Normalizer (codegen path)") {
    val got = cases.map(_._1).toDF("s")
      .select(GraftFunctions.nfc_normalize(col("s")).as("n"))
      .collect().map(_.getString(0))
    assert(got.toSeq === cases.map(_._2))
  }

  test("normalized equality unifies crawler vintages that raw equality misses") {
    // the dedup motivation: same visible text, different byte forms
    val df = Seq(("cafe\u0301 ol\u00e9", 1), ("caf\u00e9 ole\u0301", 2))
      .toDF("text", "src")
    assert(df.select(countDistinct(col("text"))).head().getLong(0) === 2L)
    assert(df.select(countDistinct(
      GraftFunctions.nfc_normalize(col("text")))).head().getLong(0) === 1L)
  }

  test("registered SQL function resolves and character count shrinks") {
    GraftFunctions.register(spark)
    val r = spark.sql("SELECT length('e\u0301') AS a, " +
      "length(nfc_normalize('e\u0301')) AS b").head()
    assert(r.getInt(0) === 2 && r.getInt(1) === 1)
  }
}
