package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class PerceptronSpec extends SparkSpec {

  private lazy val docs =
    spark.read.parquet(s"${sf("sf0.01")}/documents.parquet")

  private lazy val trained = Perceptron.ipmTrain(docs)

  test("ipmTrain genuinely learns the targeting task: accuracy well above " +
    "the majority class (measured 486/500 vs majority 385)") {
    val scored = Perceptron.score(docs, trained)
    val n = scored.count()
    val correct = scored.agg(sum("correct")).head().getLong(0)
    val majority = math.max(
      scored.filter(col("label") === 1).count(),
      scored.filter(col("label") === -1).count())
    assert(n === 500L)
    assert(correct >= (n * 95) / 100, s"accuracy $correct/$n")
    assert(correct > majority + 50,
      s"no better than majority: $correct vs $majority")
  }

  test("the learned model is interpretable: the target term's bucket " +
    "carries the largest positive weight") {
    val sparkBucket = {
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest("pc:spark".getBytes("UTF-8"))
      val hex = md5.map("%02x".format(_)).mkString.substring(0, 15)
      (java.lang.Long.parseLong(hex, 16) % Perceptron.Buckets).toInt
    }
    assert(trained(sparkBucket) === trained.max,
      s"expected bucket $sparkBucket maximal")
    assert(trained(Perceptron.Buckets) < 0, "bias should be negative " +
      "(absent target term predicts the negative class)")
  }

  test("training is partitioning-independent: logical doc_id shards, " +
    "not physical partitions, define the fold order") {
    val shuffled = docs.repartition(17, col("source")).sortWithinPartitions("n_chars")
    assert(Perceptron.ipmTrain(shuffled).toSeq === trained.toSeq)
  }

  test("mixing average is exact: every weight is a multiple of " +
    "step/shards = 128") {
    assert(trained.forall(_ % 128L === 0L))
  }

  test("the feature checkpoint is released on return — no leaked blocks") {
    val before = CheckpointScope.liveCount
    Perceptron.ipmTrain(docs)
    assert(CheckpointScope.liveCount === before)
  }
}
