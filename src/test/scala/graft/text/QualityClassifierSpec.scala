package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualityClassifierSpec extends SparkSpec {

  /** Synthetic corpus with a learnable signal: "good" docs are stopword-
    * heavy English prose, "bad" docs are digit-heavy noise. */
  private lazy val docs = {
    import spark.implicits._
    (0 until 60).map { i =>
      if (i % 2 == 0)
        (i.toLong, "the cat and the dog of the house is here to stay", "en", 46L)
      else
        (i.toLong, s"98321 77$i 4411 00 ${i * 7} 991 x", "de", 30L)
    }.toDF("doc_id", "text", "lang", "n_chars")
  }

  test("fitWeights: one row, five finite columns") {
    import spark.implicits._
    val w = QualityClassifier.fitWeights(docs, ($"lang" === "en").cast("int")).collect()
    assert(w.length == 1)
    val vals = (0 until 5).map(w(0).getDouble)
    assert(vals.forall(v => !v.isNaN && !v.isInfinite))
  }

  test("logit folds strictly left-to-right (pinned addition order)") {
    import spark.implicits._
    val row = Seq((2.0, 3.0, 0.5, 1.5, -1.0, 4.0, 10.0, 0.1, 7.0))
      .toDF("i", "w1", "w2", "w3", "w4", "f1", "f2", "f3", "f4")
    val got = row.select(QualityClassifier.logit($"i",
      Seq($"w1", $"w2", $"w3", $"w4"), Seq($"f1", $"f2", $"f3", $"f4"))).head.getDouble(0)
    val expected = (((2.0 + 3.0 * 4.0) + 0.5 * 10.0) + 1.5 * 0.1) + -1.0 * 7.0
    assert(got == expected) // bit-identical, not approx
  }

  test("features: closed-form counts match hand computation") {
    import spark.implicits._
    val one = Seq((1L, "the cat  has 42 of 99", 21L)).toDF("doc_id", "text", "n_chars")
    val fcols = QualityClassifier.features($"text", $"n_chars")
    val r = one.select(fcols.map { case (n, c) => c.as(n) }: _*).head
    assert(r.getDouble(0) == 21.0) // n_chars
    assert(r.getDouble(1) == 6.0)  // tokens, double space dropped
    assert(r.getDouble(2) == 2.0)  // 'the', 'of'
    assert(r.getDouble(3) == 4.0)  // digits 4 2 9 9
  }

  test("the learned filter separates the weak classes") {
    import spark.implicits._
    val w = QualityClassifier.fitWeights(docs, ($"lang" === "en").cast("int"))
    val fcols = QualityClassifier.features($"text", $"n_chars")
    val scored = docs.select($"lang" +: fcols.map { case (n, c) => c.as(n) }: _*)
      .crossJoin(broadcast(w))
      .withColumn("logit", QualityClassifier.logit($"intercept",
        Seq($"w_chars", $"w_toks", $"w_stop", $"w_digit"),
        QualityClassifier.FeatureNames.map(col)))
      .groupBy($"lang").agg(avg($"logit").as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(scored("en") > 0 && scored("de") < 0,
      s"expected separation, got $scored")
  }
}
