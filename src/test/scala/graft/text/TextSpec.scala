package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextSpec extends SparkSpec {

  test("token / subword counting") {
    import spark.implicits._
    val df = Seq(("a bb  ccc", 1L), ("", 2L), ("supercalifragilistic word", 3L))
      .toDF("text", "id")
    val out = df.select($"id", TextFunctions.tokenCount($"text").as("n"),
      TextFunctions.subwordCountEstimate($"text").as("sw"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(out(1L) == ((3, 3)))         // a, bb, ccc → 1 subword each
    assert(out(2L) == ((0, 0)))
    assert(out(3L) == ((2, 6)))         // ceil(20/4)=5 + 1
  }

  test("bigrams: ordered, non-distinct, lowercased; short docs empty") {
    import spark.implicits._
    val df = Seq(("Go go Go go", 1L), ("one", 2L), ("", 3L)).toDF("text", "id")
    val out = df.select($"id", TextFunctions.bigrams($"text").as("bg"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out(1L) == Seq("go go", "go go", "go go")) // multiplicity kept
    assert(out(2L).isEmpty && out(3L).isEmpty)
  }

  test("quality signals: punctuation and stopwords") {
    import spark.implicits._
    val clean = "the cat and the dog of the house"
    val noisy = "@@@@ !!!! ####"
    val df = Seq(clean, noisy).toDF("text")
    val rows = df.select($"text", TextFunctions.punctRatio($"text").as("p"),
      TextFunctions.stopwordRatio($"text").as("s"),
      TextFunctions.qualityScore($"text").as("q")).collect()
    val byText = rows.map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(byText(clean)._1 == 0.0 && byText(clean)._2 > 0.4)
    assert(byText(noisy)._1 > 0.8 && byText(noisy)._2 == 0.0)
    assert(byText(clean)._3 > byText(noisy)._3) // quality orders correctly
  }

  test("language ID picks the dominant stopword family") {
    import spark.implicits._
    val df = Seq(
      ("the cat and the dog is big", "en"),
      ("der hund und die katze ist da", "de"),
      ("le chat et les chiens des rues", "fr"),
      ("el gato y los perros que corren", "es")).toDF("text", "want")
    val got = df.select(TextFunctions.langId($"text"), $"want").collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1), r.toString))
  }

  test("pii redaction scrubs emails before digit runs") {
    import spark.implicits._
    val df = Seq("mail me at jane.doe99@corp.example or call 12345678 x9")
      .toDF("text")
      .select(TextFunctions.redactPii($"text").as("clean"),
        TextFunctions.countEmails($"text").as("n"))
    val r = df.collect().head
    assert(r.getString(0) == "mail me at <EMAIL> or call <NUM> x9")
    assert(r.getInt(1) == 1)
  }

  test("rolling hash: deterministic, order-sensitive, spreads") {
    val a = TextFunctions.rollingHash("hello world")
    assert(a == TextFunctions.rollingHash("hello world"))
    assert(a != TextFunctions.rollingHash("world hello"))
    assert(TextFunctions.rollingHash("") == 0L)
    // distinct inputs rarely collide
    val hs = (1 to 1000).map(i => TextFunctions.rollingHash(s"doc $i")).distinct
    assert(hs.length == 1000)
  }
}
