package graft.plans

import graft.SparkSpec
import org.apache.spark.unsafe.types.UTF8String

class NfcNormalizeSpec extends SparkSpec {

  // spelled as explicit escapes: a raw combining char in source is
  // invisible to review and editors may silently re-normalize it
  private val decomposed = "cafe\u0301 a\u030A" // e + combining acute, a + combining ring
  private val composed = "caf\u00E9 \u00E5"     // precomposed é, å

  test("composes decomposed sequences to canonical form") {
    val nfc = NfcNormalize.normalize(UTF8String.fromString(decomposed)).toString
    assert(nfc == composed)
    assert(nfc.length == decomposed.length - 2)
  }

  test("already-normalized input returns the same instance - no copy") {
    val clean = UTF8String.fromString("plain ascii and " + composed)
    assert(NfcNormalize.normalize(clean) eq clean)
    // idempotence
    val once = NfcNormalize.normalize(UTF8String.fromString(decomposed))
    assert(NfcNormalize.normalize(once) == once)
  }

  test("SQL registration: codegen path over a DataFrame, null passthrough") {
    import spark.implicits._
    Seq((1L, "cafe\u0301"), (2L, "plain"), (3L, null))
      .toDF("id", "s").createOrReplaceTempView("nfc_t")
    val got = spark.sql(
      "SELECT id, nfc_normalize(s) AS n, length(nfc_normalize(s)) AS l " +
        "FROM nfc_t ORDER BY id").collect()
    assert(got(0).getString(1) == "caf\u00E9" && got(0).getInt(2) == 4)
    assert(got(1).getString(1) == "plain")
    assert(got(2).isNullAt(1) && got(2).isNullAt(2))
  }
}
