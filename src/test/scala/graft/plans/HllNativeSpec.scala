package graft.plans

import java.security.MessageDigest

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The native `hll_sketch` TypedImperativeAggregate must reproduce a
  * straight-line reference recompute of the same spec (md5-60 hash, top-p
  * bucket, rho over the suffix, elementwise-max registers, integer
  * harmonic key estimator) — and must be invariant to partitioning,
  * which exercises partial aggregation, merge, and serde. */
class HllNativeSpec extends SparkSpec {

  private def md5Bucket60(s: String): Long = {
    val h = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (h(i) & 0xffL); i += 1 }
    (v << 4) | ((h(7) & 0xf0L) >> 4)
  }

  /** Reference HLL over plain Scala collections — same arithmetic, no Spark. */
  private def reference(values: Seq[String], p: Int): (String, Double) = {
    val m = 1 << p
    val w = 60 - p
    val regs = new Array[Int](m)
    values.foreach { s =>
      val h = md5Bucket60(s)
      val bucket = (h >>> w).toInt
      val suffix = h & ((1L << w) - 1)
      val rho =
        if (suffix == 0L) w + 1
        else w - (64 - java.lang.Long.numberOfLeadingZeros(suffix)) + 1
      if (rho > regs(bucket)) regs(bucket) = rho
    }
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    var harmKey = 0L
    var zeros = 0
    regs.foreach { r => harmKey += 1L << (w + 1 - r); if (r == 0) zeros += 1 }
    val raw = alpha * (m.toDouble * m.toDouble) *
      (1L << (w + 1)).toDouble / harmKey.toDouble
    val est =
      if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
      else raw
    (regs.mkString(","), est)
  }

  private def native(rows: Seq[(String, String)], p: Int): Map[String, (String, Double)] = {
    import spark.implicits._
    rows.toDF("key", "v").repartition(8) // force partial + merge + serialize
      .createOrReplaceTempView("hll_native_in")
    spark.sql(s"""SELECT key, hll_sketch(v, $p) AS sk
                  FROM hll_native_in GROUP BY key""")
      .select(col("key"), col("sk.registers"), col("sk.estimate"))
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getDouble(2))).toMap
  }

  test("bit-lockstep with the reference recompute, dense and sparse groups") {
    val dense = (0 until 5000).map(i => s"u$i")
    val sparse = (0 until 300).map(i => s"x${i % 7}") // 7 distinct, duplicated
    val out = native(dense.map(("a", _)) ++ sparse.map(("b", _)), 6)
    assert(out("a") == reference(dense, 6))
    assert(out("b") == reference(sparse.distinct, 6)) // dups must not move registers
    // sparse group takes the linear-counting branch and lands near 7
    assert(math.abs(out("b")._2 - 7.0) < 3.0, s"sparse estimate ${out("b")._2}")
  }

  test("estimate within HLL error bounds at p=8 (m=256, ~6.5% stderr)") {
    val n = 20000
    val out = native((0 until n).map(i => ("a", s"user-$i")), 8)
    val est = out("a")._2
    assert(math.abs(est - n) / n < 0.20, s"estimate $est for $n distinct")
  }

  test("partitioning-invariant: 1-partition and 32-partition runs agree") {
    import spark.implicits._
    val rows = (0 until 3000).map(i => ("k", s"v${i % 997}"))
    def run(parts: Int): (String, Double) = {
      rows.toDF("key", "v").repartition(parts)
        .createOrReplaceTempView("hll_native_in")
      spark.sql("""SELECT key, hll_sketch(v, 5) AS sk
                   FROM hll_native_in GROUP BY key""")
        .select(col("sk.registers"), col("sk.estimate"))
        .collect().map(r => (r.getString(0), r.getDouble(1))).head
    }
    assert(run(1) == run(32))
  }

  test("nulls drop; empty group estimates 0; p must be a literal in [4,12]") {
    import spark.implicits._
    Seq(("a", Some("x")), ("a", None), ("b", None)).toDF("key", "v")
      .createOrReplaceTempView("hll_native_in")
    val out = spark.sql("""SELECT key, hll_sketch(v, 4) AS sk
                           FROM hll_native_in GROUP BY key""")
      .select(col("key"), col("sk.estimate"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out("a") > 0.0 && out("b") == 0.0)
    val err = intercept[Exception] {
      spark.sql("SELECT hll_sketch(v, 2) FROM hll_native_in").collect()
    }
    assert(err.getMessage.contains("p must be"))
  }
}
