package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The native `kmv_sketch` TypedImperativeAggregate must be bit-lockstep
  * with the DataFrame spelling (`Kmv.sketchState`) — same md5-60 hash,
  * same bounded bottom-k state, same (n_kept, kth_hash) result. */
class KmvNativeSpec extends SparkSpec {

  private def native(df: org.apache.spark.sql.DataFrame, k: Int): Map[String, (Long, Long)] = {
    df.createOrReplaceTempView("kmv_native_in")
    spark.sql(s"""SELECT key, kmv_sketch(CAST(v AS STRING), $k) AS sk
                  FROM kmv_native_in WHERE v IS NOT NULL GROUP BY key""")
      .select(col("key"), col("sk.n_kept"), col("sk.kth_hash"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
  }

  private def dataframe(df: org.apache.spark.sql.DataFrame, k: Int): Map[String, (Long, Long)] =
    graft.sketch.Kmv.sketchState(df, "key", "v", k)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("native == DataFrame sketch across full and under-capacity groups") {
    import spark.implicits._
    // group a: 5000 distinct values (sketch saturates at k=64);
    // group b: 20 distinct with duplicates (exact path, n_kept = 20)
    val rows = (0 until 5000).map(i => ("a", s"u$i")) ++
      (0 until 200).map(i => ("b", s"x${i % 20}"))
    val df = rows.toDF("key", "v").repartition(8) // force partial + merge + serialize
    val n = native(df, 64)
    val d = dataframe(df, 64)
    assert(n == d)
    assert(n("a")._1 == 64L && n("b")._1 == 20L)
  }

  test("estimate lands near the true distinct count at k=64") {
    import spark.implicits._
    val df = (0 until 5000).map(i => ("a", s"u$i")).toDF("key", "v")
    df.createOrReplaceTempView("kmv_native_in")
    val est = spark.sql("""SELECT kmv_sketch(CAST(v AS STRING), 64) AS sk
                           FROM kmv_native_in GROUP BY key""")
      .select(graft.sketch.Kmv.estimate(col("sk.n_kept"), col("sk.kth_hash"), 64))
      .head.getDouble(0)
    assert(math.abs(est - 5000.0) / 5000.0 < 0.30, s"estimate $est")
  }

  test("nulls drop; all-null group yields (0, null); k must be literal int") {
    import spark.implicits._
    val df = Seq(("a", Some("x")), ("a", None), ("b", None))
      .toDF("key", "v")
    df.createOrReplaceTempView("kmv_native_in")
    val out = spark.sql("""SELECT key, kmv_sketch(v, 4) AS sk
                           FROM kmv_native_in GROUP BY key""")
      .select(col("key"), col("sk.n_kept"), col("sk.kth_hash"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.isNullAt(2))).toMap
    assert(out("a") == (1L, false) && out("b") == (0L, true))
    val err = intercept[Exception] {
      spark.sql("SELECT kmv_sketch(CAST(v AS STRING), 1) FROM kmv_native_in").collect()
    }
    assert(err.getMessage.contains("k must be"))
  }
}
