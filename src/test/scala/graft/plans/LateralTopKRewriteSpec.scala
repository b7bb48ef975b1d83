package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.Random

/** Safety net for [[LateralTopKRewrite]]: the rule rewrites Catalyst's
  * decorrelated LATERAL-top-1 plan, so its semantics must match the
  * explicit window spelling (the definitional form) on arbitrary data —
  * including ties broken by a unique column, NULL order keys, and
  * customers with no orders. Also pins that a user-written ordered
  * row_number window is NOT touched (its orderSpec is non-empty, the
  * rule's guard). */
class LateralTopKRewriteSpec extends SparkSpec {
  import spark.implicits._

  test("LATERAL top-1 equals the explicit window spelling on random data") {
    val r = new Random(11)
    (1 to 3).foreach { round =>
      val nCust = 40
      val orders = (1 to 400).map { i =>
        (i.toLong, r.nextInt(nCust + 10).toLong, // some custkeys match no customer
          // coarse date grain forces ties; unique orderkey breaks them
          r.nextInt(5).toLong,
          math.round(r.nextDouble() * 10000) / 100.0)
      }.toDF("o_orderkey", "o_custkey", "o_day", "o_total")
      val customers = (0 until nCust).map(_.toLong).toDF("c_custkey")
      orders.createOrReplaceTempView(s"rw_orders_$round")
      customers.createOrReplaceTempView(s"rw_cust_$round")
      val lateral = spark.sql(
        s"""SELECT c.c_custkey, l.o_orderkey, l.o_total
           |FROM rw_cust_$round c,
           |LATERAL (SELECT o_orderkey, o_total FROM rw_orders_$round o
           |         WHERE o.o_custkey = c.c_custkey
           |         ORDER BY o_day DESC, o_orderkey DESC LIMIT 1) AS l
           |""".stripMargin)
      // the rule must have fired: no global range sort on the order keys
      val plan = lateral.queryExecution.executedPlan.toString
      assert(!plan.contains("rangepartitioning(o_day"),
        s"decorrelated global sort survived:\n$plan")
      val window = spark.sql(
        s"""SELECT c.c_custkey, o.o_orderkey, o.o_total
           |FROM rw_cust_$round c JOIN (
           |  SELECT o_custkey, o_orderkey, o_total,
           |    row_number() OVER (PARTITION BY o_custkey
           |                       ORDER BY o_day DESC, o_orderkey DESC) AS rn
           |  FROM rw_orders_$round) o
           |ON o.o_custkey = c.c_custkey AND o.rn = 1""".stripMargin)
      assert(lateral.exceptAll(window).count() == 0 &&
        window.exceptAll(lateral).count() == 0, s"round $round diverged")
    }
  }

  test("a user-written ordered row_number window is untouched by the rule") {
    // pre-sorted input + ordered window: the logical plan is
    // Window(orderSpec=nonEmpty) over Sort(global) — the rule must leave it
    // alone (guard: it only fires on EMPTY orderSpec), and results must be
    // the definitional ranks
    val df = Seq((1L, 3L), (1L, 1L), (1L, 2L), (2L, 9L), (2L, 8L))
      .toDF("k", "v").orderBy($"v".desc)
    val ranked = df.withColumn("rn",
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy($"k").orderBy($"v".asc)))
    val got = ranked.collect().map(x => (x.getLong(0), x.getLong(1), x.getInt(2))).toSet
    assert(got == Set((1L, 1L, 1), (1L, 2L, 2), (1L, 3L, 3), (2L, 8L, 1), (2L, 9L, 2)))
  }
}
