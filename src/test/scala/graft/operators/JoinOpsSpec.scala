package graft.operators

import graft.SparkSpec
import scala.util.Random

class JoinOpsSpec extends SparkSpec {

  test("leftAsOf matches the brute-force latest-at-or-before lookup") {
    import spark.implicits._
    val r = new Random(31)
    val left = Seq.tabulate(200)(i => (s"k${r.nextInt(5)}", r.nextInt(1000).toLong, i.toLong))
    val right = Seq.tabulate(60)(i => (s"k${r.nextInt(6)}", r.nextInt(1000).toLong, i * 1.5))
      .groupBy(t => (t._1, t._2)).map(_._2.head).toSeq // unique (key, ts)
    val out = AsOfJoin.leftAsOf(
        left.toDF("k", "ts", "row_id"), right.toDF("k", "ts2", "v"),
        keyCols = Seq("k"), leftTsCol = "ts", rightTsCol = "ts2")
      .select($"row_id", $"v").collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) None else Some(x.getDouble(1)))).toMap
    val expected = left.map { case (k, ts, id) =>
      val cand = right.filter(rr => rr._1 == k && rr._2 <= ts)
      id -> (if (cand.isEmpty) None else Some(cand.maxBy(_._2)._3))
    }.toMap
    assert(out == expected)
  }

  test("native as-of join (custom LogicalPlan/Strategy/Exec) equals the composed operator") {
    import spark.implicits._
    val r = new Random(47)
    val left = Seq.tabulate(300)(i => (s"k${r.nextInt(7)}", r.nextInt(500).toLong, i.toLong))
    val right = Seq.tabulate(80)(i => (s"k${r.nextInt(8)}", r.nextInt(500).toLong, i * 2.5))
      .groupBy(t => (t._1, t._2)).map(_._2.head).toSeq // unique (key, ts)
    val ldf = left.toDF("k", "ts", "row_id")
    val rdf = right.toDF("k", "ts2", "v")
    def collect(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("k", "ts", "row_id").collect().map(_.toSeq).toSeq
    val composed = AsOfJoin.leftAsOf(ldf, rdf, Seq("k"), "ts", "ts2")
    val native = AsOfJoin.leftAsOfNative(ldf, rdf, Seq("k"), "ts", "ts2")
    assert(native.columns.toSeq == composed.columns.toSeq)
    assert(collect(native) == collect(composed))
    // the custom operator really planned: AsOfJoinExec in the physical plan
    assert(native.queryExecution.executedPlan.toString.contains("AsOfJoin"),
      native.queryExecution.executedPlan.toString)
    // null right timestamps: no position, no match — same as composed
    val rNull = (Seq(("k0", Option.empty[Long], 99.0)) ++
      right.map(t => (t._1, Option(t._2), t._3))).toDF("k", "ts2", "v")
    assert(collect(AsOfJoin.leftAsOfNative(ldf, rNull, Seq("k"), "ts", "ts2")) ==
      collect(AsOfJoin.leftAsOf(ldf, rNull, Seq("k"), "ts", "ts2")))
  }

  test("native as-of rejects mismatched key/timestamp types instead of silently unmatching") {
    import spark.implicits._
    val ldf = Seq((1, 10L, "a")).toDF("k", "ts", "x")      // k: int
    val rdfKey = Seq((1L, 5L, 1.0)).toDF("k", "ts2", "v")  // k: bigint
    val eKey = intercept[IllegalArgumentException](
      AsOfJoin.leftAsOfNative(ldf, rdfKey, Seq("k"), "ts", "ts2"))
    assert(eKey.getMessage.contains("key types differ"))
    val rdfTs = Seq((1, 5, 1.0)).toDF("k", "ts2", "v")     // ts2: int vs left bigint
    val eTs = intercept[IllegalArgumentException](
      AsOfJoin.leftAsOfNative(ldf, rdfTs, Seq("k"), "ts", "ts2"))
    assert(eTs.getMessage.contains("timestamp types differ"))
  }

  test("leftAsOf is inclusive at equal timestamps and atomic across payload columns") {
    import spark.implicits._
    val left = Seq(("k", 10L, 1L), ("k", 5L, 2L)).toDF("k", "ts", "row_id")
    // newer right row carries a NULL payload field — ASOF must surface that
    // null, not fall back to the older row's value
    val right = Seq(("k", 10L, Option.empty[Double], "new"), ("k", 1L, Some(9.9), "old"))
      .toDF("k", "ts2", "v", "label")
    val out = AsOfJoin.leftAsOf(left, right, Seq("k"), "ts", "ts2")
      .select($"row_id", $"v", $"label").collect()
      .map(x => x.getLong(0) -> ((if (x.isNullAt(1)) None else Some(x.getDouble(1))), x.getString(2)))
      .toMap
    assert(out(1L) == ((None, "new"))) // ts=10 sees the equal-ts right row, null v included
    assert(out(2L) == ((Some(9.9), "old")))
  }

  test("leftAsOf ignores right rows with null timestamps (no position, no match)") {
    import spark.implicits._
    val left = Seq(("k", 5L, 1L)).toDF("k", "ts", "row_id")
    val right = Seq(("k", Option.empty[Long], 42.0)).toDF("k", "ts2", "v")
    val out = AsOfJoin.leftAsOf(left, right, Seq("k"), "ts", "ts2")
      .select($"row_id", $"v").head
    assert(out.isNullAt(1), "null-ts right row must never be an as-of match")
  }

  test("leftAsOf rejects reserved/colliding column names loudly") {
    import spark.implicits._
    val left = Seq(("k", 5L, 1L)).toDF("k", "ts", "row_id")
    val right = Seq(("k", 1L, 2.0)).toDF("k", "ts2", "ts") // payload named like leftTsCol
    intercept[IllegalArgumentException] {
      AsOfJoin.leftAsOf(left, right, Seq("k"), "ts", "ts2")
    }
  }

  test("pointInInterval matches the brute-force BETWEEN join (intervals spanning buckets)") {
    import spark.implicits._
    val r = new Random(47)
    val pts = Seq.tabulate(300)(i => (s"u${r.nextInt(4)}", i.toLong, r.nextInt(10000).toLong))
    val ivals = Seq.tabulate(40) { i =>
      val st = r.nextInt(9000).toLong
      (s"u${r.nextInt(5)}", i.toLong, st, st + r.nextInt(3000).toLong) // up to 3 buckets at width 1000
    }
    val out = RangeJoin.pointInInterval(
        pts.toDF("u", "pid", "x"), ivals.toDF("u", "iid", "lo", "hi"),
        keyCols = Seq("u"), pointCol = "x", startCol = "lo", endCol = "hi",
        bucketWidth = 1000L)
      .select($"pid", $"iid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val expected = (for {
      (pu, pid, x) <- pts
      (iu, iid, lo, hi) <- ivals
      if pu == iu && x >= lo && x <= hi
    } yield (pid, iid)).toSet
    assert(out == expected)
  }

  test("pointInInterval drops degenerate intervals instead of exploding descending buckets") {
    import spark.implicits._
    val pts = Seq(("u", 1L, 50L)).toDF("u", "pid", "x")
    val bad = Seq(("u", 1L, 100L, 10L)).toDF("u", "iid", "lo", "hi") // end < start
    assert(RangeJoin.pointInInterval(pts, bad, Seq("u"), "x", "lo", "hi", 10L).count() == 0)
  }
}
