package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.Random

class ShardingSpec extends SparkSpec {

  private def brute(rows: Seq[(Long, Long)], budget: Long): Map[Long, Long] = {
    var cum = 0L
    rows.sortBy(_._1).map { case (id, tok) =>
      val shard = cum / budget
      cum += tok
      id -> shard
    }.toMap
  }

  test("byTokenBudget matches the sequential greedy packing exactly") {
    import spark.implicits._
    val r = new Random(7)
    val rows = Seq.tabulate(500)(i => (i.toLong * 3 + 1, (r.nextInt(400) + 1).toLong))
    val out = Sharding.byTokenBudget(rows.toDF("doc_id", "n_tokens"), budget = 1000L)
      .select($"doc_id", $"shard").collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(out == brute(rows, 1000L))
  }

  test("shard assignment is invariant to the bucket count (partitioning-independent)") {
    import spark.implicits._
    val r = new Random(13)
    val rows = Seq.tabulate(300)(i => (i.toLong * 7, (r.nextInt(300) + 1).toLong))
    val df = rows.toDF("doc_id", "n_tokens")
    val outs = Seq(1, 7, 64, 256).map { nb =>
      Sharding.byTokenBudget(df, budget = 777L, numBuckets = nb)
        .select($"doc_id", $"shard").collect()
        .map(x => x.getLong(0) -> x.getLong(1)).toSortedSeq
    }
    assert(outs.distinct.size == 1)
  }

  test("withTokenOffsets is the exact exclusive running sum in order-key order") {
    import spark.implicits._
    val r = new Random(21)
    val rows = Seq.tabulate(400)(i => (i.toLong * 5 + 2, (r.nextInt(200) + 1).toLong))
    val expected = {
      var cum = 0L
      rows.sortBy(_._1).map { case (id, tok) => val s = cum; cum += tok; id -> s }.toMap
    }
    val out = Sharding.withTokenOffsets(rows.toDF("doc_id", "n_tokens"), numBuckets = 17)
      .select($"doc_id", $"tok_start").collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(out == expected)
  }

  test("null token counts pack as zero tokens; empty input gains a shard column") {
    import spark.implicits._
    val df = Seq((1L, Some(10L)), (2L, Option.empty[Long]), (3L, Some(10L)))
      .toDF("doc_id", "n_tokens")
    val out = Sharding.byTokenBudget(df, budget = 15L)
      .select($"doc_id", $"shard").collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // cum: 0, 10, 10 → shards 0, 0, 0; row 3 starts at 10 < 15
    assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 0L))
    val empty = Seq.empty[(Long, Long)].toDF("doc_id", "n_tokens")
    assert(Sharding.byTokenBudget(empty, 10L).columns.contains("shard"))
  }

  implicit private class Sortable(a: Array[(Long, Long)]) {
    def toSortedSeq: Seq[(Long, Long)] = a.toSeq.sortBy(_._1)
  }
}
