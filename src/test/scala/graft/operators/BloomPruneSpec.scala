package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomPruneSpec extends SparkSpec {

  test("pruned join is row-identical to the plain join") {
    import spark.implicits._
    val fact = (1L to 500L).map(i => (i % 40, i)).toDF("fk", "row_id")
    val dim = Seq((3L, "a"), (7L, "b"), (11L, "c")).toDF("dk", "name")
    val pruned = BloomPrune.prunedJoin(fact, dim, "fk", "dk")
      .select($"row_id", $"name").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val plain = fact.join(dim, $"fk" === $"dk")
      .select($"row_id", $"name").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(pruned == plain && plain.nonEmpty)
  }

  test("prune keeps a superset of matches and drops null keys") {
    import spark.implicits._
    val fact = Seq(Some(1L), Some(2L), None, Some(99L)).toDF("fk")
    val dim = Seq(1L).toDF("dk")
    val kept = BloomPrune.prune(fact, "fk", BloomPrune.build(dim, "dk"))
      .collect().map(r => r.getLong(0)).toSet
    assert(kept.contains(1L))
    assert(!kept.contains(99L) || kept.size <= 2) // 99 survives only as an FP
  }
}
