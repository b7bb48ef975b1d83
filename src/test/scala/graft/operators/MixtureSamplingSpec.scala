package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.security.MessageDigest
import scala.util.Random

/** Mixture sampling vs a driver-side brute replay: per-source budgets split
  * by integer weight arithmetic, md5-priority fill order, exclusive-prefix
  * cutoff — plus the partitioning-independence invariant (the bucketed
  * two-level windows must equal the single-window semantics). */
class MixtureSamplingSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Brute-force reference: rank in (md5, id) order per source, take while
    * the exclusive token prefix is under the source budget. */
  private def brute(rows: Seq[(String, Long, Long)], weights: Map[String, Long],
                    total: Long): Set[Long] = {
    val sumW = weights.values.sum
    rows.groupBy(_._1).flatMap { case (src, docs) =>
      val budget = total * weights.getOrElse(src, 0L) / sumW
      var cum = 0L
      docs.sortBy { case (_, id, _) => (md5hex(s"mx|$id"), id) }.flatMap {
        case (_, id, tok) =>
          val keep = cum < budget
          cum += tok
          if (keep) Some(id) else None
      }
    }.toSet
  }

  private def mkRows(n: Int, seed: Int): Seq[(String, Long, Long)] = {
    val r = new Random(seed)
    Seq.tabulate(n)(i => (s"src${i % 5}", i.toLong * 3 + 1, (r.nextInt(200) + 1).toLong))
  }

  test("byWeights matches the per-source greedy md5-priority fill exactly") {
    val rows = mkRows(400, 11)
    val weights = Map("src0" -> 4L, "src1" -> 3L, "src2" -> 2L, "src3" -> 1L, "src4" -> 5L)
    val out = MixtureSampling.byWeights(
        rows.toDF("source", "doc_id", "n_tokens"),
        weights.toSeq.toDF("source", "wt"), totalBudget = 20000L)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(out == brute(rows, weights, 20000L))
  }

  test("selection is invariant to the bucket count (partitioning-independent)") {
    val rows = mkRows(300, 23)
    val w = Seq(("src0", 1L), ("src1", 2L), ("src2", 3L), ("src3", 1L), ("src4", 2L))
      .toDF("source", "wt")
    val df = rows.toDF("source", "doc_id", "n_tokens")
    val outs = Seq(1, 3, 16, 256).map { nb =>
      MixtureSampling.byWeights(df, w, totalBudget = 9000L, numBuckets = nb)
        .select($"doc_id").collect().map(_.getLong(0)).toSet
    }
    assert(outs.distinct.size == 1)
  }

  test("unweighted sources drop out; zero-weight total refuses loudly") {
    val rows = Seq(("a", 1L, 10L), ("b", 2L, 10L))
    val out = MixtureSampling.byWeights(
        rows.toDF("source", "doc_id", "n_tokens"),
        Seq(("a", 1L)).toDF("source", "wt"), totalBudget = 100L)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(out == Set(1L))
    val e = intercept[IllegalArgumentException] {
      MixtureSampling.byWeights(rows.toDF("source", "doc_id", "n_tokens"),
        Seq(("a", 0L)).toDF("source", "wt"), totalBudget = 100L)
    }
    assert(e.getMessage.contains("weights"))
  }

  test("selection is monotone in the total budget (a bigger budget only adds docs)") {
    val rows = mkRows(300, 47)
    val w = Seq(("src0", 3L), ("src1", 1L), ("src2", 2L), ("src3", 1L), ("src4", 1L))
      .toDF("source", "wt")
    val df = rows.toDF("source", "doc_id", "n_tokens")
    val picks = Seq(4000L, 8000L, 16000L, 32000L).map { b =>
      MixtureSampling.byWeights(df, w, totalBudget = b)
        .select($"doc_id").collect().map(_.getLong(0)).toSet
    }
    picks.sliding(2).foreach { case Seq(small, big) =>
      assert(small.subsetOf(big),
        s"budget increase dropped docs: ${small -- big}")
    }
  }

  test("each selected source overshoots its budget by at most one document") {
    val rows = mkRows(400, 31)
    val weights = Seq(("src0", 2L), ("src1", 1L), ("src2", 1L), ("src3", 3L), ("src4", 1L))
    val sel = MixtureSampling.byWeights(
        rows.toDF("source", "doc_id", "n_tokens"),
        weights.toDF("source", "wt"), totalBudget = 12000L)
      .groupBy($"source", $"budget_toks")
      .agg(sum($"n_tokens").as("tok"), max($"n_tokens").as("mx"))
      .collect()
    sel.foreach { r =>
      assert(r.getLong(2) - r.getLong(3) < r.getLong(1),
        s"source ${r.getString(0)} filled past budget+1 doc: $r")
    }
  }
}
