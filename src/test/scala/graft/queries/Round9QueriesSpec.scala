package graft.queries

import graft.SparkSpec

/** Law-level checks for the round-9 additions (q219–q225) over sf0.001 —
  * the DuckDB oracle pins exact values; these pin the INVARIANTS that make
  * the numbers meaningful (partition laws, conservation, monotonicity). */
class Round9QueriesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("q219: sketch-pair algebra partitions the union and bounds estimates") {
    val rows = run("q219_kmv_set_ops").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nu, nc) = (r.getAs[Long]("n_union_kept"), r.getAs[Long]("n_common"))
      val (na, nb) = (r.getAs[Long]("n_only_a"), r.getAs[Long]("n_only_b"))
      assert(nc + na + nb == nu, s"union partition broken: $r")
      val j = r.getAs[Long]("jaccard_micro")
      assert(j >= 0L && j <= 1000000L, s"jaccard out of range: $r")
      val (u, i) = (r.getAs[Double]("union_est"), r.getAs[Double]("inter_est"))
      assert(u > 0 && i >= 0 && i <= u, s"estimate ordering broken: $r")
      // BELOW capacity the sketch is exact — a true invariant (the
      // saturated estimate is only statistically near the truth)
      if (nu < 256) assert(u == nu.toDouble, s"sub-capacity estimate not exact: $r")
    }
  }

  test("q220: line accounting conserves lines and tokens") {
    val rows = run("q220_line_dedup").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_kept") + r.getAs[Long]("n_removed") ==
        r.getAs[Long]("n_lines"), s"line conservation broken: $r")
      val (tr, nt) = (r.getAs[Long]("tokens_removed"), r.getAs[Long]("n_tokens"))
      assert(tr >= 0 && tr <= nt, s"token accounting broken: $r")
      val ratio = r.getAs[Long]("removed_ratio_micro")
      assert(ratio >= 0L && ratio <= 1000000L, s"ratio out of range: $r")
    }
    // corpus-wide: every line has exactly ONE kept first occurrence, so
    // kept = #distinct line hashes. Cross-checked at the totals level:
    // n_kept summed over sources == distinct hashes globally would need
    // the hash frame; here we at least require some dedup happened on the
    // word-soup corpus only if duplicates exist — kept <= lines always.
    assert(rows.map(_.getAs[Long]("n_kept")).sum <=
      rows.map(_.getAs[Long]("n_lines")).sum)
  }

  test("q221: community rows are well-formed and sorted by size") {
    val rows = run("q221_label_propagation").collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val sizes = rows.map(_.getAs[Long]("n_members"))
    assert(sizes.forall(_ >= 1L))
    assert(sizes.sameElements(sizes.sortBy(-_)), "not size-descending")
    rows.foreach { r =>
      // rep_node is the community's min member id (synthetic ids start at 0)
      assert(r.getAs[Long]("rep_node") >= 0L)
    }
  }

  test("q223: split cells partition the corpus; groups never out-count docs") {
    val rows = run("q223_group_split").collect()
    assert(rows.nonEmpty)
    val splits = rows.map(_.getAs[String]("split")).toSet
    assert(splits.subsetOf(Set("train", "val", "test")), s"bad splits: $splits")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_groups") <= r.getAs[Long]("n_docs"), s"groups>docs: $r")
    }
    val totalDocs = rows.map(_.getAs[Long]("n_docs")).sum
    val expect = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(totalDocs == expect, s"split cells lose docs: $totalDocs != $expect")
  }

  test("q224: negatives are deterministic per anchor and never collide") {
    val rows = run("q224_contrastive_pairs").collect()
    assert(rows.nonEmpty, "no contrastive pairs mined at sf0.001")
    rows.foreach { r =>
      val (a, p, n) = (r.getAs[Long]("anchor"), r.getAs[Long]("positive"),
        r.getAs[Long]("negative"))
      assert(n != a && n != p, s"negative collides: $r")
      assert(r.getAs[Long]("pos_jaccard_micro") >= 200000L, s"weak positive: $r")
    }
    // the negative is a function of the anchor alone
    rows.groupBy(_.getAs[Long]("anchor")).foreach { case (a, rs) =>
      assert(rs.map(_.getAs[Long]("negative")).distinct.length == 1,
        s"anchor $a has multiple negatives")
    }
  }

  test("q225: winnowing pairs are ordered, positive, and within-source") {
    val rows = run("q225_winnowing").collect()
    assert(rows.nonEmpty, "no winnowing overlap pairs at sf0.001")
    rows.foreach { r =>
      assert(r.getAs[Long]("id_a") < r.getAs[Long]("id_b"), s"unordered pair: $r")
      assert(r.getAs[Long]("n_shared_fp") >= 1L, s"empty overlap emitted: $r")
    }
  }

  test("q222: per-source terciles are balanced and score-ordered") {
    val rows = run("q222_perplexity_buckets").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("source")).foreach { case (src, rs) =>
      val byBucket = rs.sortBy(_.getAs[Long]("ppl_bucket"))
      assert(byBucket.map(_.getAs[Long]("ppl_bucket")).toSeq == Seq(1L, 2L, 3L),
        s"$src buckets: ${byBucket.mkString}")
      val counts = byBucket.map(_.getAs[Long]("n_docs"))
      assert(counts.max - counts.min <= 1L, s"$src ntile imbalance: ${counts.toSeq}")
      // bucket 1 = head (highest LM scores): min of a bucket must not be
      // below the max of the next one
      byBucket.sliding(2).foreach { case Array(hi, lo) =>
        assert(hi.getAs[Long]("min_score_micro") >= lo.getAs[Long]("max_score_micro"),
          s"$src bucket ordering broken: $hi vs $lo")
      }
    }
  }
}
