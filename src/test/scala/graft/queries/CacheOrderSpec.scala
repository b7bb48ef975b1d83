package graft.queries

import graft.SparkSpec

/** Bench-order independence of the session-cache web (`cachedFrame`): in
  * bench (lexicographic) order the calibration query q145 runs FIRST and
  * triggers the shingle→signature→candidate builds that q35 then consumes
  * — but nothing may DEPEND on that order. This suite runs the consumer
  * (q35) before its builder sibling (q145) against an sf dir no other
  * suite touches (so the caches are genuinely cold here) and asserts both
  * stay green and agree on the candidate pair set. Protects the cache web
  * from order coupling as queries keep growing. */
class CacheOrderSpec extends SparkSpec {

  // sf0.01, not the usual sf0.001: cachedFrame keys on (name, session, dir),
  // and every other suite exercises sf0.001 — this dir's caches are cold
  // when this suite runs, whatever the suite order.
  private val sf = "/root/testdata/sf0.01"

  test("q35 (cache consumer) runs green BEFORE q145 (its bench-order builder)") {
    val p35 = graft.SparkEntry.queries("q35_dedup_minhash")(spark, sf)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p35.nonEmpty, "q35 found no candidate pairs at sf0.01")

    val p145 = graft.SparkEntry.queries("q145_minhash_est")(spark, sf)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // q145 rescores exactly the shared candidate set — consumer-first must
    // not change what the builder later sees
    assert(p145 == p35, s"pair sets diverge: only-35=${p35 -- p145}, only-145=${p145 -- p35}")
  }
}
