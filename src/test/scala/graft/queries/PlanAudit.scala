package graft.queries

import graft.SparkSpec

/** Ad-hoc plan audit (run via testOnly); prints join/exchange skeletons
  * of the newest queries so plan regressions are visible in CI output.
  */
class PlanAudit extends SparkSpec {
  // generous ceilings (planner/AQE changes can shift counts by one or
  // two) — they exist to catch a *structural* regression, e.g. a lost
  // broadcast turning into extra shuffles or a new unintended distinct
  private val ExchangeCeilings = Map(
    "q_asof_forward" -> 4,
    "q_asof_join" -> 4,
    "q_rolling_sum" -> 4,
    "q_latest_per_key" -> 4,
    "text_token_entropy" -> 8,
    "dedup_embedding_cosine" -> 10,
    "dedup_ngram_jaccard" -> 40, // full lineage incl. uncached shared-shingle subplans
    "q_bloom_join" -> 6,
    "q_outer_join" -> 6,
    // round-4 additions
    "dedup_substring" -> 8,      // window explode + inverted-index self-join + pair agg
    "dedup_decontaminate" -> 8,  // asymmetric window join (bench side broadcastable)
    "text_stratified_sample" -> 2, // pure scan-speed predicate; orderBy only
    "text_unigram_score" -> 8,   // vocab count + tok⋈prob join + per-doc agg
    "corpus_curation" -> 8,      // filter chain + dedup window + survivor join
    "q_topk_per_key" -> 3)       // partial → key exchange → final → orderBy range exchange

  test("plan audit: no quadratic joins; shuffle counts within pinned ceilings") {
    for ((q, ceiling) <- ExchangeCeilings.toSeq.sortBy(_._1)) {
      val df = graft.SparkEntry.queries(q)(spark, Sf)
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$q must not plan a quadratic join:\n$p")
      val shuffles = "Exchange".r.findAllIn(p).size
      info(s"$q: exchanges=$shuffles (ceiling $ceiling)")
      assert(shuffles <= ceiling,
        s"$q plans $shuffles exchanges, ceiling $ceiling — structural plan regression:\n$p")
    }
  }
}
