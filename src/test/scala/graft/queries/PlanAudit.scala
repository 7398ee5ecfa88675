package graft.queries

import graft.SparkSpec

/** Ad-hoc plan audit (run via testOnly); prints join/exchange skeletons
  * of the newest queries so plan regressions are visible in CI output.
  */
class PlanAudit extends SparkSpec {
  test("plan audit: new operators have no quadratic joins and bounded shuffles") {
    for (q <- Seq("dedup_embedding_cosine", "q_asof_forward", "text_token_entropy",
        "q_rolling_sum", "dedup_ngram_jaccard")) {
      val df = graft.SparkEntry.queries(q)(spark, Sf)
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$q must not plan a quadratic join:\n$p")
      val shuffles = "Exchange".r.findAllIn(p).size
      info(s"$q: exchanges=$shuffles")
      info(p.linesIterator.filter(l => l.contains("Join") || l.contains("Exchange"))
        .map(_.trim.replaceAll("\\[.*", "")).mkString(" | "))
    }
  }
}
