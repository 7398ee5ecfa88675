package graft

/** The library facade is the user's path to the verified registry:
  * construction must wire views + functions + planner strategy in one
  * call, and `run` must produce exactly what the driver-gated registry
  * entry produces.
  */
class EngineSpec extends SparkSpec {

  private lazy val engine = Engine(spark, Sf)

  test("run() reproduces the gated registry result, by name only") {
    for (name <- Seq("q_topk_orders", "dedup_exact", "text_quality")) {
      val viaFacade = engine.run(name).collect()
      val viaGate = SparkEntry.queries(name)(spark, Sf).collect()
      assert(viaFacade.sameElements(viaGate),
        s"$name: facade and gate registry disagree")
      assert(viaFacade.nonEmpty, s"$name returned no rows")
    }
  }

  test("sql() sees the registered views AND the engine functions") {
    val r = engine.sql(
      """SELECT doc_id, graft_lang_id(text) AS lang,
        |       graft_token_count(text) AS toks
        |FROM documents ORDER BY doc_id LIMIT 5""".stripMargin).collect()
    assert(r.length == 5)
    assert(r.forall(_.getLong(2) > 0L))
  }

  test("grouped ranking through the facade plans the TopKPerKey operator") {
    // text_top_terms runs GroupedTopK; through the facade the session
    // must already carry the strategy (attach is part of construction)
    val plan = engine.run("text_top_terms").queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"),
      s"facade session must plan the custom operator:\n$plan")
  }

  test("unknown names fail with the registry size and near-matches") {
    val e = intercept[IllegalArgumentException](engine.run("q_topk_orderz"))
    assert(e.getMessage.contains("unknown query"))
    assert(e.getMessage.contains("q_topk_orders"), e.getMessage)
  }

  test("referenceSql surfaces the executable semantics documentation") {
    assert(engine.referenceSql("q_topk_orders").exists(_.toUpperCase.contains("SELECT")))
    assert(engine.names.size == SparkEntry.queries.size)
  }
}
