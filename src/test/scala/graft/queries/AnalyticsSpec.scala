package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Structural invariants for the FS-linkage / theta-sketch / TWAP
  * additions — the properties the DuckDB hash oracle can't state
  * directly (it only confirms equality, not WHY the answer is right).
  */
class AnalyticsSpec extends SparkSpec {

  private def run(name: String) =
    graft.SparkEntry.queries(name)(spark, Sf)

  test("stream_scd2 incremental maintenance equals q_scd2_history batch recomputation row-for-row") {
    // The incremental-equals-recompute equivalence proof, pinned as a
    // spec (r17 verdict task 4): the CDC-chunked merge-on-read history
    // and the full-history window composition must agree on every
    // (customer, version, priority, validity) row. The driver's oracle
    // gate checks each against the same SQL; this test removes even the
    // oracle from the loop — engine vs engine, exact rows.
    def rows(name: String) = graft.SparkEntry.queries(name)(spark, Sf)
      .select("o_custkey", "priority", "valid_from", "valid_to", "version")
      .collect().map(_.toSeq).sortBy(_.toString)
    val inc = rows("stream_scd2")
    val batch = rows("q_scd2_history")
    assert(inc.length == batch.length,
      s"row counts differ: incremental ${inc.length} vs batch ${batch.length}")
    inc.zip(batch).foreach { case (a, b) => assert(a == b, s"row mismatch: $a vs $b") }
  }

  test("fs linkage: every emitted pair agrees on name within edit-1") {
    // With weights (24/-18, 18/-12, 7/-9, 5/-11) and threshold 30, a
    // name-disagreeing pair can reach at most -18+18+7+5 = 12 — so a
    // single linked pair without edit-1 names means the scoring sum or
    // the threshold regressed.
    val linked = run("er_fs_score")
    val c = Tables.load(spark, Sf, "customer")
    val clean = c.select(col("c_custkey").as("key"), col("c_name").as("name"))
    val dirty = c.filter(col("c_custkey") % 7 === 0)
      .select((col("c_custkey") + 20000000L).as("key"),
        expr("""concat(
            substring(c_name, 1, cast(c_custkey % 16 as int) + 1),
            substring(c_name, cast(c_custkey % 16 as int) + 3,
                      length(c_name)))""").as("name"))
    val names = clean.unionByName(dirty)
    val joined = linked
      .join(names.withColumnRenamed("key", "a_key").withColumnRenamed("name", "a_name"), Seq("a_key"))
      .join(names.withColumnRenamed("key", "b_key").withColumnRenamed("name", "b_name"), Seq("b_key"))
    val bad = joined.filter(!graft.functions.WithinEdit1(col("a_name"), col("b_name"))).count()
    assert(bad === 0L)
    assert(linked.count() > 0L)
  }

  test("fs linkage: dirty twins caught by an intact blocking key link at full score") {
    // A twin is guaranteed to be a candidate when its balance bucket
    // didn't cross (pass 1) or its name suffix survived the drop
    // (pass 2). Every such twin must link to its original with the
    // full agree-score 24+18+7+5 = 54.
    val c = Tables.load(spark, Sf, "customer")
    val twins = c.filter(col("c_custkey") % 7 === 0)
      .select(col("c_custkey").as("a_key"),
        (col("c_custkey") + 20000000L).as("b_key"),
        (round(col("c_acctbal") * 100).cast("long")).as("cents"),
        (col("c_custkey") % 16 + 2).as("drop_pos"))
      .filter(
        // pass 1 intact: +777 stays inside the 10000-cent bucket
        ((col("cents") + 100000) % 10000 < 10000 - 777) ||
        // pass 2 intact: dropped position before the last-4 suffix
        (col("drop_pos") < 15))
    val linked = run("er_fs_score").filter(col("score") === 54)
    val missed = twins.select(col("a_key"), col("b_key"))
      .join(linked, Seq("a_key", "b_key"), "left_anti").count()
    assert(missed === 0L)
  }

  test("theta sketch: below-k regime is exact and side cardinalities are true distincts") {
    // sf0.001 has ~200 distinct parts per segment — under k=256 the
    // sketch keeps every hash, the estimate IS the exact intersection,
    // and the gate row must survive with the true side counts.
    val row = run("sketch_theta_intersect").collect()
    assert(row.length === 1)
    val cust = Tables.load(spark, Sf, "customer").select(col("c_custkey"), col("c_mktsegment"))
    val ords = Tables.load(spark, Sf, "orders").select(col("o_orderkey"), col("o_custkey"))
    val li = Tables.load(spark, Sf, "lineitem").select(col("l_orderkey"), col("l_partkey"))
    def parts(seg: String) =
      li.join(ords, li("l_orderkey") === ords("o_orderkey"))
        .join(cust.filter(col("c_mktsegment") === seg),
          ords("o_custkey") === col("c_custkey"))
        .select(col("l_partkey")).distinct()
    assert(row(0).getLong(1) === parts("BUILDING").count())
    assert(row(0).getLong(2) === parts("MACHINERY").count())
  }

  test("twap: durations are capped holding gaps and rows drop exactly one per user") {
    val ev = Tables.load(spark, Sf, "events")
    val nEvents = ev.count()
    val nUsers = ev.select(col("user_id")).distinct().count()
    // Independent recomputation of the total weighted mass via SQL.
    ev.createOrReplaceTempView("twap_ev")
    val ref = spark.sql(
      """SELECT CAST(SUM(least((nxt - us) div 1000000, 3600)) AS LONG) dur,
        |       COUNT(*) n FROM (
        |  SELECT unix_micros(ts) us,
        |    LEAD(unix_micros(ts)) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id) nxt
        |  FROM twap_ev) WHERE nxt IS NOT NULL""".stripMargin).collect()(0)
    val got = run("q_twap")
      .agg(sum(col("dur_total")).as("dur"), count(lit(1)).as("types")).collect()(0)
    assert(got.getLong(0) === ref.getLong(0))
    // every non-final event of every user contributes exactly one row
    assert(ref.getLong(1) === nEvents - nUsers)
  }

  test("markov attribution: removal never helps, shares partition the total") {
    val rows = run("q_attribution_markov").collect()
    assert(rows.nonEmpty)
    val base = rows.map(_.getAs[Long]("base_ppm")).distinct
    assert(base.size == 1, s"base_ppm must be the same on every row: $base")
    for (r <- rows) {
      // failing every path through a channel cannot INCREASE conversion
      assert(r.getAs[Long]("removal_ppm") <= base.head,
        s"${r.getAs[String]("channel")}: removal raised absorption")
      assert(r.getAs[Long]("effect_ppm") ==
        base.head - r.getAs[Long]("removal_ppm"))
      val att = r.getAs[Long]("attribution_ppm")
      assert(att >= 0L && att <= 1000000L)
    }
    // truncating shares must sum to ≤ 1e6 and land within one ULP per
    // channel of it
    val s = rows.map(_.getAs[Long]("attribution_ppm")).sum
    assert(s <= 1000000L && s >= 1000000L - rows.length,
      s"attribution shares sum to $s")
  }

  test("survival curve: S(t) is non-increasing from 1e6 and risk sets telescope") {
    val rows = run("q_survival").orderBy(col("t_days")).collect()
    assert(rows.nonEmpty)
    val s = rows.map(_.getAs[Long]("s_ppm"))
    assert(s.head <= 1000000L)
    assert(s.zip(s.tail).forall { case (a, b) => b <= a }, s.toSeq.toString)
    // each step's risk set shrinks by at least the step's OWN row count
    val n = rows.map(_.getAs[Long]("n_risk"))
    assert(n.zip(n.tail).forall { case (a, b) => b < a }, n.toSeq.toString)
  }

  // ---- round-16 experimentation/diagnostics additions: the
  // structural invariants behind the oracle-matched numbers ----

  test("obrien-fleming: cumulative looks, decreasing boundaries, monotone stop") {
    val rows = run("q_obrien_fleming").collect()
    assert(rows.length === 4)
    def seq(c: String) = rows.map(_.getAs[Long](c)).toSeq
    // users and conversions only accumulate as the looks advance
    for (c <- Seq("n_a", "x_a", "n_b", "x_b")) {
      val v = seq(c)
      assert(v.zip(v.tail).forall { case (a, b) => a <= b }, s"$c: $v")
    }
    val b = rows.map(_.getAs[Int]("bound_e6").toLong).toSeq
    assert(b === Seq(16386304L, 8191044L, 5461569L, 4096576L))
    val stopped = rows.map(_.getAs[Int]("stopped")).toSeq
    assert(stopped.zip(stopped.tail).forall { case (a, bb) => a <= bb })
  }

  test("poisson bootstrap: 64 replicates, point estimate inside the percentile CI") {
    val r = run("q_bootstrap_ci").collect().head
    assert(r.getAs[Long]("b_count") === 64L)
    val (lo, hi, m) = (r.getAs[Double]("boot_lo"),
      r.getAs[Double]("boot_hi"), r.getAs[Double]("mean_full"))
    // deterministic md5 weights: on this fixed corpus the full-sample
    // mean sits strictly inside the 2.5%/97.5% order statistics
    assert(lo < m && m < hi, s"$lo / $m / $hi")
  }

  test("winsorized test: caps ordered and both arm means inside the caps") {
    val r = run("q_winsorized_mean").collect().head
    val (lo, hi) = (r.getAs[Long]("lo_cents"), r.getAs[Long]("hi_cents"))
    assert(lo < hi)
    for (c <- Seq("wins_mean_hd_a", "wins_mean_hd_b")) {
      val m = r.getAs[Double](c)
      assert(m >= lo / 10000.0 - 1 && m <= hi / 10000.0, s"$c = $m")
    }
  }

  test("geo cell join: ring candidates reproduce the brute-force distance join") {
    // independent in-engine brute force (the oracle already checks
    // cross-engine; this pins the ring's losslessness inside Spark)
    import org.apache.spark.sql.functions.{conv => fconv}
    def word(t: String, k: String, salt: String) =
      fconv(substring(md5(concat(col(k).cast("string"), lit(salt))), 1, 8),
        16, 10).cast("long")
    val c = Tables.load(spark, Sf, "customer").select(col("c_custkey"),
      (word("c", "c_custkey", "clat") % 1200000L).as("lat"),
      (word("c", "c_custkey", "clon") % 3600000L).as("lon"))
    val sp = Tables.load(spark, Sf, "supplier").select(col("s_suppkey"),
      (word("s", "s_suppkey", "slat") % 1200000L).as("slat"),
      (word("s", "s_suppkey", "slon") % 3600000L).as("slon"))
    val brute = sp.crossJoin(c)
      .withColumn("d2",
        (col("slat") - col("lat")) * (col("slat") - col("lat")) +
          (col("slon") - col("lon")) * (col("slon") - col("lon")))
      .filter(col("d2") <= 100000L * 100000L)
      .groupBy(col("s_suppkey")).agg(count(lit(1)).as("bf"))
    val ring = run("q_geo_cell_join").filter(col("n_within") > 0)
    val mism = ring.join(brute, Seq("s_suppkey"), "full_outer")
      .filter(coalesce(col("n_within"), lit(0L)) =!= coalesce(col("bf"), lit(0L)))
      .count()
    assert(mism === 0L)
  }

  test("mann-kendall: S bounded by the pair count and variance positive") {
    val r = run("q_mann_kendall").collect().head
    val nd = r.getAs[Long]("nd")
    val s = r.getAs[Long]("s")
    assert(math.abs(s) <= nd * (nd - 1) / 2)
    assert(r.getAs[Long]("var18") > 0)
  }

  test("bh fdr: thresholds decrease and the rejected set is a rank prefix") {
    val rows = run("q_bh_fdr").collect()
    assert(rows.length === 5)
    val th = rows.map(_.getAs[Int]("bh_threshold_e4")).toSeq
    assert(th === Seq(66349, 54119, 47093, 42179, 38415))
    val rej = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Int]("rejected"))
    // once a rank is not rejected, no later rank may be (prefix rule)
    assert(rej.zip(rej.tail).forall { case (a, b) => a >= b }, rej.toSeq.toString)
  }

  test("gini: inside [0, 1) on a positive-revenue corpus") {
    val g = run("q_gini").collect().head.getAs[Double]("gini")
    assert(g >= 0.0 && g < 1.0, g.toString)
  }

  test("item cf: cosines in (0, 1], neighbors ranked consistently") {
    val rows = run("q_item_cf").collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      val cs = r.getAs[Double]("cosine"); cs > 0.0 && cs <= 1.0 })
    // within an item, rank order matches descending cosine
    rows.groupBy(_.getAs[Long]("item")).values.foreach { g =>
      val byRank = g.sortBy(_.getAs[Int]("rnk")).map(_.getAs[Double]("cosine"))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }

  test("page-hinkley: gap non-negative, alarm iff gap clears lambda") {
    val rows = run("q_page_hinkley").collect()
    assert(rows.length === 30)
    assert(rows.forall(_.getAs[Long]("gap") >= 0L))
    assert(rows.forall { r =>
      r.getAs[Boolean]("alarm") === (r.getAs[Long]("gap") > r.getAs[Long]("lambda")) })
  }

  test("forecast backtest: 7-day holdout, 16-day common-support train, winner matches errors") {
    val r = run("q_forecast_backtest").collect().head
    assert(r.getAs[Long]("nd") === 30L)
    assert(r.getAs[Long]("n_test") === 7L)
    assert(r.getAs[Long]("n_train") === 16L) // common support i in 8..23
    val (sn, ss) = (r.getAs[Long]("sae_naive"), r.getAs[Long]("sae_snaive"))
    val expected = if (ss < sn) "seasonal_naive" else if (sn < ss) "naive" else "tie"
    assert(r.getAs[String]("winner") === expected)
  }

  test("off-policy pair: sane supports and DR anchored on the direct-method value") {
    val ips = run("q_ips_eval").collect().head
    assert(ips.getAs[Long]("n_matched") > 0L &&
      ips.getAs[Long]("n_matched") < ips.getAs[Long]("n"))
    assert(ips.getAs[Double]("ips_value_cents") > 0.0)
    assert(ips.getAs[Double]("snips_value_cents") > 0.0)
    val dr = run("q_dr_eval").collect().head
    val (dm, drv) = (dr.getAs[Double]("dm_value_cents"),
      dr.getAs[Double]("dr_value_cents"))
    // the correction is a mean-zero-ish residual reweighting on this
    // near-uniform logging corpus: DR must stay within 2x of DM (a
    // blowup means the propensity division or units regressed)
    assert(dm > 0.0 && drv > 0.0 && drv < 2 * dm && drv > dm / 2,
      s"dm=$dm dr=$drv")
  }

  test("log-rank: deaths conserved across arms and E1 inside [0, total deaths]") {
    val r = run("q_logrank").collect().head
    val (o1, o2) = (r.getAs[Long]("o1"), r.getAs[Long]("o2"))
    val converted = Tables.load(spark, Sf, "events")
      .filter(col("event_type") === "purchase")
      .select(col("user_id")).distinct().count()
    assert(o1 + o2 === converted,
      "every converting user dies exactly once in the log-rank frame")
    val e1 = r.getAs[Double]("e1")
    assert(e1 >= 0.0 && e1 <= (o1 + o2).toDouble)
    assert(Option(r.getAs[Double]("chi2")).forall(_ >= 0.0))
  }

  test("anova: nonnegative sums of squares, eta2 in [0,1], parts ≈ total SS") {
    val r = run("q_anova_f").collect().head
    val (ssb, ssw) = (r.getAs[Long]("ssb"), r.getAs[Long]("ssw"))
    assert(ssb >= -5L && ssw >= 0L, // SSB ≥ 0 up to k truncations of < 1
      s"ssb=$ssb ssw=$ssw")
    val eta2 = r.getAs[Double]("eta2")
    assert(eta2 >= 0.0 && eta2 <= 1.0)
    // SSB + SSW must reconstruct the total sum of squares (doubles,
    // loose tolerance — the query's truncations are < k+1 absolute)
    val tot = Tables.load(spark, Sf, "orders")
      .select(round(col("o_totalprice")).cast("long").as("x"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("s"),
        sum(col("x") * col("x")).as("q")).head()
    val (n, s, q) = (tot.getLong(0), tot.getLong(1), tot.getLong(2))
    val totalSS = q.toDouble - s.toDouble * s / n
    assert(math.abs((ssb + ssw).toDouble - totalSS) < 10.0,
      s"ssb+ssw=${ssb + ssw} vs totalSS=$totalSS")
  }

  test("mcnemar: discordant pairs bounded by n; chi2 null only when b+c=0") {
    val r = run("q_mcnemar").collect().head
    val (n, b, c) = (r.getAs[Long]("n"), r.getAs[Long]("b"), r.getAs[Long]("c"))
    assert(b >= 0 && c >= 0 && b + c <= n)
    assert(r.getAs[Long]("acc_a_ppm") <= 1000000L &&
      r.getAs[Long]("acc_b_ppm") <= 1000000L)
    assert((Option(r.getAs[Double]("chi2")).isEmpty) === (b + c == 0))
  }

  test("tost: a point estimate outside the margin can never declare equivalence") {
    // theorem: |Δ| ≥ δ ⇒ one of the two one-sided numerators is ≤ 0
    val r = run("q_tost_equivalence").collect().head
    val diff = r.getAs[Double]("diff_dollars")
    val m = r.getAs[Long]("margin_dollars").toDouble
    if (math.abs(diff) >= m)
      assert(r.getAs[Int]("equivalent") === 0)
  }

  test("permutation test: p bounded by the permutation count") {
    val r = run("q_permutation_test").collect().head
    val rv = r.getAs[Long]("r_valid")
    assert(rv > 0 && rv <= 199)
    val p = r.getAs[Long]("p_permille")
    // min possible p = (1+0)*1000 div (rv+1); max = 1000
    assert(p >= 1000L / (rv + 1) && p <= 1000L)
  }

  test("propensity strata: arms partition the cohort; all deciles usable here") {
    val r = run("q_propensity_strata").collect().head
    val (n, t) = (r.getAs[Long]("n_cust"), r.getAs[Long]("treated"))
    assert(t > 0 && t < n, "both arms must be populated")
    assert(r.getAs[Long]("n_strata_used") <= 10L)
    // on this corpus the mechanical confounder inflates the naive gap:
    // adjustment must shrink it (the gate's whole demonstration)
    assert(math.abs(r.getAs[Double]("adjusted_diff_dollars")) <
      math.abs(r.getAs[Double]("naive_diff_dollars")))
  }

  test("stl: trend + seasonal + residual reconstructs the series exactly") {
    val rows = run("q_stl_decompose").collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      val sum = r.getAs[Double]("trend") + r.getAs[Double]("seasonal") +
        r.getAs[Double]("residual")
      assert(math.abs(sum - r.getAs[Long]("cnt")) < 1e-3,
        s"day ${r.getAs[Long]("day")}: $sum != ${r.getAs[Long]("cnt")}")
    }
  }

  test("growth accounting: the ledger identity actives = new + retained + resurrected") {
    val ledger = run("q_growth_accounting")
    val actives = Tables.load(spark, Sf, "events")
      .select(col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .distinct()
      .groupBy(col("day")).agg(count(lit(1)).as("actives"))
    val bad = ledger.join(actives, Seq("day"))
      .filter(col("n_new") + col("n_retained") + col("n_resurrected")
        =!= col("actives")).count()
    assert(bad === 0L, "every active user must be classified exactly once")
    // total churn ≤ total activity days; every user churns at most
    // once per gap, and the final churn past the horizon is dropped
    val sums = ledger.agg(sum(col("n_churned")).as("ch"),
      sum(col("n_new") + col("n_retained") + col("n_resurrected"))
        .as("act")).head()
    assert(sums.getLong(0) <= sums.getLong(1))
  }

  test("fleiss kappa bounded; cochran per-rule corrects sum to the per-row totals") {
    val fk = run("q_fleiss_kappa").collect().head
    val k = fk.getAs[Double]("kappa")
    assert(k >= -1.0 && k <= 1.0)
    // the three rules are independent of each other by construction —
    // agreement beyond chance should be near zero on this corpus
    assert(math.abs(k) < 0.2, s"kappa=$k")
    val cq = run("q_cochran_q").collect().head
    val fromRules = cq.getAs[Long]("g1") + cq.getAs[Long]("g2") +
      cq.getAs[Long]("g3")
    // recompute ΣL independently: it must equal Σ per-rule corrects
    val sl = Tables.load(spark, Sf, "lineitem").select(
      (when((col("l_discount") >= 0.05) === (col("l_returnflag") === "R"), 1L).otherwise(0L) +
        when((col("l_quantity") >= 25.0) === (col("l_returnflag") === "R"), 1L).otherwise(0L) +
        when((col("l_tax") >= 0.04) === (col("l_returnflag") === "R"), 1L).otherwise(0L)).as("l"))
      .agg(sum(col("l"))).head().getLong(0)
    assert(fromRules === sl)
  }

  test("median test splits near half; runs test counts are internally consistent") {
    val mt = run("q_median_test").collect().head
    val (n, a) = (mt.getAs[Long]("n"), mt.getAs[Long]("a"))
    assert(a > 0 && a <= n / 2, // strictly-above the LOWER median ≤ n/2
      s"a=$a n=$n")
    assert(Option(mt.getAs[Double]("chi2")).forall(_ >= 0.0))
    val rt = run("q_runs_test").collect().head
    val (rn, n1, n2, r) = (rt.getAs[Long]("n"), rt.getAs[Long]("n1"),
      rt.getAs[Long]("n2"), rt.getAs[Long]("r"))
    assert(n1 + n2 === rn)
    assert(r >= 1 && r <= rn, s"runs=$r of $rn")
  }

  test("grid clustering: points partition into clusters + noise") {
    val rows = run("q_geo_grid_cluster").collect()
    val total = Tables.load(spark, Sf, "customer").count()
    assert(rows.map(_.getAs[Long]("n_points")).sum === total,
      "every customer lands in exactly one cluster or the noise row")
    val noise = rows.filter(_.getAs[Long]("cluster") == -1L)
    assert(noise.length === 1 && noise.head.getAs[Long]("n_cells") === 0L)
    rows.filterNot(_.getAs[Long]("cluster") == -1L).foreach { r =>
      assert(r.getAs[Long]("n_cells") >= 1L && r.getAs[Long]("n_points") >= 2L)
    }
  }

  test("survival ci: bands bracket the curve, survival monotone non-increasing") {
    val rows = run("q_survival_ci").collect()
    assert(rows.length > 0)
    var lastS = Long.MaxValue
    rows.foreach { r =>
      val s = r.getAs[Long]("s_ppm")
      assert(s <= lastS, "KM survival must be non-increasing")
      lastS = s
      val sd = s.toDouble / 1e6
      assert(r.getAs[Double]("lo95") <= sd + 1e-9 &&
        sd <= r.getAs[Double]("hi95") + 1e-9)
      assert(r.getAs[Long]("g_e12") >= 0L)
    }
  }

  test("scd2 stream: versions contiguous, valid_to chains to the next valid_from") {
    val hist = run("stream_scd2")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("version"))
    val checked = hist
      .withColumn("next_ver", lead(col("version"), 1).over(w))
      .withColumn("next_from", lead(col("valid_from"), 1).over(w))
    assert(checked.filter(col("next_ver").isNotNull &&
      col("next_ver") =!= col("version") + 1).count() === 0L,
      "version numbers must be dense per customer")
    assert(checked.filter(col("next_from").isNotNull &&
      col("valid_to") =!= col("next_from")).count() === 0L,
      "each closed version must end where its successor begins")
    assert(checked.filter(col("next_ver").isNull &&
      col("valid_to").isNotNull).count() === 0L,
      "exactly the last version per customer stays open")
    assert(hist.filter(col("version") === 1).count() ===
      hist.select(col("o_custkey")).distinct().count(),
      "every customer starts at version 1")
  }
}
