package graft.queries

import graft.SparkSpec

/** Physical-plan assertions: the scale properties the engine is designed
  * around must be visible in the plans, not assumed — filters/projection
  * reach the parquet scan, small dimensions broadcast, top-k never sorts
  * globally, hot paths stay inside WholeStageCodegen.
  */
class PlanSpec extends SparkSpec {
  private def planOf(name: String): String = {
    val df = graft.SparkEntry.queries(name)(spark, Sf)
    df.queryExecution.executedPlan.toString
  }

  test("q1: filter and column pruning pushed into the parquet scan") {
    val p = planOf("q1_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"shipdate filter must reach the scan:\n$p")
    assert(p.contains("ReadSchema") && !p.contains("l_orderkey"),
      "unused columns must be pruned from the scan")
  }

  test("q3: dimension table broadcast, no shuffle of customer") {
    val p = planOf("q3_shipping_priority")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"customer side must broadcast:\n$p")
  }

  test("star join: all three dims broadcast") {
    val p = planOf("q_star_join")
    assert("BroadcastExchange".r.findAllIn(p).size >= 3,
      s"supplier/nation/region must all broadcast:\n$p")
  }

  test("top-k compiles to TakeOrderedAndProject (no global sort)") {
    val p = planOf("q_topk_orders")
    assert(p.contains("TakeOrderedAndProject"), s"expected top-k operator:\n$p")
  }

  test("scan-heavy aggregation stays inside WholeStageCodegen") {
    // AQE only labels codegen spans in the final plan — execute first
    val df = graft.SparkEntry.queries("q1_pricing_summary")(spark, Sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // `*(n)` is the compact WholeStageCodegen marker; scan, filter,
    // project and partial aggregate must share span *(1)
    assert("""\*\(1\) HashAggregate""".r.findFirstIn(p).isDefined &&
      """\*\(1\) Filter""".r.findFirstIn(p).isDefined,
      s"expected fused codegen span over filter+partial agg:\n$p")
  }

  test("partition predicate prunes to one date directory") {
    val df = graft.SparkEntry.queries("q_partition_pruning")(spark, Sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [isnotnull(event_date"),
      s"expected partition filters in scan:\n$p")
  }

  test("bucketed co-located join has no shuffle on either side") {
    // tiny test tables would broadcast (also shuffle-free); force the
    // non-broadcast path to prove bucket co-location carries the join
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val df = try graft.SparkEntry.queries("q_bucketed_join")(spark, Sf)
    finally {}
    df.collect()
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange hashpartitioning(o_orderkey") &&
      !p.contains("Exchange hashpartitioning(l_orderkey"),
      s"bucketed join must not shuffle the fact tables:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
      s"expected a non-broadcast join:\n$p")
  }

  test("range join plans as an equi-join on the bin, never nested-loop") {
    val df = graft.SparkEntry.queries("q_range_join")(spark, Sf)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"range join must not degenerate to a quadratic join:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"), s"expected a hash/merge equi-join on the bin:\n$p")
  }

  test("embedding-cosine dedup is LSH-bucketed, never a cartesian product") {
    val df = graft.SparkEntry.queries("dedup_embedding_cosine")(spark, Sf)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"embedding dedup must join on (band,bucket), not all-pairs:\n$p")
  }

  test("hybrid RRF: bounded-heap top-k per ranker, corpus side never sort-merged") {
    val df = graft.SparkEntry.queries("text_hybrid_rrf")(spark, Sf)
    val p = df.queryExecution.executedPlan.toString
    // three GroupedTopK sites (dense, sparse, fusion) × partial+final
    val topk = "TopKPerKey".r.findAllIn(p).size
    assert(topk >= 6, s"expected 6 TopKPerKey phases (3 ops × 2), got $topk:\n$p")
    // the ONLY sort-merge join allowed is the full-outer fusion of two
    // ≤ k·|probes| ranked lists; every corpus-sized join must broadcast
    val smj = "SortMergeJoin".r.findAllIn(p).size
    assert(smj <= 1, s"corpus-side join degenerated to sort-merge ($smj found):\n$p")
    assert(!p.contains("CartesianProduct"),
      s"dense scoring must be a broadcast nested-loop, not a cartesian:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"probe-term / df joins must broadcast:\n$p")
  }

  test("bloom prefilter is the native codegen'd might_contain, not a UDF") {
    // q_bloom_join's small side is empty at sf0.001 (its empty-side fast
    // path collapses to a LocalTableScan) — build a non-empty instance
    import org.apache.spark.sql.functions._
    val li = spark.read.parquet(s"$Sf/lineitem.parquet").select(col("l_suppkey"))
    val supp = spark.read.parquet(s"$Sf/supplier.parquet")
      .filter(col("s_suppkey") % 2 === 0)
      .select(col("s_suppkey").as("l_suppkey"), col("s_name"))
    val df = graft.ops.Joins.bloomPrefilteredJoin(li, supp, "l_suppkey")
    assert(df.count() > 0, "prefilter path must be exercised")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("might_contain"),
      s"prefilter must be the native BloomFilterMightContain expression:\n$p")
    assert(!p.contains("UDF"),
      s"no Scala UDF may sit in the prefilter path (breaks codegen fusion):\n$p")
  }

  test("join hint selects the shuffled-hash strategy (no sort of either side)") {
    val df = graft.SparkEntry.queries("q_join_hints")(spark, Sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ShuffledHashJoin"),
      s"SHUFFLE_HASH hint must produce a shuffled-hash join:\n$p")
    assert(!p.contains("SortMergeJoin"), s"hint must override sort-merge:\n$p")
  }

  test("incremental dedup probes the bloom before the shuffle, history never force-broadcast") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
    val out = graft.ops.Dedup.incrementalDups(
      docs.filter(col("doc_id") % 5 =!= 4), docs.filter(col("doc_id") % 5 === 4),
      "text", "doc_id", prefixK = 16, expectedKeys = 100000L)
    val p = out.queryExecution.executedPlan.toString
    // the batch side carries the native bloom probe (pre-shuffle prune)
    assert(p.contains("might_contain"), s"bloom probe missing from the batch scan:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"no quadratic join in the verify path:\n$p")
  }

  test("grouped top-k plans as partial+final TopKPerKeyExec, no Window, no per-group sort") {
    val df = graft.SparkEntry.queries("q_topk_per_key")(spark, Sf)
    df.collect() // materialize through the custom exec
    val p = df.queryExecution.executedPlan.toString
    // the exec node prints without the Exec suffix; partial prints its
    // isPartial=true flag, final false — both must appear (in the final
    // AQE plan they show once each plus once in the initial plan)
    assert("TopKPerKey \\[".r.findAllIn(p).size >= 2,
      s"expected partial + final custom exec nodes:\n$p")
    assert(p.contains(", true") && p.contains(", false"),
      s"both the partial and the final phase must be planned:\n$p")
    assert(p.contains("Exchange"),
      s"final phase must hash-cluster on the key between the phases:\n$p")
    assert(!p.contains("Window"),
      s"the operator exists to avoid the full-sort window form:\n$p")
    // results equal the window formulation exactly
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val orders = spark.read.parquet(s"$Sf/orders.parquet")
      .select(col("o_custkey"), col("o_orderkey"),
        round(col("o_totalprice") * 100).cast("long").as("price_cents"))
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("price_cents").desc, col("o_orderkey"))
    val viaWindow = orders.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).drop("rn")
      .collect().map(_.toSeq).toSet
    val viaOperator = graft.plans.GroupedTopK(orders, Seq("o_custkey"),
        Seq(("price_cents", false), ("o_orderkey", true)), 3)
      .collect().map(_.toSeq).toSet
    assert(viaOperator == viaWindow,
      s"diff=${(viaOperator diff viaWindow) ++ (viaWindow diff viaOperator)}")
  }

  test("grouped top-k edge cases: null keys/orders, multi-column keys, k > group size") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq[(java.lang.Long, String, java.lang.Long, Long)](
      (1L, "x", 10L, 1L), (1L, "x", 30L, 2L), (1L, "x", 20L, 3L), (1L, "x", 30L, 4L),
      (1L, "y", 5L, 5L),                       // different second key
      (null, "x", 7L, 6L), (null, "x", 9L, 7L), // null group key forms its own group
      (2L, "x", null, 8L), (2L, "x", 1L, 9L),  // null order value
      (3L, "z", 42L, 10L)                       // singleton group, k > size
    ).toDF("k1", "k2", "v", "id")
    val w = Window.partitionBy(col("k1"), col("k2"))
      .orderBy(col("v").desc_nulls_last, col("id"))
    val viaWindow = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2).drop("rn").collect().map(_.toSeq).toSet
    val viaOp = graft.plans.GroupedTopK(df, Seq("k1", "k2"),
        Seq(("v", false), ("id", true)), 2)
      .collect().map(_.toSeq).toSet
    assert(viaOp == viaWindow,
      s"diff=${(viaOp diff viaWindow) ++ (viaWindow diff viaOp)}")
  }

  test("grouped top-k bounded-memory flush path (maxKeysPerPartition=1) stays exact") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val orders = spark.read.parquet(s"$Sf/orders.parquet")
      .select(col("o_custkey"), col("o_orderkey"),
        round(col("o_totalprice") * 100).cast("long").as("price_cents"))
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("price_cents").desc, col("o_orderkey"))
    val viaWindow = orders.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).drop("rn").collect().map(_.toSeq).toSet
    // flush after every key: the partial phase emits per-key heaps many
    // times per partition; the exchange + sorted final must still merge
    // to the exact answer
    spark.conf.set("graft.topk.maxKeysPerPartition", "1")
    try {
      val viaOp = graft.plans.GroupedTopK(orders, Seq("o_custkey"),
          Seq(("price_cents", false), ("o_orderkey", true)), 3)
        .collect().map(_.toSeq).toSet
      assert(viaOp == viaWindow,
        s"diff=${(viaOp diff viaWindow) ++ (viaWindow diff viaOp)}")
    } finally spark.conf.unset("graft.topk.maxKeysPerPartition")
  }

  test("mapping lookup broadcasts when small but is NOT forced: SMJ/SHJ when disabled") {
    // Catalyst must own the decision: a small mapping table auto-broadcasts,
    // but with broadcast disabled the plan degrades to a shuffled join
    // instead of OOMing a forced broadcast (the 100 TB mapping table has one
    // row per migrated entity — it is not a dim table).
    val small = graft.SparkEntry.queries("etl_mapping_lookup")(spark, Sf)
    val pSmall = small.queryExecution.executedPlan.toString
    assert(pSmall.contains("BroadcastExchange") || pSmall.contains("BroadcastHashJoin"),
      s"small mapping table should auto-broadcast:\n$pSmall")

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val big = graft.SparkEntry.queries("etl_mapping_lookup")(spark, Sf)
      big.collect()
      val pBig = big.queryExecution.executedPlan.toString
      assert(!pBig.contains("BroadcastHashJoin"),
        s"with broadcast disabled the mapping join must not broadcast:\n$pBig")
      assert(pBig.contains("SortMergeJoin") || pBig.contains("ShuffledHashJoin"),
        s"expected a shuffled join under autoBroadcastJoinThreshold=-1:\n$pBig")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("YAML source: id predicate prunes the file listing, not just rows") {
    import org.apache.spark.sql.functions.col
    val base = Tables.scratch("graft_yaml_prune")
    val spec = graft.spec.MigrationSpec("yaml_prune",
      source = s"$base/out", sourceDriver = "yaml",
      destination = s"$base/out", destinationDriver = "yaml",
      sourceIds = Seq(graft.spec.IdField("n_regionkey", graft.spec.LongId),
        graft.spec.IdField("n_nationkey", graft.spec.LongId)),
      destinationIds = Seq(graft.spec.IdField("n_regionkey", graft.spec.LongId),
        graft.spec.IdField("n_nationkey", graft.spec.LongId)))
    val nation = spark.read.parquet(s"$Sf/nation.parquet")
      .select(col("n_regionkey").cast("long"), col("n_nationkey").cast("long"),
        col("n_name"))
    new graft.drivers.YamlDestinationDriver().write(nation, spec)
    val all = new graft.drivers.YamlSourceDriver().read(spark, spec)
    val total = all.count() // 25 nations = 25 files

    val one = all.filter(col("n_nationkey") === 7L && col("n_regionkey") === 2L)
    one.collect()
    val scan = one.queryExecution.executedPlan.collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.getOrElse(fail(s"no file scan in:\n${one.queryExecution.executedPlan}"))
    assert(scan.metadata("PartitionFilters").contains("n_nationkey"),
      s"id predicate must reach PartitionFilters:\n${scan.metadata}")
    val filesRead = scan.metrics("numFiles").value
    assert(filesRead == 1,
      s"listing must prune to the one matching file, read $filesRead of $total")
  }

  test("YAML source: range and IN-list predicates prune the listing; stray files skipped") {
    import org.apache.spark.sql.functions.col
    val base = Tables.scratch("graft_yaml_range")
    val spec = graft.spec.MigrationSpec("yaml_range",
      source = s"$base/out", sourceDriver = "yaml",
      destination = s"$base/out", destinationDriver = "yaml",
      sourceIds = Seq(graft.spec.IdField("n_regionkey", graft.spec.LongId),
        graft.spec.IdField("n_nationkey", graft.spec.LongId)),
      destinationIds = Seq(graft.spec.IdField("n_regionkey", graft.spec.LongId),
        graft.spec.IdField("n_nationkey", graft.spec.LongId)))
    val nation = spark.read.parquet(s"$Sf/nation.parquet")
      .select(col("n_regionkey").cast("long"), col("n_nationkey").cast("long"),
        col("n_name"))
    new graft.drivers.YamlDestinationDriver().write(nation, spec)
    // stray YAML that is NOT an entity of this tree: wrong depth and a
    // non-numeric name at the right depth — the listing must skip both
    // instead of crashing the read (ADVICE r8)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$base/out/README.yaml"),
      "note: not an entity\n".getBytes)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$base/out/2/backup-copy.yaml"),
      "n_name: STRAY\n".getBytes)

    def scanOf(df: org.apache.spark.sql.DataFrame) = {
      df.collect()
      df.queryExecution.executedPlan.collectFirst {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }.getOrElse(fail(s"no file scan in:\n${df.queryExecution.executedPlan}"))
    }
    val all = new graft.drivers.YamlSourceDriver().read(spark, spec)
    assert(all.count() == 25, "stray files must be skipped, not read as entities")

    val range = all.filter(col("n_nationkey").between(5L, 9L))
    assert(scanOf(range).metrics("numFiles").value == 5,
      "a BETWEEN predicate must prune the listing to the 5 matching files")
    val inList = all.filter(col("n_nationkey").isin(2L, 11L, 17L))
    assert(scanOf(inList).metrics("numFiles").value == 3,
      "an IN-list predicate must prune the listing to its 3 files")
  }

  test("DSIR: weight table broadcasts, selection is TakeOrdered (no global sort)") {
    val p = planOf("text_dsir_select")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"the ≤256-row weight table must broadcast:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k selection must be TakeOrdered, not Sort+Limit:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
  }

  test("CCNet buckets: bin-assignment table broadcasts back to the doc side") {
    val p = planOf("text_ccnet_buckets")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"the #langs × #bins assignment must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
  }

  test("symspell linkage joins on the delete variant, never nested-loop") {
    val p = planOf("er_symspell_match")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"candidate generation must be the equi-join on the delete key:\n$p")
  }

  test("fs linkage: both blocking passes are equi-joins, never all-pairs") {
    val p = planOf("er_fs_score")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"FS candidate generation must join on the blocking keys:\n$p")
  }

  test("theta sketch: the k-min cut is TakeOrdered, never a global sort") {
    val p = planOf("sketch_theta_intersect")
    assert(p.contains("TakeOrderedAndProject"),
      s"k smallest hashes must come from TakeOrdered (per-partition heaps):\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
  }

  test("twap: one shuffle on user_id feeds the lead window") {
    val p = planOf("q_twap")
    assert(p.contains("hashpartitioning(user_id"),
      s"the window must partition by user_id:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
  }

  test("dynamic partition pruning: runtime filter reaches the fact scan") {
    // The hot-day set is only known at runtime (subquery LIMIT 5), so
    // static pruning is impossible — the scan must carry a
    // dynamicpruningexpression on the partition column. At 100 TB this
    // is scan 5 directories vs scan all of them.
    val df = graft.SparkEntry.queries("q_dynamic_pruning")(spark, Sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("dynamicpruning"),
      s"fact scan must be pruned by a runtime (dynamic) partition filter:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
  }

  test("attribution: both models come from ONE keyed window pass") {
    // first- and last-touch share the user_id window — one hash shuffle
    // on user_id, never two as-of joins or an unkeyed window.
    val p = planOf("q_attribution")
    assert(p.contains("hashpartitioning(user_id"),
      s"window must partition by user_id:\n$p")
    assert("Window \\[".r.findAllIn(p).size == 1 && !p.contains("SinglePartition"),
      s"expected a single keyed Window operator:\n$p")
    assert("FileScan parquet".r.findAllIn(p).size == 1,
      s"the unpivot must not clone the events scan per model:\n$p")
  }

  test("rfm: exact quintiles without any single-partition exchange") {
    val p = planOf("q_rfm")
    assert(!p.contains("SinglePartition"),
      s"ntileExact must never collapse to one task:\n$p")
    assert(!p.contains("Window"), s"no global window allowed:\n$p")
  }

  test("dq expectations: five row-level checks share ONE scan of orders") {
    // one scan for all summed row-level flags (explode-unpivot), one
    // for the uniqueness aggregate — a per-constraint union would be 6
    val p = planOf("dq_expectations")
    assert("FileScan parquet".r.findAllIn(p).size == 2,
      s"row-level constraints must not clone the scan:\n$p")
  }

  test("changepoint: every window keyed by event_type, never unkeyed") {
    // the CUSUM windows are per-type — an unkeyed formulation would put
    // the whole daily series on one task
    val p = planOf("q_changepoint")
    assert(p.contains("hashpartitioning(event_type"),
      s"windows must partition by event_type:\n$p")
    assert(!p.contains("SinglePartition"), s"no one-task stage:\n$p")
  }

  test("exact quantiles: rank selection, no single-partition stage, targets broadcast") {
    val p = planOf("q_exact_quantiles")
    assert(!p.contains("SinglePartition"),
      s"rank path must stay distributed:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"the 5-row target-rank table must broadcast:\n$p")
    assert(!p.contains("Window"), s"no global window:\n$p")
  }

  test("gram matrix: explode feeds a partial aggregate, one hash exchange") {
    // 136 cells/row fold to 136 partials per partition BEFORE the
    // shuffle — the exchange must carry aggregated cells, not raw rows.
    val p = planOf("emb_gram_matrix")
    assert(p.contains("Generate explode"), s"expected explode:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"one aggregation exchange expected:\n$p")
    assert("partial_sum".r.findAllIn(p).nonEmpty,
      s"partial aggregation must run before the exchange:\n$p")
  }

  test("unpivot: melt is a pure Expand projection after one agg, dims broadcast") {
    val p = planOf("q_unpivot")
    assert(p.contains("Expand"), s"Dataset.unpivot must plan as Expand:\n$p")
    assert(p.contains("BroadcastExchange"), s"nation must broadcast:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2,
      s"join + agg exchanges only — the melt itself must not shuffle:\n$p")
  }

  test("histogram: one hash exchange over partial aggregates") {
    val p = planOf("q_histogram")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"one aggregation exchange expected:\n$p")
    assert(p.contains("partial_count") || p.contains("partial_min"),
      s"map-side combine must run before the exchange:\n$p")
  }

  test("MAD outliers: aggregate medians, no Window, no single-partition stage") {
    val p = planOf("q_outlier_mad")
    assert(!p.contains("Window"), s"bounded per-key buffers, never window sorts:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"no single-partition exchange:\n$p")
  }

  test("PIT features: as-of composition stays equi-partitioned, never a range join") {
    val p = planOf("q_pit_features")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoopJoin"),
      s"interval semantics must not plan as a range/cross join:\n$p")
    assert(p.contains("Window"), s"the as-of carry is a keyed window:\n$p")
  }

  test("prefix Jaccard: every join is an equi-join (prefix index, verify, sizes)") {
    val p = planOf("dedup_jaccard_prefix")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoopJoin"),
      s"prefix filtering must never degrade to all-pairs:\n$p")
  }

  test("freshness: the global watermark is a 1-row broadcast, not a second pass") {
    val p = planOf("dq_freshness")
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastNestedLoopJoin"),
      s"global-max side must broadcast:\n$p")
  }

  test("band join: bucketed equi-join on (nation, bucket), never nested-loop") {
    val p = planOf("q_band_join")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoopJoin"),
      s"|x-y|<=eps must de-quadratify to a bucketed equi-join:\n$p")
    assert(p.contains("Generate explode"),
      s"the +/-1 bucket fan-out side must explode:\n$p")
  }

  test("winnowing: fingerprint pairing is an equi-join on the selected hash") {
    val p = planOf("dedup_winnowing")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoopJoin"),
      s"pairs must meet on the fingerprint key:\n$p")
  }

  test("ohlc bars: min_by/max_by aggregate, no Window, one hash shuffle") {
    // open/close come from min_by/max_by partials — a Window over
    // (event_type, hour) would add a per-group sort the aggregate avoids.
    val p = planOf("q_ohlc_bars")
    assert(!p.contains("Window"), s"no window operator expected:\n$p")
    assert("hashpartitioning\\(event_type".r.findAllIn(p).size >= 1,
      s"one shuffle on the bar key:\n$p")
  }

  test("lateral top-n: decorrelates to WindowGroupLimit + broadcast, never a cartesian") {
    // the correlated ORDER BY … LIMIT lateral must become the group-limit
    // pushdown (partial per-partition top-2 BEFORE the shuffle) joined
    // broadcast to nation — a per-nation loop would be a cartesian/BNLJ
    val p = planOf("q_lateral_topn")
    assert(p.contains("WindowGroupLimit"),
      s"expected the group-limit pushdown:\n$p")
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastHashJoin"),
      s"nation must broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"no quadratic join:\n$p")
  }

  test("url canonicalize: scan-speed projection — no join, no aggregate, no UDF") {
    // the canonicalizer is pure per-row expression work; the only
    // exchange allowed is the final presentation sort
    val p = planOf("text_url_canonicalize")
    assert(!p.contains("Join") && !p.contains("HashAggregate"),
      s"per-row projection only:\n$p")
    assert(!p.toLowerCase.contains("batchevalpython") && !p.contains("ScalaUDF"),
      s"no UDFs in the canonicalizer:\n$p")
    assert("Exchange".r.findAllIn(p).size <= 1,
      s"only the presentation sort may exchange:\n$p")
  }

  test("url dedup: one hash shuffle keyed on the canonical url, no Window") {
    val p = planOf("dedup_url")
    assert(p.contains("hashpartitioning(canon_url"),
      s"the dedup shuffle key must be the canonical URL:\n$p")
    assert(!p.contains("Window"), s"no window operator expected:\n$p")
    assert(p.contains("partial_count") || p.contains("partial_min"),
      s"map-side combine must run before the exchange:\n$p")
  }
}
