package graft.queries

import graft.SparkSpec

/** Results must not depend on the shuffle width. The queries here are
  * exactly the ones whose machinery COULD smuggle in a partition-count
  * dependence — global ranks from per-partition offsets, distributed
  * prefix sums, range-partitioned training order, per-shard packing
  * folds, label-propagation clustering — and the driver's oracle only
  * ever checks one width. A mismatch between widths is the signature
  * of seed/offset logic keyed to physical partitioning rather than to
  * the data (the r13-advice hazard class on Rank), so this spec pins
  * width-independence explicitly at 3 vs 13 partitions (both unlike
  * the 4 the rest of the suite runs at, and mutually coprime).
  */
class ParallelismInvarianceSpec extends SparkSpec {

  private val sensitive = Seq(
    "q_rfm",              // ntileExact: rank offsets from partition seeds
    "q_skyline",          // runningMaxExclusive prefix seeds
    "q_exact_quantiles",  // rank-target selection
    "text_train_order",   // range exchange + zipWithIndex order
    "text_budget_select", // distributed token prefix sum
    "text_pack_sequences",// per-shard greedy fold
    "q_running_distinct", // shared-exchange window pair
    "dedup_clusters_distributed", // hash-min label propagation rounds
    "eval_auc",           // rankGlobal midrank sums from partition seeds
    "eval_rank_correlation", // two independent rankGlobal passes joined
    "eval_lift_deciles",  // rank-derived decile cuts from partition seeds
    "q_holt_winters",     // sort_array(collect_list) must fix the fold order
    "q_macd_signal",      // same sorted-fold contract, crossover counter
    "dedup_cdc_chunks",   // scan-stage chunk fold + fingerprint aggregation
    "sim_binary_hamming", // bounded-heap top-k under integer-distance ties
    "eval_bleu",          // clipped n-gram multiset sums across widths
    "q_ks_test",          // runningSumsInclusive prefix seeds from
                          // partition offsets
    "eval_avg_precision") // the same prefix-sum machinery ranking by
                          // (score desc, doc_id)
  // q_cheapest_path / q_widest_path are NOT here: their fixpoint frames
  // are memoized per sfDir, so a second width would compare the cache
  // against itself — OpsSpec pins the semiring ops' partitioning
  // invariance directly (repartition(1) vs (4) on uncached inputs)

  private def collectAt(name: String, partitions: Int): Seq[Seq[Any]] = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", partitions.toString)
    try graft.SparkEntry.queries(name)(spark, Sf).collect().toSeq.map(_.toSeq)
    finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("partition-sensitive queries are bit-identical at 3 vs 13 shuffle partitions") {
    for (name <- sensitive) {
      val a = collectAt(name, 3)
      val b = collectAt(name, 13)
      assert(a == b,
        s"$name differs across shuffle widths (3 vs 13): " +
          s"first diff=${a.zip(b).indexWhere { case (x, y) => x != y }} " +
          s"sizes=${a.size}/${b.size}")
    }
  }
}
