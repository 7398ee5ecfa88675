package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators beyond filtering/dedup: importance-weighted
  * data selection (DSIR), perplexity-tier bucketing (CCNet), and
  * k-anonymity suppression. All operators are set-oriented with bounded
  * driver traffic: the only collected structures are the hashed-feature
  * weight table (≤ `buckets` rows) and per-(lang, bin) histograms —
  * both constant-size in the corpus, so every shape here survives a
  * 100 TB input unchanged.
  *
  * References (public methods, re-expressed Spark-first):
  *   - DSIR: Xie et al., "Data Selection for Language Models via
  *     Importance Resampling" (NeurIPS 2023) — hashed n-gram bag models
  *     for the target/raw distributions, select by importance weight.
  *   - CCNet: Wenzek et al., "CCNet: Extracting High Quality Monolingual
  *     Datasets from Web Crawl Data" (LREC 2020) — per-language LM
  *     perplexity tertiles (head / middle / tail).
  */
object Curation {

  /** Engine-portable hashed feature bucket: first two hex chars of the
    * token's md5 → 256 buckets. A string key keeps the draw identical in
    * any engine that has md5, the same trick as the corpus samplers.
    */
  def hashBucket(tok: Column): Column = substring(md5(tok), 1, 2)

  /** DSIR per-bucket log importance weights ln p_target(b) − ln p_raw(b)
    * over hashed unigram buckets with add-half smoothing. `isTarget`
    * marks the rows that define the target distribution (the
    * high-quality domain sample); the raw distribution is the whole
    * input. Output: (b, logw), at most 256 rows — broadcast it.
    */
  def dsirBucketWeights(
      docs: DataFrame, textCol: String, isTarget: Column): DataFrame = {
    val toks = docs.select(isTarget.as("is_t"),
      explode(split(col(textCol), " ")).as("tok"))
    val bk = toks.select(col("is_t"), hashBucket(col("tok")).as("b"))
    val counts = bk.groupBy(col("b"))
      .agg(count(lit(1)).as("rc"),
        sum(when(col("is_t"), 1L).otherwise(0L)).as("tc"))
    val totals = counts.agg(sum(col("rc")), sum(col("tc"))).first()
    val (rTot, tTot) = (totals.getLong(0), totals.getLong(1))
    // add-half smoothing over the full 256-bucket support
    counts.select(col("b"),
      (log((col("tc") + 0.5) / (tTot + 128.0))
        - log((col("rc") + 0.5) / (rTot + 128.0))).as("logw"))
  }

  /** Per-document DSIR importance: sum of bucket log-weights over the
    * document's tokens (the log of the product-of-ratios importance
    * weight). The weight table joins broadcast; the heavy side is one
    * explode + one aggregation keyed on the doc id.
    */
  def dsirScores(
      docs: DataFrame, textCol: String, idCol: String,
      weights: DataFrame): DataFrame =
    docs.select(col(idCol), explode(split(col(textCol), " ")).as("tok"))
      .withColumn("b", hashBucket(col("tok")))
      .join(broadcast(weights), Seq("b"))
      .groupBy(col(idCol))
      .agg(round(sum(col("logw")), 6).as("logw_sum"),
        count(lit(1)).as("n_tokens"))

  /** Fixed-point (micro-nat) variant of the weight table for exact
    * integer scoring: logw quantized to CAST(ROUND(logw·10⁶) AS LONG).
    * Integer sums are order-independent, so a streaming fold and a batch
    * aggregation over the same tokens agree bit-for-bit — the same
    * fixed-point trick as the impact-indexed BM25 tier.
    */
  def dsirMicroWeights(
      docs: DataFrame, textCol: String, isTarget: Column): DataFrame =
    dsirBucketWeights(docs, textCol, isTarget)
      .select(col("b"), round(col("logw") * 1e6).cast("long").as("qw"))

  /** CCNet-style perplexity-tier bucketing. Input: one row per doc with
    * (idCol, langCol, score6) where score6 is a per-doc mean log-prob
    * already rounded to 6 decimals (higher = more fluent). Docs are
    * histogrammed into coarse score bins (round(score·10)), the
    * per-language bin histogram — #langs × #bins rows, constant in
    * corpus size — is ranked best-bin-first, and each bin lands in
    *   head   if its whole bin fits in the best third,
    *   tail   if it starts in the worst third,
    *   middle otherwise,
    * using integer cumulative counts only (no float boundary can flip
    * between engines). Output adds (bin, ppl_bucket) per doc.
    */
  def pplBuckets(
      scored: DataFrame, idCol: String, langCol: String,
      scoreCol: String): DataFrame = {
    val binned = scored.withColumn("bin",
      round(col(scoreCol) * 10).cast("long"))
    val hist = binned.groupBy(col(langCol), col("bin"))
      .agg(count(lit(1)).as("cnt"))
    // tiny aggregated table: the window runs over #langs × #bins rows
    val w = Window.partitionBy(col(langCol)).orderBy(col("bin").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val n = Window.partitionBy(col(langCol))
    val assigned = hist
      .withColumn("cum_before", coalesce(sum(col("cnt")).over(w), lit(0L)))
      .withColumn("n", sum(col("cnt")).over(n))
      .withColumn("ppl_bucket",
        when((col("cum_before") + col("cnt")) * 3 <= col("n"), lit("head"))
          .when(col("cum_before") * 3 >= col("n") * 2, lit("tail"))
          .otherwise(lit("middle")))
      .select(col(langCol), col("bin"), col("ppl_bucket"))
    binned.join(broadcast(assigned), Seq(langCol, "bin"))
  }

  /** k-anonymity suppression: rows whose quasi-identifier combination
    * has fewer than k members get every QI column replaced by "*". One
    * aggregation on the QI key plus one join back — the group-size table
    * shares the aggregation's partitioning, so no extra shuffle.
    */
  def kAnonymize(df: DataFrame, qiCols: Seq[String], k: Int): DataFrame = {
    val sizes = df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("qi_n"))
    val joined = df.join(sizes, qiCols)
    val suppressed = col("qi_n") < k
    qiCols.foldLeft(joined) { (d, c) =>
      d.withColumn(c,
        when(suppressed, lit("*")).otherwise(col(c).cast("string")))
    }.withColumn("suppressed", suppressed).drop("qi_n")
  }

  /** l-diversity audit — the attribute-disclosure check k-anonymity
    * can't make: a QI group where every member shares one sensitive
    * value leaks that value even at size ≥ k (Machanavajjhala et al.
    * 2007, "l-Diversity: Privacy Beyond k-Anonymity"). Per QI group:
    * size, distinct sensitive values, and the distinct-l flag. One
    * aggregation keyed on the QI columns; count_distinct partials-
    * and-merges like any declarative agg, so the report is one shuffle
    * and O(#groups) rows at any corpus size.
    */
  def lDiversityReport(df: DataFrame, qiCols: Seq[String],
      sensitiveCol: String, l: Int): DataFrame =
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col(sensitiveCol)).as("n_sensitive"))
      .withColumn("l_diverse", col("n_sensitive") >= l)

  /** t-closeness audit — the distribution-disclosure check l-diversity
    * can't make: a QI group can hold ≥ l distinct sensitive values yet
    * still skew far from the corpus-wide distribution (90% of one
    * source where the corpus holds 20%), leaking the attribute
    * probabilistically (Li, Li & Venkatasubramanian 2007). For a
    * categorical sensitive attribute the Earth Mover's Distance reduces
    * to total-variation distance: EMD(g) = ½·Σᵥ |p_g(v) − p(v)|.
    *
    * Exact-integer form: with c = count(g,v), n = |g|, C = count(v),
    * N = |corpus|, each term is |c·N − C·n| / (n·N), so the per-group
    * numerator Σᵥ|c·N − C·n| is an exact BIGINT and the t ≤ 1/5 gate is
    * the pure-integer comparison 5·Σ ≤ 2·n·N — no float enters the
    * decision. Overflow bound: c·N ≤ N², safe in BIGINT to N ≈ 3×10⁹
    * rows; beyond that widen to DECIMAL(38) (the q_ab_test pattern).
    *
    * Scale shape: one (QI, v) count shuffle; the group×value frame is
    * #groups × #values — audit-sized, never corpus-sized — built by
    * broadcasting the tiny global value histogram.
    */
  def tClosenessReport(df: DataFrame, qiCols: Seq[String],
      sensitiveCol: String, tNum: Int, tDen: Int): DataFrame = {
    require(tNum >= 0 && tDen >= 1, "t must be a non-negative rational")
    val qi = qiCols.map(col)
    val gv = df.groupBy(qi :+ col(sensitiveCol): _*).agg(count(lit(1)).as("c"))
    val g = gv.groupBy(qi: _*).agg(sum(col("c")).as("ng"))
    val v = gv.groupBy(col(sensitiveCol)).agg(sum(col("c")).as("cv"))
    val tot = gv.agg(sum(col("c")).as("nn"))
    g.crossJoin(broadcast(v))
      .join(gv, qiCols :+ sensitiveCol, "left").na.fill(0L, Seq("c"))
      .crossJoin(broadcast(tot))
      .groupBy(qi :+ col("ng") :+ col("nn"): _*)
      .agg(sum(abs(col("c") * col("nn") - col("cv") * col("ng"))).as("emd_num"))
      .select(qi ++ Seq(
        col("ng").as("n_docs"), col("emd_num"),
        round(col("emd_num").cast("double") / (lit(2.0) * col("ng") * col("nn")), 6)
          .as("emd"),
        (col("emd_num") * tDen <= col("ng") * col("nn") * (2L * tNum))
          .as("t_close")): _*)
  }

  /** Seeded discrete-Laplace noise for ε-DP count release (ε = ln 2):
    * Z = G₁ − G₂ with G₁, G₂ iid Geometric(1/2) over {0, 1, …} — the
    * classic construction of the two-sided geometric / discrete
    * Laplace distribution, the exact-integer mechanism for counting
    * queries (Ghosh–Roughgarden–Sundararajan's universally optimal
    * mechanism). Each geometric sample is the leading-zero count of a
    * uniform 32-bit word carved from md5(key ‖ salt): P(k leading
    * zeros) = 2^−(k+1). Everything is integer bit arithmetic, so the
    * noise replays bit-exact in any engine — "seeded DP", the
    * reproducible-release variant (same key + salt ⇒ same noise).
    * Sensitivity-1 counts get ε = ln(1/α) with α = 1/2.
    *
    * SECURITY CONTRACT: the ε-DP guarantee holds ONLY while `salt`
    * stays secret. The noise is a deterministic function of
    * (key, salt), so anyone who learns the salt can subtract the
    * noise and recover the exact count. There is deliberately no
    * default — the caller must supply a per-release secret and
    * rotate it each release epoch (reusing a salt across releases
    * composes the ε budgets of everything released under it).
    * The `privacy_dp_counts`/`stream_dp_counts` correctness gates
    * pass a fixed PUBLIC salt and emit the true count alongside the
    * noised one — that is test-gate plumbing for bit-exact oracle
    * replay, not a shape any production release may copy.
    */
  def dpGeometricNoise(key: Column, salt: String): Column = {
    val h = md5(concat(key.cast("string"), lit(salt)))
    // leading zeros of the 32-bit word at hex offset `off`: bin() drops
    // leading zero bits, ltrim handles the v = 0 word (32 zeros)
    def lead0(off: Int): Column = {
      val v = conv(substring(h, off, 8), 16, 10).cast("long")
      lit(32) - length(ltrim(bin(v), "0"))
    }
    (lead0(1) - lead0(9)).cast("long")
  }
}
