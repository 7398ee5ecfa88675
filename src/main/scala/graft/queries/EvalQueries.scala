package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Model-evaluation tier: the measurement loop every filter-model
  * pipeline needs before it trusts a classifier at corpus scale —
  * exact AUC, a precision/recall operating-point sweep, and score
  * calibration. The model under test is the engine's hashed linear
  * quality classifier ([[graft.ops.TextOps.hashedLinearScore]]) scored
  * against the rule-based Gopher gate's keep decision as ground truth
  * (the standard bootstrap: rules label, a model generalizes, eval
  * decides whether the model may replace the rules).
  *
  * Everything is exact-integer sufficient statistics + one final double
  * per metric, so every query carries a full DuckDB oracle:
  *   - AUC via the Mann–Whitney rank-sum identity over the engine's
  *     distributed exact rank ([[graft.ops.Rank.rankGlobal]] — a range-
  *     partitioned sort, never a single-partition window), with exact
  *     midrank tie handling in pure integers (2·U is an integer).
  *   - PR sweep and calibration are one score-keyed aggregation each —
  *     at 100 TB the corpus is scanned once, everything downstream
  *     operates on the #distinct-scores / #bins frames.
  */
object EvalQueries {
  import Tables.load

  /** (doc_id, score, label) for the documents corpus, persisted once
    * per sfDir and shared by the three eval gates (each consumes the
    * same classifier pass + rule-gate pass; a per-call recompute would
    * hash every token three times per round). Same deliberate
    * corpus-keyed cache-ownership pattern as
    * [[Shared.exactTokenCounts]].
    */
  private val labeledCache =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]

  private[queries] def labeled(spark: SparkSession, sf: String): DataFrame =
    labeledCache.getOrElseUpdate(sf, {
      val d = load(spark, sf, "documents")
      val scores = graft.ops.TextOps.hashedLinearScore(d, "text", "doc_id")
        .select(col("doc_id"), col("score"))
      val maxFreq = d
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id")).agg(max(col("c")).as("max_tok"))
      val base = d.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        length(col("text")).cast("long").as("n_chars"),
        size(array_distinct(filter(split(col("text"), " "),
          t => t.isInCollection(graft.ops.TextOps.DefaultStopwords))))
          .cast("long").as("ds"))
      scores.join(base, Seq("doc_id")).join(maxFreq, Seq("doc_id"))
        .select(col("doc_id"), col("score"),
          (col("n_tokens") >= 50 && col("n_tokens") <= 100000L &&
            col("n_chars") - col("n_tokens") + 1 >= col("n_tokens") * 3 &&
            col("n_chars") - col("n_tokens") + 1 <= col("n_tokens") * 10 &&
            col("ds") >= 2 &&
            col("max_tok") * 5 <= col("n_tokens")).cast("long").as("label"))
        .persist()
    })

  /** DuckDB replay of [[labeled]]: the FNV-1a/HUGEINT classifier-score
    * CTE (identical text to the text_quality_classifier oracle) joined
    * with the rule-gate replay (identical predicates to the
    * text_quality_filters oracle), ending in
    * `labeled(doc_id, score, label)`.
    */
  private val LabeledSql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
      |),
      |hashed AS (
      |  SELECT doc_id,
      |    CAST(CASE WHEN h >= 9223372036854775808 THEN h - 18446744073709551616 ELSE h END AS BIGINT) AS hs
      |  FROM (
      |    SELECT doc_id,
      |      list_reduce(
      |        list_prepend(CAST(14695981039346656037 AS HUGEINT),
      |          [CAST(unicode(c) AS BIGINT) FOR c IN string_split_regex(t, '')]),
      |        (acc, c) -> ((acc - (acc % 65536) +
      |            CAST(xor(CAST(acc % 65536 AS BIGINT), c) AS HUGEINT))
      |            * 1099511628211) % CAST(18446744073709551616 AS HUGEINT)
      |      ) AS h
      |    FROM tok
      |  )
      |),
      |sc AS (
      |  SELECT doc_id, CAST(SUM(((hs & 63) * 37) % 21 - 10) AS BIGINT) AS score
      |  FROM hashed GROUP BY doc_id
      |),
      |qbase AS (
      |  SELECT doc_id,
      |    CAST(len(string_split(text,' ')) AS BIGINT) n,
      |    CAST(LENGTH(text) AS BIGINT) ch,
      |    CAST(len(list_distinct(list_filter(string_split(text,' '),
      |      t -> list_contains(['the','a','of','and','to','in'], t)))) AS BIGINT) ds
      |  FROM documents),
      |mf AS (
      |  SELECT doc_id, MAX(c) AS max_tok FROM (
      |    SELECT doc_id, t, COUNT(*) AS c FROM tok GROUP BY doc_id, t) g
      |  GROUP BY doc_id),
      |labeled AS (
      |  SELECT s.doc_id, s.score,
      |    CAST((n >= 50 AND n <= 100000)
      |      AND (ch - n + 1 >= n * 3 AND ch - n + 1 <= n * 10)
      |      AND ds >= 2 AND max_tok * 5 <= n AS BIGINT) AS label
      |  FROM sc s JOIN qbase USING (doc_id) JOIN mf USING (doc_id))""".stripMargin

  /** PR-sweep operating points: fixed literal thresholds spanning the
    * classifier's observed score range (sf0.01: [-115, 247], median
    * ~41) with headroom either side. Literal-fixed (not quantiles) so
    * the sweep is a stable contract across corpora and engines.
    */
  private[queries] val Thresholds: Seq[Int] =
    Seq(-100, -50, -25, 0, 25, 50, 75, 100, 150, 200)

  /** Calibration bin width (score units per bin, floor binning). */
  private[queries] val CalibrationBin = 50

  /** One oracle for both PR-sweep twins (eval_pr_curve and its
    * streaming twin): the twins must stay result-identical, so the
    * thresholds and metric formulas live here once.
    */
  /** The labeled → per-score frame → threshold grid → confusion-count
    * CTE prefix shared by every PR-sweep consumer (eval_pr_curve, its
    * streaming twin, eval_best_f1) — thresholds and confusion algebra
    * live here once.
    */
  private[queries] val PrGridCtes: String =
    s"""$LabeledSql,
       |g AS (
       |  SELECT score, SUM(label) AS posc, COUNT(*) - SUM(label) AS negc
       |  FROM labeled GROUP BY score),
       |x AS (
       |  SELECT g.*, v.t FROM g CROSS JOIN (VALUES
       |    ${Thresholds.map(t => s"($t)").mkString(",")}) v(t)),
       |m AS (
       |  SELECT t,
       |    SUM(CASE WHEN score >= t THEN posc ELSE 0 END) AS tp,
       |    SUM(CASE WHEN score >= t THEN negc ELSE 0 END) AS fp,
       |    SUM(CASE WHEN score < t THEN posc ELSE 0 END) AS fn,
       |    SUM(CASE WHEN score < t THEN negc ELSE 0 END) AS tn
       |  FROM x GROUP BY t)""".stripMargin

  private[queries] val PrCurveOracle: String =
    s"""$PrGridCtes
       |SELECT CAST(t AS INT) AS t, CAST(tp AS BIGINT) AS tp,
       |  CAST(fp AS BIGINT) AS fp, CAST(fn AS BIGINT) AS fn,
       |  CAST(tn AS BIGINT) AS tn,
       |  CASE WHEN tp + fp > 0 THEN ROUND(tp / CAST(tp + fp AS DOUBLE), 6) END AS precision,
       |  CASE WHEN tp + fn > 0 THEN ROUND(tp / CAST(tp + fn AS DOUBLE), 6) END AS recall,
       |  CASE WHEN tp * 2 + fp + fn > 0
       |    THEN ROUND(tp * 2 / CAST(tp * 2 + fp + fn AS DOUBLE), 6) END AS f1
       |FROM m ORDER BY t""".stripMargin

  /** The confusion-counts → metrics projection shared by both PR-sweep
    * twins (applied to a frame with t/tp/fp/fn/tn columns).
    */
  private[queries] def prMetrics(df: DataFrame): DataFrame =
    df.select(col("t"), col("tp"), col("fp"), col("fn"), col("tn"),
      when(col("tp") + col("fp") > 0,
        round(col("tp") / (col("tp") + col("fp")).cast("double"), 6))
        .as("precision"),
      when(col("tp") + col("fn") > 0,
        round(col("tp") / (col("tp") + col("fn")).cast("double"), 6))
        .as("recall"),
      when(col("tp") * 2 + col("fp") + col("fn") > 0,
        round(col("tp") * 2 /
          (col("tp") * 2 + col("fp") + col("fn")).cast("double"), 6))
        .as("f1"))
      .orderBy(col("t"))

  /** DCG position discounts in integer micro-units: w_i =
    * round(10⁶ / log₂(i+1)) for ranks 1..10, frozen as literals so BOTH
    * engines consume the identical table and the NDCG pipeline runs
    * with zero runtime floats until the single final division — the
    * same trick that makes q_pagerank's float-y iteration exact.
    */
  private[queries] val NdcgDiscountsMicro: Seq[Long] = Seq(
    1000000L, 630930L, 500000L, 430677L, 386853L,
    356207L, 333333L, 315465L, 301030L, 289065L)

  def defs: Seq[QueryDef] = Seq(

    // Ranking quality of the BM25 retrieval tier: NDCG@10 per probe,
    // with graded relevance = the count of DISTINCT probe terms the doc
    // contains (linear gain — exact, oracle-replayable, and
    // discriminative on this corpus where matches run 3..27 against
    // probe vocabularies of 16..27, so capped/quartile gradings
    // saturate and collapse the metric to 1.0). DCG/IDCG
    // are integer micro-unit sums (rel × frozen discount weights), so
    // the only float is the final DCG/IDCG division. The ideal ranking
    // never sorts whole candidate sets under a window: GroupedTopK's
    // bounded heaps take the per-probe top-10 first, the row_number
    // runs on ≤10 rows per probe. The BM25 ranking and its oracle CTEs
    // are the ones the retrieval gates already verify.
    QueryDef("eval_ndcg",
      (spark, sf) => {
        import org.apache.spark.sql.expressions.Window
        // r <= 10 of the shared persisted top-20 ≡ bm25TopK(k = 10):
        // the per-probe order is total (6-dp score desc, unique doc_id),
        // so the prefix rows and their ranks are identical (r22,
        // RetrievalLayouts)
        val ranked = RetrievalLayouts.bm25Top20(spark, sf)
          .filter(col("r") <= 10)
          .select(col("probe_id"), col("doc_id"), col("r"))
        // shared integer relevance labels (exact — see RetrievalLayouts)
        val rels = RetrievalLayouts.probeRels(spark, sf)
        def w(rank: org.apache.spark.sql.Column) =
          NdcgDiscountsMicro.zipWithIndex.foldLeft(lit(0L)) {
            case (acc, (wv, i)) => when(rank === (i + 1), lit(wv)).otherwise(acc)
          }
        val dcg = ranked.join(rels, Seq("probe_id", "doc_id"), "left")
          .na.fill(0L, Seq("rel"))
          .select(col("probe_id"), (col("rel") * w(col("r"))).as("g"))
          .groupBy(col("probe_id")).agg(sum(col("g")).as("dcg_micro"))
        val ideal = graft.plans.GroupedTopK(rels, Seq("probe_id"),
          Seq(("rel", false), ("doc_id", true)), 10)
        val iw = Window.partitionBy(col("probe_id"))
          .orderBy(desc("rel"), col("doc_id"))
        val idcg = ideal.withColumn("ir", row_number().over(iw))
          .select(col("probe_id"), (col("rel") * w(col("ir"))).as("g"))
          .groupBy(col("probe_id")).agg(sum(col("g")).as("idcg_micro"))
        dcg.join(idcg, Seq("probe_id"))
          .select(col("probe_id"), col("dcg_micro"), col("idcg_micro"),
            round(col("dcg_micro") / col("idcg_micro").cast("double"), 6)
              .as("ndcg"))
          .orderBy(col("probe_id"))
      },
      Some {
        val wmap = NdcgDiscountsMicro.zipWithIndex
          .map { case (wv, i) => s"(${i + 1}, $wv)" }.mkString(",")
        s"""${Shared.ProbeBm25ScoredCtes},
           |ranked AS (
           |  SELECT probe_id, doc_id, r FROM (
           |    SELECT probe_id, doc_id,
           |      ROW_NUMBER() OVER (PARTITION BY probe_id
           |                         ORDER BY score DESC, doc_id) AS r
           |    FROM scored)
           |  WHERE r <= 10),
           |rels AS (
           |  SELECT pt.probe_id, t.doc_id,
           |    CAST(COUNT(DISTINCT t.term) AS BIGINT) AS rel
           |  FROM terms t JOIN probe_terms pt USING (term)
           |  WHERE t.doc_id <> pt.probe_id
           |  GROUP BY pt.probe_id, t.doc_id),
           |wmap AS (SELECT * FROM (VALUES $wmap) w(r, wt)),
           |dcg AS (
           |  SELECT ranked.probe_id,
           |    SUM(COALESCE(rel, 0) * wt) AS dcg_micro
           |  FROM ranked JOIN wmap USING (r)
           |  LEFT JOIN rels USING (probe_id, doc_id)
           |  GROUP BY ranked.probe_id),
           |ideal AS (
           |  SELECT probe_id, SUM(rel * wt) AS idcg_micro FROM (
           |    SELECT probe_id, rel,
           |      ROW_NUMBER() OVER (PARTITION BY probe_id
           |                         ORDER BY rel DESC, doc_id) AS r
           |    FROM rels) i JOIN wmap USING (r)
           |  WHERE r <= 10
           |  GROUP BY probe_id)
           |SELECT probe_id, CAST(dcg_micro AS BIGINT) AS dcg_micro,
           |  CAST(idcg_micro AS BIGINT) AS idcg_micro,
           |  ROUND(dcg_micro / CAST(idcg_micro AS DOUBLE), 6) AS ndcg
           |FROM dcg JOIN ideal USING (probe_id) ORDER BY probe_id""".stripMargin
      }),

    // Exact ROC AUC by the Mann–Whitney rank-sum identity: rank all
    // scores under the total order (score, doc_id) with the engine's
    // distributed exact rank, collapse to per-distinct-score
    // (min-rank, count, positives) — ranks of a tie group are
    // contiguous under that sort, so the group's midrank·2 is the
    // integer 2·minr + cnt − 1 — and AUC = (2·R⁺ − n⁺(n⁺+1)) /
    // (2·n⁺·n⁻) with exact tie handling. Everything up to the single
    // final division is BIGINT (u2 is emitted for the oracle to check
    // exactly); no single-partition window anywhere — the rank is a
    // range-partitioned sort + O(partitions) offsets.
    // MRR of the BM25 retrieval ranking — the "how deep is the first
    // GOOD result" audit next to eval_ndcg's whole-ranking gain curve.
    // "Relevant" is the integer containment test 2·rel ≥ |probe terms|
    // (the candidate shares at least half the probe's distinct terms) —
    // no float threshold. Per-probe first-relevant rank and reciprocal
    // rank (one division); probes whose top-10 holds no relevant doc
    // emit NULLs, counted rather than dropped. Same one-pass lineage
    // and oracle CTEs the retrieval gates verify; the rank join touches
    // ≤ 10 rows per probe.
    QueryDef("eval_mrr",
      (spark, sf) => {
        // prefix of the shared top-20 — same equivalence as eval_ndcg
        val ranked = RetrievalLayouts.bm25Top20(spark, sf)
          .filter(col("r") <= 10)
          .select(col("probe_id"), col("doc_id"), col("r"))
        // shared integer relevance labels (exact — see RetrievalLayouts)
        val rels = RetrievalLayouts.probeRels(spark, sf)
        val ptn = RetrievalLayouts.probeTermCounts(spark, sf)
        val first = ranked.join(rels, Seq("probe_id", "doc_id"))
          .join(broadcast(ptn), Seq("probe_id"))
          .filter(col("rel") * 2 >= col("npt"))
          .groupBy(col("probe_id")).agg(min(col("r")).as("first_rel_rank"))
        ptn.join(first, Seq("probe_id"), "left")
          .select(col("probe_id"), col("npt"),
            col("first_rel_rank").cast("int").as("first_rel_rank"),
            round(lit(1.0) / col("first_rel_rank"), 6).as("rr"))
          .orderBy(col("probe_id"))
      },
      Some(s"""${Shared.ProbeBm25ScoredCtes},
             |ranked AS (
             |  SELECT probe_id, doc_id, r FROM (
             |    SELECT probe_id, doc_id,
             |      ROW_NUMBER() OVER (PARTITION BY probe_id
             |                         ORDER BY score DESC, doc_id) AS r
             |    FROM scored)
             |  WHERE r <= 10),
             |rels AS (
             |  SELECT pt.probe_id, t.doc_id,
             |    CAST(COUNT(DISTINCT t.term) AS BIGINT) AS rel
             |  FROM terms t JOIN probe_terms pt USING (term)
             |  WHERE t.doc_id <> pt.probe_id
             |  GROUP BY pt.probe_id, t.doc_id),
             |ptn AS (SELECT probe_id, CAST(COUNT(DISTINCT term) AS BIGINT) npt
             |  FROM probe_terms GROUP BY 1),
             |fr AS (
             |  SELECT r.probe_id, MIN(r.r) AS first_rel
             |  FROM ranked r JOIN rels USING (probe_id, doc_id)
             |  JOIN ptn USING (probe_id)
             |  WHERE rel * 2 >= npt GROUP BY 1)
             |SELECT ptn.probe_id, ptn.npt,
             |  CAST(fr.first_rel AS INT) AS first_rel_rank,
             |  ROUND(1.0 / fr.first_rel, 6) AS rr
             |FROM ptn LEFT JOIN fr USING (probe_id)
             |ORDER BY probe_id""".stripMargin)),

    QueryDef("eval_auc",
      (spark, sf) => {
        val ranked = graft.ops.Rank.rankGlobal(
          labeled(spark, sf), Seq(col("score"), col("doc_id")), "r")
        ranked.groupBy(col("score"))
          .agg(min(col("r")).as("minr"), count(lit(1)).as("cnt"),
            sum(col("label")).as("posc"))
          .agg(sum(col("posc")).as("n_pos"),
            sum(col("cnt") - col("posc")).as("n_neg"),
            sum(col("posc") * (col("minr") * 2 + col("cnt") - 1)).as("rp2"))
          .select(col("n_pos"), col("n_neg"),
            (col("rp2") - col("n_pos") * (col("n_pos") + 1)).as("u2"),
            when(col("n_pos") > 0 && col("n_neg") > 0,
              round((col("rp2") - col("n_pos") * (col("n_pos") + 1)) /
                (col("n_pos") * col("n_neg") * 2.0), 6)).as("auc"))
      },
      Some(s"""$LabeledSql,
             |ranked AS (
             |  SELECT score, label,
             |    RANK() OVER (ORDER BY score) AS minr,
             |    COUNT(*) OVER (PARTITION BY score) AS cnt
             |  FROM labeled),
             |g AS (
             |  SELECT score, MIN(minr) AS minr, COUNT(*) AS cnt,
             |    SUM(label) AS posc
             |  FROM ranked GROUP BY score),
             |agg AS (
             |  SELECT SUM(posc) AS n_pos, SUM(cnt - posc) AS n_neg,
             |    SUM(posc * (minr * 2 + cnt - 1)) AS rp2
             |  FROM g)
             |SELECT CAST(n_pos AS BIGINT) AS n_pos, CAST(n_neg AS BIGINT) AS n_neg,
             |  CAST(rp2 - n_pos * (n_pos + 1) AS BIGINT) AS u2,
             |  CASE WHEN n_pos > 0 AND n_neg > 0
             |    THEN ROUND((rp2 - n_pos * (n_pos + 1)) / (n_pos * n_neg * 2.0), 6)
             |  END AS auc
             |FROM agg""".stripMargin)),

    // Precision/recall/F1 sweep over fixed operating thresholds
    // (predict positive at score ≥ t): the corpus collapses to a
    // per-distinct-score (positives, negatives) frame in ONE shuffle;
    // the #scores × #thresholds grid and the confusion counts live
    // entirely on that tiny frame. Counts are exact BIGINTs; each
    // metric is one division of two integers (bit-exact cross-engine),
    // null where its denominator is empty.
    QueryDef("eval_pr_curve",
      (spark, sf) => {
        val g = labeled(spark, sf).groupBy(col("score"))
          .agg(sum(col("label")).as("posc"),
            (count(lit(1)) - sum(col("label"))).as("negc"))
        prMetrics(g.select(col("score"), col("posc"), col("negc"),
            explode(array(Thresholds.map(lit): _*)).as("t"))
          .groupBy(col("t"))
          .agg(
            sum(when(col("score") >= col("t"), col("posc")).otherwise(0L)).as("tp"),
            sum(when(col("score") >= col("t"), col("negc")).otherwise(0L)).as("fp"),
            sum(when(col("score") < col("t"), col("posc")).otherwise(0L)).as("fn"),
            sum(when(col("score") < col("t"), col("negc")).otherwise(0L)).as("tn")))
      },
      Some(PrCurveOracle)),

    // Operating-point selection: the threshold the PR sweep would
    // actually deploy — argmax-F1 over the grid, ties to the lower
    // threshold (favor recall). Selection orders by the UNROUNDED
    // F1 double: one division of exact integers is bit-identical
    // cross-engine, so the argmax is deterministic without comparing
    // rounded values. Same one-shuffle economics as eval_pr_curve; the
    // argmax runs on the 10-row grid.
    QueryDef("eval_best_f1",
      (spark, sf) => {
        val g = labeled(spark, sf).groupBy(col("score"))
          .agg(sum(col("label")).as("posc"),
            (count(lit(1)) - sum(col("label"))).as("negc"))
        val grid = g.select(col("score"), col("posc"), col("negc"),
            explode(array(Thresholds.map(lit): _*)).as("t"))
          .groupBy(col("t"))
          .agg(
            sum(when(col("score") >= col("t"), col("posc")).otherwise(0L)).as("tp"),
            sum(when(col("score") >= col("t"), col("negc")).otherwise(0L)).as("fp"),
            sum(when(col("score") < col("t"), col("posc")).otherwise(0L)).as("fn"),
            sum(when(col("score") < col("t"), col("negc")).otherwise(0L)).as("tn"))
        grid
          .withColumn("f1x",
            col("tp") * 2 / (col("tp") * 2 + col("fp") + col("fn")).cast("double"))
          .orderBy(col("f1x").desc, col("t")).limit(1)
          .select(col("t").as("best_t"),
            col("tp"), col("fp"), col("fn"), col("tn"),
            round(col("tp") / (col("tp") + col("fp")).cast("double"), 6)
              .as("precision"),
            round(col("tp") / (col("tp") + col("fn")).cast("double"), 6)
              .as("recall"),
            round(col("f1x"), 6).as("f1"),
            round((col("tp") + col("tn")) /
              (col("tp") + col("fp") + col("fn") + col("tn")).cast("double"), 6)
              .as("accuracy"))
      },
      Some(s"""$PrGridCtes,
             |s AS (SELECT *, tp * 2 / CAST(tp * 2 + fp + fn AS DOUBLE) AS f1x
             |  FROM m ORDER BY f1x DESC, t LIMIT 1)
             |SELECT CAST(t AS INT) AS best_t, CAST(tp AS BIGINT) AS tp,
             |  CAST(fp AS BIGINT) AS fp, CAST(fn AS BIGINT) AS fn,
             |  CAST(tn AS BIGINT) AS tn,
             |  ROUND(tp / CAST(tp + fp AS DOUBLE), 6) AS precision,
             |  ROUND(tp / CAST(tp + fn AS DOUBLE), 6) AS recall,
             |  ROUND(f1x, 6) AS f1,
             |  ROUND((tp + tn) / CAST(tp + fp + fn + tn AS DOUBLE), 6) AS accuracy
             |FROM s""".stripMargin)),

    // Score calibration / reliability table: fixed-width score bins
    // (floor division — FLOOR(score/50.0) is exact for integer scores,
    // and matches across engines where a SQL `div` would not: SQL div
    // truncates toward zero, DuckDB // floors), each bin reporting its
    // population, empirical positive rate and mean score — the
    // reliability-diagram input that says WHERE the classifier's score
    // actually tracks the label. One score-keyed shuffle; integer
    // sums; two single divisions per bin.
    QueryDef("eval_calibration",
      (spark, sf) => {
        labeled(spark, sf)
          .withColumn("bin",
            floor(col("score") / lit(CalibrationBin.toDouble)).cast("long"))
          .groupBy(col("bin"))
          .agg(count(lit(1)).as("cnt"), sum(col("label")).as("pos"),
            sum(col("score")).as("ssum"))
          .select(col("bin"), col("cnt"), col("pos"),
            round(col("ssum") / col("cnt").cast("double"), 6).as("mean_score"),
            round(col("pos") / col("cnt").cast("double"), 6).as("pos_rate"))
          .orderBy(col("bin"))
      },
      Some(s"""$LabeledSql
             |SELECT CAST(FLOOR(score / $CalibrationBin.0) AS BIGINT) AS bin,
             |  CAST(COUNT(*) AS BIGINT) AS cnt, CAST(SUM(label) AS BIGINT) AS pos,
             |  ROUND(SUM(score) / CAST(COUNT(*) AS DOUBLE), 6) AS mean_score,
             |  ROUND(SUM(label) / CAST(COUNT(*) AS DOUBLE), 6) AS pos_rate
             |FROM labeled GROUP BY 1 ORDER BY bin""".stripMargin)),

    // Tokenizer fertility / compression audit: pieces-per-word and
    // chars-per-piece per language under the engine's BPE merge list —
    // the metric a tokenizer team watches per language before training
    // (high fertility = the vocab under-serves that language). Scale
    // shape: the corpus collapses to the (lang, word) frequency table
    // ONCE; BPE encoding runs on the DISTINCT word table only (Heaps'
    // law — the bpeTrain/unigramVocabCosts budget) and joins back by
    // word. Everything is exact integers until the two final divisions;
    // the oracle replays the ranked merges as the same nested
    // single-pass replaces text_bpe_encode already proves equivalent.
    QueryDef("eval_tokenizer_fertility",
      (spark, sf) => {
        import spark.implicits._
        val words = load(spark, sf, "documents")
          .select(col("lang"),
            explode(filter(split(lower(col("text")), "[^a-z]+"),
              t => t =!= "")).as("word"))
        val wc = words.groupBy(col("lang"), col("word"))
          .agg(count(lit(1)).as("freq"))
        // the distinct is a 32-partition shuffle, so the typed encode
        // pass below is already spread — no small-file respread needed
        val enc = wc.select(col("word")).distinct()
          .as[String]
          .map { w =>
            (w, graft.ops.Subword
              .encodeBpe(w, graft.ops.Subword.DefaultMerges).length.toLong,
              w.length.toLong)
          }.toDF("word", "np", "nc")
        wc.join(enc, Seq("word"))
          .groupBy(col("lang"))
          .agg(sum(col("freq")).as("n_words"),
            sum(col("freq") * col("np")).as("n_pieces"),
            sum(col("freq") * col("nc")).as("n_chars"))
          .select(col("lang"), col("n_words"), col("n_pieces"), col("n_chars"),
            round(col("n_pieces") / col("n_words").cast("double"), 6)
              .as("fertility"),
            round(col("n_chars") / col("n_pieces").cast("double"), 6)
              .as("chars_per_piece"))
          .orderBy(col("lang"))
      },
      Some {
        val spaced = "regexp_replace(word, '(.)', ' \\1 ', 'g')"
        val replaced = graft.ops.Subword.DefaultMerges.foldLeft(spaced) {
          case (acc, (l, r)) => s"replace($acc, ' $l  $r ', ' $l$r ')"
        }
        s"""WITH toks AS (
           |  SELECT lang, unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS word
           |  FROM documents),
           |wc AS (SELECT lang, word, COUNT(*) AS freq
           |       FROM toks WHERE word <> '' GROUP BY 1, 2),
           |enc AS (
           |  SELECT word,
           |    CAST(len(string_split(trim($replaced), '  ')) AS BIGINT) AS np,
           |    CAST(len(word) AS BIGINT) AS nc
           |  FROM (SELECT DISTINCT word FROM wc)),
           |a AS (
           |  SELECT lang, SUM(freq) AS n_words, SUM(freq * np) AS n_pieces,
           |    SUM(freq * nc) AS n_chars
           |  FROM wc JOIN enc USING (word) GROUP BY lang)
           |SELECT lang, CAST(n_words AS BIGINT) AS n_words,
           |  CAST(n_pieces AS BIGINT) AS n_pieces,
           |  CAST(n_chars AS BIGINT) AS n_chars,
           |  ROUND(n_pieces / CAST(n_words AS DOUBLE), 6) AS fertility,
           |  ROUND(n_chars / CAST(n_pieces AS DOUBLE), 6) AS chars_per_piece
           |FROM a ORDER BY lang""".stripMargin
      }),

    // Spearman rank correlation between the learned quality score and
    // raw document length — the confound audit ("is the classifier
    // just measuring length?") every learned filter needs before it
    // replaces a rule. Both rankings are exact distributed ranks under
    // doc_id-tie-broken total orders (documented: the tie-broken
    // Spearman variant, so the classic 1 − 6Σd²/(n(n²−1)) identity is
    // exact); Σd² and n are BIGINTs the oracle checks exactly, ρ is
    // one final division. Two range-shuffle rank passes + one doc_id
    // join — no single-partition window anywhere.
    QueryDef("eval_rank_correlation",
      (spark, sf) => {
        val base = labeled(spark, sf)
          .join(load(spark, sf, "documents")
            .select(col("doc_id"),
              size(split(col("text"), " ")).cast("long").as("n_tokens")),
            Seq("doc_id"))
        val rx = graft.ops.Rank.rankGlobal(
            base.select(col("doc_id"), col("score")),
            Seq(col("score"), col("doc_id")), "rx")
          .select(col("doc_id"), col("rx"))
        val ry = graft.ops.Rank.rankGlobal(
            base.select(col("doc_id"), col("n_tokens")),
            Seq(col("n_tokens"), col("doc_id")), "ry")
          .select(col("doc_id"), col("ry"))
        rx.join(ry, Seq("doc_id"))
          .agg(count(lit(1)).as("n"),
            sum((col("rx") - col("ry")) * (col("rx") - col("ry")))
              .as("sum_d2"))
          .select(col("n"), col("sum_d2"),
            when(col("n") > 1,
              round(lit(1.0) - col("sum_d2") * 6.0 /
                (col("n") * (col("n") * col("n") - 1)), 6)).as("rho"))
      },
      Some(s"""$LabeledSql,
             |base AS (
             |  SELECT l.doc_id, l.score,
             |    CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens
             |  FROM labeled l JOIN documents d USING (doc_id)),
             |rx AS (SELECT doc_id,
             |    ROW_NUMBER() OVER (ORDER BY score, doc_id) AS rx FROM base),
             |ry AS (SELECT doc_id,
             |    ROW_NUMBER() OVER (ORDER BY n_tokens, doc_id) AS ry FROM base),
             |j AS (SELECT rx.rx, ry.ry FROM rx JOIN ry USING (doc_id))
             |SELECT CAST(COUNT(*) AS BIGINT) AS n,
             |  CAST(SUM((rx - ry) * (rx - ry)) AS BIGINT) AS sum_d2,
             |  CASE WHEN COUNT(*) > 1 THEN
             |    ROUND(1.0 - SUM((rx - ry) * (rx - ry)) * 6.0 /
             |      (COUNT(*) * (COUNT(*) * COUNT(*) - 1)), 6)
             |  END AS rho
             |FROM j""".stripMargin)),

    // kNN label-consistency audit of the embedding space: for a
    // deterministic 5% query sample, the 5 nearest cosine neighbors
    // (self excluded) vote on the label — majority with the total
    // (count DESC, label ASC) tie-break — and per-true-label accuracy
    // says whether the space actually clusters by label (the go/no-go
    // check before trusting embedding dedup or ANN serving). Same
    // broadcast-queries/one-corpus-scan economics as sim_cosine_topk
    // (the sampled-query brute force IS the eval tier's serving shape);
    // the vote argmax runs through GroupedTopK's bounded heaps.
    // Integer votes + one final division; the oracle replays ranking
    // and vote exactly.
    QueryDef("eval_knn_accuracy",
      (spark, sf) => {
        val emb = load(spark, sf, "embeddings")
        val labels = emb.select(col("vec_id"), col("label"))
        // Fixed probe panel (the r17 decade-leg contract): ids ≡ 3
        // (mod 20) BELOW the sf0.1 population bound — a no-op at every
        // driver SF, but at sf1+ it pins the broadcast side instead of
        // letting the probe×corpus product grow quadratically (the
        // eval_ndcg bug class; caught here by the structural BNLJ audit)
        val nn = graft.ops.Similarity.bruteForceTopK(
          emb, emb.filter(col("vec_id") % 20 === 3 && col("vec_id") < 2000),
          "vec_id", "embedding", k = 5)
        val votes = nn
          .join(labels.withColumnRenamed("vec_id", "neighbor_id"),
            Seq("neighbor_id"))
          .groupBy(col("query_id"), col("label"))
          .agg(count(lit(1)).as("c"))
        val pred = graft.plans.GroupedTopK(votes, Seq("query_id"),
            Seq(("c", false), ("label", true)), 1)
          .select(col("query_id"), col("label").as("pred"))
        pred
          .join(labels.select(col("vec_id").as("query_id"),
            col("label").as("truth")), Seq("query_id"))
          .groupBy(col("truth"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("pred") === col("truth"), 1L).otherwise(0L))
              .as("correct"))
          .select(col("truth"), col("n"), col("correct"),
            round(col("correct") / col("n").cast("double"), 6).as("accuracy"))
          .orderBy(col("truth"))
      },
      Some("""WITH q AS (
             |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) qv,
             |    label AS truth
             |  FROM embeddings WHERE vec_id % 20 = 3 AND vec_id < 2000),
             |c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) cv,
             |        label FROM embeddings),
             |scored AS (
             |  SELECT query_id, neighbor_id, label,
             |    list_dot_product(qv, cv) /
             |      (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) AS sim
             |  FROM c CROSS JOIN q WHERE query_id <> neighbor_id),
             |ranked AS (
             |  SELECT query_id, label, ROW_NUMBER() OVER (
             |    PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS r
             |  FROM scored),
             |votes AS (SELECT query_id, label, COUNT(*) AS c
             |          FROM ranked WHERE r <= 5 GROUP BY 1, 2),
             |pred AS (
             |  SELECT query_id, label AS pred FROM (
             |    SELECT query_id, label, ROW_NUMBER() OVER (
             |      PARTITION BY query_id ORDER BY c DESC, label) AS rn
             |    FROM votes) WHERE rn = 1),
             |e AS (SELECT q.truth, p.pred FROM pred p
             |      JOIN q ON p.query_id = q.query_id)
             |SELECT truth, CAST(COUNT(*) AS BIGINT) AS n,
             |  CAST(SUM(CASE WHEN pred = truth THEN 1 ELSE 0 END) AS BIGINT) AS correct,
             |  ROUND(SUM(CASE WHEN pred = truth THEN 1 ELSE 0 END)
             |    / CAST(COUNT(*) AS DOUBLE), 6) AS accuracy
             |FROM e GROUP BY truth ORDER BY truth""".stripMargin)),

    // Held-out LM perplexity per source: train the bigram LM on the
    // deterministic 80% md5 split, score the held-out 20% with add-one
    // smoothing over the train vocabulary (held-out text contains
    // unseen bigrams by construction — the reason text_bigram_lm's
    // unsmoothed in-corpus scorer can't do model eval), and report
    // cross-entropy + perplexity per source. Counts and the smoothed
    // ratio's terms are exact integers. The one unavoidable float —
    // Σ log p — is NOT an avg() over rows (partition-order-dependent
    // in Spark): the held-out set is collapsed to its distinct
    // (numerator, denominator) integer pairs, each pair contributes
    // m·ln(num/den) once, and BOTH engines fold the per-source term
    // list in ascending sorted order before the single 6-dp round.
    // That makes each engine's sum deterministic and the two sums
    // associate identically; the residual tolerance is libm-ln ulp
    // variance on identical double inputs, absorbed by the 6-dp round
    // (documented: this query is 6-dp tolerance-checked, not bit-exact
    // in the integer-sufficient-statistics sense). The exponential is
    // taken of the ALREADY-ROUNDED mean so both engines exp the
    // identical double. One bigram shuffle for counts, one for the
    // held-out join — the corpus is read once; the fold list is
    // O(#distinct count-pairs per source), tiny by Zipf.
    QueryDef("eval_lm_perplexity",
      (spark, sf) => {
        val arr = split(col("text"), " ")
        val isTrain = graft.ops.TextOps.deterministicSample(
          col("doc_id"), 0.8, salt = "lmeval")
        val bi = load(spark, sf, "documents")
          .select(col("doc_id"), col("source"), explode(arrays_zip(
            slice(arr, lit(1), size(arr) - 1).as("x"),
            slice(arr, lit(2), size(arr) - 1).as("y"))).as("p"))
          .select(col("doc_id"), col("source"),
            col("p.x").as("x"), col("p.y").as("y"))
        val train = bi.filter(isTrain)
        val bc = train.groupBy(col("x"), col("y")).agg(count(lit(1)).as("cxy"))
        val cx = bc.groupBy(col("x")).agg(sum(col("cxy")).as("cx"))
        val v = train.select(col("x").as("t"))
          .unionByName(train.select(col("y").as("t"))).distinct().count()
        bi.filter(!isTrain)
          .join(bc, Seq("x", "y"), "left").na.fill(0L, Seq("cxy"))
          .join(cx, Seq("x"), "left").na.fill(0L, Seq("cx"))
          .groupBy(col("source"),
            (col("cxy") + 1).as("num"), (col("cx") + lit(v)).as("den"))
          .agg(count(lit(1)).as("m"))
          .groupBy(col("source"))
          .agg(sum(col("m")).as("n_bigrams"),
            sort_array(collect_list(col("m").cast("double") *
              log(col("num").cast("double") / col("den").cast("double"))))
              .as("terms"))
          .select(col("source"), col("n_bigrams"),
            round(expr("aggregate(terms, CAST(0.0 AS DOUBLE), (a, t) -> a + t)")
              / col("n_bigrams"), 6).as("mean_logp"))
          .withColumn("ppl", round(exp(-col("mean_logp")), 4))
          .orderBy(col("source"))
      },
      Some {
        val thr = f"${math.round(0.8 * 0xFFFFFFFFL)}%08x"
        s"""WITH toks AS (SELECT doc_id, source, string_split(text, ' ') t
           |  FROM documents),
           |idx AS (SELECT doc_id, source, unnest(range(len(t)-1)) i, t
           |  FROM toks WHERE len(t) >= 2),
           |b AS (SELECT doc_id, source, t[i+1] x, t[i+2] y FROM idx),
           |tr AS (SELECT * FROM b
           |  WHERE substr(md5(CAST(doc_id AS VARCHAR) || 'lmeval'), 1, 8) < '$thr'),
           |he AS (SELECT * FROM b
           |  WHERE NOT substr(md5(CAST(doc_id AS VARCHAR) || 'lmeval'), 1, 8) < '$thr'),
           |bc AS (SELECT x, y, COUNT(*) cxy FROM tr GROUP BY 1, 2),
           |cx AS (SELECT x, SUM(cxy) cx FROM bc GROUP BY 1),
           |v AS (SELECT COUNT(*) v FROM (SELECT x AS t FROM tr UNION SELECT y FROM tr)),
           |g AS (
           |  SELECT h.source, COALESCE(bc.cxy, 0) + 1 AS num,
           |    COALESCE(cx.cx, 0) + (SELECT v FROM v) AS den, COUNT(*) AS m
           |  FROM he h LEFT JOIN bc USING (x, y) LEFT JOIN cx USING (x)
           |  GROUP BY 1, 2, 3),
           |s AS (
           |  SELECT source, SUM(m) AS n_bigrams,
           |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_sort(list(
           |      CAST(m AS DOUBLE) * LN(CAST(num AS DOUBLE) / CAST(den AS DOUBLE))))),
           |      (a, x) -> a + x) AS ssum
           |  FROM g GROUP BY source)
           |SELECT source, CAST(n_bigrams AS BIGINT) AS n_bigrams,
           |  ROUND(ssum / n_bigrams, 6) AS mean_logp,
           |  ROUND(EXP(-ROUND(ssum / n_bigrams, 6)), 4) AS ppl
           |FROM s ORDER BY source""".stripMargin
      }),

    // Corpus-level BLEU-4 sufficient statistics — the generation-eval
    // metric a distillation/translation pipeline computes between model
    // output and references at corpus scale. The candidate here is a
    // deterministic degradation of each reference (every 7th word
    // dropped), so the whole metric is self-oracled. Per n ∈ 1..4 the
    // engine shuffles (doc, n-gram) count frames once and clips
    // candidate counts by reference counts (the modified-precision
    // multiset intersection); outputs are exact BIGINT (mₙ, tₙ) plus
    // per-n precisions, the 4-gram geometric mean via sqrt∘sqrt of a
    // fixed-association product of exact-integer ratios (IEEE sqrt is
    // correctly rounded — no libm ln/exp in the cross-engine path, the
    // eval_lm_perplexity lesson), and the brevity-penalty EXPONENT
    // 1 − ref/cand, leaving exp() to the consumer. At 100 TB each
    // n-gram pass is one scan + one count shuffle; a production run
    // persists the tokenized base across the four passes.
    QueryDef("eval_bleu",
      (spark, sf) => {
        def grams(arr: org.apache.spark.sql.Column, n: Int) =
          when(size(arr) >= n,
            transform(sequence(lit(0), size(arr) - n),
              j => array_join(slice(arr, j + 1, lit(n)), " ")))
            .otherwise(array().cast("array<string>"))
        val base = load(spark, sf, "documents")
          .filter(col("text").isNotNull)
          .select(col("doc_id"), split(col("text"), " ").as("r"))
          .withColumn("c", filter(col("r"), (_, i) => (i + 1) % 7 =!= 0))
        def counts(src: String, n: Int) = base
          .select(col("doc_id"), explode(grams(col(src), n)).as("g"))
          .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("cnt"))
        val perN = (1 to 4).map { n =>
          counts("c", n).withColumnRenamed("cnt", "cc")
            .join(counts("r", n).withColumnRenamed("cnt", "rc"),
              Seq("doc_id", "g"), "left")
            .agg(
              sum(least(col("cc"), coalesce(col("rc"), lit(0L)))).as("m"),
              sum(col("cc")).as("t"))
            .select(lit(n).as("n"), col("m"), col("t"))
        }.reduce(_ unionByName _)
        val lens = base.agg(
          sum(size(col("r"))).cast("long").as("ref_len"),
          sum(size(col("c"))).cast("long").as("cand_len"))
        def p(i: Int) = col(s"m$i").cast("double") / col(s"t$i")
        val aggCols = (1 to 4).flatMap(i => Seq(
          sum(when(col("n") === i, col("m"))).as(s"m$i"),
          sum(when(col("n") === i, col("t"))).as(s"t$i")))
        perN
          .agg(aggCols.head, aggCols.tail: _*)
          .crossJoin(lens)
          .select(
            (1 to 4).flatMap(i => Seq(col(s"m$i"), col(s"t$i"))) ++
              Seq(col("ref_len"), col("cand_len")) ++
              (1 to 4).map(i => round(p(i), 6).as(s"p$i")) ++
              Seq(
                round(sqrt(sqrt(p(1) * p(2) * p(3) * p(4))), 6).as("geo_p4"),
                round(lit(1.0) -
                  col("ref_len").cast("double") / col("cand_len"), 6)
                  .as("bp_log")): _*)
      },
      Some {
        val gramCtes = (1 to 4).flatMap { n =>
          Seq(
            s"""rg$n AS (
               |  SELECT doc_id, list_aggregate(r[j+1:j+$n], 'string_agg', ' ') g,
               |    COUNT(*) rc
               |  FROM (SELECT doc_id, r, unnest(range(len(r)-${n - 1})) j
               |        FROM base WHERE len(r) >= $n)
               |  GROUP BY 1, 2)""".stripMargin,
            s"""cg$n AS (
               |  SELECT doc_id, list_aggregate(c[j+1:j+$n], 'string_agg', ' ') g,
               |    COUNT(*) cc
               |  FROM (SELECT doc_id, c, unnest(range(len(c)-${n - 1})) j
               |        FROM base WHERE len(c) >= $n)
               |  GROUP BY 1, 2)""".stripMargin,
            s"""s$n AS (
               |  SELECT $n AS n, SUM(LEAST(cg.cc, COALESCE(rg.rc, 0))) m,
               |    SUM(cg.cc) t
               |  FROM cg$n cg LEFT JOIN rg$n rg USING (doc_id, g))""".stripMargin)
        }.mkString(",\n")
        def p(i: Int) = s"(CAST(m$i AS DOUBLE) / t$i)"
        s"""WITH d AS (SELECT doc_id, string_split(text, ' ') r
           |  FROM documents WHERE text IS NOT NULL),
           |w AS (SELECT doc_id, unnest(range(len(r))) i, r FROM d),
           |cw AS (SELECT doc_id, i, r[i+1] word FROM w WHERE (i+1) % 7 <> 0),
           |cl AS (SELECT doc_id, list(word ORDER BY i) c FROM cw GROUP BY doc_id),
           |base AS (SELECT d.doc_id, d.r, cl.c FROM d JOIN cl USING (doc_id)),
           |$gramCtes,
           |stats AS (SELECT * FROM s1 UNION ALL SELECT * FROM s2
           |          UNION ALL SELECT * FROM s3 UNION ALL SELECT * FROM s4),
           |agg AS (SELECT
           |  ${(1 to 4).map(i =>
               s"CAST(SUM(CASE WHEN n=$i THEN m END) AS BIGINT) m$i, " +
               s"CAST(SUM(CASE WHEN n=$i THEN t END) AS BIGINT) t$i").mkString(",\n  ")}
           |  FROM stats),
           |lens AS (SELECT CAST(SUM(len(r)) AS BIGINT) ref_len,
           |  CAST(SUM(len(c)) AS BIGINT) cand_len FROM base)
           |SELECT ${(1 to 4).map(i => s"m$i, t$i").mkString(", ")},
           |  ref_len, cand_len,
           |  ${(1 to 4).map(i => s"ROUND(${p(i)}, 6) AS p$i").mkString(",\n  ")},
           |  ROUND(sqrt(sqrt(${p(1)} * ${p(2)} * ${p(3)} * ${p(4)})), 6) AS geo_p4,
           |  ROUND(1.0 - CAST(ref_len AS DOUBLE) / cand_len, 6) AS bp_log
           |FROM agg, lens""".stripMargin
      }),

    // Decile lift chart (gains-table input): documents ranked by
    // classifier score DESCENDING under a doc_id-tie-broken total
    // order through the distributed exact rank (range shuffle — no
    // single-partition window), cut into ten exact-population deciles
    // by integer arithmetic on the rank ((r−1)·10 div n — no quantile
    // approximation), each reporting its population, positives, and
    // lift over the base rate — the "is the top decile actually
    // enriched" readout that decides whether score-ordered curation
    // spends budget better than random. The base-rate attach is the
    // canonical one-row scalar-gate broadcast; lift's numerator and
    // denominator are exact BIGINT products (pos·tot_n < 2⁶³ to ~3·10⁹
    // rows per cell — document past that) with ONE final division.
    // Scale shape: one range-shuffle rank pass, one 10-row aggregation.
    QueryDef("eval_lift_deciles",
      (spark, sf) => {
        val (ranked, n) = graft.ops.Rank.rankGlobalWithCount(
          labeled(spark, sf)
            .select(col("doc_id"), col("score"), col("label"))
            .withColumn("negs", -col("score")),
          Seq(col("negs"), col("doc_id")), "r")
        val dec = ranked
          .select(expr(s"CAST((r - 1) * 10 div ${n}L AS INT)").as("decile"),
            col("label"))
          .groupBy(col("decile"))
          .agg(count(lit(1)).as("cnt"), sum(col("label")).as("pos"))
        val tot = dec.agg(sum(col("cnt")).as("tot_n"),
          sum(col("pos")).as("tot_pos"))
        dec.crossJoin(broadcast(tot))
          .select(col("decile"), col("cnt"), col("pos"),
            round(col("pos") / col("cnt").cast("double"), 6).as("pos_rate"),
            round((col("pos") * col("tot_n")).cast("double") /
              (col("cnt") * col("tot_pos")).cast("double"), 6).as("lift"))
          .orderBy(col("decile"))
      },
      Some(s"""$LabeledSql,
             |r AS (SELECT doc_id, score, label,
             |  ROW_NUMBER() OVER (ORDER BY -score, doc_id) AS r FROM labeled),
             |t AS (SELECT COUNT(*) AS n FROM labeled),
             |d AS (SELECT CAST((r - 1) * 10 // (SELECT n FROM t) AS INT)
             |        AS decile, label
             |      FROM r),
             |g AS (SELECT decile, CAST(COUNT(*) AS BIGINT) AS cnt,
             |        CAST(SUM(label) AS BIGINT) AS pos
             |      FROM d GROUP BY 1),
             |tot AS (SELECT SUM(cnt) AS tot_n, SUM(pos) AS tot_pos FROM g)
             |SELECT decile, cnt, pos,
             |  ROUND(pos / CAST(cnt AS DOUBLE), 6) AS pos_rate,
             |  ROUND(CAST(pos * tot_n AS DOUBLE)
             |    / CAST(cnt * tot_pos AS DOUBLE), 6) AS lift
             |FROM g, tot ORDER BY decile""".stripMargin)),

    // Cohen's kappa between the deployed operating point (classifier
    // score ≥ 25, the mid-grid threshold eval_best_f1 sweeps) and the
    // rule gate, as two raters — chance-corrected agreement, the
    // labeling-QA primitive that says whether model and rules agree
    // beyond what their marginal keep-rates force. The 2×2 confusion
    // cells are exact BIGINTs from ONE label-free aggregation of the
    // shared labeled frame; kappa's closed form 2(ad−bc) /
    // ((a+b)(b+d)+(a+c)(c+d)) runs on DECIMAL(38,0) (DuckDB HUGEINT)
    // cross-products so the integers stay exact to n ≈ 10¹⁸ rows —
    // far past 100 TB — and po/pe/kappa are each ONE final double
    // division of exact integers (identical association order both
    // engines; magnitudes < 2⁵³ at every shipped SF so the
    // decimal→double conversions are exact). Scale shape: the corpus
    // collapses map-side to 4 cells — one shuffle of 4 rows.
    QueryDef("eval_cohens_kappa",
      (spark, sf) => {
        val cells = labeled(spark, sf)
          .agg(
            sum(when(col("score") >= 25 && col("label") === 1, 1L)
              .otherwise(0L)).as("n11"),
            sum(when(col("score") >= 25 && col("label") === 0, 1L)
              .otherwise(0L)).as("n10"),
            sum(when(col("score") < 25 && col("label") === 1, 1L)
              .otherwise(0L)).as("n01"),
            sum(when(col("score") < 25 && col("label") === 0, 1L)
              .otherwise(0L)).as("n00"))
        val d38 = "decimal(38,0)"
        cells.select(col("n11"), col("n10"), col("n01"), col("n00"),
          (col("n11") + col("n10") + col("n01") + col("n00")).as("n"),
          round((col("n11") + col("n00")).cast("double") /
            (col("n11") + col("n10") + col("n01") + col("n00")), 6).as("po"),
          round(
            ((col("n11") + col("n10")).cast(d38) * (col("n11") + col("n01")).cast(d38) +
             (col("n01") + col("n00")).cast(d38) * (col("n10") + col("n00")).cast(d38))
              .cast("double") /
            ((col("n11") + col("n10") + col("n01") + col("n00")).cast(d38) *
             (col("n11") + col("n10") + col("n01") + col("n00")).cast(d38))
              .cast("double"), 6).as("pe"),
          round(
            (col("n11").cast(d38) * col("n00").cast(d38) -
             col("n10").cast(d38) * col("n01").cast(d38)).cast("double") * 2.0 /
            ((col("n11") + col("n10")).cast(d38) * (col("n10") + col("n00")).cast(d38) +
             (col("n11") + col("n01")).cast(d38) * (col("n01") + col("n00")).cast(d38))
              .cast("double"), 6).as("kappa"))
      },
      Some(s"""$LabeledSql,
             |cells AS (
             |  SELECT
             |    CAST(SUM(CASE WHEN score >= 25 AND label = 1 THEN 1 ELSE 0 END) AS BIGINT) n11,
             |    CAST(SUM(CASE WHEN score >= 25 AND label = 0 THEN 1 ELSE 0 END) AS BIGINT) n10,
             |    CAST(SUM(CASE WHEN score < 25 AND label = 1 THEN 1 ELSE 0 END) AS BIGINT) n01,
             |    CAST(SUM(CASE WHEN score < 25 AND label = 0 THEN 1 ELSE 0 END) AS BIGINT) n00
             |  FROM labeled)
             |SELECT n11, n10, n01, n00,
             |  n11 + n10 + n01 + n00 AS n,
             |  ROUND(CAST(n11 + n00 AS DOUBLE) / (n11 + n10 + n01 + n00), 6) AS po,
             |  ROUND(CAST(CAST(n11 + n10 AS HUGEINT) * (n11 + n01)
             |           + CAST(n01 + n00 AS HUGEINT) * (n10 + n00) AS DOUBLE)
             |    / CAST(CAST(n11 + n10 + n01 + n00 AS HUGEINT)
             |           * (n11 + n10 + n01 + n00) AS DOUBLE), 6) AS pe,
             |  ROUND(CAST(CAST(n11 AS HUGEINT) * n00
             |           - CAST(n10 AS HUGEINT) * n01 AS DOUBLE) * 2.0
             |    / CAST(CAST(n11 + n10 AS HUGEINT) * (n10 + n00)
             |           + CAST(n11 + n01 AS HUGEINT) * (n01 + n00) AS DOUBLE), 6) AS kappa
             |FROM cells""".stripMargin)),

    // Class-conditional Brier score: the classifier score mapped to a
    // probability on the fixed affine grid p = clamp(score+100, 0, 300)
    // / 300 (the same literal-contract philosophy as the PR-sweep
    // thresholds), squared-error'd against the rule label SEPARATELY
    // for keeps and drops — the calibration loss that, unlike
    // eval_calibration's reliability table, is a single number per
    // class and strictly proper. All sufficient statistics are exact
    // integers in 1/300 probability units: Σ(p·300 − 300·label)² is a
    // BIGINT both engines agree on bit-for-bit (bound: scores clamp to
    // [0,300], so each term ≤ 9·10⁴ — no overflow this side of 10¹⁴
    // rows per class), and the Brier mean is ONE final division by
    // n·300². Scale shape: map-side collapse to 2 rows — one 2-row
    // shuffle, nothing else.
    QueryDef("eval_brier",
      (spark, sf) => {
        labeled(spark, sf)
          .select(col("label"),
            (least(greatest(col("score") + 100, lit(0L)), lit(300L)) -
              col("label") * 300L).as("e"))
          .groupBy(col("label"))
          .agg(count(lit(1)).as("n"),
            sum(col("e") * col("e")).as("sum_sq"))
          .select(col("label"), col("n"), col("sum_sq"),
            round(col("sum_sq") / (col("n") * 90000L).cast("double"), 6)
              .as("brier"))
          .orderBy(col("label"))
      },
      Some(s"""$LabeledSql,
             |e AS (
             |  SELECT label,
             |    LEAST(GREATEST(score + 100, 0), 300) - label * 300 AS e
             |  FROM labeled)
             |SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
             |  CAST(SUM(e * e) AS BIGINT) AS sum_sq,
             |  ROUND(SUM(e * e) / CAST(COUNT(*) * 90000 AS DOUBLE), 6) AS brier
             |FROM e GROUP BY label ORDER BY label""".stripMargin)),

    // Average precision (area under the precision-recall curve, the
    // ranking-quality summary eval_pr_curve's fixed grid cannot give):
    // AP = (1/P)·Σ_{positives} precision@k under the total
    // (score desc, doc_id) order. Both ingredients of every term —
    // rank k and true-positive count tp@k — come from ONE distributed
    // inclusive prefix-sum pass ([[graft.ops.Rank.runningSumsInclusive]]
    // over a ones column and the label column; k IS the cumulative
    // ones count), so no single-partition window and no second sort.
    // Each term is the truncating integer tp·10⁶ div k — order-
    // independent to SUM — and AP lands as one more truncating
    // division, bit-identical cross-engine (the documented ±1e-6·P
    // quantization is the price of an exact oracle for a sum of
    // fractions). Ties break on doc_id, so precision@k is
    // well-defined; term overflow needs tp ≤ 9·10¹².
    QueryDef("eval_avg_precision",
      (spark, sf) => {
        val ranked = graft.ops.Rank.runningSumsInclusive(
          labeled(spark, sf).withColumn("one", lit(1L)),
          Seq(col("score").desc, col("doc_id")), Seq("one", "label"))
        ranked.filter(col("label") === 1L)
          .select(expr("label_cum * 1000000 div one_cum").as("term"),
            col("label_cum"))
          .agg(max(col("label_cum")).as("n_pos"),
            sum(col("term")).as("sum_term_ppm"))
          .select(col("n_pos"), col("sum_term_ppm"),
            expr("sum_term_ppm div n_pos").as("ap_ppm"))
      },
      Some(s"""$LabeledSql,
             |ranked AS (
             |  SELECT label,
             |    ROW_NUMBER() OVER w AS k,
             |    SUM(label) OVER w AS tp
             |  FROM labeled
             |  WINDOW w AS (ORDER BY score DESC, doc_id
             |               ROWS UNBOUNDED PRECEDING)),
             |terms AS (
             |  SELECT CAST(tp AS BIGINT) AS tp,
             |    CAST(tp * 1000000 // k AS BIGINT) AS term
             |  FROM ranked WHERE label = 1)
             |SELECT CAST(MAX(tp) AS BIGINT) AS n_pos,
             |  CAST(SUM(term) AS BIGINT) AS sum_term_ppm,
             |  CAST(SUM(term) // MAX(tp) AS BIGINT) AS ap_ppm
             |FROM terms""".stripMargin)),

    // Multi-class confusion report — the classification-report
    // primitive (per-class precision/recall/F1 + the macro row) the
    // binary AUC/PR gates above can't express. Model under test: the
    // n-gram langid heuristic ([[graft.ops.TextOps.langIdHeuristic]]);
    // truth: the corpus `lang` column. ONE corpus scan collapses to the
    // (true, predicted) contingency cells; every metric is then pure
    // integer arithmetic on that ≤|classes|² frame — tp/fp/fn exactly,
    // ratios as truncating ppm divisions (Spark `div` ≡ DuckDB `//`),
    // and F1 in its single-division integer form
    // 2·tp·1e6 div (2·tp + fp + fn), never a ratio of ratios — so the
    // report is bit-identical cross-engine with no libm anywhere.
    // Classes the predictor never emits get NULL precision on both
    // engines; the macro row averages coalesced-to-zero F1 over the
    // true-class count (the conservative sklearn zero_division=0).
    QueryDef("eval_confusion",
      (spark, sf) => {
        val cells = load(spark, sf, "documents")
          .select(col("lang"),
            graft.ops.TextOps.langIdHeuristic(col("text")).as("pred"))
          .groupBy(col("lang"), col("pred")).agg(count(lit(1)).as("n"))
        confusionReport(cells)
      },
      Some(ConfusionOracle)),
  )

  /** (true, predicted, n) contingency cells → the classification
    * report: per-class tp/fp/fn and truncating ppm precision/recall/F1
    * plus the macro row. Pure integer arithmetic on the ≤|classes|²
    * cells frame — shared by the batch gate and its incremental
    * streaming twin (`stream_confusion`), which maintains the SAME
    * cells with a complete-mode streaming aggregation and folds them
    * through this identical report.
    */
  private[queries] def confusionReport(cells: DataFrame): DataFrame = {
    val tp = cells.filter(col("lang") === col("pred"))
      .groupBy(col("lang")).agg(sum(col("n")).as("tp"))
    val truth = cells.groupBy(col("lang")).agg(sum(col("n")).as("tpfn"))
    val pred = cells.groupBy(col("pred").as("lang"))
      .agg(sum(col("n")).as("tpfp"))
    val per = truth.join(tp, Seq("lang"), "left")
      .join(pred, Seq("lang"), "left")
      .na.fill(0L, Seq("tp", "tpfp"))
      .select(col("lang").as("label"), col("tp"),
        (col("tpfp") - col("tp")).as("fp"),
        (col("tpfn") - col("tp")).as("fn"))
      .select(col("label"), col("tp"), col("fp"), col("fn"),
        when(col("tp") + col("fp") > 0,
          expr("tp * 1000000 div (tp + fp)")).as("precision_ppm"),
        expr("tp * 1000000 div (tp + fn)").as("recall_ppm"),
        expr("2 * tp * 1000000 div (2 * tp + fp + fn)").as("f1_ppm"))
    val macroRow = per.agg(lit("__macro__").as("label"),
      sum(col("tp")).as("tp"), sum(col("fp")).as("fp"),
      sum(col("fn")).as("fn"),
      expr("sum(coalesce(precision_ppm, 0)) div count(1)")
        .as("precision_ppm"),
      expr("sum(recall_ppm) div count(1)").as("recall_ppm"),
      expr("sum(f1_ppm) div count(1)").as("f1_ppm"))
    per.unionByName(macroRow).orderBy(col("label"))
  }

  private[queries] val ConfusionOracle =
    """WITH cells AS (
             |  SELECT lang,
             |    CASE
             |      WHEN regexp_matches(lower(text), '[一-鿿]') THEN 'zh'
             |      WHEN regexp_matches(lower(text), '[Ѐ-ӿ]') THEN 'ru'
             |      WHEN regexp_matches(lower(text), '[áéíóúñ¿¡]') THEN 'es'
             |      WHEN CAST(len(list_filter(string_split(lower(text),' '),
             |          t -> list_contains(['the','a','of','and','to','in'], t)))
             |          AS DOUBLE) / len(string_split(lower(text),' ')) > 0.02
             |        THEN 'en'
             |      ELSE 'unknown' END AS pred,
             |    CAST(COUNT(*) AS BIGINT) AS n
             |  FROM documents GROUP BY 1, 2),
             |tp AS (SELECT lang, SUM(n) AS tp FROM cells
             |       WHERE lang = pred GROUP BY 1),
             |truth AS (SELECT lang, SUM(n) AS tpfn FROM cells GROUP BY 1),
             |pr AS (SELECT pred AS lang, SUM(n) AS tpfp FROM cells GROUP BY 1),
             |per AS (
             |  SELECT t.lang AS label,
             |    CAST(COALESCE(tp.tp, 0) AS BIGINT) AS tp,
             |    CAST(COALESCE(pr.tpfp, 0) - COALESCE(tp.tp, 0) AS BIGINT) AS fp,
             |    CAST(t.tpfn - COALESCE(tp.tp, 0) AS BIGINT) AS fn
             |  FROM truth t LEFT JOIN tp ON t.lang = tp.lang
             |  LEFT JOIN pr ON t.lang = pr.lang),
             |scored AS (
             |  SELECT label, tp, fp, fn,
             |    CASE WHEN tp + fp > 0
             |      THEN CAST(tp * 1000000 // (tp + fp) AS BIGINT) END
             |      AS precision_ppm,
             |    CAST(tp * 1000000 // (tp + fn) AS BIGINT) AS recall_ppm,
             |    CAST(2 * tp * 1000000 // (2 * tp + fp + fn) AS BIGINT) AS f1_ppm
             |  FROM per)
             |SELECT label, tp, fp, fn, precision_ppm, recall_ppm, f1_ppm
             |FROM scored
             |UNION ALL
             |SELECT '__macro__', CAST(SUM(tp) AS BIGINT), CAST(SUM(fp) AS BIGINT),
             |  CAST(SUM(fn) AS BIGINT),
             |  CAST(SUM(COALESCE(precision_ppm, 0)) // COUNT(*) AS BIGINT),
             |  CAST(SUM(recall_ppm) // COUNT(*) AS BIGINT),
             |  CAST(SUM(f1_ppm) // COUNT(*) AS BIGINT)
             |FROM scored
             |ORDER BY label""".stripMargin
}
