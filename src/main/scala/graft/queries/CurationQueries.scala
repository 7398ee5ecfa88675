package graft.queries

import graft.ops.{Curation, Dedup, TextOps}
import org.apache.spark.sql.functions._

/** Corpus-curation queries: importance-weighted selection (DSIR),
  * perplexity-tier bucketing (CCNet), k-anonymity suppression, and the
  * end-to-end curation funnel audit. All over the `documents` table.
  */
object CurationQueries {
  import Tables._

  val defs: Seq[QueryDef] = Seq(

    // DSIR importance selection (Xie et al. 2023): hashed-unigram bag
    // models for the target (src0 = the "high-quality domain" sample)
    // and raw distributions, per-doc importance = Σ token bucket
    // log-weight, keep the top-200 docs. The weight table is ≤256 rows
    // (broadcast); top-k is TakeOrdered (per-partition heads, no global
    // sort) — both scale-neutral. Buckets are md5-prefix strings so the
    // hash draw is engine-portable, the corpus-sampler trick.
    QueryDef("text_dsir_select",
      (spark, sf) => {
        val docs = load(spark, sf, "documents")
        val w = Curation.dsirBucketWeights(docs, "text", col("source") === "src0")
        Curation.dsirScores(docs, "text", "doc_id", w)
          .orderBy(col("logw_sum").desc, col("doc_id")).limit(200)
      },
      Some("""WITH bk AS (SELECT doc_id, source, substr(md5(tok),1,2) b FROM (
             |    SELECT doc_id, source, unnest(string_split(text,' ')) tok FROM documents)),
             |cnts AS (SELECT b, COUNT(*) rc,
             |    COUNT(*) FILTER (WHERE source = 'src0') tc FROM bk GROUP BY b),
             |tt AS (SELECT SUM(rc) r, SUM(tc) t FROM cnts),
             |w AS (SELECT b,
             |    LN((tc + 0.5) / ((SELECT t FROM tt) + 128.0))
             |    - LN((rc + 0.5) / ((SELECT r FROM tt) + 128.0)) AS logw
             |  FROM cnts)
             |SELECT doc_id, ROUND(SUM(logw), 6) AS logw_sum, COUNT(*) AS n_tokens
             |FROM bk JOIN w USING (b)
             |GROUP BY doc_id ORDER BY logw_sum DESC, doc_id LIMIT 200""".stripMargin)),

    // CCNet-style perplexity bucketing (Wenzek et al. 2020): per-doc
    // mean unigram log-prob (the text_unigram_score LM), histogrammed
    // into coarse bins, each LANGUAGE's bins split head/middle/tail by
    // integer cumulative thirds. The bin histogram is #langs × #bins
    // rows — constant in corpus size — so the assignment window and the
    // doc-side broadcast join both survive 100 TB.
    QueryDef("text_ccnet_buckets",
      (spark, sf) => {
        val docs = load(spark, sf, "documents")
        val toks = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        val total = toks.count()
        val c = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
        val sc = toks.join(c, Seq("tok"))
          .groupBy(col("doc_id"))
          .agg(round(avg(log(col("c").cast("double") / total)), 6).as("score6"))
        val scored = sc.join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
        Curation.pplBuckets(scored, "doc_id", "lang", "score6")
          .select(col("doc_id"), col("lang"), col("score6"), col("bin"), col("ppl_bucket"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH toks AS (SELECT doc_id, unnest(string_split(text,' ')) tok FROM documents),
             |tot AS (SELECT COUNT(*) n FROM toks),
             |c AS (SELECT tok, COUNT(*) c FROM toks GROUP BY tok),
             |sc AS (SELECT doc_id,
             |    ROUND(AVG(LN(CAST(c AS DOUBLE) / (SELECT n FROM tot))), 6) score6
             |  FROM toks JOIN c USING (tok) GROUP BY doc_id),
             |d AS (SELECT doc_id, lang, score6,
             |    CAST(ROUND(score6 * 10) AS BIGINT) bin
             |  FROM sc JOIN documents USING (doc_id)),
             |hist AS (SELECT lang, bin, COUNT(*) cnt FROM d GROUP BY lang, bin),
             |asg AS (SELECT lang, bin, cnt,
             |    COALESCE(SUM(cnt) OVER (PARTITION BY lang ORDER BY bin DESC
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) cb,
             |    SUM(cnt) OVER (PARTITION BY lang) n
             |  FROM hist)
             |SELECT d.doc_id, d.lang, d.score6, d.bin,
             |  CASE WHEN (cb + cnt) * 3 <= n THEN 'head'
             |       WHEN cb * 3 >= n * 2 THEN 'tail'
             |       ELSE 'middle' END AS ppl_bucket
             |FROM d JOIN asg USING (lang, bin) ORDER BY d.doc_id""".stripMargin)),

    // k-anonymity suppression over quasi-identifiers (lang, source,
    // 500-char length bucket), k = 5: any QI combination with fewer
    // than 5 members is fully suppressed. One aggregation on the QI key
    // + one join back on the same key (no extra shuffle).
    QueryDef("privacy_k_anon",
      (spark, sf) => {
        val docs = load(spark, sf, "documents")
          .select(col("doc_id"), col("lang"), col("source"),
            expr("n_chars div 500").cast("string").as("len_bucket"))
        Curation.kAnonymize(docs, Seq("lang", "source", "len_bucket"), k = 5)
          .select(col("doc_id"), col("lang"), col("source"),
            col("len_bucket"), col("suppressed"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH q AS (SELECT doc_id, lang, source,
             |    CAST(n_chars // 500 AS VARCHAR) len_bucket FROM documents),
             |g AS (SELECT lang, source, len_bucket, COUNT(*) n
             |  FROM q GROUP BY lang, source, len_bucket)
             |SELECT doc_id,
             |  CASE WHEN n < 5 THEN '*' ELSE lang END AS lang,
             |  CASE WHEN n < 5 THEN '*' ELSE source END AS source,
             |  CASE WHEN n < 5 THEN '*' ELSE len_bucket END AS len_bucket,
             |  n < 5 AS suppressed
             |FROM q JOIN g USING (lang, source, len_bucket)
             |ORDER BY doc_id""".stripMargin)),

    // l-diversity audit over the same quasi-identifier scheme the
    // k-anonymity gate uses: a (lang, len_bucket) group can pass k≥5
    // while every member comes from ONE source — size hides nothing
    // about a shared sensitive attribute. Per-group report with the
    // distinct-source count and the l≥3 flag; one aggregation keyed on
    // the QI, O(#groups) output at any corpus size.
    QueryDef("privacy_l_diversity",
      (spark, sf) => {
        val docs = load(spark, sf, "documents")
          .select(col("lang"), col("source"),
            expr("n_chars div 500").cast("string").as("len_bucket"))
        Curation.lDiversityReport(docs, Seq("lang", "len_bucket"), "source", l = 3)
          .orderBy(col("lang"), col("len_bucket"))
      },
      Some("""WITH q AS (SELECT lang, source,
             |    CAST(n_chars // 500 AS VARCHAR) len_bucket FROM documents)
             |SELECT lang, len_bucket, COUNT(*) AS n_docs,
             |  CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sensitive,
             |  COUNT(DISTINCT source) >= 3 AS l_diverse
             |FROM q GROUP BY lang, len_bucket
             |ORDER BY lang, len_bucket""".stripMargin)),

    // t-closeness audit over the same QI scheme: a (lang, len_bucket)
    // group can be l-diverse yet still skew far from the corpus-wide
    // source mix — EMD (= total-variation for categorical) per group,
    // as an exact BIGINT numerator plus a pure-integer t ≤ 1/5 gate
    // (5·Σ|c·N − C·n| ≤ 2·n·N) so no float enters the decision. One
    // (QI, source) count shuffle; the audit frame is #groups×#sources.
    QueryDef("privacy_t_closeness",
      (spark, sf) => {
        val docs = load(spark, sf, "documents")
          .select(col("lang"), col("source"),
            expr("n_chars div 500").cast("string").as("len_bucket"))
        Curation.tClosenessReport(docs, Seq("lang", "len_bucket"), "source",
            tNum = 1, tDen = 5)
          .orderBy(col("lang"), col("len_bucket"))
      },
      Some("""WITH q AS (SELECT lang, source,
             |    CAST(n_chars // 500 AS VARCHAR) len_bucket FROM documents),
             |gv AS (SELECT lang, len_bucket, source, COUNT(*) c
             |  FROM q GROUP BY 1, 2, 3),
             |g AS (SELECT lang, len_bucket, SUM(c) ng FROM gv GROUP BY 1, 2),
             |v AS (SELECT source, SUM(c) cv FROM gv GROUP BY 1),
             |tot AS (SELECT SUM(c) nn FROM gv),
             |fx AS (SELECT g.lang, g.len_bucket, g.ng, v.source, v.cv,
             |    COALESCE(gv.c, 0) c, (SELECT nn FROM tot) nn
             |  FROM g CROSS JOIN v
             |  LEFT JOIN gv USING (lang, len_bucket, source))
             |SELECT lang, len_bucket, CAST(ng AS BIGINT) AS n_docs,
             |  CAST(SUM(ABS(c * nn - cv * ng)) AS BIGINT) AS emd_num,
             |  ROUND(CAST(SUM(ABS(c * nn - cv * ng)) AS DOUBLE)
             |    / (2.0 * ng * nn), 6) AS emd,
             |  SUM(ABS(c * nn - cv * ng)) * 5 <= ng * nn * 2 AS t_close
             |FROM fx GROUP BY lang, len_bucket, ng, nn
             |ORDER BY lang, len_bucket""".stripMargin)),

    // End-to-end curation funnel audit: per-stage retention through
    // holdout split → Gopher-style quality gate → langid → exact dedup
    // → eval decontamination, the pipeline-observability rollup every
    // production curation run reports. Stage predicates reuse the exact
    // semantics of text_quality_filters / text_langid /
    // dedup_exact / dedup_decontaminate; one boolean-flag pass + one
    // scalar aggregation — no per-stage rescans of the corpus.
    QueryDef("corpus_curation_funnel",
      (spark, sf) => {
        val docs = load(spark, sf, "documents")
        val toks = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        val maxFreq = toks.groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
          .groupBy(col("doc_id")).agg(max(col("c")).as("max_tok"))
        val base = docs.select(col("doc_id"), col("text"),
          size(split(col("text"), " ")).cast("long").as("nt"),
          length(col("text")).cast("long").as("ch"),
          size(array_distinct(filter(split(col("text"), " "),
            t => t.isInCollection(TextOps.DefaultStopwords)))).cast("long").as("ds"),
          TextOps.langIdHeuristic(col("text")).as("plang"),
          TextOps.fingerprint(col("text")).as("fp"))
        val flags = base.join(maxFreq, Seq("doc_id"))
          .withColumn("s1", col("doc_id") % 10 =!= 0)
          .withColumn("s2", col("s1") &&
            col("nt") >= 50 && col("nt") <= 100000L &&
            col("ch") - col("nt") + 1 >= col("nt") * 3 &&
            col("ch") - col("nt") + 1 <= col("nt") * 10 &&
            col("ds") >= 2 && col("max_tok") * 5 <= col("nt"))
          .withColumn("s3", col("s2") && col("plang") === "en")
        val keepers = flags.filter(col("s3"))
          .groupBy(col("fp")).agg(min(col("doc_id")).as("keeper"))
        val f4 = flags.join(keepers, Seq("fp"), "left")
          .withColumn("s4", col("s3") && col("doc_id") === col("keeper"))
        val cont = Dedup.contaminatedDocs(
            f4.filter(col("s4")).select(col("doc_id"), col("text")), "text", "doc_id",
            docs.filter(col("doc_id") % 10 === 0).select(col("text")), "text", k = 20)
          .select(col("doc_id"), lit(true).as("contaminated"))
        val f5 = f4.join(cont, Seq("doc_id"), "left")
          .withColumn("s5", col("s4") && col("contaminated").isNull)
        def n(c: String) = sum(when(col(c), 1L).otherwise(0L))
        f5.agg(count(lit(1)).as("c0"), n("s1").as("c1"), n("s2").as("c2"),
            n("s3").as("c3"), n("s4").as("c4"), n("s5").as("c5"))
          .selectExpr("""stack(6,
            0, 'raw',            c0, c0,
            1, 'holdout_split',  c0, c1,
            2, 'quality_filter', c1, c2,
            3, 'langid_en',      c2, c3,
            4, 'exact_dedup',    c3, c4,
            5, 'decontaminate',  c4, c5) as (stage, stage_name, docs_in, docs_out)""")
          .orderBy(col("stage"))
      },
      Some("""WITH toks AS (SELECT doc_id, unnest(string_split(text,' ')) tok FROM documents),
             |mf AS (SELECT doc_id, MAX(c) max_tok FROM (
             |    SELECT doc_id, tok, COUNT(*) c FROM toks GROUP BY doc_id, tok) GROUP BY doc_id),
             |base AS (SELECT doc_id,
             |    CAST(len(string_split(text,' ')) AS BIGINT) nt,
             |    CAST(LENGTH(text) AS BIGINT) ch,
             |    CAST(len(list_distinct(list_filter(string_split(text,' '),
             |      t -> list_contains(['the','a','of','and','to','in'], t)))) AS BIGINT) ds,
             |    CASE
             |      WHEN regexp_matches(lower(text), '[一-鿿]') THEN 'zh'
             |      WHEN regexp_matches(lower(text), '[Ѐ-ӿ]') THEN 'ru'
             |      WHEN regexp_matches(lower(text), '[áéíóúñ¿¡]') THEN 'es'
             |      WHEN CAST(len(list_filter(string_split(lower(text),' '),
             |        t -> list_contains(['the','a','of','and','to','in'], t))) AS DOUBLE)
             |        / len(string_split(lower(text),' ')) > 0.02 THEN 'en'
             |      ELSE 'unknown' END plang,
             |    md5(regexp_replace(lower(text), '\s+', ' ', 'g')) fp
             |  FROM documents),
             |f AS (SELECT b.doc_id, b.fp,
             |    b.doc_id % 10 <> 0 AS s1,
             |    (b.doc_id % 10 <> 0) AND nt >= 50 AND nt <= 100000
             |      AND ch - nt + 1 >= nt * 3 AND ch - nt + 1 <= nt * 10
             |      AND ds >= 2 AND mf.max_tok * 5 <= nt AS s2,
             |    (b.doc_id % 10 <> 0) AND nt >= 50 AND nt <= 100000
             |      AND ch - nt + 1 >= nt * 3 AND ch - nt + 1 <= nt * 10
             |      AND ds >= 2 AND mf.max_tok * 5 <= nt AND plang = 'en' AS s3
             |  FROM base b JOIN mf USING (doc_id)),
             |k AS (SELECT fp, MIN(doc_id) keeper FROM f WHERE s3 GROUP BY fp),
             |f4 AS (SELECT f.doc_id, f.s1, f.s2, f.s3,
             |    f.s3 AND f.doc_id = k.keeper AS s4 FROM f LEFT JOIN k USING (fp)),
             |tw AS (SELECT doc_id, string_split(text,' ') t FROM documents),
             |idx AS (SELECT doc_id, unnest(range(len(t) - 19)) i, t FROM tw WHERE len(t) >= 20),
             |w AS (SELECT DISTINCT doc_id, list_aggregate(t[i+1:i+20], 'string_agg', ' ') s FROM idx),
             |bw AS (SELECT DISTINCT s FROM w WHERE doc_id % 10 = 0),
             |cont AS (SELECT DISTINCT w.doc_id FROM w JOIN bw USING (s)),
             |f5 AS (SELECT f4.*, f4.s4 AND cont.doc_id IS NULL AS s5
             |  FROM f4 LEFT JOIN cont ON f4.doc_id = cont.doc_id),
             |agg AS (SELECT COUNT(*) c0,
             |    COUNT(*) FILTER (WHERE s1) c1, COUNT(*) FILTER (WHERE s2) c2,
             |    COUNT(*) FILTER (WHERE s3) c3, COUNT(*) FILTER (WHERE s4) c4,
             |    COUNT(*) FILTER (WHERE s5) c5 FROM f5)
             |SELECT 0 AS stage, 'raw' AS stage_name, c0 AS docs_in, c0 AS docs_out FROM agg
             |UNION ALL SELECT 1, 'holdout_split',  c0, c1 FROM agg
             |UNION ALL SELECT 2, 'quality_filter', c1, c2 FROM agg
             |UNION ALL SELECT 3, 'langid_en',      c2, c3 FROM agg
             |UNION ALL SELECT 4, 'exact_dedup',    c3, c4 FROM agg
             |UNION ALL SELECT 5, 'decontaminate',  c4, c5 FROM agg
             |ORDER BY stage""".stripMargin)),

    // Per-source data card: the release-documentation rollup (docs,
    // tokens, language spread, quality pass rate, exact-dup count, PII
    // incidence) every corpus ships with. One enrichment pass + one
    // aggregation keyed on source; predicates reuse the exact
    // text_quality_filters / text_redact_pii / dedup_exact semantics so
    // the card agrees with the operators it summarizes.
    QueryDef("corpus_datacard",
      (spark, sf) => {
        val docs = load(spark, sf, "documents")
        val maxFreq = docs
          .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
          .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
          .groupBy(col("doc_id")).agg(max(col("c")).as("max_tok"))
        val pii = TextOps.piiCounts(col("text"))
          .map(_._2).reduce(_ + _) > 0
        val base = docs.select(col("doc_id"), col("source"), col("lang"),
          size(split(col("text"), " ")).cast("long").as("nt"),
          length(col("text")).cast("long").as("ch"),
          size(array_distinct(filter(split(col("text"), " "),
            t => t.isInCollection(TextOps.DefaultStopwords)))).cast("long").as("ds"),
          TextOps.fingerprint(col("text")).as("fp"),
          pii.as("has_pii"))
        base.join(maxFreq, Seq("doc_id"))
          .withColumn("keep_q",
            col("nt") >= 50 && col("nt") <= 100000L &&
            col("ch") - col("nt") + 1 >= col("nt") * 3 &&
            col("ch") - col("nt") + 1 <= col("nt") * 10 &&
            col("ds") >= 2 && col("max_tok") * 5 <= col("nt"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("nt")).as("total_tokens"),
            countDistinct(col("lang")).as("n_langs"),
            sum(when(col("keep_q"), 1L).otherwise(0L)).as("n_quality"),
            (count(lit(1)) - countDistinct(col("fp"))).as("n_exact_dups"),
            sum(when(col("has_pii"), 1L).otherwise(0L)).as("n_pii_docs"))
          .orderBy(col("source"))
      },
      Some(s"""WITH toks AS (SELECT doc_id, unnest(string_split(text,' ')) tok FROM documents),
             |mf AS (SELECT doc_id, MAX(c) max_tok FROM (
             |    SELECT doc_id, tok, COUNT(*) c FROM toks GROUP BY doc_id, tok) GROUP BY doc_id),
             |base AS (SELECT doc_id, source, lang,
             |    CAST(len(string_split(text,' ')) AS BIGINT) nt,
             |    CAST(LENGTH(text) AS BIGINT) ch,
             |    CAST(len(list_distinct(list_filter(string_split(text,' '),
             |      t -> list_contains(['the','a','of','and','to','in'], t)))) AS BIGINT) ds,
             |    md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) fp,
             |    (len(regexp_extract_all(text, 'https?://[^ ]+'))
             |      + len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))
             |      + len(regexp_extract_all(text, '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b'))) > 0 AS has_pii
             |  FROM documents)
             |SELECT source, COUNT(*) AS n_docs,
             |  CAST(SUM(nt) AS BIGINT) AS total_tokens,
             |  COUNT(DISTINCT lang) AS n_langs,
             |  COUNT(*) FILTER (WHERE nt >= 50 AND nt <= 100000
             |    AND ch - nt + 1 >= nt * 3 AND ch - nt + 1 <= nt * 10
             |    AND ds >= 2 AND max_tok * 5 <= nt) AS n_quality,
             |  COUNT(*) - COUNT(DISTINCT fp) AS n_exact_dups,
             |  COUNT(*) FILTER (WHERE has_pii) AS n_pii_docs
             |FROM base JOIN mf USING (doc_id)
             |GROUP BY source ORDER BY source""".stripMargin)),

    // Lexicon blocklist filter — the rule tier every safety pipeline
    // runs BEFORE any model-based scoring: hard-block terms reject the
    // doc outright, soft-flag terms escalate at a threshold (≥3 hits).
    // One codegen'd array-filter pass per category, no explode, no
    // shuffle beyond the final ordering; integer hit counts replay
    // exactly in SQL.
    QueryDef("text_blocklist_filter",
      (spark, sf) => {
        val hard = Seq("dup", "leak")
        val soft = Seq("slow", "big", "small")
        def hits(words: Seq[String]) = size(filter(split(col("text"), " "),
          t => t.isInCollection(words))).cast("long")
        load(spark, sf, "documents")
          .select(col("doc_id"), hits(hard).as("n_hard"), hits(soft).as("n_soft"))
          .withColumn("verdict",
            when(col("n_hard") > 0, lit("block"))
              .when(col("n_soft") >= 3, lit("flag"))
              .otherwise(lit("pass")))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
             |  CAST(len(list_filter(string_split(text,' '),
             |    t -> list_contains(['dup','leak'], t))) AS BIGINT) AS n_hard,
             |  CAST(len(list_filter(string_split(text,' '),
             |    t -> list_contains(['slow','big','small'], t))) AS BIGINT) AS n_soft,
             |  CASE WHEN len(list_filter(string_split(text,' '),
             |      t -> list_contains(['dup','leak'], t))) > 0 THEN 'block'
             |    WHEN len(list_filter(string_split(text,' '),
             |      t -> list_contains(['slow','big','small'], t))) >= 3 THEN 'flag'
             |    ELSE 'pass' END AS verdict
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ε-DP count release (ε = ln 2) via the discrete-Laplace mechanism:
    // per-type event counts plus Z = G₁ − G₂ (iid Geometric(1/2) from
    // the leading-zero counts of two md5-derived 32-bit words — the
    // Ghosh et al. universally optimal integer mechanism for
    // sensitivity-1 counts). Seeded on (key ‖ salt), so the release is
    // reproducible and the noise replays BIT-EXACT in the oracle —
    // no float anywhere. A production release publishes dp_count only;
    // the true count is emitted here because this is the mechanism's
    // correctness gate. Aggregation + per-group projection: one hash
    // shuffle, O(#groups) rows at any corpus size.
    QueryDef("privacy_dp_counts",
      (spark, sf) => load(spark, sf, "events")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"))
        // PUBLIC test-gate salt — only valid because this gate's job is
        // bit-exact oracle replay; a production release supplies a secret
        // rotated salt (see the SECURITY CONTRACT on dpGeometricNoise)
        .withColumn("dp_noise", Curation.dpGeometricNoise(col("event_type"), "dp"))
        .withColumn("dp_count", col("n_events") + col("dp_noise"))
        .orderBy(col("event_type")),
      Some(Shared.DpCountsOracle)),

    // USER-level DP count release with contribution bounding — the
    // step event-level DP (privacy_dp_counts) skips: one user may
    // contribute thousands of events, so event-level noise does not
    // hide a USER. Each user's per-type contribution is first capped
    // at C = 8 (the clamp that fixes user-sensitivity to C, at the
    // price of a measured bias — `dropped_excess` audits exactly what
    // the cap removed), then the seeded discrete-Laplace noise is
    // scaled by C (the granular geometric mechanism: support C·ℤ,
    // adjacent support points differ by probability factor 2, and one
    // user moves the capped sum by at most C — so the ε = ln 2 ratio
    // bound holds at USER granularity). All integers, bit-exact
    // replay; the same SECURITY CONTRACT as dpGeometricNoise applies —
    // the public "dp" salt and the emitted true values are test-gate
    // plumbing only. Shape: ONE (user, type) shuffle collapses the
    // corpus, a bounded per-type rollup does the rest; noise is a
    // scan-stage expression on the tiny release frame.
    QueryDef("privacy_dp_user_level",
      (spark, sf) => {
        val cap = 8L
        val per = load(spark, sf, "events")
          .groupBy(col("user_id"), col("event_type"))
          .agg(count(lit(1)).as("m"))
        per.select(col("event_type"),
            least(col("m"), lit(cap)).as("c"),
            (col("m") - least(col("m"), lit(cap))).as("excess"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_users"),
            sum(col("c")).as("capped_sum"),
            sum(col("excess")).as("dropped_excess"))
          .withColumn("dp_noise",
            lit(cap) * Curation.dpGeometricNoise(col("event_type"), "dp"))
          .withColumn("dp_count", col("capped_sum") + col("dp_noise"))
          .orderBy(col("event_type"))
      },
      Some("""WITH per AS (
             |  SELECT user_id, event_type, COUNT(*) AS m
             |  FROM events GROUP BY 1, 2),
             |g AS (
             |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_users,
             |    CAST(SUM(LEAST(m, 8)) AS BIGINT) AS capped_sum,
             |    CAST(SUM(m - LEAST(m, 8)) AS BIGINT) AS dropped_excess
             |  FROM per GROUP BY 1),
             |z AS (SELECT event_type, n_users, capped_sum, dropped_excess,
             |    (32 - length(ltrim(bin(('0x' || substr(md5(event_type || 'dp'), 1, 8))::BIGINT), '0')))
             |  - (32 - length(ltrim(bin(('0x' || substr(md5(event_type || 'dp'), 9, 8))::BIGINT), '0')))
             |    AS zz
             |  FROM g)
             |SELECT event_type, n_users, capped_sum, dropped_excess,
             |  CAST(8 * zz AS BIGINT) AS dp_noise,
             |  CAST(capped_sum + 8 * zz AS BIGINT) AS dp_count
             |FROM z ORDER BY event_type""".stripMargin)),
  )
}
