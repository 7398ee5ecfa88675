package graft.queries

import graft.ops.Similarity
import org.apache.spark.sql.functions._

/** Similarity-search queries over `embeddings` (64-dim float vectors). */
object SimilarityQueries {
  import Tables._

  val defs: Seq[QueryDef] = Seq(

    // Brute-force cosine top-k: exact baseline. Query set = vec_id < 10,
    // neighbors over the whole corpus. Dot products run in double in
    // both engines (DuckDB side casts to DOUBLE[]), sequential order →
    // bit-identical sums; sim exported rounded for hash stability.
    QueryDef("sim_cosine_topk",
      (spark, sf) => Similarity.bruteForceTopK(
          load(spark, sf, "embeddings"),
          load(spark, sf, "embeddings").filter(col("vec_id") < 10),
          "vec_id", "embedding", k = 5)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("sim"), 6).as("sim"))
        .orderBy(col("query_id"), col("rank")),
      Some("""WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) qv
             |          FROM embeddings WHERE vec_id < 10),
             |c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) cv FROM embeddings),
             |scored AS (
             |  SELECT query_id, neighbor_id,
             |    list_dot_product(qv, cv) / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) AS sim
             |  FROM c CROSS JOIN q WHERE query_id <> neighbor_id),
             |ranked AS (
             |  SELECT query_id, neighbor_id, sim,
             |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
             |  FROM scored)
             |SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, ROUND(sim, 6) AS sim
             |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin),
      bench = true),

    // Matryoshka truncation (MRL-style nested embeddings): rank by the
    // FIRST 16 of 64 dimensions — the cheap-tier retrieval a nested-
    // representation fleet serves from ¼ of the vector bytes — and mark
    // which truncated winners survive in the full-dimension top-k
    // (`in_full_top5`, the per-neighbor truncation-quality signal).
    // Both rankings replay exactly in the oracle (list slice + dot), so
    // the quality audit is hash-verified, not a loose recall gate. Same
    // broadcast-queries/one-scan economics as sim_cosine_topk.
    QueryDef("sim_matryoshka_topk",
      (spark, sf) => {
        val emb = load(spark, sf, "embeddings")
        val trunc = emb.withColumn("embedding", expr("slice(embedding, 1, 16)"))
        val full = Similarity.bruteForceTopK(
            emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding", k = 5)
          .select(col("query_id").as("fq"), col("neighbor_id").as("fn"))
        Similarity.bruteForceTopK(
            trunc, trunc.filter(col("vec_id") < 10), "vec_id", "embedding", k = 5)
          .join(full, col("query_id") === col("fq") &&
            col("neighbor_id") === col("fn"), "left")
          .select(col("query_id"), col("rank"), col("neighbor_id"),
            round(col("sim"), 6).as("sim"),
            col("fq").isNotNull.as("in_full_top5"))
          .orderBy(col("query_id"), col("rank"))
      },
      Some("""WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[])[1:16] qv,
             |          CAST(embedding AS DOUBLE[]) qf
             |          FROM embeddings WHERE vec_id < 10),
             |c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[])[1:16] cv,
             |      CAST(embedding AS DOUBLE[]) cf FROM embeddings),
             |scored AS (
             |  SELECT query_id, neighbor_id,
             |    list_dot_product(qv, cv) / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) AS sim,
             |    list_dot_product(qf, cf) / (sqrt(list_dot_product(qf, qf)) * sqrt(list_dot_product(cf, cf))) AS fsim
             |  FROM c CROSS JOIN q WHERE query_id <> neighbor_id),
             |ranked AS (
             |  SELECT query_id, neighbor_id, sim,
             |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank,
             |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY fsim DESC, neighbor_id) AS frank
             |  FROM scored)
             |SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id,
             |  ROUND(sim, 6) AS sim, frank <= 5 AS in_full_top5
             |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin)),

    // Hard-negative mining (contrastive-training data prep): per query,
    // the 5 most-similar vectors with a DIFFERENT label — the
    // sim_cosine_topk shape plus a label predicate inside the scan, so
    // the oracle stays a full hash oracle (exact sims, rounded), not a
    // recall gate.
    QueryDef("sim_hard_negatives",
      (spark, sf) => Similarity.hardNegatives(
          load(spark, sf, "embeddings"),
          load(spark, sf, "embeddings").filter(col("vec_id") < 10),
          "vec_id", "embedding", "label", k = 5)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("sim"), 6).as("sim"))
        .orderBy(col("query_id"), col("rank")),
      Some("""WITH q AS (SELECT vec_id AS query_id, label AS qlabel,
             |          CAST(embedding AS DOUBLE[]) qv
             |          FROM embeddings WHERE vec_id < 10),
             |c AS (SELECT vec_id AS neighbor_id, label AS clabel,
             |      CAST(embedding AS DOUBLE[]) cv FROM embeddings),
             |scored AS (
             |  SELECT query_id, neighbor_id,
             |    list_dot_product(qv, cv) / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) AS sim
             |  FROM c CROSS JOIN q
             |  WHERE query_id <> neighbor_id AND clabel IS DISTINCT FROM qlabel),
             |ranked AS (
             |  SELECT query_id, neighbor_id, sim,
             |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
             |  FROM scored)
             |SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, ROUND(sim, 6) AS sim
             |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin)),

    // Late-interaction MaxSim (ColBERT scoring model): each 64-dim
    // vector viewed as 4 contiguous 16-dim "token vectors"; score =
    // Σ_i max_j cos(q_i, c_j). The 4×4 cosine grid is one fused scan-
    // stage expression (no explode), queries broadcast — the
    // sim_cosine_topk economics with a richer interaction model. The
    // oracle replays the identical grid, so this is a full hash oracle:
    // greatest() is order-free and the outer sum is the same left-assoc
    // chain of doubles in both engines.
    QueryDef("sim_maxsim",
      (spark, sf) => Similarity.maxSimTopK(
          load(spark, sf, "embeddings"),
          load(spark, sf, "embeddings").filter(col("vec_id") < 10),
          "vec_id", "embedding", k = 5, nSub = 4, subDim = 16)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("sim"), 6).as("maxsim"))
        .orderBy(col("query_id"), col("rank")),
      Some(MaxSimOracle)),

    // Binary quantization + Hamming scan + exact rerank: sign bits pack
    // 64 floats into two BIGINT words (16× smaller), candidates rank by
    // XOR+popcount, and only the 5 winners per query fetch floats for
    // the true-cosine rerank. Packing, Hamming and the ranking are pure
    // integers, so unlike the IVF/LSH tiers this ANN path carries a
    // FULL hash oracle, not a recall gate.
    QueryDef("sim_binary_hamming",
      (spark, sf) => Similarity.binaryHammingTopK(
          load(spark, sf, "embeddings"),
          load(spark, sf, "embeddings").filter(col("vec_id") < 10),
          "vec_id", "embedding", k = 5)
        .withColumn("cosine", round(col("cosine"), 6))
        .orderBy(col("query_id"), col("rank")),
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
             |p AS (SELECT vec_id,
             |  CAST(list_reduce(list_prepend(CAST(0 AS DOUBLE), v[1:32]),
             |    (acc, x) -> acc * 2 + CASE WHEN x >= 0 THEN 1 ELSE 0 END) AS BIGINT) w0,
             |  CAST(list_reduce(list_prepend(CAST(0 AS DOUBLE), v[33:64]),
             |    (acc, x) -> acc * 2 + CASE WHEN x >= 0 THEN 1 ELSE 0 END) AS BIGINT) w1
             |  FROM e),
             |scored AS (SELECT q.vec_id query_id, c.vec_id neighbor_id,
             |  CAST(bit_count(xor(q.w0, c.w0)) + bit_count(xor(q.w1, c.w1)) AS INT) hamming
             |  FROM p c CROSS JOIN (SELECT * FROM p WHERE vec_id < 10) q
             |  WHERE q.vec_id <> c.vec_id),
             |ranked AS (SELECT query_id, neighbor_id, hamming,
             |  ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY hamming, neighbor_id) rank
             |  FROM scored)
             |SELECT t.query_id, CAST(t.rank AS INT) AS rank, t.neighbor_id, t.hamming,
             |  ROUND(list_dot_product(qe.v, ce.v)
             |    / (sqrt(list_dot_product(qe.v, qe.v)) * sqrt(list_dot_product(ce.v, ce.v))), 6) AS cosine
             |FROM ranked t
             |JOIN e qe ON qe.vec_id = t.query_id
             |JOIN e ce ON ce.vec_id = t.neighbor_id
             |WHERE t.rank <= 5
             |ORDER BY query_id, rank""".stripMargin)),

    // ANN via IVF (inverted-file index): k-means lists + nprobe probing,
    // exact re-rank — the second scale path next to LSH. Clustering is
    // seeded-deterministic but not SQL-portable, so the gate emits the
    // recall self-check (below) rather than the rankings; the rankings'
    // determinism is spec-tested.
    QueryDef("sim_ann_ivf",
      (spark, sf) => recallGate(spark, sf, k = 5, bound = 0.4)(
        (corpus, queries) => Similarity.ivfTopK(
          corpus, queries, "vec_id", "embedding", k = 5, nlist = 16, nprobe = 4)),
      Some(RecallGateOracle)),

    // ANN via random-hyperplane LSH (4 bands × 8 bits, seeded
    // hyperplanes): the scale path — per-query cost drops from a full
    // scan to bucket-sized.
    QueryDef("sim_ann_lsh",
      (spark, sf) => recallGate(spark, sf, k = 5, bound = 0.5)(
        (corpus, queries) => Similarity.lshTopK(
          corpus, queries, "vec_id", "embedding", k = 5, dim = 64)),
      Some(RecallGateOracle)),

    // RANGE search (every neighbor within a cosine radius,
    // [[Similarity.lshRange]]) — the serving shape top-k cannot
    // express: the answer is the τ-neighborhood itself, whatever its
    // size. The gate measures the LSH path's recall against the exact
    // truth (broadcast probe set × ONE corpus scan — the deliberate
    // sim_cosine_topk serving economics) and emits the per-probe
    // exact neighborhood SIZES only when recall ≥ 0.9, so the output
    // is fully SQL-replayable while the approximate path is judged
    // in-query. τ = 0.35 with 32×2-bit bands is the VERIFICATION
    // configuration (this corpus's embeddings are near-orthogonal —
    // τ ≥ 0.5 neighborhoods are empty — and low τ is LSH-hostile, the
    // cosinePairs economics note): production dedup-grade radii
    // (τ ≥ 0.8) run coarse 6–8-bit bands at true bucket cost.
    QueryDef("sim_range_search",
      (spark, sf) => {
        val corpus = load(spark, sf, "embeddings")
        val probes = corpus.filter(col("vec_id") < 10)
          .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
        val tau = 0.35
        val truth = corpus.crossJoin(broadcast(probes))
          .filter(col("vec_id") =!= col("query_id"))
          .withColumn("sim", Similarity.cosine(col("qv"), col("embedding")))
          .filter(col("sim") >= tau)
          .select(col("query_id"), col("vec_id").as("neighbor_id"))
        val found = Similarity.lshRange(corpus, probes
            .select(col("query_id").as("vec_id"), col("qv").as("embedding")),
          "vec_id", "embedding", minSim = tau, dim = 64)
          .select(col("query_id"), col("neighbor_id"))
        val gate = truth.join(found, Seq("query_id", "neighbor_id"),
            "left_semi")
          .agg(count(lit(1)).as("n_hit"))
          .crossJoin(truth.agg(count(lit(1)).as("n_true")))
          .select((col("n_true") === 0 ||
            col("n_hit") * 10L >= col("n_true") * 9L).as("ok"))
        probes.select(col("query_id"))
          .join(truth.groupBy(col("query_id"))
            .agg(count(lit(1)).as("n_neighbors")), Seq("query_id"), "left")
          .na.fill(0L, Seq("n_neighbors"))
          .crossJoin(broadcast(gate))
          .filter(col("ok"))
          .select(col("query_id"), col("n_neighbors"))
          .orderBy(col("query_id"))
      },
      Some("""WITH c AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
             |p AS (SELECT vec_id AS query_id, v AS qv FROM c
             |      WHERE vec_id < 10),
             |t AS (
             |  SELECT p.query_id, c.vec_id AS neighbor_id
             |  FROM p JOIN c ON c.vec_id <> p.query_id
             |  WHERE list_dot_product(p.qv, c.v)
             |    / (sqrt(list_dot_product(p.qv, p.qv))
             |       * sqrt(list_dot_product(c.v, c.v))) >= 0.35)
             |SELECT p.query_id,
             |  CAST(COALESCE(n.n, 0) AS BIGINT) AS n_neighbors
             |FROM p LEFT JOIN (
             |  SELECT query_id, COUNT(*) AS n FROM t GROUP BY 1) n
             |  USING (query_id)
             |ORDER BY query_id""".stripMargin)),

    // ANN via product quantization + ADC + exact re-rank: the
    // memory-bound tier (m bytes per vector instead of 4·dim; pair
    // scoring is m table lookups). Knobs sized by a cross-SF recall
    // study (m=16 × ksub=32 codebooks, 8× re-rank shortlist): the
    // library defaults (8×16×4) pass the bound at sf0.01 but sag to
    // 0.22 at sf0.1 — quantization error grows with corpus density, so
    // the gate runs the configuration that holds ≥0.8 recall at BOTH
    // verified scales (0.96 / 0.82 measured), still a 16× compression.
    QueryDef("sim_ann_pq",
      (spark, sf) => recallGate(spark, sf, k = 5, bound = 0.4)(
        (corpus, queries) => Similarity.pqTopK(
          corpus, queries, "vec_id", "embedding", k = 5,
          m = 16, ksub = 32, rerankFactor = 8)),
      Some(RecallGateOracle)),

    // IVF + PQ composite (the FAISS shape): the coarse quantizer bounds
    // WHICH vectors get scored (list-keyed join, nprobe of nlist lists —
    // never a crossJoin), PQ-ADC bounds WHAT each score costs (m table
    // lookups), exact re-rank on the shortlist. The recall bound sits
    // below the pure-PQ tier's because the probe restriction compounds
    // quantization loss — that compounding is the price of the only
    // configuration whose per-query cost stays sublinear AND
    // memory-bound at a billion vectors.
    QueryDef("sim_ann_ivfpq",
      (spark, sf) => recallGate(spark, sf, k = 5, bound = 0.4)(
        (corpus, queries) => Similarity.ivfPqTopK(
          corpus, queries, "vec_id", "embedding", k = 5,
          nlist = 16, nprobe = 6, m = 16, ksub = 32, rerankFactor = 8)),
      Some(RecallGateOracle)),

    // Persisted ANN index, build half (the FAISS lifecycle: build once,
    // probe many — no retrain per query run). The IVF coarse codebook +
    // list assignments are written through the generation-pointer sink
    // and read back; the gate asserts BIT-EXACT loaded-vs-fresh parity
    // (parquet round-trips float/double exactly) on the assignments
    // (in-plan symmetric exceptAll), the codebook (O(nlist) driver
    // compare), and structural sanity (row count == corpus, every list
    // id within range) — emitting the corpus id list only when all
    // hold. A second REBUILT generation (nlist = 8) is published on the
    // same store, so the probe gate below can time-travel past it.
    QueryDef("sim_ann_index_build",
      (spark, sf) => {
        import graft.ops.AnnIndexStore
        val (base, fresh, gen0, _) = builtIndex(spark, sf)
        val loaded = AnnIndexStore.load(spark, base, Some(gen0))
        val corpus = load(spark, sf, "embeddings")
        val aCols = Seq(col("neighbor_id"), col("cv"), col("list"))
        val l = loaded.assignments.select(aCols: _*)
        val f = fresh.assignments.select(aCols: _*)
        val parity = l.exceptAll(f).unionAll(f.exceptAll(l))
          .agg(count(lit(1)).as("n_diff"))
        val shape = loaded.assignments.agg(
          count(lit(1)).as("n_assigned"),
          min(col("list")).as("min_list"), max(col("list")).as("max_list"))
        val nCorpus = corpus.count()
        val codebookOk =
          loaded.centroids.length == fresh.centroids.length &&
            loaded.centroids.zip(fresh.centroids).forall {
              case (a, b) => java.util.Arrays.equals(a, b)
            }
        corpus.select(col("vec_id")).crossJoin(parity).crossJoin(shape)
          .filter(lit(codebookOk) && col("n_diff") === 0 &&
            col("n_assigned") === nCorpus &&
            col("min_list") >= 0 && col("max_list") < fresh.centroids.length)
          .select(col("vec_id"))
          .orderBy(col("vec_id"))
      },
      Some("""SELECT vec_id FROM embeddings ORDER BY vec_id""")),

    // Persisted ANN index, probe half: serving reads the artifact, never
    // retrains. Two gates on one emission: (1) probing the CURRENT
    // published index generation clears the IVF tier's recall bound
    // against in-query brute force; (2) TIME TRAVEL — the gen-0 index,
    // superseded by the rebuild above, is loaded by number and probed,
    // and its rank structure must equal probing the fresh gen-0
    // training structures exactly (in-plan symmetric exceptAll): an old
    // index generation stays probeable after a rebuild until vacuum —
    // rollback is a pointer flip, not a retrain.
    QueryDef("sim_ann_index_probe",
      (spark, sf) => {
        import graft.ops.AnnIndexStore
        val (base, fresh, gen0, _) = builtIndex(spark, sf)
        val corpus = load(spark, sf, "embeddings")
        val queries = corpus.filter(col("vec_id") < 10)
        val k = 5
        val current = AnnIndexStore.load(spark, base)
        val served = AnnIndexStore.probe(current, queries, "vec_id", "embedding",
          nprobe = 4, k = k)
        val exact = Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", k)
        val hits = served.select(col("query_id"), col("neighbor_id"))
          .join(exact.select(col("query_id"), col("neighbor_id")),
            Seq("query_id", "neighbor_id"))
          .groupBy(col("query_id")).agg(count(lit(1)).as("n_hits"))
        val meanRecall = queries.select(col("vec_id").as("query_id"))
          .join(hits, Seq("query_id"), "left")
          .agg(avg(coalesce(col("n_hits"), lit(0)) / k).as("mean_recall"))
        val rankCols = Seq(col("query_id"), col("rank"), col("neighbor_id"))
        val old = AnnIndexStore.probe(AnnIndexStore.load(spark, base, Some(gen0)),
          queries, "vec_id", "embedding", nprobe = 4, k = k).select(rankCols: _*)
        val freshRanked = AnnIndexStore.probe(fresh, queries, "vec_id", "embedding",
          nprobe = 4, k = k).select(rankCols: _*)
        val travelParity = old.exceptAll(freshRanked)
          .unionAll(freshRanked.exceptAll(old))
          .agg(count(lit(1)).as("n_diff"))
        queries.select(col("vec_id").as("query_id"))
          .crossJoin(meanRecall).crossJoin(travelParity)
          .filter(col("mean_recall") >= 0.4 && col("n_diff") === 0)
          .select(col("query_id"), lit(k).as("k"))
          .orderBy(col("query_id"))
      },
      Some(RecallGateOracle)),

    // Persisted ANN index, incremental half: 90% of the corpus builds
    // the index, the remaining 10% arrives later and is APPENDED — new
    // vectors assigned to the frozen codebook (no retrain) and written
    // as a merge-on-read delta at O(|new|) cost. Three gates on one
    // emission: the reconciled view covers the whole corpus; every
    // appended assignment equals the assign-time recompute against the
    // frozen centroids (distributed exceptAll); probing the grown index
    // still clears the recall bound vs full-corpus brute force.
    QueryDef("sim_ann_index_append",
      (spark, sf) => {
        import graft.ops.AnnIndexStore
        val corpus = load(spark, sf, "embeddings")
        val sub = corpus.filter(col("vec_id") % 10 =!= 9)
        val late = corpus.filter(col("vec_id") % 10 === 9)
        val base = Tables.scratch("graft_annappend")
        val (fresh, _) = AnnIndexStore.build(sub, "vec_id", "embedding", base,
          nlist = 16, iterations = 3)
        AnnIndexStore.append(late, "vec_id", "embedding", base)
        val grown = AnnIndexStore.load(spark, base, includeDeltas = true)
        val expected = Similarity
          .ivfProbes(late, "vec_id", "embedding", fresh.centroids, nprobe = 1)
          .select(col("query_id").as("neighbor_id"), col("list"))
        val appended = grown.assignments
          .join(late.select(col("vec_id").as("neighbor_id")), Seq("neighbor_id"))
          .select(col("neighbor_id"), col("list"))
        val assignParity = appended.exceptAll(expected)
          .unionAll(expected.exceptAll(appended))
          .agg(count(lit(1)).as("n_diff"))
        val coverage = grown.assignments.agg(count(lit(1)).as("n_assigned"))
        val nCorpus = corpus.count()
        val k = 5
        val queries = corpus.filter(col("vec_id") < 10)
        val served = AnnIndexStore.probe(grown, queries, "vec_id", "embedding",
          nprobe = 4, k = k)
        val exact = Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", k)
        val hits = served.select(col("query_id"), col("neighbor_id"))
          .join(exact.select(col("query_id"), col("neighbor_id")),
            Seq("query_id", "neighbor_id"))
          .groupBy(col("query_id")).agg(count(lit(1)).as("n_hits"))
        val meanRecall = queries.select(col("vec_id").as("query_id"))
          .join(hits, Seq("query_id"), "left")
          .agg(avg(coalesce(col("n_hits"), lit(0)) / k).as("mean_recall"))
        queries.select(col("vec_id").as("query_id"))
          .crossJoin(meanRecall).crossJoin(assignParity).crossJoin(coverage)
          .filter(col("mean_recall") >= 0.4 && col("n_diff") === 0 &&
            col("n_assigned") === nCorpus)
          .select(col("query_id"), lit(k).as("k"))
          .orderBy(col("query_id"))
      },
      Some(RecallGateOracle)),

    // Persisted ANN index, compaction half: after appends accumulate a
    // merge-on-read delta log, AnnIndexStore.compact folds it into the
    // next copy-on-write generation (centroids re-staged in lockstep
    // through TxnPublish, keeping the two-table store aligned). Four
    // gates on one emission: (1) probe ranks are IDENTICAL pre/post
    // compaction (symmetric exceptAll — compaction is a physical
    // reorganization, never a semantic change); (2) the PRE-compaction
    // generation is still probeable by number and equals the fresh
    // build's structures exactly (time travel across the compaction
    // boundary); (3) the compacted view covers the whole corpus;
    // (4) recall vs brute force still clears the tier bound.
    QueryDef("sim_ann_index_compact",
      (spark, sf) => {
        import graft.ops.AnnIndexStore
        val corpus = load(spark, sf, "embeddings")
        val sub = corpus.filter(col("vec_id") % 10 =!= 9)
        val late = corpus.filter(col("vec_id") % 10 === 9)
        val base = Tables.scratch("graft_anncompact")
        val (fresh, gen0) = AnnIndexStore.build(sub, "vec_id", "embedding", base,
          nlist = 16, iterations = 3)
        AnnIndexStore.append(late, "vec_id", "embedding", base)
        val queries = corpus.filter(col("vec_id") < 10)
        val k = 5
        val rankCols = Seq(col("query_id"), col("rank"), col("neighbor_id"))
        // plan pinned to gen0 + its delta log (both survive compaction)
        val pre = AnnIndexStore.probe(
          AnnIndexStore.load(spark, base, includeDeltas = true),
          queries, "vec_id", "embedding", nprobe = 4, k = k).select(rankCols: _*)
        val gen1 = AnnIndexStore.compact(spark, base)
        val compacted = AnnIndexStore.load(spark, base)
        val post = AnnIndexStore.probe(compacted, queries, "vec_id", "embedding",
          nprobe = 4, k = k).select(rankCols: _*)
        val compactParity = pre.exceptAll(post).unionAll(post.exceptAll(pre))
          .agg(count(lit(1)).as("n_diff_compact"))
        val old = AnnIndexStore.probe(AnnIndexStore.load(spark, base, Some(gen0)),
          queries, "vec_id", "embedding", nprobe = 4, k = k).select(rankCols: _*)
        val freshRanked = AnnIndexStore.probe(fresh, queries, "vec_id", "embedding",
          nprobe = 4, k = k).select(rankCols: _*)
        val travelParity = old.exceptAll(freshRanked)
          .unionAll(freshRanked.exceptAll(old))
          .agg(count(lit(1)).as("n_diff_travel"))
        val coverage = compacted.assignments.agg(count(lit(1)).as("n_assigned"))
        val nCorpus = corpus.count()
        val served = AnnIndexStore.probe(compacted, queries, "vec_id", "embedding",
          nprobe = 4, k = k)
        val exact = Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", k)
        val hits = served.select(col("query_id"), col("neighbor_id"))
          .join(exact.select(col("query_id"), col("neighbor_id")),
            Seq("query_id", "neighbor_id"))
          .groupBy(col("query_id")).agg(count(lit(1)).as("n_hits"))
        val meanRecall = queries.select(col("vec_id").as("query_id"))
          .join(hits, Seq("query_id"), "left")
          .agg(avg(coalesce(col("n_hits"), lit(0)) / k).as("mean_recall"))
        queries.select(col("vec_id").as("query_id"))
          .crossJoin(meanRecall).crossJoin(compactParity)
          .crossJoin(travelParity).crossJoin(coverage)
          .filter(col("mean_recall") >= 0.4 && col("n_diff_compact") === 0 &&
            col("n_diff_travel") === 0 && col("n_assigned") === nCorpus &&
            lit(gen1 == gen0 + 1))
          .select(col("query_id"), lit(k).as("k"))
          .orderBy(col("query_id"))
      },
      Some(RecallGateOracle)),

    // ONLINE ANN serving — the persisted index's production read path:
    // queries ARRIVE as a stream (three vec_id-striped micro-batches)
    // and each batch probes the loaded CURRENT index inside
    // foreachBatch, results landing idempotently per batchId. The
    // codebook is driver-held (O(nlist·dim)) and broadcast into every
    // batch's probe; the assignments side is the same list-keyed
    // equi-join as batch serving — so streaming arrival changes COST
    // (per-batch work ∝ batch size · corpus/nlist · nprobe), never
    // RESULTS: the union of all batch outputs must equal the one-shot
    // batch probe rank-for-rank (symmetric exceptAll) and clear the
    // recall bound vs brute force. Completes the FAISS lifecycle:
    // offline build (sim_ann_index_build), incremental append
    // (_append), compaction (_compact), online serving (this gate).
    QueryDef("stream_ann_index_serve",
      (spark, sf) => {
        import graft.ops.AnnIndexStore
        import org.apache.spark.sql.streaming.Trigger
        val (base, _, _, _) = builtIndex(spark, sf)
        val corpus = load(spark, sf, "embeddings")
        val queries = corpus.filter(col("vec_id") < 10)
        val k = 5
        // stage the arriving queries as 3 mtime-ordered chunk files
        val qdir = java.nio.file.Files.createTempDirectory("graft_annserve_q")
        val mtime = System.currentTimeMillis() - 60000L
        for (i <- 0 until 3) {
          val tmp = java.nio.file.Files.createTempDirectory("graft_annserve_c")
          queries.filter(pmod(col("vec_id"), lit(3)) === i).coalesce(1)
            .write.mode("overwrite").parquet(tmp.toString)
          new java.io.File(tmp.toString).listFiles()
            .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
            .foreach { p =>
              val dst = qdir.resolve(f"chunk_$i%03d.parquet")
              java.nio.file.Files.move(p.toPath, dst)
              dst.toFile.setLastModified(mtime + i * 10000L)
            }
        }
        val outBase = Tables.scratch("graft_annserve_out")
        val index = AnnIndexStore.load(spark, base)
        val q = spark.readStream.schema(queries.schema)
          .option("maxFilesPerTrigger", "1").parquet(qdir.toString)
          .writeStream
          .option("checkpointLocation", Tables.scratch("graft_annserve_ckpt"))
          .trigger(Trigger.AvailableNow())
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
            if (!batch.isEmpty)
              AnnIndexStore.probe(index, batch, "vec_id", "embedding",
                  nprobe = 4, k = k)
                .write.mode("overwrite").parquet(s"$outBase/batch_$id")
          }.start()
        try q.awaitTermination() finally q.stop()
        val rankCols = Seq(col("query_id"), col("rank"), col("neighbor_id"))
        val served = spark.read.option("recursiveFileLookup", "true")
          .parquet(outBase).select(rankCols: _*)
        val oneShot = AnnIndexStore.probe(index, queries, "vec_id", "embedding",
          nprobe = 4, k = k).select(rankCols: _*)
        val parity = served.exceptAll(oneShot).unionAll(oneShot.exceptAll(served))
          .agg(count(lit(1)).as("n_diff"))
        val exact = Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", k)
        val hits = served.select(col("query_id"), col("neighbor_id"))
          .join(exact.select(col("query_id"), col("neighbor_id")),
            Seq("query_id", "neighbor_id"))
          .groupBy(col("query_id")).agg(count(lit(1)).as("n_hits"))
        val meanRecall = queries.select(col("vec_id").as("query_id"))
          .join(hits, Seq("query_id"), "left")
          .agg(avg(coalesce(col("n_hits"), lit(0)) / k).as("mean_recall"))
        queries.select(col("vec_id").as("query_id"))
          .crossJoin(meanRecall).crossJoin(parity)
          .filter(col("mean_recall") >= 0.4 && col("n_diff") === 0)
          .select(col("query_id"), lit(k).as("k"))
          .orderBy(col("query_id"))
      },
      Some(RecallGateOracle)),

    // Residual IVF+PQ (FAISS IndexIVFPQ semantics): codes quantize
    // v − c_list, concentrating codebook resolution on within-list
    // variation — the property that keeps recall from sagging as nlist
    // grows. Gated at nlist = 64 (4× the raw-code tier's) to exercise
    // exactly that regime; the inner-product decomposition keeps the
    // ADC table per-query (only the q·c_list scalar is per-probe).
    QueryDef("sim_ann_ivfpq_res",
      (spark, sf) => recallGate(spark, sf, k = 5, bound = 0.4)(
        (corpus, queries) => Similarity.ivfPqTopK(
          corpus, queries, "vec_id", "embedding", k = 5,
          nlist = 64, nprobe = 12, m = 16, ksub = 32, rerankFactor = 8,
          residual = true)),
      Some(RecallGateOracle)),
  )

  /** Memoized persisted-index store per sf (the upsertScenario
    * precedent: both index gates share ONE build). gen0 = the nlist-16
    * index the gates probe; a nlist-8 REBUILD is published on top so
    * the current pointer sits past gen0 — time travel has a boundary to
    * cross. The fresh gen-0 training structures ride along for parity
    * checks (their plan re-evaluates deterministically: fixed centroids
    * over the corpus parquet).
    */
  private val indexCache = scala.collection.concurrent.TrieMap
    .empty[String, (String, graft.ops.AnnIndexStore.Index, Long, Long)]

  private def builtIndex(spark: org.apache.spark.sql.SparkSession, sf: String) =
    indexCache.getOrElseUpdate(sf, {
      import graft.ops.AnnIndexStore
      val base = Tables.scratch("graft_annidx")
      val corpus = load(spark, sf, "embeddings")
      val (fresh, gen0) = AnnIndexStore.build(corpus, "vec_id", "embedding", base,
        nlist = 16, iterations = 3)
      val (_, gen1) = AnnIndexStore.build(corpus, "vec_id", "embedding", base,
        nlist = 8, iterations = 3)
      (base, fresh, gen0, gen1)
    })

  /** Driver-checkable ANN self-check: run the ANN tier, score recall@k
    * per query against the in-query exact brute-force top-k, and emit one
    * `(query_id, k)` row per query ONLY when the mean recall clears the
    * tier's bound. The oracle lists every query unconditionally — so a
    * recall regression drops rows and flips the driver's `rows_match`/
    * `hash_match` to false. This turns the three previously
    * oracle-less ANN rows into real gate rows without asking SQL to
    * reproduce seeded hyperplanes/k-means.
    */
  private def recallGate(spark: org.apache.spark.sql.SparkSession, sf: String,
      k: Int, bound: Double)(
      ann: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) =>
        org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val corpus = load(spark, sf, "embeddings")
    val queries = corpus.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", k)
    val hits = ann(corpus, queries)
      .select(col("query_id"), col("neighbor_id"))
      .join(exact.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id"))
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_hits"))
    val meanRecall = queries.select(col("vec_id").as("query_id"))
      .join(hits, Seq("query_id"), "left")
      .agg(avg(coalesce(col("n_hits"), lit(0)) / k).as("mean_recall"))
    queries.select(col("vec_id").as("query_id"))
      .crossJoin(meanRecall)
      .filter(col("mean_recall") >= bound)
      .select(col("query_id"), lit(k).as("k"))
      .orderBy(col("query_id"))
  }

  // a def, not a val: `defs` above initializes first in declaration order
  private def RecallGateOracle: String =
    """SELECT vec_id AS query_id, 5 AS k FROM embeddings
      |WHERE vec_id < 10 ORDER BY query_id""".stripMargin

  /** Generated MaxSim oracle: the same 4×4 sub-vector cosine grid the
    * Spark side fuses into its scan stage, written out term by term.
    * Each cosine is the sequential-order dot formulation every sim_*
    * oracle uses; greatest() is order-free and the outer sum is the
    * identical left-assoc chain, so the scores are bit-equal and the
    * comparison is a full hash oracle.
    */
  private def MaxSimOracle: String = {
    val nSub = 4; val subDim = 16
    def sub(side: String, i: Int) =
      s"CAST(embedding AS DOUBLE[])[${i * subDim + 1}:${(i + 1) * subDim}] $side$i"
    def cos(i: Int, j: Int) =
      s"list_dot_product(q$i, c$j) / (sqrt(list_dot_product(q$i, q$i)) * sqrt(list_dot_product(c$j, c$j)))"
    val score = (0 until nSub)
      .map(i => "greatest(" + (0 until nSub).map(j => cos(i, j)).mkString(", ") + ")")
      .mkString(" + ")
    val qCols = (0 until nSub).map(sub("q", _)).mkString(", ")
    val cCols = (0 until nSub).map(sub("c", _)).mkString(", ")
    s"""WITH q AS (SELECT vec_id AS query_id, $qCols
       |          FROM embeddings WHERE vec_id < 10),
       |c AS (SELECT vec_id AS neighbor_id, $cCols FROM embeddings),
       |scored AS (
       |  SELECT query_id, neighbor_id, $score AS sim
       |  FROM c CROSS JOIN q WHERE query_id <> neighbor_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, sim,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
       |  FROM scored)
       |SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, ROUND(sim, 6) AS maxsim
       |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
  }
}
