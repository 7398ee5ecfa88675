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

    // ANN via IVF (inverted-file index): k-means lists + nprobe probing,
    // exact re-rank — the second scale path next to LSH. Clustering is
    // seeded-deterministic but not SQL-portable → rows-only; recall vs
    // the exact query is spec-tested.
    QueryDef("sim_ann_ivf",
      (spark, sf) => Similarity.ivfTopK(
          load(spark, sf, "embeddings"),
          load(spark, sf, "embeddings").filter(col("vec_id") < 10),
          "vec_id", "embedding", k = 5, nlist = 16, nprobe = 4)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("sim"), 6).as("sim"))
        .orderBy(col("query_id"), col("rank")),
      None),

    // ANN via random-hyperplane LSH (4 bands × 8 bits, seeded
    // hyperplanes): the scale path — per-query cost drops from a full
    // scan to bucket-sized. Hyperplane sampling is not SQL-portable →
    // rows-only here; recall vs the exact query is asserted in tests.
    QueryDef("sim_ann_lsh",
      (spark, sf) => Similarity.lshTopK(
          load(spark, sf, "embeddings"),
          load(spark, sf, "embeddings").filter(col("vec_id") < 10),
          "vec_id", "embedding", k = 5, dim = 64)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("sim"), 6).as("sim"))
        .orderBy(col("query_id"), col("rank")),
      None),

    // ANN via product quantization + ADC + exact re-rank: the
    // memory-bound tier (m bytes per vector instead of 4·dim; pair
    // scoring is m table lookups). Codebook training is seeded
    // k-means — not SQL-portable → rows-only; recall vs the exact
    // query is spec-tested like the other ANN methods.
    QueryDef("sim_ann_pq",
      (spark, sf) => Similarity.pqTopK(
          load(spark, sf, "embeddings"),
          load(spark, sf, "embeddings").filter(col("vec_id") < 10),
          "vec_id", "embedding", k = 5)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("sim"), 6).as("sim"))
        .orderBy(col("query_id"), col("rank")),
      None),
  )
}
