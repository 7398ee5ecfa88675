package graft.queries

import graft.ops.Embeddings
import org.apache.spark.sql.functions._

/** Embedding-preparation queries over `embeddings` (64-dim float
  * vectors): the ingest-time vector transforms a training pipeline runs
  * before similarity search / semantic dedup. All are pure array
  * expressions — zero shuffle, scan-speed, fully oracled (the operators'
  * arithmetic is restricted to integer math and correctly-rounded IEEE
  * primitives precisely so DuckDB reproduces them bit-for-bit).
  */
object EmbeddingQueries {
  import Tables._

  val defs: Seq[QueryDef] = Seq(

    // L2 normalization: emit the norm and the extreme unit components
    // (min/max pick single elements, so no order-dependent double fold
    // ever reaches the output).
    QueryDef("emb_normalize",
      (spark, sf) => {
        val unit = Embeddings.l2Normalize(col("embedding"))
        load(spark, sf, "embeddings").select(
            col("vec_id"),
            round(Embeddings.l2Norm(col("embedding")), 6).as("norm"),
            round(array_max(unit), 6).as("max_unit"),
            round(array_min(unit), 6).as("min_unit"))
          .orderBy(col("vec_id"))
      },
      Some("""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings),
             |n AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) nrm FROM v)
             |SELECT vec_id, ROUND(nrm, 6) AS norm,
             |  ROUND(list_max(list_transform(e,
             |    x -> CASE WHEN nrm = 0 THEN 0.0 ELSE x / nrm END)), 6) AS max_unit,
             |  ROUND(list_min(list_transform(e,
             |    x -> CASE WHEN nrm = 0 THEN 0.0 ELSE x / nrm END)), 6) AS min_unit
             |FROM n ORDER BY vec_id""".stripMargin)),

    // Symmetric int8 quantization (the 4x storage tier): integer
    // summaries of the quantized vector — sum, extremes, saturation
    // count — are exact in both engines; reconstruction quality is
    // spec-asserted (OpsSpec: dequantized cosine ≥ 0.999).
    QueryDef("emb_quantize_int8",
      (spark, sf) => {
        val q = Embeddings.quantizeInt8(col("embedding"))
        load(spark, sf, "embeddings").select(
            col("vec_id"),
            aggregate(q, lit(0L), (a, x) => a + x.cast("long")).as("q_sum"),
            array_min(q).cast("long").as("q_min"),
            array_max(q).cast("long").as("q_max"),
            size(filter(q, x => abs(x) === 127)).cast("long").as("n_sat"))
          .orderBy(col("vec_id"))
      },
      Some("""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings),
             |m AS (SELECT vec_id, e, list_max(list_transform(e, x -> abs(x))) ma FROM v),
             |q AS (SELECT vec_id, list_transform(e, x ->
             |    CASE WHEN ma = 0 THEN 0 ELSE CAST(round(x * 127.0 / ma) AS BIGINT) END) ql
             |  FROM m)
             |SELECT vec_id, CAST(list_sum(ql) AS BIGINT) AS q_sum,
             |  CAST(list_min(ql) AS BIGINT) AS q_min,
             |  CAST(list_max(ql) AS BIGINT) AS q_max,
             |  CAST(len(list_filter(ql, x -> abs(x) = 127)) AS BIGINT) AS n_sat
             |FROM q ORDER BY vec_id""".stripMargin)),

    // Per-dimension embedding health stats — the collapse/dead-dim
    // detector an embedding pipeline monitors (a dimension whose
    // variance pins near 0 carries no signal): count/sum/sum-of-squares
    // per coordinate over the int8-quantized vectors, so the reductions
    // are EXACT integers in any order; mean and variance are a fixed
    // tree of scalar double ops on identical integers — deterministic
    // cross-engine. One posexplode + one aggregation keyed on the
    // dimension (64 groups — partial-agg'd, no skew).
    QueryDef("emb_dim_stats",
      (spark, sf) => {
        val q = Embeddings.quantizeInt8(col("embedding"))
        load(spark, sf, "embeddings")
          .select(posexplode(q).as(Seq("dim", "qv")))
          .groupBy(col("dim"))
          .agg(count(lit(1)).as("n"),
            sum(col("qv").cast("long")).as("q_sum"),
            sum((col("qv") * col("qv")).cast("long")).as("q_sumsq"))
          .select(col("dim"), col("n"), col("q_sum"), col("q_sumsq"),
            (col("q_sum").cast("double") / col("n")).as("mean"),
            (col("q_sumsq").cast("double") / col("n")
              - (col("q_sum").cast("double") / col("n"))
                * (col("q_sum").cast("double") / col("n"))).as("variance"))
          .orderBy(col("dim"))
      },
      Some("""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings),
             |m AS (SELECT vec_id, e, list_max(list_transform(e, x -> abs(x))) ma FROM v),
             |q AS (SELECT vec_id, list_transform(e, x ->
             |    CASE WHEN ma = 0 THEN 0 ELSE CAST(round(x * 127.0 / ma) AS BIGINT) END) ql
             |  FROM m),
             |d AS (SELECT CAST(i AS INT) dim, ql[i + 1] qv
             |  FROM q, range(64) r(i)),
             |agg AS (SELECT dim, COUNT(*) n, SUM(qv) q_sum, SUM(qv * qv) q_sumsq
             |  FROM d GROUP BY dim)
             |SELECT dim, n, CAST(q_sum AS BIGINT) AS q_sum,
             |  CAST(q_sumsq AS BIGINT) AS q_sumsq,
             |  CAST(q_sum AS DOUBLE) / n AS mean,
             |  CAST(q_sumsq AS DOUBLE) / n
             |    - (CAST(q_sum AS DOUBLE) / n) * (CAST(q_sum AS DOUBLE) / n)
             |    AS variance
             |FROM agg ORDER BY dim""".stripMargin)),

    // Signed random projection 64 → 16 dims over 1e4-quantized
    // components: the whole projection is 64-bit integer arithmetic, so
    // every projected coordinate is oracled exactly (not via a bound).
    QueryDef("emb_random_projection",
      (spark, sf) => load(spark, sf, "embeddings")
        .select(col("vec_id"),
          posexplode(Embeddings.projectSigned(col("embedding"), outDim = 16)))
        .toDF("vec_id", "j", "proj")
        .select(col("vec_id"), col("j").cast("long").as("j"), col("proj"))
        .orderBy(col("vec_id"), col("j")),
      Some("""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings),
             |cell AS (
             |  SELECT vec_id, j, i,
             |    (CASE WHEN (j * 2654435761 + i * 40503) % 97 < 48 THEN 1 ELSE -1 END) *
             |      CAST(round(e[i + 1] * 10000) AS BIGINT) AS q
             |  FROM v, range(16) r(j), range(64) s(i))
             |SELECT vec_id, j, CAST(SUM(q) AS BIGINT) AS proj
             |FROM cell GROUP BY vec_id, j ORDER BY vec_id, j""".stripMargin)),

    // Grouped centroid sums (the per-label mean-embedding numerator):
    // int8-quantized vectors summed element-wise by a typed Aggregator
    // whose state is one long[64] per group per partition — shuffle
    // traffic is groups × d longs where the posexplode+groupBy textbook
    // form would multiply every row by d BEFORE the exchange. The final
    // posexplode runs on the handful of aggregated rows. Integer sums
    // are order-independent, so DuckDB replays the quantization and
    // per-(label, dim) sums exactly.
    QueryDef("emb_label_centroids",
      (spark, sf) => {
        val q = Embeddings.quantizeInt8(col("embedding"))
        load(spark, sf, "embeddings")
          .select(col("label"), q.as("qv"))
          .groupBy(col("label"))
          .agg(count(lit(1)).as("n_vecs"),
            Embeddings.sumIntVectorsUdaf(col("qv")).as("sums"))
          .select(col("label"), col("n_vecs"),
            posexplode(col("sums")).as(Seq("dim", "sum_q")))
          .orderBy(col("label"), col("dim"))
      },
      Some("""WITH v AS (SELECT label, CAST(embedding AS DOUBLE[]) e FROM embeddings),
             |m AS (SELECT label, e, list_max(list_transform(e, x -> abs(x))) ma FROM v),
             |q AS (SELECT label, list_transform(e, x ->
             |    CASE WHEN ma = 0 THEN 0 ELSE CAST(round(x * 127.0 / ma) AS BIGINT) END) ql
             |  FROM m),
             |cell AS (SELECT label, i AS dim, ql[i + 1] AS qval
             |  FROM q, range(64) r(i))
             |SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs, CAST(dim AS INT) AS dim,
             |  CAST(SUM(qval) AS BIGINT) AS sum_q
             |FROM cell GROUP BY label, dim ORDER BY label, dim""".stripMargin)),

    // Distributed Gram matrix over the int8-quantized vectors — the
    // X^T·X building block of PCA/covariance/whitening, restricted to
    // the upper triangle of the first 16 dims (136 cells). Each row
    // emits its 136 (i, j, q_i·q_j) products from a pure array
    // expression and partial aggregation folds them to 136 partials
    // per partition BEFORE the exchange — so the shuffle carries
    // O(partitions × 136) rows at any corpus size, and the int8×int8
    // products make every cell an exact integer sum in both engines.
    // The full-dim production variant is the same shape (64×65/2 cells);
    // 16 keeps the oracle's lateral-range replay proportionate.
    QueryDef("emb_gram_matrix",
      (spark, sf) => {
        // quantize ONCE per row into a named column — inlining the
        // transform under the explode re-evaluates the whole O(dim)
        // quantization per cell (measured 15.6 s → ~1 s at sf0.1)
        val q = col("q")
        load(spark, sf, "embeddings")
          .withColumn("q", Embeddings.quantizeInt8(col("embedding")))
          .select(explode(flatten(transform(sequence(lit(0), lit(15)), i =>
            transform(sequence(i, lit(15)), j =>
              struct(i.as("i"), j.as("j"),
                (element_at(q, i + 1).cast("long") *
                 element_at(q, j + 1).cast("long")).as("p")))))).as("cell"))
          .groupBy(col("cell.i").as("i"), col("cell.j").as("j"))
          .agg(sum(col("cell.p")).as("gram"), count(lit(1)).as("n_vecs"))
          .orderBy(col("i"), col("j"))
      },
      Some("""WITH v AS (SELECT CAST(embedding AS DOUBLE[]) e FROM embeddings),
             |m AS (SELECT e, list_max(list_transform(e, x -> abs(x))) ma FROM v),
             |q AS (SELECT list_transform(e, x ->
             |    CASE WHEN ma = 0 THEN 0 ELSE CAST(round(x * 127.0 / ma) AS BIGINT) END) ql
             |  FROM m),
             |cell AS (SELECT i, j, ql[i + 1] * ql[j + 1] AS p
             |  FROM q, range(16) ri(i), range(16) rj(j) WHERE j >= i)
             |SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j,
             |  CAST(SUM(p) AS BIGINT) AS gram,
             |  CAST(COUNT(*) AS BIGINT) AS n_vecs
             |FROM cell GROUP BY i, j ORDER BY i, j""".stripMargin)),

    // Distributed PCA direction by power iteration — the collapse/
    // anisotropy probe run on real embedding fleets: ONE distributed
    // pass reduces the exact int8 Gram matrix (the emb_gram_matrix
    // map-side-combined shape, full 16×16 grid), then three power
    // steps x_{k+1} = G·x_k run on the collected 16×16 — a bounded
    // 256-cell collect, the centroid-budget pattern, O(1) at any corpus
    // size. Every iterate is EXACT integer arithmetic (x2/x3 in
    // BigInteger ↔ the oracle's HUGEINT); the per-component Rayleigh
    // ratio x3_i/x2_i is one final double division of identical
    // integers — the dominant eigenvalue with exact lineage.
    QueryDef("emb_pca_power",
      (spark, sf) => {
        val q = col("q") // quantized once per row, same fix as emb_gram_matrix
        val gramRows = load(spark, sf, "embeddings")
          .withColumn("q", Embeddings.quantizeInt8(col("embedding")))
          .select(explode(flatten(transform(sequence(lit(0), lit(15)), i =>
            transform(sequence(lit(0), lit(15)), j =>
              struct(i.as("i"), j.as("j"),
                (element_at(q, i + 1).cast("long") *
                 element_at(q, j + 1).cast("long")).as("p")))))).as("cell"))
          .groupBy(col("cell.i").as("i"), col("cell.j").as("j"))
          .agg(sum(col("cell.p")).as("g"))
          .collect()
        val dim = 16
        val g = Array.ofDim[Long](dim, dim)
        gramRows.foreach(r => g(r.getInt(0))(r.getInt(1)) = r.getLong(2))
        import java.math.BigInteger
        def matvec(x: Array[BigInteger]): Array[BigInteger] =
          Array.tabulate(dim)(i => (0 until dim)
            .map(j => BigInteger.valueOf(g(i)(j)).multiply(x(j)))
            .foldLeft(BigInteger.ZERO)(_.add(_)))
        val x1 = matvec(Array.fill(dim)(BigInteger.ONE))
        val x2 = matvec(x1)
        val x3 = matvec(x2)
        spark.createDataFrame((0 until dim).map(i =>
            (i, x1(i).longValueExact, x3(i).doubleValue / x2(i).doubleValue)))
          .toDF("i", "x1", "lambda_i")
          .orderBy(col("i"))
      },
      Some("""WITH v AS (SELECT CAST(embedding AS DOUBLE[]) e FROM embeddings),
             |m AS (SELECT e, list_max(list_transform(e, x -> abs(x))) ma FROM v),
             |q AS (SELECT list_transform(e, x ->
             |    CASE WHEN ma = 0 THEN 0 ELSE CAST(round(x * 127.0 / ma) AS BIGINT) END) ql
             |  FROM m),
             |cell AS (SELECT i, j, ql[i + 1] * ql[j + 1] AS p
             |  FROM q, range(16) ri(i), range(16) rj(j)),
             |g AS (SELECT i, j, SUM(p) AS g FROM cell GROUP BY i, j),
             |x1 AS (SELECT i, SUM(g) AS x FROM g GROUP BY i),
             |x2 AS (SELECT g.i, SUM(CAST(g.g AS HUGEINT) * x1.x) AS x
             |  FROM g JOIN x1 ON g.j = x1.i GROUP BY g.i),
             |x3 AS (SELECT g.i, SUM(CAST(g.g AS HUGEINT) * x2.x) AS x
             |  FROM g JOIN x2 ON g.j = x2.i GROUP BY g.i)
             |SELECT CAST(x1.i AS INT) AS i, CAST(x1.x AS BIGINT) AS x1,
             |  CAST(x3.x AS DOUBLE) / CAST(x2.x AS DOUBLE) AS lambda_i
             |FROM x1 JOIN x2 ON x1.i = x2.i JOIN x3 ON x1.i = x3.i
             |ORDER BY i""".stripMargin)),
  )
}
