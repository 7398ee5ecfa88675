package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Two tiers, as a 100 TB pipeline needs both:
  *   - brute-force cosine top-k — the exact baseline; one broadcast of the
  *     (small) query set against a full scan of the corpus, no shuffle
  *     except the final top-k;
  *   - random-hyperplane LSH — the scale path; corpus is bucketed by
  *     signature so each query only scans its bucket(s). Hyperplanes are
  *     seeded-deterministic, so plans are reproducible.
  *
  * Dot products are `zip_with` + `aggregate` over array columns —
  * codegen'd, no UDF, computed in double.
  */
object Similarity {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k cosine neighbors for each query vector. `queries` and
    * `corpus` both carry (`idCol`, `vecCol`); queries ≪ corpus, so the
    * cross join broadcasts the queries and the only shuffle is the
    * per-query top-k window.
    */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("sim"))
  }

  /** `nBits` seeded random hyperplanes of dimension `dim`, as a literal
    * array-of-arrays column (broadcast with the plan).
    */
  private def hyperplanes(dim: Int, nBits: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(nBits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-random-projection signature: bit i = (v · h_i) > 0. */
  def lshSignature(vec: Column, planes: Array[Array[Double]]): Column = {
    val bits = planes.zipWithIndex.map { case (p, i) =>
      val planeLit = array(p.map(lit): _*)
      when(dot(vec, planeLit) > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** ANN top-k via LSH bucketing: corpus rows pair with queries sharing
    * any signature band (multi-probe across `bands` bands of
    * `bitsPerBand` bits), exact cosine re-ranks within candidates. Recall
    * is tunable by bands×bits; the scan cost per query drops from O(N) to
    * O(bucket).
    */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      dim: Int, bands: Int = 16, bitsPerBand: Int = 4, seed: Long = 42L): DataFrame = {
    val planes = hyperplanes(dim, bands * bitsPerBand, seed)
    def banded(df: DataFrame, id: String, vec: String): DataFrame = {
      val sig = lshSignature(col(vec), planes)
      df.select(col(id), col(vec), sig.as("sig"))
        .select(col(id), col(vec),
          explode(array((0 until bands).map(b =>
            struct(lit(b).as("band"),
              shiftright(col("sig"), b * bitsPerBand)
                .bitwiseAND((1L << bitsPerBand) - 1).as("bucket"))): _*)).as("bb"))
        .select(col(id), col(vec), col("bb.band"), col("bb.bucket"))
    }
    val c = banded(corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv")), "neighbor_id", "cv")
    val q = banded(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")), "query_id", "qv")
    val cand = c.join(q, Seq("band", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("qv"), col("neighbor_id"), col("cv")).distinct()
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    cand.withColumn("sim", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("sim"))
  }
}
