package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Focused equivalence proofs for the r22 shared retrieval layouts —
  * the identities the optimization rests on, pinned engine-vs-engine so
  * even the DuckDB oracle is out of the loop:
  *   - the persisted top-20 derived from the impact index equals the
  *     direct `Retrieval.bm25TopK(k = 20)` run row-for-row;
  *   - a k = 10 consumer's `r <= 10` prefix equals a direct k = 10 run
  *     (rows AND ranks — the total-order argument);
  *   - the integer relevance labels equal the direct tokenize +
  *     countDistinct lineage they replaced;
  *   - the streaming-gate width helper floors at 4 on tiny corpora and
  *     never exceeds its 4× cap.
  */
class RetrievalLayoutsSpec extends SparkSpec {

  private def sortedRows(df: org.apache.spark.sql.DataFrame, cols: String*) =
    df.select(cols.map(col): _*).collect().map(_.toSeq).sortBy(_.toString)

  test("bm25Top20 derived from the impact index equals direct bm25TopK(k=20) row-for-row") {
    val docs = Tables.load(spark, Sf, "documents")
    val probes = RetrievalLayouts.probes(spark, Sf)
    val direct = graft.ops.Retrieval.bm25TopK(docs, probes, k = 20)
    val shared = RetrievalLayouts.bm25Top20(spark, Sf)
    val a = sortedRows(shared, "probe_id", "r", "doc_id", "score")
    val b = sortedRows(direct, "probe_id", "r", "doc_id", "score")
    assert(a.length == b.length && a.nonEmpty,
      s"row counts differ or empty: shared ${a.length} vs direct ${b.length}")
    a.zip(b).foreach { case (x, y) => assert(x == y, s"row mismatch: $x vs $y") }
  }

  test("r <= 10 prefix of the shared top-20 equals a direct bm25TopK(k=10) run") {
    val docs = Tables.load(spark, Sf, "documents")
    val probes = RetrievalLayouts.probes(spark, Sf)
    val direct = graft.ops.Retrieval.bm25TopK(docs, probes, k = 10)
    val prefix = RetrievalLayouts.bm25Top20(spark, Sf).filter(col("r") <= 10)
    val a = sortedRows(prefix, "probe_id", "r", "doc_id", "score")
    val b = sortedRows(direct, "probe_id", "r", "doc_id", "score")
    assert(a.length == b.length && a.nonEmpty)
    a.zip(b).foreach { case (x, y) => assert(x == y, s"row mismatch: $x vs $y") }
  }

  test("probeRels equals the direct tokenize + countDistinct relevance lineage") {
    val docs = Tables.load(spark, Sf, "documents")
    val probes = RetrievalLayouts.probes(spark, Sf)
    val terms = docs.select(col("doc_id"),
      explode(filter(split(lower(col("text")), "[^a-z]+"), t => t =!= "")).as("term"))
    val probeTerms = terms
      .join(broadcast(probes), terms("doc_id") === col("probe_id"))
      .select(col("probe_id"), col("term")).distinct()
    val direct = terms.join(broadcast(probeTerms), Seq("term"))
      .filter(col("doc_id") =!= col("probe_id"))
      .groupBy(col("probe_id"), col("doc_id"))
      .agg(countDistinct(col("term")).as("rel"))
    val a = sortedRows(RetrievalLayouts.probeRels(spark, Sf), "probe_id", "doc_id", "rel")
    val b = sortedRows(direct, "probe_id", "doc_id", "rel")
    assert(a.length == b.length && a.nonEmpty)
    a.zip(b).foreach { case (x, y) => assert(x == y, s"row mismatch: $x vs $y") }
  }

  test("adaptive streaming width floors at 4 on tiny corpora and respects its cap") {
    val n = StreamingQueries.adaptivePartitions(spark, Sf)
    assert(n == 4, s"sf0.001 (~0.5 MB) should floor at 4 state partitions, got $n")
    val width = spark.conf.get("spark.sql.shuffle.partitions").toInt
    assert(n <= math.max(4, 4 * width))
  }
}
