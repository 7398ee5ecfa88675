package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (r20 task 1, the sf100 edges leg): the bounded edge
  * layout's candidate and verified-edge counts at corpora whose
  * CUMULATIVE shuffle bytes exceed this box's scratch space in one
  * JVM (a single sf100 run holds window sorts + verification joins'
  * shuffle files concurrently — ~80 GB — because shuffle files only
  * die with the JVM). Two phases, two JVMs:
  *
  *   phase `cand`:   shingles → signature → dual-ordering chain
  *                   candidates → parquet (tiny)
  *   phase `verify`: read candidates, exact-verify over the hashed
  *                   shingle table, count edges
  *
  * Counts are IDENTICAL to Dedup.ngramJaccardEdgesBounded (same
  * construction, replayed stage-by-stage); only the materialization
  * boundary differs. On a real cluster the one-shot operator stands —
  * executor-local scratch scales with the fleet; this probe exists
  * because a 128 GB single box cannot hold 255 M-row sort + join
  * shuffles at once.
  *
  * Usage: graft.tools.EdgeScaleProbe <sfDir> <cand|verify> [candDir]
  */
object EdgeScaleProbe {
  def main(args: Array[String]): Unit = {
    val sf = args(0)
    val phase = args(1)
    val candDir = if (args.length > 2) args(2) else "/tmp/graft_edge_cand"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val sh = graft.ops.Dedup.shingleTable(docs, "text", "doc_id", 5)
    val shh = sh.select(col("doc_id"), xxhash64(col("shingle")).as("hs")).distinct()
    phase match {
      case "cand" =>
        import org.apache.spark.sql.expressions.Window
        val sig = shh.groupBy(col("doc_id")).agg(min(col("hs")).as("__sig"))
        val chained = shh.join(sig, Seq("doc_id"))
          .select(col("hs"), col("doc_id").as("a"), col("__sig"))
        val orderings = Seq(
          Window.partitionBy(col("hs")).orderBy(col("__sig"), col("a")),
          Window.partitionBy(col("hs")).orderBy(col("a")))
        // r21: one window pass per ordering (all leads share the spec),
        // mirroring Dedup.ngramJaccardEdgesBounded's restructure —
        // candidate SET unchanged
        val cand = orderings.map { w =>
          val leads = (1 to 2).map(j => lead(col("a"), j).over(w).as(s"__b$j"))
          chained.select(col("a") +: leads: _*)
            .select(col("a"),
              explode(array((1 to 2).map(j => col(s"__b$j")): _*)).as("b"))
            .filter(col("b").isNotNull)
            .select(least(col("a"), col("b")).as("a"),
              greatest(col("a"), col("b")).as("b"))
        }.reduce(_ unionByName _).distinct()
        cand.write.mode("overwrite").parquet(candDir)
        val n = spark.read.parquet(candDir).count()
        println(f"[edgescale] phase=cand sf=$sf candidates=$n " +
          f"wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
      case "verify" =>
        val cand = spark.read.parquet(candDir)
        val sizes = shh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_shingles"))
        val edges = cand
          .join(shh.select(col("doc_id").as("a"), col("hs")), Seq("a"))
          .join(shh.select(col("doc_id").as("b"), col("hs")), Seq("b", "hs"))
          .groupBy(col("a"), col("b")).agg(count(lit(1)).as("inter"))
          .join(sizes.select(col("doc_id").as("a"), col("n_shingles").as("na")), Seq("a"))
          .join(sizes.select(col("doc_id").as("b"), col("n_shingles").as("nb")), Seq("b"))
          .filter(col("inter").cast("double") /
            (col("na") + col("nb") - col("inter")) >= 0.8)
          .select(col("a"), col("b"))
        edges.write.mode("overwrite").parquet(candDir + "_edges")
        val n = spark.read.parquet(candDir + "_edges").count()
        println(f"[edgescale] phase=verify sf=$sf edges=$n " +
          f"wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
      case "cert" =>
        // the dedup_clusters_certificate computation over the staged
        // edge set: components via the SV merge/hook/compress path,
        // truncated-bucket md5 sample exact-verified, Wilson/census
        // agreement — mirrors the registry gate exactly
        import org.apache.spark.sql.expressions.Window
        val edges = spark.read.parquet(candDir + "_edges")
        val comps = graft.ops.Dedup.clusters(edges, collectThreshold = 0L).persist()
        println(s"[edgescale] components labeled: ${comps.count()} docs")
        val wTrunc = Window.partitionBy(col("shingle"))
          .orderBy(md5(concat(col("doc_id").cast("string"), col("shingle"))), col("doc_id"))
        val trunc = sh.withColumn("rnk", row_number().over(wTrunc))
          .filter(col("rnk") <= 64).drop("rnk").persist()
        val bsz = trunc.groupBy(col("shingle")).agg(count(lit(1)).as("m"))
          .filter(col("m") >= 2)
        val tPairs = bsz
          .agg(coalesce(sum((col("m") * (col("m") - 1) / lit(2)).cast("long")), lit(0L)))
          .head().getLong(0)
        val sRate = math.max(1L, math.ceil(tPairs / 200000.0).toLong)
        val sampled = bsz
          .filter(conv(substring(md5(col("shingle")), 1, 8), 16, 10)
            .cast("long") % sRate === 0)
          .select(col("shingle"))
        val cd = trunc.join(sampled, Seq("shingle")).persist()
        val cp = cd.select(col("shingle"), col("doc_id").as("a"))
          .join(cd.select(col("shingle"), col("doc_id").as("b")), Seq("shingle"))
          .filter(col("a") < col("b"))
          .select(col("a"), col("b")).distinct()
        val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_shingles"))
        val truth = cp
          .join(sh.select(col("doc_id").as("a"), col("shingle")), Seq("a"))
          .join(sh.select(col("doc_id").as("b"), col("shingle")), Seq("b", "shingle"))
          .groupBy(col("a"), col("b")).agg(count(lit(1)).as("inter"))
          .join(sizes.select(col("doc_id").as("a"), col("n_shingles").as("na")), Seq("a"))
          .join(sizes.select(col("doc_id").as("b"), col("n_shingles").as("nb")), Seq("b"))
          .filter(col("inter").cast("double") /
            (col("na") + col("nb") - col("inter")) >= 0.8)
          .select(col("a"), col("b")).persist()
        val agreeRow = truth
          .join(comps.select(col("doc_id").as("a"), col("rep").as("ra")), Seq("a"), "left")
          .join(comps.select(col("doc_id").as("b"), col("rep").as("rb")), Seq("b"), "left")
          .agg(avg(when(coalesce(col("ra"), col("a")) ===
              coalesce(col("rb"), col("b")), 1.0).otherwise(0.0)).as("p"),
            count(lit(1)).cast("double").as("m"))
          .head()
        val p = if (agreeRow.isNullAt(0)) 1.0 else agreeRow.getDouble(0)
        val m = agreeRow.getDouble(1)
        val z2 = 3.841459
        val wilson = if (m == 0) 1.0 else
          (p + z2 / (2 * m) - math.sqrt(z2) *
            math.sqrt(p * (1 - p) / m + z2 / (4 * m * m))) / (1 + z2 / m)
        println(f"[edgescale] phase=cert sf=$sf sRate=$sRate truth=${m.toLong} " +
          f"p=$p%.4f wilson_lower=$wilson%.4f " +
          f"emits=${if (sRate == 1) p == 1.0 else wilson >= 0.95} " +
          f"wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    spark.stop()
  }
}
