package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: candidate economics of the q_item_cf_cut min-support floor
  * vs the q_item_cf baseline — pair-shuffle mass, Apriori-prefilter
  * pass-through, surviving edge counts, and the floored twin's
  * neighbor recall against the baseline's top-3 lists (a floored item
  * either keeps its neighbors or drops off entirely; recall measures
  * the kept fraction of baseline (item, neighbor) top-3 facts). Run via
  * `java -cp "<spark jars glob>:target/scala-2.13/classes"
  * graft.tools.ItemCfEconProbe [sfdir]`.
  */
object ItemCfEconProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val minSup = 3
    val items = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val bsz = items.groupBy(col("l_orderkey")).agg(count(lit(1)).as("bsz"))
    val kept = items.join(bsz.filter(col("bsz") <= 8), Seq("l_orderkey"))
      .select(col("l_orderkey"), col("l_partkey")).persist()
    val cnt = kept.groupBy(col("l_partkey")).agg(count(lit(1)).as("c")).persist()
    val hot = kept.join(
      cnt.filter(col("c") >= minSup).select(col("l_partkey")), Seq("l_partkey"))
    def pairMass(k: org.apache.spark.sql.DataFrame): Long =
      k.groupBy(col("l_orderkey")).agg(count(lit(1)).as("n"))
        .agg(sum(expr("n * (n - 1) div 2"))).head().getLong(0)
    def edges(k: org.apache.spark.sql.DataFrame, floor: Int) =
      k.as("a").join(k.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .groupBy(col("a.l_partkey").as("p1"), col("b.l_partkey").as("p2"))
        .agg(count(lit(1)).as("support"))
        .filter(col("support") >= floor)
    def top3(e: org.apache.spark.sql.DataFrame) = {
      val sym = e.select(col("p1").as("item"), col("p2").as("nb"), col("support"))
        .unionByName(e.select(col("p2").as("item"), col("p1").as("nb"), col("support")))
      val sc = sym
        .join(cnt.select(col("l_partkey").as("item"), col("c").as("ci")), Seq("item"))
        .join(cnt.select(col("l_partkey").as("nb"), col("c").as("cn")), Seq("nb"))
        .withColumn("cosine", expr("support / SQRT(CAST(ci AS DOUBLE) * cn)"))
      sc.withColumn("rnk", org.apache.spark.sql.functions.row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("item"))
            .orderBy(col("cosine").desc, col("nb"))))
        .filter(col("rnk") <= 3).select(col("item"), col("nb"))
    }
    val keptItems = cnt.count()
    val hotItems = cnt.filter(col("c") >= minSup).count()
    val baseMass = pairMass(kept)
    val cutMass = pairMass(hot.select(col("l_orderkey"), col("l_partkey")))
    val baseEdges = edges(kept, 2).persist()
    val cutEdges = edges(hot, minSup).persist()
    val baseTop = top3(baseEdges).persist()
    val cutTop = top3(cutEdges)
    val nBase = baseTop.count()
    val nHit = baseTop.join(cutTop, Seq("item", "nb")).count()
    println(f"sf=$sf floor=$minSup items=$keptItems prefilter_kept=$hotItems " +
      f"(${hotItems * 100.0 / keptItems}%.1f%%) pair_mass=$baseMass -> $cutMass " +
      f"edges_s2=${baseEdges.count()} edges_s$minSup=${cutEdges.count()} " +
      f"top3_facts=$nBase surviving=$nHit recall=${nHit.toDouble / math.max(nBase, 1)}%.4f")
    spark.stop()
  }
}
