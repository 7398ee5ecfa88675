package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dev tool: amplify the sf0.1 corpus ~10× into an sf1.0-EQUIVALENT
  * directory for the heavy-tail economics leg (r16 verdict task 3: the
  * 100 TB claim deserves one more measured decade than growthcheck's
  * 0.01→0.1 span). TIMING data only — never an oracle input: the
  * driver's sf dirs are read-only and correctness is gated at the three
  * generated SFs; this amplification preserves the shapes that drive
  * cost (row counts, key cardinalities, join fan-outs, calendar
  * horizon) rather than the exact value distributions.
  *
  * Recipe per table (rep ∈ 0..9, rep 0 = the original rows):
  *   - keys shift by rep·(max+1) — unique, join-consistent across
  *     lineitem↔orders↔customer;
  *   - events keep their ts (10× the events per day: the calendar
  *     horizon — what bounds the day-keyed pair/window gates — stays
  *     fixed, as it would in a real traffic-growth decade);
  *   - documents perturb replica text with a rep-salted suffix token
  *     (exact-dedup survivor sets keep their relative size instead of
  *     collapsing 10:1);
  *   - part space stays FIXED (catalog density grows — the co-occurrence
  *     shape q_item_cf's economics are about);
  *   - embeddings replicate with shifted ids (ANN bucket occupancy 10×).
  *
  * Usage: `graft.tools.ScaleUp [srcSfDir] [outDir] [factor]`
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = if (args.length > 1) args(1) else "/tmp/graft_sf1"
    val factor = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def reps(df: DataFrame): DataFrame =
      df.withColumn("rep", explode(expr(s"sequence(0L, ${factor - 1}L)")))
    def span(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head().getLong(0) + 1L
    // GRAFT_SCALEUP_TABLES: optional comma list restricting which tables
    // are written (e.g. "documents" for an edge-layout-only decade leg —
    // amplifying 600 M lineitem rows to probe a documents-only operator
    // wastes minutes and GBs). Unlisted tables are skipped entirely.
    val only = sys.env.get("GRAFT_SCALEUP_TABLES")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    def write(df: DataFrame, name: String): Unit =
      if (only.forall(_.contains(name))) {
        df.write.mode("overwrite").parquet(s"$out/$name.parquet")
        println(s"[scaleup] $name: ${spark.read.parquet(s"$out/$name.parquet").count()} rows")
      } else println(s"[scaleup] $name: skipped (GRAFT_SCALEUP_TABLES)")

    // fixed dims copy through
    Seq("region", "nation", "part").foreach { t =>
      write(spark.read.parquet(s"$src/$t.parquet"), t)
    }

    val cust = spark.read.parquet(s"$src/customer.parquet")
    val cSpan = span(cust, "c_custkey")
    write(reps(cust).withColumn("c_custkey",
      col("c_custkey") + col("rep") * cSpan).drop("rep"), "customer")

    val supp = spark.read.parquet(s"$src/supplier.parquet")
    val sSpan = span(supp, "s_suppkey")
    write(reps(supp).withColumn("s_suppkey",
      col("s_suppkey") + col("rep") * sSpan).drop("rep"), "supplier")

    val orders = spark.read.parquet(s"$src/orders.parquet")
    val oSpan = span(orders, "o_orderkey")
    write(reps(orders)
      .withColumn("o_orderkey", col("o_orderkey") + col("rep") * oSpan)
      .withColumn("o_custkey", col("o_custkey") + col("rep") * cSpan)
      .drop("rep"), "orders")

    val li = spark.read.parquet(s"$src/lineitem.parquet")
    write(reps(li)
      .withColumn("l_orderkey", col("l_orderkey") + col("rep") * oSpan)
      .withColumn("l_suppkey", col("l_suppkey") + col("rep") * sSpan)
      .drop("rep"), "lineitem") // l_partkey fixed: catalog density grows

    val ev = graft.queries.Tables.load(spark, src, "events")
    val eSpan = span(ev, "event_id")
    val uSpan = span(ev, "user_id")
    write(reps(ev)
      .withColumn("event_id", col("event_id") + col("rep") * eSpan)
      .withColumn("user_id", col("user_id") + col("rep") * uSpan)
      .drop("rep"), "events") // ts untouched: fixed horizon, 10× density

    val docs = spark.read.parquet(s"$src/documents.parquet")
    val dSpan = span(docs, "doc_id")
    write(reps(docs)
      .withColumn("doc_id", col("doc_id") + col("rep") * dSpan)
      .withColumn("text", when(col("rep") === 0, col("text"))
        .otherwise(concat(col("text"), lit(" zrep"), col("rep").cast("string"))))
      .drop("rep"), "documents")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val vSpan = span(emb, "vec_id")
    write(reps(emb).withColumn("vec_id",
      col("vec_id") + col("rep") * vSpan).drop("rep"), "embeddings")

    spark.stop()
  }
}
