package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FunctionsSpec extends SparkSpec {
  private lazy val emb = spark.read.parquet(s"$Sf/embeddings.parquet")

  test("native CosineSim equals the zip_with/aggregate composition bit-for-bit") {
    import graft.ops.Similarity
    val composed = Similarity.dot(col("a"), col("b")) /
      (Similarity.norm(col("a")) * Similarity.norm(col("b")))
    val pairs = emb.limit(50).select(col("embedding").as("a"))
      .crossJoin(emb.limit(7).select(col("embedding").as("b")))
    val rows = pairs.select(CosineSim(col("a"), col("b")).as("native"),
      composed.as("composed")).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1),
      s"native=${r.getDouble(0)} composed=${r.getDouble(1)}"))
  }

  test("cosine_sim and graft_* functions callable from SQL after registration") {
    GraftFunctions.register(spark)
    emb.createOrReplaceTempView("emb_fn_test")
    val self = spark.sql(
      "SELECT vec_id, cosine_sim(embedding, embedding) AS s FROM emb_fn_test LIMIT 5").collect()
    self.foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 1e-9))
    import spark.implicits._
    Seq((1L, "the quick brown fox and the dog")).toDF("id", "text")
      .createOrReplaceTempView("txt_fn_test")
    val t = spark.sql(
      """SELECT graft_token_count(text) AS n, graft_lang_id(text) AS lang,
        |graft_fingerprint(text) AS fp FROM txt_fn_test""".stripMargin).head()
    assert(t.getLong(0) == 7L && t.getString(1) == "en" && t.getString(2).length == 32)
  }

  test("GraftExtensions injects functions through SparkSessionExtensions") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)   // must not throw; wiring is covered
    // by the runtime-registration SQL test above (same builders)
  }

  test("null and mixed-type inputs") {
    import spark.implicits._
    val df = Seq(
      (Some(Array(1.0f, 0.0f)), Some(Array(1.0, 0.0))),
      (None, Some(Array(1.0, 0.0)))
    ).toDF("a", "b")
    val out = df.select(CosineSim(col("a"), col("b")).as("s")).collect()
    assert(math.abs(out(0).getDouble(0) - 1.0) < 1e-12)
    assert(out(1).isNullAt(0))
  }
}
