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

  test("native SignedProjection equals the interpreted array composition; SQL-callable") {
    // the composed form the native expression replaced — kept here as the
    // semantic reference: quantize per element, signed fold per output row
    def composed(vec: org.apache.spark.sql.Column, outDim: Int, scale: Int) =
      array((0 until outDim).map { j =>
        aggregate(
          transform(vec, (x, i) => {
            val q = round(x.cast("double") * scale).cast("long")
            when((lit(j.toLong * 2654435761L) + i.cast("long") * 40503L) % 97 < 48, q)
              .otherwise(-q)
          }),
          lit(0L), (acc, y) => acc + y)
      }: _*)
    val rows = emb.select(
        SignedProjection(col("embedding"), 16, 10000).as("native"),
        composed(col("embedding"), 16, 10000).as("composed")).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
    GraftFunctions.register(spark)
    emb.createOrReplaceTempView("emb_fn_test")
    val viaSql = spark.sql(
      "SELECT signed_projection(embedding, 16, 10000) AS p FROM emb_fn_test ORDER BY vec_id")
      .collect().map(_.getSeq[Long](0)).toSeq
    val viaCol = emb.orderBy("vec_id")
      .select(graft.ops.Embeddings.projectSigned(col("embedding"), 16))
      .collect().map(_.getSeq[Long](0)).toSeq
    assert(viaSql == viaCol)
  }

  test("GraftExtensions injects functions through SparkSessionExtensions") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)   // must not throw; wiring is covered
    // by the runtime-registration SQL test above (same builders)
  }

  test("repetition_ratio native expression matches the composed column formula") {
    import spark.implicits._
    val docs = Seq(
      "a b c a b c a b c",          // heavy 3-shingle repetition
      "one two three four five six", // all distinct
      "x y",                         // shorter than k => 0.0
      "",                            // empty => 0.0
      "a  b a  b a  b",              // double spaces => empty tokens, still split-consistent
      "spam spam spam spam spam spam spam spam"
    ).zipWithIndex.map(_.swap).toDF("id", "text")
    // composed reference: hash each k-window of the token array, distinct
    val toks = split(col("text"), " ")
    val n = size(toks)
    val sh = transform(sequence(lit(0), n - 3),
      i => xxhash64(slice(toks, i + 1, lit(3))))
    val composed = when(n >= 3,
      round(lit(1.0) - size(array_distinct(sh)).cast("double") / (n - lit(2)), 6))
      .otherwise(lit(0.0))
    val rows = docs.select(col("id"),
      graft.ops.TextOps.repetitionRatio(col("text"), 3).as("native"),
      composed.as("composed")).orderBy("id").collect()
    rows.foreach(r => assert(r.getDouble(1) == r.getDouble(2),
      s"id=${r.getInt(0)} native=${r.getDouble(1)} composed=${r.getDouble(2)}"))
    // spot values: 9 tokens of period 3 => 7 windows, 3 distinct => 1-3/7
    assert(rows(0).getDouble(1) == math.BigDecimal(1.0 - 3.0 / 7.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(rows(1).getDouble(1) == 0.0 && rows(2).getDouble(1) == 0.0)
    // null text => null (expression is null-intolerant like the builtins)
    val nul = Seq((1L, Option.empty[String])).toDF("id", "text")
      .select(graft.ops.TextOps.repetitionRatio(col("text"), 3).as("r")).head()
    assert(nul.isNullAt(0))
  }

  test("repetition_ratio callable from SQL with explicit k") {
    GraftFunctions.register(spark)
    import spark.implicits._
    Seq((1L, "a b a b a b a b")).toDF("id", "text")
      .createOrReplaceTempView("rep_fn_test")
    // 8 tokens, k=2 => 7 windows, 2 distinct ("a b","b a")
    val r = spark.sql(
      "SELECT repetition_ratio(text, 2) AS r FROM rep_fn_test").head()
    assert(r.getDouble(0) == math.BigDecimal(1.0 - 2.0 / 7.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // a non-literal / non-integral k must fail loudly at analysis, not
    // silently compute with the default k
    val err = intercept[Exception](
      spark.sql("SELECT repetition_ratio(text, id) FROM rep_fn_test").head())
    assert(err.getMessage.contains("integer literal"), err.getMessage)
    val err2 = intercept[Exception](
      spark.sql("SELECT repetition_ratio(text, '3') FROM rep_fn_test").head())
    assert(err2.getMessage.contains("integer literal"), err2.getMessage)
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

  test("within_edit1 equals levenshtein <= 1 on exhaustive pairs incl. multibyte; SQL-callable") {
    import spark.implicits._
    // exhaustive small alphabet: every pair of strings over {a,b,é} up
    // to length 3 (é is 2 UTF-8 bytes — exercises the non-ASCII fallback)
    val alphabet = Seq("a", "b", "é")
    val strings = "" +: (1 to 3).flatMap(n =>
      Seq.fill(n)(alphabet).foldLeft(Seq(""))((acc, cs) =>
        acc.flatMap(p => cs.map(p + _))))
    val pairs = for (x <- strings; y <- strings) yield (x, y)
    val df = pairs.toDF("x", "y")
    val out = df.select(col("x"), col("y"),
        WithinEdit1(col("x"), col("y")).as("fast"),
        (levenshtein(col("x"), col("y")) <= 1).as("exact"))
      .collect()
    out.foreach { r =>
      assert(r.getBoolean(2) == r.getBoolean(3),
        s"mismatch for ('${r.getString(0)}', '${r.getString(1)}')")
    }
    graft.functions.GraftFunctions.register(spark)
    df.limit(1).createOrReplaceTempView("we1_test")
    assert(!spark.sql("SELECT within_edit1('abc', 'bbd')").head().getBoolean(0))
    assert(spark.sql("SELECT within_edit1('abc', 'abcd')").head().getBoolean(0))
  }

  test("jaro_winkler reproduces the textbook reference values") {
    import org.apache.spark.unsafe.types.UTF8String
    def jw(a: String, b: String): Double =
      JaroWinklerImpl.compute(UTF8String.fromString(a), UTF8String.fromString(b))
    assert(math.abs(jw("martha", "marhta") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("dwayne", "duane") - 0.8400000000000001) < 1e-12)
    assert(math.abs(jw("dixon", "dicksonx") - 0.8133333333333332) < 1e-12)
    assert(jw("abc", "abc") == 1.0)
    assert(jw("a", "") == 0.0 && jw("", "") == 1.0)
    // no Winkler boost below the 0.7 jaro threshold
    assert(jw("abcdef", "fedcba") <= 0.7 || {
      val j = jw("abcdef", "fedcba"); j == 0.0 || j > 0.7
    })
    // SQL registration + codegen path agree with the impl
    graft.functions.GraftFunctions.register(spark)
    val sqlV = spark.sql("SELECT jaro_winkler('martha', 'marhta')").head().getDouble(0)
    assert(math.abs(sqlV - 0.9611111111111111) < 1e-12)
  }
}
