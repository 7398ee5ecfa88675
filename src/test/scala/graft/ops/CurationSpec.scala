package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {
  private lazy val docs = spark.read.parquet(s"$Sf/documents.parquet")

  test("dsir weight table is bounded (≤256 buckets) and target-heavy buckets score positive") {
    import spark.implicits._
    // synthetic corpus where one token dominates the target slice and a
    // second token dominates the raw remainder — the bucket carrying the
    // target token must get a positive log weight, the raw one negative
    val rows = (1L to 50L).map(i => (i, "alpha alpha alpha", true)) ++
      (51L to 100L).map(i => (i, "omega omega omega", false))
    val d = rows.toDF("doc_id", "text", "is_target")
    val w = Curation.dsirBucketWeights(d, "text", col("is_target"))
    assert(w.count() <= 256)
    val byBucket = w.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val bAlpha = graft.ops.TestHashes.md5Prefix2("alpha")
    val bOmega = graft.ops.TestHashes.md5Prefix2("omega")
    assert(byBucket(bAlpha) > 0, s"target bucket weight ${byBucket(bAlpha)}")
    assert(byBucket(bOmega) < 0, s"raw bucket weight ${byBucket(bOmega)}")
    // micro-weight quantization preserves sign and is exactly round(w*1e6)
    val qw = Curation.dsirMicroWeights(d, "text", col("is_target"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(qw(bAlpha) == math.round(byBucket(bAlpha) * 1e6))
    assert(qw(bOmega) == math.round(byBucket(bOmega) * 1e6))
  }

  test("dsir scores rank a target-like doc above a raw-like doc") {
    val w = Curation.dsirBucketWeights(docs, "text", col("source") === "src0")
    val scored = Curation.dsirScores(docs, "text", "doc_id", w)
    assert(scored.count() == docs.count())
    // scores must not be constant: the hashed model separates sources
    assert(scored.select(countDistinct(col("logw_sum"))).first().getLong(0) > 1)
  }

  test("ppl buckets: integer-thirds assignment is exhaustive, ordered, and engine-pure") {
    import spark.implicits._
    // 9 docs, one lang, scores -1.0 .. -9.0 → three clean tertiles
    val scored = (1L to 9L).map(i => (i, "en", -i.toDouble)).toDF("id", "lang", "s")
    val out = Curation.pplBuckets(scored, "id", "lang", "s")
      .select(col("id"), col("ppl_bucket")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert((1L to 3L).forall(out(_) == "head"), s"$out")
    assert((4L to 6L).forall(out(_) == "middle"), s"$out")
    assert((7L to 9L).forall(out(_) == "tail"), s"$out")
  }

  test("ppl buckets: every doc gets exactly one bucket on the real corpus") {
    val toks = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    val total = toks.count()
    val c = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val sc = toks.join(c, Seq("tok")).groupBy(col("doc_id"))
      .agg(round(avg(log(col("c").cast("double") / total)), 6).as("score6"))
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
    val out = Curation.pplBuckets(sc, "doc_id", "lang", "score6")
    assert(out.count() == docs.count())
    assert(out.filter(!col("ppl_bucket").isin("head", "middle", "tail")).count() == 0)
  }

  test("k-anonymity: no surviving QI combination smaller than k; suppressed rows fully starred") {
    val qi = Seq("lang", "source", "len_bucket")
    val d = docs.select(col("doc_id"), col("lang"), col("source"),
      expr("n_chars div 500").cast("string").as("len_bucket"))
    val out = Curation.kAnonymize(d, qi, k = 5)
    val survivors = out.filter(!col("suppressed"))
      .groupBy(qi.map(col): _*).agg(count(lit(1)).as("n"))
    assert(survivors.filter(col("n") < 5).count() == 0)
    val leaked = out.filter(col("suppressed") &&
      (col("lang") =!= "*" || col("source") =!= "*" || col("len_bucket") =!= "*"))
    assert(leaked.count() == 0)
    assert(out.count() == d.count(), "suppression never drops rows")
  }

  test("symspell linkage: guaranteed recall for one-deletion dirt, no cross-length noise") {
    import spark.implicits._
    val ents = Seq(
      (1L, "walter"), (2L, "water"),   // deletion pair ("walter" minus 'l')
      (3L, "winter"), (4L, "wonter"),  // substitution (same length) — must NOT link
      (5L, "apple"), (6L, "aple"),     // deletion pair (repeated-char collapse)
      (7L, "zebra")                    // singleton
    ).toDF("key", "name")
    val pairs = Dedup.symspellLinkPairs(ents, "key", "name")
      .select(col("a_key"), col("b_key")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (5L, 6L)), s"got $pairs")
  }

  test("containment catches an embedded doc that Jaccard misses") {
    import spark.implicits._
    val long = (1 to 40).map(i => s"w$i").mkString(" ")
    val short = (1 to 12).map(i => s"w$i").mkString(" ")
    val d = Seq((1L, long), (2L, short)).toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(d, "text", "doc_id", k = 5, minContainment = 0.9)
      .collect()
    assert(cont.length == 1 && cont(0).getAs[Double]("containment") == 1.0,
      s"embedded doc must hit containment 1.0: ${cont.mkString}")
    val jac = Dedup.ngramJaccardPairs(d, "text", "doc_id", 5, 0.8).count()
    assert(jac == 0, "Jaccard at 0.8 must miss the same pair (union dilution)")
  }

  test("decay counts: weights are exact dyadic sums (engine-order independent)") {
    val out = graft.SparkEntry.queries("q_decay_counts")(spark, Sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val w = r.getDouble(2)
      // every weight is a multiple of 2^-30 and bounded by the count
      assert(w > 0 && w <= r.getLong(1).toDouble)
      assert((w * (1L << 30)) == math.rint(w * (1L << 30)), s"non-dyadic $w")
    }
  }

  test("curation funnel stages are monotonically non-increasing and chained") {
    val out = graft.SparkEntry.queries("corpus_curation_funnel")(spark, Sf)
      .collect().sortBy(_.getInt(0))
    assert(out.length == 6)
    val outs = out.map(_.getLong(3))
    val ins = out.map(_.getLong(2))
    assert(outs.zip(outs.tail).forall { case (a, b) => b <= a },
      s"retention must not grow: ${outs.mkString(",")}")
    // docs_in of stage i equals docs_out of stage i-1
    assert(ins.tail.sameElements(outs.init), s"in=${ins.mkString(",")} out=${outs.mkString(",")}")
  }

  test("l-diversity: a large single-source group fails where k-anonymity passes") {
    import spark.implicits._
    // 10 docs, one QI group, ONE sensitive value: k=5 passes, l=3 must not.
    val homogeneous = (1 to 10).map(i => ("en", "0", "srcA")) ++
      (1 to 10).map(i => ("de", "0", s"src${i % 4}"))
    val df = homogeneous.toDF("lang", "len_bucket", "source")
    val rep = Curation.lDiversityReport(df, Seq("lang", "len_bucket"), "source", l = 3)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getBoolean(4)))
      .sortBy(_._1).toList
    assert(rep == List(("de", 10L, 4L, true), ("en", 10L, 1L, false)), rep.toString)
  }

  test("dp noise is the discrete Laplace: symmetric, P(0)≈1/3, geometric tail, deterministic") {
    import spark.implicits._
    val keys = (1 to 20000).map(i => s"key$i").toDF("k")
    val z = keys.select(Curation.dpGeometricNoise(col("k"), "dp").as("z"))
      .groupBy("z").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = 20000.0
    // Z = G1 - G2, Gi ~ Geom(1/2) gives discrete Laplace α = 1/2:
    // P(Z=z) = (1/3)·2^-|z| — so P(0) = 1/3, P(±1) = 1/6, tail halves
    assert(math.abs(z(0L) / n - 1.0 / 3) < 0.02, s"P(0) = ${z(0L) / n}")
    assert(math.abs(z(1L) / n - 1.0 / 6) < 0.02, s"P(1) = ${z(1L) / n}")
    assert(math.abs(z(1L).toDouble - z(-1L)) / n < 0.02, "symmetry")
    assert(z.keys.map(math.abs).max < 32, "geometric tail, never past the word width")
    // seeded: the same key always draws the same noise; a salt rotation redraws
    val a = Seq("x").toDF("k").select(Curation.dpGeometricNoise(col("k"), "dp").as("z")).head.getLong(0)
    val b = Seq("x").toDF("k").select(Curation.dpGeometricNoise(col("k"), "dp").as("z")).head.getLong(0)
    val c = Seq("x").toDF("k").select(Curation.dpGeometricNoise(col("k"), "epoch2").as("z")).head.getLong(0)
    assert(a == b, "same key + salt must redraw identically")
    // (different salt USUALLY differs; not asserted — equality is legal)
    assert(c == c)
  }

  test("t-closeness: hand-checked EMD and the integer t-gate") {
    import spark.implicits._
    // global sensitive mix: 3×a, 3×b (p = ½/½, N = 6). g1 holds only
    // 'a' (n = 2) → TV distance = ½(|1−½| + |0−½|) = 0.5; numerator
    // Σ|c·N − C·n| = |2·6−3·2| + |0·6−3·2| = 12. g2 is the exact global
    // mix → 0. g3 mirrors g1 on 'b'.
    val df = Seq(("g1", "a"), ("g1", "a"), ("g2", "a"), ("g2", "b"),
      ("g3", "b"), ("g3", "b")).toDF("qi", "s")
    val rep = Curation.tClosenessReport(df, Seq("qi"), "s", tNum = 1, tDen = 5)
      .orderBy(col("qi")).collect()
    assert(rep.length == 3)
    val g1 = rep(0); val g2 = rep(1); val g3 = rep(2)
    assert(g1.getLong(2) == 12L, s"g1 emd_num = ${g1.getLong(2)}, want 12")
    assert(math.abs(g1.getDouble(3) - 0.5) < 1e-12)
    assert(!g1.getBoolean(4), "g1 skews 0.5 > t = 0.2, must fail the gate")
    assert(g2.getLong(2) == 0L && g2.getDouble(3) == 0.0 && g2.getBoolean(4))
    assert(g3.getLong(2) == 12L && !g3.getBoolean(4))
    // the gate is the pure-integer comparison: exactly t is CLOSE
    // (5·num ≤ 2·n·N at equality) — verify with a crafted boundary:
    // group of 1 'a' + 4 'b' vs global 3 a / 7 b ... left to the gate's
    // algebra; here assert monotonicity instead: widening t to 1/1
    // accepts g1 too
    val loose = Curation.tClosenessReport(df, Seq("qi"), "s", tNum = 1, tDen = 1)
      .orderBy(col("qi")).collect()
    assert(loose.forall(_.getBoolean(4)))
  }
}

/** md5-prefix helper shared with the engine's hashBucket definition. */
object TestHashes {
  def md5Prefix2(s: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s.getBytes("UTF-8")).take(1).map("%02x".format(_)).mkString
  }
}
