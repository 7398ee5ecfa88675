package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class OpsSpec extends SparkSpec {
  private lazy val docs = spark.read.parquet(s"$Sf/documents.parquet")
  private lazy val emb = spark.read.parquet(s"$Sf/embeddings.parquet")

  test("exact dedup keeps one row per fingerprint") {
    val out = Dedup.exact(docs, "text", "doc_id")
    assert(out.groupBy("fp").count().filter(col("count") > 1).count() == 0)
    assert(out.count() <= docs.count())
  }

  test("minhash LSH recovers every exact-Jaccard pair at tau=0.8 (recall) and verifies (precision)") {
    val exact = Dedup.ngramJaccardPairs(docs, "text", "doc_id", 5, 0.8)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minHashVerifiedPairs(docs, "text", "doc_id", 5, 0.8)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "corpus has planted near-dups")
    assert(lsh == exact, s"LSH+verify must equal exact pairs; missing=${exact -- lsh} extra=${lsh -- exact}")
  }

  test("shingles: docs shorter than k tokens emit NO shingle (no whole-text fallback)") {
    import spark.implicits._
    val t = Seq((1L, "one two three"), (2L, "one two three"), (3L, "a b c d e f"))
      .toDF("doc_id", "text")
    val sh = t.select(col("doc_id"), TextOps.shingles(col("text"), 5).as("s")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(sh(1L).isEmpty && sh(2L).isEmpty, "sub-k docs must have no k-shingle")
    assert(sh(3L) == Seq("a b c d e", "b c d e f"))
    // two identical 3-token docs must NOT become a jaccard pair at k=5:
    // before the n >= k gate they shared one whole-text "shingle" => 1.0
    val withShort = docs.select(col("doc_id"), col("text")).unionByName(
      Seq((900001L, "tiny dup doc"), (900002L, "tiny dup doc")).toDF("doc_id", "text"))
    val pairs = Dedup.ngramJaccardPairs(withShort, "text", "doc_id", 5, 0.8)
      .filter(col("a") >= 900000L || col("b") >= 900000L)
    assert(pairs.count() == 0, "short-doc pair must not surface at k=5")
  }

  test("substring pairs: shared-window semantics, hot-window cut, short docs") {
    import spark.implicits._
    val t = Seq(
      // docs 1/2 share a verbatim 5-token window; 3 shares none
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "prefix alpha beta gamma delta epsilon trailer"),
      (3L, "one two three four five six seven"),
      (4L, "tiny doc"), // shorter than k => no window, never pairs
      // 5/6/7 share a boilerplate window that the df-cut must drop
      (5L, "LICENSE HEADER COMMON TO ALL FILES x"),
      (6L, "LICENSE HEADER COMMON TO ALL FILES y"),
      (7L, "LICENSE HEADER COMMON TO ALL FILES z")
    ).toDF("doc_id", "text")
    val pairs = Dedup.substringPairs(t, "text", "doc_id", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // 1-2 share exactly "alpha beta gamma delta epsilon"; 5/6/7 share
    // the 3 license windows pairwise ("LICENSE...FILES" spans 7 tokens
    // => windows at offsets 0..2 are common)
    assert(pairs.contains((1L, 2L, 1L)), s"got $pairs")
    assert(pairs.filter(p => p._1 >= 5L).map(p => (p._1, p._2)) ==
      Set((5L, 6L), (5L, 7L), (6L, 7L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
    // hot-window cut: windows in >2 docs dropped => license trio vanishes,
    // the 1-2 pair (df=2) survives
    val cut = Dedup.substringPairs(t, "text", "doc_id", k = 5, maxWindowDf = Some(2L))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cut == Set((1L, 2L)), s"got $cut")
  }

  test("stratified sampling: deterministic, per-stratum rates honored, subsets nest") {
    val rates = Map("src0" -> 0.5, "src1" -> 0.25)
    def sample(defaultRate: Double) = docs.filter(TextOps.stratifiedSample(
        col("doc_id"), col("source"), rates, defaultRate, salt = "t"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val s1 = sample(0.1)
    val s2 = sample(0.1)
    assert(s1 == s2, "same salt+rates must select identical rows")
    // raising only the default rate must nest: every previously-selected
    // row is still selected (threshold monotonicity)
    val s3 = sample(0.3)
    assert(s1.subsetOf(s3), "higher default rate must be a superset")
    // a zero default keeps ONLY the named strata
    val onlyNamed = docs.filter(TextOps.stratifiedSample(
        col("doc_id"), col("source"), rates, defaultRate = 0.0, salt = "t"))
    assert(onlyNamed.filter(!col("source").isin("src0", "src1")).count() == 0)
  }

  test("ngram jaccard: df-cut candidate pruning equals the uncut exact pairs") {
    val uncut = Dedup.ngramJaccardPairs(docs, "text", "doc_id", 5, 0.8)
      .select("a", "b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val cut = Dedup.ngramJaccardPairs(docs, "text", "doc_id", 5, 0.8,
        maxShingleDf = Some(100))
      .select("a", "b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(uncut.nonEmpty, "corpus has planted near-dups")
    assert(cut == uncut, s"missing=${uncut -- cut} extra=${cut -- uncut}")
  }

  test("bounded edges: verified subset of the full pair set, identical components, linear per-bucket candidates") {
    import spark.implicits._
    val full = Dedup.ngramJaccardPairs(docs, "text", "doc_id", 5, 0.8)
      .select("a", "b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val bounded = Dedup.ngramJaccardEdgesBounded(docs, "text", "doc_id", 5, 0.8)
      .select("a", "b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(full.nonEmpty, "corpus has planted near-dups")
    // every bounded edge is exact-verified, so it must appear in the
    // full τ-pair set with the identical Jaccard — subset, never a merge
    assert((bounded -- full).isEmpty, s"phantom edges: ${bounded -- full}")
    // components over the spanning subgraph equal the full closure's
    val pairsDf = full.toSeq.toDF("a", "b", "j").select(col("a"), col("b"))
    val edgesDf = bounded.toSeq.toDF("a", "b", "j").select(col("a"), col("b"))
    val compFull = Dedup.clusters(pairsDf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val compBounded = Dedup.clusters(edgesDf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(compBounded == compFull,
      s"component split: ${compFull.toSet -- compBounded.toSet}")
    // the scale property the operator exists for: a CLIQUE of m docs
    // sharing every shingle emits O(m·maxLead) distinct chain edges,
    // never the C(m,2) pair set — and the chain still spans the clique
    val m = 40
    val clique = (0 until m)
      .map(i => (i.toLong, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"))
      .toDF("doc_id", "text")
    val cliqueEdges = Dedup.ngramJaccardEdgesBounded(clique, "text", "doc_id", 5, 0.8)
    val nEdges = cliqueEdges.count()
    assert(nEdges <= 2L * (m - 1),
      s"clique emitted $nEdges edges — expected ≤ ${2 * (m - 1)} (maxLead·(m−1)), not C($m,2)")
    val cliqueComp = Dedup.clusters(cliqueEdges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cliqueComp.size == m && cliqueComp.values.forall(_ == 0L),
      "chain edges must span the whole clique into one component")
  }

  test("dedup clusters: chains collapse to one component labeled by min id (both paths)") {
    import spark.implicits._
    // components: {1,2,3} via chain 1-2, 2-3; {7,9}; singleton-free (only
    // docs in pairs appear)
    val pairs = Seq((2L, 3L), (1L, 2L), (7L, 9L)).toDF("a", "b")
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L)
    val fast = Dedup.clusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast == expected)
    // threshold 0 forces the distributed label-propagation path — must
    // produce the identical labeling
    val dist = Dedup.clusters(pairs, collectThreshold = 0L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist == expected)
    // graft.clusters.collectThreshold conf overrides the parameter: 0
    // forces the distributed path even though the param default is 1M
    spark.conf.set("graft.clusters.collectThreshold", "0")
    try {
      val viaConf = Dedup.clusters(pairs).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(viaConf == expected)
    } finally spark.conf.unset("graft.clusters.collectThreshold")
  }

  test("distributed clusters: a 200-node chain converges under the round cap (pointer jumping)") {
    import spark.implicits._
    // the bounded-edge layout reduces an m-clique to a spanning chain of
    // diameter ~m — plain neighbor-min label propagation needs O(m)
    // rounds and silently emitted an "upper approximation" past the
    // 20-round cap (the sf10 probe measured 300k split labels); pointer
    // jumping must converge in O(log m)
    val chain = (0L until 199L).map(i => (i, i + 1)).toDF("a", "b")
    val labels = Dedup.clusters(chain, collectThreshold = 0L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size == 200 && labels.values.forall(_ == 0L),
      s"chain did not collapse to one min-labeled component: " +
        s"${labels.values.toSet.size} distinct reps")
  }

  test("leakproof split: cluster members move together; total, deterministic, partition-independent") {
    import spark.implicits._
    val docs = spark.range(1, 101).select(col("id").as("doc_id"))
    val pairs = Seq((2L, 3L), (1L, 2L), (7L, 9L)).toDF("a", "b")
    val out = Dedup.leakproofSplit(docs, pairs, valRate = 0.2, testRate = 0.2,
      salt = "s1").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // total: exactly one row per input doc
    assert(out.map(_._1).toSet == (1L to 100L).toSet && out.length == 100)
    val byId = out.map(t => t._1 -> t).toMap
    // cluster members share group AND side — the leak-proof property
    assert(Seq(1L, 2L, 3L).map(byId(_)._2).distinct == Seq(1L))
    assert(Seq(1L, 2L, 3L).map(byId(_)._3).distinct.length == 1)
    assert(Seq(7L, 9L).map(byId(_)._2).distinct == Seq(7L))
    assert(Seq(7L, 9L).map(byId(_)._3).distinct.length == 1)
    // singletons group as themselves
    assert(byId(50L)._2 == 50L)
    // at 40% held out over 100 groups, every side is populated
    assert(out.map(_._3).toSet == Set("train", "val", "test"))
    // identical assignment under any input partitioning
    val repart = Dedup.leakproofSplit(docs.repartition(7), pairs.repartition(3),
      valRate = 0.2, testRate = 0.2, salt = "s1").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(repart == out.toSet)
    // the salt moves the draw (different salt → different assignment)
    val other = Dedup.leakproofSplit(docs, pairs, valRate = 0.2, testRate = 0.2,
      salt = "s2").collect().map(r => (r.getLong(0), r.getString(2))).toSet
    assert(other != out.map(t => (t._1, t._3)).toSet)
  }

  test("embedding cosine pairs: LSH-bucketed equals exact all-pairs at tau=0.4") {
    val a = emb.select(col("vec_id").as("a"), col("embedding").as("va"))
    val b = emb.select(col("vec_id").as("b"), col("embedding").as("vb"))
    val exact = a.crossJoin(b).filter(col("a") < col("b"))
      .withColumn("sim", Similarity.cosine(col("va"), col("vb")))
      .filter(col("sim") >= 0.4)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.cosinePairs(emb, "vec_id", "embedding", dim = 64, minSim = 0.4)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    assert(lsh == exact, s"missing=${exact -- lsh} extra=${lsh -- exact}")
  }

  test("simhash: near-dup pairs have small hamming distance; candidates contain planted dups") {
    val exact = Dedup.ngramJaccardPairs(docs, "text", "doc_id", 5, 0.9)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sim = Dedup.simHashPairs(docs, "text", "doc_id", maxHamming = 12)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.count(sim.contains).toDouble / math.max(exact.size, 1)
    assert(recall >= 0.9, s"simhash recall $recall over ${exact.size} pairs")
  }

  test("z-order layout: per-partition min/max spans bounded on BOTH dims; z-value interleave exact") {
    val spark2 = spark
    import spark2.implicits._
    // dense 64x64 grid: every (x, y) pair once — locality is measurable
    val grid = spark.range(64 * 64)
      .select((col("id") / 64).cast("long").as("x"), (col("id") % 64).cast("long").as("y"))
    // interleave correctness against a bit-twiddling reference
    def zRef(x: Long, y: Long): Long =
      (0 until 16).map(i => (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum
    val zs = grid.withColumn("z", Layout.zValue(col("x"), col("y")))
      .as[(Long, Long, Long)].collect()
    zs.foreach { case (x, y, z) => assert(z == zRef(x, y), s"z($x,$y)") }

    // z-layout in 16 partitions: BOTH dims' average span must be far below
    // the global span (a single-dim sort leaves the other dim's span full)
    val nPart = 16
    def spans(df: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val rows = df.withColumn("p", spark_partition_id())
        .groupBy("p").agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"))
        .select("sx", "sy").as[(Long, Long)].collect()
      (rows.map(_._1).sum.toDouble / rows.length, rows.map(_._2).sum.toDouble / rows.length)
    }
    val (zx, zy) = spans(Layout.zOrderLayout(grid, col("x"), col("y"), nPart))
    val (sx, sy) = spans(grid.repartitionByRange(nPart, col("x")).sortWithinPartitions("x"))
    assert(zx < 32 && zy < 32, s"z-layout spans ($zx, $zy) should bound both dims (global 63)")
    assert(sy > 55, s"x-sorted layout leaves y unbounded (got $sy)")
    assert(zx < sx / 1.5 || zy < sy / 1.5, "z-layout beats single-dim sort on the non-sorted dim")
  }

  test("fuzzy term pairs: deletion-blocking equals brute force; all three edit kinds found") {
    val spark2 = spark
    import spark2.implicits._
    // substitution (cat/cot), deletion (cats/cat via insert), insertion
    // (table/tables), plus distance-2 decoys that must NOT pair
    val df = Seq(
      (1L, "cats cat table"), (2L, "cot cat tables"),
      (3L, "table cart cost"), (4L, "mouse moose house")
    ).toDF("doc_id", "text")
    val got = Dedup.fuzzyTermPairs(df, "text", "doc_id", minLen = 3)
      .select("term_a", "term_b").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val vocab = df.select(explode(split(lower(col("text")), " ")).as("t"))
      .filter(length(col("t")) >= 3).distinct().as[String].collect()
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val brute = (for { a <- vocab; b <- vocab if a < b && lev(a, b) <= 1 } yield (a, b)).toSet
    assert(got == brute, s"missing=${brute -- got} extra=${got -- brute}")
    assert(got.contains(("cat", "cot")) && got.contains(("cat", "cats"))
      && got.contains(("table", "tables")))
    assert(!got.contains(("cart", "cost")), "distance-2 decoy must not pair")
  }

  test("brute-force cosine: self-similarity is 1, results ranked, k respected") {
    val out = Similarity.bruteForceTopK(emb, emb.limit(3), "vec_id", "embedding", 4)
    val rows = out.collect()
    assert(rows.length == 12)
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    byQ.values.foreach { rs =>
      val sims = rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("sim"))
      assert(sims.zip(sims.tail).forall { case (x, y) => x >= y }, "descending by sim")
      assert(sims.forall(s => s >= -1.0001 && s <= 1.0001))
    }
  }

  test("LSH range search: exact duplicates always found, nothing below the radius emitted") {
    import spark.implicits._
    // a duplicate vector collides with its twin in EVERY band (identical
    // signature), so lshRange must find it at ANY banding configuration
    val probe = emb.filter(col("vec_id") === 3L)
      .select(lit(9999L).as("vec_id"), col("embedding"))
    val corpus = emb.select(col("vec_id"), col("embedding")).unionByName(probe)
    for ((bands, bits) <- Seq((32, 2), (8, 8))) {
      val got = Similarity.lshRange(corpus, probe, "vec_id", "embedding",
        minSim = 0.99, dim = 64, bands = bands, bitsPerBand = bits)
        .as[(Long, Long, Double)].collect()
      assert(got.exists { case (q, n, s) => q == 9999L && n == 3L && s > 0.999 },
        s"bands=$bands/bits=$bits: duplicate twin not found: ${got.toSeq}")
      assert(got.forall(_._3 >= 0.99), "emitted a pair below the radius")
    }
    // radius semantics vs exact truth: on near-orthogonal vectors a high
    // radius yields exactly the duplicate pair and nothing else
    val all = Similarity.lshRange(corpus, probe, "vec_id", "embedding",
      minSim = 0.99, dim = 64)
      .select("neighbor_id").as[Long].collect().toSet
    assert(all == Set(3L), s"expected only the planted twin, got $all")
  }

  test("LSH ANN: recall@5 >= 0.5 vs brute force on the test corpus") {
    val queries = emb.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Similarity.lshTopK(emb, queries, "vec_id", "embedding", 5, dim = 64)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.count(ann.contains).toDouble / exact.size
    assert(recall >= 0.5, s"ANN recall@5 = $recall")
  }

  test("IVF ANN: recall@5 >= 0.4 vs brute force; deterministic across runs") {
    val queries = emb.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def run() = Similarity.ivfTopK(emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "rank", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val ivf1 = run()
    val recall = exact.count { case (q, n) => ivf1.exists(t => t._1 == q && t._3 == n) }
      .toDouble / exact.size
    assert(recall >= 0.4, s"IVF recall@5 = $recall")
    assert(run() == ivf1, "seeded clustering must be deterministic")
  }

  test("PQ ANN: recall@5 vs brute force; deterministic; exact sims on output") {
    val queries = emb.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id", "sim").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    val exactSet = exact.map(_._1).toSet
    def run() = Similarity.pqTopK(emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "rank", "neighbor_id", "sim").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val pq1 = run()
    val recall = exactSet.count { case (q, n) => pq1.exists(t => t._1 == q && t._3 == n) }
      .toDouble / exactSet.size
    assert(recall >= 0.4, s"PQ recall@5 = $recall")
    assert(run() == pq1, "seeded codebook training must be deterministic")
    // re-rank emits EXACT cosine: any (query, neighbor) also in the exact
    // result must carry the identical similarity
    val exactSim = exact.toMap
    pq1.foreach { case (q, _, n, s) =>
      exactSim.get((q, n)).foreach(es =>
        assert(math.abs(es - s) < 1e-12, s"sim mismatch for ($q,$n): $s vs $es"))
    }
  }

  test("approx quantile sketch stays within its rank-error bound of the exact percentile") {
    val li = spark.read.parquet(s"$Sf/lineitem.parquet")
      .select((col("l_extendedprice") * 100).cast("long").as("cents"))
    val acc = 10000 // rank error <= n/acc
    val n = li.count()
    val eps = n.toDouble / acc / n // relative rank tolerance
    for (q <- Seq(0.5, 0.95)) {
      val approx = li.agg(approx_percentile(col("cents"), lit(q), lit(acc)))
        .head().getLong(0)
      // exact values at the rank-tolerance edges bracket the sketch output
      val Array(lo, hi) = li.stat.approxQuantile("cents",
        Array(math.max(0.0, q - 2 * eps), math.min(1.0, q + 2 * eps)), 0.0)
      assert(approx >= lo && approx <= hi,
        s"q=$q approx=$approx outside exact bracket [$lo, $hi]")
    }
  }

  test("space-saving sketch: exact when capacity >= cardinality; bounded when under") {
    import spark.implicits._
    val words = docs.select(explode(split(col("text"), " ")).as("word"))
    val exact = words.groupBy("word").count()
      .orderBy(col("count").desc, col("word")).limit(5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val sketch = words.agg(Sketches.topKUdaf(256, 5)(col("word")))
      .head().getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getString(0), r.getLong(1)))
    assert(sketch == exact, "capacity >= vocabulary => exact heavy hitters")
    // eviction path: capacity smaller than cardinality still surfaces the
    // dominant item with count within N/capacity overestimate
    val skewed = (Seq.fill(500)("hot") ++ (1 to 400).map(i => s"cold_$i")).toDF("w")
    val out = skewed.agg(Sketches.topKUdaf(16, 1)(col("w")))
      .head().getSeq[org.apache.spark.sql.Row](0).head
    assert(out.getString(0) == "hot")
    val n = 900.0
    assert(out.getLong(1) >= 500 && out.getLong(1) <= 500 + n / 16)
  }

  test("bloom-prefiltered join equals the plain join (no false negatives)") {
    import spark.implicits._
    val li = spark.read.parquet(s"$Sf/lineitem.parquet").select("l_suppkey", "l_orderkey")
    val suppAll = spark.read.parquet(s"$Sf/supplier.parquet")
    val nation = suppAll.selectExpr("CAST(s_nationkey AS LONG)").head().getLong(0)
    val supp = suppAll.filter(col("s_nationkey") === nation)
      .select(col("s_suppkey").as("l_suppkey"))
    val plain = li.join(supp, Seq("l_suppkey")).count()
    val bloom = Joins.bloomPrefilteredJoin(li, supp, "l_suppkey").count()
    assert(plain > 0 && bloom == plain)
    // empty small side: empty result, no NPE from the null agg buffer
    assert(Joins.bloomPrefilteredJoin(li, supp.limit(0), "l_suppkey").count() == 0)
  }

  test("range join: binned bucket join equals the naive quadratic join") {
    import spark.implicits._
    // points 0..199; intervals of mixed widths incl. multi-bin spans,
    // bin-boundary-straddling and empty (dropped) ones
    val points = (0L until 200L).map(p => (p, p)).toDF("pid", "t")
    val intervals = Seq(
      (1L, 0L, 10L), (2L, 5L, 75L), (3L, 63L, 64L), (4L, 100L, 100L),
      (5L, 99L, 161L), (6L, 150L, 300L), (7L, 42L, 42L)
    ).toDF("iid", "lo", "hi")
    val binned = Joins.rangeJoin(points, "t", intervals, "lo", "hi", binSize = 64L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = points.crossJoin(intervals)
      .filter(col("t") >= col("lo") && col("t") < col("hi"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(binned == naive, s"missing=${naive -- binned} extra=${binned -- naive}")
    assert(!binned.exists(_._2 == 4L) && !binned.exists(_._2 == 7L), "empty intervals dropped")
  }

  test("multimodal payload: schema, metadata integrity, distributed feature extract") {
    val p = Multimodal.asPayload(docs.select(col("doc_id"), col("text")), "text", "text")
    assert(p.schema("payload").dataType == org.apache.spark.sql.types.BinaryType)
    val meta = p.select(col("meta.byte_len"), length(col("text"))).collect()
    meta.foreach(r => assert(r.getLong(0) >= r.getInt(1), "byte_len >= char len"))
    // real ImageIO decode over real PNG fixtures, partition-parallel
    val imgs = Multimodal.syntheticImages(docs.select(col("doc_id")), "doc_id")
    val feats = Multimodal.extractFeatures(imgs, "doc_id")
    assert(feats.count() == docs.count())
    feats.collect().foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) == 8 + (id % 13).toInt && r.getInt(2) == 8 + (id % 7).toInt)
      assert(r.getInt(3) == 3 && r.getDouble(4) == (id % 256).toDouble)
    }
    val f1 = feats.orderBy("doc_id").collect().map(_.toSeq)
    val f2 = Multimodal.extractFeatures(imgs, "doc_id").orderBy("doc_id").collect().map(_.toSeq)
    assert(f1.toSeq == f2.toSeq)
  }

  test("chunk windows: full coverage, stride overlap, linear output") {
    import spark.implicits._
    val text = (1 to 150).map(i => s"w$i").mkString(" ")
    val out = Seq((1L, text)).toDF("doc_id", "text")
      .select(col("doc_id"), posexplode(TextOps.chunkWindows(col("text"), 64, 48)).as(Seq("idx", "c")))
      .select(col("idx"), col("c.start"), col("c.chunk")).orderBy("idx").collect()
    // starts advance by the stride until the token count is exceeded
    assert(out.map(_.getInt(1)).toSeq == Seq(0, 48, 96, 144))
    // every token is covered, consecutive chunks overlap by window-stride
    val chunks = out.map(_.getString(2).split(" ").toSeq)
    assert(chunks.head.take(3) == Seq("w1", "w2", "w3"))
    assert(chunks(0).takeRight(16) == chunks(1).take(16), "64-48=16 token overlap")
    assert(chunks.flatten.distinct.length == 150, "all tokens appear")
    assert(chunks.last == Seq("w145", "w146", "w147", "w148", "w149", "w150"))
  }

  test("wordpiece: greedy longest-match, round-trip, UNK on untokenizable") {
    val vocab = Subword.DefaultVocab
    val set = vocab.toSet
    val maxLen = vocab.map(_.length).max
    // longest-match beats left-to-right shorter pieces
    assert(Subword.encodeWord("the", set, maxLen, "[UNK]") == Seq("the"))
    assert(Subword.encodeWord("prozing", set, maxLen, "[UNK]") ==
      Seq("pro", "##z", "##ing"))
    // property: stripping '##' and concatenating reconstructs the word
    val words = Seq("unexterminated", "alphabet", "zzz", "a", "questionably")
    words.foreach { w =>
      val pieces = Subword.encodeWord(w, set, maxLen, "[UNK]")
      assert(pieces.map(_.stripPrefix("##")).mkString == w, s"round-trip failed for $w")
      assert(pieces.tail.forall(_.startsWith("##")), "continuations carry ##")
      assert(!pieces.head.startsWith("##"), "head piece is bare")
    }
    // a character outside the vocab collapses the whole word to UNK
    assert(Subword.encodeWord("naïve", set, maxLen, "[UNK]") == Seq("[UNK]"))
    // distributed shape: one row per piece, ids match vocab positions
    val df = spark.createDataFrame(Seq((1L, "The prozing"))).toDF("doc_id", "text")
    val out = Subword.wordpiece(df, "doc_id", "text", vocab)
      .orderBy("pos", "piece_pos").collect()
    assert(out.map(_.getString(4)).toSeq == Seq("the", "pro", "##z", "##ing"))
    assert(out.map(_.getInt(3)).toSeq ==
      Seq(vocab.indexOf("the") + 1, vocab.indexOf("pro") + 1,
        vocab.indexOf("##z") + 1, vocab.indexOf("##ing") + 1))
  }

  test("image decode/resize: pixel-exact through the JDK codec") {
    // encode → decode round-trip on a known fixture
    val f = Multimodal.decodeImage(Multimodal.syntheticPng(7))
    assert(f == Multimodal.Feature(15, 8, 3, 7.0)) // 8+7%13, 8+7%7, gray=7
    // nearest-neighbor downscale of a constant image preserves the mean
    val r = Multimodal.decodeImage(Multimodal.resizeImage(Multimodal.syntheticPng(7), 4, 4))
    assert(r == Multimodal.Feature(4, 4, 3, 7.0))
    // non-image bytes are rejected, not silently faked
    assertThrows[IllegalArgumentException](Multimodal.decodeImage("not a png".getBytes))
  }

  test("audio decode: WAV round-trip exact through the JDK codec") {
    val f = Multimodal.decodeWav(Multimodal.syntheticWav(42))
    assert(f == Multimodal.AudioFeature(8000, 1, 1000 + 42 % 512, 42.0))
    // non-audio bytes are rejected
    intercept[Exception](Multimodal.decodeWav("not a wav".getBytes))
    // distributed: decoded stats match the generating formulas
    val d = Multimodal.syntheticAudio(docs.select(col("doc_id")).limit(40), "doc_id")
    Multimodal.extractAudioFeatures(d, "doc_id").collect().foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) == 8000 && r.getInt(2) == 1)
      assert(r.getLong(3) == 1000 + id % 512 && r.getDouble(4) == (id % 1000).toDouble)
    }
  }

  test("multimodal resize + frame sampling: deterministic, shape-correct, distinct inputs stay distinct") {
    val imgs = Multimodal.syntheticImages(docs.select(col("doc_id")).limit(50), "doc_id")
    val r1 = Multimodal.resize(imgs, "doc_id", 96, 96)
    val rows = r1.select("doc_id", "meta.byte_len", "meta.content_hash").collect()
    assert(rows.map(_.getString(2)).distinct.length > 1, "distinct inputs → distinct resized bytes")
    val r2 = Multimodal.resize(imgs, "doc_id", 96, 96)
      .select("doc_id", "meta.content_hash").collect().map(_.toSeq).toSet
    assert(r1.select("doc_id", "meta.content_hash").collect().map(_.toSeq).toSet == r2,
      "resize is deterministic")
    val p = Multimodal.asPayload(
      docs.select(col("doc_id"), col("text")).limit(50), "text", "video")
    val frames = Multimodal.frameSample(p, "doc_id", nFrames = 4)
    assert(frames.count() == 50 * 4)
    val perDoc = frames.groupBy("doc_id")
      .agg(countDistinct(col("frame_idx")).as("n"), countDistinct(md5(col("frame"))).as("d"))
      .collect()
    assert(perDoc.forall(r => r.getLong(1) == 4 && r.getLong(2) == 4),
      "4 distinct frames per document")
  }

  test("deterministic sample: stable across runs, rate-accurate, salt-sensitive") {
    import spark.implicits._
    val ids = (1L to 20000L).toDF("id")
    def pick(salt: String) = ids
      .filter(TextOps.deterministicSample(col("id"), 0.2, salt))
      .collect().map(_.getLong(0)).toSet
    val a = pick("s1")
    assert(a == pick("s1"), "same salt => identical subset")
    assert(a != pick("s2"), "different salt => different draw")
    val rate = a.size / 20000.0
    assert(rate > 0.18 && rate < 0.22, s"empirical rate $rate")
    assert(pick("") == ids.repartition(7)
      .filter(TextOps.deterministicSample(col("id"), 0.2, "")).collect()
      .map(_.getLong(0)).toSet, "partitioning-independent")
  }

  test("sequence packing: every doc once, bins within budget, partitioning-independent") {
    import spark.implicits._
    val docs = ((1L to 50L).map(i => (i, i % 7 * 40 + 10)) :+ (99L, 5000L)) // one oversized
      .toDF("doc_id", "n_tokens")
    val packed = TextOps.packSequences(docs, "doc_id", "n_tokens", maxTokens = 512)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(packed.map(_._1).sorted.toSeq == ((1L to 50L) :+ 99L).toSeq, "every doc exactly once")
    packed.groupBy(_._2).foreach { case (bin, rows) =>
      val total = rows.map(_._3).sum
      assert(total <= 512 || rows.length == 1,
        s"bin $bin over budget with ${rows.length} docs / $total tokens")
    }
    // the defining property: bin assignment derives from (id, salt)
    // only, never from the physical input layout
    val re = TextOps.packSequences(docs.repartition(13), "doc_id", "n_tokens", maxTokens = 512)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(re.toSet == packed.toSet, "same bins from any input partitioning")
    // salt varies the draw: a different salt reshuffles shard membership
    val salted = TextOps.packSequences(docs, "doc_id", "n_tokens",
      maxTokens = 512, salt = "other")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(salted.toSet != packed.toSet, "different salt => different packing")
  }

  test("pii redaction: urls, emails, ips replaced with typed placeholders; counts exact") {
    import spark.implicits._
    val t = Seq(
      (1L, "contact me at alice.smith+x@example.co.uk or 10.0.0.1 today"),
      (2L, "see https://example.com/a?user=bob@example.com and 192.168.1.255"),
      (3L, "clean text with no identifiers at all")).toDF("id", "text")
    val out = t.select(col("id"), TextOps.redactPii(col("text")).as("r"),
        struct(TextOps.piiCounts(col("text")).map { case (n, c) => c.as(n) }: _*).as("c"))
      .orderBy("id").collect()
    assert(out(0).getString(1) == "contact me at [EMAIL] or [IP] today")
    // the email inside the URL is swallowed by the URL redaction...
    assert(out(1).getString(1) == "see [URL] and [IP]")
    // ...but raw-text counts see both
    assert(out(1).getStruct(2).toSeq == Seq(1L, 1L, 1L))
    assert(out(2).getString(1) == "clean text with no identifiers at all")
    assert(out(2).getStruct(2).toSeq == Seq(0L, 0L, 0L))
  }

  test("text ops: token counts exact, langid deterministic, fingerprint collision-free here") {
    import spark.implicits._
    val t = Seq((1L, "the quick brown fox"), (2L, "the the the a of and to in x"))
      .toDF("id", "text")
    val counts = t.select(col("id"), TextOps.tokenCount(col("text")).as("n"),
      TextOps.stopwordCount(col("text")).as("stops")).orderBy("id").collect()
    assert(counts(0).getInt(1) == 4 && counts(0).getInt(2) == 1)
    assert(counts(1).getInt(1) == 9 && counts(1).getInt(2) == 8)
    val langs = t.select(TextOps.langIdHeuristic(col("text"))).collect().map(_.getString(0))
    assert(langs.forall(_ == "en"))
    val zh = Seq((1L, "你好 世界")).toDF("id", "text")
      .select(TextOps.langIdHeuristic(col("text"))).head().getString(0)
    assert(zh == "zh")
  }

  test("image average hash: matches the closed form on an 8x8 identity case; equal images collide") {
    // id = 91: 91%13 == 0 and 91%7 == 0 → an 8×8 image, so the
    // downsample is the identity and the hash is computable directly
    val id = 91L
    val vals = for (y <- 0 until 8; x <- 0 until 8) yield ((id + 7 * x + 13 * y) % 256).toInt
    val mean = vals.sum / 64.0
    var expected = 0L
    vals.zipWithIndex.foreach { case (v, i) => if (v > mean) expected |= (1L << i) }
    val h = Multimodal.averageHash(Multimodal.syntheticGradientPng(id))
    assert(h == expected)
    assert(Multimodal.averageHash(Multimodal.syntheticGradientPng(id)) == h,
      "hash is deterministic")
    assert(Multimodal.averageHash(Multimodal.syntheticPng(id)) == 0L,
      "constant image has no above-mean samples (strict threshold)")
  }

  test("temperature mixture sampling: rare strata keep a larger share, deterministic, capped at 1") {
    import spark.implicits._
    // 400 common rows vs 9 rare rows: keep rates 3/sqrt(400)=0.15 and
    // min(1, 3/3)=1.0 — the rare stratum survives whole
    val t = ((1 to 400).map(i => (i.toLong, "common")) ++
      (401 to 409).map(i => (i.toLong, "rare"))).toDF("id", "strata")
    val out = TextOps.temperatureMixSample(t, "id", "strata", scale = 3.0, salt = "s")
    val byStrata = out.groupBy("strata").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStrata("rare") == 9, "rate capped at 1.0 keeps every rare row")
    val commonFrac = byStrata("common").toDouble / 400
    assert(commonFrac > 0.05 && commonFrac < 0.25, s"~0.15 expected, got $commonFrac")
    assert(out.collect().toSet ==
      TextOps.temperatureMixSample(t, "id", "strata", scale = 3.0, salt = "s").collect().toSet)
  }

  test("epoch expansion: floor copies + md5-fractional extra, zero drops, default applies") {
    import spark.implicits._
    val t = ((1 to 100).map(i => (i.toLong, "up")) ++
      (101 to 200).map(i => (i.toLong, "down")) ++
      (201 to 300).map(i => (i.toLong, "gone")) ++
      (301 to 400).map(i => (i.toLong, "other"))).toDF("id", "strata")
    val out = TextOps.epochExpand(t, "id", "strata",
      factors = Map("up" -> 2.5, "down" -> 0.4, "gone" -> 0.0),
      defaultFactor = 1.0, salt = "e")
    val byStrata = out.groupBy("strata").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // up: 2 or 3 copies each — between 200 and 300, ~250 expected
    assert(byStrata("up") >= 200 && byStrata("up") <= 300, s"got ${byStrata("up")}")
    assert(byStrata("up") > 220 && byStrata("up") < 280, s"~250 expected, got ${byStrata("up")}")
    // down: 0 or 1 copies, ~40 expected
    assert(byStrata("down") > 25 && byStrata("down") < 55, s"~40 expected, got ${byStrata("down")}")
    assert(!byStrata.contains("gone"), "factor 0 drops the stratum")
    assert(byStrata("other") == 100, "integer default factor replicates exactly")
    // per-doc epoch indices are dense 1..n
    val epochs = out.filter(col("strata") === "up").groupBy("id")
      .agg(count(lit(1)).as("n"), max(col("epoch")).as("mx"), min(col("epoch")).as("mn"))
      .collect()
    assert(epochs.forall(r => r.getLong(2) == r.getLong(1) && r.getLong(3) == 1L),
      "epoch must run dense from 1 to the copy count")
    // deterministic across runs
    assert(out.collect().toSet == TextOps.epochExpand(t, "id", "strata",
      factors = Map("up" -> 2.5, "down" -> 0.4, "gone" -> 0.0),
      defaultFactor = 1.0, salt = "e").collect().toSet)
  }

  test("train order: total, dense, bucket-monotone, partitioning-independent") {
    import spark.implicits._
    val t = (1 to 500).map(i => (i.toLong, (i % 7).toLong)).toDF("id", "diff")
    val out = TextOps.trainOrder(t, "id", col("diff"), numShards = 4, salt = "t")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(out.map(_._3).sorted.toSeq == (0L until 500L), "positions dense 0..n-1")
    val byPos = out.sortBy(_._3)
    assert(byPos.map(_._2).toSeq == byPos.map(_._2).sorted.toSeq,
      "easier buckets must come first")
    assert(byPos.forall { case (_, _, pos, shard) => shard == pos % 4 },
      "round-robin shard stripe")
    // same order under a different input partitioning
    val re = TextOps.trainOrder(t.repartition(13), "id", col("diff"),
        numShards = 4, salt = "t")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(out.forall { case (id, _, pos, _) => re(id) == pos },
      "global position must not depend on input partitioning")
  }

  test("budget select: greedy best-first prefix, exact running sums, partitioning-independent") {
    import spark.implicits._
    // weight = id, score = id % 10: selection must follow score desc
    // (md5/id tiebreak), never weight
    val t = (1 to 200).map(i => (i.toLong, (i % 10).toLong, i.toLong))
      .toDF("id", "s", "w")
    val out = TextOps.budgetSelect(t, "id", col("s"), col("w"),
        budget = 3000L, salt = "b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty && out.forall(_._4 <= 3000L), "budget is a hard cap")
    // replay the greedy prefix locally over the same total order
    val order = (1 to 200).map { i =>
      val id = i.toLong
      (id, (i % 10).toLong,
        java.security.MessageDigest.getInstance("MD5")
          .digest((id.toString + "b").getBytes("UTF-8"))
          .map("%02x".format(_)).mkString)
    }.sortBy { case (id, s, h) => (-s, h, id) }
    var acc = 0L
    val expected = order.flatMap { case (id, s, _) =>
      acc += id // weight = id
      if (acc <= 3000L) Some((id, s, id, acc)) else None
    }.toSet
    // monotone weights make the greedy prefix exactly the cum<=budget set
    assert(out.toSet == expected,
      s"missing=${expected -- out.toSet} extra=${out.toSet -- expected}")
    // null weight counts 0 (kept for free), zero budget keeps only
    // zero-weight heads
    val withNull = Seq((1L, 5L, java.lang.Long.valueOf(7L)),
      (2L, 9L, null.asInstanceOf[java.lang.Long])).toDF("id", "s", "w")
    val nOut = TextOps.budgetSelect(withNull, "id", col("s"), col("w"),
      budget = 0L).collect().map(r => (r.getLong(0), r.getLong(3)))
    assert(nOut.toSeq == Seq((2L, 0L)), "null weight is free; 7-weight doc busts budget 0")
    // identical selection under any input partitioning
    val re = TextOps.budgetSelect(t.repartition(13), "id", col("s"), col("w"),
        budget = 3000L, salt = "b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(re == out.toSet)
  }

  test("hashed linear classifier: score is the exact bucket-weight sum") {
    import spark.implicits._
    val t = Seq((1L, "alpha beta alpha"), (2L, "solo")).toDF("doc_id", "text")
    val out = TextOps.hashedLinearScore(t, "text", "doc_id").orderBy("doc_id").collect()
    def w(tok: String) =
      TextOps.DefaultClassifierWeights((Dedup.fnv1a64(tok) & 63).toInt).toLong
    assert(out(0).getLong(1) == 3 && out(0).getLong(2) == 2 * w("alpha") + w("beta"))
    assert(out(1).getLong(1) == 1 && out(1).getLong(2) == w("solo"))
    assert(out(0).getInt(3) == (if (2 * w("alpha") + w("beta") > 0) 1 else 0))
  }

  test("semantic dedup: cluster-scoped pairs are a subset of exact pairs; multi-probe lifts recall") {
    val exact = Similarity.cosinePairs(emb, "vec_id", "embedding", dim = 64, minSim = 0.4)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    def run(probe: Int) = Similarity.semanticPairs(
        emb, "vec_id", "embedding", minSim = 0.4, nClusters = 16, nProbe = probe)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val single = run(1)
    val multi = run(3)
    assert(single.subsetOf(exact) && multi.subsetOf(exact),
      "verified pairs must be exact-threshold pairs")
    assert(single.subsetOf(multi), "probing more clusters only adds candidates")
    assert(multi.size.toDouble / exact.size >= 0.8,
      s"nProbe=3 recall ${multi.size.toDouble / exact.size}")
    assert(run(3) == multi, "seeded clustering is deterministic")
  }

  test("sampled semantic certificate: truth is the exact set restricted to strata; Wilson CI covers the exact tier's recall") {
    // The r17-verdict task-1 contract, asserted where the exact tier is
    // still computable (driver SFs): (1) the stratified pair sample is
    // EXACTLY the all-pairs truth restricted to within-stratum pairs —
    // no pair outside the exact set, sims identical; (2) the Wilson 95%
    // CI of the scale path's SAMPLED recall covers its FULL recall —
    // the number the sampled gate exists to certify once all-pairs is
    // unaffordable. sf0.1 is the interesting leg (B = 10, a real 10%
    // sample); at sf0.001/sf0.01 B = 1 and the sample degenerates to
    // the full pair space (coverage is then trivial — the estimate IS
    // the exact number, also asserted).
    def leg(sfDir: String): Unit = {
      val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val exact = Similarity.cosinePairs(e, "vec_id", "embedding", dim = 64, minSim = 0.4)
        .select("a", "b", "sim").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val sample = Similarity.sampledExactPairs(e, "vec_id", "embedding", 0.4, 200000L)
        .select("a", "b", "sim").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      assert(sample.keySet.subsetOf(exact.keySet), s"$sfDir: sampled pair outside the exact set")
      assert(sample.forall { case (k, s) => math.abs(exact(k) - s) < 1e-12 },
        s"$sfDir: sampled sims must be the exact sims")
      val nVec = e.count()
      val assign = Similarity.clusterAssignments(e, "vec_id", "embedding",
          nClusters = graft.ops.Similarity.scaledClusterCount(nVec), nProbe = 3)
        .collect().map(r => (r.getLong(0), r.getInt(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      def found(p: (Long, Long)): Boolean =
        assign(p._1).intersect(assign(p._2)).nonEmpty
      val fullRecall = exact.keySet.count(found).toDouble / exact.size
      val m = sample.size.toDouble
      val p = sample.keySet.count(found) / m
      val z2 = 3.841459
      val half = math.sqrt(z2) * math.sqrt(p * (1 - p) / m + z2 / (4 * m * m))
      val (lo, hi) = ((p + z2 / (2 * m) - half) / (1 + z2 / m),
        (p + z2 / (2 * m) + half) / (1 + z2 / m))
      assert(lo <= fullRecall && fullRecall <= hi,
        s"$sfDir: Wilson CI [$lo, $hi] (p=$p, m=$m) must cover full recall $fullRecall")
      info(f"$sfDir: full recall $fullRecall%.4f, sampled $p%.4f, CI [$lo%.4f, $hi%.4f], m=${m.toInt}")
    }
    leg("/root/testdata/sf0.001")
    leg("/root/testdata/sf0.1")
  }

  test("embeddings: normalize yields unit norm; zero vector stays zero") {
    import spark.implicits._
    val norms = emb.select(
        Similarity.norm(Embeddings.l2Normalize(col("embedding"))).as("n"))
      .collect().map(_.getDouble(0))
    assert(norms.forall(n => math.abs(n - 1.0) < 1e-9))
    val z = Seq((1L, Array(0f, 0f, 0f))).toDF("id", "embedding")
      .select(Embeddings.l2Normalize(col("embedding"))).head().getSeq[Double](0)
    assert(z == Seq(0.0, 0.0, 0.0))
  }

  test("embeddings: int8 quantization bounded and faithful (dequant cosine >= 0.999)") {
    val q = emb.select(col("embedding"),
      Embeddings.quantizeInt8(col("embedding")).as("q"),
      Embeddings.int8Scale(col("embedding")).as("s"))
    val bad = q.filter(exists(col("q"), x => abs(x) > 127)).count()
    assert(bad == 0, "|q_i| must be <= 127")
    val dequant = transform(col("q"), x => x.cast("double") * col("s"))
    val cosines = q.select(Similarity.cosine(col("embedding"), dequant))
      .collect().map(_.getDouble(0))
    assert(cosines.forall(_ >= 0.999), s"worst dequant cosine ${cosines.min}")
  }

  test("embeddings: signed projection matches the sign hash on unit vectors, is deterministic") {
    import spark.implicits._
    // e_i projects to sign(j, i) * scale in every output row j
    val dim = 8
    val rows = (0 until dim).map(i =>
      (i.toLong, Array.tabulate(dim)(k => if (k == i) 1.0f else 0.0f)))
    val proj = rows.toDF("id", "embedding")
      .select(col("id"), Embeddings.projectSigned(col("embedding"), outDim = 4))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    for (i <- 0 until dim; j <- 0 until 4) {
      val expected = if ((j.toLong * 2654435761L + i.toLong * 40503L) % 97 < 48) 10000L else -10000L
      assert(proj(i.toLong)(j) == expected, s"e_$i row $j")
    }
    val a = emb.select(Embeddings.projectSigned(col("embedding"), 16)).collect().toSeq
    val b = emb.select(Embeddings.projectSigned(col("embedding"), 16)).collect().toSeq
    assert(a == b)
  }

  test("BPE: single-pass merge semantics, encode round-trip, training golden") {
    // single left-to-right non-overlapping pass (the defined semantics)
    assert(Subword.mergePass(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))
    assert(Subword.mergePass(Seq("b", "a", "b"), "a", "b") == Seq("b", "ab"))
    assert(Subword.encodeBpe("the", Seq(("t", "h"), ("th", "e"))) == Seq("the"))
    // concatenating pieces always reconstructs the word
    Seq("spark", "tables", "queryable", "x", "zzz").foreach { w =>
      assert(Subword.encodeBpe(w, Subword.DefaultMerges).mkString == w)
    }
    // training golden: corpus {aa:2, ab:3} → merge (a,b,3) then (a,a,2),
    // then exhaustion stops early even with budget left
    val df = spark.createDataFrame(
      Seq((1L, "aa ab"), (2L, "ab aa"), (3L, "ab"))).toDF("doc_id", "text")
    val merges = Subword.bpeTrain(df, "text", numMerges = 5)
    assert(merges == Seq((0, "a", "b", 3L), (1, "a", "a", 2L)))
    // empty corpus → no merges (argmax finds no pairs on round one)
    assert(Subword.bpeTrain(df.limit(0), "text", numMerges = 5).isEmpty)
    // distributed encode matches the local encoder row for row
    val enc = Subword.bpeEncode(df, "doc_id", "text", Seq(("a", "b")))
      .orderBy("doc_id", "pos", "piece_pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3))).toSeq
    assert(enc == Seq(
      (1L, 0, 0, "a"), (1L, 0, 1, "a"), (1L, 1, 0, "ab"),
      (2L, 0, 0, "ab"), (2L, 1, 0, "a"), (2L, 1, 1, "a"),
      (3L, 0, 0, "ab")))
  }

  test("count-min sketch: overestimate-only, error bound, partition-invariant") {
    import spark.implicits._
    val items = (1 to 50).flatMap(i => Seq.fill(i)(s"w$i"))
    val query = Seq("w1", "w25", "w50", "absent")
    def estimates(parts: Int): Map[String, Long] =
      items.toDF("tok").repartition(parts)
        .agg(Sketches.countMinUdaf(4, 256, query)(col("tok")))
        .head.getSeq[org.apache.spark.sql.Row](0)
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = estimates(7)
    val n = items.size.toLong
    query.foreach { q =>
      val exact = if (q == "absent") 0L else q.drop(1).toLong
      assert(est(q) >= exact, s"$q under-estimated")
      assert(est(q) <= exact + (3 * math.E / 256 * n).ceil.toLong, s"$q over bound")
    }
    // merge is element-wise add: estimates don't depend on partitioning
    assert(estimates(1) == est)
  }

  test("transitive closure: BFS-min depth on multi-path, cycle terminates") {
    val edges = spark.createDataFrame(Seq(
      (1L, 2L), (2L, 3L), (1L, 3L), // diamond: 1→3 direct and via 2
      (4L, 5L), (5L, 4L) // 2-cycle
    )).toDF("node", "parent")
    val out = Graphs.transitiveClosure(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(out == Map(
      (1L, 2L) -> 1, (1L, 3L) -> 1, (2L, 3L) -> 1, // direct edge wins over the 2-hop path
      (4L, 5L) -> 1, (5L, 4L) -> 1, (4L, 4L) -> 2, (5L, 5L) -> 2))
  }

  test("CDC apply: latest op wins, deletes remove, inserts add, rest untouched") {
    val snap = spark.createDataFrame(Seq((1L, "a"), (2L, "b"), (3L, "c")))
      .toDF("id", "v")
    val log = spark.createDataFrame(Seq(
      (2L, 1L, "U", "b2"), (2L, 2L, "D", null), // delete wins over earlier update
      (3L, 1L, "U", "c2"), // plain update
      (4L, 1L, "I", "d"), // insert of a new key
      (9L, 1L, "D", null) // delete of an absent key is a no-op
    )).toDF("id", "seq", "op", "v")
    val out = graft.ops.Cdc.applyLog(snap, log, "id", "op", Seq("seq"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "a", 3L -> "c2", 4L -> "d"))
  }

  test("CDC apply: malformed op anywhere fails loudly; full seq ties compact deterministically") {
    val snap = spark.createDataFrame(Seq((1L, "a"))).toDF("id", "v")
    // the bad op is SUPERSEDED by a later valid delete — it must still throw
    val badLog = spark.createDataFrame(Seq(
      (1L, 1L, "X", "boom"), (1L, 2L, "D", null))).toDF("id", "seq", "op", "v")
    intercept[Exception] {
      graft.ops.Cdc.applyLog(snap, badLog, "id", "op", Seq("seq")).collect()
    }
    // two rows fully tied on seq: winner is deterministic across
    // partitionings (op asc, then row hash)
    val tied = spark.createDataFrame(Seq(
      (1L, 1L, "U", "u1"), (1L, 1L, "U", "u2"))).toDF("id", "seq", "op", "v")
    def apply(parts: Int) =
      graft.ops.Cdc.applyLog(snap, tied.repartition(parts), "id", "op", Seq("seq"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(apply(1) == apply(7), "tie winner must not depend on partitioning")
  }

  test("chunk dedup: keep-first removal + in-order reassembly; null text drops the doc") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d"), (2L, "a b c d"), (3L, "x y a b c d"),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = Dedup.chunkDedup(docs, "text", "doc_id", window = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      (1L, "a b c d", 2L), // first occurrence keeps everything
      (3L, "x y", 1L)))    // its "a b"/"c d" chunks were seen in doc 1
    // doc 2 (fully duplicated) and doc 4 (null text) are gone entirely
  }

  test("transitive closure: strict mode throws on maxIters truncation") {
    val chain = spark.createDataFrame((1L to 10L).map(i => (i, i + 1)))
      .toDF("node", "parent")
    val e = intercept[IllegalStateException] {
      Graphs.transitiveClosure(chain, maxIters = 3)
    }
    assert(e.getMessage.contains("truncated"))
    // best-effort mode returns the partial closure (correct to its depth)
    val partial = Graphs.transitiveClosure(chain, maxIters = 3, strict = false)
    assert(partial.agg(org.apache.spark.sql.functions.max(col("depth")))
      .head().getInt(0) <= 4)
  }

  test("cheapest paths: multi-path min cost, unreachable absent, any partitioning") {
    // 1→0 direct costs 10 but 1→2→0 costs 4; 3 reaches only via 1;
    // 5→6 never reaches the sink and must not appear
    val edges = spark.createDataFrame(Seq(
      (1L, 0L, 10L), (1L, 2L, 1L), (2L, 0L, 3L), (3L, 1L, 2L), (5L, 6L, 1L)
    )).toDF("src", "dst", "w")
    val sink = spark.createDataFrame(Seq(Tuple1(0L))).toDF("node")
    for (parts <- Seq(1, 4)) {
      val out = Graphs.cheapestPaths(edges.repartition(parts), sink)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(out == Map(0L -> 0L, 2L -> 3L, 1L -> 4L, 3L -> 6L),
        s"parts=$parts: $out")
    }
  }

  test("widest paths: max-min bottleneck on multi-path, any partitioning") {
    // 1→0 direct width 2; 1→2 (8) then 2→0 (5) bottlenecks at 5 — the
    // wider route wins even though it is longer
    val edges = spark.createDataFrame(Seq(
      (1L, 0L, 2L), (1L, 2L, 8L), (2L, 0L, 5L), (3L, 1L, 4L)
    )).toDF("src", "dst", "w")
    val sink = spark.createDataFrame(Seq(Tuple1(0L))).toDF("node")
    for (parts <- Seq(1, 4)) {
      val out = Graphs.widestPaths(edges.repartition(parts), sink)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(out == Map(0L -> Long.MaxValue, 2L -> 5L, 1L -> 5L, 3L -> 4L),
        s"parts=$parts: $out")
    }
  }

  test("cheapest paths: strict mode throws when maxIters truncates") {
    val chain = spark.createDataFrame((1L to 10L).map(i => (i, i - 1, 1L)))
      .toDF("src", "dst", "w")
    val sink = spark.createDataFrame(Seq(Tuple1(0L))).toDF("node")
    val e = intercept[IllegalStateException] {
      Graphs.cheapestPaths(chain, sink, maxIters = 3)
    }
    assert(e.getMessage.contains("unconverged"))
    // best-effort returns distances correct up to the explored depth
    val partial = Graphs.cheapestPaths(chain, sink, maxIters = 3, strict = false)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(partial == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L), partial.toString)
  }

  test("k-core: cascading peel to the known core, any partitioning") {
    // triangle {1,2,3} + a pendant chain 3—4—5: the 2-core is exactly
    // the triangle, and reaching it REQUIRES a cascade (round 1 peels
    // leaf 5, which only then exposes 4 as a leaf for round 2)
    val edges = spark.createDataFrame(Seq(
      (1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L)
    )).toDF("a", "b")
    for (parts <- Seq(1, 4)) {
      val out = Graphs.kCore(edges.repartition(parts), k = 2)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(out == Map(1L -> 2L, 2L -> 2L, 3L -> 2L), s"parts=$parts: $out")
    }
    // k above the max degree peels everything
    assert(Graphs.kCore(edges, k = 4).count() == 0)
    // strict mode throws when maxIters stops the peel mid-cascade
    val e = intercept[IllegalStateException] {
      Graphs.kCore(edges, k = 2, maxIters = 1)
    }
    assert(e.getMessage.contains("still peeling"))
  }

  test("animated GIF: multi-frame round-trip exact through the JDK codec") {
    val frames = Multimodal.decodeGifFrames(Multimodal.syntheticGif(7))
    assert(frames.size == 2 + 7 % 4)
    frames.foreach { f =>
      assert(f.width == 8 && f.height == 8)
      assert(f.meanPixel == ((7 * 17 + f.frameIdx * 40) % 256).toDouble)
    }
    // non-GIF bytes are rejected, not silently faked
    intercept[Exception](Multimodal.decodeGifFrames("not a gif".getBytes))
    // strided sampling keeps exactly the even frames
    val df = Multimodal.syntheticVideos(
      docs.select(col("doc_id")).limit(20), "doc_id")
    Multimodal.gifFrameSample(df, "doc_id", stride = 2).collect().foreach { r =>
      assert(r.getInt(1) % 2 == 0)
      assert(r.getDouble(4) == ((r.getLong(0) * 17 + r.getInt(1) * 40) % 256).toDouble)
    }
  }

  test("vector-sum aggregator equals the explode formulation, any partitioning") {
    val q = Embeddings.quantizeInt8(col("embedding"))
    def viaAgg(parts: Int) = emb.repartition(parts)
      .select(col("label"), q.as("qv"))
      .groupBy("label").agg(Embeddings.sumIntVectorsUdaf(col("qv")).as("s"))
      .select(col("label"), posexplode(col("s")).as(Seq("dim", "sum_q")))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val viaExplode = emb.select(col("label"), posexplode(q).as(Seq("dim", "qv")))
      .groupBy("label", "dim").agg(sum(col("qv")).as("sum_q"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(viaAgg(5) == viaExplode)
    assert(viaAgg(1) == viaExplode)
  }

  test("integer PageRank: hand-computed two rounds, bit-exact") {
    val edges = spark.createDataFrame(Seq((1L, 2L), (1L, 3L), (2L, 3L)))
      .toDF("src", "dst")
    val out = Graphs.pageRankInt(edges, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // r1: (150000, 575000, 1425000); r2 from those, floor division
    assert(out == Map(1L -> 150000L, 2L -> 213750L, 3L -> 702500L))
  }

  test("reliable-checkpoint flag: same fixpoint results, files actually land") {
    val ckpt = scratchDir("graft_ckpt")
    val edges = spark.createDataFrame(Seq((1L, 2L), (1L, 3L), (2L, 3L)))
      .toDF("src", "dst")
    val local = Graphs.pageRankInt(edges, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val tc = spark.createDataFrame(Seq((2L, 1L), (3L, 2L), (4L, 3L)))
      .toDF("node", "parent")
    val tcLocal = Graphs.transitiveClosure(tc)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    spark.conf.set(Graphs.CheckpointDirKey, ckpt)
    try {
      val reliable = Graphs.pageRankInt(edges, iters = 2)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(reliable == local)
      val tcReliable = Graphs.transitiveClosure(tc)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(tcReliable == tcLocal)
      // the flag must have produced real checkpoint files, not fallen
      // back to executor-local blocks
      def countFiles(d: java.io.File): Int =
        Option(d.listFiles).toSeq.flatten
          .map(f => if (f.isDirectory) countFiles(f) else 1).sum
      assert(countFiles(new java.io.File(ckpt)) > 0,
        s"no reliable checkpoint files under $ckpt")
      // ...and superseded rounds must have been swept: each loop keeps
      // only its RETURNED frame's checkpoint (pageRank would otherwise
      // leave `iters` rdd dirs and the closure 2·rounds+1 — here 9 total)
      def rddDirs(d: java.io.File): Int =
        Option(d.listFiles).toSeq.flatten.map { f =>
          (if (f.isDirectory && f.getName.startsWith("rdd-")) 1 else 0) +
            (if (f.isDirectory) rddDirs(f) else 0)
        }.sum
      val live = rddDirs(new java.io.File(ckpt))
      assert(live <= 2, s"checkpoint GC left $live rdd dirs under $ckpt (want ≤2)")
    } finally spark.conf.unset(Graphs.CheckpointDirKey)
  }

  test("incremental dedup: bloom prefilter + verify equals the plain join") {
    val mk = (id: Long, t: String) => (id, t)
    // 16-token prefix fingerprints: 11 duplicates 1 (same prefix), 12 is novel
    val body = (1 to 20).map(i => s"tok$i").mkString(" ")
    val hist = spark.createDataFrame(Seq(
      mk(1, s"$body tailA"), mk(2, s"other $body"), mk(3, s"$body tailB")))
      .toDF("doc_id", "text")
    val batch = spark.createDataFrame(Seq(
      mk(11, s"$body tailC"), mk(12, s"novel $body")))
      .toDF("doc_id", "text")
    val out = Dedup.incrementalDups(hist, batch, "text", "doc_id", prefixK = 16,
        expectedKeys = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // doc 11 matches history docs 1 and 3 (shared 16-token prefix), not 2
    assert(out == Map(11L -> 2L))
    // empty history → empty result (bloom over zero rows must not NPE)
    assert(Dedup.incrementalDups(hist.limit(0), batch, "text", "doc_id").count() == 0)
  }

  test("incremental near-dup: equals the cross-side restriction of the symmetric join") {
    import spark.implicits._
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, base),                              // history
      (2L, base + " x"),                       // history near-dup of 1
      (3L, (31 to 60).map(i => s"w$i").mkString(" ")), // history, unrelated
      (11L, base + " y"),                      // batch near-dup of 1 and 2
      (12L, (61 to 90).map(i => s"v$i").mkString(" ")) // batch, novel
    ).toDF("doc_id", "text")
    val hist = docs.filter(col("doc_id") < 10)
    val batch = docs.filter(col("doc_id") >= 10)
    val inc = Dedup.incrementalNearDups(hist, batch, "text", "doc_id",
        k = 5, minJaccard = 0.5, expectedKeys = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(5)))
    // the symmetric pair set over everything, restricted to cross pairs
    val sym = Dedup.ngramJaccardPairs(docs, "text", "doc_id", k = 5, minJaccard = 0.5)
      .filter(col("a") < 10 && col("b") >= 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(5)))
    assert(inc.toSet == sym.toSet,
      s"missing=${sym.toSet -- inc.toSet} extra=${inc.toSet -- sym.toSet}")
    assert(inc.map(t => (t._1, t._2)).toSet == Set((1L, 11L), (2L, 11L)),
      "batch doc 11 pairs with history 1 and 2 only; history 1-2 never compared")
    // no history-history or batch-batch pair can appear by construction
    assert(inc.forall { case (a, b, _, _) => a < 10 && b >= 10 })
    // empty batch → empty result (bloom over zero rows must not NPE)
    assert(Dedup.incrementalNearDups(hist, batch.limit(0), "text", "doc_id").count() == 0)
  }

  test("prefix-filtered Jaccard is lossless vs the full inverted index") {
    val full = Dedup.ngramJaccardPairs(docs, "text", "doc_id", 5, 0.8)
      .select("a", "b", "inter").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val pref = Dedup.prefixJaccardPairs(docs, "text", "doc_id", 5, 4, 5)
      .select("a", "b", "inter").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(full.nonEmpty, "corpus has planted near-dups")
    assert(pref == full,
      s"prefix filter must be lossless; missing=${full -- pref} extra=${pref -- full}")
  }

  test("prefix length arithmetic is exact rational ceil (n=5, tau=4/5)") {
    import spark.implicits._
    // two identical 9-token docs: n=5 shingles, prefix = 5 - ceil(4) + 1 = 2.
    // The rational form (num·n + den − 1) div den is platform-independent,
    // unlike ceil over a binary-inexact tau.
    assert(5 - ((4 * 5 + 4) / 5) + 1 == 2)
    val t = Seq((1L, "a b c d e f g h i"), (2L, "a b c d e f g h i"),
      (3L, "q r s t u v w x y")).toDF("doc_id", "text")
    val pairs = Dedup.prefixJaccardPairs(t, "text", "doc_id", 5, 4, 5)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("energy VAD: closed-form cadence, all-voiced and all-silent clips") {
    import spark.implicits._
    val ids = Seq(0L, 7L, 38L).toDF("doc_id")
    val out = Multimodal.vad(Multimodal.syntheticSpeech(ids, "doc_id"), "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    def expected(id: Long) = {
      val nf = 24 + (id % 13).toInt
      val r = ((3 - id % 3) % 3).toInt
      val silent = (nf - 1 - r) / 3 + 1
      (nf.toLong, (nf - silent).toLong, 1000L * (nf - silent) / nf)
    }
    Seq(0L, 7L, 38L).foreach(id => assert(out(id) == expected(id), s"id=$id"))
    // constant-amplitude fixtures: amp 0 → fully silent, amp 500 → fully voiced
    val const = Seq(1000L, 1500L).toDF("doc_id") // amp = id % 1000 → 0 and 500
    val cv = Multimodal.vad(Multimodal.syntheticAudio(const, "doc_id"), "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(cv(1000L)._2 == 0L, "silence must have zero voiced frames")
    assert(cv(1500L)._2 == cv(1500L)._1, "loud constant tone is all-voiced")
  }

  test("canonicalizeUrl: every RFC-case and tracking-param edge") {
    import spark.implicits._
    val cases = Seq(
      // case folds there, preserved in path/query; fragment dropped
      "HTTPS://Example.COM/A/B?Id=X#frag" -> "https://example.com/A/B?Id=X",
      // default ports drop only for THEIR scheme
      "http://Example.com:80/a" -> "http://example.com/a",
      "https://example.com:443/a" -> "https://example.com/a",
      "https://example.com:80/a" -> "https://example.com:80/a",
      "http://example.com:443/a" -> "http://example.com:443/a",
      "http://example.com:8080/a" -> "http://example.com:8080/a",
      // tracking params: stripped anywhere, order of survivors kept,
      // '?' dropped when none survive; ref= dies, referrer= lives
      "http://h/p?utm_source=a&id=1&utm_campaign=b&z=2" -> "http://h/p?id=1&z=2",
      "http://h/p?gclid=x&fbclid=y&msclkid=z&utm_=t" -> "http://h/p",
      "http://h/p?ref=spam&referrer=ok" -> "http://h/p?referrer=ok",
      // path normalization: empty -> '/', one trailing slash stripped,
      // root stays root
      "http://h" -> "http://h/",
      "http://h/" -> "http://h/",
      "http://h/a/b/" -> "http://h/a/b",
      "http://h/?utm_source=x" -> "http://h/",
      // no scheme:// -> relative reference, passes through untouched
      "docs/readme.html" -> "docs/readme.html",
      "mailto:a@b.c" -> "mailto:a@b.c")
    val got = cases.map(_._1).toDF("url")
      .select(col("url"), TextOps.canonicalizeUrl(col("url")).as("c"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    for ((in, want) <- cases)
      assert(got(in) == want, s"canonicalizeUrl($in) = ${got(in)}, want $want")
  }

  test("syntheticUrl collides after canonicalization (the dedup_url scenario bites)") {
    val urls = docs.select(col("doc_id"),
      graft.queries.Shared.syntheticUrl(col("doc_id")).as("url"))
      .withColumn("c", TextOps.canonicalizeUrl(col("url")))
    val dups = urls.groupBy("c").count().filter(col("count") > 1).count()
    assert(dups > 0, "scenario must produce canonical collisions at the smallest SF")
    // and the canonical form is strictly coarser than the raw URLs
    assert(urls.select("c").distinct().count() < urls.select("url").distinct().count())
  }

  test("CDC chunks: lossless partition of every document") {
    // joining a document's chunks back with single spaces must
    // reconstruct the text exactly — chunking may never drop or merge
    // characters (the property fixed-stride windows share, kept here
    // under content-defined boundaries)
    val bad = docs.filter(col("text").isNotNull)
      .select(col("text"),
        array_join(Dedup.cdcChunkArray(col("text")), " ").as("re"))
      .filter(col("re") =!= col("text")).count()
    assert(bad == 0)
  }

  test("CDC chunks: a mid-document insertion perturbs at most its own chunk") {
    import spark.implicits._
    val base = docs.filter(col("text").isNotNull)
      .filter(size(split(col("text"), " ")) >= 40)
      .select(col("text")).as[String].head()
    val words = base.split(" ")
    val edited = (words.take(words.length / 2) ++ Array("INSERTEDWORD") ++
      words.drop(words.length / 2)).mkString(" ")
    val Seq(c1, c2) = Seq(base, edited).toDF("text")
      .select(Dedup.cdcChunkArray(col("text")).as("chs"))
      .collect().toSeq.map(_.getSeq[String](0).toSet)
    // non-boundary insert rewrites one chunk (1 lost, 1 gained); a
    // boundary insert splits one chunk (1 lost, 2 gained). Fixed-stride
    // chunking would shift EVERY downstream chunk instead.
    assert((c1 -- c2).size <= 1, s"lost ${(c1 -- c2).size} chunks")
    assert((c2 -- c1).size <= 2, s"gained ${(c2 -- c1).size} chunks")
  }

  test("MaxSim equals the hand-computed sub-vector interaction on a tiny corpus") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Array(1f, 0f, 0f, 0f, 0f, 1f, 0f, 0f)),
      (2L, Array(0f, 1f, 0f, 0f, 1f, 0f, 0f, 0f)),
      (3L, Array(1f, 1f, 0f, 0f, 0f, 0f, 1f, 1f)))
    val df = vecs.toDF("vec_id", "embedding")
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      d / (math.sqrt(a.map(x => x.toDouble * x).sum) *
        math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    def maxsim(q: Array[Float], c: Array[Float]): Double =
      (0 until 2).map { i =>
        (0 until 2).map { j =>
          cos(q.slice(i * 4, i * 4 + 4), c.slice(j * 4, j * 4 + 4))
        }.max
      }.sum
    val got = Similarity.maxSimTopK(df, df.filter(col("vec_id") === 1L),
        "vec_id", "embedding", k = 2, nSub = 2, subDim = 4)
      .collect().map(r => r.getLong(2) -> r.getDouble(3)).toMap
    val q = vecs.head._2
    for ((id, v) <- Seq(2L -> vecs(1)._2, 3L -> vecs(2)._2))
      assert(math.abs(got(id) - maxsim(q, v)) < 1e-12,
        s"maxsim($id): got ${got(id)}, want ${maxsim(q, v)}")
  }

  test("binary-Hamming ANN: an exact duplicate ranks first at distance 0") {
    val base = emb.select(col("vec_id"), col("embedding"))
    val dup = base.filter(col("vec_id") === 3L)
      .select((col("vec_id") + 500000L).as("vec_id"), col("embedding"))
    val corpus = base.unionByName(dup)
    val top = Similarity.binaryHammingTopK(
        corpus, base.filter(col("vec_id") === 3L), "vec_id", "embedding", k = 3)
      .orderBy(col("rank")).collect()
    assert(top.head.getLong(2) == 500003L, "duplicate must rank first")
    assert(top.head.getInt(3) == 0, "duplicate Hamming distance must be 0")
    assert(math.abs(top.head.getDouble(4) - 1.0) < 1e-9,
      "rerank cosine of the duplicate must be 1")
    assert(top.map(_.getInt(3)).toSeq == top.map(_.getInt(3)).toSeq.sorted,
      "results must be in ascending Hamming order")
  }
}
