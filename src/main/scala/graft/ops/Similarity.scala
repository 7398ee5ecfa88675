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

  /** Native fused-loop Catalyst expression (see [[graft.functions.CosineSim]]);
    * same double-precision semantics as `dot/(norm*norm)` but one array
    * traversal instead of three.
    */
  def cosine(a: Column, b: Column): Column = graft.functions.CosineSim(a, b)

  /** Per-query top-k of a scored candidate frame, ranked. Runs through
    * the engine's grouped-top-k physical operator
    * ([[graft.plans.GroupedTopK]]): the `row_number` window formulation
    * fully sorts every query's candidate set (the whole corpus for the
    * brute-force path) — the operator keeps a k-bounded heap per query
    * and its partial phase reduces before the shuffle. The rank column
    * is then assigned by a window over ≤ k rows per query, which is
    * negligible. Tie-break on neighbor_id keeps output deterministic.
    */
  private def topKRanked(scored: DataFrame, k: Int): DataFrame = {
    val top = graft.plans.GroupedTopK(
      scored.select(col("query_id"), col("neighbor_id"), col("sim")),
      keys = Seq("query_id"), orderBy = Seq(("sim", false), ("neighbor_id", true)), k = k)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    top.withColumn("rank", row_number().over(w))
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("sim"))
  }

  /** Exact top-k cosine neighbors for each query vector. `queries` and
    * `corpus` both carry (`idCol`, `vecCol`); queries ≪ corpus, so the
    * cross join broadcasts the queries and the only shuffle is the
    * per-query top-k window.
    */
  /** Shared broadcast-queries cosine scoring: one corpus scan, queries
    * broadcast, self-pairs dropped, bounded-heap top-k. The single
    * place the exact tier's economics and tie-break contract live —
    * [[bruteForceTopK]] and [[hardNegatives]] differ only in the
    * candidate predicate.
    */
  private def cosineTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      candidateFilter: Column = lit(true)): DataFrame =
    topKRanked(
      corpus.crossJoin(broadcast(queries))
        .filter(col("query_id") =!= col("neighbor_id") && candidateFilter)
        .withColumn("sim", cosine(col("qv"), col("cv"))), k)

  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame =
    cosineTopK(
      corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv")),
      queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")), k)

  /** Hard-negative mining for contrastive training: for every query
    * vector, the k most-similar corpus vectors carrying a DIFFERENT
    * label — maximally-confusing negatives, the standard upgrade over
    * random in-batch negatives. Exact form: broadcast queries, one
    * corpus scan, bounded GroupedTopK heaps (the [[bruteForceTopK]]
    * economics, plus the label predicate evaluated inside the scan
    * stage). At full scale the same predicate drops unchanged into the
    * IVF probe join ([[ivfTopK]]'s list-keyed shape) — negatives only
    * need to be hard, not provably hardest.
    */
  def hardNegatives(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, labelCol: String, k: Int): DataFrame =
    cosineTopK(
      corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
        col(labelCol).as("clabel")),
      queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        col(labelCol).as("qlabel")),
      k, candidateFilter = !(col("clabel") <=> col("qlabel")))

  /** ColBERT-style late-interaction MaxSim retrieval: each vector is
    * viewed as `nSub` contiguous sub-vectors of `subDim` dims ("token
    * vectors"), and a candidate's score against a query is
    * Σᵢ maxⱼ cos(qᵢ, cⱼ) — every query sub-vector matches its best
    * candidate sub-vector independently, the interaction model that
    * separates multi-aspect documents single-vector cosine conflates.
    *
    * Scale shape: identical to [[bruteForceTopK]] — queries broadcast,
    * one corpus scan, the nSub² cosine grid evaluated INSIDE the scan
    * stage as a single fused expression (no explode into a token table,
    * which would multiply the shuffled row count by nSub), bounded-heap
    * top-k. At full scale the same scoring expression drops onto an IVF
    * probe join keyed by the FIRST sub-vector's list assignment.
    *
    * Determinism: each cosine is the fused sequential loop
    * ([[graft.functions.CosineSim]]); `greatest` over the nSub
    * candidates is order-free; the outer sum is a fixed left-assoc
    * chain — bit-identical to an oracle that writes the same grid.
    */
  def maxSimTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nSub: Int = 4, subDim: Int = 16): DataFrame = {
    require(nSub >= 1 && subDim >= 1, "nSub and subDim must be positive")
    def subvecs(df: DataFrame, idAs: String, prefix: String) = df.select(
      col(idCol).as(idAs) +:
        (0 until nSub).map(i =>
          slice(col(vecCol), i * subDim + 1, subDim).as(s"$prefix$i")): _*)
    val c = subvecs(corpus, "neighbor_id", "cv")
    val q = subvecs(queries, "query_id", "qv")
    val score = (0 until nSub).map { i =>
      greatest((0 until nSub).map(j => cosine(col(s"qv$i"), col(s"cv$j"))): _*)
    }.reduceLeft(_ + _)
    topKRanked(
      c.crossJoin(broadcast(q))
        .filter(col("query_id") =!= col("neighbor_id"))
        .withColumn("sim", score), k)
  }

  /** Binary-quantized ANN: every vector compressed to its sign bits
    * (64 float dims → two 32-bit words, a 16× memory cut), candidates
    * scored by Hamming distance over the packed words — two XOR+popcount
    * ops per pair instead of 64 multiply-adds — and the k winners
    * exact-reranked with true cosine from the float vectors. This is
    * the classic two-tier serving ladder (compressed scan, exact
    * rerank); at 100 TB the packed corpus fits where floats cannot,
    * and the float fetch happens for k·|queries| rows only.
    *
    * Packing folds each 32-dim slice in index order (acc·2 + signbit),
    * so both engines produce the identical word; Hamming and the rank
    * are pure integers — the ranking is hash-exact, no recall gate
    * needed. Output rows keep Hamming (candidate) order; `cosine` is
    * the rerank score.
    */
  def binaryHammingTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, dim: Int = 64): DataFrame = {
    // the packer folds exactly `dim/32` 32-dim word slices — a vector of
    // any other length would silently truncate (extra dims ignored) or
    // pad (slice past the end folds fewer bits), yielding a plausible
    // but WRONG Hamming ranking; so the word width is declared, and each
    // row's length is asserted in the scan (raise_error, codegen'd)
    require(dim > 0 && dim % 32 == 0,
      s"binary sign-bit packing needs a positive multiple of 32 dims, got $dim")
    val nWords = dim / 32
    def checked(vec: Column): Column =
      when(size(vec) === dim, vec).otherwise(raise_error(concat(
        lit(s"binaryHammingTopK: expected $dim-dim vectors, found length "),
        size(vec).cast("string"))))
    def word(vec: Column, w: Int): Column =
      aggregate(slice(vec, w * 32 + 1, 32), lit(0L),
        (acc, x) => acc * 2 + when(x >= 0, 1L).otherwise(0L))
    def packed(df: DataFrame, idAs: String, pfx: String): DataFrame =
      df.select(col(idCol).as(idAs) +:
        (0 until nWords).map(w => word(checked(col(vecCol)), w).as(s"$pfx$w")): _*)
    val c = packed(corpus, "neighbor_id", "c")
    val q = packed(queries, "query_id", "q")
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("hamming",
        (0 until nWords).map(w =>
          bit_count(col(s"q$w").bitwiseXOR(col(s"c$w")))).reduce(_ + _).cast("int"))
    val top = graft.plans.GroupedTopK(
      scored.select(col("query_id"), col("neighbor_id"), col("hamming")),
      keys = Seq("query_id"),
      orderBy = Seq(("hamming", true), ("neighbor_id", true)), k = k)
    // exact rerank: only the k·|queries| winners fetch float vectors —
    // the tiny winner set broadcasts against the corpus scan
    val qv = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val cv = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val byHam = Window.partitionBy(col("query_id"))
      .orderBy(col("hamming"), col("neighbor_id"))
    cv.join(broadcast(top.join(broadcast(qv), "query_id")), "neighbor_id")
      .withColumn("cosine", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(byHam))
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        col("hamming"), col("cosine"))
  }

  /** `nBits` seeded random hyperplanes of dimension `dim`, as a literal
    * array-of-arrays column (broadcast with the plan).
    */
  private def hyperplanes(dim: Int, nBits: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(nBits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-random-projection signatures, computed in one typed pass
    * (bit i = (v · h_i) > 0). A 64-expression Catalyst tree for this
    * explodes codegen; a tight Scala loop per row is a single narrow
    * stage and orders of magnitude cheaper to plan. Output:
    * (`idAs` long, `vecAs` float array, sig long).
    */
  private[ops] def signatures(
      df: DataFrame, idAs: String, vecAs: String,
      planes: Array[Array[Double]]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    ensureParallelism(df)
      .select(col(idAs).cast("long"), col(vecAs))
      .as[(Long, Array[Float])]
      .map { case (id, vec) =>
        val v = vec
        var sig = 0L
        var i = 0
        while (i < planes.length) {
          val p = planes(i)
          var d = 0.0
          var j = 0
          while (j < p.length && j < v.length) { d += v(j) * p(j); j += 1 }
          if (d > 0) sig |= (1L << i)
          i += 1
        }
        (id, vec, sig)
      }.toDF(idAs, vecAs, "sig")
  }

  /** ANN via IVF (inverted file index): corpus clustered into `nlist`
    * centroid lists with a few Lloyd iterations (seeded deterministic
    * init from hash-ordered corpus vectors); each query exhaustively
    * scans only its `nprobe` nearest lists and re-ranks exactly.
    *
    * Scale shape: centroids are tiny (nlist × dim doubles — collected to
    * the driver and broadcast by design), assignment is one typed pass
    * per iteration, and the probe join shuffles on the cluster id, so
    * per-query work is corpus/nlist × nprobe instead of a full scan.
    */
  /** Indexes of the `n` nearest centroids to `v` (squared-L2, index
    * tie-break) — the assignment step shared by IVF and semantic dedup.
    */
  private[ops] def nearest(
      v: Array[Float], cents: Array[Array[Double]], n: Int): Seq[Int] = {
    val d2 = cents.map { c =>
      var s = 0.0; var j = 0
      while (j < c.length && j < v.length) { val d = v(j) - c(j); s += d * d; j += 1 }
      s
    }
    d2.zipWithIndex.sortBy { case (dd, i) => (dd, i) }.take(n).map(_._2).toSeq
  }

  /** Deterministic Lloyd k-means over a (cached) id→vector dataset:
    * seeded hash-order init, fixed iteration count, map-side-combined
    * centroid sums. Only `k × dim` doubles ever reach the driver.
    */
  private[ops] def kmeansCentroids(
      vecs: org.apache.spark.sql.Dataset[(Long, Array[Float])],
      k: Int, iterations: Int): Array[Array[Double]] = {
    import vecs.sparkSession.implicits._
    // deterministic init: k vectors in xxhash64(id) order
    var centroids: Array[Array[Double]] = vecs
      .toDF("id", "v").orderBy(xxhash64(col("id")))
      .limit(k).as[(Long, Array[Float])]
      .collect().map(_._2.map(_.toDouble))

    (1 to iterations).foreach { _ =>
      val cents = centroids
      centroids = vecs
        .map { case (_, v) => (nearest(v, cents, 1).head, (v.map(_.toDouble), 1L)) }
        .rdd.reduceByKey(
          (a: (Array[Double], Long), b: (Array[Double], Long)) => {
            var j = 0; while (j < a._1.length) { a._1(j) += b._1(j); j += 1 }
            (a._1, a._2 + b._2)
          })
        .collect().sortBy(_._1)
        .map { case (_, (sum, n)) => sum.map(_ / n) }
    }
    centroids
  }

  /** Train the IVF index for a corpus: a few deterministic Lloyd
    * iterations, then every vector assigned to its nearest list.
    * Returns the assigned corpus frame (`neighbor_id`, `cv`, `list`)
    * and the centroids (nlist × dim doubles — driver-collected and tiny
    * by design, so callers can BROADCAST them into per-row probe logic,
    * including a Structured Streaming micro-batch: the index is the
    * static side, queries are the moving side).
    */
  def ivfIndex(
      corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int = 16, iterations: Int = 3): (DataFrame, Array[Array[Double]]) = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val vecs = ensureParallelism(
      corpus.select(col(idCol).cast("long"), col(vecCol)))
      .as[(Long, Array[Float])].persist()
    val cents = kmeansCentroids(vecs, nlist, iterations)
    val assigned = vecs.map { case (id, v) => (id, v, nearest(v, cents, 1).head) }
      .toDF("neighbor_id", "cv", "list")
    // clustering (the per-iteration collects) is done with the cache;
    // release it rather than pinning a corpus copy for the session —
    // the returned plan recomputes vecs once when evaluated
    vecs.unpersist()
    (assigned, cents)
  }

  /** Expand queries into their `nprobe` nearest-list probes
    * (`query_id`, `qv`, `list`). Works unchanged on a STREAMING query
    * frame — the flatMap is stateless per row and the centroids ride
    * the closure — which is what makes the probe side of IVF a
    * micro-batch operation.
    */
  def ivfProbes(
      queries: DataFrame, idCol: String, vecCol: String,
      cents: Array[Array[Double]], nprobe: Int): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    ensureParallelism(queries.select(col(idCol).cast("long"), col(vecCol)))
      .as[(Long, Array[Float])]
      .flatMap { case (id, v) => nearest(v, cents, nprobe).map(l => (id, v, l)) }
      .toDF("query_id", "qv", "list")
  }

  /** Score probes against the assigned corpus: the list-keyed equi-join
    * (per-query work = corpus/nlist × nprobe, never a crossJoin) + exact
    * cosine. Stream-static safe: `probes` may be a streaming frame.
    */
  def ivfScore(assigned: DataFrame, probes: DataFrame): DataFrame =
    probes.join(assigned, Seq("list"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosine(col("qv"), col("cv")))

  /** Ranked top-k of a scored candidate frame (`query_id`,
    * `neighbor_id`, `sim`) — public for callers that score candidates
    * out-of-band (e.g. the streaming probe twin ranks its micro-batch
    * sink's accumulated scores).
    */
  def rankTopK(scored: DataFrame, k: Int): DataFrame = topKRanked(scored, k)

  def ivfTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nlist: Int = 16, nprobe: Int = 4, iterations: Int = 3): DataFrame = {
    val (assigned, cents) = ivfIndex(corpus, idCol, vecCol, nlist, iterations)
    topKRanked(ivfScore(assigned,
      ivfProbes(queries, idCol, vecCol, cents, nprobe)), k)
  }

  /** ANN via product quantization (PQ) with asymmetric distance
    * computation (ADC) and exact re-rank — the memory-bound tier of
    * similarity search: each corpus vector is stored as `m` small codes
    * (one per subspace, `ksub` centroids each, codebook trained by
    * per-subspace k-means), so a billion-vector corpus fits in RAM at
    * `m` bytes/vector instead of `4·dim`. Scoring a pair is `m` table
    * lookups + adds (the per-query table is dot(q_sub, centroid) for
    * every subspace×centroid — `m·ksub` doubles, built once per query)
    * instead of a `dim`-wide dot product; the approximate top
    * `k·rerankFactor` shortlist is re-ranked with exact cosine, so
    * emitted sims are exact. Codebook is tiny (m·ksub·dim/m doubles)
    * and driver-collected by design, like the IVF centroids; at full
    * scale PQ composes with IVF (scan only probed lists) — here the
    * scan is the whole corpus, scored at O(m) per pair.
    *
    * Deterministic: seeded hash-order init, fixed Lloyd iterations.
    */
  private[ops] def pqSub(v: Array[Float], s: Int, dsub: Int): Array[Double] = {
    val out = new Array[Double](dsub)
    var j = 0; while (j < dsub) { out(j) = v(s * dsub + j).toDouble; j += 1 }
    out
  }

  private[ops] def pqNearestSub(
      v: Array[Float], s: Int, dsub: Int, cents: Array[Array[Double]]): Int = {
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < cents.length) {
      val ct = cents(c); var d = 0.0; var j = 0
      while (j < dsub) { val x = v(s * dsub + j) - ct(j); d += x * x; j += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Per-subspace Lloyd training of the PQ codebook (m × ksubEff × dsub).
    * Deterministic init: up to `ksub` sample vectors in hash order seed
    * every subspace's codebook; a corpus smaller than `ksub` just trains
    * a smaller codebook (indexing with the declared ksub would crash).
    * One distributed pass per iteration; only codebook-sized state
    * reaches the driver.
    */
  private[ops] def trainPqCodebook(
      vecs: org.apache.spark.sql.Dataset[(Long, Array[Float])], idCol: String,
      m: Int, ksub: Int, iterations: Int, dsub: Int): Array[Array[Array[Double]]] = {
    import vecs.sparkSession.implicits._
    val sample = vecs.toDF(idCol, "v").orderBy(xxhash64(col(idCol)))
      .limit(ksub).as[(Long, Array[Float])].collect().map(_._2)
    require(sample.nonEmpty, "PQ training requires a non-empty corpus")
    var codebook: Array[Array[Array[Double]]] =
      Array.tabulate(m)(s => sample.map(v => pqSub(v, s, dsub)))
    (1 to iterations).foreach { _ =>
      val cb = codebook
      val sums = vecs.flatMap { case (_, v) =>
        (0 until m).map(s => ((s, pqNearestSub(v, s, dsub, cb(s))), (pqSub(v, s, dsub), 1L)))
      }.rdd.reduceByKey { (a, b) =>
        var j = 0; while (j < a._1.length) { a._1(j) += b._1(j); j += 1 }
        (a._1, a._2 + b._2)
      }.collect()
      val next = codebook.map(_.clone()) // empty clusters keep their centroid
      sums.foreach { case ((s, c), (vsum, n)) => next(s)(c) = vsum.map(_ / n) }
      codebook = next
    }
    codebook
  }

  /** Per-query ADC table (`dot(q_sub, centroid)` for every
    * subspace×centroid — m·ksubEff doubles, built once per query) plus
    * the query norm.
    */
  private[ops] def adcQueryTab(
      v: Array[Float], cb: Array[Array[Array[Double]]],
      m: Int, ksubEff: Int, dsub: Int): (Array[Double], Double) = {
    val tab = new Array[Double](m * ksubEff)
    var s = 0
    while (s < m) {
      var c = 0
      while (c < ksubEff) {
        val ct = cb(s)(c); var d = 0.0; var j = 0
        while (j < dsub) { d += v(s * dsub + j) * ct(j); j += 1 }
        tab(s * ksubEff + c) = d; c += 1
      }
      s += 1
    }
    var n2 = 0.0; var j = 0
    while (j < v.length) { n2 += v(j).toDouble * v(j); j += 1 }
    (tab, math.sqrt(n2))
  }

  /** Codegen'd ADC table-lookup sum Σ_s qtab[code_s] over rows carrying
    * `code` (corpus PQ codes) and `qtab`: O(m) `element_at` lookups per
    * pair instead of a dim-wide dot product — the shared kernel of both
    * the raw-vector and residual ADC scores.
    */
  private def adcDotLookup(m: Int, ksubEff: Int): Column =
    (0 until m)
      .map(s => (element_at(col("code"), s + 1) + lit(s * ksubEff) + 1).cast("int"))
      .map(i => element_at(col("qtab"), i))
      .reduce(_ + _)

  /** Codegen'd ADC approximate-cosine column over rows carrying `code`,
    * `qtab` and `qnorm` (raw-vector codes: the corpus norm is itself
    * approximated from per-centroid squared norms).
    */
  private def adcSim(cb: Array[Array[Array[Double]]],
      m: Int, ksubEff: Int, dsub: Int): Column = {
    // per-centroid squared norms (corpus-side ADC norm term) — a literal
    val csq: Seq[Double] = (0 until m * ksubEff).map { i =>
      val ct = cb(i / ksubEff)(i % ksubEff); var s2 = 0.0; var j = 0
      while (j < dsub) { s2 += ct(j) * ct(j); j += 1 }; s2
    }
    val idxs = (0 until m).map(s =>
      (element_at(col("code"), s + 1) + lit(s * ksubEff) + 1).cast("int"))
    val cn2 = idxs.map(i => element_at(typedLit(csq), i)).reduce(_ + _)
    adcDotLookup(m, ksubEff) / (col("qnorm") * sqrt(cn2))
  }

  def pqTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      m: Int = 8, ksub: Int = 16, iterations: Int = 3,
      rerankFactor: Int = 4): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val vecs = ensureParallelism(corpus.select(col(idCol).cast("long"), col(vecCol)))
      .as[(Long, Array[Float])].persist()
    val dim = vecs.head()._2.length
    require(dim % m == 0, s"dim $dim must divide into $m subspaces")
    val dsub = dim / m
    val cb = trainPqCodebook(vecs, idCol, m, ksub, iterations, dsub)
    val ksubEff = cb(0).length

    val encoded = vecs.map { case (id, v) =>
      (id, v, (0 until m).map(s => pqNearestSub(v, s, dsub, cb(s))).toArray)
    }.toDF("neighbor_id", "cv", "code")
    val qdf = ensureParallelism(queries.select(col(idCol).cast("long"), col(vecCol)))
      .as[(Long, Array[Float])]
      .map { case (id, v) =>
        val (tab, norm) = adcQueryTab(v, cb, m, ksubEff, dsub)
        (id, v, tab, norm)
      }.toDF("query_id", "qv", "qtab", "qnorm")

    // approximate shortlist through the grouped-top-k operator (bounded
    // heaps instead of a full per-query sort of the whole corpus), then
    // exact re-rank of the ≤ k·rerankFactor survivors
    val shortlist = graft.plans.GroupedTopK(
      encoded.crossJoin(broadcast(qdf))
        .filter(col("query_id") =!= col("neighbor_id"))
        .withColumn("approx_sim", adcSim(cb, m, ksubEff, dsub)),
      keys = Seq("query_id"),
      orderBy = Seq(("approx_sim", false), ("neighbor_id", true)),
      k = k * rerankFactor)
    // training (the collect-heavy loops) is done with the cache; release
    // it rather than pinning a corpus copy for the session lifetime —
    // the returned plan recomputes vecs once when evaluated
    vecs.unpersist()
    topKRanked(shortlist.withColumn("sim", cosine(col("qv"), col("cv"))), k)
  }

  /** IVF + PQ composite — the FAISS-shaped index at full scale: the
    * coarse quantizer (IVF k-means lists) bounds WHICH vectors are
    * scored (only `nprobe` of `nlist` lists per query — the join is
    * keyed on the list id, never a crossJoin), and PQ-ADC bounds HOW
    * MUCH each scoring costs (m table lookups per pair); the shortlist
    * re-ranks with exact cosine, so emitted sims are exact.
    *
    * `residual = false` quantizes raw vectors (one shared ADC table per
    * query); `residual = true` is the FAISS `IndexIVFPQ` semantics —
    * codes quantize v − c_list, so codebook resolution concentrates on
    * within-list variation and recall holds as nlist grows. The
    * inner-product decomposition q·v ≈ q·c_list + q·r̂ keeps the
    * residual path cheap: the ADC table (q against the RESIDUAL
    * codebook) still builds ONCE per query and is shared across probed
    * lists; only the scalar q·c_list is per-(query, probed list). Only
    * L2-metric residual ADC needs per-list tables. The corpus norm is
    * carried exactly (one double per vector, computed at encode time),
    * so the denominator of the approximate cosine is exact.
    *
    * Trainings (the collect-bounded loops) run against one cached
    * corpus pass; the cache is released before returning, so the lazy
    * result plan recomputes the corpus scan once at action time — the
    * deliberate trade against pinning a corpus-sized cache for the
    * caller's lifetime. Driver traffic stays centroid/codebook-sized.
    */
  def ivfPqTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nlist: Int = 16, nprobe: Int = 4,
      m: Int = 8, ksub: Int = 16, iterations: Int = 3,
      rerankFactor: Int = 4, residual: Boolean = false): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val vecs = ensureParallelism(corpus.select(col(idCol).cast("long"), col(vecCol)))
      .as[(Long, Array[Float])].persist()
    val dim = vecs.head()._2.length
    require(dim % m == 0, s"dim $dim must divide into $m subspaces")
    val dsub = dim / m
    val cents = kmeansCentroids(vecs, nlist, iterations)

    def residualOf(v: Array[Float], list: Int): Array[Float] = {
      val c = cents(list)
      val r = new Array[Float](v.length)
      var j = 0
      while (j < v.length) { r(j) = (v(j) - c(j)).toFloat; j += 1 }
      r
    }
    // codebook trains on what the codes will quantize. The residual
    // dataset is persisted across the training passes (sample + each
    // Lloyd iteration would otherwise redo the O(nlist·dim) coarse
    // assignment per corpus vector per pass) and released right after —
    // training's collects are its only consumers; the encode stage
    // recomputes the assignment once at action time, per the
    // cache-release trade documented above.
    val cb =
      if (residual) {
        val residuals = vecs
          .map { case (id, v) => (id, residualOf(v, nearest(v, cents, 1).head)) }
          .persist()
        try trainPqCodebook(residuals, idCol, m, ksub, iterations, dsub)
        finally residuals.unpersist()
      } else trainPqCodebook(vecs, idCol, m, ksub, iterations, dsub)
    val ksubEff = cb(0).length

    val result =
      if (!residual) {
        val encoded = vecs.map { case (id, v) =>
          (id, v, nearest(v, cents, 1).head,
            (0 until m).map(s => pqNearestSub(v, s, dsub, cb(s))).toArray)
        }.toDF("neighbor_id", "cv", "list", "code")
        val qdf = ensureParallelism(queries.select(col(idCol).cast("long"), col(vecCol)))
          .as[(Long, Array[Float])]
          .flatMap { case (id, v) =>
            val (tab, norm) = adcQueryTab(v, cb, m, ksubEff, dsub)
            nearest(v, cents, nprobe).map(l => (id, v, tab, norm, l))
          }.toDF("query_id", "qv", "qtab", "qnorm", "list")
        graft.plans.GroupedTopK(
          encoded.join(qdf, Seq("list"))
            .filter(col("query_id") =!= col("neighbor_id"))
            .withColumn("approx_sim", adcSim(cb, m, ksubEff, dsub)),
          keys = Seq("query_id"),
          orderBy = Seq(("approx_sim", false), ("neighbor_id", true)),
          k = k * rerankFactor)
      } else {
        val encoded = vecs.map { case (id, v) =>
          val l = nearest(v, cents, 1).head
          val r = residualOf(v, l)
          var n2 = 0.0
          var j = 0
          while (j < v.length) { n2 += v(j).toDouble * v(j); j += 1 }
          (id, v, l,
            (0 until m).map(s => pqNearestSub(r, s, dsub, cb(s))).toArray,
            math.sqrt(n2))
        }.toDF("neighbor_id", "cv", "list", "code", "cnorm")
        val qdf = ensureParallelism(queries.select(col(idCol).cast("long"), col(vecCol)))
          .as[(Long, Array[Float])]
          .flatMap { case (id, v) =>
            // tab = q · residual-centroids: list-independent, built once
            val (tab, norm) = adcQueryTab(v, cb, m, ksubEff, dsub)
            nearest(v, cents, nprobe).map { l =>
              val c = cents(l)
              var qc = 0.0
              var j = 0
              while (j < v.length) { qc += v(j) * c(j); j += 1 }
              (id, v, tab, norm, qc, l)
            }
          }.toDF("query_id", "qv", "qtab", "qnorm", "qdotc", "list")
        graft.plans.GroupedTopK(
          encoded.join(qdf, Seq("list"))
            .filter(col("query_id") =!= col("neighbor_id"))
            .withColumn("approx_sim",
              (col("qdotc") + adcDotLookup(m, ksubEff)) /
                (col("qnorm") * col("cnorm"))),
          keys = Seq("query_id"),
          orderBy = Seq(("approx_sim", false), ("neighbor_id", true)),
          k = k * rerankFactor)
      }
    vecs.unpersist()
    topKRanked(result.withColumn("sim", cosine(col("qv"), col("cv"))), k)
  }

  /** LSH band candidate pairs: each vector signs `bands × bitsPerBand`
    * seeded hyperplanes; ids sharing a band's bit-pattern become a
    * candidate `(a, b)` pair (a < b, distinct across bands). This is the
    * CANDIDATE stage of [[cosinePairs]], public so callers can gate the
    * candidate ECONOMICS in-query — `count(candidates) / (N·(N−1)/2)` is
    * the measurable all-pairs-avoidance ratio (the df-cut precedent from
    * n-gram dedup, applied to embeddings).
    *
    * Shuffle is keyed on (band, bucket) over id longs only — vectors
    * never ride the candidate join.
    */
  def bandCandidates(
      corpus: DataFrame, idCol: String, vecCol: String, dim: Int,
      bands: Int, bitsPerBand: Int, seed: Long = 42L): DataFrame = {
    require(bands * bitsPerBand <= 64, "signature must pack into one long")
    val planes = hyperplanes(dim, bands * bitsPerBand, seed)
    val banded = signatures(corpus.select(col(idCol), col(vecCol)), idCol, vecCol, planes)
      .select(col(idCol),
        explode(array((0 until bands).map(b =>
          struct(lit(b).as("band"),
            shiftright(col("sig"), b * bitsPerBand)
              .bitwiseAND((1L << bitsPerBand) - 1).as("bucket"))): _*)).as("bb"))
      .select(col(idCol), col("bb.band"), col("bb.bucket"))
    // dedupe candidates on the id pair alone (cheap longs) — vectors are
    // attached once per surviving pair in the verify stage; shuffling
    // float arrays through the across-band distinct would dominate
    val l = banded.select(col(idCol).as("a"), col("band"), col("bucket"))
    val r = banded.select(col(idCol).as("b"), col("band"), col("bucket"))
    l.join(r, Seq("band", "bucket")).filter(col("a") < col("b"))
      .select(col("a"), col("b")).distinct()
  }

  /** Exact-cosine verify of a candidate `(a, b)` pair set: attach both
    * vectors (one join per side), score with the fused [[cosine]]
    * expression, keep pairs ≥ `minSim`. Emitted sims are always exact —
    * candidates only ever bound WHICH pairs get scored.
    */
  def verifyPairs(
      corpus: DataFrame, idCol: String, vecCol: String,
      candidates: DataFrame, minSim: Double): DataFrame = {
    val vecs = corpus.select(col(idCol), col(vecCol))
    candidates
      .join(vecs.select(col(idCol).as("a"), col(vecCol).as("va")), Seq("a"))
      .join(vecs.select(col(idCol).as("b"), col(vecCol).as("vb")), Seq("b"))
      .withColumn("sim", cosine(col("va"), col("vb")))
      .filter(col("sim") >= minSim)
      .select(col("a"), col("b"), col("sim"))
  }

  /** Embedding near-duplicate pairs above `minSim`: random-hyperplane LSH
    * band candidates ([[bandCandidates]]) + exact [[cosine]] verify
    * ([[verifyPairs]]). Shuffle is keyed on (band, bucket), so only
    * documents sharing a signature band ever meet.
    *
    * == The default banding is the VERIFICATION tier, not the scale path ==
    * 32 bands × 2 bits recovers essentially every pair at a LOW threshold
    * (τ≈0.4 ⇒ per-hyperplane collision prob ≈0.63 ⇒ per-pair miss
    * (1−0.63²)³² ≈ 9e-8) — but only 4 buckets/band means a random pair
    * collides in ≥1 band with prob ≈ 1−0.75³² ≈ 0.9999: the candidate
    * set IS economically all-pairs. That is the correct configuration
    * for small-scale exact verification (the DuckDB-oracle gate), and
    * the wrong one for 100 TB. Low thresholds are inherently LSH-hostile
    * (measured on this corpus at τ=0.4: 10×6-bit bands → candidate
    * ratio ≈ 0.15 at recall ≈ 0.5; data-dependent k-means scoping
    * trades no better) — production low-τ mining must accept a
    * recall-gated coarse banding (the `dedup_embedding_cosine_cut` gate
    * shape: candidate-ratio bound + recall bound, both measured
    * in-query) or route through [[semanticPairs]] cluster scoping.
    * Genuine dedup thresholds (τ ≥ 0.8, collision prob ≥ 0.9) get both:
    * `bitsPerBand` 6–8 shrinks candidates to true bucket size at
    * near-perfect recall.
    */
  def cosinePairs(
      corpus: DataFrame, idCol: String, vecCol: String, dim: Int,
      minSim: Double, bands: Int = 32, bitsPerBand: Int = 2,
      seed: Long = 42L): DataFrame =
    verifyPairs(corpus, idCol, vecCol,
      bandCandidates(corpus, idCol, vecCol, dim, bands, bitsPerBand, seed), minSim)

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
      signatures(df, id, vec, planes)
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
    topKRanked(cand.withColumn("sim", cosine(col("qv"), col("cv"))), k)
  }

  /** Range search (all neighbors within a cosine radius) for a probe
    * set — the "every vector within τ of these queries" serving shape
    * that top-k ANN cannot express (k is unknown; the answer IS the
    * neighborhood). Candidates come from the same multi-band signature
    * join as [[lshTopK]] (shuffle keyed on (band, bucket), per-probe
    * work O(bucket), never a corpus × probes product); the exact fused
    * [[cosine]] verify keeps pairs ≥ `minSim`, so emitted sims are
    * always exact — banding only bounds WHICH pairs get scored, and
    * recall is the tunable (bands × bits vs τ, the [[cosinePairs]]
    * economics note applies verbatim).
    */
  def lshRange(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, minSim: Double,
      dim: Int, bands: Int = 32, bitsPerBand: Int = 2,
      seed: Long = 42L): DataFrame = {
    val planes = hyperplanes(dim, bands * bitsPerBand, seed)
    def banded(df: DataFrame, id: String, vec: String): DataFrame =
      signatures(df, id, vec, planes)
        .select(col(id), col(vec),
          explode(array((0 until bands).map(b =>
            struct(lit(b).as("band"),
              shiftright(col("sig"), b * bitsPerBand)
                .bitwiseAND((1L << bitsPerBand) - 1).as("bucket"))): _*)).as("bb"))
        .select(col(id), col(vec), col("bb.band"), col("bb.bucket"))
    val c = banded(corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("cv")), "neighbor_id", "cv")
    val q = banded(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("qv")), "query_id", "qv")
    c.join(q, Seq("band", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("qv"), col("neighbor_id"), col("cv"))
      .distinct()
      .withColumn("sim", cosine(col("qv"), col("cv")))
      .filter(col("sim") >= minSim)
      .select(col("query_id"), col("neighbor_id"), col("sim"))
  }

  /** Semantic dedup pairs, SemDeDup-style (Abbas et al. 2023): k-means
    * the corpus embeddings, then compare ONLY within each cluster with
    * exact cosine — the clustering turns an O(N²) all-pairs problem into
    * per-cluster quadratics of size ≈ N/k, and at 100 TB `nClusters`
    * scales with the corpus so cluster size stays bounded. Emitted pairs
    * carry exact sims (never an approximation), so precision is 1 by
    * construction; recall is what clustering trades away, and the gate
    * query asserts it against the exact all-pairs set.
    *
    * One shuffle on the cluster id; centroids (k × dim doubles) are the
    * only driver-side data, as in [[ivfTopK]].
    */
  def semanticPairs(
      corpus: DataFrame, idCol: String, vecCol: String, minSim: Double,
      nClusters: Int = 16, nProbe: Int = 2, iterations: Int = 3): DataFrame = {
    val assigned = clusterAssignments(corpus, idCol, vecCol, nClusters, nProbe, iterations)
    // candidates on cheap (id, id) longs first, vectors attached once per
    // surviving pair — same shape as cosinePairs' LSH candidate join
    val cand = assigned.select(col("id").as("a"), col("cluster"))
      .join(assigned.select(col("id").as("b"), col("cluster")), Seq("cluster"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b")).distinct()
    val v = corpus.select(col(idCol).cast("long"), col(vecCol))
    cand
      .join(v.select(col(idCol).as("a"), col(vecCol).as("va")), Seq("a"))
      .join(v.select(col(idCol).as("b"), col(vecCol).as("vb")), Seq("b"))
      .withColumn("sim", cosine(col("va"), col("vb")))
      .filter(col("sim") >= minSim)
      .select(col("a"), col("b"), col("sim"))
  }

  /** The soft k-means assignment underlying [[semanticPairs]], exposed
    * on its own: every vector lands in its `nProbe` nearest clusters
    * (recovering pairs that straddle a cluster boundary — the classic
    * single-assignment recall leak — at nProbe× the candidate cost).
    * Returns (`id`, `cluster`) with one row per (vector, probe).
    *
    * Public because the assignment IS the recall story: [[semanticPairs]]
    * emits a true pair (exact verify never drops one above τ) iff its
    * two vectors share ≥ 1 assigned cluster — so a recall CERTIFICATE
    * only needs these assignments joined against a truth pair sample,
    * never the per-cluster candidate join (the certificate stays
    * O(corpus) + O(sample) while the serving path keeps its own
    * economics).
    */
  /** Above this cluster count, assignment routes through a coarse
    * layer; below it, exhaustive assignment is cheap and exact. 64
    * clusters ⟺ a ~32k-vector corpus under the n/500 sizing rule, so
    * every driver-SF gate stays on the exact path (bit-identical
    * results) and the routed path carries sf10+.
    */
  private val RoutedAssignmentThreshold = 64

  /** Training-sample cap: k-means centroids converge on a sample long
    * before the full corpus adds information (standard practice —
    * sklearn/faiss train IVF on bounded samples). md5-style
    * deterministic id sampling, so centroids are reproducible.
    */
  private val KmeansTrainCap = 20000L

  /** Soft-assignment breadth for the semantic-dedup scale path: 3 soft
    * clusters per vector up to k = 400 (every shipped SF through sf10 —
    * those results stay bit-identical), growing ∝ √k above (the
    * faiss-style nprobe ∝ √nlist rule). Why it must grow: nClusters
    * scales n/500 to bound the per-cluster quadratic, so clusters get
    * FINER with the corpus and a fixed breadth loses moderately-similar
    * pairs — the r19 sf100 probe measured sampled recall 0.70→0.74
    * (Wilson lower < 0.7, certificate refusing to certify) with breadth
    * pinned at 3, and 0.86+ once breadth scales. Certificate cost is
    * O(n·breadth) assignment rows joined to a 200k-pair sample — linear.
    */
  def scaledNProbe(nClusters: Int): Int =
    math.max(3, math.ceil(3.0 * math.sqrt(nClusters / 400.0)).toInt)

  /** Cluster-count sizing rule for the semantic-dedup scale path:
    * k = max(16, min(n/500, ⌊n^(4/7)⌋)). The linear n/500 term bounds
    * the per-cluster verify quadratic (Σ sizes² ≈ n²/k) and is the
    * shipped rule at every SF below the crossover — n/500 < n^(4/7)
    * for n ≲ 2.05 M, so every driver SF and the sf1/sf10 probe decades
    * stay bit-identical. Past the crossover, letting k keep growing
    * linearly makes the ROUTED assignment (O(n·k^(3/4)) candidate
    * distances — see [[clusterAssignments]]) the dominant term at
    * O(n^(7/4)) — the asymptote the r19 verdict named (measured 7.8×
    * for 10× data at sf100, fourth decade projecting ~56×). n^(4/7)
    * BALANCES the two costs: assignment n·k^(3/4) = n^(10/7) =
    * per-cluster verify n²/k — both sub-O(n^(7/4)), so neither term
    * runs away at the next decade. Floor (not round): monotone, and
    * one cluster of slack never matters at k ≈ 4000.
    */
  def scaledClusterCount(n: Long): Int =
    math.max(16L, math.min(n / 500,
      math.floor(math.pow(n.toDouble, 4.0 / 7.0)).toLong)).toInt

  def clusterAssignments(
      corpus: DataFrame, idCol: String, vecCol: String,
      nClusters: Int, nProbe: Int, iterations: Int = 3): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val vecs = ensureParallelism(corpus.select(col(idCol).cast("long"), col(vecCol)))
      .as[(Long, Array[Float])].persist()
    // == The 100 TB shape (the r18 sf10 probe's named watch item) ==
    // Exhaustive assignment is O(n·k), and k scales with n to keep
    // cluster size bounded — O(n²/500) across decades. Above the
    // threshold: (a) centroids train on a deterministic hashed-id
    // sample (O(cap·k) — k-means gains nothing from the tail), and
    // (b) vectors route through ⌈√k⌉ COARSE centroids (a driver-side
    // Lloyd over the k fine centroids — k×dim doubles, trivially
    // small): nearest `coarseProbe` = ⌈√kCoarse⌉ ≈ k^(1/4) cells, then
    // nProbe fine clusters among those cells' ~√k-sized member lists —
    // O(n·k^(3/4)) candidate distances instead of O(n·k), still
    // sub-linear in k. Routing can miss a fine cluster in an unprobed
    // cell; the sampled-recall certificates (Wilson-bounded) price
    // exactly that, and the driver-SF gates never route (k ≤ 64
    // there), so their results are bit-identical to the exhaustive
    // path.
    val n = vecs.count()
    val trainVecs =
      if (n <= KmeansTrainCap) vecs
      else {
        val step = math.max(1L, n / KmeansTrainCap)
        // Fibonacci-hash id scramble (odd multiplier — bijective on
        // Long), deterministic and order-free
        vecs.filter(p => math.floorMod(p._1 * 0x9E3779B97F4A7C15L, step) == 0L)
      }
    val cents = kmeansCentroids(trainVecs, nClusters, iterations)
    val assigned =
      if (nClusters <= RoutedAssignmentThreshold) {
        vecs.flatMap { case (id, v) => nearest(v, cents, nProbe).map(c => (id, c)) }
          .toDF("id", "cluster")
      } else {
        val kCoarse = math.ceil(math.sqrt(nClusters.toDouble)).toInt
        val coarse = driverKmeans(cents, kCoarse, 5)
        // coarse cell -> indexes of its member fine centroids
        val members: Array[Array[Int]] = {
          val m = Array.fill(kCoarse)(scala.collection.mutable.ArrayBuffer.empty[Int])
          cents.indices.foreach { i =>
            m(nearestDouble(cents(i), coarse, 1).head) += i
          }
          m.map(_.toArray)
        }
        // ⌈√kCoarse⌉ cells, floor 3: a FIXED 3-cell probe is 15% of
        // cells at k=400 but 4.7% at k=4000 — the r19 sf100 probe
        // measured that recall cliff directly (sampled recall 0.70,
        // Wilson lower 0.635 < 0.7, certificate refusing to certify),
        // while a constant FRACTION (kCoarse/6) is Θ(k) candidates —
        // the linear scan the routing exists to avoid. √kCoarse keeps
        // candidates at k^(3/4) (sub-linear) and measured Wilson 0.873
        // at sf100 / 0.722 at sf10 (CertProbe, with scaledNProbe
        // breadth; the constant-3 alternative reads 0.748 at sf100 —
        // passing but thin).
        val coarseProbe = math.max(3, math.ceil(math.sqrt(kCoarse.toDouble)).toInt)
        vecs.flatMap { case (id, v) =>
          val cells = nearest(v, coarse, coarseProbe)
          val cand0 = cells.flatMap(members(_))
          // driverKmeans keeps empty cells' stale centroids, so all
          // probed cells CAN be memberless — fall back to exhaustive
          // for that vector rather than silently dropping it from
          // every downstream pairing (r18 review finding)
          val cand = if (cand0.nonEmpty) cand0 else cents.indices.toSeq
          val d2 = cand.map { ci =>
            val c = cents(ci)
            var s = 0.0; var j = 0
            while (j < c.length && j < v.length) { val d = v(j) - c(j); s += d * d; j += 1 }
            (s, ci)
          }
          d2.sortBy { case (dd, i) => (dd, i) }.take(nProbe).map(p => (id, p._2))
        }.toDF("id", "cluster")
      }
    // no persist on the output: cents is a driver-side value captured by
    // the closure, the sample filter is a pure id hash, so a recompute
    // after vecs.unpersist() replays deterministically (the pre-routing
    // behavior — callers cache if they re-read)
    vecs.unpersist()
    assigned
  }

  /** Deterministic driver-side Lloyd over a SMALL point set (the k fine
    * centroids — k×dim doubles): index-order init, fixed iterations,
    * empty cells keep their previous centroid.
    */
  private def driverKmeans(
      points: Array[Array[Double]], k: Int, iterations: Int): Array[Array[Double]] = {
    var cents = points.take(k).map(_.clone())
    (1 to iterations).foreach { _ =>
      val sums = Array.fill(k)(new Array[Double](points.head.length))
      val counts = new Array[Long](k)
      points.foreach { p =>
        val c = nearestDouble(p, cents, 1).head
        var j = 0; while (j < p.length) { sums(c)(j) += p(j); j += 1 }
        counts(c) += 1
      }
      cents = cents.indices.map { c =>
        if (counts(c) == 0) cents(c) else sums(c).map(_ / counts(c))
      }.toArray
    }
    cents
  }

  /** [[nearest]] for double vectors (the coarse layer works on centroid
    * points, not corpus floats).
    */
  private def nearestDouble(
      v: Array[Double], cents: Array[Array[Double]], n: Int): Seq[Int] = {
    val d2 = cents.map { c =>
      var s = 0.0; var j = 0
      while (j < c.length && j < v.length) { val d = v(j) - c(j); s += d * d; j += 1 }
      s
    }
    d2.zipWithIndex.sortBy { case (dd, i) => (dd, i) }.take(n).map(_._2).toSeq
  }

  /** Deterministic stratified sample of the UNORDERED PAIR SPACE at a
    * fixed expected pair budget, without ever enumerating it: each id
    * hashes (md5 first word — replays bit-exact in DuckDB via the
    * `('0x' || substr(md5(id),1,8))::BIGINT` pattern) into one of
    * B = max(1, ⌊n²/(2·pairBudget)⌋) strata, and the sample is every
    * within-stratum pair — an equi-join on the stratum key, expected
    * mass B·(n/B)²/2 = pairBudget REGARDLESS of n (at small n, B=1 and
    * the sample degenerates to the full pair space — the exact tier).
    * A cluster sample of pairs, not i.i.d. pairs (two pairs sharing a
    * vector co-occur) — disclosed; the per-pair inclusion probability
    * is uniform (1/B), so recall estimated on the sample is unbiased.
    *
    * Returns (`a`, `b`, `sim`) for sampled pairs with exact cosine ≥
    * `minSim` — the SAMPLED TRUTH a scale path's recall is certified
    * against, at O(pairBudget) cost at any corpus size.
    */
  def sampledExactPairs(
      corpus: DataFrame, idCol: String, vecCol: String, minSim: Double,
      pairBudget: Long): DataFrame = {
    val nAgg = corpus.agg(count(lit(1)).cast("double").as("n_corpus"))
    // B from n via double math (n² overflows BIGINT near 3e9 ids;
    // doubles are exact here — n² / 2P stays far under 2⁵³ for any
    // corpus that fits a cluster) — floored, min 1, identical text in
    // the DuckDB oracle.
    val s = corpus.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .crossJoin(broadcast(nAgg))
      .withColumn("nb", greatest(lit(1L),
        floor(col("n_corpus") * col("n_corpus") / lit(2.0 * pairBudget)).cast("long")))
      .withColumn("st",
        conv(substring(md5(col("id").cast("string")), 1, 8), 16, 10)
          .cast("long") % col("nb"))
      .select(col("id"), col("v"), col("st"))
    s.select(col("id").as("a"), col("v").as("va"), col("st"))
      .join(s.select(col("id").as("b"), col("v").as("vb"), col("st")), Seq("st"))
      .filter(col("a") < col("b"))
      .withColumn("sim", cosine(col("va"), col("vb")))
      .filter(col("sim") >= minSim)
      .select(col("a"), col("b"), col("sim"))
  }
}
