package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.
  *
  * Scale design: every method is shuffle-bounded by key cardinality —
  * exact dedup shuffles on the fingerprint hash; MinHash/SimHash shuffle
  * on (band, bucket) keys so only genuinely-similar documents ever meet;
  * nothing is quadratic in corpus size except inside a bucket (bounded by
  * construction). No collects, no driver-side state.
  */
object Dedup {

  /** Exact dedup by canonical fingerprint: keep the smallest id per
    * group. One hash-shuffle; window instead of self-join.
    */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col("fp")).orderBy(col(idCol))
    df.withColumn("fp", TextOps.fingerprint(col(textCol)))
      .withColumn("rn", row_number().over(w))
      .withColumn("group_size", count(lit(1)).over(Window.partitionBy(col("fp"))))
      .filter(col("rn") === 1)
      .select(col(idCol), col("fp"), col("group_size"))
  }

  /** One row per distinct k-token shingle per document. */
  def shingleTable(df: DataFrame, textCol: String, idCol: String, k: Int): DataFrame =
    ensureParallelism(df)
      .select(col(idCol), explode(TextOps.shingles(col(textCol), k)).as("shingle"))
      .distinct()

  /** Exact n-gram Jaccard near-dup pairs ≥ `minJaccard`: candidate pairs
    * via shared shingles (inverted-index self-join — the shuffle key is
    * the shingle, so only co-occurring docs pair up), then exact
    * |∩| / |∪| from distinct-shingle counts. Integer intersection/union
    * with one final double division keeps results engine-exact.
    *
    * `maxShingleDf`: the standard df-cut. A stop-phrase shingle occurring
    * in d documents contributes O(d²) rows to the inverted-index
    * self-join — one hot shingle at 100× scale is a single-bucket
    * quadratic blow-up. With the cut, shingles with document frequency
    * > maxShingleDf are dropped from CANDIDATE generation only; the
    * Jaccard for every surfaced pair is still computed exactly over the
    * full shingle table, so semantics are exact for any pair sharing at
    * least one sub-threshold shingle (at τ ≥ 0.8 a qualifying pair
    * shares nearly all shingles, overwhelmingly rare ones).
    */
  def ngramJaccardPairs(
      df: DataFrame, textCol: String, idCol: String,
      k: Int, minJaccard: Double,
      precomputedShingles: Option[DataFrame] = None,
      maxShingleDf: Option[Int] = None): DataFrame = {
    val sh = precomputedShingles.getOrElse(shingleTable(df, textCol, idCol, k).persist())
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("n_shingles"))
    val inter = maxShingleDf match {
      case None =>
        val a = sh.select(col(idCol).as("a"), col("shingle"))
        val b = sh.select(col(idCol).as("b"), col("shingle"))
        a.join(b, Seq("shingle")).filter(col("a") < col("b"))
          .groupBy(col("a"), col("b")).agg(count(lit(1)).as("inter"))
      case Some(m) =>
        val rare = sh.join(
          sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
            .filter(col("df") > m).select(col("shingle")),
          Seq("shingle"), "left_anti")
        val a = rare.select(col(idCol).as("a"), col("shingle"))
        val b = rare.select(col(idCol).as("b"), col("shingle"))
        val cand = a.join(b, Seq("shingle")).filter(col("a") < col("b"))
          .select(col("a"), col("b")).distinct()
        // exact intersection over the FULL table, like minHashVerifiedPairs
        cand
          .join(sh.select(col(idCol).as("a"), col("shingle")), Seq("a"))
          .join(sh.select(col(idCol).as("b"), col("shingle")), Seq("b", "shingle"))
          .groupBy(col("a"), col("b")).agg(count(lit(1)).as("inter"))
    }
    val out = inter
      .join(sizes.select(col(idCol).as("a"), col("n_shingles").as("na")), Seq("a"))
      .join(sizes.select(col(idCol).as("b"), col("n_shingles").as("nb")), Seq("b"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("a"), col("b"), col("inter"), col("na"), col("nb"), col("jaccard"))
    out
  }

  /** BOUNDED near-dup EDGE set for cluster consumers (r19 verdict task
    * 1 — the last scale-killer): connected components only need a
    * spanning subgraph of each duplicate clique, never all C(m,2)
    * verified pairs, but [[ngramJaccardPairs]] materializes the full
    * pair set — quadratic in clique size (the sf10 LayoutProbe measured
    * 108.6× pair rows for 10× docs on a replica-heavy corpus; ~2.5 B
    * rows projected at sf100). Here each shingle bucket contributes
    * only its SORTED-SIGNATURE NEIGHBOR CHAIN — members ordered by a
    * per-document MinHash-style signature, candidates `(mᵢ, mᵢ₊ⱼ)` for
    * j ≤ `maxLead` — so candidate volume is O(shingle rows · maxLead),
    * linear in the corpus, and the hot-shingle quadratic blow-up the
    * df-cut exists for cannot occur AT ALL on this path (a d-member
    * bucket emits O(d) rows, not O(d²)). Every candidate is then
    * verified with the same exact full-table intersection as
    * [[ngramJaccardPairs]], so emitted edges are a SUBSET of the true
    * τ-pair set: components over them can only split, never merge.
    *
    * Why components still match in practice: a true τ ≥ 0.8 pair shares
    * ~all of its shingles — including, with probability ≥ τ, the
    * MINIMUM shingle hash that is the sort signature — so the two docs
    * co-occur in dozens of buckets and sit adjacent (or within
    * `maxLead`) in signature order; for EVERY shared bucket to hide the
    * pair, each must independently interleave `maxLead` docs between
    * two near-identical signatures, and a duplicate clique is connected
    * by any spanning subset of its edges anyway. The residual risk (an
    * adversarially interleaved pair splitting a component) is priced by
    * the sampled
    * component-equivalence certificate in the cluster gates (Wilson
    * lower bound ≥ 0.95 on sampled-truth-pair component agreement), the
    * same machinery as the semantic certificates. Output schema matches
    * [[ngramJaccardPairs]].
    */
  def ngramJaccardEdgesBounded(
      df: DataFrame, textCol: String, idCol: String,
      k: Int, minJaccard: Double,
      precomputedShingles: Option[DataFrame] = None,
      maxLead: Int = 2): DataFrame = {
    val sh = precomputedShingles.getOrElse(shingleTable(df, textCol, idCol, k).persist())
    // SORTED-SIGNATURE chain, not sorted-id: bucket members are ordered
    // by each document's MinHash-style signature (min over its shingle
    // hashes — one extra groupBy + a doc-keyed join), so documents that
    // genuinely resemble each other sit ADJACENT and the chain edge
    // between them verifies. Raw id order measurably fails on
    // replica-structured corpora: the sf10 probe found ~10k true pairs
    // split because id order interleaves each strong-similarity group
    // with members of its weaker sibling groups (chain candidates all
    // cross groups, all fail the τ verify, and the strong pairs — a
    // full id-span apart — never become candidates). A J ≥ τ pair
    // shares its minimum shingle hash with probability ≥ τ, so
    // signature order is locality-sensitive exactly where the chain
    // needs it; ties (identical signature = near-identical docs) break
    // by id.
    val sig = sh.groupBy(col(idCol))
      .agg(min(xxhash64(col("shingle"))).as("__sig"))
    // the entire edge layout runs in 64-BIT HASHED shingle space: the
    // window sorts and verification joins are the disk-heaviest steps
    // of the layout (the sf100 leg exhausted a 58 GB tmp on
    // string-keyed sorts/shuffles), and a 64-bit key cuts sort records
    // to three longs and shuffle rows to two. A bucket-key collision
    // merely MERGES two buckets (extra candidates, screened by
    // verification); an intersection-count collision (two DIFFERENT
    // shared shingles hashing equal within one pair) overcounts |∩| by
    // 1 with probability ~s²·2⁻⁶⁴ per pair — orders of magnitude below
    // the component-equivalence certificate's sampling error, and the
    // driver-SF oracles recompute string-exact Jaccard, so a collision
    // that ever mattered would flip a gate loudly rather than pass
    // silently.
    val shh = sh.select(col(idCol), xxhash64(col("shingle")).as("hs")).distinct()
    val chained = shh.join(sig, Seq(idCol))
      .select(col("hs"), col(idCol).as("a"), col("__sig"))
    // TWO orderings per bucket — signature AND raw id — because they
    // fail on different pairs (sf10 probe: id order splits 9.9k true
    // pairs, signature order 59k, largely disjoint failure sets: id
    // order interleaves strong-similarity groups, signature order
    // separates id-adjacent same-group members). The union is still
    // O(bucket · 2·maxLead) candidates, and every candidate is
    // exact-verified, so extra candidates only ADD true edges.
    val orderings = Seq(
      Window.partitionBy(col("hs")).orderBy(col("__sig"), col("a")),
      Window.partitionBy(col("hs")).orderBy(col("a")))
    // ONE window pass per ordering (r21, guide §1.2 step 1): all
    // maxLead lead() columns share a window spec, so Spark computes
    // them in a single partition-sort — the old per-(ordering, j)
    // branches planned 2·maxLead separate Window operators (4 sorts of
    // the full chained table at maxLead=2; the candidate phase is the
    // layout's dominant cost at the probe decades — 382 s of the sf100
    // leg). The explode unpacks the leads back to candidate rows; the
    // candidate SET is identical, so verified edges are bit-identical.
    val cand = orderings.map { w =>
      val leads = (1 to maxLead).map(j => lead(col("a"), j).over(w).as(s"__b$j"))
      chained.select(col("a") +: leads: _*)
        .select(col("a"),
          explode(array((1 to maxLead).map(j => col(s"__b$j")): _*)).as("b"))
        .filter(col("b").isNotNull)
        .select(least(col("a"), col("b")).as("a"), greatest(col("a"), col("b")).as("b"))
    }.reduce(_ unionByName _).distinct()
    val sizes = shh.groupBy(col(idCol)).agg(count(lit(1)).as("n_shingles"))
    // intersection over the FULL hashed shingle table — the same join
    // shape as ngramJaccardPairs' df-cut verification, on 16-byte rows
    val inter = cand
      .join(shh.select(col(idCol).as("a"), col("hs")), Seq("a"))
      .join(shh.select(col(idCol).as("b"), col("hs")), Seq("b", "hs"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col(idCol).as("a"), col("n_shingles").as("na")), Seq("a"))
      .join(sizes.select(col(idCol).as("b"), col("n_shingles").as("nb")), Seq("b"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("a"), col("b"), col("inter"), col("na"), col("nb"), col("jaccard"))
  }

  /** Prefix-filtered exact Jaccard pairs — the PPJoin-family candidate
    * filter (Bayardo et al., "Scaling Up All Pairs Similarity Search";
    * Xiao et al., PPJoin): order every document's shingles by a GLOBAL
    * rarity order (ascending document frequency, shingle as tie-break)
    * and index only each document's PREFIX — the first
    * `n − ceil(τ·n) + 1` shingles. Any pair with Jaccard ≥ τ has
    * overlap ≥ ceil(τ·max(na,nb)), which forces at least one common
    * shingle inside BOTH prefixes under the shared order — so joining
    * prefix-to-prefix is LOSSLESS: unlike the df-cut (which trades
    * completeness for the hot-shingle bound), this surfaces exactly the
    * τ-pair set while indexing only ~(1−τ) of each document's shingles,
    * and hot shingles land in prefixes only for the documents where
    * they are among the rarest — the candidate join's per-key fan-in
    * shrinks precisely where the plain inverted index blows up.
    *
    * τ is passed as the rational `tauNum/tauDen` so the prefix length
    * is exact integer arithmetic — `ceil` over a binary-inexact τ·n
    * product is one rounding flip away from an off-by-one prefix (a
    * silently lossy filter). Verification is the same
    * exact full-table intersection as [[ngramJaccardPairs]]; output
    * schema is identical.
    */
  def prefixJaccardPairs(
      df: DataFrame, textCol: String, idCol: String,
      k: Int, tauNum: Int, tauDen: Int,
      precomputedShingles: Option[DataFrame] = None): DataFrame = {
    val sh = precomputedShingles.getOrElse(shingleTable(df, textCol, idCol, k).persist())
    val dfTab = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
    val byRarity = Window.partitionBy(col(idCol))
      .orderBy(col("df").asc, col("shingle").asc)
    val byDoc = Window.partitionBy(col(idCol))
    val prefix = sh.join(dfTab, Seq("shingle"))
      .withColumn("pos", row_number().over(byRarity))
      .withColumn("n", count(lit(1)).over(byDoc))
      // prefix length n − ceil(τ·n) + 1, ceil as (num·n + den − 1) div den
      .filter(col("pos") <=
        col("n") - expr(s"($tauNum * n + $tauDen - 1) div $tauDen") + 1)
      .select(col(idCol), col("shingle"))
    val a = prefix.select(col(idCol).as("a"), col("shingle"))
    val b = prefix.select(col(idCol).as("b"), col("shingle"))
    val cand = a.join(b, Seq("shingle")).filter(col("a") < col("b"))
      .select(col("a"), col("b")).distinct()
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("n_shingles"))
    val minJaccard = tauNum.toDouble / tauDen
    cand
      .join(sh.select(col(idCol).as("a"), col("shingle")), Seq("a"))
      .join(sh.select(col(idCol).as("b"), col("shingle")), Seq("b", "shingle"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("inter"))
      .join(sizes.select(col(idCol).as("a"), col("n_shingles").as("na")), Seq("a"))
      .join(sizes.select(col(idCol).as("b"), col("n_shingles").as("nb")), Seq("b"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("a"), col("b"), col("inter"), col("na"), col("nb"), col("jaccard"))
  }

  /** Winnowing fingerprint pairs (Schleimer/Wilkerson/Aiken's MOSS
    * algorithm): hash every k-token gram, slide a window of `w`
    * consecutive gram hashes over each document, and keep each window's
    * MINIMAL hash — the classic guarantee: any verbatim overlap of at
    * least `w + k − 1` tokens between two documents forces a SHARED
    * selected fingerprint, while only ~1/w of grams are indexed (the
    * density/guarantee dial the full window table doesn't have). Pairs
    * then surface through the usual inverted-index join on the selected
    * hashes, thresholded on shared-fingerprint count. md5 is the gram
    * hash so the selection itself (a string-min) replays exactly in
    * SQL. Per-document window sort is bounded by document length; the
    * pair join's shuffle key is the fingerprint.
    *
    * The selected fingerprint SET is { min gram hash of each full
    * window } — computed as the window-min attached to every window's
    * ending row, then deduplicated by (doc, hash). This is exactly the
    * hash set classic winnowing selects (position tie-breaking among
    * equal minima changes which POSITION is recorded, never the hash
    * value), and it is what the w+k−1 guarantee needs: a window wholly
    * inside a verbatim overlap has identical gram hashes in both docs,
    * hence an identical min. An earlier revision instead kept a gram
    * only when it was the min of the one window ENDING at it, which
    * silently selects nothing over runs of increasing hashes — that
    * trailing-min sampling does NOT carry the guarantee.
    */
  def winnowingPairs(
      df: DataFrame, textCol: String, idCol: String,
      k: Int, w: Int, minShared: Long): DataFrame = {
    val grams = ensureParallelism(df)
      .select(col(idCol),
        posexplode(TextOps.shingles(col(textCol), k)).as(Seq("i", "gram")))
      .withColumn("h", md5(col("gram")))
    val win = Window.partitionBy(col(idCol)).orderBy(col("i"))
      .rowsBetween(-(w - 1), 0)
    val fp = grams
      .withColumn("mn", min(col("h")).over(win))
      .withColumn("cnt", count(lit(1)).over(win))
      .filter(col("cnt") === w)
      .select(col(idCol), col("mn").as("h")).distinct()
    val a = fp.select(col(idCol).as("a"), col("h"))
    val b = fp.select(col(idCol).as("b"), col("h"))
    a.join(b, Seq("h")).filter(col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }

  /** Exact substring-duplicate pairs: documents sharing ANY identical
    * k-token window (the window-fingerprint formulation of exact
    * substring dedup from the "Deduplicating Training Data Makes
    * Language Models Better" line of work — two docs overlap in a
    * verbatim k-token span ⟺ they share a window). Each document
    * explodes into its distinct window hashes (xxhash64 over the
    * token-array slice — no window strings are materialized), and an
    * inverted-index self-join keyed on the hash surfaces the pairs:
    * the shuffle key is the window, so only docs with verbatim overlap
    * ever meet, and nothing is quadratic in corpus size.
    *
    * `maxWindowDf` is the standard hot-window cut (license headers,
    * boilerplate): windows present in more than that many documents are
    * excluded from pairing — at 100 TB one boilerplate window is a
    * single-bucket O(d²) blow-up, and dropping it is the *intended*
    * semantics (boilerplate overlap is not duplication). The gate
    * verifies the uncut form against the oracle; the cut form is
    * spec-tested.
    *
    * Output: (`a`, `b`, `shared_windows`), a < b.
    */
  /** xxhash64 of every k-token window of `textCol`, as an array column —
    * the window-fingerprint primitive shared by [[substringPairs]],
    * [[contaminatedDocs]] and the streaming decontamination query. No
    * window strings are materialized (hash over the token-array slice).
    */
  def windowHashes(textCol: Column, k: Int): Column = {
    val toks = TextOps.tokens(textCol)
    val n = size(toks)
    when(n >= k,
      transform(sequence(lit(0), n - k), i => xxhash64(slice(toks, i + 1, lit(k)))))
      .otherwise(array().cast("array<bigint>"))
  }

  /** Quality-aware cluster representative selection — the curation
    * upgrade over "keep the smallest id": within each near-dup cluster
    * keep the member maximizing `scoreCol` (ties: smaller id) — e.g.
    * the longest or highest-quality document, which is what real
    * curation keeps. `clusters`: (`idCol`, rep) as produced by
    * [[clusters]]; `scores`: (`idCol`, `scoreCol`). One window over
    * the cluster key — cluster count bounds the shuffle, nothing is
    * corpus-quadratic. Output: (rep, best_doc, best_score,
    * cluster_size).
    */
  def clusterBest(
      clusters: DataFrame, scores: DataFrame,
      idCol: String, scoreCol: String): DataFrame = {
    val byCluster = Window.partitionBy(col("rep"))
    // LEFT join: a member missing from `scores` must neither shrink
    // cluster_size nor silently vanish (a fully-unscored cluster still
    // elects a deterministic representative) — unscored members sort
    // last (desc puts nulls last) and lose to any scored member
    val joined = clusters.join(scores, Seq(idCol), "left")
    joined
      .withColumn("__rn", row_number().over(
        byCluster.orderBy(col(scoreCol).desc, col(idCol))))
      .withColumn("cluster_size", count(lit(1)).over(byCluster))
      .filter(col("__rn") === 1)
      .select(col("rep"), col(idCol).as("best_doc"),
        col(scoreCol).as("best_score"), col("cluster_size"))
  }

  /** Leak-proof train/val/test split: assignment keyed on the near-dup
    * CLUSTER representative, not the document id — the reason a pipeline
    * dedups BEFORE splitting. Hashing each document independently leaks
    * near-duplicates across the train/eval boundary (the model is then
    * evaluated on paraphrases of its own training set); hashing the
    * cluster representative puts every member of a connected component
    * on the same side by construction. Documents in no pair (the
    * overwhelming majority of a deduped corpus) are their own group.
    *
    * The draw is the same engine-independent md5 threshold as
    * [[graft.ops.TextOps.deterministicSample]] — quantized to 2^-32,
    * reproducible row-for-row on any engine or partitioning. Split
    * fractions are honored in expectation over GROUPS (a 40-member
    * cluster moves together — the necessary price of leak-proofness).
    *
    * One cluster labeling over the pair set (shuffles bounded by EDGE
    * count, see [[clusters]]) + one left join of the label map onto the
    * corpus (label map ≪ corpus: only docs appearing in some pair) + a
    * scan-speed CASE. At 100 TB the label map is broadcastable at
    * typical near-dup rates, else it hash-joins on the id; nothing here
    * is corpus-quadratic.
    *
    * Output: (idCol, group_id, split ∈ train|val|test), one row per
    * input document.
    */
  def leakproofSplit(
      docs: DataFrame, pairs: DataFrame, idCol: String = "doc_id",
      valRate: Double = 0.1, testRate: Double = 0.1,
      salt: String = ""): DataFrame = {
    require(valRate >= 0 && testRate >= 0 && valRate + testRate <= 1.0,
      "val/test rates must be non-negative and sum to at most 1")
    def thr(r: Double) = f"${math.round(r * 0xFFFFFFFFL)}%08x"
    val labelMap = clusters(pairs, idCol).withColumnRenamed("rep", "__rep")
    val draw = substring(
      md5(concat(col("group_id").cast("string"), lit(salt))), 1, 8)
    docs.select(col(idCol))
      .join(labelMap, Seq(idCol), "left")
      .withColumn("group_id", coalesce(col("__rep"), col(idCol)))
      .select(col(idCol), col("group_id"),
        when(draw < lit(thr(testRate)), lit("test"))
          .when(draw < lit(thr(testRate + valRate)), lit("val"))
          .otherwise(lit("train")).as("split"))
  }

  /** Chunk-level exact dedup WITH REMOVAL (the cleanup step of the
    * exact-substring line of work — [[substringPairs]] only detects
    * duplication, this drops it): documents split into disjoint
    * `window`-token chunks, every chunk occurrence after the
    * corpus-wide first (ordered by doc id, then chunk position) is
    * dropped, and the surviving chunks reassemble into the cleaned
    * document in original order. The keep-first rule makes removal
    * deterministic and engine-replayable — the paragraph-dedup shape
    * of the Dolma/C4 pipelines, on token chunks since this corpus has
    * no paragraph separators.
    *
    * Scale shape: one shuffle partitioned by the chunk text (the
    * keep-first window is per-chunk-key, never a global sort), one
    * per-doc aggregate; output is linear in corpus tokens. Documents
    * whose every chunk was seen earlier disappear (fully-duplicated
    * docs — exactly what removal means).
    *
    * Output: (`idCol`, clean_text, n_kept).
    */
  def chunkDedup(
      df: DataFrame, textCol: String, idCol: String, window: Int): DataFrame = {
    require(window >= 1, "window must be positive")
    // null text drops the document entirely (the shingle/window-hash
    // convention; chunkWindows would otherwise resurrect it as one
    // empty chunk that competes in keep-first with real empty docs)
    val chunks = ensureParallelism(df.filter(col(textCol).isNotNull))
      .select(col(idCol).as("__id"),
        explode(TextOps.chunkWindows(col(textCol), window, window)).as("c"))
      .select(col("__id"), col("c.start").as("start"), col("c.chunk").as("chunk"))
    val keepFirst = Window.partitionBy(col("chunk"))
      .orderBy(col("__id"), col("start"))
    chunks
      .withColumn("__rn", row_number().over(keepFirst))
      .filter(col("__rn") === 1)
      .groupBy(col("__id"))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col("start"), col("chunk")))),
            s => s.getField("chunk")),
          " ").as("clean_text"),
        count(lit(1)).as("n_kept"))
      .select(col("__id").as(idCol), col("clean_text"), col("n_kept"))
  }

  /** Content-defined chunking (CDC) dedup statistics, word-granularity.
    *
    * Fixed-stride chunking ([[chunkDedup]]) is insertion-fragile: one
    * added word shifts every later chunk boundary, so a near-copy with
    * a single edit shares NO chunks with its original. CDC places
    * boundaries by CONTENT — a word ends its chunk when its hash lands
    * in a 1/16 residue class (mean chunk ≈ 16 words, the rsync/FastCDC
    * idea at token granularity) — so an edit perturbs at most the two
    * chunks adjacent to it and every other chunk still fingerprint-
    * matches across the pair.
    *
    * Scale shape: boundary decisions are per-word local (hash of the
    * word alone — no neighbor context) and chunk assembly is one array
    * fold ([[cdcChunkArray]]) — both evaluated INSIDE the scan stage,
    * zero shuffles until the fingerprint aggregation; cross-corpus dup
    * detection is ONE shuffle keyed by chunk fingerprint. Nothing here
    * grows super-linearly — hot fingerprints aggregate to counts, they
    * never self-join.
    *
    * Returns per-document (doc_id, n_chunks, n_dup_chunks, dup_ratio)
    * where a chunk is "dup" when its fingerprint occurs in ≥ 2 distinct
    * documents.
    */
  /** A document's CDC chunks as an array column — ONE left-to-right
    * fold over the token array, entirely inside the scan stage: a word
    * whose hash lands in the boundary class closes the current chunk
    * (itself included), the trailing partial chunk is kept. No window,
    * no per-word shuffle — which also makes the chunker legal on
    * streaming frames (windows are not), so the incremental twin uses
    * the IDENTICAL expression.
    */
  def cdcChunkArray(text: Column): Column = {
    def f(acc: Column, name: String) = acc.getField(name)
    aggregate(
      TextOps.tokens(text),
      struct(array().cast("array<string>").as("chs"), lit("").as("cur")),
      (acc, w) => {
        val joined = when(f(acc, "cur") === "", w)
          .otherwise(concat(f(acc, "cur"), lit(" "), w))
        when(substring(md5(w), 32, 1) === "0",
          struct(concat(f(acc, "chs"), array(joined)).as("chs"),
            lit("").as("cur")))
          .otherwise(struct(f(acc, "chs").as("chs"), joined.as("cur")))
      },
      acc => when(f(acc, "cur") === "" && size(f(acc, "chs")) > 0,
        f(acc, "chs"))
        .otherwise(concat(f(acc, "chs"), array(f(acc, "cur")))))
  }

  /** (doc `__id`, chunk fingerprint `fp`) rows for [[cdcChunkStats]] and
    * its streaming twin — chunks materialize in the scan stage via
    * [[cdcChunkArray]]; the explode emits ~1/16th of the word count.
    */
  def cdcChunkTable(df: DataFrame, textCol: String, idCol: String): DataFrame =
    ensureParallelism(df.filter(col(textCol).isNotNull))
      .select(col(idCol).as("__id"),
        explode(cdcChunkArray(col(textCol))).as("chunk"))
      .select(col("__id"), md5(col("chunk")).as("fp"))

  def cdcChunkStats(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val chunks = cdcChunkTable(df, textCol, idCol)
    val dupFp = chunks.groupBy(col("fp"))
      .agg(countDistinct(col("__id")).as("nd"))
    chunks.join(dupFp, "fp")
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("nd") >= 2, 1L).otherwise(0L)).as("n_dup_chunks"))
      .select(col("__id").as(idCol), col("n_chunks"), col("n_dup_chunks"),
        round(col("n_dup_chunks").cast("double") / col("n_chunks"), 6)
          .as("dup_ratio"))
  }

  /** Source-level verbatim-overlap matrix: for every pair of groups
    * (data sources), the number of distinct k-shingles present in BOTH
    * — the corpus-analytics view of contamination ("did books leak
    * into crawl?", "how much does v2 repeat v1?"), one level above
    * per-document dedup. `containment` = shared / min(|A|, |B|), the
    * standard asymmetric-size overlap metric.
    *
    * Scale shape: the heavy object is the distinct (group, shingle)
    * projection — one shuffle, scan-sized; the self-join is keyed on
    * the shingle and fans out at most |groups|² rows PER SHINGLE
    * (distinct-by-group bounds it), so unlike document-level pairing
    * no df-cut is needed — group cardinality, not corpus size, caps
    * the quadratic term.
    */
  def sourceOverlap(
      df: DataFrame, textCol: String, idCol: String, groupCol: String, k: Int,
      precomputedShingles: Option[DataFrame] = None): DataFrame = {
    // the derived (group, shingle) frame feeds three consumers (two
    // self-join sides + the sizes aggregate). NO self-persist fallback:
    // a persist() here would be pinned by the returned lazy plan for as
    // long as the caller holds it — a corpus-sized cache entry with no
    // owner to unpersist it. A direct call pays the explode at most
    // twice (the self-join's two sides share one shuffle via
    // ReuseExchange; only the sizes aggregate re-derives); callers that
    // run this repeatedly pass precomputedShingles persisted at THEIR
    // layer, where the lifetime has an owner (the sharedShingles
    // precedent).
    val sh = precomputedShingles.getOrElse(shingleTable(df, textCol, idCol, k))
    val ss = sh.join(df.select(col(idCol), col(groupCol)), Seq(idCol))
      .select(col(groupCol).as("g"), col("shingle")).distinct()
    val sizes = ss.groupBy(col("g")).agg(count(lit(1)).as("n"))
    ss.select(col("g").as("source_a"), col("shingle"))
      .join(ss.select(col("g").as("source_b"), col("shingle")), Seq("shingle"))
      .filter(col("source_a") < col("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("shared_shingles"))
      .join(sizes.select(col("g").as("source_a"), col("n").as("na")), Seq("source_a"))
      .join(sizes.select(col("g").as("source_b"), col("n").as("nb")), Seq("source_b"))
      .withColumn("containment",
        col("shared_shingles").cast("double") / least(col("na"), col("nb")))
      .select(col("source_a"), col("source_b"), col("shared_shingles"),
        col("na"), col("nb"), col("containment"))
  }

  /** Distinct (id, window-hash) table — the shareable layout for
    * [[substringPairs]] callers that run it more than once (the
    * `precomputedShingles` precedent: persist ONCE at the query layer
    * instead of leaking one per-call cache entry that the returned
    * lazy plan pins forever).
    */
  def windowTable(df: DataFrame, textCol: String, idCol: String, k: Int): DataFrame =
    ensureParallelism(df)
      .select(col(idCol).as("__id"),
        explode(array_distinct(windowHashes(col(textCol), k))).as("w"))

  def substringPairs(
      df: DataFrame, textCol: String, idCol: String, k: Int = 20,
      maxWindowDf: Option[Long] = None,
      precomputedWindows: Option[DataFrame] = None): DataFrame = {
    // per-doc window dedup INSIDE the row (array_distinct) — a
    // distinct() after the explode would shuffle the whole exploded
    // window table just to drop same-doc repeats
    val wins0 = precomputedWindows.getOrElse(windowTable(df, textCol, idCol, k))
    // the self-join's two sides share one shuffle via ReuseExchange; the
    // hot-window count is a DIFFERENT subplan shape, so with the cut
    // enabled an UNSHARED window table is persisted to avoid
    // re-exploding the corpus for it — callers that invoke this
    // repeatedly should pass precomputedWindows (persisted at their
    // layer) instead, since the returned lazy plan pins this cache
    // entry for the session
    val wins =
      if (maxWindowDf.isDefined && precomputedWindows.isEmpty) wins0.persist() else wins0
    val kept = maxWindowDf.fold(wins) { cap =>
      wins.join(
        wins.groupBy(col("w")).agg(count(lit(1)).as("df"))
          .filter(col("df") > cap).select(col("w")),
        Seq("w"), "left_anti")
    }
    kept.select(col("__id").as("a"), col("w"))
      .join(kept.select(col("__id").as("b"), col("w")), Seq("w"))
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("shared_windows"))
  }

  /** Benchmark decontamination: corpus documents that share ANY verbatim
    * k-token window with a benchmark/eval set — the standard test-set
    * contamination check run before training. Same window-hash
    * inverted-index shape as [[substringPairs]], but cross-table and
    * asymmetric: the (usually tiny) benchmark side's distinct window
    * hashes are the join key, so the shuffle carries only corpus windows
    * that could possibly match (and Catalyst broadcasts the benchmark
    * windows outright when small — the common case: benchmarks are KBs,
    * corpora are TBs). Output: one row per contaminated corpus doc with
    * the number of distinct benchmark windows it contains.
    */
  def contaminatedDocs(
      corpus: DataFrame, corpusTextCol: String, corpusIdCol: String,
      benchmark: DataFrame, benchTextCol: String, k: Int = 20): DataFrame = {
    // corpus side: per-doc dedup inside the row (no shuffle); benchmark
    // side: cross-doc distinct on the (small) window set is still needed
    val corpusWins = ensureParallelism(corpus)
      .select(col(corpusIdCol),
        explode(array_distinct(windowHashes(col(corpusTextCol), k))).as("w"))
    val benchWins = benchmark
      .select(explode(array_distinct(windowHashes(col(benchTextCol), k))).as("w"))
      .distinct()
    corpusWins.join(benchWins, Seq("w"))
      .groupBy(col(corpusIdCol))
      .agg(count(lit(1)).as("n_contaminated_windows"))
  }

  /** Duplicate-cluster resolution: near-dup PAIRS → connected components,
    * labeling every member with the minimum doc id of its component (the
    * canonical representative a dedup pipeline keeps). MERGE/COMPRESS
    * label propagation (Shiloach–Vishkin style): each outer round takes
    * the min over own + neighbors' labels (one edge-keyed shuffle),
    * then POINTER-JUMPS the label forest to its fixpoint
    * (rep(u) ← rep(rep(u)), label-table-sized self-joins — no edge
    * traffic) so every node points at its component tree's root before
    * the next merge; outer rounds are O(log n) regardless of component
    * diameter. The compression is load-bearing since the bounded edge
    * layout deliberately reduces cliques to spanning CHAINS whose
    * diameter is linear in clique size — plain neighbor-min needs
    * O(diameter) rounds, and even single-jump hash-min measurably
    * crawled on the sf10 probe's path components. At corpus scale a
    * driver-side union-find over billions of edges would be impossible.
    *
    * `pairs` carries columns (`a`, `b`); output: (idCol, `rep`), one row
    * per distinct doc appearing in any pair.
    *
    * Hybrid execution (the IVF-centroid precedent): a pair set below
    * `collectThreshold` is union-found on the driver in one pass —
    * near-dup graphs are tiny relative to their corpus, and a handful
    * of rows should not pay ten Spark jobs of label propagation. Above
    * the threshold (billions of pairs at the 100 TB design point) the
    * distributed iterative path runs; both produce the identical
    * min-id labeling. The default cutoff is 1 M edges (~16 MB of
    * (Long, Long) rows — negligible on any driver); deployments with
    * roomy drivers can raise it via the `graft.clusters.collectThreshold`
    * conf, which takes precedence over the parameter.
    */
  def clusters(
      pairs: DataFrame, idCol: String = "doc_id", maxIterations: Int = 50,
      collectThreshold: Long = 1000000L): DataFrame = {
    val confThreshold = pairs.sparkSession.conf
      .getOption("graft.clusters.collectThreshold").map(_.toLong)
      .getOrElse(collectThreshold)
    val edges = pairs.select(col("a").as("u"), col("b").as("v"))
      .unionByName(pairs.select(col("b").as("u"), col("a").as("v")))
      .distinct().persist()
    val nEdges = edges.count()
    // the driver fast path collects ids as longs; non-integral id types
    // stay on the (type-generic) distributed path
    val integralIds = pairs.schema("a").dataType match {
      case org.apache.spark.sql.types.LongType | org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType | org.apache.spark.sql.types.ByteType => true
      case _ => false
    }
    if (nEdges <= confThreshold && integralIds) {
      val spark = pairs.sparkSession
      import spark.implicits._
      val es = edges.select(col("u").cast("long"), col("v").cast("long"))
        .as[(Long, Long)].collect()
      edges.unpersist()
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      es.foreach { case (u, v) =>
        parent.getOrElseUpdate(u, u); parent.getOrElseUpdate(v, v)
        val (ru, rv) = (find(u), find(v))
        if (ru != rv) parent(math.max(ru, rv)) = math.min(ru, rv) // min id wins
      }
      return parent.keys.toSeq.map(u => (u, find(u))).toDF(idCol, "rep")
        .orderBy(col(idCol))
    }
    // Each round TRUNCATES LINEAGE with an eager checkpoint
    // (Graphs.truncate — local by default, RELIABLE under the
    // checkpoint-dir conf) + the two-phase CheckpointGC, exactly the
    // transitiveClosure discipline. Without it the label frame's plan
    // is a union-of-join tree doubling per round: at the sf10 probe
    // decade (26.6 M-pair graph) the DRIVER never finished — not the
    // shuffles, the per-action formatted-plan machinery
    // (SparkListenerSQLExecutionStart's explainString) walking an
    // exponentially self-similar tree. Executor-side cost was linear;
    // the driver was the scale bottleneck, which is exactly what
    // lineage truncation exists for.
    val spark = pairs.sparkSession
    val gc = new Graphs.CheckpointGC
    // Spark 4's localCheckpoint CARRIES the origin plan's statistics
    // onto the new LogicalRDD leaf (rewriteStatsAndConstraints) — and
    // under the jump SELF-JOIN the carried sizeInBytes SQUARES every
    // round (bits double), overflowing BigInteger near round 25 (the
    // sf10 probe hit `BigInteger would overflow supported range` inside
    // Dataset.checkpoint once pointer jumping pushed convergence past
    // the old cap). A periodic rebuild over the SAME checkpointed
    // blocks (createDataFrame over the materialized rows) resets leaf
    // stats to the default estimate; every 8 rounds bounds carried
    // stats at ~2⁸·63 bits while paying the row-conversion pass only
    // 1/8th of the rounds.
    var lastCk: DataFrame = null
    // hard-rebuilt wrappers carry a derived, non-persisted RDD — release
    // on the wrapper would be a silent no-op (r21 ADVICE), so remember
    // which checkpoint frame each wrapper rides on and release THAT
    val wrapperCk = new java.util.IdentityHashMap[DataFrame, DataFrame]
    def reTrunc(df: DataFrame, hard: Boolean): DataFrame = {
      val ck = gc.track(Graphs.truncate(df))
      lastCk = ck
      if (hard) {
        val w = spark.createDataFrame(ck.rdd, ck.schema)
        wrapperCk.put(w, ck): Unit
        w
      } else ck
    }
    var truncs = 0
    def reTruncAuto(df: DataFrame): DataFrame = {
      truncs += 1
      reTrunc(df, hard = truncs % 8 == 0)
    }
    def releaseFrame(df: DataFrame): Unit =
      gc.release(spark, Option(wrapperCk.remove(df)).getOrElse(df))
    var labels = reTrunc(edges.select(col("u")).distinct()
      .select(col("u"), col("u").as("rep")), hard = false)
    var changed = 1L
    var i = 0
    val logRounds = spark.conf.getOption("graft.clusters.logRounds").contains("true")
    while (changed > 0 && i < maxIterations) {
      val roundT0 = System.nanoTime()
      // Shiloach–Vishkin-style round: (1) MERGE — every node takes the
      // min over its own label and its neighbors' labels (one edge-keyed
      // shuffle); (2) COMPRESS — pointer-jump the label FOREST to its
      // fixpoint (rep(u) ← min(rep(u), rep(rep(u))), label-table-sized
      // self-joins only, no edge traffic) so every node points at its
      // tree's root before the next merge. Plain neighbor-min converges
      // in O(component diameter) rounds, and even single-jump hash-min
      // measurably crawled on the sf10 probe's spanning-chain components
      // (4 labels still moving after 50 rounds — long paths with
      // adversarial id order defeat the per-round halving heuristic).
      // With full compression each merge round operates on ROOTS, so
      // outer rounds are O(log n) regardless of diameter; compression
      // itself re-halves pointer depth per jump and the depth a single
      // merge round can create is small, so the inner loop settles in a
      // couple of passes. Reps are always member ids (init rep = u,
      // mins of member labels), so the jump's self-join key resolves.
      val viaNeighbors = edges
        .join(labels.select(col("u").as("v"), col("rep")), Seq("v"))
        .select(col("u"), col("rep"))
      val merged = labels.unionByName(viaNeighbors)
        .groupBy(col("u")).agg(min(col("rep")).as("rep"))
      // HOOK (the Shiloach–Vishkin tree-hooking step): each node's
      // PREVIOUS root learns the min of its members' merged labels —
      // without it, a smaller label arriving at a tree's LEAF never
      // flows up to the root, compression spreads nothing, and the min
      // still walks the component one tree-hop per round (measured: 2
      // labels still moving after 50 merge+compress rounds at sf10)
      val hook = merged
        .join(labels.withColumnRenamed("rep", "proot"), Seq("u"))
        .select(col("proot").as("u"), col("rep"))
      var next = reTruncAuto(merged.unionByName(hook)
        .groupBy(col("u")).agg(min(col("rep")).as("rep")))
      var innerChanged = 1L
      var inner = 0
      while (innerChanged > 0 && inner < 40) {
        val jumped = reTruncAuto(next
          .join(next.select(col("u").as("rep"), col("rep").as("rep2")), Seq("rep"))
          .select(col("u"),
            least(col("rep"), col("rep2")).as("rep")))
        innerChanged = jumped.join(next.withColumnRenamed("rep", "prev"), Seq("u"))
          .filter(col("rep") =!= col("prev")).count()
        // `jumped` is an EAGER checkpoint and the change count above was
        // the last read of `next` (the outer change count compares the
        // FINAL inner frame against `labels`) — release it NOW instead
        // of holding every inner jump until the round's sweep (r20
        // advice: peak pinned storage was O(inner jumps × |labels|);
        // targeted release caps it at ~2 inner frames). No full sweep
        // here: the OUTER change count still reads the previous round's
        // `labels`, whose blocks a second sweep would delete — the
        // two-phase "superseded is read one sweep later" contract stays
        // per OUTER round, and release() never touches `labels`. On
        // hard-trunc iterations the wrapper is mapped back to its
        // underlying checkpoint so the release is never a no-op.
        releaseFrame(next)
        next = jumped
        inner += 1
      }
      changed = next.join(labels.withColumnRenamed("rep", "prev"), Seq("u"))
        .filter(col("rep") =!= col("prev")).count()
      // opt-in per-round instrumentation (graft.clusters.logRounds):
      // the decade-series probes read rounds-to-converge and per-round
      // wall from stderr — the O(log n) outer-bound evidence with the
      // checkpoint overhead included (r20 verdict task 5)
      if (logRounds)
        System.err.println(f"[clusters] round=${i + 1} " +
          f"wall=${(System.nanoTime() - roundT0) / 1e9}%.2f s " +
          f"innerJumps=$inner changed=$changed")
      labels = next
      i += 1
      gc.sweep(spark)
    }
    if (changed > 0)
      System.err.println(
        s"[graft] Dedup.clusters: not converged after $maxIterations iterations " +
          s"($changed labels still moving) — component diameter exceeds the cap; " +
          "labels are an upper approximation. Raise maxIterations.")
    edges.unpersist()
    gc.finish(spark, lastCk)
    labels.select(col("u").as(idCol), col("rep")).orderBy(col(idCol))
  }

  /** MinHash parameters: `bands * rowsPerBand` hash functions; a pair is
    * a candidate iff all `rowsPerBand` minhashes agree in ≥1 band —
    * the classic s-curve with threshold ≈ (1/bands)^(1/rowsPerBand).
    */
  final case class MinHashParams(bands: Int = 16, rowsPerBand: Int = 8, seed: Long = 42L) {
    val numHashes: Int = bands * rowsPerBand
  }

  // 31-bit Mersenne prime field: coefficients and folded shingle hashes
  // stay < 2^31, so a·x + b < 2^62 — no int64 overflow under ANSI mode.
  private val MersennePrime = (1L << 31) - 1

  /** Per-band bucket keys for each document: MinHash signature computed
    * from shingle xxhash64s via k universal-hash permutations
    * h_i(x) = (a_i·x + b_i) mod (2^31−1) over 31-bit-folded shingle
    * hashes, folded per band into one
    * bucket hash. Output: (id, band, bucket). The whole computation is a
    * single projection per document (no shuffle until the bucket
    * group-by) — signatures never materialize as 128 columns.
    */
  def minHashBands(
      df: DataFrame, textCol: String, idCol: String,
      shingleK: Int, p: MinHashParams): DataFrame = {
    val rnd = new java.util.Random(p.seed)
    val as = Array.fill(p.numHashes)(math.abs(rnd.nextLong()) % MersennePrime + 1)
    val bs = Array.fill(p.numHashes)(math.abs(rnd.nextLong()) % MersennePrime)
    val nH = p.numHashes
    val rpb = p.rowsPerBand
    val nBands = p.bands
    val spark = df.sparkSession
    import spark.implicits._
    // One typed pass: all k permutations update while streaming the
    // shingle hashes once per document. (A k-wide Catalyst aggregate()
    // tree for this blows up whole-stage codegen — 128 nested lambda
    // aggregates took >20s to plan+run on 500 docs; this runs in ms.)
    ensureParallelism(df)
      .select(col(idCol).cast("long"), TextOps.shingleHashes(col(textCol), shingleK))
      .as[(Long, Array[Long])]
      .flatMap { case (id, hashes) =>
        if (hashes.isEmpty) Iterator.empty
        else {
          val sig = Array.fill(nH)(Long.MaxValue)
          var s = 0
          while (s < hashes.length) {
            val x = hashes(s) & MersennePrime
            var i = 0
            while (i < nH) {
              val v = (as(i) * x + bs(i)) % MersennePrime
              if (v < sig(i)) sig(i) = v
              i += 1
            }
            s += 1
          }
          Iterator.tabulate(nBands) { b =>
            var acc = 1125899906842597L // FNV-style fold of the band's rows
            var r = 0
            while (r < rpb) { acc = acc * 31 + sig(b * rpb + r); r += 1 }
            (id, b, acc)
          }
        }
      }.toDF(idCol, "band", "bucket")
  }

  /** Candidate near-dup pairs from LSH buckets (distinct across bands). */
  def minHashCandidates(
      df: DataFrame, textCol: String, idCol: String,
      shingleK: Int = 5, p: MinHashParams = MinHashParams()): DataFrame = {
    val bands = minHashBands(df, textCol, idCol, shingleK, p)
    val l = bands.select(col(idCol).as("a"), col("band"), col("bucket"))
    val r = bands.select(col(idCol).as("b"), col("band"), col("bucket"))
    l.join(r, Seq("band", "bucket")).filter(col("a") < col("b"))
      .select(col("a"), col("b")).distinct()
  }

  /** MinHash+LSH with exact verification: candidates from the banded
    * signatures, then true Jaccard on just those pairs — the standard
    * two-stage filter that keeps the exact step linear in candidates.
    */
  def minHashVerifiedPairs(
      df: DataFrame, textCol: String, idCol: String,
      shingleK: Int = 5, minJaccard: Double = 0.8,
      p: MinHashParams = MinHashParams(),
      precomputedShingles: Option[DataFrame] = None): DataFrame = {
    val cand = minHashCandidates(df, textCol, idCol, shingleK, p)
    val sh = precomputedShingles.getOrElse(shingleTable(df, textCol, idCol, shingleK).persist())
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("n"))
    // Intersection size: attach a's shingles, then equi-join on
    // (b, shingle) so only SHARED shingles survive — never the
    // |A|×|B| per-pair shingle cross-product.
    val inter = cand
      .join(sh.select(col(idCol).as("a"), col("shingle")), Seq("a"))
      .join(sh.select(col(idCol).as("b"), col("shingle")), Seq("b", "shingle"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col(idCol).as("a"), col("n").as("na")), Seq("a"))
      .join(sizes.select(col(idCol).as("b"), col("n").as("nb")), Seq("b"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("a"), col("b"), col("jaccard"))
  }

  /** FNV-1a 64-bit — deterministic token hash for SimHash bits and the
    * hashed-feature classifier ([[TextOps.hashedLinearScore]]).
    */
  private[ops] def fnv1a64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) { h ^= s.charAt(i); h *= 0x100000001b3L; i += 1 }
    h
  }

  /** 64-bit SimHash per document: sign of the per-bit token-vote sum,
    * computed in one typed pass (a 64-expression Catalyst aggregate tree
    * here is a codegen blow-up, like MinHash above). Output: (id, sh).
    */
  def simHashSignatures(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    ensureParallelism(df)
      .select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .map { case (id, text) =>
        val votes = new Array[Int](64)
        text.split(' ').foreach { tok =>
          val h = fnv1a64(tok)
          var j = 0
          while (j < 64) {
            if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
            j += 1
          }
        }
        var sh = 0L
        var j = 0
        while (j < 64) { if (votes(j) > 0) sh |= (1L << j); j += 1 }
        (id, sh)
      }.toDF(idCol, "sh")
  }

  /** SimHash near-dup candidates: band the 64-bit hash into
    * `maxHamming + 1` chunks — by pigeonhole, any pair within the Hamming
    * budget shares ≥1 unchanged chunk, so the bucket join finds *every*
    * qualifying pair without a pairwise scan (guaranteed recall, unlike
    * fixed-width banding); verified by exact popcount on the XOR.
    */
  def simHashPairs(df: DataFrame, textCol: String, idCol: String, maxHamming: Int = 3): DataFrame = {
    val nBands = math.min(maxHamming + 1, 32)
    // contiguous bit ranges covering all 64 bits, sizes differing by ≤1
    val bounds = (0 to nBands).map(b => b * 64 / nBands)
    val sh = simHashSignatures(df, textCol, idCol)
    val banded = sh.select(col(idCol), col("sh"),
      explode(array((0 until nBands).map { b =>
        val lo = bounds(b); val width = bounds(b + 1) - lo
        val mask = if (width >= 64) -1L else (1L << width) - 1
        struct(lit(b).as("band"),
          shiftright(col("sh"), lo).bitwiseAND(mask).as("chunk"))
      }: _*)).as("bc"))
      .select(col(idCol), col("sh"), col("bc.band"), col("bc.chunk"))
    val l = banded.select(col(idCol).as("a"), col("sh").as("sha"), col("band"), col("chunk"))
    val r = banded.select(col(idCol).as("b"), col("sh").as("shb"), col("band"), col("chunk"))
    l.join(r, Seq("band", "chunk")).filter(col("a") < col("b"))
      .select(col("a"), col("b"), col("sha"), col("shb")).distinct()
      .withColumn("hamming", bit_count(col("sha").bitwiseXOR(col("shb"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("a"), col("b"), col("hamming"))
  }

  /** Fuzzy vocabulary join: every pair of distinct corpus terms within
    * Levenshtein distance 1, found SymSpell-style — each term is blocked
    * under itself plus its 1-character-deletion variants, candidates meet
    * by an equality join on the variant key, and `levenshtein` verifies
    * exactly. Two distance-≤1 terms always share a key (equal-length
    * substitution pairs share a same-position deletion; insert/delete
    * pairs share the shorter term itself), so recall is exact.
    *
    * Scale: a variant key k can only be produced by k itself or by terms
    * made by inserting ONE character into k, so a bucket holds at most
    * |Σ|·(len+1)+1 terms *regardless of corpus size* — candidate
    * generation is linear in vocabulary, never quadratic, with no hot-key
    * cut needed. The distinct-vocab aggregation is the only full shuffle.
    * `minLen` keeps trigram-sized stop words (whose distance-1
    * neighborhoods are dense and semantically meaningless) out of the
    * pair set.
    */
  def fuzzyTermPairs(df: DataFrame, textCol: String, idCol: String,
      minLen: Int = 4): DataFrame = {
    val vocab = ensureParallelism(df)
      .select(col(idCol), explode(TextOps.tokens(lower(col(textCol)))).as("term"))
      .filter(length(col("term")) >= minLen && col("term").rlike("^[a-z]+$"))
      .groupBy(col("term")).agg(count_distinct(col(idCol)).as("df"))
    // the term itself + its 1-deletion variants, deduped before explode
    // (repeated letters collapse: "aa" deletes to "a" twice)
    val keyed = vocab.withColumn("k",
      explode(array_distinct(concat(array(col("term")), expr(
        """transform(sequence(1, length(term)),
          |  i -> concat(substring(term, 1, i - 1),
          |              substring(term, i + 1, length(term) - i)))""".stripMargin)))))
    val l = keyed.select(col("term").as("term_a"), col("df").as("df_a"), col("k"))
    val r = keyed.select(col("term").as("term_b"), col("df").as("df_b"), col("k"))
    l.join(r, Seq("k")).filter(col("term_a") < col("term_b"))
      .select("term_a", "term_b", "df_a", "df_b").distinct()
      // native one-walk bounded check instead of the full O(n·m)
      // Levenshtein DP compared to 1 afterwards — identical semantics
      .filter(graft.functions.WithinEdit1(col("term_a"), col("term_b")))
  }

  /** Asymmetric CONTAINMENT near-dup pairs: C(A,B) = |A∩B| / min(|A|,
    * |B|) over k-shingle sets. Jaccard misses a short doc embedded in a
    * long one (the union dilutes it); containment is the measure crawl
    * pipelines use for quote/wrapper detection. Same inverted-index
    * shape as [[ngramJaccardPairs]] — shuffle keyed on the shingle,
    * never all-pairs — with the size join switched to the min side.
    */
  def containmentPairs(
      df: DataFrame, textCol: String, idCol: String,
      k: Int, minContainment: Double,
      precomputedShingles: Option[DataFrame] = None): DataFrame = {
    val sh = precomputedShingles.getOrElse(
      shingleTable(df, textCol, idCol, k).persist())
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("n_shingles"))
    val a = sh.select(col(idCol).as("a"), col("shingle"))
    val b = sh.select(col(idCol).as("b"), col("shingle"))
    a.join(b, Seq("shingle")).filter(col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("inter"))
      .join(sizes.select(col(idCol).as("a"), col("n_shingles").as("na")), Seq("a"))
      .join(sizes.select(col(idCol).as("b"), col("n_shingles").as("nb")), Seq("b"))
      .withColumn("containment",
        col("inter").cast("double") / least(col("na"), col("nb")))
      .filter(col("containment") >= minContainment)
      .select(col("a"), col("b"), col("inter"), col("na"), col("nb"),
        col("containment"))
  }

  /** Entity resolution by symmetric-delete blocking (SymSpell, Garbe):
    * link a record whose name lost one character to its original. Every
    * record emits its 1-deletion variants (|name| keys); the candidate
    * join pairs a variant against another record's EXACT name, so a
    * (longer, shorter) pair meets iff the shorter string is literally
    * one of the longer's deletes — guaranteed recall for one-deletion
    * dirt with |name|+1 keys per record and never a per-block quadratic
    * comparison (nation- or prefix-blocked ER degrades to O(block²)).
    * Candidates verify through the native one-walk WithinEdit1.
    * Output: (a_key, b_key, a_name, b_name), a = the longer/dirty side.
    */
  def symspellLinkPairs(
      ents: DataFrame, keyCol: String, nameCol: String): DataFrame = {
    val deletes = expr(
      s"""transform(sequence(1, length($nameCol)),
         |  p -> concat(substring($nameCol, 1, p - 1),
         |              substring($nameCol, p + 1, length($nameCol) - p)))""".stripMargin)
    val d1 = ensureParallelism(ents).select(col(keyCol).as("a_key"),
      col(nameCol).as("a_name"), explode(array_distinct(deletes)).as("k"))
    val d0 = ents.select(col(keyCol).as("b_key"),
      col(nameCol).as("b_name"), col(nameCol).as("k"))
    d1.join(d0, Seq("k"))
      .filter(length(col("a_name")) === length(col("b_name")) + 1)
      .filter(graft.functions.WithinEdit1(col("a_name"), col("b_name")))
      .select(col("a_key"), col("b_key"), col("a_name"), col("b_name"))
      .distinct()
  }

  /** Leading-window fingerprint: md5 of the first `k` whitespace tokens —
    * the cheap prefix signature crawl pipelines key incremental dedup on
    * (near-identical boilerplate pages share prefixes long before they
    * share full bodies).
    */
  def prefixFingerprint(textCol: Column, k: Int): Column =
    md5(concat_ws(" ", slice(split(textCol, " "), 1, k)))

  /** Incremental dedup of a new batch against an already-ingested history
    * WITHOUT re-shuffling the history: a Bloom filter over the BATCH's
    * fingerprints (the nightly increment — the side that actually fits a
    * fixed-size filter) prefilters the history scan down to the
    * plausible-duplicate slice BEFORE any exchange, and only that slice
    * joins the batch for exact verification. At the 100 TB design point
    * this is the whole game — the increment is GBs, the history is the
    * 100 TB, and the history-side work is one sequential scan through a
    * codegen'd `might_contain` probe (the shuffle carries only history
    * rows whose fingerprint hash passed it). False positives are killed
    * by the exact equi-join on the full fingerprint; false negatives
    * don't exist, so the result is byte-identical to the plain join.
    * `expectedKeys` sizes the filter for the BATCH's cardinality.
    * Returns (idCol, n_history_matches) for batch docs that duplicate
    * history.
    */
  def incrementalDups(
      history: DataFrame, batch: DataFrame, textCol: String, idCol: String,
      prefixK: Int = 16, expectedKeys: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    val fp = prefixFingerprint(col(textCol), prefixK)
    val batchFp = batch.select(col(idCol), fp.as("fp_b"), xxhash64(fp).as("fpk"))
    val histKeyed = history.select(fp.as("fp_h"), xxhash64(fp).as("fpk"))
    // big = history (bloom-probed at scan speed), small = batch (blooms)
    Joins.bloomPrefilteredJoin(histKeyed, batchFp, "fpk", expectedKeys, fpp)
      .filter(col("fp_b") === col("fp_h")) // kill 64-bit hash collisions
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_history_matches"))
  }

  /** Incremental NEAR-dup detection of a new batch against an ingested
    * history — [[incrementalDups]]' fuzzy sibling, the nightly-crawl
    * shape: find (history doc `a`, batch doc `b`) pairs with n-gram
    * Jaccard ≥ `minJaccard`, WITHOUT comparing history to itself and
    * without re-shuffling the full history. A Bloom filter over the
    * BATCH's shingle hashes (the increment — the side that fits a
    * fixed-size filter) prefilters the history shingle scan down to
    * shingles the batch actually contains BEFORE any exchange; only
    * that slice enters the inverted-index join, so the pair stage is
    * bounded by the batch's shingle vocabulary however large the
    * history is. False positives die at the exact string equality +
    * exact |∩|/|∪| verification; false negatives don't exist, so the
    * result equals the plain cross-side join restriction of
    * [[ngramJaccardPairs]].
    *
    * `expectedKeys` sizes the Bloom filter for the batch's DISTINCT
    * SHINGLE count — two to three orders of magnitude above the batch's
    * document count (an undersized filter saturates and the history
    * prefilter silently passes everything; correctness survives the
    * exact verify, the scale property doesn't). The default budgets
    * 10 M keys ≈ 12 MB at fpp 0.01 — broadcast-friendly.
    *
    * The history-side distinct-shingle counts (`na`, needed for the
    * exact union size) are the one term the Bloom filter cannot prune
    * — a per-doc DISTINCT count needs every history shingle once, so
    * the fallback aggregation here shuffles the history shingle table.
    * At the 100 TB design point pass `precomputedHistSizes`
    * ((idCol, na) — per-doc distinct-shingle counts, natural ingest
    * metadata maintained alongside the corpus) and the history-side
    * cost drops to the bloom-probed scan the nightly loop wants. The
    * batch shingle table is persisted — it is read by the filter
    * build, the probe side, and the `nb` aggregate, and it is
    * increment-sized (the [[ngramJaccardPairs]] fallback precedent),
    * not corpus-sized.
    *
    * Output: (a, b, inter, na, nb, jaccard) — `a` from history, `b`
    * from the batch.
    */
  def incrementalNearDups(
      history: DataFrame, batch: DataFrame, textCol: String, idCol: String,
      k: Int = 5, minJaccard: Double = 0.8,
      expectedKeys: Long = 10000000L, fpp: Double = 0.01,
      precomputedHistSizes: Option[DataFrame] = None,
      precomputedBatchShingles: Option[DataFrame] = None): DataFrame = {
    val hSh = shingleTable(history, textCol, idCol, k)
    // The nightly-loop caller should pass `precomputedBatchShingles`
    // ((idCol, shingle), typically a filter over an already-persisted
    // corpus shingle layout) so the cache lifetime has an owner — the
    // fallback persist below is increment-sized but pins one storage
    // entry per call for the session lifetime (ADVICE r9).
    val bSh = precomputedBatchShingles.getOrElse(
      shingleTable(batch, textCol, idCol, k).persist())
    val hKeyed = hSh.select(col(idCol).as("a"), col("shingle").as("shingle_h"),
      xxhash64(col("shingle")).as("shk"))
    val bKeyed = bSh.select(col(idCol).as("b"), col("shingle"),
      xxhash64(col("shingle")).as("shk"))
    val inter = Joins.bloomPrefilteredJoin(hKeyed, bKeyed, "shk", expectedKeys, fpp)
      .filter(col("shingle_h") === col("shingle")) // kill 64-bit hash collisions
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("inter"))
    val histSizes = precomputedHistSizes.getOrElse(
      hSh.groupBy(col(idCol)).agg(count(lit(1)).as("na")))
    inter
      .join(histSizes.select(col(idCol).as("a"), col("na")), Seq("a"))
      .join(bSh.groupBy(col(idCol)).agg(count(lit(1)).as("nb"))
        .select(col(idCol).as("b"), col("nb")), Seq("b"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("a"), col("b"), col("inter"), col("na"), col("nb"), col("jaccard"))
  }
}
