package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row}

/** Subword (WordPiece-style) tokenization: greedy longest-match against a
  * broadcast vocabulary, the decomposition step a training-data pipeline
  * runs between text cleaning and sequence packing.
  *
  * Scale shape: the vocabulary (10^4–10^5 pieces, bytes not gigabytes) is
  * broadcast once per executor; each partition streams its rows through
  * one shared lookup structure — no shuffle is introduced at all, and the
  * per-word matcher probes a hash set at most `maxPieceLen` times per
  * character. The greedy longest-match loop is genuinely imperative
  * per-row logic (data-dependent trip count), which is the documented
  * reason this is a typed pass rather than an expression tree.
  */
object Subword {

  /** Greedy longest-match WordPiece over one word. Continuation pieces
    * carry the `##` prefix; a word with any untokenizable remainder
    * collapses to `unk` (standard WordPiece behavior).
    */
  def encodeWord(
      word: String, vocab: Set[String], maxPieceLen: Int, unk: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var off = 0
    while (off < word.length) {
      val prefix = if (off == 0) "" else "##"
      var len = math.min(maxPieceLen - prefix.length, word.length - off)
      var found: String = null
      while (len >= 1 && found == null) {
        val cand = prefix + word.substring(off, off + len)
        if (vocab(cand)) found = cand
        len -= 1
      }
      if (found == null) return Seq(unk)
      out += found
      off += found.length - prefix.length
    }
    out.toSeq
  }

  /** Tokenize `textCol` of `df` into subword pieces: lowercase, split on
    * non-letter runs, then greedy longest-match per word. Emits one row
    * per piece: `(idCol, pos, piece_pos, piece_id, piece)` where `pos` is
    * the word's index in the split array and `piece_id` the piece's
    * 1-based position in `vocab` (0 for `unk`).
    */
  def wordpiece(
      df: DataFrame, idCol: String, textCol: String,
      vocab: Seq[String], unk: String = "[UNK]"): DataFrame = {
    require(vocab.distinct.size == vocab.size, "vocabulary pieces must be unique")
    val spark = df.sparkSession
    val words = df.select(
      col(idCol).cast("long").as(idCol),
      posexplode(split(lower(col(textCol)), "[^a-z]+")).as(Seq("pos", "word")))
      .filter(col("word") =!= "")
    val outSchema = StructType(Seq(
      StructField(idCol, LongType),
      StructField("pos", IntegerType),
      StructField("piece_pos", IntegerType),
      StructField("piece_id", IntegerType),
      StructField("piece", StringType)))
    val ids = vocab.zipWithIndex.map { case (p, i) => p -> (i + 1) }.toMap
    val bVocab = spark.sparkContext.broadcast((ids, vocab.map(_.length).max))
    val rdd = words.rdd.mapPartitions { rows =>
      val (pieceIds, maxLen) = bVocab.value
      val vocabSet = pieceIds.keySet
      rows.flatMap { r =>
        val (id, pos, word) = (r.getLong(0), r.getInt(1), r.getString(2))
        encodeWord(word, vocabSet, maxLen, unk).iterator.zipWithIndex.map {
          case (piece, i) => Row(id, pos, i, pieceIds.getOrElse(piece, 0), piece)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** A compact deterministic English-ish vocabulary: every lowercase
    * letter as both head and continuation piece (so any `[a-z]+` word
    * tokenizes without `[UNK]`), plus frequent multi-character subwords.
    * Head letters first (ids 1–26), continuation letters (27–52), then
    * the multi-character pieces — fixed and literal so a SQL oracle can
    * embed the identical list with identical ids.
    */
  val DefaultVocab: Seq[String] =
    ('a' to 'z').map(_.toString) ++
      ('a' to 'z').map("##" + _) ++ Seq(
        "the", "and", "ing", "ion", "ent", "her", "for", "tha", "est",
        "##ing", "##ion", "##ed", "##er", "##es", "##ly", "##ent", "##al", "##ous",
        "re", "un", "in", "de", "co", "pro", "ex")

  // --------------------------------------------------------------------
  // Byte-pair encoding (Sennrich et al. 2016, public algorithm)
  // --------------------------------------------------------------------

  /** One BPE merge application over a symbol sequence: a single
    * left-to-right non-overlapping pass replacing every adjacent
    * (`l`, `r`) with the concatenation. Single-pass-per-merge is the
    * DEFINED semantics here (not iterate-to-fixpoint) so a SQL oracle
    * can replay it exactly with one string `replace` per merge.
    */
  def mergePass(syms: Seq[String], l: String, r: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  /** Encode one word with a ranked merge list: start from single
    * characters, apply each merge in rank order (one pass each). */
  def encodeBpe(word: String, merges: Seq[(String, String)]): Seq[String] = {
    var syms: Seq[String] = word.map(_.toString)
    merges.foreach { case (l, r) => if (syms.length > 1) syms = mergePass(syms, l, r) }
    syms
  }

  /** Learn `numMerges` BPE merges from a corpus, distributed the way a
    * 100 TB tokenizer-training job has to be: the corpus collapses ONCE
    * into a distinct-word frequency table (Heaps' law: vocabulary grows
    * ~O(corpus^0.5), so this table is orders of magnitude smaller than
    * the corpus and is the only thing the iterations ever touch), then
    * each merge round is one map-side-combined pair-count aggregation
    * over that table plus a one-row argmax. Only the argmax row — the
    * chosen pair — ever reaches the driver (bounded by design, the same
    * budget as the IVF centroids); the corpus itself is never rescanned.
    *
    * Tie-break is total and engine-independent: count DESC, then left
    * and right symbol ascending. Returns (rank, left, right, count).
    */
  def bpeTrain(df: DataFrame, textCol: String, numMerges: Int): Seq[(Int, String, String, Long)] = {
    val spark = df.sparkSession
    import spark.implicits._
    val base = df
      .select(explode(split(lower(col(textCol)), "[^a-z]+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .as[(String, Long)]
      .persist()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 0
    var exhausted = false
    while (rank < numMerges && !exhausted) {
      // Re-segment from the cached word table with ALL merges so far in
      // one broadcast pass: constant lineage depth and exactly one job
      // per round (the argmax), instead of a per-round persist+count
      // materialization whose fixed job latency dominates at any scale
      // where the word table fits the cache. Re-applying k short merge
      // passes per word is arithmetic noise next to a job's scheduling.
      val soFar = merges.map(m => (m._2, m._3)).toSeq
      val bMerges = spark.sparkContext.broadcast(soFar)
      val best =
        try base
          .map { case (w, f) => (encodeBpe(w, bMerges.value), f) }
          .toDF("syms", "freq")
          .filter(size(col("syms")) > 1)
          .select(col("freq"), explode(expr(
            "transform(slice(syms, 1, size(syms) - 1), (s, i) -> struct(s AS l, syms[i + 1] AS r))"))
            .as("p"))
          .groupBy(col("p.l").as("l"), col("p.r").as("r"))
          .agg(sum(col("freq")).as("cnt"))
          .orderBy(desc("cnt"), col("l"), col("r"))
          .limit(1)
          .collect()
        // the round's collect is the broadcast's last use — destroy it,
        // or a long training accumulates one live broadcast per round
        finally bMerges.destroy()
      if (best.isEmpty) exhausted = true
      else {
        merges += ((rank, best(0).getString(0), best(0).getString(1), best(0).getLong(2)))
        rank += 1
      }
    }
    base.unpersist()
    merges.toSeq
  }

  /** Tokenize `textCol` with a ranked BPE merge list (broadcast once per
    * executor, zero shuffle — the same scale shape as [[wordpiece]]).
    * Emits one row per piece: `(idCol, pos, piece_pos, piece)`. A typed
    * flatMap rather than an RDD pass, so the identical operator runs
    * unchanged inside Structured Streaming micro-batches (stream/batch
    * parity for the tokenizer).
    */
  def bpeEncode(
      df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bMerges = spark.sparkContext.broadcast(merges)
    df.select(
        col(idCol).cast("long").as("id"),
        posexplode(split(lower(col(textCol)), "[^a-z]+")).as(Seq("pos", "word")))
      .filter(col("word") =!= "")
      .as[(Long, Int, String)]
      .flatMap { case (id, pos, word) =>
        encodeBpe(word, bMerges.value).iterator.zipWithIndex.map {
          case (piece, i) => (id, pos, i, piece)
        }
      }
      .toDF(idCol, "pos", "piece_pos", "piece")
  }

  /** A fixed, literal merge list (as produced by an offline [[bpeTrain]]
    * run) for the oracled encode gate — plausible English digraph merges,
    * rank order significant. Literal so the SQL oracle can embed the
    * identical list as nested single-pass `replace` calls.
    */
  val DefaultMerges: Seq[(String, String)] = Seq(
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("an", "d"),
    ("e", "r"), ("o", "r"), ("r", "e"), ("s", "t"), ("a", "t"),
    ("e", "n"), ("o", "n"), ("o", "u"), ("a", "r"), ("in", "g"),
    ("s", "p"), ("sp", "ar"), ("spar", "k"), ("t", "a"), ("ta", "b"),
    ("l", "e"), ("tab", "le"), ("q", "u"), ("qu", "er"), ("quer", "y"))

  // --------------------------------------------------------------------
  // Unigram language-model tokenizer (Kudo 2018, public algorithm) —
  // the third major subword family next to BPE and WordPiece: pieces
  // carry -log-probabilities and a word's tokenization is the MIN-COST
  // segmentation (Viterbi), not a greedy or merge-ordered one.
  // --------------------------------------------------------------------

  /** Derive a unigram piece vocabulary with integer micro-unit costs
    * from a distinct-word frequency table: count every substring of
    * length 1..`maxPieceLen` weighted by word frequency (one map-side-
    * combined aggregation over the word table — the corpus itself is
    * never rescanned, the same Heaps'-law budget as [[bpeTrain]]), keep
    * ALL single characters (segmentation stays total) plus the
    * `topMulti` heaviest multi-character pieces under a total
    * deterministic order (count DESC, piece ASC), and price each kept
    * piece at `round(-ln(count/total) * 1e6)` — integer micro-costs so
    * DP sums compare exactly in both engines. Only the bounded vocab
    * (charset + topMulti rows) reaches the driver.
    */
  def unigramVocabCosts(
      wordFreq: DataFrame, maxPieceLen: Int, topMulti: Int): Seq[(String, Long)] = {
    val pieces = wordFreq
      .select(col("word"), col("freq"),
        explode(sequence(lit(1), length(col("word")))).as("i"))
      .select(col("word"), col("freq"), col("i"),
        explode(sequence(lit(1), lit(maxPieceLen))).as("l"))
      .filter(col("i") + col("l") - lit(1) <= length(col("word")))
      .select(expr("substr(word, i, l)").as("piece"), col("freq"))
      .groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))
    val chars = pieces.filter(length(col("piece")) === 1)
      .orderBy(col("piece"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val multi = pieces.filter(length(col("piece")) > 1)
      .orderBy(col("cnt").desc, col("piece")).limit(topMulti)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val kept = chars ++ multi
    val total = kept.map(_._2).sum.toDouble
    kept.toSeq.map { case (p, c) =>
      p -> math.round(-math.log(c.toDouble / total) * 1e6)
    }
  }

  /** Min-cost (Viterbi) segmentation of one word under micro-unit piece
    * costs: `dp[j]` = cheapest way to cover the first `j` characters.
    * Ties on cost break to FEWER pieces, making the optimum value pair
    * unique so a SQL path-enumeration oracle reproduces it exactly.
    * Returns (total cost, piece count); single characters in the vocab
    * guarantee feasibility.
    */
  def viterbiSegment(
      word: String, costs: Map[String, Long], maxPieceLen: Int): (Long, Int) = {
    val n = word.length
    val Inf = Long.MaxValue
    val dpCost = Array.fill(n + 1)(Inf)
    val dpPieces = Array.fill(n + 1)(Int.MaxValue)
    dpCost(0) = 0L
    dpPieces(0) = 0
    var j = 1
    while (j <= n) {
      var l = 1
      while (l <= math.min(maxPieceLen, j)) {
        if (dpCost(j - l) != Inf) {
          costs.get(word.substring(j - l, j)).foreach { c =>
            val nc = dpCost(j - l) + c
            val np = dpPieces(j - l) + 1
            if (nc < dpCost(j) || (nc == dpCost(j) && np < dpPieces(j))) {
              dpCost(j) = nc
              dpPieces(j) = np
            }
          }
        }
        l += 1
      }
      j += 1
    }
    (dpCost(n), dpPieces(n))
  }
}
