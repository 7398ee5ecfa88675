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
}
