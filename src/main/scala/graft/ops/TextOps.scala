package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines.
  *
  * Everything here is pure `org.apache.spark.sql.functions` composition —
  * whole-stage-codegen'd column expressions, no UDFs — so the operators
  * run at scan speed and survive a 100 TB corpus: each is an
  * embarrassingly parallel per-row projection with no shuffle.
  */
object TextOps {

  /** Whitespace tokenization (single-space corpus convention). */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: alnum runs + standalone punctuation (one
    * unit per non-alnum, non-space character), the usual pre-tokenizer
    * regex shape. Whitespace separates but is not itself a unit.
    */
  def subwordCount(text: Column): Column =
    size(filter(split(text, "(?<=[^A-Za-z0-9])|(?=[^A-Za-z0-9])"),
      c => length(trim(c)) > 0))

  val DefaultStopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in")

  def stopwordCount(text: Column, stops: Seq[String] = DefaultStopwords): Column =
    size(filter(tokens(text), t => t.isInCollection(stops)))

  /** Quality scoring: token/char stats with ratios as one final double
    * division of exact integers (deterministic across engines).
    */
  def qualityColumns(text: Column): Seq[(String, Column)] = {
    val n = tokenCount(text)
    val chars = length(text)
    val stops = stopwordCount(text)
    val uniq = size(array_distinct(tokens(text)))
    Seq(
      "n_tokens" -> n,
      "n_chars" -> chars,
      "n_stopwords" -> stops,
      "n_unique_tokens" -> uniq,
      "stopword_ratio" -> stops.cast("double") / n,
      "type_token_ratio" -> uniq.cast("double") / n,
      "avg_token_len" -> (chars - n + 1).cast("double") / n)
  }

  /** Language-ID heuristic: script-range detection first (CJK ⇒ zh-ish,
    * Cyrillic ⇒ ru-ish, accented Latin ⇒ romance), then stopword-profile
    * ratio for Latin text — the standard cheap n-gram/stopword cascade.
    * Pure codegen'd expression; no model, no UDF.
    */
  def langIdHeuristic(text: Column): Column = {
    val t = lower(text)
    when(t.rlike("[\\u4e00-\\u9fff]"), "zh")
      .when(t.rlike("[\\u0400-\\u04ff]"), "ru")
      .when(t.rlike("[áéíóúñ¿¡]"), "es")
      .when(stopwordCount(t).cast("double") / tokenCount(t) > 0.02, "en")
      .otherwise("unknown")
  }

  /** Canonical-form document fingerprint: md5 of the lowercased,
    * whitespace-collapsed text. Stable across engines (DuckDB md5 ==
    * Spark md5), the basis for exact dedup.
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(text), "\\s+", " "))

  /** Rolling (Karp-Rabin-style) shingle fingerprints: xxhash64 of each
    * k-token window. One row per shingle after explode; the raw material
    * for MinHash signatures and n-gram Jaccard.
    */
  def shingles(text: Column, k: Int): Column = {
    val toks = tokens(text)
    val n = size(toks)
    // windows [i, i+k) for i in 0 .. n-k  (sequence() is codegen'd).
    // A document shorter than k tokens has NO k-shingle: without the
    // n >= k gate it would emit its whole text as one "shingle", making
    // two identical 3-token docs jaccard-1 near-dups that any k=5 oracle
    // excludes.
    when(n >= k,
      filter(
        transform(sequence(lit(0), n - k),
          i => concat_ws(" ", slice(toks, i + 1, lit(k)))),
        s => length(s) > 0))
      .otherwise(array().cast("array<string>"))
  }

  def shingleHashes(text: Column, k: Int): Column =
    transform(shingles(text, k), s => xxhash64(s))

  /** Sliding-window chunking: word-window starts every `stride` tokens,
    * each chunk = up to `window` tokens from its start — the step that
    * turns long documents into overlapping context-window pieces. Pure
    * codegen'd expressions (`sequence`/`slice`), no shuffle, no UDF;
    * chunk count per doc is ceil(len/stride) so output size is linear in
    * corpus token count. Returns an array of (start, chunk-text) structs
    * to be `posexplode`d by the caller.
    */
  def chunkWindows(text: Column, window: Int, stride: Int): Column = {
    require(window >= 1 && stride >= 1, "window and stride must be positive")
    val toks = tokens(text)
    transform(
      sequence(lit(0), greatest(size(toks) - 1, lit(0)), lit(stride)),
      start => struct(
        start.as("start"),
        concat_ws(" ", slice(toks, start + 1, lit(window))).as("chunk")))
  }

  /** Sequence packing (sample packing): assign documents to training
    * "bins" of at most `maxTokens` tokens — the step that turns a
    * filtered corpus into fixed-budget context windows. Packing is
    * inherently sequential, so it is sharded: documents split into
    * `numShards` shards by a salted md5 draw on the id (the
    * [[hexShard]] family), then pack next-fit in md5 order within each
    * shard. Shard and order derive only from (id, salt) — never from
    * the physical partitioning — so the same bins materialize on any
    * cluster, any input layout, any engine with md5, which is what
    * makes a 100 TB packing run replayable (and oracle-able in SQL).
    * Parallelism is numShards (pick ≈ cluster cores at scale; one hash
    * shuffle on the shard key, then an O(shard rows) fold per shard
    * with zero cross-shard coordination). A document larger than
    * `maxTokens` overflows whatever bin is open and gets a bin of its
    * own. bin_id = shard << 32 | per-shard bin index.
    *
    * Output: (`idCol`, bin_id, doc_tokens).
    */
  def packSequences(
      df: org.apache.spark.sql.DataFrame, idCol: String, tokenCol: String,
      maxTokens: Long, numShards: Int = 16, salt: String = "pack")
      : org.apache.spark.sql.DataFrame = {
    require(maxTokens > 0, "maxTokens must be positive")
    require(numShards > 0 && numShards <= (1 << 20), "numShards in (0, 2^20]")
    val spark = df.sparkSession
    import spark.implicits._
    val ord = md5(concat(col(idCol).cast("string"), lit(salt)))
    val keyed = df.select(
      col(idCol).cast("long").as("_id"), col(tokenCol).cast("long").as("_n"),
      (conv(substring(ord, 1, 8), 16, 10).cast("long") % numShards)
        .cast("int").as("_shard"),
      ord.as("_ord"))
    // Several shards may hash into one partition; the fold resets its
    // state on every shard-key change, so correctness never depends on
    // the shard→partition placement. Typed mapPartitions (not .rdd)
    // keeps the pass inside the Dataset planner and stream-reusable.
    keyed
      .repartition(col("_shard"))
      .sortWithinPartitions(col("_shard"), col("_ord"), col("_id"))
      .as[(Long, Long, Int, String)]
      .mapPartitions { rows =>
        var cur = -1L; var bin = 0L; var used = 0L
        rows.map { case (id, n, shard, _) =>
          if (shard.toLong != cur) { cur = shard.toLong; bin = 0L; used = n }
          else if (used + n > maxTokens) { bin += 1; used = n }
          else used += n
          (id, (shard.toLong << 32) | bin, n)
        }
      }
      .toDF(idCol, "bin_id", "doc_tokens")
  }

  /** Deterministic sampling predicate: keep a row iff the md5 of its key
    * (+ salt) falls below the rate threshold in hex space. Unlike
    * `df.sample(seed)` this is engine- and partitioning-independent —
    * the same rows are selected on any cluster, any engine with md5, any
    * re-run — which is what reproducible training-data subsets require.
    * Rate is quantized to 2^-32; `salt` varies the draw.
    */
  def deterministicSample(key: Column, rate: Double, salt: String = ""): Column = {
    require(rate >= 0.0 && rate <= 1.0, "rate must be in [0, 1]")
    val threshold = f"${math.round(rate * 0xFFFFFFFFL)}%08x"
    substring(md5(concat(key.cast("string"), lit(salt))), 1, 8) < lit(threshold)
  }

  /** Deterministic 16-way shard assignment from the same engine-
    * independent md5 draw as [[deterministicSample]]: one hex digit of
    * the salted key hash. Shard membership reproduces on any cluster,
    * any engine, any re-run — the property a training-shard layout needs
    * so that re-materializing shard 11 tomorrow yields the same
    * documents. Uniform to md5 quality, evaluated at scan speed, and the
    * downstream write is one hash-shuffle on a 16-value key.
    */
  def hexShard(key: Column, salt: String = ""): Column =
    conv(substring(md5(concat(key.cast("string"), lit(salt))), 8, 1), 16, 10)
      .cast("int")

  /** Stratified deterministic sampling — the dataset-mixing primitive: a
    * per-stratum keep rate (e.g. up-sample books, down-sample crawl)
    * applied with the same engine-independent md5 draw as
    * [[deterministicSample]], so a mixing recipe reproduces row-for-row
    * on any cluster or engine. Unknown strata fall back to
    * `defaultRate`. Rates are quantized to 2^-32; the per-stratum
    * thresholds fold into one codegen'd CASE — no join, no shuffle,
    * evaluated at scan speed.
    */
  def stratifiedSample(
      key: Column, strata: Column, rates: Map[String, Double],
      defaultRate: Double = 0.0, salt: String = ""): Column = {
    (rates.values.toSeq :+ defaultRate).foreach(r =>
      require(r >= 0.0 && r <= 1.0, s"rates must be in [0, 1], got $r"))
    def thr(r: Double) = f"${math.round(r * 0xFFFFFFFFL)}%08x"
    val threshold = rates.toSeq.sortBy(_._1).foldLeft(lit(thr(defaultRate))) {
      case (acc, (s, r)) => when(strata === s, lit(thr(r))).otherwise(acc)
    }
    substring(md5(concat(key.cast("string"), lit(salt))), 1, 8) < threshold
  }

  /** Temperature-based dataset mixture sampling — the multilingual /
    * multi-source rebalancing step of a training-data pipeline: with
    * per-stratum keep rate `min(1, scale/sqrt(n_s))` the sampled mix
    * follows `n_s^0.5` (temperature α = 0.5 — rare strata up-weighted
    * relative to their share, dominant strata capped), the draw being
    * the same engine/partitioning-independent md5 threshold as
    * [[deterministicSample]]. Unlike [[stratifiedSample]]'s literal
    * recipe, the rates here are DATA-DEPENDENT (derived from the
    * observed stratum counts in the same query), so re-mixing after an
    * upstream filter needs no recipe recomputation.
    *
    * α is fixed at 0.5 because every step — sqrt, divide, multiply,
    * round — is an IEEE-754 correctly-rounded primitive, making the
    * per-stratum threshold (and therefore the sampled set) bit-identical
    * on any engine; a general `pow(n, α-1)` is not correctly rounded and
    * would make the cut row-dependent on libm.
    *
    * One count aggregate + a broadcast of (stratum → threshold); the
    * filter itself is a codegen'd scan-speed predicate.
    */
  def temperatureMixSample(
      df: org.apache.spark.sql.DataFrame, keyCol: String, strataCol: String,
      scale: Double = 3.0, salt: String = ""): org.apache.spark.sql.DataFrame = {
    require(scale > 0.0, "scale must be positive")
    val thresholds = df.groupBy(col(strataCol)).agg(count(lit(1)).as("_n"))
      .select(col(strataCol),
        format_string("%08x",
          round(least(lit(1.0), lit(scale) / sqrt(col("_n"))) * 4294967295.0)
            .cast("long")).as("_thr"))
    df.join(broadcast(thresholds), Seq(strataCol))
      .filter(substring(md5(concat(col(keyCol).cast("string"), lit(salt))), 1, 8)
        < col("_thr"))
      .drop("_thr")
  }

  /** Epoch-mixture materialization — the REPLICATION half of dataset
    * mixing, which sampling cannot express: a recipe of per-stratum
    * epoch FACTORS (books ×2.5, crawl ×0.3 — the standard way a
    * training mix up-weights scarce high-quality sources across
    * epochs) expands each document into `floor(f)` copies plus one
    * more iff its salted md5 draw falls below `frac(f)`, every copy
    * carrying a 1-based `epoch` index. A stratum's expected output is
    * exactly `f·n_s`, and the fractional draw is the same
    * engine/partitioning-independent md5 threshold as
    * [[deterministicSample]], so the materialized mix reproduces
    * row-for-row on any cluster or engine. Unknown strata fall back to
    * `defaultFactor`; a factor of 0 drops the stratum.
    *
    * Scale shape: no shuffle, no join — two codegen'd CASE chains pick
    * the whole/fractional parts and one `explode(sequence)`
    * materializes the copies at scan speed. Output size is the
    * recipe's own Σ f_s·n_s (the intended training-set size); at
    * 100 TB the expansion is usually fused straight into the shard
    * writer ([[hexShard]]) so replicas never exist as an intermediate.
    */
  def epochExpand(
      df: org.apache.spark.sql.DataFrame, keyCol: String, strataCol: String,
      factors: Map[String, Double], defaultFactor: Double = 1.0,
      salt: String = ""): org.apache.spark.sql.DataFrame = {
    (factors.values.toSeq :+ defaultFactor).foreach(f =>
      require(f >= 0.0, s"factors must be non-negative, got $f"))
    def whole(f: Double): Long = math.floor(f).toLong
    def thr(f: Double): String =
      f"${math.round((f - math.floor(f)) * 0xFFFFFFFFL)}%08x"
    val ordered = factors.toSeq.sortBy(_._1)
    val base = ordered.foldLeft(lit(whole(defaultFactor))) {
      case (acc, (s, f)) => when(col(strataCol) === s, lit(whole(f))).otherwise(acc)
    }
    val fracThr = ordered.foldLeft(lit(thr(defaultFactor))) {
      case (acc, (s, f)) => when(col(strataCol) === s, lit(thr(f))).otherwise(acc)
    }
    val extra = when(
      substring(md5(concat(col(keyCol).cast("string"), lit(salt))), 1, 8) < fracThr,
      lit(1L)).otherwise(lit(0L))
    df.withColumn("_n_epochs", base.cast("long") + extra)
      .filter(col("_n_epochs") >= 1L)
      .withColumn("epoch", explode(sequence(lit(1L), col("_n_epochs"))))
      .drop("_n_epochs")
  }

  /** Deterministic training-order materialization — curriculum
    * ordering: a global position for every document, sorted by a
    * difficulty bucket first (easy → hard across training) and a
    * salted md5 draw within the bucket (so same-difficulty docs are
    * shuffled, reproducibly), plus a round-robin shard stripe so each
    * shard preserves the curriculum. The order key ends with the id,
    * making the order TOTAL — the same (pos, shard) on any cluster,
    * any partitioning, any re-run.
    *
    * The usual way to materialize a global rank —
    * `row_number() OVER (ORDER BY …)` — funnels the whole corpus
    * through ONE window task. This instead uses a range repartition +
    * sort-within-partitions (a total order across range-ordered
    * partitions) and `zipWithIndex` (per-partition counts + a
    * driver-side prefix sum — O(partitions) driver work), the same
    * fully-parallel rank machinery as the executor's ordered chunking
    * (`MigrationExecutor.executeChunked`). Batch-only by nature: a
    * global order needs the whole corpus (and rides `.rdd`).
    */
  def trainOrder(
      df: org.apache.spark.sql.DataFrame, idCol: String, difficulty: Column,
      numShards: Int, salt: String = ""): org.apache.spark.sql.DataFrame = {
    require(numShards >= 1, s"numShards must be >= 1, got $numShards")
    val spark = df.sparkSession
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val keyed = df.select(col(idCol), difficulty.cast("long").as("bucket"),
      md5(concat(col(idCol).cast("string"), lit(salt))).as("_ord"))
    val ordered = keyed
      .repartitionByRange(col("bucket"), col("_ord"), col(idCol))
      .sortWithinPartitions(col("bucket"), col("_ord"), col(idCol))
    val schema = StructType(ordered.schema.fields :+ StructField("pos", LongType))
    spark.createDataFrame(
        ordered.rdd.zipWithIndex().map { case (r, i) => Row.fromSeq(r.toSeq :+ i) },
        schema)
      .withColumn("shard", (col("pos") % numShards).cast("int"))
      .drop("_ord")
  }

  /** Quality-budget data selection — the data-constrained-scaling
    * primitive ("train on the best N tokens"): keep documents in
    * descending `score` order (salted md5 then id as tiebreaks, making
    * the order TOTAL and the selection engine-reproducible) while the
    * inclusive running `weight` sum stays within `budget`.
    *
    * The global running sum uses the same fully-parallel machinery as
    * [[trainOrder]]: range repartition on the order key + in-partition
    * sort, then per-partition weight totals (O(partitions) rows to the
    * driver) prefix-summed into partition offsets, each partition
    * accumulating locally from its offset. Two scale properties beyond
    * correctness: a partition whose offset already exceeds the budget
    * emits NOTHING without deserializing a row, and in-partition
    * accumulation stops at the first overflow (weights are
    * non-negative, so the running sum is monotone) — post-shuffle work
    * scales with the KEPT prefix, not the corpus. Batch-only (a global
    * order needs the whole corpus; rides `.rdd` like [[trainOrder]]).
    *
    * `score` is used AS GIVEN, any orderable type — a fractional
    * classifier probability keeps its full precision in the order (no
    * silent integer quantization; [[trainOrder]]'s long cast is a
    * deliberate bucket, this is a rank). Null weights count as 0;
    * weights must be non-negative (token counts are) — a negative
    * weight would break the monotone early-stop. Callers supply a
    * non-null `score`.
    * Output: (idCol, score, n_tokens, cum_tokens), cum_tokens ≤ budget.
    */
  def budgetSelect(
      df: org.apache.spark.sql.DataFrame, idCol: String,
      score: Column, weight: Column, budget: Long,
      salt: String = ""): org.apache.spark.sql.DataFrame = {
    require(budget >= 0, s"budget must be non-negative, got $budget")
    val spark = df.sparkSession
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val keyed = df.select(col(idCol), score.as("score"),
      coalesce(weight.cast("long"), lit(0L)).as("n_tokens"),
      md5(concat(col(idCol).cast("string"), lit(salt))).as("_ord"))
    val ordered = keyed
      .repartitionByRange(col("score").desc, col("_ord"), col(idCol))
      .sortWithinPartitions(col("score").desc, col("_ord"), col(idCol))
    val rdd = ordered.rdd
    // pass 1: per-partition totals (the shuffle is reused by pass 2)
    val sums = rdd.mapPartitionsWithIndex { case (pi, it) =>
      var s = 0L; it.foreach(s += _.getLong(2)); Iterator(pi -> s)
    }.collect().sortBy(_._1).map(_._2)
    val offsets = spark.sparkContext.broadcast(sums.scanLeft(0L)(_ + _))
    val b = budget
    val schema = StructType(ordered.schema.fields :+ StructField("cum_tokens", LongType))
    spark.createDataFrame(
        rdd.mapPartitionsWithIndex { case (pi, it) =>
          var acc = offsets.value(pi)
          if (acc > b) Iterator.empty
          else it.map { r => acc += r.getLong(2); Row.fromSeq(r.toSeq :+ acc) }
            .takeWhile(_.getLong(4) <= b)
        }, schema)
      .drop("_ord")
  }

  // PII patterns chosen to behave identically under Java regex (Spark)
  // and RE2 (DuckDB): no lookarounds, no backrefs.
  val UrlPattern = "https?://[^ ]+"
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** PII/safety scrubbing: URLs, email addresses and IPv4 literals
    * replaced with typed placeholders — the standard pre-training
    * redaction pass. URL first (emails/IPs inside URLs vanish with the
    * URL), then email, then IP. Pure codegen'd regexp_replace chain.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, UrlPattern, "[URL]"),
        EmailPattern, "[EMAIL]"),
      Ipv4Pattern, "[IP]")

  /** Main-content text from raw HTML markup — the first transform a
    * web-crawl corpus passes through before any quality/dedup gate.
    * Deliberately the honest regex tier (not a DOM parser): drop
    * non-content BLOCKS with their contents (`<script>`, `<style>`,
    * `<nav>` — code, CSS and chrome never belong in training text),
    * then strip remaining tags to spaces and collapse whitespace.
    * Scan-speed column composition; each step replays as the identical
    * RE2 regex in the oracle.
    */
  def htmlBodyText(html: Column): Column = {
    val noBlocks = Seq("script", "style", "nav").foldLeft(html)((c, t) =>
      regexp_replace(c, s"(?s)<$t[^>]*>.*?</$t>", " "))
    trim(regexp_replace(regexp_replace(noBlocks, "<[^>]+>", " "), "\\s+", " "))
  }

  /** All `href` targets in the markup (nav chrome included — the link
    * graph wants every edge even where the text extractor drops the
    * anchor's block). One vectorized regexp pass.
    */
  def htmlLinks(html: Column): Column =
    regexp_extract_all(html, lit("href=\"([^\"]+)\""), lit(1))

  /** Query parameters dropped by [[canonicalizeUrl]]: the standard
    * tracking/click-id families whose presence forks one logical page
    * into unbounded distinct URLs in a web crawl.
    */
  val TrackingParamPattern = "^(utm_[^=]*|gclid|fbclid|msclkid|ref)="

  /** Canonical URL — the first stage of every web-corpus pipeline
    * (URL-level exact dedup BEFORE content dedup; cf. CCNet/RefinedWeb):
    *   - fragment stripped (`#…` never reaches the server);
    *   - scheme and host lowercased (RFC 3986 §6.2.2.1 — case-insensitive
    *     there, significant in path/query, which are preserved);
    *   - default port dropped (`:80` for http, `:443` for https — but
    *     KEPT when it is not that scheme's default, e.g. `https://h:80`);
    *   - tracking params ([[TrackingParamPattern]]) removed, remaining
    *     params kept in their original order, `?` dropped when none
    *     survive;
    *   - empty path → `/`, one trailing slash stripped from non-root
    *     paths.
    * Strings without a `scheme://` prefix pass through unchanged
    * (relative references have no host to canonicalize). Pure built-in
    * regexp/split/filter composition — scan-speed, no UDF, and every
    * step replays verbatim as SQL regex in the oracle.
    */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.\\-]*)://", 1))
    val hostport = regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.\\-]*://([^/?]*)", 1)
    val rest = regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.\\-]*://[^/?]*(.*)$", 1)
    val host = lower(regexp_replace(hostport, ":[0-9]+$", ""))
    val port = regexp_extract(hostport, ":([0-9]+)$", 1)
    val keepPort = port =!= "" &&
      !(scheme === "http" && port === "80") &&
      !(scheme === "https" && port === "443")
    val portPart = when(keepPort, concat(lit(":"), port)).otherwise(lit(""))
    val path0 = regexp_extract(rest, "^([^?]*)", 1)
    val stripped = regexp_replace(path0, "/$", "")
    val pathPart = when(stripped === "", lit("/")).otherwise(stripped)
    val params = filter(split(regexp_extract(rest, "\\?(.*)$", 1), "&"),
      p => p =!= "" && !p.rlike(TrackingParamPattern))
    val queryPart = when(size(params) > 0, concat(lit("?"), array_join(params, "&")))
      .otherwise(lit(""))
    when(scheme === "", url)
      .otherwise(concat(scheme, lit("://"), host, portPart, pathPart, queryPart))
  }

  /** Canonical host of an absolute URL ('' for relative references) —
    * the aggregation key for per-host corpus profiles (host-level crawl
    * budgets, quality gates, spam-domain cuts).
    */
  def urlHost(url: Column): Column =
    lower(regexp_replace(
      regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.\\-]*://([^/?]*)", 1),
      ":[0-9]+$", ""))

  /** Per-category PII hit counts (on the raw text, independent of
    * redaction order). */
  def piiCounts(text: Column): Seq[(String, Column)] = Seq(
    "n_urls" -> size(regexp_extract_all(text, lit(UrlPattern), lit(0))).cast("long"),
    "n_emails" -> size(regexp_extract_all(text, lit(EmailPattern), lit(0))).cast("long"),
    "n_ips" -> size(regexp_extract_all(text, lit(Ipv4Pattern), lit(0))).cast("long"))

  /** Repetition ratio: fraction of k-token shingles that are repeats of
    * an earlier shingle in the same document (1 − distinct/total) — the
    * standard boilerplate/template-text signal in corpus quality
    * filtering. 0.0 for docs with no k-shingle. Pure codegen'd column
    * expression: no shuffle, runs at scan speed.
    *
    * Delegates to the native [[graft.functions.RepetitionRatio]]
    * expression: one pass over the raw bytes, no token/slice/hash arrays
    * per document — the composed `transform`+`array_distinct` form spent
    * its time allocating per-window slices (9–12 s vs ~1 s at sf0.1).
    *
    * BEHAVIOR CHANGE vs the pre-native composed form: null text now
    * yields null (standard null-intolerant expression semantics, like
    * `length`/`split`), where the old `when(...).otherwise(0.0)` shape
    * returned 0.0. Callers filtering on the ratio over corpora with
    * null text should `coalesce(ratio, lit(0.0))` if they relied on
    * the old behavior.
    */
  def repetitionRatio(text: Column, k: Int = 3): Column =
    graft.functions.RepetitionRatio(text, k)

  /** Stand-in weight vector for [[hashedLinearScore]]: a deterministic
    * integer ramp over the bucket index. A production pipeline replaces
    * this with trained (quantized) weights; everything else — hashing,
    * scoring, the keep threshold — is the deployment-shaped scorer.
    */
  val DefaultClassifierWeights: Array[Int] =
    Array.tabulate(64)(b => (b * 37) % 21 - 10)

  /** Hashed-feature linear quality classifier — the fastText-style
    * model-based filter tier that complements the rule-based Gopher
    * gate: each token hashes (FNV-1a 64) into one of `weights.length`
    * buckets (power of two, so the bucket is a mask of the hash) and the
    * document's score is the integer sum of its tokens' bucket weights;
    * `keep` is score > 0. Integer weights keep the score exact on any
    * engine or partitioning — a trained float model quantizes its
    * weights the same way int8 embeddings do.
    *
    * One typed pass per document (the hash loop doesn't decompose into
    * codegen-friendly expressions — same trade as SimHash signatures),
    * no shuffle: at 100 TB this runs embarrassingly parallel at scan
    * speed. Output: (id, n_tokens, score, keep 0/1).
    */
  def hashedLinearScore(
      df: org.apache.spark.sql.DataFrame, textCol: String, idCol: String,
      weights: Array[Int] = DefaultClassifierWeights): org.apache.spark.sql.DataFrame = {
    val nB = weights.length
    require(nB > 0 && (nB & (nB - 1)) == 0, "bucket count must be a power of two")
    val spark = df.sparkSession
    import spark.implicits._
    val w = weights
    // streaming inputs can't consult .rdd for the parallelism check (and
    // micro-batch parallelism is the source's concern); batch inputs get
    // the usual small-file spread
    val base = if (df.isStreaming) df else graft.ops.ensureParallelism(df)
    base
      .select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .map { case (id, text) =>
        val toks = text.split(' ')
        var score = 0L
        var i = 0
        while (i < toks.length) {
          score += w((Dedup.fnv1a64(toks(i)) & (nB - 1)).toInt)
          i += 1
        }
        (id, toks.length.toLong, score)
      }
      .toDF(idCol, "n_tokens", "score")
      .withColumn("keep", (col("score") > 0).cast("int"))
  }
}
