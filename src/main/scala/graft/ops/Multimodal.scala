package graft.ops

import java.awt.image.{BufferedImage, DataBufferByte}
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame}

/** Multimodal column handling: image/audio/video as opaque `binary`
  * payloads with typed metadata, plus batched decode/feature-extract
  * plumbing.
  *
  * The IMAGE path is real: PNG/JPEG/BMP/GIF decode via the JDK's
  * `javax.imageio.ImageIO`, nearest-neighbor rescale over the decoded
  * raster, PNG re-encode — no extra libraries, works headless, runs
  * per-partition on executors. The AUDIO path is real too: WAV/PCM
  * decode via `javax.sound.sampled`. VIDEO frame *sampling* keeps a
  * deterministic synthetic decoder (the JDK ships no video codec),
  * disclosed at [[frameSample]]; its row-exploding shape, schema and
  * partition-parallelism are the real contract.
  */
object Multimodal {

  // never spill decode scratch to disk-backed ImageIO cache files on
  // executors — object init runs once per JVM that touches this path
  ImageIO.setUseCache(false)

  val MetadataType: StructType = StructType(Seq(
    StructField("modality", StringType, nullable = false),
    StructField("byte_len", LongType, nullable = false),
    StructField("content_hash", StringType, nullable = false)))

  private def metaFor(modality: String): Column = struct(
    lit(modality).as("modality"),
    octet_length(col("payload")).cast("long").as("byte_len"),
    md5(col("payload")).as("content_hash"))

  /** Wrap a value column as an opaque binary payload + typed metadata —
    * the canonical multimodal row shape (payload stays opaque to SQL;
    * metadata is columnar and filterable/pushdown-friendly).
    */
  def asPayload(df: DataFrame, valueCol: String, modality: String): DataFrame =
    df.withColumn("payload", encode(col(valueCol), "UTF-8"))
      .withColumn("meta", metaFor(modality))

  final case class Feature(width: Int, height: Int, channels: Int, featureNorm: Double)

  // --- real image codec path (JDK ImageIO) -------------------------------

  /** Decode an image payload and measure it: dimensions and channel count
    * from the decoded raster, `featureNorm` = mean sample value over all
    * pixels and bands (a trivial but *real* pixel statistic — the slot a
    * production embedding/feature model plugs into).
    */
  def decodeImage(payload: Array[Byte]): Feature = {
    val img = ImageIO.read(new ByteArrayInputStream(payload))
    require(img != null, "payload is not a decodable image")
    val raster = img.getRaster
    val (w, h, bands) = (img.getWidth, img.getHeight, raster.getNumBands)
    var sum = 0.0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var b = 0
        while (b < bands) { sum += raster.getSample(x, y, b); b += 1 }
        x += 1
      }
      y += 1
    }
    Feature(w, h, bands, sum / (w.toLong * h * bands))
  }

  /** Decode, nearest-neighbor rescale to `targetW`×`targetH`, re-encode
    * as PNG. The sampling loop is explicit (no `Graphics2D` rendering
    * hints) so the output raster is bit-deterministic across JVMs.
    */
  def resizeImage(payload: Array[Byte], targetW: Int, targetH: Int): Array[Byte] = {
    val src = ImageIO.read(new ByteArrayInputStream(payload))
    require(src != null, "payload is not a decodable image")
    val out = new BufferedImage(targetW, targetH, BufferedImage.TYPE_3BYTE_BGR)
    val (sw, sh) = (src.getWidth, src.getHeight)
    var y = 0
    while (y < targetH) {
      val sy = (y.toLong * sh / targetH).toInt
      var x = 0
      while (x < targetW) {
        out.setRGB(x, y, src.getRGB((x.toLong * sw / targetW).toInt, sy))
        x += 1
      }
      y += 1
    }
    encodePng(out)
  }

  private def encodePng(img: BufferedImage): Array[Byte] = {
    val baos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** Deterministic synthetic PNG fixture for id `id`: a solid-gray
    * `(8 + id%13) × (8 + id%7)` 3-channel image with every sample equal
    * to `id % 256`. Real PNG bytes through the real codec, but with
    * decoded dimensions and mean-pixel statistics that are closed-form in
    * `id` — so a SQL oracle with no image library can verify the decode.
    */
  def syntheticPng(id: Long): Array[Byte] = {
    val img = new BufferedImage(
      8 + (id % 13).toInt, 8 + (id % 7).toInt, BufferedImage.TYPE_3BYTE_BGR)
    val data = img.getRaster.getDataBuffer.asInstanceOf[DataBufferByte].getData
    java.util.Arrays.fill(data, (id % 256).toByte)
    encodePng(img)
  }

  /** Materialize a synthetic image corpus keyed by `idCol` — the test
    * stand-in for a real media table, generated partition-parallel on
    * executors (never on the driver).
    */
  def syntheticImages(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    ensureParallelism(df)
      .select(col(idCol).cast("long")).as[Long]
      .mapPartitions(ids => ids.map(id => (id, syntheticPng(id))))
      .toDF(idCol, "payload")
      .withColumn("meta", metaFor("image"))
  }

  /** Resize transform: payload → payload (same row count), metadata
    * recomputed from the new bytes. Decode + rescale + re-encode runs
    * per-partition; one codec context per executor core, rows streamed.
    * Typed mapPartitions (not .rdd): the pass stays a Dataset operator,
    * so the same transform composes with Structured Streaming.
    */
  def resize(df: DataFrame, idCol: String, targetW: Int, targetH: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    ensureParallelism(df)
      .select(col(idCol).cast("long"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        (id, resizeImage(payload, targetW, targetH), targetW, targetH)
      })
      .toDF(idCol, "payload", "width", "height")
      .withColumn("meta", metaFor("image"))
  }

  /** Batched per-partition decode/feature-extract — the Scala analogue of
    * an Arrow-batched decode UDF: decode through the JDK codec, rows
    * streamed per partition, output schema declared up front.
    */
  def extractFeatures(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    ensureParallelism(df)
      .select(col(idCol).cast("long"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        val f = decodeImage(payload)
        (id, f.width, f.height, f.channels, f.featureNorm)
      })
      .toDF(idCol, "width", "height", "channels", "feature_norm")
  }

  /** 64-bit average hash (aHash) of an image payload — the perceptual
    * fingerprint tier of image dedup: decode (real codec), nearest-
    * neighbor downsample to 8×8 (same index mapping as [[resizeImage]]),
    * threshold each sample against the 8×8 mean (strict >; 64 is a power
    * of two so the mean is an exact double), one bit per cell in
    * row-major order. Near-duplicate images agree on most bits, so a
    * banded-Hamming join like SimHash's finds them without all-pairs.
    */
  /** Decode + 8×8 nearest-neighbor downsample (channel 0), the shared
    * front half of every perceptual hash here.
    */
  private def grid8(payload: Array[Byte]): Array[Int] = {
    val src = ImageIO.read(new ByteArrayInputStream(payload))
    require(src != null, "payload is not a decodable image")
    val raster = src.getRaster
    val (sw, sh) = (src.getWidth, src.getHeight)
    val g = new Array[Int](64)
    var y = 0
    while (y < 8) {
      val sy = (y.toLong * sh / 8).toInt
      var x = 0
      while (x < 8) {
        g(y * 8 + x) = raster.getSample((x.toLong * sw / 8).toInt, sy, 0)
        x += 1
      }
      y += 1
    }
    g
  }

  def averageHash(payload: Array[Byte]): Long = {
    val g = grid8(payload)
    var sum = 0L
    var i = 0
    while (i < 64) { sum += g(i); i += 1 }
    val mean = sum / 64.0
    var h = 0L
    i = 0
    while (i < 64) { if (g(i) > mean) h |= (1L << i); i += 1 }
    h
  }

  /** 64-bit Walsh–Hadamard perceptual hash — the transform-domain
    * sibling of [[averageHash]] (pHash family). The 8×8 grid is
    * projected onto the 63 non-DC Walsh basis functions (sign at cell
    * `i` for basis `u` = parity of popcount(i & u)); each hash bit
    * records its coefficient's sign. Unlike a cosine-basis pHash, the
    * ±1 basis is integer-exact end to end, so the SQL oracle replays
    * the transform with bit_count arithmetic — no float threshold to
    * flip a bit cross-engine. Bit 0 (the always-positive DC term) is
    * left clear.
    */
  def walshHash(payload: Array[Byte]): Long = {
    val g = grid8(payload)
    var h = 0L
    var u = 1
    while (u < 64) {
      var c = 0L
      var i = 0
      while (i < 64) {
        c += (if ((Integer.bitCount(i & u) & 1) == 0) g(i) else -g(i))
        i += 1
      }
      if (c > 0) h |= (1L << u)
      u += 1
    }
    h
  }

  /** Per-partition wHash extraction, unsigned 32-bit halves like
    * [[imageHashes]].
    */
  def walshHashes(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    ensureParallelism(df)
      .select(col(idCol).cast("long"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        val h = walshHash(payload)
        (id, h >>> 32, h & 0xFFFFFFFFL)
      })
      .toDF(idCol, "whash_hi", "whash_lo")
  }

  /** Per-partition aHash extraction; the hash is emitted as two unsigned
    * 32-bit halves so integer-exact SQL oracles never touch bit 63's
    * sign.
    */
  def imageHashes(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    ensureParallelism(df)
      .select(col(idCol).cast("long"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        val h = averageHash(payload)
        (id, h >>> 32, h & 0xFFFFFFFFL)
      })
      .toDF(idCol, "ahash_hi", "ahash_lo")
  }

  /** Perceptual near-duplicate image pairs — image dedup at corpus
    * scale: every clip's 64-bit average hash is split into 4×16-bit
    * BANDS, and candidates join on (band index, band value) — by
    * pigeonhole, any pair within Hamming distance 3 differs in at most
    * 3 bands and so MUST share one, making the banded join lossless for
    * the ≤3 threshold while hashing-disjoint images never meet (the
    * SimHash band trick applied to the image modality). Candidates are
    * then verified exactly with two XOR popcounts. The shuffle key is
    * the band, so cost tracks near-duplicate density, never N².
    */
  def nearDuplicateImages(df: DataFrame, idCol: String,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming < 4, "4 bands of 16 bits are lossless only for hamming <= 3")
    val h = imageHashes(df, idCol)
    val bands = h.select(col(idCol), explode(array(
        struct(lit(0).as("b"), expr("ahash_lo % 65536").as("v")),
        struct(lit(1).as("b"), expr("ahash_lo div 65536").as("v")),
        struct(lit(2).as("b"), expr("ahash_hi % 65536").as("v")),
        struct(lit(3).as("b"), expr("ahash_hi div 65536").as("v")))).as("band"))
      .select(col(idCol), col("band.b").as("b"), col("band.v").as("v"))
    val cand = bands.select(col(idCol).as("a"), col("b"), col("v"))
      .join(bands.select(col(idCol).as("bb"), col("b"), col("v")), Seq("b", "v"))
      .filter(col("a") < col("bb"))
      .select(col("a"), col("bb").as("b_id")).distinct()
    cand
      .join(h.select(col(idCol).as("a"), col("ahash_hi").as("ha"),
        col("ahash_lo").as("la")), Seq("a"))
      .join(h.select(col(idCol).as("b_id"), col("ahash_hi").as("hb"),
        col("ahash_lo").as("lb")), Seq("b_id"))
      .withColumn("hamming",
        bit_count(expr("ha ^ hb")) + bit_count(expr("la ^ lb")))
      .filter(col("hamming") <= maxHamming)
      .select(col("a"), col("b_id").as("b"), col("hamming"))
  }

  /** Gradient twin of [[syntheticPng]]: same `(8 + id%13) × (8 + id%7)`
    * geometry, but sample value `(id + 7x + 13y) % 256` at pixel (x, y)
    * on every channel — non-constant content, so downstream perceptual
    * hashes have real bit structure while staying closed-form in
    * `(id, x, y)` for a codec-less SQL oracle.
    */
  def syntheticGradientPng(id: Long): Array[Byte] = {
    val w = 8 + (id % 13).toInt
    val h = 8 + (id % 7).toInt
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = ((id + 7L * x + 13L * y) % 256).toInt
        var b = 0
        while (b < 3) { raster.setSample(x, y, b, v); b += 1 }
        x += 1
      }
      y += 1
    }
    encodePng(img)
  }

  /** Gradient-fixture corpus, like [[syntheticImages]]. */
  def syntheticGradientImages(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    ensureParallelism(df)
      .select(col(idCol).cast("long")).as[Long]
      .mapPartitions(ids => ids.map(id => (id, syntheticGradientPng(id))))
      .toDF(idCol, "payload")
      .withColumn("meta", metaFor("image"))
  }

  // --- real audio codec path (JDK javax.sound.sampled, WAV/PCM) ---------

  final case class AudioFeature(
      sampleRate: Int, channels: Int, nSamples: Long, meanAbsAmplitude: Double)

  /** Decode a WAV payload and measure it: format from the header, mean
    * absolute 16-bit sample amplitude from the decoded PCM stream — the
    * real JDK codec (`javax.sound.sampled`), same contract shape as
    * [[decodeImage]]. Little-endian signed 16-bit PCM only, which is what
    * [[syntheticWav]] emits and what WAV overwhelmingly carries.
    */
  def decodeWav(payload: Array[Byte]): AudioFeature = {
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new ByteArrayInputStream(payload))
    try {
      val fmt = in.getFormat
      require(fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian,
        s"expected 16-bit little-endian PCM, got $fmt")
      val bytes = in.readAllBytes()
      var sum = 0.0
      var i = 0
      while (i + 1 < bytes.length) {
        val s = ((bytes(i + 1) << 8) | (bytes(i) & 0xff)).toShort
        sum += math.abs(s.toInt)
        i += 2
      }
      val nFrames = bytes.length / (2L * fmt.getChannels)
      AudioFeature(fmt.getSampleRate.toInt, fmt.getChannels, nFrames,
        if (bytes.length < 2) 0.0 else sum / (bytes.length / 2))
    } finally in.close()
  }

  /** Deterministic synthetic WAV fixture for id `id`: mono 16-bit PCM at
    * 8 kHz, `1000 + id%512` frames of the constant amplitude `id % 1000`.
    * Real RIFF/WAV bytes through the real encoder, with closed-form
    * decoded statistics — the audio twin of [[syntheticPng]].
    */
  def syntheticWav(id: Long): Array[Byte] = {
    val n = 1000 + (id % 512).toInt
    val amp = (id % 1000).toShort
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      pcm(2 * i) = (amp & 0xff).toByte
      pcm(2 * i + 1) = ((amp >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val stream = new javax.sound.sampled.AudioInputStream(
      new ByteArrayInputStream(pcm), fmt, n.toLong)
    val baos = new ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      stream, javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  /** Deterministic synthetic speech-patterned WAV for id `id`: mono
    * 16-bit PCM at 8 kHz, `24 + id%13` frames of 160 samples (20 ms)
    * where frame `f` is "speech" (constant amplitude `1000 + id%500`)
    * iff `(id + f) % 3 != 0` and near-silence (amplitude 10) otherwise
    * — a 2-voiced/1-silent cadence whose per-frame energies have closed
    * form, so the VAD verdict is oracle-replayable while the bytes
    * still round-trip the real RIFF/WAV codec.
    */
  def syntheticSpeechWav(id: Long): Array[Byte] = {
    val frames = 24 + (id % 13).toInt
    val perFrame = 160
    val pcm = new Array[Byte](frames * perFrame * 2)
    var f = 0
    while (f < frames) {
      val amp = (if ((id + f) % 3 != 0) 1000 + (id % 500) else 10L).toShort
      var i = 0
      while (i < perFrame) {
        val off = (f * perFrame + i) * 2
        pcm(off) = (amp & 0xff).toByte
        pcm(off + 1) = ((amp >> 8) & 0xff).toByte
        i += 1
      }
      f += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val stream = new javax.sound.sampled.AudioInputStream(
      new ByteArrayInputStream(pcm), fmt, frames.toLong * perFrame)
    val baos = new ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      stream, javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  /** The deterministic "melody" of track `id` at absolute frame `f`:
    * a nonlinear (quadratic-in-f with an id-dependent linear term)
    * note sequence in [0, 8000) — nonlinearity matters, because a
    * LINEAR note formula makes every track a time-shift alias of every
    * other and constellation matching degenerates. Closed form, so the
    * oracle replays the whole fingerprint pipeline by modular
    * arithmetic while Spark decodes real RIFF/WAV bytes.
    */
  def melodyNote(id: Long, f: Int): Int =
    ((id * 7 + f.toLong * f * 13 + (id % 31) * f) % 8000).toInt

  /** Synthetic melody WAV: mono 16-bit PCM at 8 kHz, `nFrames` frames
    * of 160 samples (20 ms), frame j carrying the constant amplitude
    * [[melodyNote]](id, from + j) — ABSOLUTE frame indexing, so a clip
    * (`from` > 0) is byte-for-byte an excerpt of its track's waveform.
    * Constant-amplitude frames make the decoded per-frame mean
    * |amplitude| recover the note EXACTLY through the real codec.
    */
  def syntheticMelodyWav(id: Long, from: Int, nFrames: Int): Array[Byte] = {
    val perFrame = 160
    val pcm = new Array[Byte](nFrames * perFrame * 2)
    var j = 0
    while (j < nFrames) {
      val amp = melodyNote(id, from + j).toShort
      var i = 0
      while (i < perFrame) {
        val off = (j * perFrame + i) * 2
        pcm(off) = (amp & 0xff).toByte
        pcm(off + 1) = ((amp >> 8) & 0xff).toByte
        i += 1
      }
      j += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val stream = new javax.sound.sampled.AudioInputStream(
      new ByteArrayInputStream(pcm), fmt, nFrames.toLong * perFrame)
    val baos = new ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      stream, javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  /** Full melody tracks keyed by `idCol`: 20 + id%5 frames from 0. */
  def syntheticMelodies(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    ensureParallelism(df)
      .select(col(idCol).cast("long")).as[Long]
      .mapPartitions(_.map(id =>
        (id, syntheticMelodyWav(id, 0, 20 + (id % 5).toInt))))
      .toDF(idCol, "payload")
      .withColumn("meta", metaFor("audio"))
  }

  /** 8-frame query clips keyed by `idCol`: an excerpt of the SAME id's
    * track starting at frame id%8 (within every track length — tracks
    * have ≥ 20 frames). The retrieval question "which track, at what
    * offset" has the known answer (id, id%8).
    */
  def syntheticMelodyClips(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    ensureParallelism(df)
      .select(col(idCol).cast("long")).as[Long]
      .mapPartitions(_.map(id =>
        (id, syntheticMelodyWav(id, (id % 8).toInt, 8))))
      .toDF(idCol, "payload")
      .withColumn("meta", metaFor("audio"))
  }

  /** Constellation landmark extraction (the Shazam shape, on this
    * engine's deterministic terms): decode the WAV, recover each 20 ms
    * frame's note as its mean |amplitude| (exact for constant-amplitude
    * frames), and emit one landmark per anchor/target pair within
    * `maxDt` frames — hash = note₁·24000 + note₂·3 + (Δt−1), anchored
    * at the pair's first frame time. Runs per-partition over the opaque
    * payload column like every decode op here: no driver traffic, no
    * UDF; output is the (id, t, h) landmark table both the index side
    * and the query side of matching consume. O(frames · maxDt)
    * landmarks per clip — the index grows linearly with audio hours.
    */
  def audioLandmarks(df: DataFrame, idCol: String,
      frameSamples: Int = 160, maxDt: Int = 3): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    ensureParallelism(df)
      .select(col(idCol).cast("long"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, payload) =>
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new ByteArrayInputStream(payload))
        val bytes = try in.readAllBytes() finally in.close()
        val nFrames = bytes.length / 2 / frameSamples
        val notes = new Array[Long](nFrames)
        var f = 0
        while (f < nFrames) {
          var sum = 0L
          var i = 0
          while (i < frameSamples) {
            val off = (f * frameSamples + i) * 2
            val s = ((bytes(off + 1) << 8) | (bytes(off) & 0xff)).toShort
            sum += math.abs(s.toInt)
            i += 1
          }
          notes(f) = sum / frameSamples
          f += 1
        }
        for {
          a <- 0 until nFrames
          dt <- 1 to maxDt
          if a + dt < nFrames
        } yield (id, a, notes(a) * 24000L + notes(a + dt) * 3L + (dt - 1))
      })
      .toDF(idCol, "t", "h")
  }

  /** Synthetic speech-cadence corpus keyed by `idCol` — [[syntheticAudio]]
    * with the VAD-exercising waveform above.
    */
  def syntheticSpeech(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    ensureParallelism(df)
      .select(col(idCol).cast("long")).as[Long]
      .mapPartitions(ids => ids.map(id => (id, syntheticSpeechWav(id))))
      .toDF(idCol, "payload")
      .withColumn("meta", metaFor("audio"))
  }

  /** Energy-based voice-activity detection — the speech-curation
    * primitive that decides which audio is worth transcribing: decode
    * the WAV, split into `frameSamples`-sample frames, mark a frame
    * voiced when its mean |amplitude| clears `threshold`, and emit the
    * per-clip verdict (frame counts + integer permille voiced ratio).
    * Runs per-partition over the opaque payload column like every other
    * decode op here — no driver traffic, no UDF, output columnar.
    */
  def vad(df: DataFrame, idCol: String,
      frameSamples: Int = 160, threshold: Double = 100.0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    ensureParallelism(df)
      .select(col(idCol).cast("long"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new ByteArrayInputStream(payload))
        val bytes = try in.readAllBytes() finally in.close()
        val nSamples = bytes.length / 2
        val nFrames = nSamples / frameSamples
        var voiced = 0L
        var f = 0
        while (f < nFrames) {
          var sum = 0.0
          var i = 0
          while (i < frameSamples) {
            val off = (f * frameSamples + i) * 2
            val s = ((bytes(off + 1) << 8) | (bytes(off) & 0xff)).toShort
            sum += math.abs(s.toInt)
            i += 1
          }
          if (sum / frameSamples > threshold) voiced += 1
          f += 1
        }
        (id, nFrames.toLong, voiced,
          if (nFrames == 0) 0L else 1000L * voiced / nFrames)
      })
      .toDF(idCol, "n_frames", "voiced_frames", "voiced_permille")
  }

  /** Materialize a synthetic WAV corpus keyed by `idCol`, generated
    * partition-parallel on executors — the audio twin of
    * [[syntheticImages]].
    */
  def syntheticAudio(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    ensureParallelism(df)
      .select(col(idCol).cast("long")).as[Long]
      .mapPartitions(ids => ids.map(id => (id, syntheticWav(id))))
      .toDF(idCol, "payload")
      .withColumn("meta", metaFor("audio"))
  }

  /** Batched per-partition WAV decode/feature-extract, mirroring
    * [[extractFeatures]] for the audio modality.
    */
  def extractAudioFeatures(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    ensureParallelism(df)
      .select(col(idCol).cast("long"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        val f = decodeWav(payload)
        (id, f.sampleRate, f.channels, f.nSamples, f.meanAbsAmplitude)
      })
      .toDF(idCol, "sample_rate", "channels", "n_samples", "mean_abs_amplitude")
  }

  // --- video frame sampling (synthetic decoder — JDK has no video codec) -

  /** Deterministic synthetic frame bytes, seeded by (payload hash, frame
    * number, dims). Stands in for a video-codec frame grab: the JDK ships
    * no video (or audio) decoder, so unlike the image path this one stays
    * synthetic by necessity, not convenience.
    */
  private def syntheticFrame(payload: Array[Byte], targetW: Int, targetH: Int): Array[Byte] = {
    val h = java.util.Arrays.hashCode(payload)
    val out = new Array[Byte](math.max(16, targetW * targetH / 64))
    var x = h.toLong * 6364136223846793005L + targetW * 1442695040888963407L + targetH
    var i = 0
    while (i < out.length) {
      x = x * 6364136223846793005L + 1442695040888963407L
      out(i) = (x >>> 56).toByte
      i += 1
    }
    out
  }

  /** Frame sampling: one video payload row → `nFrames` frame rows
    * (frame_idx, frame payload, timestamp offset). The decode is the
    * synthetic stand-in above; the row-exploding shape — flatMap over
    * partitions, output schema declared, frame count bounded — is the
    * real contract a video pipeline needs. Output rows = input × nFrames,
    * partition-parallel, never materialized per-video on the driver.
    */
  def frameSample(df: DataFrame, idCol: String, nFrames: Int, fps: Double = 30.0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    ensureParallelism(df)
      .select(col(idCol).cast("long"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, payload) =>
        // synthetic "duration": derived from payload size, ≥ nFrames frames
        val totalFrames = math.max(nFrames, payload.length / 8)
        val stride = totalFrames / nFrames
        Iterator.tabulate(nFrames) { i =>
          val frameNo = i * stride
          (id, i, (frameNo * 1000 / fps).toLong,
            syntheticFrame(payload :+ frameNo.toByte, 32, 32))
        }
      })
      .toDF(idCol, "frame_idx", "frame_ms", "frame")
  }

  // --- real animated-container codec path (JDK GIF reader/writer) ------

  /** Deterministic synthetic animated GIF for id `id`: `2 + id%4`
    * solid-gray 8×8 frames, frame `f` filled with `(id*17 + f*40) % 256`.
    * Real multi-frame bytes through the real JDK GIF codec (palette
    * round-trip is exact for constant frames), with frame count and
    * per-frame fill closed-form in `id` — so a SQL oracle with no codec
    * can verify the decode, the same contract as [[syntheticPng]].
    */
  def syntheticGif(id: Long): Array[Byte] = {
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      val n = 2 + (id % 4).toInt
      (0 until n).foreach { f =>
        val img = new BufferedImage(8, 8, BufferedImage.TYPE_INT_RGB)
        val v = ((id * 17 + f * 40) % 256).toInt
        val rgb = (v << 16) | (v << 8) | v
        var y = 0
        while (y < 8) { var x = 0; while (x < 8) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  /** One decoded frame of an animated container. */
  final case class FrameFeature(frameIdx: Int, width: Int, height: Int, meanPixel: Double)

  /** Decode EVERY frame of a multi-frame GIF through the real JDK
    * reader (`getNumImages` + indexed `read`) and reduce each to
    * (dims, mean pixel) — the per-frame feature step of a video
    * pipeline, on a genuine codec rather than a synthetic byte slice.
    */
  def decodeGifFrames(payload: Array[Byte]): Seq[FrameFeature] = {
    val reader = ImageIO.getImageReadersByFormatName("gif").next()
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(payload))
    try {
      reader.setInput(iis)
      val n = reader.getNumImages(true)
      require(n > 0, "payload is not a decodable multi-frame GIF")
      (0 until n).map { f =>
        val img = reader.read(f)
        var sum = 0L
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            // mean over ALL THREE channels, not just blue — equal to the
            // fill value on gray fixtures, and still correct on color
            val rgb = img.getRGB(x, y)
            sum += ((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)
            x += 1
          }
          y += 1
        }
        FrameFeature(f, img.getWidth, img.getHeight,
          sum.toDouble / (3L * img.getWidth * img.getHeight))
      }
    } finally { reader.dispose(); iis.close() }
  }

  /** Materialize a synthetic animated-GIF corpus keyed by `idCol`,
    * generated partition-parallel on executors like [[syntheticImages]].
    */
  def syntheticVideos(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    ensureParallelism(df)
      .select(col(idCol).cast("long")).as[Long]
      .mapPartitions(ids => ids.map(id => (id, syntheticGif(id))))
      .toDF(idCol, "payload")
      .withColumn("meta", metaFor("video"))
  }

  /** Strided frame sampling over a REAL multi-frame codec: decode the
    * container per-partition on executors, keep every `stride`-th frame,
    * emit per-frame features. Rows explode by ceil(frames/stride) — the
    * linear-in-output shape a 100 TB video sweep needs; one codec
    * context per core, payloads streamed.
    */
  def gifFrameSample(df: DataFrame, idCol: String, stride: Int): DataFrame = {
    require(stride >= 1, "stride must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    ensureParallelism(df)
      .select(col(idCol).cast("long"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, payload) =>
        decodeGifFrames(payload)
          .filter(_.frameIdx % stride == 0)
          .map(f => (id, f.frameIdx, f.width, f.height, f.meanPixel))
      })
      .toDF(idCol, "frame_idx", "width", "height", "mean_pixel")
  }
}
