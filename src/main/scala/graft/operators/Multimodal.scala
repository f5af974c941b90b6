package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video payloads ride through
  * the engine as opaque `binary` columns with a typed metadata struct,
  * exactly the pattern a 100 TB training-data pipeline needs — the
  * relational layer filters/joins/dedups on cheap typed metadata and
  * only the final consumer touches the bytes.
  *
  * Decode / resize / frame-sample run as `mapPartitions` over a typed
  * `Dataset` — the Scala analog of batch-UDF execution: one iterator
  * per partition, so a real decoder would amortize native-library init
  * across the whole batch, and partition sizing
  * (`spark.sql.files.maxPartitionBytes`) bounds peak decode memory.
  *
  * Two decode tiers:
  *
  *  - REAL image decode/resize via the JDK's built-in `javax.imageio`
  *    codecs (PNG/BMP/JPEG/GIF — no external libraries):
  *    [[decodeImagesJdk]] reads actual pixels, [[resizePayloads]]
  *    resamples and re-encodes. Deterministic (software rasterizer,
  *    nearest-neighbor interpolation), headless-safe.
  *  - REAL audio decode via the JDK's built-in `javax.sound.sampled`
  *    WAV/PCM codec (no external libraries, no audio device — file
  *    I/O only, headless-safe): [[decodeAudioWav]] reads actual
  *    16-bit PCM samples and computes sample-exact integer features;
  *    [[sampleAudioWindows]] is the windowed (frame-sampling) analog.
  *  - REAL video frame parsing for UNCOMPRESSED containers
  *    ([[parseY4m]] / [[videoFrameHashes]]): Y4M is an ASCII header
  *    plus raw planes at fixed byte offsets — pure arithmetic, no
  *    codec needed. COMPRESSED video remains the one true stub
  *    ([[sampleFrames]] — the JDK ships no H.26x/VPx decoder):
  *    deterministic fake features over the bytes, keeping the explode
  *    shape real. [[decodeImages]] is the byte-stat twin whose output
  *    the DuckDB oracle can verify (q30) — DuckDB cannot decode PNGs,
  *    so the pixel path is spec-gated.
  */
object Multimodal {

  /** ImageIO spools every ImageInputStream/ImageOutputStream through a
    * DISK-backed cache by default — one temp file per encode/decode.
    * On a 6 000-image pass that is ~12 000 file creations competing
    * with the suite's writeback debt (measured: q189 reps 6.6–13.3 s
    * in-suite vs 2.7 s isolated; memory-cached the in-suite line
    * drops to the isolated cost). Payloads here are sub-megabyte —
    * memory caching is strictly better.
    *
    * Called EXPLICITLY from [[graft.GraftSession]] session setup (the
    * driver / local-mode JVM) and from the head of every codec
    * `mapPartitions` closure (each executor JVM, once per partition —
    * a static boolean write, free), rather than as an object-init side
    * effect: initializer timing would make the setting load-order-
    * dependent, and a library JVM that never touches this object
    * would silently keep the slow disk cache (r14 ADVICE). JVM-global
    * by nature (the JDK offers no per-stream switch for the implicit
    * cache) — documented here so an embedding application knows its
    * other ImageIO users see memory caching too.
    */
  def disableImageIoDiskCache(): Unit =
    javax.imageio.ImageIO.setUseCache(false)

  /** Typed metadata carried alongside every payload. */
  case class MediaMeta(
      mediaType: String,
      byteLen: Long,
      contentHash: String,
      width: Int,
      height: Int,
      nFrames: Int)

  case class MediaRecord(docId: Long, payload: Array[Byte], meta: MediaMeta)

  /** Decoded-image features (stub: derived from bytes, not pixels). */
  case class DecodedImage(
      docId: Long,
      width: Int,
      height: Int,
      meanLuma: Double,
      histogram: Array[Long])

  case class Frame(docId: Long, frameIdx: Int, byteOffset: Long, luma: Double)

  /** Attach a payload + metadata to a text corpus — the fixture path
    * for exercising the plumbing (payload = UTF-8 bytes of the text;
    * width/height/frames derived deterministically from byte length).
    * Pure Column expressions, so the DuckDB oracle can verify it.
    */
  def attachPayload(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("docId"),
      col(textCol).cast("binary").as("payload"),
      struct(
        lit("image").as("mediaType"),
        octet_length(col(textCol)).cast("long").as("byteLen"),
        md5(col(textCol)).as("contentHash"),
        (octet_length(col(textCol)) % 64 + 16).cast("int").as("width"),
        // floor(x/64): Column `/` is double division; exact for these
        // magnitudes and mirrors DuckDB's integer `// 64`.
        (floor(octet_length(col(textCol)) / 64).cast("int") % 64 + 16).cast("int").as("height"),
        (octet_length(col(textCol)) % 7 + 1).cast("int").as("nFrames")).as("meta"))

  /** STUB decode: a real implementation would hand `payload` to an
    * image codec here; the fake derives a luma proxy and a 16-bin byte
    * histogram so downstream operators (filtering on luma, histogram
    * dedup) are exercised end-to-end with deterministic values.
    */
  private def decodeStub(r: MediaRecord): DecodedImage = {
    val bytes = r.payload
    val hist = new Array[Long](16)
    var sum = 0L
    var i = 0
    while (i < bytes.length) {
      val u = bytes(i) & 0xff
      hist(u / 16) += 1
      sum += u
      i += 1
    }
    val mean = if (bytes.length == 0) 0.0 else sum.toDouble / bytes.length
    DecodedImage(r.docId, r.meta.width, r.meta.height, mean, hist)
  }

  /** Decode a partition at a time. `mapPartitions` (not `map`) is the
    * load-bearing choice: codec/library init happens once per
    * partition, and the iterator keeps memory at one record per step.
    */
  def decodeImages(records: Dataset[MediaRecord])(implicit spark: SparkSession): Dataset[DecodedImage] = {
    import spark.implicits._
    records.mapPartitions(_.map(decodeStub))
  }

  private def md5Hex(bytes: Array[Byte]): String =
    java.security.MessageDigest
      .getInstance("MD5")
      .digest(bytes)
      .map("%02x".format(_))
      .mkString

  /** Deterministic grayscale PNG from a text row — the fixture
    * generator for the REAL codec path: dims derive from the text
    * length, pixel (x,y) is the char at `(x + y·w) mod len`. Real
    * PNG bytes, so [[decodeImagesJdk]] exercises an actual codec.
    */
  def encodeGrayPng(docId: Long, text: String): MediaRecord = {
    disableImageIoDiskCache()
    val len = text.length
    val w = 16 + (len % 32)
    val h = 16 + ((len / 32) % 32)
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = if (len == 0) 0 else text.charAt((x + y * w) % len).toInt & 0xff
        raster.setSample(x, y, 0, v)
        x += 1
      }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val bytes = baos.toByteArray
    MediaRecord(docId, bytes, MediaMeta("image/png", bytes.length.toLong, md5Hex(bytes), w, h, 1))
  }

  /** Real-PNG fixture corpus: one generated payload per document row.
    * `mapPartitions` so the (class-loaded, warmed) ImageIO plugin
    * registry is shared across the partition's rows.
    */
  def generatePngRecords(docs: DataFrame, idCol: String, textCol: String)(
      implicit spark: SparkSession): Dataset[MediaRecord] = {
    import spark.implicits._
    docs
      .select(col(idCol).cast("long").as("_id"), col(textCol).cast("string").as("_t"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, t) => encodeGrayPng(id, t) })
  }

  /** REAL image decode — the JDK codec path (`javax.imageio`, PNG/BMP/
    * JPEG/GIF): reads actual pixels, Rec.601 luma mean and a 16-bin
    * luma histogram. `mapPartitions`: codec registry init amortizes
    * across each partition; the iterator keeps peak memory at one
    * decoded image per step. Undecodable payloads fail loudly with the
    * doc id (a silent null would poison downstream dedup).
    */
  def decodeImagesJdk(records: Dataset[MediaRecord])(implicit spark: SparkSession): Dataset[DecodedImage] = {
    import spark.implicits._
    records.mapPartitions(_.map(decodeOneImage))
  }

  /** One payload through the JDK codec — throws on undecodable bytes
    * (shared by the fail-loud and routed decode paths).
    */
  private def decodeOneImage(r: MediaRecord): DecodedImage = {
    disableImageIoDiskCache()
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
    require(img != null, s"undecodable image payload for doc ${r.docId}")
    val w = img.getWidth
    val h = img.getHeight
    // Single-band (gray) images: read raster samples directly —
    // getRGB would route them through color management (gamma) and
    // come back non-identity. Multi-band: Rec.601 luma from RGB.
    val gray = img.getRaster.getNumBands == 1
    val hist = new Array[Long](16)
    var sum = 0.0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val luma =
          if (gray) img.getRaster.getSample(x, y, 0).toDouble
          else {
            val rgb = img.getRGB(x, y)
            0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
          }
        sum += luma
        hist(math.min((luma / 16).toInt, 15)) += 1
        x += 1
      }
      y += 1
    }
    DecodedImage(r.docId, w, h, sum / (w.toLong * h), hist)
  }

  /** A payload the codec boundary rejected, routed instead of thrown. */
  case class MediaError(docId: Long, stage: String, error: String)

  /** Sum-type rows for the routed decodes (public: Catalyst's
    * generated SafeProjection cannot access private classes).
    */
  case class ImageAttempt(ok: Option[DecodedImage], err: Option[MediaError])
  case class AudioAttempt(ok: Option[DecodedAudio], err: Option[MediaError])

  /** Corrupt-TOLERANT image decode — the P6 error-routing discipline
    * applied at the codec boundary: undecodable payloads (truncated
    * files, flipped header bytes, empty blobs — routine at 100 TB
    * media scale) go to a (docId, stage, error) side channel instead
    * of killing the job, while clean records decode exactly like
    * [[decodeImagesJdk]]. A silent skip is NOT an option — dropped
    * blobs poison downstream dedup and per-corpus statistics — so the
    * error frame is a first-class output the caller must consume.
    * One decode pass (cached attempt frame), split twice, release
    * closure — the [[graft.sources.Sources.jsonLinesWithErrors]]
    * shape.
    */
  def decodeImagesJdkRouted(records: Dataset[MediaRecord])(
      implicit spark: SparkSession): (Dataset[DecodedImage], Dataset[MediaError], () => Unit) = {
    import spark.implicits._
    val attempts = records
      .mapPartitions(_.map { r =>
        try ImageAttempt(Some(decodeOneImage(r)), None)
        catch {
          case e: Exception =>
            ImageAttempt(None, Some(MediaError(r.docId, "image-decode", String.valueOf(e.getMessage))))
        }
      })
      .cache()
    val clean = attempts.flatMap(_.ok)
    val errors = attempts.flatMap(_.err)
    (clean, errors, () => { attempts.unpersist(blocking = false); () })
  }

  /** Corrupt-TOLERANT audio decode — routed twin of [[decodeAudioWav]],
    * same contract as [[decodeImagesJdkRouted]].
    */
  def decodeAudioWavRouted(records: Dataset[MediaRecord])(
      implicit spark: SparkSession): (Dataset[DecodedAudio], Dataset[MediaError], () => Unit) = {
    import spark.implicits._
    val attempts = records
      .mapPartitions(_.map { r =>
        try AudioAttempt(Some(decodeOneAudio(r)), None)
        catch {
          case e: Exception =>
            AudioAttempt(None, Some(MediaError(r.docId, "audio-decode", String.valueOf(e.getMessage))))
        }
      })
      .cache()
    val clean = attempts.flatMap(_.ok)
    val errors = attempts.flatMap(_.err)
    (clean, errors, () => { attempts.unpersist(blocking = false); () })
  }

  /** REAL resize: decode → nearest-neighbor resample (deterministic —
    * no float filtering kernels) → re-encode PNG → fresh payload +
    * metadata. Images already within `maxSide` pass through untouched
    * (byte-identical payload, same contentHash).
    */
  def resizePayloads(records: Dataset[MediaRecord], maxSide: Int)(
      implicit spark: SparkSession): Dataset[MediaRecord] = {
    import spark.implicits._
    records.mapPartitions { it =>
      disableImageIoDiskCache()
      it.map { r =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
      require(img != null, s"undecodable image payload for doc ${r.docId}")
      val scale = maxSide.toDouble / math.max(img.getWidth, img.getHeight)
      if (scale >= 1.0) r
      else {
        val nw = math.max(1, math.round(img.getWidth * scale).toInt)
        val nh = math.max(1, math.round(img.getHeight * scale).toInt)
        val out = new java.awt.image.BufferedImage(nw, nh, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val g = out.createGraphics()
        g.setRenderingHint(
          java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_NEAREST_NEIGHBOR)
        g.drawImage(img, 0, 0, nw, nh, null)
        g.dispose()
        val baos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", baos)
        val bytes = baos.toByteArray
        MediaRecord(
          r.docId,
          bytes,
          r.meta.copy(byteLen = bytes.length.toLong, contentHash = md5Hex(bytes), width = nw, height = nh))
      }
      }
    }
  }

  /** Decoded-audio features — integers only, so the spec can assert
    * sample-exactness (FP aggregates of samples would be order-
    * sensitive). `zeroCrossings` counts strict sign flips between
    * consecutive samples (a zero sample ends the current sign run
    * without counting a crossing).
    */
  case class DecodedAudio(
      docId: Long,
      sampleRate: Int,
      nSamples: Long,
      peakAbs: Int,
      sumAbs: Long,
      zeroCrossings: Long)

  case class AudioWindow(docId: Long, windowIdx: Int, startSample: Long, nSamples: Int, peakAbs: Int, sumAbs: Long)

  // ---- perceptual audio hashing (the q189/q190 pattern's audio twin) --

  /** Per-clip 64-bit energy-contour hash over REAL decoded PCM — audio
    * near-dup joins the dedup family the way [[ImageHash]] did for
    * images: an amplitude-scaled or re-encoded copy of a clip keeps
    * its energy CONTOUR (which window is louder than the next), so
    * the fingerprint lands within a few Hamming bits and the SimHash
    * banding machinery applies unchanged at bits = 64.
    */
  case class AudioHash(docId: Long, nSamples: Long, ahashHi: Long, ahashLo: Long)

  /** The hash: sample `i` belongs to window `(i·65) div n` (65 windows
    * — an exact equal partition a SQL GROUP BY replays verbatim, with
    * every window non-empty for n ≥ 65), integer absolute-energy per
    * window, bit `w` set iff `energy(w) > energy(w+1)` STRICTLY.
    * Contour comparisons (not absolute energies) make the fingerprint
    * invariant under any per-sample gain that preserves the energy
    * ORDER — amplitude scaling, in particular, flips only windows
    * whose energies were nearly tied.
    */
  def audioHash64(samples: Array[Int]): Long = {
    val n = samples.length
    require(n >= 65, s"audioHash64 needs >= 65 samples; got $n")
    val e = new Array[Long](65)
    var i = 0
    while (i < n) {
      e(((i.toLong * 65L) / n).toInt) += math.abs(samples(i).toLong)
      i += 1
    }
    var bits = 0L
    var w = 0
    while (w < 64) {
      if (e(w) > e(w + 1)) bits |= (1L << w)
      w += 1
    }
    bits
  }

  /** Decode each payload through the JDK WAV codec and fingerprint it
    * — unsigned 32-bit halves for SQL-safe sign handling, like
    * [[imageHashes]]. Fails loudly on undecodable bytes.
    */
  def audioHashes(records: Dataset[MediaRecord])(
      implicit spark: SparkSession): Dataset[AudioHash] = {
    import spark.implicits._
    records.mapPartitions(_.map { r =>
      val (_, samples) = readPcm16(r.docId, r.payload)
      val h = audioHash64(samples)
      AudioHash(r.docId, samples.length.toLong, (h >>> 32) & 0xffffffffL, h & 0xffffffffL)
    })
  }

  /** REAL decode → exact floor-division amplitude scale (s ← s div k,
    * `Math.floorDiv` so negatives round the SQL-replayable way) →
    * re-encode WAV under a new docId — the audio analog of
    * [[resizeExact]]: a true decode→transform→encode→decode chain
    * whose every sample a SQL oracle can compose analytically.
    */
  def scaleAmplitudeExact(r: MediaRecord, newDocId: Long, div: Int): MediaRecord = {
    require(div >= 1, s"scaleAmplitudeExact: div >= 1; got $div")
    val (rate, samples) = readPcm16(r.docId, r.payload)
    val n = samples.length
    val raw = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val v = Math.floorDiv(samples(i), div)
      raw(2 * i) = (v & 0xff).toByte
      raw(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, n.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    val bytes = baos.toByteArray
    MediaRecord(newDocId, bytes, MediaMeta("audio/wav", bytes.length.toLong, md5Hex(bytes), 0, 0, n))
  }

  /** Deterministic 16-bit mono PCM WAV fixture from a text row — the
    * audio analog of [[encodeGrayPng]]: sample count derives from the
    * text length, sample i is a char-driven full-range sawtooth
    * (`(c·257 + i·131) mod 2^16 − 2^15`), covering both signs and the
    * extremes. Real RIFF/WAVE bytes via `javax.sound.sampled`, so
    * [[decodeAudioWav]] exercises an actual codec.
    */
  def encodePcmWav(docId: Long, text: String, sampleRate: Int = 8000): MediaRecord = {
    val n = 256 + (text.length % 512)
    val raw = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val c = if (text.isEmpty) 0 else text.charAt(i % text.length).toInt & 0xff
      val s = ((c * 257 + i * 131) % 65536) - 32768
      raw(2 * i) = (s & 0xff).toByte // little-endian
      raw(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, n.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    val bytes = baos.toByteArray
    MediaRecord(docId, bytes, MediaMeta("audio/wav", bytes.length.toLong, md5Hex(bytes), 0, 0, n))
  }

  /** Real-WAV fixture corpus: one generated payload per document row
    * (`meta.nFrames` = PCM sample count — mono frames ARE samples).
    */
  def generateWavRecords(docs: DataFrame, idCol: String, textCol: String)(
      implicit spark: SparkSession): Dataset[MediaRecord] = {
    import spark.implicits._
    docs
      .select(col(idCol).cast("long").as("_id"), col(textCol).cast("string").as("_t"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, t) => encodePcmWav(id, t) })
  }

  /** Decode one WAV payload to its 16-bit samples. Shared by
    * [[decodeAudioWav]] and [[sampleAudioWindows]]; fails loudly on
    * anything but 16-bit signed PCM (a silent skip would poison
    * downstream stats). Honors the container's declared endianness.
    */
  private def readPcm16(docId: Long, payload: Array[Byte]): (Int, Array[Int]) = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(payload))
    val fmt = ais.getFormat
    require(
      fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
        fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
      s"doc $docId: expected 16-bit signed mono PCM, got $fmt")
    val bytes = ais.readAllBytes()
    val n = bytes.length / 2
    val out = new Array[Int](n)
    var i = 0
    if (fmt.isBigEndian) {
      while (i < n) { out(i) = ((bytes(2 * i) << 8) | (bytes(2 * i + 1) & 0xff)).toShort.toInt; i += 1 }
    } else {
      while (i < n) { out(i) = ((bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xff)).toShort.toInt; i += 1 }
    }
    (math.round(fmt.getSampleRate), out)
  }

  /** REAL audio decode — the JDK codec path (`javax.sound.sampled`,
    * WAV/PCM): reads actual samples and computes sample-exact integer
    * features (peak |s|, Σ|s|, strict-sign zero crossings).
    * `mapPartitions` for the same reasons as [[decodeImagesJdk]].
    */
  def decodeAudioWav(records: Dataset[MediaRecord])(implicit spark: SparkSession): Dataset[DecodedAudio] = {
    import spark.implicits._
    records.mapPartitions(_.map(decodeOneAudio))
  }

  /** One WAV payload to features — throws on undecodable bytes
    * (shared by the fail-loud and routed decode paths).
    */
  private def decodeOneAudio(r: MediaRecord): DecodedAudio = {
    val (rate, samples) = readPcm16(r.docId, r.payload)
    var peak = 0
    var sumAbs = 0L
    var zc = 0L
    var prevSign = 0
    var i = 0
    while (i < samples.length) {
      val s = samples(i)
      val a = math.abs(s)
      if (a > peak) peak = a
      sumAbs += a
      val sign = Integer.signum(s)
      if (sign != 0) {
        if (prevSign != 0 && sign != prevSign) zc += 1
        prevSign = sign
      } else prevSign = 0
      i += 1
    }
    DecodedAudio(r.docId, rate, samples.length.toLong, peak, sumAbs, zc)
  }

  /** REAL audio frame sampling: fixed-size windows every `stride`
    * samples (the spectrogram-hop shape), each with its own exact
    * integer stats — the decode→window→per-window-features pipeline a
    * speech corpus runs before feature extraction.
    */
  def sampleAudioWindows(records: Dataset[MediaRecord], window: Int, stride: Int)(
      implicit spark: SparkSession): Dataset[AudioWindow] = {
    require(window > 0 && stride > 0, "window and stride must be positive")
    import spark.implicits._
    records.flatMap { r =>
      val (_, samples) = readPcm16(r.docId, r.payload)
      val starts = 0L until samples.length.toLong by stride.toLong
      starts.zipWithIndex.map { case (start, wi) =>
        val end = math.min(start + window, samples.length.toLong).toInt
        var peak = 0
        var sumAbs = 0L
        var i = start.toInt
        while (i < end) {
          val a = math.abs(samples(i))
          if (a > peak) peak = a
          sumAbs += a
          i += 1
        }
        AudioWindow(r.docId, wi, start, end - start.toInt, peak, sumAbs)
      }
    }
  }

  // ---- perceptual image hashing (r13 verdict Next #6) ---------------

  /** Per-image 64-bit perceptual hashes over REAL decoded pixels — the
    * image analog of [[graft.operators.Dedup.simHash]], closing the
    * "multimodal columns decode but don't dedup" gap: a resized or
    * re-encoded copy of an image lands within a few bits of Hamming
    * distance, so the SimHash pigeonhole banding machinery
    * ([[graft.operators.Dedup.simHashPairs]] with bits = 64) turns
    * image near-dup into the same bounded equi-join shape as text
    * near-dup.
    */
  case class ImageHash(
      docId: Long,
      width: Int,
      height: Int,
      dhashHi: Long,
      dhashLo: Long,
      ahashHi: Long,
      ahashLo: Long)

  /** Integer luma at (x, y): raw raster sample for single-band (gray)
    * images (identity — no color management), integer Rec.601
    * `(299·R + 587·G + 114·B) div 1000` for RGB. Integers, not the
    * float luma of [[decodeOneImage]]: perceptual hash bits must be
    * bit-stable across engines and platforms.
    */
  private def lumaIntAt(img: java.awt.image.BufferedImage, x: Int, y: Int): Int =
    if (img.getRaster.getNumBands == 1) img.getRaster.getSample(x, y, 0)
    else {
      val rgb = img.getRGB(x, y)
      (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) + 114 * (rgb & 0xff)) / 1000
    }

  /** dHash (difference hash): sample a 9×8 luma grid by exact
    * nearest-neighbor (`x = (gx·w) div 9`, `y = (gy·h) div 8` — floor
    * math, so the DuckDB oracle replays it bit-for-bit on analytic
    * fixtures), then bit `gy·8 + gx` is set iff the sample is
    * STRICTLY brighter than its right neighbor. Gradient-based, so
    * it survives uniform brightness shifts and (unlike aHash) has no
    * global-mean coupling between far-apart pixels.
    */
  def dHash64(img: java.awt.image.BufferedImage): Long = {
    val w = img.getWidth
    val h = img.getHeight
    require(w >= 9 && h >= 8, s"dHash64 needs >= 9x8 pixels; got ${w}x$h")
    var bits = 0L
    var gy = 0
    while (gy < 8) {
      val y = gy * h / 8
      var gx = 0
      while (gx < 8) {
        val a = lumaIntAt(img, gx * w / 9, y)
        val b = lumaIntAt(img, (gx + 1) * w / 9, y)
        if (a > b) bits |= (1L << (gy * 8 + gx))
        gx += 1
      }
      gy += 1
    }
    bits
  }

  /** aHash (average hash): 8×8 exact nearest-neighbor luma grid; bit
    * `gy·8 + gx` is set iff the sample is strictly brighter than the
    * FLOOR of the 64-sample mean. All-integer.
    */
  def aHash64(img: java.awt.image.BufferedImage): Long = {
    val w = img.getWidth
    val h = img.getHeight
    require(w >= 8 && h >= 8, s"aHash64 needs >= 8x8 pixels; got ${w}x$h")
    val s = new Array[Int](64)
    var sum = 0L
    var gy = 0
    while (gy < 8) {
      var gx = 0
      while (gx < 8) {
        val v = lumaIntAt(img, gx * w / 8, gy * h / 8)
        s(gy * 8 + gx) = v
        sum += v
        gx += 1
      }
      gy += 1
    }
    val mean = sum / 64
    var bits = 0L
    var i = 0
    while (i < 64) {
      if (s(i) > mean) bits |= (1L << i)
      i += 1
    }
    bits
  }

  /** Decode each payload through the JDK codec and compute both
    * perceptual hashes, split into unsigned 32-bit halves (`hi` =
    * bits 32–63) so a SQL oracle can assemble them without touching
    * the sign bit. Fails loudly on undecodable bytes (route through
    * [[decodeImagesJdkRouted]] first on corrupt-tolerant paths).
    */
  def imageHashes(records: Dataset[MediaRecord])(
      implicit spark: SparkSession): Dataset[ImageHash] = {
    import spark.implicits._
    records.mapPartitions { it =>
      disableImageIoDiskCache()
      it.map { r =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
      require(img != null, s"undecodable image payload for doc ${r.docId}")
      val dh = dHash64(img)
      val ah = aHash64(img)
      ImageHash(
        r.docId, img.getWidth, img.getHeight,
        (dh >>> 32) & 0xffffffffL, dh & 0xffffffffL,
        (ah >>> 32) & 0xffffffffL, ah & 0xffffffffL)
    }
    }
  }

  /** Deterministic BLOCK-pattern grayscale PNG — the fixture generator
    * for the perceptual-hash gates: the image is an 8×8 grid of
    * constant-luma blocks, block (bx, by) valued
    * `h32("<seed>#<bx>#<by>") mod 256` ([[graft.functions.Hashing]]
    * md5 semantics, so the DuckDB oracle reproduces every pixel
    * analytically), pixel (x, y) in block `((x·8) div w, (y·8) div h)`.
    * Piecewise-constant content is what perceptual hashing assumes of
    * real photographs (smooth regions) — pure-noise fixtures would
    * decorrelate under any resize.
    */
  def encodeBlockPng(docId: Long, seed: Long, w: Int, h: Int): MediaRecord = {
    disableImageIoDiskCache()
    require(w >= 9 && h >= 8, s"encodeBlockPng needs >= 9x8; got ${w}x$h")
    val blocks = Array.tabulate(8, 8)((by, bx) =>
      (graft.functions.Hashing.h32Local(s"$seed#$bx#$by") % 256L).toInt)
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      val by = y * 8 / h
      var x = 0
      while (x < w) {
        raster.setSample(x, y, 0, blocks(by)(x * 8 / w))
        x += 1
      }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val bytes = baos.toByteArray
    MediaRecord(docId, bytes, MediaMeta("image/png", bytes.length.toLong, md5Hex(bytes), w, h, 1))
  }

  /** REAL decode → EXACT-floor nearest-neighbor resample to (nw, nh)
    * → re-encode PNG, under a new docId. Unlike [[resizePayloads]]
    * (Java2D `drawImage`, whose NN sample mapping is implementation-
    * defined), the resample here is `src(x·w div nw, y·h div nh)` —
    * pure integer floor math a SQL oracle can compose, which is what
    * lets the near-dup gate verify the WHOLE decode→resize→encode→
    * decode→hash chain cross-engine. Grayscale output (the fixture
    * path is single-band end to end).
    */
  def resizeExact(r: MediaRecord, newDocId: Long, nw: Int, nh: Int): MediaRecord = {
    disableImageIoDiskCache()
    require(nw >= 9 && nh >= 8, s"resizeExact needs >= 9x8; got ${nw}x$nh")
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
    require(img != null, s"undecodable image payload for doc ${r.docId}")
    val w = img.getWidth
    val h = img.getHeight
    val out = new java.awt.image.BufferedImage(nw, nh, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = out.getRaster
    var y = 0
    while (y < nh) {
      val sy = y * h / nh
      var x = 0
      while (x < nw) {
        raster.setSample(x, y, 0, lumaIntAt(img, x * w / nw, sy))
        x += 1
      }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(out, "png", baos)
    val bytes = baos.toByteArray
    MediaRecord(
      newDocId, bytes,
      MediaMeta("image/png", bytes.length.toLong, md5Hex(bytes), nw, nh, 1))
  }

  /** STUB resize: recomputes target dims preserving aspect; a real
    * implementation would resample pixels.
    */
  def resize(images: Dataset[DecodedImage], maxSide: Int)(implicit spark: SparkSession): Dataset[DecodedImage] = {
    import spark.implicits._
    images.map { im =>
      val scale = maxSide.toDouble / math.max(im.width, im.height)
      if (scale >= 1.0) im
      else
        im.copy(
          width = math.max(1, math.round(im.width * scale).toInt),
          height = math.max(1, math.round(im.height * scale).toInt))
    }
  }

  /** STUB frame sampling for opaque (compressed) video payloads: every
    * `stride`-th "frame" (fixed-size byte window) becomes one row —
    * the explode shape a real video pipeline has, with deterministic
    * fake luma per frame. The JDK has no codec for compressed video;
    * for UNCOMPRESSED video the real path below ([[videoFrameHashes]]
    * over Y4M) replaces this.
    */
  def sampleFrames(records: Dataset[MediaRecord], stride: Int)(implicit spark: SparkSession): Dataset[Frame] = {
    import spark.implicits._
    records.flatMap { r =>
      val n = r.meta.nFrames
      (0 until n by stride).map { f =>
        val off = (f.toLong * 37) % math.max(1, r.payload.length)
        val luma = (r.payload(off.toInt) & 0xff).toDouble
        Frame(r.docId, f, off, luma)
      }
    }
  }

  // ------------------------------------------------------------- video

  /** dHash over a RAW luma plane (row-major, w×h, one byte per pixel) —
    * the same 9×8 exact-floor grid and strict-greater comparison as
    * [[dHash64]], without a BufferedImage in between: video frames
    * arrive as plane slices of the container payload, and decoding
    * them through ImageIO would mean a pointless per-frame PNG
    * round-trip.
    */
  def dHash64Plane(plane: Array[Byte], off: Int, w: Int, h: Int): Long = {
    require(w >= 9 && h >= 8, s"dHash64Plane needs >= 9x8 pixels; got ${w}x$h")
    require(off + w * h <= plane.length, "plane slice out of bounds")
    var bits = 0L
    var gy = 0
    while (gy < 8) {
      val y = gy * h / 8
      var gx = 0
      while (gx < 8) {
        val a = plane(off + y * w + gx * w / 9) & 0xff
        val b = plane(off + y * w + (gx + 1) * w / 9) & 0xff
        if (a > b) bits |= (1L << (gy * 8 + gx))
        gx += 1
      }
      gy += 1
    }
    bits
  }

  /** Parsed Y4M geometry: luma-plane width/height, frame count, and
    * the byte offset of the first `FRAME` marker.
    */
  case class Y4mInfo(width: Int, height: Int, nFrames: Int, firstFrameOffset: Int)

  private val Y4mMagic = "YUV4MPEG2"
  private val Y4mFrameMarker = "FRAME\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  /** Parse a Y4M (YUV4MPEG2) stream header and index its frames —
    * pure byte-offset arithmetic, no codec: the container is an ASCII
    * parameter line (`YUV4MPEG2 W<w> H<h> F<n>:<d> ... Cmono\n`)
    * followed by `FRAME\n` + one raw plane per frame (`Cmono` = luma
    * only, w·h bytes — the grayscale end-to-end fixture path, like the
    * single-band PNGs). Every frame marker is VALIDATED, not assumed:
    * a truncated or corrupt payload throws (route through a
    * corrupt-tolerant twin if tolerance is needed).
    */
  def parseY4m(payload: Array[Byte], docId: Long = -1L): Y4mInfo = {
    val headerEnd = payload.indexOf('\n'.toByte)
    require(headerEnd > 0, s"doc $docId: no Y4M header line")
    val header = new String(payload, 0, headerEnd, java.nio.charset.StandardCharsets.US_ASCII)
    val toks = header.split(' ')
    require(toks.headOption.contains(Y4mMagic), s"doc $docId: not a Y4M stream: $header")
    def param(p: Char): Option[String] = toks.tail.find(t => t.nonEmpty && t.head == p).map(_.tail)
    val w = param('W').map(_.toInt).getOrElse(sys.error(s"doc $docId: Y4M header missing W"))
    val h = param('H').map(_.toInt).getOrElse(sys.error(s"doc $docId: Y4M header missing H"))
    require(w > 0 && h > 0, s"doc $docId: bad Y4M dims ${w}x$h")
    val colorspace = param('C').getOrElse("420jpeg")
    require(colorspace == "mono", s"doc $docId: only Cmono Y4M is supported; got C$colorspace")
    val frameSize = Y4mFrameMarker.length + w * h
    val body = payload.length - (headerEnd + 1)
    require(body % frameSize == 0,
      s"doc $docId: Y4M body ($body bytes) is not a whole number of ${w}x$h frames")
    val n = body / frameSize
    var f = 0
    while (f < n) {
      val off = headerEnd + 1 + f * frameSize
      var i = 0
      while (i < Y4mFrameMarker.length) {
        require(payload(off + i) == Y4mFrameMarker(i), s"doc $docId: corrupt FRAME marker at frame $f")
        i += 1
      }
      f += 1
    }
    Y4mInfo(w, h, n, headerEnd + 1)
  }

  /** Byte offset of frame `f`'s luma plane inside a parsed payload. */
  private def y4mPlaneOffset(info: Y4mInfo, f: Int): Int =
    info.firstFrameOffset + f * (Y4mFrameMarker.length + info.width * info.height) +
      Y4mFrameMarker.length

  /** Deterministic block-pattern Y4M fixture — [[encodeBlockPng]]
    * extended with a frame axis: frame `f`'s pixel (x, y) lives in
    * block `((x·8) div w, (y·8) div h)` valued
    * `h32("<seed>#<f div sceneLen>#<bx>#<by>") mod 256`, so a SQL
    * oracle replays every sampled pixel of every frame arithmetically
    * while the Spark side parses REAL container bytes. `sceneLen > 1`
    * gives the clip SCENE structure: frames within a scene are
    * identical, scene boundaries jump to an unrelated pattern — the
    * shot-segmentation fixture (default 1 = every frame its own
    * pattern, the near-dup fixtures' shape).
    */
  def encodeBlockY4m(docId: Long, seed: Long, w: Int, h: Int, nFrames: Int, sceneLen: Int = 1): MediaRecord = {
    require(w >= 9 && h >= 8, s"encodeBlockY4m needs >= 9x8; got ${w}x$h")
    require(nFrames >= 1, s"encodeBlockY4m needs >= 1 frame; got $nFrames")
    require(sceneLen >= 1, s"encodeBlockY4m needs sceneLen >= 1; got $sceneLen")
    val header = s"$Y4mMagic W$w H$h F25:1 Ip A1:1 Cmono\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val frameSize = Y4mFrameMarker.length + w * h
    val bytes = new Array[Byte](header.length + nFrames * frameSize)
    System.arraycopy(header, 0, bytes, 0, header.length)
    var f = 0
    while (f < nFrames) {
      val off = header.length + f * frameSize
      System.arraycopy(Y4mFrameMarker, 0, bytes, off, Y4mFrameMarker.length)
      val blocks = Array.tabulate(8, 8)((by, bx) =>
        (graft.functions.Hashing.h32Local(s"$seed#${f / sceneLen}#$bx#$by") % 256L).toByte)
      var y = 0
      while (y < h) {
        val by = y * 8 / h
        val rowOff = off + Y4mFrameMarker.length + y * w
        var x = 0
        while (x < w) {
          bytes(rowOff + x) = blocks(by)(x * 8 / w)
          x += 1
        }
        y += 1
      }
      f += 1
    }
    MediaRecord(docId, bytes,
      MediaMeta("video/x-yuv4mpeg", bytes.length.toLong, md5Hex(bytes), w, h, nFrames))
  }

  /** REAL parse → temporal trim to the first `keepFrames` frames →
    * re-encode, under a new docId — the video analog of [[resizeExact]]
    * / [[scaleAmplitudeExact]]: a true parse→transform→encode chain
    * over container bytes. Kept frames are copied VERBATIM (a trim
    * touches no pixels), which is what makes trimmed variants land at
    * Hamming 0 from their base's shared frames.
    */
  def trimFramesExact(r: MediaRecord, newDocId: Long, keepFrames: Int): MediaRecord = {
    val info = parseY4m(r.payload, r.docId)
    require(keepFrames >= 1 && keepFrames <= info.nFrames,
      s"trimFramesExact: keepFrames in [1, ${info.nFrames}]; got $keepFrames")
    val frameSize = Y4mFrameMarker.length + info.width * info.height
    val bytes = new Array[Byte](info.firstFrameOffset + keepFrames * frameSize)
    System.arraycopy(r.payload, 0, bytes, 0, bytes.length)
    MediaRecord(newDocId, bytes,
      MediaMeta("video/x-yuv4mpeg", bytes.length.toLong, md5Hex(bytes),
        info.width, info.height, keepFrames))
  }

  case class VideoFrameHash(
      docId: Long,
      frameIdx: Int,
      width: Int,
      height: Int,
      nFrames: Int,
      dhashHi: Long,
      dhashLo: Long)

  case class VideoAttempt(ok: Seq[VideoFrameHash], err: Option[MediaError])

  /** Corrupt-tolerant twin of [[videoFrameHashes]] — the P6 error-
    * routing discipline at the container boundary, like
    * [[decodeImagesJdkRouted]] / [[decodeAudioWavRouted]]: one poisoned
    * payload in a 100 TB media corpus must neither kill the job nor
    * vanish silently. Clean records hash bit-identically to the strict
    * path; corrupt ones (bad magic, corrupt FRAME marker, truncated
    * body) land on the error channel with their doc id and message.
    */
  def videoFrameHashesRouted(records: Dataset[MediaRecord], stride: Int)(
      implicit spark: SparkSession): (Dataset[VideoFrameHash], Dataset[MediaError], () => Unit) = {
    require(stride >= 1, s"videoFrameHashesRouted: stride >= 1; got $stride")
    import spark.implicits._
    val attempts = records
      .mapPartitions(_.map { r =>
        try VideoAttempt(hashOneVideo(r, stride), None)
        catch {
          case e: Exception =>
            VideoAttempt(Nil, Some(MediaError(r.docId, "video-parse", String.valueOf(e.getMessage))))
        }
      })
      .cache()
    val clean = attempts.flatMap(_.ok)
    val errors = attempts.flatMap(_.err)
    (clean, errors, () => { attempts.unpersist(blocking = false); () })
  }

  /** One payload's sampled-frame hashes — shared by the fail-loud and
    * routed paths.
    */
  private def hashOneVideo(r: MediaRecord, stride: Int): Seq[VideoFrameHash] = {
    val info = parseY4m(r.payload, r.docId)
    (0 until info.nFrames by stride).map { f =>
      val dh = dHash64Plane(r.payload, y4mPlaneOffset(info, f), info.width, info.height)
      VideoFrameHash(r.docId, f, info.width, info.height, info.nFrames,
        (dh >>> 32) & 0xffffffffL, dh & 0xffffffffL)
    }
  }

  /** Parse each Y4M payload and dHash every `stride`-th frame — the
    * REAL frame-sampling path (byte-offset parse, raw-plane hash; no
    * codec because uncompressed video needs none). One output row per
    * sampled frame, hash in unsigned 32-bit halves like
    * [[imageHashes]]. The per-record work is pure arithmetic over the
    * payload bytes, so partition sizing bounds memory at one payload.
    */
  def videoFrameHashes(records: Dataset[MediaRecord], stride: Int)(
      implicit spark: SparkSession): Dataset[VideoFrameHash] = {
    require(stride >= 1, s"videoFrameHashes: stride >= 1; got $stride")
    import spark.implicits._
    records.mapPartitions(_.flatMap(r => hashOneVideo(r, stride)))
  }
}
