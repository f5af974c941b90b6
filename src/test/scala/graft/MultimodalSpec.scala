package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.operators.Multimodal.{DecodedImage, MediaRecord}

/** Multimodal plumbing: payload/metadata schema, partition-batched
  * decode, resize, and frame sampling. The image (javax.imageio) and
  * audio (javax.sound.sampled) paths are REAL JDK codecs, pinned
  * pixel-exact / sample-exact; video is REAL byte-offset parsing for
  * uncompressed containers (Y4M — header parse, frame indexing,
  * raw-plane dHash), with only compressed video keeping the
  * deterministic stub (no JDK codec exists).
  */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def records = {
    import spark.implicits._
    Multimodal
      .attachPayload(Tables.documents(spark, sf).filter(col("doc_id") < 20), "doc_id", "text")
      .as[MediaRecord]
  }

  test("attachPayload: payload bytes round-trip the text; meta is consistent") {
    val rows = records.collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(r.meta.byteLen == r.payload.length.toLong)
      assert(r.meta.mediaType == "image")
      assert(r.meta.width == (r.payload.length % 64 + 16))
      assert(r.meta.nFrames == (r.payload.length % 7 + 1))
    }
  }

  test("decodeImages: deterministic features; histogram accounts for every byte") {
    implicit val s = spark
    val decoded = Multimodal.decodeImages(records).collect()
    assert(decoded.length == 20)
    decoded.foreach { im =>
      assert(im.histogram.sum == im.histogram.sum) // defined
    }
    val byId = records.collect().map(r => r.docId -> r).toMap
    decoded.foreach { im =>
      val payload = byId(im.docId).payload
      assert(im.histogram.sum == payload.length.toLong)
      val mean = payload.map(b => (b & 0xff).toLong).sum.toDouble / payload.length
      assert(im.meanLuma == mean)
    }
  }

  test("resize: preserves aspect cap and never upscales") {
    implicit val s = spark
    val images = Multimodal.decodeImages(records)
    val resized = Multimodal.resize(images, maxSide = 32).collect()
    resized.foreach { im =>
      assert(math.max(im.width, im.height) <= 32 || (im.width <= 32 && im.height <= 32))
      assert(im.width >= 1 && im.height >= 1)
    }
    // an image already within bounds is untouched
    val small = Multimodal
      .resize(spark.createDataset(Seq(DecodedImage(99L, 20, 10, 0.0, Array.fill(16)(0L))))(
        org.apache.spark.sql.Encoders.product[DecodedImage]), 32)
      .collect()
      .head
    assert(small.width == 20 && small.height == 10)
  }

  test("JDK codec path: real PNG payloads decode to the generated pixels") {
    implicit val s = spark
    val recs = Multimodal.generatePngRecords(
      Tables.documents(spark, sf).filter(col("doc_id") < 10), "doc_id", "text")
    val rows = recs.collect()
    rows.foreach { r =>
      // PNG magic bytes — these are real encoded images
      assert((r.payload(0) & 0xff) == 0x89 && r.payload(1) == 'P'.toByte)
      assert(r.meta.mediaType == "image/png")
    }
    val decoded = Multimodal.decodeImagesJdk(recs).collect().map(d => d.docId -> d).toMap
    val texts = Tables.documents(spark, sf).filter(col("doc_id") < 10)
      .select("doc_id", "text").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    decoded.foreach { case (id, im) =>
      val len = texts(id).length
      assert(im.width == 16 + (len % 32) && im.height == 16 + ((len / 32) % 32))
      // gray pixel v decodes to luma v (0.299+0.587+0.114 = 1)
      val expectedMean = {
        val t = texts(id)
        val n = im.width * im.height
        (0 until n).map(i => (t.charAt(i % len).toInt & 0xff).toDouble).sum / n
      }
      assert(math.abs(im.meanLuma - expectedMean) < 1e-6, s"doc $id")
      assert(im.histogram.sum == im.width.toLong * im.height)
    }
  }

  test("JDK codec path: resize resamples, re-encodes, and passes through small images") {
    implicit val s = spark
    val recs = Multimodal.generatePngRecords(
      Tables.documents(spark, sf).filter(col("doc_id") < 10), "doc_id", "text")
    val before = recs.collect().map(r => r.docId -> r).toMap
    val resized = Multimodal.resizePayloads(recs, maxSide = 20).collect()
    resized.foreach { r =>
      assert(math.max(r.meta.width, r.meta.height) <= 20)
      assert(r.meta.byteLen == r.payload.length.toLong)
      val b = before(r.docId)
      if (math.max(b.meta.width, b.meta.height) <= 20) {
        assert(r.meta.contentHash == b.meta.contentHash) // untouched pass-through
      } else {
        assert(r.meta.contentHash != b.meta.contentHash)
      }
    }
    // re-decode the resized payloads: dims must match the metadata
    val redecoded = Multimodal
      .decodeImagesJdk(spark.createDataset(resized.toSeq)(
        org.apache.spark.sql.Encoders.product[MediaRecord]))
      .collect()
      .map(d => d.docId -> d)
      .toMap
    resized.foreach(r => assert(
      redecoded(r.docId).width == r.meta.width && redecoded(r.docId).height == r.meta.height))
  }

  // The fixture waveform, restated independently of the encoder: the
  // spec pins the contract sample-by-sample, not just "decodes to
  // something".
  private def expectedSamples(text: String): Array[Int] = {
    val n = 256 + (text.length % 512)
    Array.tabulate(n) { i =>
      val c = if (text.isEmpty) 0 else text.charAt(i % text.length).toInt & 0xff
      ((c * 257 + i * 131) % 65536) - 32768
    }
  }

  test("JDK audio path: real WAV payloads decode to the generated PCM samples, exactly") {
    implicit val s = spark
    val docs = Tables.documents(spark, sf).filter(col("doc_id") < 10)
    val recs = Multimodal.generateWavRecords(docs, "doc_id", "text")
    val rows = recs.collect()
    rows.foreach { r =>
      // RIFF/WAVE magic — these are real encoded audio files
      assert(new String(r.payload.take(4), "US-ASCII") == "RIFF")
      assert(new String(r.payload.slice(8, 12), "US-ASCII") == "WAVE")
      assert(r.meta.mediaType == "audio/wav")
    }
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val decoded = Multimodal.decodeAudioWav(recs).collect().map(d => d.docId -> d).toMap
    assert(decoded.size == 10)
    decoded.foreach { case (id, a) =>
      val samples = expectedSamples(texts(id))
      assert(a.sampleRate == 8000)
      assert(a.nSamples == samples.length.toLong, s"doc $id")
      assert(a.peakAbs == samples.map(math.abs).max, s"doc $id")
      assert(a.sumAbs == samples.map(v => math.abs(v).toLong).sum, s"doc $id")
      val zc = samples.map(Integer.signum).foldLeft((0L, 0)) {
        case ((acc, prev), 0)    => (acc, 0)
        case ((acc, prev), sign) => (if (prev != 0 && sign != prev) acc + 1 else acc, sign)
      }._1
      assert(a.zeroCrossings == zc, s"doc $id")
    }
  }

  test("sampleAudioWindows: hop-windowed exact stats tile the sample stream") {
    implicit val s = spark
    val docs = Tables.documents(spark, sf).filter(col("doc_id") < 5)
    val recs = Multimodal.generateWavRecords(docs, "doc_id", "text")
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val windows = Multimodal.sampleAudioWindows(recs, window = 64, stride = 48).collect()
    windows.groupBy(_.docId).foreach { case (id, ws) =>
      val samples = expectedSamples(texts(id))
      val starts = 0L until samples.length.toLong by 48L
      assert(ws.length == starts.size, s"doc $id")
      ws.sortBy(_.windowIdx).zip(starts).foreach { case (w, start) =>
        assert(w.startSample == start)
        val slice = samples.slice(start.toInt, math.min(start.toInt + 64, samples.length))
        assert(w.nSamples == slice.length)
        assert(w.peakAbs == (if (slice.isEmpty) 0 else slice.map(math.abs).max))
        assert(w.sumAbs == slice.map(v => math.abs(v).toLong).sum)
      }
    }
  }

  test("sampleFrames: one row per sampled frame, offsets in payload bounds") {
    implicit val s = spark
    val frames = Multimodal.sampleFrames(records, stride = 2).collect()
    val byId = records.collect().map(r => r.docId -> r).toMap
    assert(frames.nonEmpty)
    frames.groupBy(_.docId).foreach { case (id, fs) =>
      val expected = (0 until byId(id).meta.nFrames by 2).size
      assert(fs.length == expected)
      fs.foreach(f => assert(f.byteOffset >= 0 && f.byteOffset < byId(id).payload.length))
    }
  }

  /** Adversarial payload corruptions (the fuzz axes the parquet-level
    * generator can't reach — media records are runtime-generated):
    * truncation mid-file, header bit-flip, empty blob, and a
    * wrong-codec payload, each built from a REAL generated file.
    */
  private def corruptedMedia(
      good: Seq[MediaRecord]): Seq[MediaRecord] = {
    val g = good.head
    Seq(
      g.copy(docId = 9001L, payload = g.payload.take(g.payload.length / 3)), // truncated
      g.copy(docId = 9002L, payload = { // flipped magic/header byte
        val b = g.payload.clone(); b(1) = (b(1) ^ 0x7f).toByte; b
      }),
      g.copy(docId = 9003L, payload = Array.empty[Byte]), // empty blob
      g.copy(docId = 9004L, payload = "not media at all".getBytes("UTF-8")))
  }

  test("routed image decode: corrupt payloads go to the error channel, clean ones decode (fuzz)") {
    implicit val s = spark
    import spark.implicits._
    val good = Multimodal
      .generatePngRecords(Tables.documents(spark, sf).filter(col("doc_id") < 6), "doc_id", "text")
      .collect()
      .toSeq
    val mixed = (good ++ corruptedMedia(good)).toDS()
    val (clean, errors, release) = Multimodal.decodeImagesJdkRouted(mixed)
    try {
      val ok = clean.collect()
      val bad = errors.collect()
      assert(ok.map(_.docId).sorted.toSeq == good.map(_.docId).sorted)
      assert(bad.map(_.docId).sorted.toSeq == Seq(9001L, 9002L, 9003L, 9004L))
      assert(bad.forall(_.stage == "image-decode"))
      // clean rows decode IDENTICALLY to the fail-loud path
      val strict = Multimodal.decodeImagesJdk(good.toDS()).collect()
      assert(ok.map(d => (d.docId, d.width, d.height, d.meanLuma)).sorted.toSeq ==
        strict.map(d => (d.docId, d.width, d.height, d.meanLuma)).sorted.toSeq)
    } finally release()
  }

  test("routed audio decode: corrupt WAVs route, clean ones match the strict path (fuzz)") {
    implicit val s = spark
    import spark.implicits._
    val good = Multimodal
      .generateWavRecords(Tables.documents(spark, sf).filter(col("doc_id") < 6), "doc_id", "text")
      .collect()
      .toSeq
    val mixed = (good ++ corruptedMedia(good)).toDS()
    val (clean, errors, release) = Multimodal.decodeAudioWavRouted(mixed)
    try {
      val ok = clean.collect()
      val bad = errors.collect()
      // the truncated WAV (9001) keeps its intact RIFF header and
      // legitimately decodes to a shorter sample stream — codec
      // behavior, not a routing miss; all six good records must decode
      // and the three structurally-unreadable payloads must route
      assert(ok.map(_.docId).toSet.intersect(good.map(_.docId).toSet) == good.map(_.docId).toSet)
      assert(bad.map(_.docId).toSet == Set(9002L, 9003L, 9004L))
      assert(ok.map(_.docId).toSet.intersect(Set(9002L, 9003L, 9004L)).isEmpty)
      assert(bad.forall(_.stage == "audio-decode"))
      val strict = Multimodal.decodeAudioWav(good.toDS()).collect()
      assert(
        ok.filter(d => d.docId < 9000L)
          .map(d => (d.docId, d.nSamples, d.peakAbs, d.sumAbs, d.zeroCrossings)).sorted.toSeq ==
          strict.map(d => (d.docId, d.nSamples, d.peakAbs, d.sumAbs, d.zeroCrossings)).sorted.toSeq)
    } finally release()
  }

  /** A gray image with pixel value = f(x, y), exact dims. */
  private def grayImage(w: Int, h: Int)(f: (Int, Int) => Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w) img.getRaster.setSample(x, y, 0, f(x, y))
    img
  }

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("dHash/aHash hand cases: monotone gradients give the closed-form bit patterns") {
    // 9-wide left-bright gradient: every dHash comparison is
    // strictly-decreasing to the right -> all 64 bits set.
    val leftBright = grayImage(9, 8)((x, _) => 255 - 28 * x)
    assert(Multimodal.dHash64(leftBright) === -1L)
    // Right-bright: no sample beats its right neighbor -> all clear.
    val rightBright = grayImage(9, 8)((x, _) => 28 * x)
    assert(Multimodal.dHash64(rightBright) === 0L)
    // aHash of the left-bright 8x8 samples: v(gx) = 255-28*gx per
    // row, sum = 8*1256 = 10048, mean = 157 -> gx in 0..3 exceed it.
    val a = Multimodal.aHash64(leftBright)
    assert(a === 0x0f0f0f0f0f0f0f0fL, a.toHexString)
    // flat image: nothing strictly beats the mean or its neighbor
    val flat = grayImage(9, 8)((_, _) => 77)
    assert(Multimodal.dHash64(flat) === 0L && Multimodal.aHash64(flat) === 0L)
  }

  test("perceptual hashes survive re-encode exactly and real resizes within a small Hamming ball") {
    implicit val s = spark
    import spark.implicits._
    val base = Multimodal.encodeBlockPng(0L, seed = 42L, w = 96, h = 88)
    val baseImg = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(base.payload))
    val dBase = Multimodal.dHash64(baseImg)
    // identity "resize" = decode -> resample at same dims -> re-encode:
    // byte-path round trip must not move a single bit
    val reenc = Multimodal.resizeExact(base, 1L, 96, 88)
    val dReenc = Multimodal.dHash64(
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(reenc.payload)))
    assert(dReenc === dBase)
    // exact-floor nearest-neighbor downscale: block pattern survives
    val small = Multimodal.resizeExact(base, 2L, 64, 60)
    val dSmall = Multimodal.dHash64(
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(small.payload)))
    assert(hamming(dBase, dSmall) <= 12, s"exact-NN resize moved ${hamming(dBase, dSmall)} bits")
    // the Java2D production resize path (resizePayloads, NN hint):
    // implementation-defined sample mapping, but still a near-dup
    val j2d = Multimodal.resizePayloads(Seq(base).toDS(), maxSide = 64).collect()(0)
    val dJ2d = Multimodal.dHash64(
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(j2d.payload)))
    assert(hamming(dBase, dJ2d) <= 12, s"Java2D resize moved ${hamming(dBase, dJ2d)} bits")
    // and an unrelated image is NOT in the ball
    val other = Multimodal.encodeBlockPng(9L, seed = 999L, w = 96, h = 88)
    val dOther = Multimodal.dHash64(
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(other.payload)))
    assert(hamming(dBase, dOther) > 12, s"unrelated images collided at ${hamming(dBase, dOther)}")
  }

  test("audioHash64 hand cases: monotone energy staircases give closed-form bit patterns") {
    // 130 samples, 65 windows of exactly 2: strictly DECREASING window
    // energy -> every contour comparison fires -> all 64 bits set.
    val falling = Array.tabulate(130)(i => 1000 - 7 * (i / 2))
    assert(Multimodal.audioHash64(falling) === -1L)
    // strictly increasing -> no bit fires; flat -> ties, no bit fires
    val rising = Array.tabulate(130)(i => 7 * (i / 2))
    assert(Multimodal.audioHash64(rising) === 0L)
    assert(Multimodal.audioHash64(Array.fill(130)(42)) === 0L)
    // energy is ABSOLUTE: a sign flip changes nothing
    assert(Multimodal.audioHash64(falling.map(-_)) === -1L)
    // guard: fewer than 65 samples refuses
    val e = intercept[IllegalArgumentException](Multimodal.audioHash64(Array.fill(64)(1)))
    assert(e.getMessage.contains("65"))
  }

  test("audio fingerprints survive re-encode exactly and amplitude halving at Hamming ~0") {
    implicit val s = spark
    import spark.implicits._
    val base = Multimodal.encodePcmWav(0L, "the quick brown fox jumps over the lazy dog 0123456789")
    def hashOf(r: Multimodal.MediaRecord): Long = {
      val ah = Multimodal.audioHashes(Seq(r).toDS()).collect()(0)
      (ah.ahashHi << 32) | ah.ahashLo
    }
    val hBase = hashOf(base)
    // identity divisor = decode -> re-encode: bit-identical fingerprint
    assert(hashOf(Multimodal.scaleAmplitudeExact(base, 1L, 1)) === hBase)
    // floor-halving preserves the energy ORDER except near-exact ties
    val hHalf = hashOf(Multimodal.scaleAmplitudeExact(base, 2L, 2))
    assert(java.lang.Long.bitCount(hBase ^ hHalf) <= 2,
      s"halving moved ${java.lang.Long.bitCount(hBase ^ hHalf)} bits")
    // an unrelated clip is nowhere near
    val other = Multimodal.encodePcmWav(9L, "completely different content with other characters!")
    assert(java.lang.Long.bitCount(hBase ^ hashOf(other)) > 7)
  }

  test("imageHashes (Dataset path) equals the local per-image computation") {
    implicit val s = spark
    import spark.implicits._
    val recs = Seq(
      Multimodal.encodeBlockPng(10L, seed = 7L, w = 80, h = 72),
      Multimodal.encodeBlockPng(11L, seed = 8L, w = 100, h = 64))
    val got = Multimodal.imageHashes(recs.toDS()).collect().map(ih => ih.docId -> ih).toMap
    for (r <- recs) {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
      val dh = Multimodal.dHash64(img)
      val ah = Multimodal.aHash64(img)
      val ih = got(r.docId)
      assert((ih.dhashHi << 32 | ih.dhashLo) === dh)
      assert((ih.ahashHi << 32 | ih.ahashLo) === ah)
      assert(ih.width === img.getWidth && ih.height === img.getHeight)
    }
  }

  // ------------------------------------------------------------- video

  test("Y4M round-trip: encode → parse recovers geometry; frames are real container bytes") {
    val r = Multimodal.encodeBlockY4m(docId = 7L, seed = 42L, w = 24, h = 16, nFrames = 4)
    // the header is genuine ASCII YUV4MPEG2
    val header = new String(r.payload.takeWhile(_ != '\n'.toByte), "US-ASCII")
    assert(header === "YUV4MPEG2 W24 H16 F25:1 Ip A1:1 Cmono")
    val info = Multimodal.parseY4m(r.payload, 7L)
    assert(info.width === 24 && info.height === 16 && info.nFrames === 4)
    assert(r.meta.nFrames === 4 && r.meta.mediaType === "video/x-yuv4mpeg")
    // pixel (x, y) of frame f is the analytic block value — spot-check a few
    def lum(f: Int, x: Int, y: Int): Int = {
      val bx = x * 8 / 24; val by = y * 8 / 16
      (graft.functions.Hashing.h32Local(s"42#$f#$bx#$by") % 256L).toInt
    }
    val frameSize = 6 + 24 * 16 // "FRAME\n" + plane
    for (f <- 0 until 4; (x, y) <- Seq((0, 0), (23, 15), (11, 7))) {
      val off = info.firstFrameOffset + f * frameSize + 6 + y * 24 + x
      assert((r.payload(off) & 0xff) === lum(f, x, y), s"frame $f pixel ($x,$y)")
    }
  }

  test("dHash64Plane equals dHash64 on identical content") {
    // Render one frame's plane into a grayscale BufferedImage: the raw-
    // plane hash and the image hash must agree bit for bit.
    val r = Multimodal.encodeBlockY4m(1L, seed = 9L, w = 33, h = 21, nFrames = 1)
    val info = Multimodal.parseY4m(r.payload)
    val off = info.firstFrameOffset + 6
    val img = new java.awt.image.BufferedImage(33, 21, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 21; x <- 0 until 33)
      img.getRaster.setSample(x, y, 0, r.payload(off + y * 33 + x) & 0xff)
    assert(Multimodal.dHash64Plane(r.payload, off, 33, 21) === Multimodal.dHash64(img))
  }

  test("trimFramesExact keeps verbatim bytes; parse rejects corrupt/truncated payloads") {
    val base = Multimodal.encodeBlockY4m(10L, seed = 5L, w = 24, h = 16, nFrames = 3)
    val trimmed = Multimodal.trimFramesExact(base, 11L, keepFrames = 2)
    assert(Multimodal.parseY4m(trimmed.payload).nFrames === 2)
    // kept prefix is byte-identical (a trim touches no pixels)
    assert(trimmed.payload.toSeq === base.payload.take(trimmed.payload.length).toSeq)
    assert(trimmed.docId === 11L && trimmed.meta.nFrames === 2)
    // corrupt marker
    val bad = base.payload.clone()
    val info = Multimodal.parseY4m(base.payload)
    bad(info.firstFrameOffset) = 'X'.toByte
    val e1 = intercept[IllegalArgumentException] { Multimodal.parseY4m(bad, 99L) }
    assert(e1.getMessage.contains("99") && e1.getMessage.contains("FRAME"))
    // truncated body (not a whole number of frames)
    val e2 = intercept[IllegalArgumentException] { Multimodal.parseY4m(base.payload.dropRight(7), 98L) }
    assert(e2.getMessage.contains("whole number of"))
    // wrong magic
    intercept[RuntimeException] { Multimodal.parseY4m("JUNKHEADER\nxxxx".getBytes("US-ASCII")) }
  }

  test("videoFrameHashes: stride sampling over the Dataset path equals local per-frame hashing") {
    implicit val s = spark
    import spark.implicits._
    val recs = Seq(
      Multimodal.encodeBlockY4m(2L, seed = 1L, w = 24, h = 16, nFrames = 5),
      Multimodal.encodeBlockY4m(4L, seed = 2L, w = 30, h = 20, nFrames = 3)).toDS()
    val got = Multimodal.videoFrameHashes(recs, stride = 2).collect()
      .map(v => (v.docId, v.frameIdx) -> ((v.dhashHi << 32) | v.dhashLo)).toMap
    assert(got.keySet === Set(2L -> 0, 2L -> 2, 2L -> 4, 4L -> 0, 4L -> 2))
    for (((id, f), hash) <- got) {
      val r = if (id == 2L) Multimodal.encodeBlockY4m(2L, 1L, 24, 16, 5)
              else Multimodal.encodeBlockY4m(4L, 2L, 30, 20, 3)
      val info = Multimodal.parseY4m(r.payload)
      val off = info.firstFrameOffset + f * (6 + info.width * info.height) + 6
      assert(hash === Multimodal.dHash64Plane(r.payload, off, info.width, info.height), s"($id, $f)")
    }
  }

  test("scene-structured Y4M: frames within a scene are byte-identical, boundaries jump") {
    val r = Multimodal.encodeBlockY4m(3L, seed = 11L, w = 24, h = 16, nFrames = 6, sceneLen = 3)
    val info = Multimodal.parseY4m(r.payload)
    val frameSize = 6 + 24 * 16
    def plane(f: Int): Seq[Byte] =
      r.payload.slice(info.firstFrameOffset + f * frameSize + 6,
        info.firstFrameOffset + f * frameSize + 6 + 24 * 16).toSeq
    assert(plane(0) === plane(1) && plane(1) === plane(2), "scene 0 frames identical")
    assert(plane(3) === plane(4) && plane(4) === plane(5), "scene 1 frames identical")
    assert(plane(2) !== plane(3), "scene boundary changes content")
    // and the per-frame hashes agree: 0 within scenes, > 0 at the cut
    def dh(f: Int): Long =
      Multimodal.dHash64Plane(r.payload, info.firstFrameOffset + f * frameSize + 6, 24, 16)
    assert(dh(0) === dh(1) && dh(1) === dh(2) && dh(3) === dh(4))
    assert(dh(2) !== dh(3))
    // sceneLen = 1 (the default) keeps the near-dup fixtures' shape:
    // every frame its own pattern
    val nd = Multimodal.encodeBlockY4m(3L, 11L, 24, 16, 2)
    val ndInfo = Multimodal.parseY4m(nd.payload)
    assert(nd.payload.slice(ndInfo.firstFrameOffset + 6, ndInfo.firstFrameOffset + 6 + 24 * 16).toSeq
      === plane(0), "frame 0 of sceneLen=1 equals scene-0 content (same seed, scene index 0)")
  }

  test("routed video parse: corrupt containers route with doc ids, clean ones hash identically") {
    implicit val s = spark
    import spark.implicits._
    val good = Seq(
      Multimodal.encodeBlockY4m(2L, seed = 1L, w = 24, h = 16, nFrames = 4),
      Multimodal.encodeBlockY4m(4L, seed = 2L, w = 30, h = 20, nFrames = 3))
    // corruptions: flipped FRAME marker, truncated body, wrong magic
    val marker = {
      val bad = good.head.payload.clone()
      bad(Multimodal.parseY4m(good.head.payload).firstFrameOffset) = 'X'.toByte
      good.head.copy(docId = 9101L, payload = bad)
    }
    val truncated = good.head.copy(docId = 9102L, payload = good.head.payload.dropRight(5))
    val junk = good.head.copy(docId = 9103L, payload = "JUNK\nnotvideo".getBytes("US-ASCII"))
    val (clean, errors, release) =
      Multimodal.videoFrameHashesRouted((good ++ Seq(marker, truncated, junk)).toDS(), stride = 2)
    val cleanRows = clean.collect()
    val errRows = errors.collect()
    assert(errRows.map(_.docId).sorted.toSeq === Seq(9101L, 9102L, 9103L))
    assert(errRows.forall(_.stage == "video-parse"))
    // clean records hash bit-identically to the strict path
    val strict = Multimodal.videoFrameHashes(good.toDS(), stride = 2).collect()
      .map(v => (v.docId, v.frameIdx, v.dhashHi, v.dhashLo)).toSet
    assert(cleanRows.map(v => (v.docId, v.frameIdx, v.dhashHi, v.dhashLo)).toSet === strict)
    release()
  }

  test("fail-loud decode still throws on a corrupt payload (contract unchanged)") {
    implicit val s = spark
    import spark.implicits._
    val good = Multimodal
      .generatePngRecords(Tables.documents(spark, sf).filter(col("doc_id") < 2), "doc_id", "text")
      .collect()
      .toSeq
    val corrupt = Seq(good.head.copy(docId = 9003L, payload = Array.empty[Byte])).toDS()
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeImagesJdk(corrupt).collect()
    }
    assert(String.valueOf(e.getMessage).contains("9003") ||
      Option(e.getCause).exists(c => String.valueOf(c.getMessage).contains("9003")))
  }
}
