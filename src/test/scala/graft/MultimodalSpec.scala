package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.operators.Multimodal.{DecodedImage, MediaRecord}

/** Multimodal plumbing: payload/metadata schema, partition-batched
  * decode, resize, and frame sampling — all with the deterministic
  * stub decoders (real codecs are out of scope for this container;
  * the Spark-side shapes are what's under test).
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
}
