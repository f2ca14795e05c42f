package graft.multimodal

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The image path decodes for real (javax.imageio); non-image blobs take
  * the deterministic fake. These tests pin both codec branches AND the
  * Spark plumbing around them — schema, batch shape, partition
  * preservation, frame sampling.
  */
class MultimodalSpec extends SparkSuite {
  import spark.implicits._
  import Multimodal._

  test("Codec.decodeImage: PNG round trip recovers dims and exact pixels") {
    val blob = SyntheticImages.gray(13, 7)((x, y) => (x * 11 + y * 29) % 256)
    assert(Codec.imageFormat(blob).contains("png"))
    val px = Codec.decodeImage(42L, blob).get
    assert(px == ImagePixels(42L, 13, 7, "png",
      pxTopLeft = 0, pxBottomRight = (12 * 11 + 6 * 29) % 256,
      pxSum = (for (x <- 0 until 13; y <- 0 until 7) yield (x * 11 + y * 29) % 256).sum))
  }

  test("Codec.decodeImage: BMP is sniffed and decoded too") {
    val blob = SyntheticImages.gray(5, 4, format = "bmp")((x, y) => 10 * x + y)
    assert(Codec.imageFormat(blob).contains("bmp"))
    val px = Codec.decodeImage(7L, blob).get
    assert((px.width, px.height, px.format) == (5, 4, "bmp"))
    assert(px.pxTopLeft == 0 && px.pxBottomRight == 43)
  }

  test("Codec.decode: image blobs take the real path (1 frame, raster features)") {
    val blob = SyntheticImages.gray(16, 16)((_, _) => 255) // all-white
    val (meta, frames) = Codec.decode(5L, blob)
    assert(meta == MediaMeta(5L, blob.length.toLong, 16, 16, frames = 1))
    val fs = frames.toVector
    assert(fs.map(_.frameIdx) == Vector(0))
    // all-255 raster → every stripe mean is exactly 1.0
    assert(fs.head.features.forall(f => math.abs(f - 1.0f) < 1e-6f))
  }

  test("Codec.decode: non-image bytes fall back to the deterministic fake") {
    val bytes = "definitely not an image".getBytes("UTF-8")
    assert(Codec.imageFormat(bytes).isEmpty)
    val (meta, _) = Codec.decode(9L, bytes)
    val n = bytes.length.toLong
    assert(meta == MediaMeta(9L, n, (16 + n % 64).toInt, (16 + n % 48).toInt, (1 + n % 8).toInt))
  }

  test("decodeMeta: distributed real decode of a mixed image/non-image batch") {
    val png = SyntheticImages.gray(20, 10)((x, y) => x + y)
    val ds = spark.createDataset(Seq((1L, png), (2L, "plain bytes!".getBytes("UTF-8"))))
    val got = decodeMeta(ds).collect().sortBy(_.docId)
    assert(got(0) == MediaMeta(1L, png.length.toLong, 20, 10, 1)) // real decode
    assert((got(1).width, got(1).height) == (28, 28)) // fake: 16 + 12%64/%48
  }

  private def blobs = Seq(
    (1L, "tiny".getBytes("UTF-8")),
    (2L, ("x" * 100).getBytes("UTF-8")),
    (3L, ("media-bytes-" * 25).getBytes("UTF-8"))
  )

  test("withMeta derives the oracle-checked metadata columns") {
    val df = blobs.toDF("doc_id", "blob")
    val got = withMeta(df).select($"doc_id", $"n_bytes", $"fake_frames")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, 4L, 5L), (2L, 100L, 5L), (3L, 300L, 5L)))
  }

  test("frameFeatures: one row per frame, deterministic across runs") {
    val ds = spark.createDataset(blobs)
    val a = frameFeatures(ds).collect().sortBy(f => (f.docId, f.frameIdx))
    val b = frameFeatures(ds).collect().sortBy(f => (f.docId, f.frameIdx))
    // frames = 1 + nBytes % 8 → 5 frames each for 4/100/300 bytes
    assert(a.map(_.docId).toSeq.distinct == Seq(1L, 2L, 3L))
    assert(a.count(_.docId == 1L) == 5)
    assert(a.map(f => (f.docId, f.frameIdx, f.features.toSeq)).toSeq ==
      b.map(f => (f.docId, f.frameIdx, f.features.toSeq)).toSeq)
  }

  test("frameFeatures: sampleEvery keeps every k-th frame") {
    val ds = spark.createDataset(blobs)
    val sampled = frameFeatures(ds, sampleEvery = 2).collect()
    assert(sampled.forall(_.frameIdx % 2 == 0))
    assert(sampled.count(_.docId == 2L) == 3) // frames 0, 2, 4
  }

  test("frameFeatures preserves partitioning (no shuffle in the plan)") {
    val ds = spark.createDataset(blobs).repartition(3)
    val plan = frameFeatures(ds).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") || plan.indexOf("Exchange") > plan.indexOf("SerializeFromObject"),
      s"decode stage should not introduce a shuffle:\n$plan")
  }

  test("resizeFeatures mean-pools to the target dimension") {
    val ds = spark.createDataset(blobs)
    val resized = resizeFeatures(frameFeatures(ds), dim = 4).collect()
    assert(resized.forall(_.features.length == 4))
  }
}
