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

  test("Codec.decode: animated GIF yields real frame count and per-frame features") {
    // 3 frames, binary palette (0/255 survive GIF palettization exactly):
    // frame f is all-white above row f, all-black below → stripe means
    // shift monotonically with f
    val blob = SyntheticImages.animatedGray(8, 8, 3)((_, y, f) =>
      if (y <= f * 2) 255 else 0)
    val (meta, framesIt) = Codec.decode(42L, blob)
    val frames = framesIt.toVector
    assert(meta == Multimodal.MediaMeta(42L, blob.length.toLong, 8, 8, 3))
    assert(frames.map(_.frameIdx) == Vector(0, 1, 2))
    // more white rows → larger total feature mass, strictly increasing
    val mass = frames.map(_.features.sum)
    assert(mass(0) < mass(1) && mass(1) < mass(2), s"feature mass $mass")
    // frame 0: only row 0 white → stripe 0 = 1.0, stripes 1..7 = 0
    assert(frames(0).features(0) == 1.0f)
    assert(frames(0).features.drop(1).forall(_ == 0.0f))
  }

  test("frameFeatures: sampleEvery subsamples a real animated container") {
    val blob = SyntheticImages.animatedGray(4, 4, 5)((_, _, f) =>
      if (f % 2 == 0) 255 else 0)
    val ds = spark.createDataset(Seq(7L -> blob))
    val got = frameFeatures(ds, sampleEvery = 2).collect().sortBy(_.frameIdx)
    assert(got.map(_.frameIdx).toSeq == Seq(0, 2, 4))
    assert(got.forall(_.features(0) == 1.0f)) // sampled frames are the white ones
  }

  test("Codec.decodeVideo: MJPEG AVI round trip recovers frames, order, exact flat pixels") {
    val blob = SyntheticVideo.mjpegAviFlat(w = 24, h = 16, nFrames = 4)(f => 40 + f * 50)
    assert(Codec.videoFormat(blob).contains("avi"))
    val (dw, dh, payloads) = Codec.demuxAvi(blob).get
    assert((dw, dh, payloads.size) == (24, 16, 4))
    // every demuxed frame payload is a standalone JPEG
    payloads.foreach(p => assert(Codec.imageFormat(p).contains("jpeg")))
    val vp = Codec.decodeVideo(9L, blob).get
    assert(vp == VideoPixels(9L, 24, 16, 4,
      firstGray = 40, lastGray = 190,
      pxSum = 24L * 16 * (40 + 90 + 140 + 190)))
  }

  test("Codec.decode: AVI blobs take the real multi-frame path") {
    val blob = SyntheticVideo.mjpegAviFlat(16, 16, 3)(f => f * 100)
    val (meta, frames) = Codec.decode(3L, blob)
    assert(meta == MediaMeta(3L, blob.length.toLong, 16, 16, frames = 3))
    val fs = frames.toVector
    assert(fs.map(_.frameIdx) == Vector(0, 1, 2))
    // flat frames → every stripe mean is exactly gray/255
    fs.zipWithIndex.foreach { case (ff, f) =>
      ff.features.foreach(v => assert(math.abs(v - f * 100 / 255f) < 1e-6f))
    }
  }

  test("Codec.demuxAvi: truncated or non-AVI bytes return None, fake untouched") {
    val blob = SyntheticVideo.mjpegAviFlat(16, 8, 2)(_ => 128)
    assert(Codec.demuxAvi(java.util.Arrays.copyOf(blob, 60)).isEmpty)
    assert(Codec.demuxAvi("RIFFxxxxWAVEdata".getBytes).isEmpty)
    // torn MID-movi (after intact frames): the whole blob is void — the
    // contract is well-formed-or-None, never partial frame facts for a
    // truncated upload
    val multi = SyntheticVideo.mjpegAviFlat(16, 8, 4)(f => 40 * (f + 1))
    assert(Codec.demuxAvi(multi).get._3.size == 4)
    assert(Codec.demuxAvi(java.util.Arrays.copyOf(multi, multi.length - 10)).isEmpty)
    // trailing junk PAST the declared RIFF size does not void the file —
    // a spec reader never looks beyond the declared extent
    val padded = java.util.Arrays.copyOf(multi, multi.length + 16)
    java.util.Arrays.fill(padded, multi.length, padded.length, 0xFF.toByte)
    assert(Codec.demuxAvi(padded).get._3.size == 4)
    val (meta, _) = Codec.decode(1L, Array.fill[Byte](100)(7))
    assert(meta.width == 16 + 100 % 64) // deterministic fake branch
  }

  test("Codec.decodeAudio: WAV round trip recovers format and exact samples") {
    val samples = Array(0, 1000, -1000, 32767, -32768, 7)
    val blob = SyntheticAudio.pcm16(samples.length, 16000)(samples(_))
    val pcm = Codec.decodeAudio(9L, blob).get
    assert(pcm == AudioPcm(9L, 16000, 1, 16, samples.length,
      firstSample = 0, lastSample = 7,
      absSum = samples.map(s => math.abs(s.toLong)).sum))
  }

  test("Codec.decodeAudio: hand-built RIFF bytes pin the parser conventions") {
    // minimal RIFF/WAVE, PCM s16le mono 8 kHz, two samples: 258 (0x0102
    // little-endian) and -2 (0xFFFE) — independent of SyntheticAudio, so
    // endianness or header-offset bugs cannot cancel out
    val data = Array[Int](0x02, 0x01, 0xfe, 0xff).map(_.toByte)
    val out = new java.io.ByteArrayOutputStream()
    def ascii(s: String) = out.write(s.getBytes("US-ASCII"))
    def le32(v: Int) = (0 to 3).foreach(i => out.write((v >> (8 * i)) & 0xff))
    def le16(v: Int) = (0 to 1).foreach(i => out.write((v >> (8 * i)) & 0xff))
    ascii("RIFF"); le32(36 + data.length); ascii("WAVE")
    ascii("fmt "); le32(16); le16(1); le16(1); le32(8000); le32(16000); le16(2); le16(16)
    ascii("data"); le32(data.length); out.write(data)
    val pcm = Codec.decodeAudio(1L, out.toByteArray).get
    assert(pcm == AudioPcm(1L, 8000, 1, 16, 2,
      firstSample = 258, lastSample = -2, absSum = 260L))
  }

  test("Codec.decodeAudio: non-audio bytes return None (fake path untouched)") {
    assert(Codec.decodeAudio(1L, Array[Byte](1, 2, 3, 4)).isEmpty)
    assert(Codec.decodeAudio(1L,
      SyntheticImages.gray(4, 4)((_, _) => 0)).isEmpty) // image != audio
    // image decode likewise rejects WAV bytes
    assert(Codec.decodeImage(1L,
      SyntheticAudio.pcm16(4, 8000)(_ => 0)).isEmpty)
  }

  test("decodeAudio: distributed decode over a mixed batch keeps only real WAVs") {
    val rows: Seq[(Long, Array[Byte])] = Seq(
      1L -> SyntheticAudio.pcm16(10, 8000)(i => i * 100),
      2L -> Array[Byte](9, 9, 9, 9), // not audio
      3L -> SyntheticAudio.pcm16(5, 24000)(_ => -1))
    val got = decodeAudio(spark.createDataset(rows).repartition(2))
      .collect().sortBy(_.docId)
    assert(got.map(p => (p.docId, p.sampleRate, p.nSamples)).toSeq ==
      Seq((1L, 8000, 10L), (3L, 24000, 5L)))
  }
}
