package graft.multimodal

import java.awt.RenderingHints
import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import graft.SparkSuite

/** Phash.dhash on REAL near-duplicate images: the re-encoded / resized /
  * brightened variants a LAION-style pipeline must pair stay within the
  * Hamming-3 verify threshold, unrelated images stay far away, and the
  * banded blocking (DedupOps.phashPairs) returns exactly the brute-force
  * pair set — the recall-exactness claim, exercised where the decode
  * can't be recomputed in SQL (the oracle query covers the SQL-checkable
  * synthetic path).
  */
class PhashSpec extends SparkSuite {

  /** Smooth structured test image: a seeded 9×8 thumbnail upscaled
    * bilinearly — low-frequency content, the kind of image dHash is
    * designed for. Each row is a linear permutation of {0..8} scaled by
    * 22 levels, so every adjacent-cell difference is ≥ 22: decisive
    * comparisons that survive resize/re-encode noise, while the per-row
    * (multiplier, offset) varies with the seed so distinct seeds give
    * structurally different bit patterns (identical only for seeds ≡ mod
    * 18 — the seeds below keep clear of that). */
  private def smoothImage(seed: Int, w: Int, h: Int): BufferedImage = {
    val thumb = new BufferedImage(9, 8, BufferedImage.TYPE_BYTE_GRAY)
    val tr = thumb.getRaster
    val mults = Array(1, 2, 4, 5, 7, 8) // coprime to 9 → each row a permutation
    for (cy <- 0 until 8) {
      val a = mults((seed + cy) % 6)
      val b = (seed * 37 + cy * 5) % 9
      for (cx <- 0 until 9)
        tr.setSample(cx, cy, 0, 30 + ((cx * a + b) % 9) * 22)
    }
    scaled(thumb, w, h)
  }

  private def scaled(img: BufferedImage, w: Int, h: Int): BufferedImage = {
    val out = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val g = out.createGraphics()
    g.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
      RenderingHints.VALUE_INTERPOLATION_BILINEAR)
    g.drawImage(img, 0, 0, w, h, null)
    g.dispose()
    out
  }

  private def brightened(img: BufferedImage, delta: Int): BufferedImage = {
    val out = new BufferedImage(img.getWidth, img.getHeight, BufferedImage.TYPE_BYTE_GRAY)
    val (ri, ro) = (img.getRaster, out.getRaster)
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
      ro.setSample(x, y, 0, math.min(255, math.max(0, ri.getSample(x, y, 0) + delta)))
    out
  }

  private def encode(img: BufferedImage, fmt: String): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    require(ImageIO.write(img, fmt, out), s"no JDK writer for $fmt")
    out.toByteArray
  }

  private def hashOf(bytes: Array[Byte]): (Long, Long) =
    Phash.dhashBlob(bytes).getOrElse(fail("fixture blob did not decode"))

  test("dhash: re-encode/resize/brightness variants stay within Hamming 3; unrelated images far") {
    val base = smoothImage(seed = 7, 96, 72)
    val baseHash = hashOf(encode(base, "png"))
    val variants = Map(
      "jpeg_reencode" -> hashOf(encode(base, "jpg")),
      "bmp_reencode" -> hashOf(encode(base, "bmp")),
      "downscale_half" -> hashOf(encode(scaled(base, 48, 36), "png")),
      "upscale_double" -> hashOf(encode(scaled(base, 192, 144), "png")),
      "brightness_+10" -> hashOf(encode(brightened(base, 10), "png")),
      "jpeg_of_downscale" -> hashOf(encode(scaled(base, 48, 36), "jpg")))
    variants.foreach { case (name, hsh) =>
      val d = Phash.hamming(baseHash, hsh)
      assert(d <= 3, s"$name drifted to Hamming $d from the base")
    }
    // distinct seeds = unrelated content: must sit far outside the verify
    // threshold (expected ~32 for independent bits)
    (1 to 5).foreach { s =>
      val d = Phash.hamming(baseHash, hashOf(encode(smoothImage(s, 96, 72), "png")))
      assert(d > 10, s"unrelated seed $s landed at Hamming $d of the base")
    }
  }

  test("dhash: color and gray renderings of the same content agree") {
    val gray = smoothImage(seed = 3, 96, 72)
    val rgb = new BufferedImage(96, 72, BufferedImage.TYPE_INT_RGB)
    val g = rgb.createGraphics()
    g.drawImage(gray, 0, 0, null)
    g.dispose()
    // r=g=b → Rec.601 luminance equals the gray sample exactly
    assert(Phash.hamming(Phash.dhash(gray), Phash.dhash(rgb)) == 0)
  }

  test("first-frame dhash of a block-flat MJPEG AVI equals the arithmetic hash of its grays") {
    // 72×64 = 9×8 JPEG blocks aligning exactly with the dHash grid, so
    // each dHash cell mean IS the block gray — the bit-exact bridge that
    // lets the video near-dup oracle recompute the hash in SQL while
    // Spark runs the real demux + JPEG decode. Frame 1 carries a
    // different pattern: hashing the wrong frame cannot pass.
    def gray(f: Int, bx: Int, by: Int): Int = (bx * 31 + by * 17 + f * 77) % 128
    val blob = Multimodal.SyntheticVideo.mjpegAviBlocks(72, 64, 2)(gray)
    val (w, h, frames) = Multimodal.Codec.demuxAvi(blob).get
    assert((w, h, frames.size) == ((72, 64, 2)))
    val got = Phash.dhashBlob(frames.head).get
    var hi = 0L
    var lo = 0L
    for (cy <- 0 until 8; cx <- 0 until 8)
      if (gray(0, cx + 1, cy) > gray(0, cx, cy)) {
        val k = cy * 8 + cx
        if (k < 32) lo |= 1L << k else hi |= 1L << (k - 32)
      }
    assert(got == ((hi, lo)),
      f"decoded-frame hash ${got} != arithmetic ${(hi, lo)}")
    assert(Phash.dhashBlob(frames(1)).get != got, "frames must differ")
  }

  test("dhashBlob: a decodable-but-sub-grid image (tracking pixel) is None, not a crash") {
    val px = new BufferedImage(1, 1, BufferedImage.TYPE_BYTE_GRAY)
    assert(Phash.dhashBlob(encode(px, "png")).isEmpty)
    assert(Phash.dhashBlob(encode(new BufferedImage(8, 8, BufferedImage.TYPE_BYTE_GRAY), "png")).isEmpty)
    assert(Phash.dhashBlob(encode(new BufferedImage(9, 8, BufferedImage.TYPE_BYTE_GRAY), "png")).isDefined)
  }

  test("phashPairs raises on hashes outside the unsigned-half contract") {
    import spark.implicits._
    val bad = Seq((1L, -1L, 7L), (2L, 3L, 4L)).toDF("doc_id", "h_hi", "h_lo")
    val e = intercept[Exception] {
      graft.queries.DedupOps.phashPairs(bad, 3).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("outside [0, 2^32)")), e.toString)
  }

  test("phashPairs equals the brute-force Hamming scan on a planted fixture") {
    import spark.implicits._
    // 4 near-dup families (base + 2 variants each) + 8 unrelated singles
    val blobs: Seq[(Long, (Long, Long))] =
      (0 until 4).flatMap { fam =>
        val base = smoothImage(seed = 100 + fam, 96, 72)
        Seq(
          (fam * 3L, hashOf(encode(base, "png"))),
          (fam * 3L + 1, hashOf(encode(base, "jpg"))),
          (fam * 3L + 2, hashOf(encode(scaled(base, 48, 36), "png"))))
      } ++ (0 until 8).map(u => (100L + u, hashOf(encode(smoothImage(200 + u, 96, 72), "png"))))
    val expected = (for {
      (ia, ha) <- blobs; (ib, hb) <- blobs
      if ia < ib && Phash.hamming(ha, hb) <= 3
    } yield (ia, ib, Phash.hamming(ha, hb))).toSet
    // each family must contribute its base→variant pairs, or the test is
    // vacuous (variant↔variant can legitimately drift past 3)
    assert(expected.size >= 4 * 2, s"planted families produced only $expected")
    val df = blobs.map { case (id, (hi, lo)) => (id, hi, lo) }.toDF("doc_id", "h_hi", "h_lo")
    val got = graft.queries.DedupOps.phashPairs(df, 3)
      .as[(Long, Long, Int)].collect().map(t => (t._1, t._2, t._3)).toSet
    assert(got == expected, s"banded=${got.size} brute=${expected.size}; diff=${got.diff(expected) ++ expected.diff(got)}")
  }
}
