package graft.multimodal

import java.awt.image.BufferedImage
import java.io.ByteArrayInputStream

import javax.imageio.ImageIO

/** Perceptual image hashing (dHash) for near-duplicate image detection —
  * the image-content analogue of the text simhash (reference streamz has
  * no image ops; this is north-star pipeline surface, the LAION-style
  * first image pass).
  *
  * dHash: reduce the luminance raster to a 9×8 grid of block means, then
  * emit one bit per horizontally adjacent pair (bit = right cell brighter
  * than left cell) — 8×8 = 64 bits. Robust to re-encoding (JPEG quality,
  * PNG↔BMP), uniform resizing, and small brightness shifts, because block
  * means move together and only the ~equal pairs can flip; PhashSpec pins
  * this on real re-encoded/resized variants.
  *
  * Everything is INTEGER math on a fixed traversal (block mean = floor of
  * sum/count; cell of pixel x is `x*9/w`) so the hash is bit-identical on
  * any JVM and recomputable in SQL — which is what lets the oracle check
  * `dedup_image_phash` end-to-end. NOT a Catalyst Expression on purpose:
  * the input of the hot path is a decoded [[BufferedImage]] inside the
  * same mapPartitions pass that ran the codec (images never sit decoded
  * in a column), so an Expression would only add a binary→binary codegen
  * boundary around ImageIO, which dominates the cost and cannot codegen.
  *
  * The 64-bit hash is returned as two unsigned-32-bit halves carried in
  * longs: Hamming distance and 16-bit banding then use only `xor`,
  * `bit_count`, `%` and `//` on NON-NEGATIVE integers, the exact
  * intersection of Spark and DuckDB semantics (no sign-extension traps).
  */
object Phash {

  // Heap-only ImageIO streams (see Multimodal's initializer — duplicated
  // here because dhashBlob callers may touch Phash without ever loading
  // Multimodal, and object initializers only run on first reference).
  ImageIO.setUseCache(false)

  /** Grid shape: 9 columns × 8 rows of block means → 8×8 comparison bits. */
  val GridCols = 9
  val GridRows = 8

  /** dHash of a decoded image as (hi, lo): bit k (k = cy*8 + cx, cx,cy ∈
    * [0,8)) is 1 iff mean(cx+1, cy) > mean(cx, cy); bits 0..31 in `lo`,
    * 32..63 in `hi`, both in [0, 2^32). Luminance is band 0 for gray
    * rasters and the integer Rec.601 mix (299r + 587g + 114b) / 1000 for
    * color. Needs at least a 9×8 raster. */
  def dhash(img: BufferedImage): (Long, Long) = {
    val w = img.getWidth
    val h = img.getHeight
    require(w >= GridCols && h >= GridRows,
      s"dhash needs at least ${GridCols}x$GridRows pixels, got ${w}x$h")
    val raster = img.getRaster
    val color = raster.getNumBands >= 3
    val sums = new Array[Long](GridRows * GridCols)
    val counts = new Array[Long](GridRows * GridCols)
    var y = 0
    while (y < h) {
      val cy = y * GridRows / h
      var x = 0
      while (x < w) {
        val lum =
          if (color)
            (299 * raster.getSample(x, y, 0) + 587 * raster.getSample(x, y, 1) +
              114 * raster.getSample(x, y, 2)) / 1000
          else raster.getSample(x, y, 0)
        val c = cy * GridCols + x * GridCols / w
        sums(c) += lum
        counts(c) += 1
        x += 1
      }
      y += 1
    }
    var hi = 0L
    var lo = 0L
    var cy = 0
    while (cy < GridRows) {
      var cx = 0
      while (cx < GridCols - 1) {
        val left = sums(cy * GridCols + cx) / counts(cy * GridCols + cx)
        val right = sums(cy * GridCols + cx + 1) / counts(cy * GridCols + cx + 1)
        if (right > left) {
          val k = cy * (GridCols - 1) + cx
          if (k < 32) lo |= 1L << k else hi |= 1L << (k - 32)
        }
        cx += 1
      }
      cy += 1
    }
    (hi, lo)
  }

  /** dHash of an encoded image blob (any container `javax.imageio`
    * reads), or None when the blob is not a decodable image OR decodes
    * smaller than the 9×8 grid (1×1 tracking pixels are common in a web
    * crawl; a sub-grid image has no meaningful block structure and must
    * not crash the pipeline — it simply never pairs). */
  def dhashBlob(bytes: Array[Byte]): Option[(Long, Long)] =
    Multimodal.Codec.imageFormat(bytes).flatMap { _ =>
      Option(ImageIO.read(new ByteArrayInputStream(bytes)))
        .filter(img => img.getWidth >= GridCols && img.getHeight >= GridRows)
        .map(dhash)
    }

  /** Hamming distance between two (hi, lo) hashes. */
  def hamming(a: (Long, Long), b: (Long, Long)): Int =
    java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)
}
