package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** MinHash LSH banding, shared by the batch dedup pipeline
  * (`queries.DedupOps`) and the streaming variant (`streaming.Dedup`) —
  * one definition so bucket ids can never skew between the two: a doc
  * deduplicated against a batch-built corpus and one arriving on a stream
  * land in identical buckets.
  */
object Lsh {

  /** Embedding near-dup banding geometry + verification threshold —
    * shared by batch dedup_embed_cosine / dedup_semantic and streaming
    * Dedup.semanticVerdicts so a retune can never fork the two: 32
    * sign-LSH planes as 4 bands of 8 bits (P(band collision) ≈ 1/256
    * for near-orthogonal vectors — selective at any corpus size), pairs
    * verified at exact cosine ≥ 0.35 (the corpus's natural high-cosine
    * tail; threshold-generic operators take it as a parameter default). */
  val EmbedPlanes = 32
  val EmbedBands = 4
  val EmbedBandBits: Int = EmbedPlanes / EmbedBands
  val EmbedCosineThreshold = 0.35

  /** Array of `numBands` band-hash strings over a MinHash signature
    * array: band b = md5 of its ordered "h:sig" components (h the 1-based
    * signature index, so bands of equal sig values in different positions
    * cannot collide). */
  def bandHashes(sigs: Column, numBands: Int, bandSize: Int): Column =
    transform(sequence(lit(0), lit(numBands - 1)), b =>
      md5(array_join(array_sort(
        transform(sequence(lit(1), lit(bandSize)), j =>
          concat((b * bandSize + j).cast("string"), lit(":"),
            element_at(sigs, b * bandSize + j)))), ",")))

  /** Per-band bucket array over a sign-LSH signature long: element b =
    * band b's `bandBits`-bit bucket. Shared by batch dedup_semantic /
    * dedup_embed_cosine-style banding and the streaming semantic
    * verdicts, so a vector banded in batch and one arriving on a stream
    * land in identical buckets. */
  def embedBandBuckets(sig: Column, numBands: Int, bandBits: Int): Column =
    array((0 until numBands).map(b =>
      shiftright(sig, b * bandBits).bitwiseAND(lit((1L << bandBits) - 1))): _*)

  /** Nearest-centroid id by the exact-decimal L2 score — the
    * dedup_semantic / similarity_ivf coarse quantizer as ONE narrow
    * per-row expression: score_j = ||c_j||² − 2·v·c_j with ||c_j||²
    * computed as nrm_j² (nrm_j = sqrt of the exact decimal self-dot,
    * cast to double — EXACTLY the column arithmetic the batch plans and
    * the DuckDB oracles use, sqrt-then-square ulp and all), argmin with
    * the (score, cid) tiebreak via least() over the centroid structs.
    * No shuffle, no aggregation: the centroid set is a driver-side
    * constant (a frozen quantizer is small by definition). */
  def nearestCentroid(embedding: Column, centroids: Seq[(Long, Array[Float])]): Column = {
    require(centroids.nonEmpty, "nearestCentroid: need at least one centroid")
    val scored = centroids.map { case (cid, cemb) =>
      val nrm = math.sqrt(ExprKernels.decimalDot(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(cemb),
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(cemb)))
      struct(
        (lit(nrm * nrm) - lit(2.0) * native.decimal_dot(embedding, typedlit(cemb))
          .cast("double")).as("s"),
        lit(cid).as("c"))
    }
    (if (scored.size == 1) scored.head else least(scored: _*)).getField("c")
  }

  /** Loud guard for the unsigned-32-bit-half fingerprint contract
    * (Phash/Afp hashes travel as two longs in [0, 2^32)): passes the
    * value through, raises on anything outside the domain. The 16-bit
    * banding would otherwise MISS pairs silently — `% 65536` of a
    * negative long is negative and `shiftright` sign-extends, so an
    * out-of-contract hash (e.g. a raw 64-bit simhash packed into one
    * negative long) lands in garbage buckets and the pigeonhole
    * completeness proof no longer holds. Lives inside the banding
    * expression, so column pruning cannot drop the check. */
  def unsignedHalf(c: Column, name: String): Column =
    when(c >= 0L && c <= 4294967295L, c).otherwise(raise_error(
      // coalesce: a NULL hash fires this branch too (three-valued when),
      // and concat would null-poison the crafted message exactly when
      // it is needed
      concat(lit(s"fingerprint banding: $name outside [0, 2^32): "),
        coalesce(c.cast("string"), lit("NULL")))))
}
