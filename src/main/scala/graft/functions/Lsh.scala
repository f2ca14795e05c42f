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
