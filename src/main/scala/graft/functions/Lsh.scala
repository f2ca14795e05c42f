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
}
