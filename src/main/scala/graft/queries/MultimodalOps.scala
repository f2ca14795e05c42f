package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north star): media as opaque binary columns
  * with typed metadata. The decode itself is stubbed — no image/audio libs
  * in this container; [[graft.multimodal.Multimodal.Codec]] holds the
  * deterministic fake decoder behind the real partition-at-a-time
  * plumbing (schema, encoders, frame sampling — see MultimodalSpec).
  * This query pins the binary-column schema path and the metadata
  * derivation (same formulas as Multimodal.withMeta) against the oracle.
  */
object MultimodalOps extends QueryGroup {

  override def queries: Map[String, Q] = Map(
    "multimodal_meta" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .select($"doc_id", $"text".cast("binary").as("blob"), $"source")
        .select(
          $"doc_id", $"source",
          length($"blob").cast("long").as("n_bytes"),
          (lit(16L) + length($"blob").cast("long") % 64L).as("fake_width"),
          (lit(16L) + length($"blob").cast("long") % 48L).as("fake_height"),
          (lit(1L) + length($"blob").cast("long") % 8L).as("fake_frames"))
    })
  )

  override def oracle: Map[String, String] = Map(
    "multimodal_meta" ->
      """SELECT doc_id, source,
        |  octet_length(encode(text)) AS n_bytes,
        |  16 + octet_length(encode(text)) % 64 AS fake_width,
        |  16 + octet_length(encode(text)) % 48 AS fake_height,
        |  1 + octet_length(encode(text)) % 8 AS fake_frames
        |FROM documents""".stripMargin
  )
}
