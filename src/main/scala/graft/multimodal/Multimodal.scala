package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video travel as opaque `binary`
  * columns with typed metadata; decode / feature-extract / frame-sample run
  * partition-at-a-time so the (expensive, native) codec is amortized across
  * a batch and the plan stays narrow — no shuffle anywhere in this module.
  *
  * The codec itself is STUBBED: this container has no image/audio
  * libraries, so [[Codec.decode]] is a clearly-marked deterministic fake
  * that derives every output from the bytes alone (same bytes → same
  * "decode" on any executor — required for retry/speculation safety).
  * The Spark-side plumbing — schema, encoders, partition-preserving
  * batch shape, metadata pushdown — is real and tested
  * (graft.multimodal.MultimodalSpec).
  */
object Multimodal {

  /** Typed metadata carried alongside a media blob. */
  case class MediaMeta(docId: Long, nBytes: Long, width: Int, height: Int, frames: Int)

  /** One sampled frame's feature vector. */
  case class FrameFeatures(docId: Long, frameIdx: Int, features: Array[Float])

  /** The codec boundary. A real deployment swaps this object for one
    * backed by an image/audio library; everything downstream is unchanged.
    */
  object Codec {
    /** Deterministic fake decode: metadata derived from the byte length
      * (matching the `multimodal_meta` oracle query) and per-frame features
      * derived from a rolling byte hash. Replace with a real codec
      * (`javax.imageio`, ffmpeg bindings, ...) outside this container.
      */
    def decode(docId: Long, bytes: Array[Byte]): (MediaMeta, Iterator[FrameFeatures]) = {
      val n = bytes.length.toLong
      val meta = MediaMeta(docId, n,
        width = (16 + n % 64).toInt, height = (16 + n % 48).toInt,
        frames = (1 + n % 8).toInt)
      val frames = Iterator.tabulate(meta.frames) { f =>
        // rolling-hash features over a frame-specific byte stride
        val dim = 8
        val feats = new Array[Float](dim)
        var h = 1125899906842597L * (f + 1)
        var i = f
        while (i < bytes.length) {
          h = h * 31 + (bytes(i) & 0xff)
          feats(i % dim) += ((h >>> 40) & 0xff).toFloat / 255f
          i += meta.frames
        }
        FrameFeatures(docId, f, feats)
      }
      (meta, frames)
    }
  }

  /** Attach decoded metadata columns derived from `blobCol`. Narrow —
    * pure per-row expressions, schema known at plan time. */
  def withMeta(df: DataFrame, blobCol: String = "blob"): DataFrame =
    df.withColumn("n_bytes", length(col(blobCol)).cast("long"))
      .withColumn("fake_width", lit(16L) + length(col(blobCol)).cast("long") % 64L)
      .withColumn("fake_height", lit(16L) + length(col(blobCol)).cast("long") % 48L)
      .withColumn("fake_frames", lit(1L) + length(col(blobCol)).cast("long") % 8L)

  /** Frame-sampled feature extraction: one output row per sampled frame.
    * Runs partition-at-a-time (the Scala analogue of a pandas `mapInPandas`
    * batch UDF) so codec setup cost is paid once per partition, and the
    * input partitioning is preserved — at 100 TB each executor decodes its
    * own parquet splits with zero data movement.
    */
  def frameFeatures(ds: Dataset[(Long, Array[Byte])], sampleEvery: Int = 1)(
      implicit enc: org.apache.spark.sql.Encoder[FrameFeatures]): Dataset[FrameFeatures] = {
    require(sampleEvery >= 1, s"sampleEvery must be >= 1, got $sampleEvery")
    ds.mapPartitions { it =>
      // per-partition codec setup would go here (native lib init, etc.)
      it.flatMap { case (id, bytes) =>
        val (_, frames) = Codec.decode(id, bytes)
        frames.filter(_.frameIdx % sampleEvery == 0)
      }
    }
  }

  /** "Resize": deterministic re-bucketing of decoded features to a target
    * dimension (mean-pool style), again a narrow map. */
  def resizeFeatures(ds: Dataset[FrameFeatures], dim: Int)(
      implicit enc: org.apache.spark.sql.Encoder[FrameFeatures]): Dataset[FrameFeatures] =
    ds.map { ff =>
      val out = new Array[Float](dim)
      val counts = new Array[Int](dim)
      var i = 0
      while (i < ff.features.length) {
        val j = i * dim / math.max(ff.features.length, 1)
        out(j) += ff.features(i); counts(j) += 1
        i += 1
      }
      var j = 0
      while (j < dim) { if (counts(j) > 0) out(j) /= counts(j); j += 1 }
      ff.copy(features = out)
    }
}
