package graft.multimodal

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The decode is a deterministic stub; the Spark plumbing around it —
  * schema, batch shape, partition preservation, frame sampling — is what
  * these tests pin down.
  */
class MultimodalSpec extends SparkSuite {
  import spark.implicits._
  import Multimodal._

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
