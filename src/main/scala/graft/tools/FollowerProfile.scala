package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.Sessions
import graft.examples.IndexFollower
import graft.functions.{AnnIndex, TableLog}

/** Throwaway-style profiler for the standing follower's per-apply fixed
  * cost (r12 verdict Next #4): ingests 100-doc batches and prints the
  * wall time of each catch-up stage, so the ~2 s/apply constant can be
  * attributed before it is attacked. Not part of the bench surface. */
object FollowerProfile {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    import spark.implicits._
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    val corpus = spark.read.parquet(sfDir + "/embeddings.parquet")
      .limit(1200)
      .select($"vec_id".as("doc_id"),
        concat(lit("document body text "), $"vec_id".cast("string")).as("text"),
        $"embedding")
      .as[(Long, String, Array[Float])].collect()

    val empty = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      org.apache.spark.sql.types.StructType.fromDDL(
        "vec_id LONG, embedding ARRAY<FLOAT>"))

    val root = Files.createTempDirectory("graft_fprof")
    val src = root.toString + "/src"
    val state = root.toString + "/state"
    val ddx = root.toString + "/ddx"
    val ann = AnnIndex.build(empty, "fprof_ann", planes = 8, buckets = 16)

    def timed[A](label: String)(body: => A): A = {
      val t = System.nanoTime()
      val r = body
      println(f"  $label%-28s ${(System.nanoTime() - t) / 1e6}%8.1f ms")
      r
    }

    val batches = corpus.grouped(100).toVector
    // warm-up apply: table creation, codegen, catalog
    TableLog.appendBatch(batches.head.toSeq.toDF("doc_id", "text", "embedding").coalesce(1),
      src, "src", 0L)
    IndexFollower.catchUp(spark, src, state, ann, ddx)

    (1 until math.min(6, batches.length)).foreach { i =>
      TableLog.appendBatch(batches(i).toSeq.toDF("doc_id", "text", "embedding").coalesce(1),
        src, "src", i.toLong)
      println(s"apply $i:")
      val total = System.nanoTime()
      // mirror catchUp's stages inline for attribution
      val applied = timed("appliedVersion+latest") {
        TableLog.latestVersion(spark, src); i - 1L
      }
      val registry = timed("tombstones+cut") {
        graft.functions.Materialize.cut(AnnIndex.tombstones(spark, ann)
          .withColumnRenamed("vec_id", "doc_id").distinct())
      }
      val (deltaOpt, _) = timed("appendsSince plan") {
        TableLog.appendsSince(spark, src, applied, applied + 1)
      }
      val d = timed("anti-join+persist+count") {
        val d0 = deltaOpt.get.join(broadcast(registry), Seq("doc_id"), "left_anti")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        d0.count(); d0
      }
      val banded = timed("dedup indexRows compute") {
        val b = graft.functions.DedupIndex.indexRows(
          d.select(col("doc_id"), col("text")))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        b.count(); b
      }
      timed("  raw write.parquet of banded") {
        banded.write.parquet(root.toString + s"/scratch-$i")
      }
      timed("dedup appendBatch (cached)") {
        TableLog.appendBatch(banded, ddx, "prof", applied + 1)
      }
      banded.unpersist(blocking = false)
      timed("ann keyed append") {
        AnnIndex.append(spark, ann,
          d.select(col("doc_id").as("vec_id"), col("embedding")), s"v${applied + 1}")
      }
      // sub-profile the ANN path's pieces (extra rows in the real
      // tables are harmless for a profiler)
      val enriched = timed("  ann enrich+persist+count") {
        val e = AnnIndex.enrich(
          d.select(col("doc_id").as("vec_id"), col("embedding")), 8)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        e.count(); e
      }
      timed("  ann vec insertInto") {
        enriched.select("vec_id", "embedding", "nrm")
          .write.insertInto(ann.vecTable)
      }
      timed("  ann probe insertInto") {
        enriched.select("vec_id", "bucket", "nrm", "q", "scale", "l1", "embedding")
          .write.insertInto(ann.probeTable)
      }
      enriched.unpersist(blocking = false)
      d.unpersist(blocking = false)
      graft.functions.Materialize.release(registry)
      println(f"  TOTAL                        ${(System.nanoTime() - total) / 1e6}%8.1f ms")
      // advance the real state dir so the next loop's applied version is right
      // (we bypassed catchUp, so mimic its checkpoint)
    }

    // ---- end-to-end: the StreamBench row-15 shape (append → signal →
    // catchUp per batch), fresh dirs, to read the docs/s directly
    val eRoot = Files.createTempDirectory("graft_fprof_e2e")
    val eSrc = eRoot.toString + "/src"
    val eAnn = AnnIndex.build(empty, "fprof_e2e_ann", planes = 8, buckets = 16)
    val eQ = IndexFollower.follow(spark, eSrc, eRoot.toString + "/state",
      eAnn, eRoot.toString + "/ddx")
    val eBatches = corpus.grouped(100).toVector
    TableLog.appendBatch(eBatches.head.toSeq.toDF("doc_id", "text", "embedding").coalesce(1),
      eSrc, "src", 0L)
    eQ.processAllAvailable()
    val t0 = System.nanoTime()
    var appendNs = 0L
    eBatches.tail.zipWithIndex.foreach { case (c, i) =>
      val ta = System.nanoTime()
      TableLog.appendBatch(c.toSeq.toDF("doc_id", "text", "embedding").coalesce(1),
        eSrc, "src", 1L + i)
      appendNs += System.nanoTime() - ta
      eQ.processAllAvailable()
    }
    val eSec = (System.nanoTime() - t0) / 1e9
    val eDocs = corpus.length - eBatches.head.length
    eQ.stop()
    println(f"e2e: ${eDocs / eSec}%.0f docs/s  (${eSec / eBatches.tail.length}%.2f s/batch, " +
      f"of which source appendBatch ${appendNs / 1e9 / eBatches.tail.length}%.2f s)")
    spark.stop()
  }
}
