package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.min

/** Streaming dedup surface: exact (dropDuplicates + watermark variants)
  * and the MinHash band-state near-dup pipeline, which must agree with
  * the batch `dedup_clusters` keeper set on the real corpus when the
  * stream replays it in doc_id order (VERDICT r5 item #4's done bar).
  */
class DedupStreamSpec extends SparkSuite {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("exact: replays across micro-batches are suppressed") {
    val in = MemoryStream[String]
    val out = Dedup.exact(in.toDF().toDF("text"))
    val q = out.select("text").writeStream
      .format("memory").queryName("dedup_exact_t").outputMode("append").start()
    in.addData("alpha", "beta", "alpha")
    q.processAllAvailable()
    in.addData("beta", "gamma", "alpha") // cross-batch replays
    q.processAllAvailable()
    q.stop()
    val got = spark.table("dedup_exact_t").as[String].collect().sorted.toSeq
    assert(got == Seq("alpha", "beta", "gamma"))
  }

  test("exactWithinWatermark: state ages out past the delay, dups inside it suppressed") {
    val in = MemoryStream[(java.sql.Timestamp, String)]
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
    val out = Dedup.exactWithinWatermark(
      in.toDF().toDF("event_time", "text"), "event_time", "10 minutes")
    val q = out.select("text").writeStream
      .format("memory").queryName("dedup_wm_t").outputMode("append").start()
    in.addData((ts(0), "alpha"), (ts(1), "alpha")) // dup inside watermark
    q.processAllAvailable()
    in.addData((ts(30), "beta")) // advances watermark past alpha's window
    q.processAllAvailable()
    in.addData((ts(31), "alpha")) // alpha's state aged out → re-admitted
    q.processAllAvailable()
    q.stop()
    val got = spark.table("dedup_wm_t").as[String].collect().toSeq
    assert(got.sorted == Seq("alpha", "alpha", "beta"))
  }

  test("minhashVerdicts: streaming keeper set == batch dedup_clusters keepers (sf0.001)") {
    withRocksDBState {
      val docs = spark.read.parquet(sf() + "/documents.parquet")
        .select($"doc_id", $"text").as[(Long, String)]
        .collect().sortBy(_._1)
      val in = MemoryStream[(Long, String, Long)]
      val out = Dedup.minhashVerdicts(in.toDS())
      val q = out.toDF("doc_id", "seq", "root_doc", "is_keeper").writeStream
        .format("memory").queryName("dedup_mh_t").outputMode("append").start()
      // replay the corpus in doc_id order across 5 micro-batches
      docs.grouped(math.max(1, docs.length / 5 + 1)).foreach { chunk =>
        in.addData(chunk.map { case (id, text) => (id, text, id) }.toSeq)
        q.processAllAvailable()
      }
      q.stop()
      val got = spark.table("dedup_mh_t")
        .as[(Long, Long, Long, Boolean)].collect()
      assert(got.length == docs.length) // exactly one verdict per doc
      val streamKeepers = got.filter(_._4).map(_._1).toSet

      val batch = graft.queries.DedupOps.queries("dedup_clusters")(spark, sf())
      val batchKeepers = batch.filter("is_keeper = 1")
        .select("doc_id").as[Long].collect().toSet
      assert(streamKeepers == batchKeepers)
      // non-keepers must point at an earlier doc as root
      got.filterNot(_._4).foreach { case (id, _, root, _) => assert(root < id) }
    }
  }

  test("simhashVerdicts: streaming keepers == batch dedup_simhash fingerprint groups (sf0.001)") {
    withRocksDBState {
      val docs = spark.read.parquet(sf() + "/documents.parquet")
        .select($"doc_id", $"text").as[(Long, String)]
        .collect().sortBy(_._1)
      val in = MemoryStream[(Long, String, Long)]
      val out = Dedup.simhashVerdicts(in.toDS())
      val q = out.toDF("doc_id", "seq", "root_doc", "is_keeper").writeStream
        .format("memory").queryName("dedup_sh_t").outputMode("append").start()
      docs.grouped(200).foreach { chunk =>
        in.addData(chunk.map { case (id, t) => (id, t, id) }.toSeq)
        q.processAllAvailable()
      }
      q.stop()
      val got = spark.table("dedup_sh_t").as[(Long, Long, Long, Boolean)].collect()
      assert(got.length == docs.length)
      val streamKeepers = got.filter(_._4).map(_._1).toSet

      // batch: keeper = min doc_id of each simhash16 fingerprint group
      val batch = graft.queries.DedupOps.queries("dedup_simhash")(spark, sf())
      val batchKeepers = batch.groupBy("simhash16").agg(min($"doc_id").as("k"))
        .select("k").as[Long].collect().toSet
      val tokenless = docs.filter(_._2.trim.isEmpty).map(_._1).toSet
      assert(streamKeepers == batchKeepers ++ tokenless)
      got.filterNot(_._4).foreach { case (id, _, root, _) => assert(root < id) }
    }
  }

  test("minhashVerdicts: bucket state survives a restart from the checkpoint") {
    withRocksDBState {
      val src = java.nio.file.Files.createTempDirectory("graft_mh_src").toString
      val ckpt = java.nio.file.Files.createTempDirectory("graft_mh_ckpt").toString
      val out = java.nio.file.Files.createTempDirectory("graft_mh_out").toString
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("seq", org.apache.spark.sql.types.LongType)))
      def write(rows: (Long, String, Long)*): Unit =
        rows.toSeq.toDF("doc_id", "text", "seq").coalesce(1)
          .write.mode("append").parquet(src)
      def start() = {
        val ds = spark.readStream.schema(schema).parquet(src)
          .as[(Long, String, Long)]
        Dedup.minhashVerdicts(ds)
          .toDF("doc_id", "seq", "root_doc", "is_keeper")
          .writeStream.format("parquet").option("path", out)
          .option("checkpointLocation", ckpt).outputMode("append").start()
      }
      val base = "one two three four five six seven eight nine ten eleven twelve"
      write((1L, base, 1L))
      val q1 = start(); q1.processAllAvailable(); q1.stop()
      // the near-copy arrives AFTER the restart: matching it requires the
      // bucket membership persisted in the checkpointed state store
      write((2L, base + " thirteen", 2L))
      val q2 = start(); q2.processAllAvailable(); q2.stop()
      val got = spark.read.parquet(out).as[(Long, Long, Long, Boolean)]
        .collect().sortBy(_._1).toSeq
      assert(got.map(r => (r._1, r._3, r._4)) == Seq((1L, 1L, true), (2L, 1L, false)))
    }
  }

  test("minhashVerdicts: shingle-less docs are singleton keepers; near-copy caught across batches") {
    withRocksDBState {
      val in = MemoryStream[(Long, String, Long)]
      val out = Dedup.minhashVerdicts(in.toDS())
      val q = out.toDF("doc_id", "seq", "root_doc", "is_keeper").writeStream
        .format("memory").queryName("dedup_mh2_t").outputMode("append").start()
      val base = "the quick brown fox jumps over the lazy dog again and again"
      in.addData((1L, base, 1L), (2L, "tiny", 2L)) // doc 2: < 3 tokens → no shingles
      q.processAllAvailable()
      in.addData((3L, base + " tail", 3L)) // near-copy arrives a batch later
      q.processAllAvailable()
      q.stop()
      val got = spark.table("dedup_mh2_t")
        .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1)
      assert(got.map(r => (r._1, r._3, r._4)).toSeq ==
        Seq((1L, 1L, true), (2L, 2L, true), (3L, 1L, false)))
    }
  }
}
