package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming packing must assign the SAME window coordinates the batch
  * packer assigns on the same corpus — whether the docs arrive in one
  * micro-batch or dribble in across many. That equality is the packing
  * contract a training run depends on: re-ingesting a corpus as a
  * stream may not move any document's training-window placement.
  */
class PackingStreamSpec extends SparkSuite {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val Budget = 100L

  test("streaming placements == batch packSequences, with offsets continuing across batches") {
    // (shard, doc_id, size) with shard = doc_id % 2 — the same derivation
    // batch packSequences uses, so the two shardings coincide. Shard 0
    // crosses the 100-char window boundary mid-doc; shard 1 fills exactly
    // to a boundary. doc_ids are monotone with arrival order (the stream's
    // in-shard order key).
    val b1 = Seq((0L, 2L, 40L), (0L, 4L, 70L), (1L, 1L, 100L))
    val b2 = Seq((0L, 6L, 95L), (1L, 3L, 1L), (0L, 8L, 200L))
    val all = b1 ++ b2

    val in = MemoryStream[(Long, Long, Long)]
    val q = Packing.pack(in.toDS(), Budget)
      .map { case (shard, docId, p) =>
        (shard, docId, p.seqStart, p.windowId, p.windowOffset, p.nWindows) }
      .toDF("shard", "doc_id", "seq_start", "window_id", "window_offset", "n_windows")
      .writeStream.format("memory").queryName("pack_t").outputMode("append").start()
    try {
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable() // offsets must continue
    } finally q.stop()

    val got = spark.table("pack_t")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet

    // batch oracle over the identical corpus, one pass
    val batch = graft.functions.Curation.packSequences(
        all.toDF("shard_in", "doc_id", "sz"), "doc_id", "sz", 2L, Budget)
      .select($"shard_in", $"doc_id", $"seq_start", $"window_id",
        $"window_offset", $"n_windows")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(got == batch, s"streaming $got\nbatch $batch")

    // spot-check the boundary doc: shard 0, doc 8 starts at 205, spans
    // windows 2..4 (205+200-1 = 404)
    val doc8 = got.find(_._2 == 8L).get
    assert(doc8 == ((0L, 8L, 205L, 2L, 5L, 3L)))
  }

  test("token-level packing: streaming placements == batch pack_sequences_tokens on real docs") {
    // sizes from the same true-BPE kernel the batch query uses, over the
    // real documents table; budget = the query's TokenBudget (2048)
    val sized = spark.read.parquet(sf() + "/documents.parquet")
      .withColumn("n", size(graft.functions.native.bpe_tokens(col("text"))).cast("long"))
      .filter(col("n") >= 1)
      .select((col("doc_id") % 8L).as("shard"), col("doc_id"), col("n"))
      .as[(Long, Long, Long)].collect().sortBy(_._2)
    assert(sized.length > 100, s"fixture corpus too small: ${sized.length}")
    val (b1, b2) = sized.splitAt(sized.length / 2)

    val in = MemoryStream[(Long, Long, Long)]
    val q = Packing.pack(in.toDS(), 2048L)
      .map { case (shard, docId, p) =>
        (shard, docId, p.seqStart, p.windowId, p.windowOffset, p.nWindows) }
      .toDF("shard", "doc_id", "seq_start", "window_id", "window_offset", "n_windows")
      .writeStream.format("memory").queryName("pack_tok").outputMode("append").start()
    try {
      in.addData(b1.toSeq: _*); q.processAllAvailable()
      in.addData(b2.toSeq: _*); q.processAllAvailable() // offsets continue
    } finally q.stop()
    val got = spark.table("pack_tok")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet

    // the oracle-checked batch query itself, not a re-derivation
    val batch = graft.SparkEntry.queries("pack_sequences_tokens")(spark, sf())
      .select(col("shard"), col("doc_id"), col("seq_start"), col("window_id"),
        col("window_offset"), col("n_windows"))
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(got == batch,
      s"streaming-only: ${got.diff(batch).take(3)}; batch-only: ${batch.diff(got).take(3)}")
  }

  test("zero-size docs match the batch formula at both corners (start 0 and boundary)") {
    val in = MemoryStream[(Long, Long, Long)]
    val q = Packing.pack(in.toDS(), Budget)
      .map { case (shard, docId, p) => (docId, p.seqStart, p.nWindows) }
      .toDF("doc_id", "seq_start", "n_windows")
      .writeStream.format("memory").queryName("pack_z").outputMode("append").start()
    try {
      // doc 1: zero-size at start 0; doc 2 fills exactly to the boundary;
      // doc 3: zero-size AT the boundary — the corner where a size clamp
      // would report 1 window while the batch formula reports 0
      in.addData((0L, 1L, 0L), (0L, 2L, 100L), (0L, 3L, 0L), (0L, 4L, 10L))
      q.processAllAvailable()
    } finally q.stop()
    val byId = spark.table("pack_z").as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(byId(1L) == ((0L, 1L))) // zero-size at 0: one window, no advance
    assert(byId(2L) == ((0L, 1L)))
    assert(byId(3L) == ((100L, 0L))) // zero-size at boundary: zero windows
    assert(byId(4L) == ((100L, 1L))) // starts where doc 3 "sat"
    // pin equality with the batch formula on the same rows
    import org.apache.spark.sql.functions.col
    val batch = graft.functions.Curation.packSequences(
        Seq((0L, 10L, 0L), (0L, 20L, 100L), (0L, 30L, 0L), (0L, 40L, 10L))
          .toDF("s", "doc_id", "sz"), "doc_id", "sz", 1L, Budget)
      .select(col("doc_id") / 10L, col("seq_start"), col("n_windows"))
      .as[(Double, Long, Long)].collect()
      .map(r => r._1.toLong -> ((r._2, r._3))).toMap
    assert(batch == byId)
  }
}
