package graft.streaming

import graft.{SparkEntry, SparkSuite}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming domain cap: at most N docs per domain pass, counts survive
  * micro-batch boundaries, and when arrival order equals the batch
  * query's md5 priority order the surviving set is EXACTLY the batch
  * domain_cap result.
  */
class GovernanceStreamSpec extends SparkSuite {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val Cap = 20L

  test("priority-ordered ingest reproduces the batch domain_cap set; counts span batches") {
    // the batch query's own priority: md5("cap-0|" + doc_id); feed the
    // corpus in that order (what a sorted backfill does) in two batches
    val docs = spark.read.parquet(sf("sf0.01") + "/documents.parquet")
      .select($"source", $"doc_id",
        md5(concat_ws("|", lit("cap-0"), $"doc_id")).as("prio"))
      .as[(String, Long, String)].collect()
      .sortBy(r => (r._3, r._2))
      .zipWithIndex
      .map { case ((src, id, _), i) => (src, i.toLong, id) } // seq = global priority rank
    val (b1, b2) = docs.splitAt(docs.length / 2)

    val in = MemoryStream[(String, Long, Long)]
    val q = Governance.domainCap(in.toDS(), Cap)
      .map { case (src, _, (id, rank)) => (src, id, rank) }
      .toDF("source", "doc_id", "rank")
      .writeStream.format("memory").queryName("cap_t").outputMode("append").start()
    try {
      in.addData(b1.toSeq: _*); q.processAllAvailable()
      in.addData(b2.toSeq: _*); q.processAllAvailable() // counts must continue
    } finally q.stop()

    val got = spark.table("cap_t").as[(String, Long, Long)].collect()
    val gotSet = got.map(r => (r._1, r._2)).toSet

    val batch = SparkEntry.queries("domain_cap")(spark, sf("sf0.01"))
      .select($"source", $"doc_id")
      .as[(String, Long)].collect().toSet
    assert(gotSet == batch,
      s"streaming cap diverged from batch: only-stream=${gotSet -- batch} only-batch=${batch -- gotSet}")

    // every domain at most Cap, and ranks are dense 1..n_admitted
    val perKey = got.groupBy(_._1)
    perKey.foreach { case (src, rows) =>
      assert(rows.length <= Cap, s"$src over cap: ${rows.length}")
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq,
        s"$src ranks not dense: ${rows.map(_._3).sorted.toSeq}")
    }
    // the cap genuinely binds somewhere on this corpus
    assert(perKey.values.exists(_.length == Cap), "cap never bound — fixture too small")
  }
}
