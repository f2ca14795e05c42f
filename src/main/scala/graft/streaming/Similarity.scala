package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues}

import graft.functions.native

/** Streaming similarity search: a stream of query vectors against a
  * static corpus — the streaming face of `SimilarityOps.similarity_ann_lsh`
  * (same sign-LSH bucketing, so a streaming query probes exactly the
  * bucket the batch pipeline would). The plan is the canonical streaming
  * enrichment shape: a STATELESS stream-static equi-join on the bucket id
  * (no watermark, no join state — the static side is just a relation),
  * then a per-query top-k fold on the operator API (all of a query's
  * candidates arrive in its own micro-batch, so the fold registers no
  * state — the DocVerdict pattern from [[Dedup]]).
  *
  * At scale the static side is the bucketed corpus (bucket = partition
  * key; see `functions.Bucketing` for paying that shuffle once at write
  * time) and each micro-batch reads only the buckets its queries probe.
  * ANN semantics: candidates share the query's bucket — same recall
  * contract as the batch ANN path, which SimilaritySpec pins.
  */
object Similarity {

  /** Top-k fold per query id: stateless (per-batch complete groups). */
  private final class TopK(k: Int)
      extends StatefulProcessor[Long, (Long, Long, Double), (Long, Long, Double)] {
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = ()
    override def handleInputRows(key: Long, rows: Iterator[(Long, Long, Double)],
        timerValues: TimerValues): Iterator[(Long, Long, Double)] = {
      // ties broken on vec_id for determinism; under this ordering the
      // WORST hit (lowest cos, then highest id) is the ordering maximum,
      // which is exactly what PriorityQueue.dequeue removes
      val ord: Ordering[(Long, Long, Double)] =
        Ordering.by { case (_, id, cos) => (-cos, id) }
      val heap = scala.collection.mutable.PriorityQueue.empty[(Long, Long, Double)](ord)
      rows.foreach { r =>
        heap.enqueue(r)
        if (heap.size > k) heap.dequeue() // drop the current worst
      }
      heap.dequeueAll.reverse.iterator // dequeue order is worst→best; emit best-first
    }
  }

  /** One row per (query, hit): `(query_id, vec_id, cosine)`, the top `k`
    * same-bucket corpus vectors per query per micro-batch. `corpus` must
    * have `vec_id` and `embedding` columns; it is bucketed once here and
    * should be cached by the caller when many batches will probe it. */
  def streamKnn(queries: Dataset[(Long, Array[Float])], corpus: DataFrame,
                k: Int, planes: Int = 8): Dataset[(Long, Long, Double)] = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = queries.sparkSession
    import spark.implicits._
    val statics = corpus
      .select($"vec_id", $"embedding",
        sqrt(native.double_dot($"embedding", $"embedding")).as("nrm"),
        native.lsh_bucket($"embedding", planes).as("bucket"))
    val qs = queries.toDF("query_id", "qemb")
      .select($"query_id", $"qemb",
        sqrt(native.double_dot($"qemb", $"qemb")).as("qnrm"),
        native.lsh_bucket($"qemb", planes).as("bucket"))
    qs.join(statics, "bucket") // stream-static: stateless, no watermark
      .select($"query_id", $"vec_id",
        (native.double_dot($"qemb", $"embedding") / ($"qnrm" * $"nrm")).as("cos"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .transformWithState(new TopK(k), TimeMode.None(), OutputMode.Append())
  }
}
