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
    * should be cached by the caller when many batches will probe it.
    * Zero-norm vectors have no direction — cosine is 0/0 — so zero-norm
    * corpus rows and queries are excluded up front, exactly as the batch
    * paths and [[streamKnnQuantized]] do (an unguarded NaN would outrank
    * every real hit under desc ordering). */
  def streamKnn(queries: Dataset[(Long, Array[Float])], corpus: DataFrame,
                k: Int, planes: Int = 8): Dataset[(Long, Long, Double)] = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = queries.sparkSession
    import spark.implicits._
    val statics = corpus
      .select($"vec_id", $"embedding",
        sqrt(native.double_dot($"embedding", $"embedding")).as("nrm"),
        native.lsh_bucket($"embedding", planes).as("bucket"))
      .filter($"nrm" > 0)
    val qs = queries.toDF("query_id", "qemb")
      .select($"query_id", $"qemb",
        sqrt(native.double_dot($"qemb", $"qemb")).as("qnrm"),
        native.lsh_bucket($"qemb", planes).as("bucket"))
      .filter($"qnrm" > 0)
    qs.join(statics, "bucket") // stream-static: stateless, no watermark
      .select($"query_id", $"vec_id",
        (native.double_dot($"qemb", $"embedding") / ($"qnrm" * $"nrm")).as("cos"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .transformWithState(new TopK(k), TimeMode.None(), OutputMode.Append())
  }

  /** Certified-survivor filter per query id (stateless per-batch groups,
    * like [[TopK]]): rows are a tagged union — ONE query-vector row
    * (isQuery = true, carrying qemb/qnrm) plus the int8-scored candidate
    * rows (approx ± err certified cosine intervals; the explicit boolean
    * tag rather than a sentinel id, because any Long is a legal corpus
    * vec_id). Emits the survivor
    * superset `(query_id, vec_id, qemb, qnrm)`: every candidate whose
    * upper bound reaches the k-th largest lower bound — the same
    * provable filter-verify margin as [[graft.functions.Ivf
    * .searchQuantized]], so the exact rerank downstream cannot lose a
    * true winner. Survivor rows are the only place a float query vector
    * travels after the probe join, ≈ k + margin rows per query. */
  private final class Survivors(k: Int)
      extends StatefulProcessor[Long, (Long, Boolean, Long, Double, Double, Array[Float], Double),
        (Long, Long, Array[Float], Double)] {
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = ()
    override def handleInputRows(key: Long,
        rows: Iterator[(Long, Boolean, Long, Double, Double, Array[Float], Double)],
        timerValues: TimerValues): Iterator[(Long, Long, Array[Float], Double)] = {
      var qemb: Array[Float] = null
      var qnrm = 0.0
      val cand = scala.collection.mutable.ArrayBuffer.empty[(Long, Double, Double)]
      rows.foreach {
        case (_, true, _, _, _, emb, nrm) => qemb = emb; qnrm = nrm
        case (_, false, vid, approx, err, _, _) => cand += ((vid, approx, err))
      }
      if (qemb == null || cand.isEmpty) Iterator.empty
      else {
        val lbs = cand.map { case (_, a, e) => a - e }.sorted(Ordering[Double].reverse)
        val thresh = if (lbs.size < k) Double.NegativeInfinity else lbs(k - 1)
        cand.iterator.collect {
          case (vid, a, e) if a + e >= thresh => (key, vid, qemb, qnrm)
        }
      }
    }
  }

  /** [[streamKnn]] with the int8 candidate ranking of
    * `Ivf.searchQuantized` wired into the stream-static probe join: the
    * SAME winners (SimilarityStreamSpec pins equality), with the bucket
    * join's static side carrying the d-byte int8 sidecar instead of the
    * 4d-byte float embedding — at scale that join is the exchange that
    * ships the corpus every micro-batch, so the probe traffic shrinks
    * ~4×. Candidates are scored by the integer dot kernel with a
    * certified error interval; a per-query survivor filter keeps the
    * provable superset of the top k; float embeddings re-enter BY ID
    * for survivors only (≈ k + margin rows per query) for the exact
    * rerank, then the [[TopK]] fold picks winners exactly as the float
    * path does. Zero-norm corpus vectors and queries are excluded as in
    * the batch path (cosine undefined).
    */
  def streamKnnQuantized(queries: Dataset[(Long, Array[Float])], corpus: DataFrame,
                         k: Int, planes: Int = 8): Dataset[(Long, Long, Double)] = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = queries.sparkSession
    import spark.implicits._
    // static side, quantized once: (vec_id, bucket, nrm, q, scale, l1) —
    // the float embedding column is NOT in the probe join's projection
    val taggedStatic = corpus
      .select($"vec_id", $"embedding",
        sqrt(native.double_dot($"embedding", $"embedding")).as("nrm"),
        native.lsh_bucket($"embedding", planes).as("bucket"))
      .filter($"nrm" > 0)
      .as[(Long, Array[Float], Double, Long)]
      .mapPartitions(_.map { case (id, v, nrm, bucket) =>
        val (q, s, l1) = graft.functions.Ivf.quantize(v)
        (id, bucket, nrm, q, s, l1)
      })
      .toDF("vec_id", "bucket", "nrm", "q", "scale", "l1")
    val floatStatic = corpus
      .select($"vec_id", $"embedding",
        sqrt(native.double_dot($"embedding", $"embedding")).as("nrm"))
      .filter($"nrm" > 0)
    // stream side, quantized in-row
    val qz = queries.toDF("query_id", "qemb")
      .select($"query_id", $"qemb",
        sqrt(native.double_dot($"qemb", $"qemb")).as("qnrm"),
        native.lsh_bucket($"qemb", planes).as("bucket"))
      .filter($"qnrm" > 0)
      .as[(Long, Array[Float], Double, Long)]
      .mapPartitions(_.map { case (id, v, qnrm, bucket) =>
        val (qq, qs, ql1) = graft.functions.Ivf.quantize(v)
        (id, v, qnrm, bucket, qq, qs, ql1)
      })
      .toDF("query_id", "qemb", "qnrm", "bucket", "qq", "qs", "ql1")
    // int8-scored candidates: approx cosine ± certified radius (the
    // searchQuantized bound), all scalars — no arrays in these rows
    val d = lit(0.25) * least(length($"qq"), length($"q")).cast("double")
    val cands = qz.drop("qemb").join(taggedStatic, "bucket")
      .select($"query_id", lit(false).as("is_query"), $"vec_id",
        (($"qs" * $"scale" * native.int8_dot($"qq", $"q")) / ($"qnrm" * $"nrm")).as("approx"),
        (($"qs" * $"scale" * (($"ql1" + $"l1") / lit(2.0) + d)) / ($"qnrm" * $"nrm")).as("err"),
        typedlit[Array[Float]](null).as("qemb"), lit(0.0).as("qnrm"))
    // tagged union: one is_query row per query carries the float qemb
    val qrows = qz.select($"query_id", lit(true).as("is_query"), lit(0L).as("vec_id"),
      lit(0.0).as("approx"), lit(0.0).as("err"), $"qemb", $"qnrm")
    val survivors = qrows.unionByName(cands)
      .as[(Long, Boolean, Long, Double, Double, Array[Float], Double)]
      .groupByKey(_._1)
      .transformWithState(new Survivors(k), TimeMode.None(), OutputMode.Append())
      .toDF("query_id", "vec_id", "qemb", "qnrm")
    // exact rerank of the certified superset: float arrays re-enter by id
    survivors.join(floatStatic, "vec_id")
      .select($"query_id", $"vec_id",
        (native.double_dot($"qemb", $"embedding") / ($"qnrm" * $"nrm")).as("cos"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .transformWithState(new TopK(k), TimeMode.None(), OutputMode.Append())
  }
}
