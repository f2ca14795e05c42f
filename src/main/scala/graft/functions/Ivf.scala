package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trained IVF (inverted-file) index on [[Kmeans]] centroids — the
  * production path the oracle-checked `similarity_ivf` query models with
  * its deterministic quantizer: k-means learns the cells, every vector
  * is tagged with its nearest centroid's cell id, and a query probes
  * only its `nprobe` closest cells.
  *
  * Everything is declarative and set-based — no driver loop anywhere:
  * probe selection is a broadcast join of queries against the k-row
  * centroid table + a per-query rank, candidate generation is an
  * equi-join on the cell id (the partition/bucket key at scale — write
  * the tagged corpus with `Bucketing.writeBucketed` on `cell` and the
  * probe join is also shuffle-free), and ranking is the cheap
  * double-precision cosine. With `nprobe = k` the search is EXACTLY
  * brute force (IvfSpec pins that equality), so recall degrades only
  * and exactly as nprobe shrinks.
  */
object Ivf {

  final case class Index(model: Kmeans.Model, cells: DataFrame)

  /** Persist a trained index: the tagged corpus lands in a
    * bucketed+sorted-by-`cell` table — the scaladoc's "write the tagged
    * corpus with Bucketing.writeBucketed on cell" promise as running
    * code, so every [[search]]/[[searchQuantized]] cell equi-join over
    * the loaded index reads the corpus pre-partitioned with ZERO
    * Exchange (IvfSpec plan-asserts it) — plus a k-row centroid table
    * carrying the trained model. Like [[AnnIndex.build]], a re-persist
    * under the same name drops the previous life first. */
  def persist(spark: org.apache.spark.sql.SparkSession, index: Index,
              name: String, buckets: Int = 64): Unit = {
    import spark.implicits._
    // pin the cell rows BEFORE dropping the previous life: a load()-ed
    // index's `cells` IS a lazy scan of the very table being replaced
    // (the re-bucket-in-place call this scaladoc advertises). A plain
    // persist() is NOT enough — DROP TABLE uncaches every cached plan
    // that references the table — so the pin must be a lineage CUT
    // (Materialize.cut: localCheckpoint / reliable checkpoint), whose
    // LogicalRDD plan the catalog knows nothing about.
    val pinned = Materialize.cut(index.cells)
    try {
      Seq(s"${name}_cells", s"${name}_centroids")
        .foreach(Bucketing.dropTableAndLocation(spark, _))
      Bucketing.writeBucketed(pinned, s"${name}_cells", "cell", buckets)
      index.model.centroids.zipWithIndex
        .map { case (c, i) => (i, c, index.model.objective) }.toSeq
        .toDF("cell", "cemb", "objective")
        .write.format("parquet").saveAsTable(s"${name}_centroids")
    } finally Materialize.release(pinned)
  }

  /** Load a [[persist]]ed index. The returned Index drops into the
    * existing search paths unchanged; its `cells` relation is the
    * bucketed table, so the cell probe join is co-located by layout. */
  def load(spark: org.apache.spark.sql.SparkSession, name: String): Index = {
    import spark.implicits._
    val cent = spark.table(s"${name}_centroids")
      .select($"cell", $"cemb", $"objective")
      .as[(Int, Array[Float], Double)].collect().sortBy(_._1)
    require(cent.nonEmpty, s"$name has no persisted centroids")
    // centroid POSITION is the cell id the stored tags reference: a gap
    // or duplicate (partial/corrupt write) would silently probe wrong
    // cells after the sort — fail loudly instead
    require(cent.map(_._1).toSeq == cent.indices,
      s"$name centroid cells are not contiguous 0..${cent.length - 1}: " +
        cent.map(_._1).mkString(","))
    Index(Kmeans.Model(cent.map(_._2), cent.head._3), spark.table(s"${name}_cells"))
  }

  /** Symmetric int8 scalar quantization of one vector — the same scheme
    * as the oracle-checked `embed_quantize` query (scale = max|x|/127,
    * q_i = floor(x_i/scale + 0.5)): returns (q, scale, ‖q‖₁). The L1
    * norm is precomputed per vector because the rerank bound in
    * [[searchQuantized]] needs it per CANDIDATE PAIR — computing it
    * there would re-scan the array once per pair instead of once per
    * vector. */
  private[graft] def quantize(v: Array[Float]): (Array[Byte], Double, Long) = {
    var maxabs = 0.0
    var i = 0
    while (i < v.length) {
      val a = math.abs(v(i).toDouble)
      if (a > maxabs) maxabs = a
      i += 1
    }
    val scale = maxabs / 127.0
    val q = new Array[Byte](v.length)
    var l1 = 0L
    if (maxabs > 0) {
      i = 0
      while (i < v.length) {
        val qi = math.floor(v(i).toDouble / scale + 0.5).toInt
        q(i) = qi.toByte
        l1 += math.abs(qi)
        i += 1
      }
    }
    (q, scale, l1)
  }

  /** Tag every corpus vector with its trained cell. `corpus` needs
    * `vec_id` and `embedding`; returns (vec_id, embedding, nrm, cell)
    * plus the int8 sidecar (q, scale, l1) that [[searchQuantized]] ranks
    * with — Catalyst prunes the unused columns for the float path, so
    * [[search]] plans are unchanged. */
  def build(corpus: DataFrame, k: Int, iters: Int): Index = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val model = Kmeans.fit(corpus, "embedding", "vec_id", k, iters)
    val m = model // task-closure copy
    val tagged = corpus.select($"vec_id", $"embedding")
      .as[(Long, Array[Float])]
      .mapPartitions(_.map { case (id, v) =>
        var n = 0.0
        var i = 0
        while (i < v.length) { n += v(i).toDouble * v(i); i += 1 }
        val (q, scale, l1) = quantize(v)
        (id, v, math.sqrt(n), m.assign(v), q, scale, l1)
      })
      .toDF("vec_id", "embedding", "nrm", "cell", "q", "scale", "l1")
    Index(model, tagged)
  }

  /** Top-`topK` same-probed-cell hits per query: `(query_id, vec_id,
    * cos, rank)`. `queries` needs `query_id` and `qemb` columns.
    *
    * Zero-norm vectors have no direction, so cosine is undefined for
    * them: zero-norm queries and zero-norm corpus rows are EXCLUDED up
    * front rather than ranked — an unguarded 0/0 would make NaN, and NaN
    * sorts above every real double under `desc`, so a zero vector would
    * otherwise outrank every genuine hit.
    *
    * Shuffle shape at scale: the corpus-side join is an equi-join on
    * `cell` (shuffle-free when the tagged corpus is bucketed on it), the
    * query norm is computed once per query — not once per candidate —
    * and candidates are projected down to `(query_id, vec_id, cos)`
    * BEFORE the rank window, so the rank exchange repartitions ids and
    * one double, never embedding arrays (IvfSpec pins that with a plan
    * assertion — the id-only shape `queries.DedupOps` uses). */
  def search(index: Index, queries: DataFrame, topK: Int, nprobe: Int): DataFrame = {
    require(topK >= 1 && nprobe >= 1, s"need topK, nprobe >= 1: $topK, $nprobe")
    val spark = queries.sparkSession
    import spark.implicits._
    val centroids = index.model.centroids.zipWithIndex
      .map { case (c, i) => (i, c) }.toSeq
      .toDF("cell", "cemb")
    // probe selection: query × k centroids (broadcast — k rows), keep the
    // nprobe nearest cells per query
    val probeW = Window.partitionBy($"query_id")
      .orderBy($"cdist".asc, $"cell".asc)
    val probes = queries
      .select($"query_id", $"qemb",
        sqrt(native.double_dot($"qemb", $"qemb")).as("qnrm"))
      .filter($"qnrm" > 0)
      .join(broadcast(centroids))
      .select($"query_id", $"qemb", $"qnrm", $"cell",
        // qemb·qemb = qnrm² (computed once per query above) — a
        // double_dot here would re-run a dim-length kernel per
        // (query, centroid) pair for a value that is constant per query
        ($"qnrm" * $"qnrm"
          - lit(2.0) * native.double_dot($"qemb", $"cemb")
          + native.double_dot($"cemb", $"cemb")).as("cdist"))
      .withColumn("prank", row_number().over(probeW))
      .filter($"prank" <= nprobe)
      .select($"query_id", $"qemb", $"qnrm", $"cell")
    // candidates: equi-join on the cell id, project to scalars, rank
    val rankW = Window.partitionBy($"query_id")
      .orderBy($"cos".desc, $"vec_id".asc)
    probes.join(index.cells.filter($"nrm" > 0), "cell")
      .select($"query_id", $"vec_id",
        (native.double_dot($"qemb", $"embedding") / ($"qnrm" * $"nrm")).as("cos"))
      .withColumn("rank", row_number().over(rankW))
      .filter($"rank" <= topK)
  }

  /** [[search]] with int8 candidate ranking + exact rerank — the same
    * result set, with the probe exchange carrying ~4× fewer bytes.
    *
    * The cell equi-join (the wide step that ships the corpus at scale)
    * carries the int8 sidecar (q: d bytes, scale, l1) instead of the
    * float embedding (4d bytes); candidates are ranked by the integer
    * dot kernel [[ExprKernels.int8Dot]]. Exactness is filter-verify with
    * a PROVEN margin, not a heuristic: for x = s_x·q_x + e_x with
    * |e_x,i| ≤ s_x/2 (the floor(+0.5) scheme's per-component bound),
    *
    *   |x·y − s_x s_y (q_x·q_y)| ≤ s_x s_y (‖q_x‖₁/2 + ‖q_y‖₁/2 + d/4)
    *
    * so every candidate's true cosine lies in [approx − err, approx +
    * err]. A candidate is reranked iff its upper bound reaches the
    * topK-th largest lower bound of its query — any candidate excluded
    * is beaten by ≥ topK others with certainty, so the exact-rerank
    * winners equal [[search]]'s (IvfSpec pins equality and the byte
    * shrink). The rerank joins float embeddings back BY ID for the
    * survivor set only (≈ topK + margin rows per query — the broadcast-
    * friendly side of that join, same join-back shape as
    * queries.DedupOps); survivors' scalars travel, never candidate
    * arrays. */
  def searchQuantized(index: Index, queries: DataFrame, topK: Int, nprobe: Int): DataFrame = {
    require(topK >= 1 && nprobe >= 1, s"need topK, nprobe >= 1: $topK, $nprobe")
    val spark = queries.sparkSession
    import spark.implicits._
    val centroids = index.model.centroids.zipWithIndex
      .map { case (c, i) => (i, c) }.toSeq
      .toDF("cell", "cemb")
    // quantize queries once (same pass computes the norm); keep qemb ONLY
    // for probe selection and the final rerank join — it never enters the
    // candidate exchange
    val qz = queries.select($"query_id", $"qemb")
      .as[(Long, Array[Float])]
      .mapPartitions(_.map { case (id, v) =>
        var n = 0.0
        var i = 0
        while (i < v.length) { n += v(i).toDouble * v(i); i += 1 }
        val (qq, qs, ql1) = quantize(v)
        (id, v, math.sqrt(n), qq, qs, ql1)
      })
      .toDF("query_id", "qemb", "qnrm", "qq", "qs", "ql1")
      .filter($"qnrm" > 0)
      .transform(graft.functions.Materialize.cut) // feeds probe selection and the rerank join
    val probeW = Window.partitionBy($"query_id")
      .orderBy($"cdist".asc, $"cell".asc)
    val probes = qz
      .join(broadcast(centroids))
      .select($"query_id", $"qq", $"qs", $"ql1", $"qnrm", $"cell",
        ($"qnrm" * $"qnrm"
          - lit(2.0) * native.double_dot($"qemb", $"cemb")
          + native.double_dot($"cemb", $"cemb")).as("cdist"))
      .withColumn("prank", row_number().over(probeW))
      .filter($"prank" <= nprobe)
      .select($"query_id", $"qq", $"qs", $"ql1", $"qnrm", $"cell")
    // int8 candidate scoring: approx cosine + certified error radius
    val d = lit(0.25) * least(length($"qq"), length($"q")).cast("double")
    val cand = probes
      .join(index.cells.filter($"nrm" > 0)
        .select($"vec_id", $"cell", $"q", $"scale", $"l1", $"nrm"), "cell")
      .select($"query_id", $"vec_id",
        (($"qs" * $"scale" * native.int8_dot($"qq", $"q")) / ($"qnrm" * $"nrm")).as("approx"),
        (($"qs" * $"scale" * (($"ql1" + $"l1") / lit(2.0) + d)) / ($"qnrm" * $"nrm")).as("err"))
    // rerank threshold: the topK-th largest certified LOWER bound per
    // query, spread to every candidate by a second window over the SAME
    // query_id partitioning — one exchange of (id, id, 2 doubles) rows
    // serves both windows, no self-join, no second candidate pass.
    // Queries with < topK candidates have no rank-topK row → null thresh
    // → rerank everything.
    val lbW = Window.partitionBy($"query_id")
      .orderBy(($"approx" - $"err").desc, $"vec_id".asc)
    val survivors = cand
      .withColumn("lbrank", row_number().over(lbW))
      .withColumn("thresh",
        max(when($"lbrank" === topK, $"approx" - $"err"))
          .over(Window.partitionBy($"query_id")))
      .filter($"approx" + $"err" >= coalesce($"thresh", lit(Double.NegativeInfinity)))
      .select($"query_id", $"vec_id")
    // exact rerank of the certified superset: float arrays re-enter by id
    // for survivors only (AQE broadcasts the survivor side at scale — the
    // corpus side streams, unshuffled)
    val rankW = Window.partitionBy($"query_id")
      .orderBy($"cos".desc, $"vec_id".asc)
    survivors
      .join(index.cells.select($"vec_id", $"embedding", $"nrm"), "vec_id")
      .join(qz.select($"query_id", $"qemb", $"qnrm"), "query_id")
      .select($"query_id", $"vec_id",
        (native.double_dot($"qemb", $"embedding") / ($"qnrm" * $"nrm")).as("cos"))
      .withColumn("rank", row_number().over(rankW))
      .filter($"rank" <= topK)
  }
}
