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

  /** Tag every corpus vector with its trained cell. `corpus` needs
    * `vec_id` and `embedding`; returns (vec_id, embedding, nrm, cell). */
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
        (id, v, math.sqrt(n), m.assign(v))
      })
      .toDF("vec_id", "embedding", "nrm", "cell")
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
}
