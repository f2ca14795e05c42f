package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed Lloyd's k-means over an `Array[Float]` embedding column —
  * the trainer for an IVF coarse quantizer (`SimilarityOps.similarity_ivf`
  * keeps its oracle-replicable deterministic quantizer; production IVF
  * builds cells from THIS). Every pass is the cheap shape: centroids
  * broadcast in the task closure (k·d floats), assignment is a narrow
  * map, and the update reduces to k partial-sum rows per partition — no
  * row-level shuffle at any step, so one iteration costs one scan
  * regardless of corpus size.
  *
  * Determinism: init is farthest-point (not seeded k-means++) — first
  * centroid = vector of the smallest id, each next = the point with the
  * largest (distance, id) to its nearest chosen centroid — and the
  * driver folds partition partials in partition order, so a fit on the
  * same layout reproduces exactly. (Float sums across DIFFERENT
  * partitionings can differ in the last ulp — quality invariants, not
  * bit equality, are the cross-layout contract; KmeansSpec pins both.)
  */
object Kmeans {

  final case class Model(centroids: Array[Array[Float]], objective: Double) {
    def k: Int = centroids.length
    /** Cell id of a vector under this model (argmin squared L2; ties to
      * the lower cell id). */
    def assign(v: Array[Float]): Int = {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < centroids.length) {
        val d = sqDist(centroids(c), v)
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      best
    }
  }

  private def sqDist(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { val d = a(i).toDouble - b(i).toDouble; s += d * d; i += 1 }
    s
  }

  /** Fit k centroids with `iters` Lloyd iterations on `df(idCol, vecCol)`.
    * Requires distinct ids (used for deterministic init tie-breaks). */
  def fit(df: DataFrame, vecCol: String, idCol: String, k: Int, iters: Int): Model = {
    require(k >= 1 && iters >= 0, s"need k >= 1, iters >= 0: $k, $iters")
    val spark = df.sparkSession
    import spark.implicits._
    val data = df.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]

    // ---- farthest-point init: one tiny aggregate per centroid ----
    var centroids = Vector(data.orderBy(col(idCol).cast("long")).head()._2)
    while (centroids.length < k) {
      val cs = centroids
      val (_, _, far) = data.mapPartitions { it =>
        var best: (Double, Long, Array[Float]) = null
        it.foreach { case (id, v) =>
          var d = Double.MaxValue
          cs.foreach(c => d = math.min(d, sqDist(c, v)))
          // farthest wins; ties to the smaller id for determinism
          if (best == null || d > best._1 || (d == best._1 && id < best._2))
            best = (d, id, v)
        }
        if (best == null) Iterator.empty else Iterator.single(best)
      }.collect().sortBy { case (d, id, _) => (-d, id) }.head
      centroids :+= far
    }

    // ---- Lloyd iterations: k×d partial sums per partition ----
    var model = Model(centroids.toArray, Double.MaxValue)
    var it = 0
    var converged = false
    while (it < iters && !converged) {
      val cs = model.centroids
      val kk = cs.length
      val partials = data.mapPartitions { rows =>
        val sums = Array.ofDim[Double](kk, if (cs.isEmpty) 0 else cs(0).length)
        val counts = new Array[Long](kk)
        var obj = 0.0
        rows.foreach { case (_, v) =>
          var best = 0
          var bestD = Double.MaxValue
          var c = 0
          while (c < kk) {
            val d = sqDist(cs(c), v)
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          obj += bestD
          counts(best) += 1
          var i = 0
          while (i < v.length) { sums(best)(i) += v(i); i += 1 }
        }
        Iterator.single((sums.map(_.toSeq).toSeq, counts.toSeq, obj))
      }.collect() // ≤ numPartitions rows of k×d doubles
      val dims = cs(0).length
      val sums = Array.ofDim[Double](kk, dims)
      val counts = new Array[Long](kk)
      var obj = 0.0
      partials.foreach { case (ps, pc, po) =>
        obj += po
        var c = 0
        while (c < kk) {
          counts(c) += pc(c)
          var i = 0
          while (i < dims) { sums(c)(i) += ps(c)(i); i += 1 }
          c += 1
        }
      }
      val next = Array.tabulate(kk) { c =>
        if (counts(c) == 0) cs(c) // empty cell keeps its centroid
        else Array.tabulate(dims)(i => (sums(c)(i) / counts(c)).toFloat)
      }
      converged = model.objective.isFinite &&
        model.objective - obj < 1e-9 * math.max(obj, 1.0)
      model = Model(next, obj)
      it += 1
    }
    model
  }
}
