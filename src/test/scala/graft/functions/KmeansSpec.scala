package graft.functions

import graft.SparkSuite

/** Distributed Lloyd's: objective monotonicity, determinism on a fixed
  * layout, exact recovery of separable clusters, and a real-embeddings
  * sanity fit (the IVF-trainer use case).
  */
class KmeansSpec extends SparkSuite {
  import spark.implicits._

  private def blobs = {
    // 3 tight, well-separated clusters in 4-d
    val centers = Seq(
      Array(0f, 0f, 0f, 0f), Array(10f, 10f, 0f, 0f), Array(-10f, 0f, 10f, 0f))
    (0 until 90).map { i =>
      val c = centers(i % 3)
      (i.toLong, c.map(x => x + (i / 3 % 5) * 0.01f))
    }
  }

  test("separable blobs: exact cluster recovery, near-zero objective") {
    val df = blobs.toDF("vec_id", "embedding").repartition(4)
    val m = Kmeans.fit(df, "embedding", "vec_id", k = 3, iters = 10)
    assert(m.k == 3)
    assert(m.objective < 0.1, s"objective ${m.objective}")
    // every point lands in the same cell as the others of its blob
    val cells = blobs.groupBy(_._1 % 3).view.mapValues(
      _.map { case (_, v) => m.assign(v) }.toSet)
    assert(cells.values.forall(_.size == 1))
    assert(cells.values.flatten.toSet.size == 3) // and the cells differ
  }

  test("objective is non-increasing in iterations; fit is deterministic") {
    val df = spark.read.parquet(sf() + "/embeddings.parquet")
      .select($"vec_id", $"embedding").limit(300).repartition(4).cache()
    try {
      val o = Seq(1, 3, 6).map(i =>
        Kmeans.fit(df, "embedding", "vec_id", k = 8, iters = i).objective)
      assert(o(0) >= o(1) && o(1) >= o(2), s"objective not monotone: $o")
      val a = Kmeans.fit(df, "embedding", "vec_id", k = 8, iters = 4)
      val b = Kmeans.fit(df, "embedding", "vec_id", k = 8, iters = 4)
      assert(a.centroids.map(_.toSeq).toSeq == b.centroids.map(_.toSeq).toSeq)
      // more cells can only tighten the fit
      val k1 = Kmeans.fit(df, "embedding", "vec_id", k = 1, iters = 4).objective
      assert(a.objective < k1)
    } finally df.unpersist()
  }
}
