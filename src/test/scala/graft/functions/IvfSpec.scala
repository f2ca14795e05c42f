package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Trained IVF: probing all cells IS brute force (exact equality), cell
  * tags match the model's assignment, and shrinking nprobe trades recall
  * as designed.
  */
class IvfSpec extends SparkSuite {
  import spark.implicits._

  private lazy val corpus = spark.read.parquet(sf() + "/embeddings.parquet")
    .select($"vec_id", $"embedding")

  test("nprobe = k search equals brute-force top-10 for every query") {
    val index = Ivf.build(corpus, k = 8, iters = 4)
    index.cells.cache()
    try {
      val queries = corpus.limit(15)
        .select($"vec_id".as("query_id"), $"embedding".as("qemb")).cache()
      val ivf = Ivf.search(index, queries, topK = 10, nprobe = 8)
        .select($"query_id", $"vec_id", $"rank")
        .as[(Long, Long, Int)].collect()
        .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap

      // brute force over the same double-cosine ranking
      val brute = queries.join(corpus)
        .select($"query_id", $"vec_id",
          (native.double_dot($"qemb", $"embedding") /
            (sqrt(native.double_dot($"qemb", $"qemb")) *
              sqrt(native.double_dot($"embedding", $"embedding")))).as("cos"))
        .as[(Long, Long, Double)].collect()
        .groupBy(_._1).view.mapValues(
          _.sortBy { case (_, id, cos) => (-cos, id) }.take(10).map(_._2).toSeq).toMap

      assert(ivf.keySet == brute.keySet)
      ivf.keySet.foreach(q => assert(ivf(q) == brute(q), s"query $q"))

      // narrower probing keeps most of the neighborhood on this corpus
      val narrow = Ivf.search(index, queries, topK = 10, nprobe = 3)
        .select($"query_id", $"vec_id")
        .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val recalls = brute.keySet.toSeq.map { q =>
        narrow.getOrElse(q, Set.empty).intersect(brute(q).toSet).size / 10.0
      }
      val mean = recalls.sum / recalls.size
      assert(mean > 0.5, s"mean recall@10 with nprobe=3/8 was $mean")
      queries.unpersist()
    } finally index.cells.unpersist()
  }

  test("cell tags equal the model's assignment") {
    val index = Ivf.build(corpus.limit(100), k = 4, iters = 3)
    val rows = index.cells.select($"embedding", $"cell")
      .as[(Array[Float], Int)].collect()
    rows.foreach { case (v, cell) => assert(cell == index.model.assign(v)) }
  }
}
