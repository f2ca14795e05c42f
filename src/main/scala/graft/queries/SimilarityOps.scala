package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the embedding column (north star).
  *
  * Two paths:
  *  - `embed_knn` — oracle-checked brute force: per-dimension products are
  *    summed as exact decimals (order-independent) so DuckDB agrees bitwise.
  *    The query side is restricted to 100 vectors to bound the cross size.
  *  - `similarity_topk_fast` — the scale path: codegen'd higher-order
  *    functions (zip_with + aggregate) on the array column, no explode, with
  *    a broadcast of the (small) query set; this is what you'd run on 100 TB
  *    (queries broadcast, corpus scanned once, top-k via per-partition
  *    window). Results are floating-point; checked by ScalaTest against the
  *    decimal-exact variant, not by SQL oracle.
  */
object SimilarityOps extends QueryGroup {

  /** vec_id, i (1-based), x (double) — exploded embedding components. */
  private def comps(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "embeddings")
      .select($"vec_id", posexplode($"embedding").as(Seq("i0", "xf")))
      .select($"vec_id", ($"i0" + 1).as("i"), $"xf".cast("double").as("x"))
  }

  override def queries: Map[String, Q] = Map(
    // L2 norm per vector (exact decimal sum of squares).
    "embed_norm" -> ((s, dir) => {
      import s.implicits._
      // round to 9 dp: the 20-scale decimal sum exceeds double precision and
      // decimal→double conversion may differ by 1 ulp between engines.
      comps(s, dir)
        .groupBy($"vec_id")
        .agg(round(sqrt(sum(dec($"x" * $"x", 20)).cast("double")), 9).as("l2_norm"))
    }),

    // brute-force cosine top-1 neighbor for the first 100 vectors.
    "embed_knn" -> ((s, dir) => {
      import s.implicits._
      val c = comps(s, dir)
      val norms = c.groupBy($"vec_id")
        .agg(sqrt(sum(dec($"x" * $"x", 20)).cast("double")).as("nrm"))
      val q = c.filter($"vec_id" < 100)
        .select($"vec_id".as("qid"), $"i", $"x".as("qx"))
      val dots = broadcast(q).join(c.select($"vec_id".as("cid"), $"i", $"x".as("cx")), "i")
        .filter($"qid" =!= $"cid")
        .groupBy($"qid", $"cid")
        .agg(sum(dec($"qx" * $"cx", 20)).cast("double").as("dot"))
      val cos = dots
        .join(norms.select($"vec_id".as("qid"), $"nrm".as("qn")), "qid")
        .join(norms.select($"vec_id".as("cid"), $"nrm".as("cn")), "cid")
        .withColumn("cosine", round($"dot" / ($"qn" * $"cn"), 9))
      val w = Window.partitionBy($"qid").orderBy($"cosine".desc, $"cid")
      cos.withColumn("rk", row_number().over(w))
        .filter($"rk" === 1)
        .select($"qid", $"cid".as("nn_id"), $"cosine")
    }),

    // scale path: no explode, broadcast queries, codegen'd array ops.
    "similarity_topk_fast" -> ((s, dir) => {
      import s.implicits._
      val emb = t(s, dir, "embeddings")
        .select($"vec_id", $"embedding",
          sqrt(aggregate(transform($"embedding", x => x.cast("double") * x.cast("double")),
            lit(0.0), (acc, y) => acc + y)).as("nrm"))
      val q = emb.filter($"vec_id" < 100)
        .select($"vec_id".as("qid"), $"embedding".as("qemb"), $"nrm".as("qn"))
      val joined = emb.crossJoin(broadcast(q)).filter($"vec_id" =!= $"qid")
        .withColumn("dot", aggregate(
          zip_with($"embedding", $"qemb", (a, b) => a.cast("double") * b.cast("double")),
          lit(0.0), (acc, y) => acc + y))
        .withColumn("cosine", $"dot" / ($"nrm" * $"qn"))
      val w = Window.partitionBy($"qid").orderBy($"cosine".desc, $"vec_id")
      joined.withColumn("rk", row_number().over(w))
        .filter($"rk" <= 5)
        .select($"qid", $"vec_id".as("nn_id"), $"rk", $"cosine")
    })
  )

  private val SQL_COMPS =
    """SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
      |FROM read_parquet_embeddings, UNNEST(generate_series(1, len(embedding))) t(i)"""
      .stripMargin.replace("read_parquet_embeddings", "embeddings")

  override def oracle: Map[String, String] = Map(
    "embed_norm" ->
      s"""WITH c AS ($SQL_COMPS)
         |SELECT vec_id,
         |  ROUND(sqrt(CAST(SUM(CAST(x * x AS DECIMAL(38,20))) AS DOUBLE)), 9) AS l2_norm
         |FROM c GROUP BY vec_id""".stripMargin,

    "embed_knn" ->
      s"""WITH c AS ($SQL_COMPS),
         |norms AS (
         |  SELECT vec_id, sqrt(CAST(SUM(CAST(x * x AS DECIMAL(38,20))) AS DOUBLE)) AS nrm
         |  FROM c GROUP BY vec_id),
         |dots AS (
         |  SELECT q.vec_id AS qid, d.vec_id AS cid,
         |    CAST(SUM(CAST(q.x * d.x AS DECIMAL(38,20))) AS DOUBLE) AS dot
         |  FROM c q JOIN c d ON q.i = d.i AND q.vec_id < 100 AND q.vec_id <> d.vec_id
         |  GROUP BY q.vec_id, d.vec_id),
         |cosines AS (
         |  SELECT qid, cid, ROUND(dot / (qn.nrm * cn.nrm), 9) AS cosine
         |  FROM dots
         |  JOIN norms qn ON qn.vec_id = qid
         |  JOIN norms cn ON cn.vec_id = cid)
         |SELECT qid, cid AS nn_id, cosine FROM (
         |  SELECT qid, cid, cosine,
         |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, cid) AS rk
         |  FROM cosines) WHERE rk = 1""".stripMargin
  )
}
