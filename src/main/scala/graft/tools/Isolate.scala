package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Sessions
import graft.functions.native

/** Component isolation for the cosine pipeline (`runMain
  * graft.tools.Isolate [sfDir]`): times each plan fragment separately so a
  * slow stage can be attributed to scan, join, kernel, or window — used to
  * chase the ~380 µs/row cross-join stage in embed_knn.
  */
object Isolate {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = Sessions.local(appName = "graft-isolate")
    import spark.implicits._

    def time(label: String)(df: DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"ISO $label%-40s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }

    val raw = spark.read.parquet(s"$sfDir/embeddings.parquet").repartition(32)
    val emb = raw.select($"vec_id", $"embedding",
      sqrt(native.decimal_dot($"embedding", $"embedding").cast("double")).as("nrm"))
    val q = emb.filter($"vec_id" < 100)
      .select($"vec_id".as("qid"), $"embedding".as("qemb"), $"nrm".as("qn"))
    val cand = emb.crossJoin(broadcast(q)).filter($"vec_id" =!= $"qid")

    time("norms only (2000 decimal dots)")(emb)
    time("cross join, no kernel")(cand.select($"vec_id", $"qid"))
    time("cross join carrying arrays")(cand)
    time("cross + double_dot")(
      cand.select($"vec_id", $"qid",
        (native.double_dot($"embedding", $"qemb") / ($"qn" * $"nrm")).as("dcos")))
    time("cross + decimal_dot")(
      cand.select($"vec_id", $"qid",
        (native.decimal_dot($"embedding", $"qemb").cast("double") / ($"qn" * $"nrm")).as("cos")))

    import org.apache.spark.sql.expressions.Window
    val wd = Window.partitionBy($"qid").orderBy($"dcos".desc, $"vec_id")
    val fastSlim = cand
      .withColumn("dcos", native.double_dot($"embedding", $"qemb") / ($"qn" * $"nrm"))
      .select($"qid", $"vec_id", $"dcos")
    val fastWide = cand
      .withColumn("dcos", native.double_dot($"embedding", $"qemb") / ($"qn" * $"nrm"))
    time("dcos + window rk=1, slim rows")(
      fastSlim.withColumn("rkd", row_number().over(wd)).filter($"rkd" === 1))
    time("dcos + window rk=1, wide rows (arrays)")(
      fastWide.withColumn("rkd", row_number().over(wd)).filter($"rkd" === 1))
    spark.stop()
  }
}
