package graft.tools

import org.apache.spark.sql.functions._

import graft.{Bench, Sessions}
import graft.functions.AnnIndex

/** Measures the SERVING fix for the scan-bound ANN regime
  * (BENCH_ANN_GEOM_r16 found it: at a 2M-row corpus the streaming probe
  * join's q/s is bound by the per-trigger FULL scan of the bucketed
  * probe table, not by candidates): [[graft.streaming.Similarity
  * .streamKnnServe]] answers each micro-batch through `knnBatch`, whose
  * literal probe-set filter lets Spark's bucketed scan prune to the
  * trigger's own buckets. Same queries, same geometry, same trigger
  * size — the ONLY difference is fixed-plan-full-scan vs
  * per-trigger-pruned-scan, so the q/s ratio isolates the scan term.
  *
  * `SPARK_GRAFT_ANN_REPLICATE` scales the corpus (default 1000 → 2M
  * rows over sf0.1); serving uses small triggers (50 queries — the
  * low-latency shape where a corpus-sized scan per trigger hurts most)
  * and an index built with 256 physical buckets so a 50-probe batch can
  * prune deeply. One JSON line. */
object AnnServeBench {
  def main(args: Array[String]): Unit = {
    val env = Bench.contentionEnv()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val rep = sys.env.getOrElse("SPARK_GRAFT_ANN_REPLICATE", "1000").toInt
    val planes = args.headOption.map(_.toInt).getOrElse(12)
    val chunk = 50
    val k = 10
    val spark = Sessions.local(appName = "graft-annserve")
    import spark.implicits._
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.conf.set("spark.sql.shuffle.partitions",
      sys.env.getOrElse("SPARK_GRAFT_STREAM_PARTS", "4"))

    val corpus = AnnBenchData.replicated(spark, sfDir, rep).cache()
    val n = corpus.count()

    val dim = corpus.limit(1).as[(Long, Array[Float])].head()._2.length
    val queries = AnnBenchData.queries(AnnBenchData.rng(), dim, 2000)

    val idx = AnnIndex.build(corpus, "annserve", planes = planes,
      buckets = 256)
    corpus.unpersist()

    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // fixed-plan streaming path: the probe table scans in full per trigger
    def runStream(nprobe: Int): Double = {
      val in = MemoryStream[(Long, Array[Float])]
      val q = graft.streaming.Similarity.streamKnn(in.toDS(), idx, k, nprobe)
        .toDF("query_id", "vec_id", "cos")
        .writeStream.format("noop").outputMode("append").start()
      in.addData(queries.take(200).toSeq); q.processAllAvailable() // warm
      val t0 = System.nanoTime()
      queries.drop(200).grouped(chunk).foreach { c =>
        in.addData(c.toSeq); q.processAllAvailable()
      }
      val qps = (queries.length - 200) / ((System.nanoTime() - t0) / 1e9)
      q.stop(); qps
    }
    // serving loop: per-trigger knnBatch(Quantized), probe-set-pruned scan
    def runServe(nprobe: Int, quantized: Boolean): Double = {
      val in = MemoryStream[(Long, Array[Float])]
      val q = graft.streaming.Similarity.streamKnnServe(in.toDS(), idx, k,
        nprobe, quantized) { (df, _) =>
          df.write.mode("append").format("noop").save() }
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("annserve_ck").toString)
        .start()
      in.addData(queries.take(200).toSeq); q.processAllAvailable() // warm
      val t0 = System.nanoTime()
      queries.drop(200).grouped(chunk).foreach { c =>
        in.addData(c.toSeq); q.processAllAvailable()
      }
      val qps = (queries.length - 200) / ((System.nanoTime() - t0) / 1e9)
      q.stop(); qps
    }
    // the pruning witness: one serving batch's executed plan
    def witness(nprobe: Int, quantized: Boolean): (Int, Int) = {
      val sample =
        if (quantized) graft.streaming.Similarity.knnBatchQuantized(
          queries.take(chunk).toSeq.toDS(), idx, k, nprobe)
        else graft.streaming.Similarity.knnBatch(
          queries.take(chunk).toSeq.toDS(), idx, k, nprobe)
      sample.collect()
      """SelectedBucketsCount: (\d+) out of (\d+)""".r
        .findFirstMatchIn(sample.queryExecution.executedPlan.toString)
        .map(m => (m.group(1).toInt, m.group(2).toInt))
        .getOrElse((-1, -1))
    }

    // legs: the r16 float pair re-measured, plus the two r17 asks — the
    // int8 serving face (the composed scan win) and nprobe=4 (the claim
    // "scan cost follows the query batch" under a 4x probe set)
    Seq(1, 4).foreach { np =>
      val streamQps = runStream(np)
      Seq(false, true).foreach { quant =>
        val qps = runServe(np, quant)
        val (selB, totB) = witness(np, quant)
        val mode = if (quant) "int8" else "float"
        println(f"""{"ann_serve_q_per_sec":$qps%.0f,"ann_stream_q_per_sec":$streamQps%.0f,"serve_over_stream":${qps / streamQps}%.2f,"serve_mode":"$mode","nprobe":$np,"selected_buckets":$selB,"total_buckets":$totB,"planes":$planes,"chunk":$chunk,"corpus_rows":$n,"env":$env,"sf":"$sfDir"}""")
      }
    }

    AnnBenchData.dropIndex(spark, idx)
    spark.stop()
  }
}
