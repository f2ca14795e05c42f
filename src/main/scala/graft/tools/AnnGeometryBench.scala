package graft.tools

import org.apache.spark.sql.functions._

import graft.{Bench, Sessions}
import graft.functions.{native, AnnIndex}

/** The ANN GEOMETRY DIAL, measured — the claim this bench turns into a
  * number: when the corpus grows 20×, the way to keep streaming ANN
  * queries/s is NOT to scan 20×-fatter buckets but to RE-SCALE THE
  * GEOMETRY — more hyperplanes (so candidates per probed bucket stay
  * ~constant) with multi-probe buying the recall back. q/s without
  * recall is meaningless (a geometry that probes nothing would "win"),
  * so every leg reports BOTH, through the REAL persisted-index
  * streaming path ([[graft.streaming.Similarity.streamKnn]], float and
  * int8 variants).
  *
  * Recall method — PLANTED NEIGHBORS, the SimilarityRecallSpec
  * discipline at bench scale: the testdata embeddings are near-uniform
  * on the sphere (measured top-1 cosine ≈ 0.41 ≈ the θ where sign-LSH
  * collision is near-chance), so recall against their brute-force
  * top-10 is noise at every geometry — it cannot rank geometries. A
  * real embedding corpus has near-duplicates and semantic clusters;
  * those are modeled by planting, for each query, one neighbor at
  * controlled cosine 0.9 into the corpus BEFORE the index is built.
  * recall@k = fraction of queries whose planted true NN (0.9 ≫ the
  * ~0.45 background max, so it IS the NN) appears in the emitted
  * top-k. Candidate cost and q/s are still driven by the full real
  * corpus; the 500 planted rows are ≤1% of even the sf0.1 leg.
  *
  * `runMain graft.tools.AnnGeometryBench [legs]` over
  * `SPARK_GRAFT_SF_DIR`'s embeddings; legs default to
  * `8:1,12:1,12:2,12:4,12:8` (planes:nprobe). The judged comparison is
  * sf0.1 `8:1` (the r15 baseline geometry) vs 20× `8:1` (the measured
  * collapse: same 256 logical buckets, 20× candidates each) vs 20×
  * `12:N` (4096 buckets; N chosen where measured recall meets or beats
  * the sf0.1 leg's). One JSON line per leg. */
object AnnGeometryBench {

  def main(args: Array[String]): Unit = {
    val env = Bench.contentionEnv()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val legs = args.headOption.getOrElse("8:1,12:1,12:2,12:4,12:8")
      .split(",").toSeq.map { s =>
        val Array(p, np) = s.split(":"); (p.trim.toInt, np.trim.toInt)
      }
    val spark = Sessions.local(appName = "graft-anngeom")
    import spark.implicits._
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // the SAME stream-parallelism posture as StreamBench's ANN rows
    // (state-store commit cost sizes shuffle partitions down to 4):
    // that is the configuration whose 20× collapse this bench exists
    // to measure the geometry against — at local[32]-wide shuffle the
    // candidate cost hides under per-trigger fixed cost at these toy
    // corpus absolutes and every geometry reads as equal
    spark.conf.set("spark.sql.shuffle.partitions",
      sys.env.getOrElse("SPARK_GRAFT_STREAM_PARTS", "4"))

    // SPARK_GRAFT_ANN_REPLICATE=K replicates the corpus K× (distinct
    // ids, identical vectors — occupancy scales exactly, planted recall
    // is untouched): the 1000× leg where per-query candidate cost
    // finally dominates per-trigger fixed cost on this box, making the
    // frozen geometry's q/s collapse — and the rescaled geometry's
    // recovery — visible in wall-clock, not just in candidate counts
    val rep = sys.env.getOrElse("SPARK_GRAFT_ANN_REPLICATE", "1").toInt
    val base = AnnBenchData.replicated(spark, sfDir, rep)
    val k = 10
    val nQueries = 2000 // q/s denominator, the StreamBench envelope
    val nPlanted = 500 // recall numerator: the first nPlanted queries
    val warm = 200
    val plantedCos = 0.9

    // queries (fresh unit gaussians, ids outside the corpus space); the
    // first nPlanted get a planted neighbor at cosine plantedCos,
    // seeded for cross-round comparability — the SimilarityRecallSpec
    // construction. The rest exist to make the q/s denominator large
    // enough that per-trigger noise stops dominating the rate.
    val r = AnnBenchData.rng()
    val dim = base.limit(1).as[(Long, Array[Float])].head()._2.length
    val queries = AnnBenchData.queries(r, dim, nQueries)
    val planted: Seq[(Long, Array[Float])] = queries.take(nPlanted).toSeq
      .map { case (qid, qf) =>
        val q = qf.map(_.toDouble)
        val g = AnnBenchData.gauss(r, dim)
        val dot = q.zip(g).map { case (a, b) => a * b }.sum
        val perp = AnnBenchData.unit(
          g.zip(q).map { case (gi, qi) => gi - dot * qi })
        val nb = q.zip(perp).map { case (qi, pi) =>
          plantedCos * qi + math.sqrt(1 - plantedCos * plantedCos) * pi }
        (AnnBenchData.PlantedIdBase + (qid - AnnBenchData.QueryIdBase),
          nb.map(_.toFloat))
      }
    val plantedIds: Map[Long, Long] = queries.iterator.map(_._1)
      .zip(planted.iterator.map(_._1)).toMap
    val corpus = base.unionByName(
      planted.toDF("vec_id", "embedding")).cache()
    val n = corpus.count()

    // one index build + occupancy pass per DISTINCT planes value: the
    // nprobe dial changes neither the index nor the bucket histogram
    legs.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (planes, group) =>
      val idx = AnnIndex.build(corpus, s"anngeom_p$planes",
        planes = planes, buckets = 16)

      // mean candidates/query: occupancy of each query's probed buckets
      // under the REAL kernels (the cost the geometry dial controls)
      val occ = corpus
        .select(native.lsh_bucket($"embedding", planes).as("b"))
        .groupBy($"b").count().as[(Long, Long)].collect().toMap
      val qb = queries.toSeq.toDF("query_id", "qemb")
        .select($"query_id",
          native.lsh_bucket($"qemb", planes).as("b"),
          native.rp_project($"qemb", planes).as("projs"))
        .as[(Long, Long, Array[Double])].collect()

      group.map(_._2).foreach { nprobe =>
      val candsPerQuery = qb.iterator.map { case (_, b, projs) =>
        val probes =
          if (nprobe <= 1) Array(b) else AnnIndex.multiProbe(b, projs, nprobe)
        probes.iterator.map(pb => occ.getOrElse(pb, 0L)).sum.toDouble
      }.sum / qb.length

      // one streaming run per path: q/s over the timed tail; recall =
      // fraction of queries whose planted NN is in the emitted top-k
      // (and at rank 1 for the stricter recall@1)
      def run(quantized: Boolean): (Double, Double, Double) = {
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
        val in = MemoryStream[(Long, Array[Float])]
        val out = s"anngeom_out_${planes}_${nprobe}_$quantized"
        val ds =
          if (quantized)
            graft.streaming.Similarity.streamKnnQuantized(in.toDS(), idx, k, nprobe)
          else graft.streaming.Similarity.streamKnn(in.toDS(), idx, k, nprobe)
        val q = ds.toDF("query_id", "vec_id", "cos")
          .writeStream.format("memory").queryName(out)
          .outputMode("append").start()
        in.addData(queries.take(warm).toSeq); q.processAllAvailable()
        val t0 = System.nanoTime()
        queries.drop(warm).grouped(600).foreach { c =>
          in.addData(c.toSeq); q.processAllAvailable()
        }
        val qps = (queries.length - warm) / ((System.nanoTime() - t0) / 1e9)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"query_id").orderBy($"cos".desc, $"vec_id".asc)
        val got = spark.table(out)
          .withColumn("rk", row_number().over(w)).filter($"rk" <= k)
          .select($"query_id", $"vec_id", $"rk").as[(Long, Long, Int)]
          .collect().groupBy(_._1)
        q.stop()
        val probed = queries.take(nPlanted)
        val hitsK = probed.count { case (qid, _) =>
          got.getOrElse(qid, Array.empty).exists(_._2 == plantedIds(qid)) }
        val hits1 = probed.count { case (qid, _) =>
          got.getOrElse(qid, Array.empty)
            .exists(x => x._2 == plantedIds(qid) && x._3 == 1) }
        (qps, hitsK.toDouble / nPlanted, hits1.toDouble / nPlanted)
      }
      val (floatQps, floatRecall, floatR1) = run(quantized = false)
      val (int8Qps, int8Recall, _) = run(quantized = true)

      println(f"""{"ann_planes":$planes,"ann_nprobe":$nprobe,"stream_knn_indexed_q_per_sec":$floatQps%.0f,"stream_knn_indexed_int8_q_per_sec":$int8Qps%.0f,"recall_at_10_float":$floatRecall%.3f,"recall_at_1_float":$floatR1%.3f,"recall_at_10_int8":$int8Recall%.3f,"candidates_per_query":$candsPerQuery%.1f,"corpus_rows":$n,"queries":${queries.length},"planted_cos":$plantedCos,"env":$env,"sf":"$sfDir"}""")
      }

      AnnBenchData.dropIndex(spark, idx)
    }
    corpus.unpersist()
    spark.stop()
  }
}
