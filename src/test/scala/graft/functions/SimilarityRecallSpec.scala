package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Measured recall for the similarity ANN paths — the LshGeometrySpec
  * discipline applied to vectors: a planted-neighbor corpus with
  * CONTROLLED cosine, recall@1 measured against brute-force truth, and
  * the sign-LSH curve pinned to the analytic collision probability
  * (1 − θ/π)^planes that justifies the default plane count. Multi-probe
  * and IVF recall are measured as curves against their cost knob
  * (candidates scanned per query), monotone by construction and exact at
  * the knob's maximum.
  *
  * These are the numbers a user needs to choose planes/nprobe: at the
  * planted cosine 0.9 (θ ≈ 0.451 rad) single-probe recall is ≈ 0.86^p —
  * ~0.54 at 4 planes, ~0.29 at 8, ~0.16 at 12 — and the way to buy
  * recall back WITHOUT fattening every bucket is multi-probe, which the
  * measured curve here shows recovering most of it at a small multiple
  * of the single-bucket candidate cost. The summary table lives in
  * SURVEY.md §5 (ANN recall-vs-cost).
  */
class SimilarityRecallSpec extends SparkSuite {
  import spark.implicits._

  private val Dim = 64
  private val NBase = 1500
  private val NPairs = 300
  private val PlantedCos = 0.9

  private def unit(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(v.map(x => x * x).sum)
    v.map(_ / n)
  }
  private def gauss(r: scala.util.Random): Array[Double] =
    unit(Array.fill(Dim)(r.nextGaussian()))

  // corpus = base noise + one planted neighbor per query at cosine 0.9:
  // n = c·q + sqrt(1−c²)·(unit component of a fresh gaussian ⊥ q)
  private lazy val (corpusVecs, queryVecs) = {
    val r = new scala.util.Random(421)
    val base = Seq.tabulate(NBase)(i => (i.toLong, gauss(r)))
    val qs = Seq.tabulate(NPairs)(i => (10000L + i, gauss(r)))
    val planted = qs.map { case (qid, q) =>
      val g = gauss(r)
      val dot = q.zip(g).map { case (a, b) => a * b }.sum
      val perp = unit(g.zip(q).map { case (gi, qi) => gi - dot * qi })
      val n = q.zip(perp).map { case (qi, pi) =>
        PlantedCos * qi + math.sqrt(1 - PlantedCos * PlantedCos) * pi }
      (20000L + (qid - 10000L), n)
    }
    (base ++ planted, qs)
  }
  private def toF(v: Array[Double]): Array[Float] = v.map(_.toFloat)

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    val d = a.zip(b).map { case (x, y) => x * y }.sum
    d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
  }

  // brute-force truth: (query_id -> (true_nn_id, true_cos))
  private lazy val truth: Map[Long, (Long, Double)] =
    queryVecs.map { case (qid, q) =>
      val (bid, bcos) = corpusVecs.iterator
        .map { case (vid, v) => (vid, cos(q, v)) }
        .maxBy { case (vid, c) => (c, -vid) }
      qid -> ((bid, bcos))
    }.toMap

  // buckets/projections come from the REAL kernels (the md5 hyperplanes
  // lsh_bucket signs and rp_project measures), via one small DF pass
  private def bucketsOf(vecs: Seq[(Long, Array[Double])], planes: Int)
      : Map[Long, (Long, Array[Double])] =
    vecs.map { case (id, v) => (id, toF(v)) }.toDF("id", "emb")
      .select($"id", graft.functions.native.lsh_bucket($"emb", planes).as("bucket"),
        graft.functions.native.rp_project($"emb", planes).as("projs"))
      .as[(Long, Long, Array[Double])].collect()
      .map { case (id, b, p) => id -> ((b, p)) }.toMap

  /** recall@1 and mean candidates/query for a multi-probe sign-LSH scan
    * — the exact candidate semantics of similarity_ann_lsh (batch) and
    * streamKnn (streaming), whose bucket parity those specs pin. */
  private def lshRecallAndCost(planes: Int, nprobe: Int): (Double, Double) = {
    val cb = bucketsOf(corpusVecs, planes)
    val qb = bucketsOf(queryVecs, planes)
    val occupancy = cb.values.groupBy(_._1).map { case (b, xs) => b -> xs.size }
    var hits = 0
    var cands = 0L
    queryVecs.foreach { case (qid, _) =>
      val (qBucket, projs) = qb(qid)
      val probes = AnnIndex.multiProbe(qBucket, projs, nprobe).toSet
      val (nnId, _) = truth(qid)
      if (probes.contains(cb(nnId)._1)) hits += 1
      cands += probes.iterator.map(b => occupancy.getOrElse(b, 0)).sum
    }
    (hits.toDouble / queryVecs.size, cands.toDouble / queryVecs.size)
  }

  test("query-directed multiProbe: exhaustive-ranking parity at planes <= 12, nesting and constant work beyond") {
    val rnd = new scala.util.Random(42)
    // the independent oracle: the pre-r17 exhaustive variant, ranking
    // all 2^planes masks by (float score, own-bucket pin, bucket id)
    def exhaustive(bucket: Long, projs: Array[Double], nprobe: Int): Array[Long] = {
      val planes = projs.length
      val total = 1 << planes
      val n = math.min(math.max(nprobe, 1), total)
      if (n == 1) return Array(bucket)
      val scored = Array.tabulate(total) { mask =>
        var s = 0.0
        var h = 0
        while (h < planes) {
          if ((mask & (1 << h)) != 0) s += math.abs(projs(h))
          h += 1
        }
        (s, if (mask == 0) 0 else 1, bucket ^ mask.toLong)
      }
      scored.sorted.iterator.take(n).map(_._3).toArray
    }
    for (planes <- Seq(1, 2, 3, 5, 8, 10, 12); trial <- 0 until 12) {
      // every 4th projection is EXACTLY zero — the query-on-hyperplane
      // tie case the group drain exists for
      val projs = Array.fill(planes)(
        if (rnd.nextInt(4) == 0) 0.0 else rnd.nextGaussian())
      val bucket = rnd.nextLong() & ((1L << planes) - 1)
      for (nprobe <- Seq(1, 2, 3, 7, 1 << planes)) {
        val got = AnnIndex.multiProbe(bucket, projs, nprobe)
        val want = exhaustive(bucket, projs, nprobe)
        assert(got.toSeq == want.toSeq,
          s"planes=$planes nprobe=$nprobe trial=$trial: " +
            s"got ${got.take(8).toSeq}, want ${want.take(8).toSeq}")
      }
    }
    // beyond the old cap: probe sets still NEST (so recall is monotone
    // in nprobe — a bigger probe set is a superset of candidates),
    // stay distinct, and cost O(nprobe·planes), not 2^planes
    val projs16 = Array.fill(16)(rnd.nextGaussian())
    val b16 = rnd.nextLong() & 0xFFFFL
    val sets = Seq(1, 4, 16, 64, 256).map(np =>
      AnnIndex.multiProbe(b16, projs16, np))
    sets.sliding(2).foreach { case Seq(a, b) =>
      assert(b.take(a.length).toSeq == a.toSeq, "probe sets must nest")
    }
    assert(sets.last.length == 256 && sets.last.distinct.length == 256)
    assert(sets.head.head == b16, "own bucket always probes first")
    // planes = 40 would be 2^40 masks exhaustively; query-directed is
    // instant and returns exactly nprobe distinct buckets
    val projs40 = Array.fill(40)(rnd.nextGaussian())
    val b40 = rnd.nextLong() & ((1L << 40) - 1)
    val got40 = AnnIndex.multiProbe(b40, projs40, 64)
    assert(got40.length == 64 && got40.distinct.length == 64 && got40.head == b40)
  }

  test("sign-LSH single-probe recall matches the analytic (1 - theta/pi)^planes curve") {
    // analytic prediction from each query's TRUE nearest-neighbor angle
    def analytic(planes: Int): Double =
      queryVecs.map { case (qid, _) =>
        val theta = math.acos(math.min(1.0, truth(qid)._2))
        math.pow(1.0 - theta / math.Pi, planes)
      }.sum / queryVecs.size
    val measured = Seq(4, 8, 12).map(p => (p, lshRecallAndCost(p, 1)._1, analytic(p)))
    measured.foreach { case (p, m, a) =>
      assert(math.abs(m - a) < 0.10,
        s"planes=$p: measured recall $m vs analytic $a — kernel and theory disagree")
    }
    // more planes = smaller buckets = lower single-probe recall: the
    // analytic gaps (~0.54 / 0.29 / 0.16) dwarf sampling noise
    assert(measured(0)._2 > measured(1)._2 && measured(1)._2 > measured(2)._2,
      s"recall not decreasing in planes: $measured")
  }

  test("multi-probe buys recall back at measured candidate cost (planes = 8)") {
    val curve = Seq(1, 2, 4, 8, 16).map { np =>
      val (r, c) = lshRecallAndCost(8, np)
      (np, r, c)
    }
    // recall monotone (nested probe sets) and substantial at nprobe 8
    curve.sliding(2).foreach { case Seq((_, r1, c1), (np, r2, c2)) =>
      assert(r2 >= r1 - 1e-12, s"recall fell at nprobe=$np: $curve")
      assert(c2 > c1, s"candidate cost must rise with nprobe: $curve")
    }
    val r1 = curve.head._2
    val r8 = curve(3)._2
    assert(r8 >= math.min(0.95, r1 + 0.3),
      s"multi-probe at nprobe=8 should recover most recall: $curve")
    // cost grows ~linearly in probed buckets, far below the brute-force
    // corpus scan: at nprobe=8 we probe 8/256 of the bucket space
    val bruteCost = corpusVecs.size.toDouble
    assert(curve(3)._3 < bruteCost / 8,
      s"nprobe=8 cost ${curve(3)._3} not far below brute ${bruteCost}")
    info(s"recall/cost curve (planes=8): " +
      curve.map { case (np, r, c) => f"nprobe=$np%d r=$r%.3f cands=$c%.0f" }.mkString("; "))
  }

  test("IVF recall rises with nprobe and is exact at nprobe = cells") {
    val cells = 16
    val corpusDf = corpusVecs.map { case (id, v) => (id, toF(v)) }
      .toDF("vec_id", "embedding")
    val queriesDf = queryVecs.map { case (id, v) => (id, toF(v)) }
      .toDF("query_id", "qemb")
    val index = Ivf.build(corpusDf, cells, iters = 5)
    def recallAt(nprobe: Int): Double = {
      val got = Ivf.search(index, queriesDf, topK = 1, nprobe = nprobe)
        .select($"query_id", $"vec_id")
        .as[(Long, Long)].collect().toMap
      queryVecs.count { case (qid, _) =>
        got.get(qid).contains(truth(qid)._1)
      }.toDouble / queryVecs.size
    }
    val curve = Seq(1, 2, 4, cells).map(np => (np, recallAt(np)))
    curve.sliding(2).foreach { case Seq((_, r1), (np, r2)) =>
      assert(r2 >= r1 - 1e-12, s"IVF recall fell at nprobe=$np: $curve")
    }
    assert(curve.last._2 == 1.0, s"nprobe = cells must be exact: $curve")
    assert(curve.head._2 > 0.5,
      s"nearest-cell probe should usually hold the true NN: $curve")
    info(s"IVF recall curve (cells=$cells): " +
      curve.map { case (np, r) => f"nprobe=$np%d r=$r%.3f" }.mkString("; "))
  }
}
