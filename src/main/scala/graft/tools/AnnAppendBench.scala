package graft.tools

import org.apache.spark.sql.functions._

import graft.Sessions
import graft.functions.AnnIndex

/** Measures the claim behind the keyed [[AnnIndex.append]]: its cost is
  * O(delta), independent of index size, while the keyless dedup append
  * scans the corpus tables per call and grows with them.
  *
  * `runMain graft.tools.AnnAppendBench [sfDir] [factor]` builds two
  * indexes from the sf dir's embeddings — one on the corpus as-is, one
  * on the corpus synthetically grown `factor`× (ScaleUp's signed
  * coordinate permutation, orthogonal so geometry survives) — then
  * appends the SAME delta to each through both the keyed and the
  * keyless path, timing each append. One JSON line:
  * keyed times should track the delta (flat across corpus sizes);
  * keyless times should track the corpus. */
object AnnAppendBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val factor = args.lift(1).map(_.toInt).getOrElse(8)
    val spark = Sessions.local(appName = "graft-ann-append-bench")
    import spark.implicits._

    val base = spark.read.parquet(sfDir + "/embeddings.parquet")
      .select($"vec_id", $"embedding").cache()
    val nBase = base.count()
    // grow the corpus factor× with per-copy signed coordinate
    // permutations (orthogonal — norms/cosines preserved within a copy)
    val dim = base.head().getAs[scala.collection.Seq[Float]]("embedding").length
    val grown = (0 until factor).map { c =>
      if (c == 0) base
      else {
        val r = new scala.util.Random(c * 7919)
        val perm = r.shuffle((0 until dim).toList).toArray
        val sign = Array.fill(dim)(if (r.nextBoolean()) 1f else -1f)
        val (pB, sB) = (perm, sign)
        base.as[(Long, Array[Float])].map { case (id, v) =>
          val w = new Array[Float](v.length)
          var i = 0
          while (i < v.length) { w(i) = v(pB(i)) * sB(i); i += 1 }
          (id + c.toLong * 10_000_000L, w)
        }.toDF("vec_id", "embedding")
      }
    }.reduce(_ unionByName _).cache()
    val nGrown = grown.count()

    // the delta: a fixed 2k-vector slice with fresh ids, same for both.
    // The offset must clear EVERY grown copy's id range (copy c shifts
    // by c*1e7, so factor 256 reaches ~2.56e9): colliding ids would make
    // the keyless path's anti-join dedup the delta away on the big
    // corpus and the comparison would time different work.
    val delta = base.limit(2000)
      .select(($"vec_id" + 100_000_000_000L).as("vec_id"), $"embedding").cache()
    val nDelta = delta.count()

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def run(corpus: org.apache.spark.sql.DataFrame, name: String): (Double, Double) = {
      val h = AnnIndex.build(corpus, name, planes = 8, buckets = 16)
      val keyed = timed(AnnIndex.append(spark, h, delta, "bench-delta"))
      // keyless on a fresh twin so the keyed insert doesn't shrink its work
      val h2 = AnnIndex.build(corpus, name + "2", planes = 8, buckets = 16)
      val keyless = timed(AnnIndex.append(spark, h2, delta))
      (keyed, keyless)
    }
    run(base, "annab_warm") // JIT/session warmup, discarded
    val (kSmall, aSmall) = run(base, "annab_small")
    val (kBig, aBig) = run(grown, "annab_big")
    println(f"""{"corpus_small":$nBase,"corpus_big":$nGrown,"delta":$nDelta,"keyed_small_sec":$kSmall%.2f,"keyed_big_sec":$kBig%.2f,"keyless_small_sec":$aSmall%.2f,"keyless_big_sec":$aBig%.2f,"keyed_ratio":${kBig / kSmall}%.2f,"keyless_ratio":${aBig / aSmall}%.2f,"sf":"$sfDir","factor":$factor}""")
    spark.stop()
  }
}
