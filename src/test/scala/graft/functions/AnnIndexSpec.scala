package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The persisted ANN index's batch-side contract: incremental appends
  * equal a from-scratch rebuild (rows AND plan shape), and the bucketed
  * layout survives appends so probe joins stay Exchange-free. The
  * streaming probe parity and recall live in SimilarityStreamSpec /
  * SimilarityRecallSpec. */
class AnnIndexSpec extends SparkSuite {
  import spark.implicits._

  private def indexRows(h: AnnIndex.Handle): Set[(Long, Long, Long)] =
    AnnIndex.probeSide(spark, h)
      .select($"vec_id", $"bucket", round($"nrm" * 1e6).cast("long"))
      .as[(Long, Long, Long)].collect().toSet

  test("append == rebuild: enriched rows identical, bucketed plan preserved") {
    val corpus = spark.read.parquet(sf() + "/embeddings.parquet")
      .select($"vec_id", $"embedding")
    val ids = corpus.select($"vec_id").as[Long].collect().sorted
    val mid = ids(ids.length / 2)
    // incremental: build on the first half, append the second
    val inc = AnnIndex.build(corpus.filter($"vec_id" < mid), "annspec_inc",
      planes = 8, buckets = 8)
    AnnIndex.append(spark, inc, corpus.filter($"vec_id" >= mid))
    // one shot over everything
    val full = AnnIndex.build(corpus, "annspec_full", planes = 8, buckets = 8)
    assert(indexRows(inc) == indexRows(full),
      "appended index diverged from a from-scratch rebuild")
    assert(AnnIndex.vecSide(spark, inc).count() ==
      AnnIndex.vecSide(spark, full).count())
    // int8 sidecars byte-identical too (deterministic quantization)
    def sidecars(h: AnnIndex.Handle) = AnnIndex.probeSide(spark, h)
      .select($"vec_id", $"q").as[(Long, Array[Byte])].collect()
      .map { case (id, q) => (id, q.toSeq) }.toMap
    assert(sidecars(inc) == sidecars(full))
    // the appended files honored the bucket spec: an aggregation on the
    // bucket column over the appended table still plans with NO Exchange
    val agg = AnnIndex.probeSide(spark, inc).groupBy($"bucket").count()
    assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"),
      s"append broke the bucketed layout:\n${agg.queryExecution.executedPlan}")
    // ...and the rows PHYSICALLY landed in the right bucket files — the
    // catalog metadata alone cannot prove that, and a misplaced row is
    // silently invisible to every Exchange-free bucket join. Each file
    // name carries its bucket ordinal (_NNNNN); every row inside must
    // hash there (bucketing uses pmod(murmur3, n) — SQL hash()'s seed)
    val loc = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"),
      inc.probeTable.toLowerCase)
    val bucketFiles = loc.listFiles().filter(_.getName.endsWith(".parquet"))
    assert(bucketFiles.length > 8, "fixture vacuity: append added no new files")
    val BucketId = "_(\\d{5})\\.".r
    var checked = 0
    bucketFiles.foreach { f =>
      BucketId.findFirstMatchIn(f.getName).foreach { m =>
        val want = m.group(1).toInt
        val got = spark.read.parquet(f.toString)
          .select(expr("pmod(hash(bucket), 8)")).distinct().as[Int].collect().toSet
        assert(got.subsetOf(Set(want)),
          s"${f.getName}: rows hash to $got, file claims bucket $want")
        checked += 1
      }
    }
    assert(checked > 8, s"bucket-ordinal pattern matched only $checked files")
  }

  test("append is idempotent per table: a partial crash replays to a consistent index") {
    val corpus = spark.read.parquet(sf() + "/embeddings.parquet")
      .select($"vec_id", $"embedding")
    val ids = corpus.select($"vec_id").as[Long].collect().sorted
    val mid = ids(ids.length / 2)
    val h = AnnIndex.build(corpus.filter($"vec_id" < mid), "annspec_crash",
      planes = 8, buckets = 8)
    val delta = corpus.filter($"vec_id" >= mid)
    // simulate the crash window: the vec side of the delta committed,
    // the probe side did not (vec is written first by design — orphans
    // there are unreachable, never wrong)
    import graft.functions.{native, Ivf}
    delta.as[(Long, Array[Float])]
      .map { case (id, v) =>
        var n = 0.0; var i = 0
        while (i < v.length) { n += v(i).toDouble * v(i); i += 1 }
        (id, v, math.sqrt(n))
      }.toDF("vec_id", "embedding", "nrm").filter($"nrm" > 0)
      .write.insertInto(h.vecTable)
    val vecAfterCrash = AnnIndex.vecSide(spark, h).count()
    // the retry: same append call, whole delta
    AnnIndex.append(spark, h, delta)
    // vec side did NOT double-insert; probe side filled in; both agree
    assert(AnnIndex.vecSide(spark, h).count() == vecAfterCrash,
      "replayed append duplicated vec-side rows")
    assert(AnnIndex.probeSide(spark, h).count() == vecAfterCrash,
      "probe side incomplete after replay")
    val dupVec = AnnIndex.vecSide(spark, h).groupBy($"vec_id").count()
      .filter($"count" > 1).count()
    val dupProbe = AnnIndex.probeSide(spark, h).groupBy($"vec_id").count()
      .filter($"count" > 1).count()
    assert(dupVec == 0 && dupProbe == 0, s"duplicates: vec=$dupVec probe=$dupProbe")
    // and the repaired index equals a from-scratch rebuild
    val full = AnnIndex.build(corpus, "annspec_crash_full", planes = 8, buckets = 8)
    assert(indexRows(h) == indexRows(full))
  }
}
