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
  }
}
