package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Custom Aggregation contract (initial/onNew/onOld — reference
  * docs/source/dataframes.rst:75-123, tested at test_dataframes.py:961-990):
  * running use, windowed use with retraction, and the Spark Aggregator
  * bridge for batch.
  */
class AggregationSpec extends SparkSuite {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  /** The docs' canonical example: a mean with add/retract. */
  object MeanAgg extends Aggregation[Double, (Double, Long), Double] {
    def initial: (Double, Long) = (0.0, 0L)
    def onNew(s: (Double, Long), v: Double): ((Double, Long), Double) = {
      val s2 = (s._1 + v, s._2 + 1); (s2, s2._1 / s2._2)
    }
    override def onOld(s: (Double, Long), v: Double): ((Double, Long), Double) = {
      val s2 = (s._1 - v, s._2 - 1); (s2, s2._1 / s2._2)
    }
  }

  test("accumulate: running custom mean across batches") {
    val in = MemoryStream[(Int, Long, Double)]
    val out = Aggregation.accumulate(in.toDS(), MeanAgg)
    val q = out.toDF("key", "seq", "mean").writeStream
      .format("memory").queryName("agg_run").outputMode("append").start()
    in.addData((1, 1L, 1.0), (1, 2L, 3.0)); q.processAllAvailable()
    in.addData((1, 3L, 5.0)); q.processAllAvailable(); q.stop()
    val got = spark.table("agg_run").as[(Int, Long, Double)].collect().sortBy(_._2).map(_._3)
    assert(got.toSeq == Seq(1.0, 2.0, 3.0))
  }

  test("windowed: trailing-2 mean maintained by add/retract, no recompute") {
    val in = MemoryStream[(Int, Long, Double)]
    val out = Aggregation.windowed(in.toDS(), 2, MeanAgg)
    val q = out.toDF("key", "seq", "mean").writeStream
      .format("memory").queryName("agg_win").outputMode("append").start()
    in.addData((1, 1L, 1.0), (1, 2L, 3.0), (1, 3L, 5.0), (1, 4L, 7.0))
    q.processAllAvailable(); q.stop()
    val got = spark.table("agg_win").as[(Int, Long, Double)].collect().sortBy(_._2).map(_._3)
    // windows: [1], [1,3], [3,5], [5,7]
    assert(got.toSeq == Seq(1.0, 2.0, 4.0, 6.0))
  }

  test("toSparkAggregator: batch typed use") {
    val agg = Aggregation.toSparkAggregator[Double, (Double, Long), Double](
      MeanAgg, (a, b) => (a._1 + b._1, a._2 + b._2),
      s => if (s._2 == 0) 0.0 else s._1 / s._2)
    val got = Seq(1.0, 2.0, 3.0, 4.0).toDS().select(agg.toColumn).head()
    assert(got == 2.5)
  }
}
