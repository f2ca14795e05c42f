package graft.sources

import graft.SparkSuite
import graft.functions.{ManifestFileIndex, TableLog}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** The DSv2 spike (`format("tablelogv2")`): batch read + versionAsOf
  * must be row-for-row the v1 path — same manifest pinning, same
  * stats pruning — while actually planning through the v2
  * BatchScan/ParquetScan machinery (the point of the spike). */
class TableLogV2Spec extends SparkSuite {
  import spark.implicits._

  private def freshTable(): String =
    java.nio.file.Files.createTempDirectory("graft_dsv2").toString + "/t"

  private def batch(b: Int) = Seq.tabulate(100)(i => (b * 100L + i, s"v$b-$i"))
    .toDF("ts", "v").coalesce(1)

  private def v2(dir: String) = spark.read.format("tablelogv2").load(dir)
  private def v1(dir: String) = spark.read.format("tablelog").load(dir)

  private def isV2Planned(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b
    }.nonEmpty

  test("v2 read is row-for-row the v1 relation, planned as a BatchScan") {
    val dir = freshTable()
    (0 to 2).foreach(b => TableLog.appendBatch(batch(b), dir, "r", b.toLong))
    val a = v2(dir)
    assert(isV2Planned(a), "the spike must plan through the v2 scan, " +
      s"not fall back: ${a.queryExecution.executedPlan}")
    assert(a.schema == v1(dir).schema)
    assert(a.collect().map(_.toSeq).toSet == v1(dir).collect().map(_.toSeq).toSet)
    assert(a.count() == 300L)
  }

  test("pushed filters prune files against manifest stats, exactly like v1") {
    val dir = freshTable()
    TableLog.appendBatch(batch(0), dir, "r", 0L)
    TableLog.trackStats(spark, dir, Seq("ts"))
    (1 to 3).foreach(b => TableLog.appendBatch(batch(b), dir, "r", b.toLong))
    val pred = $"ts".between(210L, 290L)
    ManifestFileIndex.lastListed = Seq("sentinel")
    val got = v2(dir).filter(pred).count()
    val openedV2 = ManifestFileIndex.lastListed.toSet
    ManifestFileIndex.lastListed = Seq("sentinel")
    assert(got == v1(dir).filter(pred).count())
    assert(openedV2 == ManifestFileIndex.lastListed.toSet,
      s"v1 and v2 pruned different file sets: $openedV2")
    assert(openedV2.size == 2 && openedV2.exists(_.startsWith("a0-")) &&
      openedV2.exists(_.startsWith("a3-")),
      s"wrong files opened for a pushed range: $openedV2")
  }

  test("versionAsOf matches readAt (era schema); beyond retention fails loudly") {
    val dir = freshTable()
    TableLog.appendBatch(batch(0), dir, "r", 0L)
    TableLog.appendBatch(batch(1), dir, "r", 1L)
    TableLog.dropColumn(spark, dir, "v")
    val atV1 = spark.read.format("tablelogv2").option("versionAsOf", "1")
      .load(dir)
    assert(atV1.schema.fieldNames.toSeq == Seq("ts", "v"))
    assert(atV1.collect().map(_.toSeq).toSet ==
      TableLog.readAt(spark, dir, 1L).collect().map(_.toSeq).toSet)
    assert(v2(dir).schema.fieldNames.toSeq == Seq("ts"))
    val e = intercept[IllegalStateException] {
      spark.read.format("tablelogv2").option("versionAsOf", "99").load(dir)
    }
    assert(e.getMessage.contains("no retained manifest"), e.getMessage)
  }

  test("SQL sessions read through the v2 face: CREATE TABLE ... USING tablelogv2") {
    val dir = freshTable()
    (0 to 1).foreach(b => TableLog.appendBatch(batch(b), dir, "r", b.toLong))
    spark.sql("DROP TABLE IF EXISTS dsv2_sql")
    spark.sql(s"CREATE TABLE dsv2_sql USING tablelogv2 OPTIONS (path '$dir')")
    try {
      assert(spark.sql("SELECT count(*) FROM dsv2_sql").head().getLong(0) == 200L)
      assert(spark.sql("SELECT sum(ts) FROM dsv2_sql WHERE ts < 100")
        .head().getLong(0) == (0L until 100L).sum)
    } finally spark.sql("DROP TABLE dsv2_sql")
  }

  test("orphans of crashed commits are never served; the table pins its manifest") {
    val dir = freshTable()
    TableLog.appendBatch(batch(0), dir, "r", 0L)
    val pinned = v2(dir)
    assert(pinned.count() == 100L)
    TableLog.appendBatch(batch(1), dir, "r", 1L)
    assert(pinned.count() == 100L,
      "a resolved v2 table must be a snapshot, not follow the head")
    val orphanSrc = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("a1-")).head
    java.nio.file.Files.copy(orphanSrc.toPath,
      new java.io.File(dir, "a9-orphan.parquet").toPath)
    assert(v2(dir).count() == 200L, "an unreferenced file leaked in")
  }

  test("v2 mergeSchema batch write: add-only drift evolves, exactly the v1 save's contract") {
    val dir = freshTable()
    batch(0).write.format("tablelogv2").mode("append").save(dir)
    // an added column evolves and commits; pre-evolution rows are null
    batch(1).withColumn("extra", lit(7)).write.format("tablelogv2")
      .option("mergeSchema", "true").mode("append").save(dir)
    val df = TableLog.read(spark, dir)
    assert(df.schema.fieldNames.toSeq == Seq("ts", "v", "extra"))
    assert(df.count() == 200L)
    assert(df.filter($"extra".isNull).count() == 100L)
    assert(df.filter($"extra" === 7).count() == 100L)
    // the v2 face too: the files landed in batch order, served by name
    assert(v2(dir).filter($"extra" === 7).count() == 100L)
    // a column-ORDER-only difference aligns without committing an evolve
    val vBefore = TableLog.latest(spark, dir).get.version
    batch(2).withColumn("extra", lit(8)).select($"extra", $"v", $"ts")
      .write.format("tablelogv2").option("mergeSchema", "true")
      .mode("append").save(dir)
    assert(TableLog.read(spark, dir).count() == 300L)
    assert(TableLog.latest(spark, dir).get.version == vBefore + 1,
      "an order-only merge must not commit an evolve")
    assert(TableLog.read(spark, dir).filter($"extra" === 8).count() == 100L,
      "order-permuted columns must land under their own names")
    // a batch MISSING a table column is a drop — loud even with the option
    val d = intercept[Exception] {
      batch(3).write.format("tablelogv2").option("mergeSchema", "true")
        .mode("append").save(dir)
    }
    assert(d.getMessage.contains("missing column"), d.getMessage)
    // a type change is a rewrite — loud even with the option
    val t = intercept[Exception] {
      batch(3).withColumn("extra", lit("not-an-int")).write
        .format("tablelogv2").option("mergeSchema", "true")
        .mode("append").save(dir)
    }
    assert(t.getMessage.contains("changes type"), t.getMessage)
    // without the option, add-only drift stays the loud default
    val s = intercept[Exception] {
      batch(3).withColumn("extra", lit(7)).withColumn("more", lit(1L))
        .write.format("tablelogv2").mode("append").save(dir)
    }
    assert(s.getMessage.contains("schema drift"), s.getMessage)
    assert(TableLog.read(spark, dir).count() == 300L,
      "a rejected merge must commit nothing")
  }

  test("v2 mergeSchema streaming sink: a restarted writer with an added column evolves instead of wedging") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = freshTable()
    val ck1 = java.nio.file.Files.createTempDirectory("graft_v2ms_ck1").toString
    val in1 = MemoryStream[(Long, String)]
    val q1 = in1.toDF().toDF("ts", "v")
      .writeStream.format("tablelogv2").option("path", dir)
      .option("checkpointLocation", ck1).outputMode("append").start()
    try {
      in1.addData((0L, "a")); q1.processAllAvailable()
    } finally q1.stop()
    val ck2 = java.nio.file.Files.createTempDirectory("graft_v2ms_ck2").toString
    val in2 = MemoryStream[(Long, String, Long)]
    val q2 = in2.toDF().toDF("ts", "v", "n")
      .writeStream.format("tablelogv2").option("path", dir)
      .option("checkpointLocation", ck2).option("mergeSchema", "true")
      .outputMode("append").start()
    try {
      in2.addData((1L, "b", 10L)); q2.processAllAvailable()
      in2.addData((2L, "c", 20L)); q2.processAllAvailable()
    } finally q2.stop()
    val got = TableLog.read(spark, dir)
    assert(got.schema.fieldNames.toSeq == Seq("ts", "v", "n"))
    assert(got.orderBy($"ts").select($"n").as[Option[Long]]
      .collect().toSeq == Seq(None, Some(10L), Some(20L)))
    // and WITHOUT the option the drifted stream fails loudly, nothing lands
    val ck3 = java.nio.file.Files.createTempDirectory("graft_v2ms_ck3").toString
    val in3 = MemoryStream[(Long, String, Long, Long)]
    val q3 = in3.toDF().toDF("ts", "v", "n", "m")
      .writeStream.format("tablelogv2").option("path", dir)
      .option("checkpointLocation", ck3).outputMode("append").start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      in3.addData((3L, "d", 30L, 1L)); q3.processAllAvailable()
    }
    assert(e.getMessage.contains("schema drift"), e.getMessage)
    q3.stop()
    assert(TableLog.read(spark, dir).count() == 3L)
  }
}
