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
}
