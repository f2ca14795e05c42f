package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField}

/** The row-level change feed ([[TableLog.readChanges]]): the judge of
  * its correctness is fold-equals-snapshot — a mirror built by unioning
  * the feed's appends and `exceptAll`-removing its deletes must equal
  * `readAt(v)` at EVERY retained version, through delete, restore,
  * compact and evolve. Plus per-commit-kind emission rules and the
  * `format("tablelog").option("readChangeFeed", "true")` face. */
class TableLogChangesSpec extends SparkSuite {
  import spark.implicits._

  private def fresh(): String =
    java.nio.file.Files.createTempDirectory("graft_cdf").toString + "/t"

  private def rows(ids: Range, tag: String): DataFrame =
    ids.map(i => (i.toLong, tag)).toDF("id", "v").coalesce(1)

  /** Multiset canonical form over the given columns. */
  private def canon(df: DataFrame, cols: Seq[String]): Seq[String] =
    df.select(cols.map(col): _*).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

  test("a mirror folded from the feed equals readAt(v) at every retained version") {
    val dir = fresh()
    TableLog.appendBatch(rows(0 until 100, "b0"), dir, "r", 0L)   // v0
    TableLog.appendBatch(rows(100 until 200, "b1"), dir, "r", 1L) // v1
    TableLog.delete(spark, dir, col("id") < 30)                   // v2
    TableLog.appendBatch(rows(200 until 250, "b2"), dir, "r", 2L) // v3
    TableLog.restore(spark, dir, 2L)                              // v4
    TableLog.compact(spark, dir, 1L << 20)                        // v5
    val cur = TableLog.latest(spark, dir).get.schema.get
    TableLog.evolve(spark, dir,                                   // v6
      cur.add(StructField("w", LongType, nullable = true)))
    TableLog.appendBatch(                                         // v7
      (300 until 310).map(i => (i.toLong, "b3", i.toLong * 10))
        .toDF("id", "v", "w").coalesce(1), dir, "r2", 0L)
    assert(TableLog.latest(spark, dir).get.version == 7L)

    for (v <- 0L to 7L) {
      val expected = TableLog.readAt(spark, dir, v)
      // compare in the ERA's columns: the feed pins the newest schema
      // (added columns null-fill), readAt is era-honest
      val era = expected.schema.fieldNames.toSeq
      val feed = TableLog.readChanges(spark, dir, -1L, v)._1
        .getOrElse(fail(s"no changes up to version $v"))
      val apps = feed.filter($"_change_type" === "append")
        .drop("_change_type", "_commit_version")
      val dels = feed.filter($"_change_type" === "delete")
        .drop("_change_type", "_commit_version")
      assert(canon(apps.exceptAll(dels), era) == canon(expected, era),
        s"mirror diverges from readAt($v)")
    }
  }

  test("per-commit-kind emission: delete emits deletes, restore emits the rollback, compact and evolve emit nothing") {
    val dir = fresh()
    TableLog.appendBatch(rows(0 until 100, "b0"), dir, "r", 0L)   // v0
    TableLog.appendBatch(rows(100 until 200, "b1"), dir, "r", 1L) // v1
    TableLog.delete(spark, dir, col("id") < 30)                   // v2
    TableLog.appendBatch(rows(200 until 250, "b2"), dir, "r", 2L) // v3
    TableLog.restore(spark, dir, 2L)                              // v4
    TableLog.compact(spark, dir, 1L << 20)                        // v5

    // the delete version: exactly the removed rows, all tagged delete —
    // the swapped-in survivor file's rows cancel against the swapped-out
    // originals (exceptAll), and planning read only the touched files
    val d = TableLog.readChanges(spark, dir, 1L, 2L)._1.get
    assert(d.select($"_change_type").distinct().as[String]
      .collect().toSeq == Seq("delete"))
    assert(d.select($"id").as[Long].collect().sorted.toSeq
      == (0L until 30L))
    // the restore version: the rolled-back append surfaces as deletes
    val r = TableLog.readChanges(spark, dir, 3L, 4L)._1.get
    assert(r.filter($"_change_type" === "append").count() == 0L)
    assert(r.filter($"_change_type" === "delete").select($"id").as[Long]
      .collect().sorted.toSeq == (200L until 250L))
    // compact: row-preserving, nothing
    assert(TableLog.readChanges(spark, dir, 4L, 5L)._1.isEmpty)
    // _commit_version tags each change with the version that made it
    val all = TableLog.readChanges(spark, dir, -1L, 4L)._1.get
    assert(all.filter($"_commit_version" === 2L).count() == 30L)
    assert(all.filter($"_commit_version" === 4L).count() == 50L)
    assert(all.filter($"_commit_version" === 1L && $"_change_type" === "append")
      .count() == 100L)
  }

  test("a restore that RE-ADDS rows emits them as appends (both diff directions live)") {
    val dir = fresh()
    TableLog.appendBatch(rows(0 until 10, "b0"), dir, "r", 0L) // v0
    TableLog.delete(spark, dir, col("id") < 3)                 // v1
    TableLog.restore(spark, dir, 0L)                           // v2
    val f = TableLog.readChanges(spark, dir, 1L, 2L)._1.get
    // the re-referenced original file's surviving rows cancel against
    // the removed survivor rewrite; only the resurrected rows remain
    assert(f.filter($"_change_type" === "delete").count() == 0L)
    assert(f.filter($"_change_type" === "append").select($"id").as[Long]
      .collect().sorted.toSeq == Seq(0L, 1L, 2L))
    // and the fold agrees with the snapshot
    assert(TableLog.read(spark, dir).count() == 10L)
  }

  test("format(\"tablelog\").option(\"readChangeFeed\") is the same feed; since is required; empty feeds keep the schema") {
    val dir = fresh()
    TableLog.appendBatch(rows(0 until 5, "b0"), dir, "r", 0L) // v0
    TableLog.delete(spark, dir, col("id") === 0L)             // v1
    val df = spark.read.format("tablelog")
      .option("readChangeFeed", "true").option("since", "-1").load(dir)
    assert(df.schema.fieldNames.toSeq
      == Seq("id", "v", "_change_type", "_commit_version"))
    val scala = TableLog.readChanges(spark, dir, -1L)._1.get
    assert(canon(df, df.schema.fieldNames.toSeq)
      == canon(scala, df.schema.fieldNames.toSeq))
    // bounded above
    assert(spark.read.format("tablelog").option("readChangeFeed", "true")
      .option("since", "-1").option("until", "0").load(dir).count() == 5L)
    // a missing since is loud, not silently from-the-beginning
    val e = intercept[IllegalArgumentException] {
      spark.read.format("tablelog").option("readChangeFeed", "true").load(dir)
    }
    assert(e.getMessage.contains("since"), e.getMessage)
    // an up-to-date consumer gets an EMPTY frame with the full shape
    val empty = spark.read.format("tablelog")
      .option("readChangeFeed", "true").option("since", "1").load(dir)
    assert(empty.count() == 0L)
    assert(empty.schema.fieldNames.toSeq
      == Seq("id", "v", "_change_type", "_commit_version"))
  }

  test("map-typed tables: the append feed works; a delete version fails loudly at planning, not as a buried AnalysisException") {
    val dir = fresh()
    val mapped = Seq((1L, Map("a" -> 1)), (2L, Map("b" -> 2)), (3L, Map("c" -> 3)))
      .toDF("id", "attrs").coalesce(1)
    TableLog.appendBatch(mapped, dir, "r", 0L)
    // append-only feeds never diff, so maps flow through
    val (feed, v) = TableLog.readChanges(spark, dir, -1L)
    assert(feed.get.count() == 3L)
    // a delete version needs exceptAll, which Spark rejects on maps —
    // the guard must name the column and the reason at PLAN time
    TableLog.deleteIn(spark, dir, "id", Seq(1L))
    val e = intercept[IllegalArgumentException] {
      TableLog.readChanges(spark, dir, v)
    }
    assert(e.getMessage.contains("map-typed") && e.getMessage.contains("attrs"),
      s"wrong error: ${e.getMessage}")
  }

  test("a deep catch-up (150 versions) plans and folds in one readChanges call") {
    val dir = fresh()
    (0 until 150).foreach { b =>
      TableLog.appendBatch(rows(b * 10 until (b + 1) * 10, s"b$b"), dir, "r", b.toLong)
    }
    val (feed, v) = TableLog.readChanges(spark, dir, -1L)
    assert(v == 149L)
    assert(feed.get.count() == 1500L)
    assert(feed.get.agg(countDistinct(col("_commit_version"))).head().getLong(0) == 150L)
  }

  test("a table already carrying a tag-named column fails loudly") {
    val dir = fresh()
    TableLog.appendBatch(
      Seq((1L, "x")).toDF("id", "_change_type").coalesce(1), dir, "r", 0L)
    val e = intercept[IllegalArgumentException] {
      TableLog.readChanges(spark, dir, -1L)
    }
    assert(e.getMessage.contains("_change_type"), e.getMessage)
  }
}
