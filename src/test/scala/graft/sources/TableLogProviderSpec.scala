package graft.sources

import graft.SparkSuite
import graft.functions.{ManifestFileIndex, TableLog}
import org.apache.spark.sql.functions._

/** The `format("tablelog")` batch face: committed snapshots readable
  * from plain SQL/DataFrame sessions — manifest-pinned file lists,
  * automatic stats pruning, `versionAsOf` time travel — plus the same
  * short name as the streaming tail. */
class TableLogProviderSpec extends SparkSuite {
  import spark.implicits._

  private def freshTable(): String =
    java.nio.file.Files.createTempDirectory("graft_dsv1").toString + "/t"

  private def batch(b: Int) = Seq.tabulate(100)(i => (b * 100L + i, s"v$b-$i"))
    .toDF("ts", "v").coalesce(1)

  test("load() reads the committed snapshot and prunes files on pushed filters") {
    val dir = freshTable()
    TableLog.appendBatch(batch(0), dir, "r", 0L)
    TableLog.trackStats(spark, dir, Seq("ts"))
    (1 to 3).foreach(b => TableLog.appendBatch(batch(b), dir, "r", b.toLong))
    val df = spark.read.format("tablelog").load(dir)
    assert(df.count() == 400L)
    assert(df.schema.fieldNames.toSeq == Seq("ts", "v"))
    // a plain filter prunes at the MANIFEST level: of the stat-carrying
    // files only the matching span opens (the pre-registration version-0
    // file is conservatively kept)
    ManifestFileIndex.lastListed = Seq("sentinel")
    assert(df.filter($"ts".between(210L, 290L)).count() == 81L)
    val opened = ManifestFileIndex.lastListed.toSet
    assert(opened.size == 2 && opened.exists(_.startsWith("a0-")) &&
      opened.exists(_.startsWith("a3-")),
      s"wrong files opened for a pushed range: $opened")
    // an orphan of a crashed commit (present on disk, in no manifest)
    // is never served
    val orphanSrc = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("a2-")).head
    java.nio.file.Files.copy(orphanSrc.toPath,
      new java.io.File(dir, "a9-orphan.parquet").toPath)
    assert(spark.read.format("tablelog").load(dir).count() == 400L,
      "an unreferenced file leaked into the snapshot")
  }

  test("the relation pins its manifest at load(); a re-load follows the head") {
    val dir = freshTable()
    TableLog.appendBatch(batch(0), dir, "r", 0L)
    val pinned = spark.read.format("tablelog").load(dir)
    assert(pinned.count() == 100L)
    TableLog.appendBatch(batch(1), dir, "r", 1L)
    assert(pinned.count() == 100L,
      "a resolved relation must be a snapshot, not follow the head")
    assert(spark.read.format("tablelog").load(dir).count() == 200L)
  }

  test("versionAsOf time travel matches readAt, era schema included; beyond retention fails loudly") {
    val dir = freshTable()
    TableLog.appendBatch(batch(0), dir, "r", 0L)
    TableLog.appendBatch(batch(1), dir, "r", 1L)
    val v0 = spark.read.format("tablelog").option("versionAsOf", "0")
      .load(dir)
    assert(v0.select($"ts").as[Long].collect().sorted.toSeq == (0L until 100L))
    // era-correct schema: a later dropColumn does not reshape the past
    TableLog.dropColumn(spark, dir, "v")
    val v1 = spark.read.format("tablelog").option("versionAsOf", "1").load(dir)
    assert(v1.schema.fieldNames.toSeq == Seq("ts", "v"))
    assert(spark.read.format("tablelog").load(dir)
      .schema.fieldNames.toSeq == Seq("ts"))
    val e = intercept[IllegalStateException] {
      spark.read.format("tablelog").option("versionAsOf", "99").load(dir)
    }
    assert(e.getMessage.contains("no retained manifest"), e.getMessage)
  }

  test("SQL sessions consume the lake: CREATE TABLE ... USING tablelog") {
    val dir = freshTable()
    TableLog.appendBatch(batch(0), dir, "r", 0L)
    spark.sql("DROP TABLE IF EXISTS dsv1_sql")
    spark.sql(s"CREATE TABLE dsv1_sql USING tablelog OPTIONS (path '$dir')")
    try {
      assert(spark.sql("SELECT count(*) AS n FROM dsv1_sql")
        .as[Long].head() == 100L)
      assert(spark.sql("SELECT sum(ts) AS s FROM dsv1_sql WHERE ts < 10")
        .as[Long].head() == 45L)
      // the session CACHES the resolved relation: an external commit is
      // invisible until REFRESH TABLE re-runs createRelation (the
      // standard DSv1 external-commit contract, pinned here so the doc
      // cannot drift from reality)
      TableLog.appendBatch(batch(1), dir, "r", 1L)
      assert(spark.sql("SELECT count(*) AS n FROM dsv1_sql")
        .as[Long].head() == 100L,
        "cached relation unexpectedly followed an external commit")
      spark.sql("REFRESH TABLE dsv1_sql")
      assert(spark.sql("SELECT count(*) AS n FROM dsv1_sql")
        .as[Long].head() == 200L,
        "REFRESH TABLE did not re-resolve the snapshot")
    } finally spark.sql("DROP TABLE IF EXISTS dsv1_sql")
  }

  test("batch write: mode(\"append\").save() commits; ErrorIfExists/Ignore/Overwrite honest") {
    val dir = freshTable()
    batch(0).write.format("tablelog").mode("append").save(dir)
    batch(1).write.format("tablelog").mode("append").save(dir)
    assert(TableLog.read(spark, dir).count() == 200L)
    assert(TableLog.latest(spark, dir).get.version == 1L)
    // schema drift lands on appendBatch's loud guard
    val drift = intercept[IllegalArgumentException] {
      batch(2).withColumn("extra", lit(1)).write.format("tablelog")
        .mode("append").save(dir)
    }
    assert(drift.getMessage.contains("schema drift"), drift.getMessage)
    val e = intercept[IllegalStateException] {
      batch(2).write.format("tablelog").mode("errorifexists").save(dir)
    }
    assert(e.getMessage.contains("already"), e.getMessage)
    batch(2).write.format("tablelog").mode("ignore").save(dir) // no-op
    assert(TableLog.read(spark, dir).count() == 200L)
    val o = intercept[UnsupportedOperationException] {
      batch(2).write.format("tablelog").mode("overwrite").save(dir)
    }
    assert(o.getMessage.contains("restore"), o.getMessage)
    // a fresh dir through ErrorIfExists works
    val dir2 = freshTable()
    batch(0).write.format("tablelog").mode("errorifexists").save(dir2)
    assert(TableLog.read(spark, dir2).count() == 100L)
  }

  test("mergeSchema batch save: add-only drift evolves the table; drops and retypes stay loud") {
    val dir = freshTable()
    batch(0).write.format("tablelog").mode("append").save(dir)
    // an added column evolves the schema and commits; pre-evolution
    // rows surface it as null
    batch(1).withColumn("extra", lit(7)).write.format("tablelog")
      .option("mergeSchema", "true").mode("append").save(dir)
    val df = TableLog.read(spark, dir)
    assert(df.schema.fieldNames.toSeq == Seq("ts", "v", "extra"))
    assert(df.count() == 200L)
    assert(df.filter($"extra".isNull).count() == 100L)
    assert(df.filter($"extra" === 7).count() == 100L)
    // a column-ORDER-only difference is aligned, committing nothing new
    val vBefore = TableLog.latest(spark, dir).get.version
    batch(2).withColumn("extra", lit(8)).select($"extra", $"v", $"ts")
      .write.format("tablelog").option("mergeSchema", "true")
      .mode("append").save(dir)
    assert(TableLog.read(spark, dir).count() == 300L)
    assert(TableLog.latest(spark, dir).get.version == vBefore + 1,
      "an order-only merge must not commit an evolve")
    // a batch MISSING a table column is a drop — loud even with the option
    val d = intercept[IllegalArgumentException] {
      batch(3).write.format("tablelog").option("mergeSchema", "true")
        .mode("append").save(dir)
    }
    assert(d.getMessage.contains("missing column"), d.getMessage)
    // a type change is a rewrite — loud even with the option
    val t = intercept[IllegalArgumentException] {
      batch(3).withColumn("extra", lit("not-an-int")).write
        .format("tablelog").option("mergeSchema", "true")
        .mode("append").save(dir)
    }
    assert(t.getMessage.contains("changes type"), t.getMessage)
    // without the option, add-only drift stays the loud default
    val s = intercept[IllegalArgumentException] {
      batch(3).withColumn("extra", lit(7)).withColumn("more", lit(1L))
        .write.format("tablelog").mode("append").save(dir)
    }
    assert(s.getMessage.contains("schema drift"), s.getMessage)
    assert(TableLog.read(spark, dir).count() == 300L,
      "a rejected merge must commit nothing")
  }

  test("mergeSchema streaming sink: a writer restarted with an added column evolves instead of wedging") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = freshTable()
    val ck1 = java.nio.file.Files.createTempDirectory("graft_ms_ck1").toString
    val in1 = MemoryStream[(Long, String)]
    val q1 = in1.toDF().toDF("ts", "v")
      .writeStream.format("tablelog").option("path", dir)
      .option("checkpointLocation", ck1).outputMode("append").start()
    try {
      in1.addData((0L, "a")); q1.processAllAvailable()
    } finally q1.stop()
    // the upgraded writer (new checkpoint = new writer identity) carries
    // an extra column: with mergeSchema the first batch evolves the
    // table and every batch lands
    val ck2 = java.nio.file.Files.createTempDirectory("graft_ms_ck2").toString
    val in2 = MemoryStream[(Long, String, Long)]
    val q2 = in2.toDF().toDF("ts", "v", "n")
      .writeStream.format("tablelog").option("path", dir)
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
  }

  test("streaming sink: writeStream.format(\"tablelog\") commits exactly once across restarts") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = freshTable()
    val ck = java.nio.file.Files.createTempDirectory("graft_dsv1_sink_ck").toString
    val input = MemoryStream[(Long, String)]
    def start() = input.toDF().toDF("ts", "v")
      .writeStream.format("tablelog").option("path", dir)
      .option("checkpointLocation", ck).outputMode("append").start()
    val q1 = start()
    try {
      input.addData((0L, "a"), (1L, "b"))
      q1.processAllAvailable()
      input.addData((2L, "c"))
      q1.processAllAvailable()
      assert(TableLog.read(spark, dir).count() == 3L)
      // the committed appends are ordinary TableLog versions: the
      // version tail and time travel see them
      assert(TableLog.latest(spark, dir).get.version >= 1L)
    } finally q1.stop()
    // restart from the same checkpoint: resumed batchIds never re-commit
    val q2 = start()
    try {
      input.addData((3L, "d"))
      q2.processAllAvailable()
      val got = spark.read.format("tablelog").load(dir)
        .select($"ts").as[Long].collect().sorted.toSeq
      assert(got == Seq(0L, 1L, 2L, 3L),
        s"restart re-committed or lost a batch: $got")
    } finally q2.stop()
    // update mode is not expressible as appends — rejected at start
    val u = intercept[Exception] {
      spark.readStream.format("rate").option("rowsPerSecond", "1").load()
        .groupBy($"value" % 2).count()
        .writeStream.format("tablelog").option("path", freshTable())
        .outputMode("update").start()
    }
    assert(u.getMessage.contains("append-only") ||
      Option(u.getCause).exists(_.getMessage.contains("append-only")),
      s"wrong failure: ${u.getMessage}")
  }

  test("sink → tail composition: a stream written through the sink is consumed exactly once by the version tail") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = freshTable()
    val wCk = java.nio.file.Files.createTempDirectory("graft_pipe_wck").toString
    val rCk = java.nio.file.Files.createTempDirectory("graft_pipe_rck").toString
    val out = java.nio.file.Files.createTempDirectory("graft_pipe_out").toString + "/o"
    val input = MemoryStream[(Long, String)]
    // writer leg: arbitrary stream → committed TableLog versions
    val w = input.toDF().toDF("ts", "v")
      .writeStream.format("tablelog").option("path", dir)
      .option("checkpointLocation", wCk).outputMode("append").start()
    // reader leg: the version tail over the same table, its own
    // checkpoint — a complete lake round trip with no graft Scala API
    // in either leg
    val r = spark.readStream.format("tablelog").option("since", "-1")
      .schema(org.apache.spark.sql.types.StructType.fromDDL(
        "ts LONG, v STRING"))
      .load(dir)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", rCk).outputMode("append").start()
    try {
      input.addData((0L, "a"), (1L, "b"))
      w.processAllAvailable()
      r.processAllAvailable()
      input.addData((2L, "c"))
      w.processAllAvailable()
      r.processAllAvailable()
      val got = spark.read.parquet(out).select($"ts").as[Long]
        .collect().sorted.toSeq
      assert(got == Seq(0L, 1L, 2L),
        s"sink→tail round trip lost or duplicated rows: $got")
    } finally { w.stop(); r.stop() }
  }

  test("sinceTimestamp starts the tail from the travel timeline; both start options together are loud") {
    val dir = freshTable()
    (0 to 2).foreach(b => TableLog.appendBatch(batch(b), dir, "r", b.toLong))
    // pin the commit instants (same setTimes technique as the travel specs)
    val log = new org.apache.hadoop.fs.Path(dir + "/_graft_log")
    val hfs = log.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val base = 1700000000000L
    (0 to 2).foreach { v =>
      hfs.setTimes(new org.apache.hadoop.fs.Path(log, f"manifest-$v%020d"),
        base + v * 60000L, -1L)
    }
    // "from v1's instant" resolves to since=1 -> versions AFTER 1 only
    val q = spark.readStream.format("tablelog")
      .option("sinceTimestamp", (base + 60000L).toString)
      .load(dir)
      .writeStream.format("memory").queryName("ts_tail")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("ts_tail").select($"ts").as[Long]
        .collect().sorted.toSeq
      assert(got == (200L until 300L).toSeq,
        s"sinceTimestamp at v1's instant must deliver exactly v2: $got")
    } finally q.stop()
    val e = intercept[Exception] {
      spark.readStream.format("tablelog")
        .option("since", "-1").option("sinceTimestamp", base.toString)
        .load(dir)
        .writeStream.format("noop").start().processAllAvailable()
    }
    assert(e.getMessage != null &&
      (e.getMessage.contains("mutually exclusive") ||
        Option(e.getCause).exists(_.getMessage.contains("mutually exclusive"))),
      s"${e.getMessage} / ${Option(e.getCause).map(_.getMessage)}")
    // an instant AFTER the newest commit is "from now on", not the
    // snapshot faces' reproducibility error: live appends only
    val q2 = spark.readStream.format("tablelog")
      .option("sinceTimestamp", "9999-01-01T00:00:00Z")
      .load(dir)
      .writeStream.format("memory").queryName("ts_tail_now")
      .outputMode("append").start()
    try {
      q2.processAllAvailable()
      assert(spark.table("ts_tail_now").isEmpty, "nothing before the start")
      TableLog.appendBatch(batch(3), dir, "r", 3L)
      q2.processAllAvailable()
      val live = spark.table("ts_tail_now").select($"ts").as[Long]
        .collect().sorted.toSeq
      assert(live == (300L until 400L).toSeq,
        s"'from now' must deliver exactly the live appends: $live")
    } finally q2.stop()
  }

  test("the same short name streams: readStream.format(\"tablelog\") is the version tail") {
    val dir = freshTable()
    TableLog.appendBatch(batch(0), dir, "r", 0L)
    val q = spark.readStream.format("tablelog").option("since", "-1")
      .load(dir)
      .writeStream.format("memory").queryName("dsv1_tail")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("dsv1_tail").count() == 100L)
      TableLog.appendBatch(batch(1), dir, "r", 1L)
      q.processAllAvailable()
      assert(spark.table("dsv1_tail").count() == 200L)
    } finally q.stop()
  }
}
