package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** [[TableLog.trackBloom]]: per-file parquet bloom filters for point
  * lookups on UNclustered columns — the pruning shape footer min/max
  * cannot serve. The registration must survive every manifest rebuild,
  * reach every write surface's staged files, and the written bloom
  * must be the thing that skips a row group (asserted with parquet-mr
  * directly, every other filter level disabled). */
class TableLogBloomSpec extends SparkSuite {
  import spark.implicits._

  private def freshTable(): String =
    java.nio.file.Files.createTempDirectory("graft_bloom").toString + "/t"

  /** ids `lo until hi` by 2 (even only — an absent ODD probe key then
    * sits INSIDE every file's [min,max], so footer stats can never be
    * the thing that dismisses it). */
  private def evens(lo: Long, hi: Long) =
    (lo until hi by 2).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1)

  private def dataFiles(dir: String): Seq[org.apache.hadoop.fs.Path] =
    TableLog.latest(spark, dir).get.files
      .map(e => new org.apache.hadoop.fs.Path(s"$dir/${e.name}"))

  private def footer(p: org.apache.hadoop.fs.Path) = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      p, spark.sparkContext.hadoopConfiguration)
    org.apache.parquet.hadoop.ParquetFileReader.readFooter(
      in, org.apache.parquet.format.converter.ParquetMetadataConverter.NO_FILTER)
  }

  private def hasBloom(p: org.apache.hadoop.fs.Path, col: String): Boolean =
    footer(p).getBlocks.asScala.forall(b =>
      b.getColumns.asScala.exists(c =>
        c.getPath.toDotString == col && c.getBloomFilterOffset >= 0))

  private implicit class JavaListOps[A](l: java.util.List[A]) {
    def asScala: Seq[A] = {
      val b = Seq.newBuilder[A]
      l.forEach(a => b += a)
      b.result()
    }
  }

  /** Rows surviving parquet-mr row-group filtering for `id == key`,
    * with ONLY the bloom level enabled (stats, dictionary and column
    * index off) — isolates which mechanism did the skipping. */
  private def bloomFilteredRows(p: org.apache.hadoop.fs.Path, key: Long,
      useBloom: Boolean): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    val filter = org.apache.parquet.filter2.compat.FilterCompat.get(
      org.apache.parquet.filter2.predicate.FilterApi.eq(
        org.apache.parquet.filter2.predicate.FilterApi.longColumn("id"),
        java.lang.Long.valueOf(key)))
    val opts = org.apache.parquet.HadoopReadOptions.builder(conf)
      .useStatsFilter(false).useDictionaryFilter(false)
      .useColumnIndexFilter(false).useBloomFilter(useBloom)
      .withRecordFilter(filter).build()
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, conf)
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in, opts)
    try r.getFilteredRecordCount finally r.close()
  }

  test("trackBloom: registration commits, survives every rebuild, reaches every write surface's files, and the bloom alone skips the row group") {
    val dir = freshTable()
    // v0: committed BEFORE any registration — no bloom in its footer
    assert(TableLog.appendBatch(evens(0, 2000), dir, "w", 0L))
    val preFile = dataFiles(dir).head
    assert(!hasBloom(preFile, "id"), "pre-registration files carry no bloom")

    // register; manifest round-trips through the v5 header
    val m = TableLog.trackBloom(spark, dir, Seq("id"))
    assert(m.op == "trackbloom" && m.bloomFor == Seq("id"))
    assert(TableLog.latest(spark, dir).get.bloomFor == Seq("id"))
    // idempotent re-registration commits nothing
    assert(TableLog.trackBloom(spark, dir, Seq("id")).version == m.version)

    // v1-path append after registration: the staged file has the bloom
    assert(TableLog.appendBatch(evens(2000, 4000), dir, "w", 1L))
    val appended = dataFiles(dir).filterNot(_ == preFile)
    assert(appended.nonEmpty && appended.forall(hasBloom(_, "id")))

    // the bloom ALONE dismisses an absent key that sits inside the
    // file's [min,max] (odd key; stats/dictionary/column-index levels
    // disabled in the probe) — and finds a present key
    val f = appended.head
    assert(bloomFilteredRows(f, key = 2001L, useBloom = true) == 0L,
      "bloom must skip the row group for an absent key")
    assert(bloomFilteredRows(f, key = 2001L, useBloom = false) > 0L,
      "without the bloom level nothing else may dismiss it (else the " +
        "assertion above proves nothing)")
    assert(bloomFilteredRows(f, key = 2002L, useBloom = true) > 0L,
      "a present key must survive the bloom")

    // DSv2 batch write path: staged through ParquetFileFormat's
    // prepareWrite + the explicit conf copy — bloom present too
    evens(4000, 6000).write.format("tablelogv2").mode("append").save(dir)
    val v2Files = dataFiles(dir).filterNot(p => p == preFile || appended.contains(p))
    assert(v2Files.nonEmpty && v2Files.forall(hasBloom(_, "id")))

    // compact rewrites the PRE-registration file: now every live file
    // has the bloom; the registration survived the compact commit
    TableLog.compact(spark, dir, targetBytes = 1L << 30)
    assert(TableLog.latest(spark, dir).get.bloomFor == Seq("id"))
    assert(dataFiles(dir).forall(hasBloom(_, "id")))

    // delete + restore keep the registration (manifest rebuild sites)
    TableLog.deleteIn(spark, dir, "id", Seq(2002L))
    assert(TableLog.latest(spark, dir).get.bloomFor == Seq("id"))
    assert(dataFiles(dir).forall(hasBloom(_, "id")),
      "the delete's survivor rewrite must re-write the bloom")
    val rv = TableLog.latest(spark, dir).get.version
    TableLog.restore(spark, dir, rv - 1)
    assert(TableLog.latest(spark, dir).get.bloomFor == Seq("id"))

    // reads are unaffected semantically: the absent-key probe is
    // Spark-correct and the deleted/restored row is back
    assert(TableLog.read(spark, dir).where($"id" === 2001L).count() == 0L)
    assert(TableLog.read(spark, dir).where($"id" === 2002L).count() == 1L)
  }

  test("trackBloom rejections are loud: unknown column, bloomless type, INT96 timestamp; dropColumn clears the registration") {
    val dir = freshTable()
    Seq((1L, true, new java.sql.Timestamp(1L)))
      .toDF("id", "flag", "ts").write.format("tablelogv2")
      .mode("append").save(dir)
    val e1 = intercept[IllegalArgumentException] {
      TableLog.trackBloom(spark, dir, Seq("nope"))
    }
    assert(e1.getMessage.contains("not in the table schema"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      TableLog.trackBloom(spark, dir, Seq("flag"))
    }
    assert(e2.getMessage.contains("no parquet bloom encoding"), e2.getMessage)
    // an INT96-writing session would put a bloom in the footer that no
    // pushed predicate ever consults — same loud posture as trackStats
    val key = "spark.sql.parquet.outputTimestampType"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key, "INT96")
    try {
      val e3 = intercept[IllegalArgumentException] {
        TableLog.trackBloom(spark, dir, Seq("ts"))
      }
      assert(e3.getMessage.contains("INT96"), e3.getMessage)
    } finally saved.fold(spark.conf.unset(key))(spark.conf.set(key, _))
    // names resolve like every other column-addressing face: the
    // session default is case-insensitive, and the CANONICAL spelling
    // is what lands in the manifest (= what the parquet write option
    // must name)
    TableLog.trackBloom(spark, dir, Seq("ID"))
    assert(TableLog.latest(spark, dir).get.bloomFor == Seq("id"))
    TableLog.dropColumn(spark, dir, "id")
    assert(TableLog.latest(spark, dir).get.bloomFor.isEmpty,
      "a dropped column must leave the bloom registration")
  }
}
