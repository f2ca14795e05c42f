package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Plain `TableLog.read(dir).filter(...)` prunes files through the
  * manifest stats for ANY pushable predicate — the FileIndex face of
  * the commit log (r11 verdict Missing #2). readWhere stays as sugar;
  * these specs pin that the general path subsumes it without it. */
class ManifestFileIndexSpec extends SparkSuite {
  import spark.implicits._

  private def freshTable(): String =
    java.nio.file.Files.createTempDirectory("graft_mfi").toString + "/t"

  /** A table clustered by `id` (layout stats) with `ts` tracked too —
    * the two-column pruning fixture. 4000 rows, id 0..3999, ts = id*10,
    * compacted into ~8 range-clustered files. */
  private def clusteredTable(): (String, TableLog.Manifest) = {
    val dir = freshTable()
    val df = Seq.tabulate(4000)(i => (i.toLong, i * 10L, s"v$i")).toDF("id", "ts", "v")
    assert(TableLog.appendBatch(df, dir, "seed", 0L))
    TableLog.trackStats(spark, dir, Seq("ts"))
    val bytes = TableLog.bytes(spark, dir)
    TableLog.compact(spark, dir, targetBytes = math.max(1L, bytes / 8),
      layoutBy = Seq("id"))
    val m = TableLog.latest(spark, dir).get
    assert(m.files.length >= 6, s"fixture vacuity: ${m.files.length} files")
    assert(m.files.forall(e => e.stats.contains("id") && e.stats.contains("ts")),
      "fixture vacuity: files lack recorded stats")
    (dir, m)
  }

  test("a multi-column conjunction prunes to exactly the stats-intersecting files") {
    val (dir, m) = clusteredTable()
    val df = TableLog.read(spark, dir)
      .filter($"id" >= 1000L && $"id" <= 1099L && $"ts" < 10500L)
    val rows = df.select($"id").as[Long].collect().sorted.toSeq
    assert(rows == (1000L to 1049L), s"wrong rows: ${rows.take(5)}…")
    val listed = ManifestFileIndex.lastListed.toSet
    // the scan's actual file list equals the manifest-level intersection
    // of the two single-column prunes — and is a strict subset
    val expected = TableLog.prunedFiles(spark, dir, "id", 1000L, 1099L).toSet
      .intersect(TableLog.prunedFiles(spark, dir, "ts", Long.MinValue, 10499L).toSet)
    assert(listed == expected, s"scan listed $listed, stats say $expected")
    assert(listed.size < m.files.length,
      s"no pruning: ${listed.size} of ${m.files.length}")
  }

  test("flipped literals, IN lists and OR unions prune; disjoint OR arms union their files") {
    val (dir, m) = clusteredTable()
    // literal-first comparison shape
    TableLog.read(spark, dir).filter(lit(100L) > $"id").count()
    val flipped = ManifestFileIndex.lastListed.toSet
    assert(flipped == TableLog.prunedFiles(spark, dir, "id", Long.MinValue, 99L).toSet)
    // IN list: two points far apart — only their two files' ranges
    TableLog.read(spark, dir).filter($"id".isin(5L, 3995L)).count()
    val inListed = ManifestFileIndex.lastListed.toSet
    val inExpected = TableLog.prunedFiles(spark, dir, "id", 5L, 5L).toSet ++
      TableLog.prunedFiles(spark, dir, "id", 3995L, 3995L).toSet
    assert(inListed == inExpected && inListed.size < m.files.length)
    // OR of two disjoint ranges = union of the arms' files
    TableLog.read(spark, dir)
      .filter(($"id" between (0L, 49L)) || ($"id" between (3900L, 3949L))).count()
    val orListed = ManifestFileIndex.lastListed.toSet
    val orExpected = TableLog.prunedFiles(spark, dir, "id", 0L, 49L).toSet ++
      TableLog.prunedFiles(spark, dir, "id", 3900L, 3949L).toSet
    assert(orListed == orExpected && orListed.size < m.files.length)
  }

  test("unpushable or unprunable predicates read every file — no false pruning") {
    val (dir, m) = clusteredTable()
    val all = m.files.map(_.name).toSet
    // a function of a column: no attr-vs-literal shape to prune on
    assert(TableLog.read(spark, dir).filter(length($"v") >= 2).count() == 4000L)
    assert(ManifestFileIndex.lastListed.toSet == all, "false pruning on length()")
    // a raw NOT that survives Catalyst normalization (Not(EqualTo) has
    // no comparison rewrite): conservative keep-all, never an inverted
    // prune. (NOT over a RANGE is rewritten by Catalyst into an OR of
    // half-ranges and prunes through the Or arm — that path is covered
    // by the OR test above.)
    assert(TableLog.read(spark, dir).filter(!($"id" === 5L)).count() == 3999L)
    assert(ManifestFileIndex.lastListed.toSet == all, "false pruning on NOT")
  }

  test("a NARROWING cast is opaque to pruning — wrapped matches are never lost") {
    val dir = freshTable()
    // two id clusters: one low, one past 2^32 so an int cast wraps
    TableLog.appendBatch(
      Seq.tabulate(10)(i => (i.toLong, s"lo$i")).toDF("id", "v"), dir, "r", 0L)
    TableLog.appendBatch(
      Seq.tabulate(10)(i => ((1L << 32) + i, s"hi$i")).toDF("id", "v"), dir, "r", 1L)
    TableLog.compact(spark, dir, targetBytes = 1L << 10, layoutBy = Seq("id"))
    val files = TableLog.latest(spark, dir).get.files.size
    assert(files >= 2, "fixture vacuity: one file cannot test pruning")
    // id = 2^32 + 5 satisfies cast(id as int) = 5 by wrap-around under
    // legacy cast semantics, but the high file's recorded [2^32, 2^32+9]
    // bounds exclude the literal 5 — looking through the narrowing cast
    // would prune that file and silently drop the matching row. (Under
    // ANSI casts the same pruning is still wrong differently: it
    // suppresses the overflow ERROR the query is required to raise.)
    val ansi = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val got = TableLog.read(spark, dir)
        .filter(col("id").cast("int") === 5)
        .select("id").as[Long].collect().sorted.toSeq
      assert(got == Seq(5L, (1L << 32) + 5L),
        s"narrowing cast lost the wrapped match: $got")
      assert(ManifestFileIndex.lastListed.size == files,
        "a narrowing cast must be opaque: no file may be pruned through it")
    } finally spark.conf.set("spark.sql.ansi.enabled", ansi)
  }

  test("NULL-heavy columns never false-prune; IsNull reads conservatively") {
    val dir = freshTable()
    // file A: x entirely NULL (footer records no usable stats for it);
    // file B: x in [100, 199]
    val a = Seq.tabulate(50)(i => (i.toLong, None: Option[Long])).toDF("id", "x")
    val b = Seq.tabulate(100)(i => (1000L + i, Some(100L + i): Option[Long])).toDF("id", "x")
    assert(TableLog.appendBatch(a.coalesce(1), dir, "r", 0L))
    TableLog.trackStats(spark, dir, Seq("x"))
    assert(TableLog.appendBatch(b.coalesce(1), dir, "r", 1L))
    val m = TableLog.latest(spark, dir).get
    assert(m.files.length == 2)
    // stats-less file A must survive ANY x-predicate: a range that
    // excludes B's span still opens A (and correctly returns 0 rows)
    assert(TableLog.read(spark, dir).filter($"x" > 10000L).count() == 0L)
    val aName = m.files.find(!_.stats.contains("x")).map(_.name)
    assert(aName.nonEmpty, "fixture vacuity: the all-null file recorded x stats")
    assert(ManifestFileIndex.lastListed.contains(aName.get),
      "stats-less (all-NULL) file was false-pruned")
    // IsNull cannot prune on min/max at all
    assert(TableLog.read(spark, dir).filter($"x".isNull).count() == 50L)
    assert(ManifestFileIndex.lastListed.toSet == m.files.map(_.name).toSet)
  }

  test("string bounds prune in UTF-8 order; readWhere and the general path agree") {
    val dir = freshTable()
    val df = Seq.tabulate(2000)(i => (i.toLong, f"k$i%04d")).toDF("id", "k")
    assert(TableLog.appendBatch(df, dir, "seed", 0L))
    TableLog.compact(spark, dir,
      targetBytes = math.max(1L, TableLog.bytes(spark, dir) / 6),
      layoutBy = Seq("k"))
    val m = TableLog.latest(spark, dir).get
    assert(m.files.length >= 4, s"fixture vacuity: ${m.files.length}")
    val viaFilter = TableLog.read(spark, dir)
      .filter($"k" >= "k0100" && $"k" <= "k0199")
      .select($"id").as[Long].collect().sorted.toSeq
    val listed = ManifestFileIndex.lastListed.toSet
    assert(viaFilter == (100L to 199L))
    assert(listed.size < m.files.length, "no string pruning")
    val viaWhere = TableLog.readWhere(spark, dir, "k", "k0100", "k0199")
      .select($"id").as[Long].collect().sorted.toSeq
    assert(viaWhere == viaFilter)
  }

  test("startsWith prunes on string bounds; negation and stat-less columns stay conservative") {
    val dir = freshTable()
    val df = Seq.tabulate(2000)(i => (i.toLong, f"k$i%04d")).toDF("id", "k")
    assert(TableLog.appendBatch(df, dir, "seed", 0L))
    TableLog.compact(spark, dir,
      targetBytes = math.max(1L, TableLog.bytes(spark, dir) / 6),
      layoutBy = Seq("k"))
    val m = TableLog.latest(spark, dir).get
    assert(m.files.length >= 4, s"fixture vacuity: ${m.files.length}")
    val rows = TableLog.read(spark, dir).filter($"k".startsWith("k01"))
      .select($"id").as[Long].collect().sorted.toSeq
    assert(rows == (100L to 199L), s"wrong rows: ${rows.take(5)}…")
    val listed = ManifestFileIndex.lastListed.toSet
    // the prefix's value range is exactly ["k01", "k02"): the same files
    // a bounds query for that range keeps
    val expected = TableLog.prunedFiles(spark, dir, "k", "k01", "k01￿").toSet
    assert(listed == expected && listed.size < m.files.length,
      s"scan listed $listed, stats say $expected of ${m.files.length}")
    // NOT startsWith cannot prune (conservative)
    TableLog.read(spark, dir).filter(!$"k".startsWith("k01")).count()
    assert(ManifestFileIndex.lastListed.size == m.files.length,
      "a negated prefix must keep every file")
  }

  test("TIMESTAMP/DATE stats harvest natively — time-ranged filters prune files, no epoch-micros cast") {
    val dir = freshTable()
    val base = java.time.Instant.parse("2026-01-01T00:00:00Z")
      .getEpochSecond * 1000000L
    // one file per hourly ingest batch — the canonical ingest-time
    // clustering trackStats exists for (write order IS the clustering)
    def batch(b: Int) = spark.range(100).select(
      timestamp_micros(lit(base + b * 3600L * 1000000L) + $"id" * 1000000L)
        .as("ts"),
      (timestamp_micros(lit(base + b * 3600L * 1000000L) + $"id" * 1000000L))
        .cast("timestamp_ntz").as("tsn"),
      date_add(lit(java.sql.Date.valueOf("2026-01-01")), lit(b * 10)).as("d"),
      $"id".as("n")).coalesce(1)
    // stats need INT64 timestamps (INT96, the session default kept for
    // oracle parity, records no statistics — trackStats' guard pins that)
    val key = "spark.sql.parquet.outputTimestampType"
    val saved = spark.conf.get(key)
    spark.conf.set(key, "TIMESTAMP_MICROS")
    try {
      TableLog.appendBatch(batch(0), dir, "r", 0L)
      TableLog.trackStats(spark, dir, Seq("ts", "tsn", "d"))
      (1 to 3).foreach(b => TableLog.appendBatch(batch(b), dir, "r", b.toLong))
    } finally spark.conf.set(key, saved)
    val m = TableLog.latest(spark, dir).get
    assert(m.files.count(_.stats.contains("ts")) == 3,
      s"fixture vacuity: timestamp stats not harvested: ${m.files.map(_.stats.keySet)}")
    // a plain time-ranged filter (typed literal, no manual micros cast)
    // opens only hour 2's file plus the conservatively-kept stat-less
    // boot file
    val got = TableLog.read(spark, dir)
      .filter($"ts".between(
        lit("2026-01-01 02:00:30").cast("timestamp"),
        lit("2026-01-01 02:01:09").cast("timestamp")))
      .count()
    assert(got == 40L, s"wrong rows: $got")
    val opened = ManifestFileIndex.lastListed.toSet
    assert(opened.size == 2 && opened.exists(_.startsWith("a0-")) &&
      opened.exists(_.startsWith("a3-")),
      s"time range opened the wrong files: $opened")
    // NTZ columns prune too (isAdjustedToUTC=false annotation honored)
    TableLog.read(spark, dir)
      .filter($"tsn" >= lit("2026-01-01 03:00:00").cast("timestamp_ntz"))
      .count()
    assert(ManifestFileIndex.lastListed.toSet
      .count(_.startsWith("a4-")) == 1 &&
      ManifestFileIndex.lastListed.size == 2,
      s"NTZ range opened the wrong files: ${ManifestFileIndex.lastListed}")
    // DATE equality: one ingest day (batch 1 → version 2), one file
    // plus the stat-less boot file
    TableLog.read(spark, dir)
      .filter($"d" === lit(java.sql.Date.valueOf("2026-01-11"))).count()
    val dateOpened = ManifestFileIndex.lastListed.toSet
    assert(dateOpened.size == 2 && dateOpened.exists(_.startsWith("a0-")) &&
      dateOpened.exists(_.startsWith("a2-")),
      s"date filter opened the wrong files: $dateOpened")
    // readWhere takes typed temporal bounds directly (Timestamp built
    // from an Instant so the fixture is timezone-independent)
    val viaWhere = TableLog.readWhere(spark, dir, "ts",
      java.sql.Timestamp.from(java.time.Instant.parse("2026-01-01T02:00:30Z")),
      java.time.Instant.parse("2026-01-01T02:01:09Z")).count()
    assert(viaWhere == 40L, s"readWhere with temporal bounds: $viaWhere")
    // the full ingest-time clustering path: compact layoutBy the
    // TIMESTAMP itself — range re-layout + per-file stats harvested for
    // the rewritten c-files, so time-ranged filters prune post-compact
    // too (the rewrite must also run under an INT64 output type)
    spark.conf.set(key, "TIMESTAMP_MICROS")
    try TableLog.compact(spark, dir,
      targetBytes = math.max(1L, TableLog.bytes(spark, dir) / 4),
      layoutBy = Seq("ts"))
    finally spark.conf.set(key, saved)
    val mc = TableLog.latest(spark, dir).get
    assert(mc.files.length >= 3 && mc.files.forall(_.stats.contains("ts")),
      s"compact did not harvest timestamp layout stats: ${mc.files.length}")
    val post = TableLog.read(spark, dir)
      .filter($"ts" >= lit("2026-01-01 03:00:00").cast("timestamp")).count()
    assert(post == 100L)
    assert(ManifestFileIndex.lastListed.size < mc.files.length,
      s"post-compact time filter opened every file: " +
        s"${ManifestFileIndex.lastListed.size} of ${mc.files.length}")
  }

  test("prefixIntersects: the truncated-bound edges never false-prune") {
    import ParquetFooters.prefixIntersects
    // bounds EQUAL the prefix: "ab" itself starts with "ab" — keep
    assert(prefixIntersects("ab", "ab", "ab"))
    // prefix LONGER than the equal bounds: the only value is "ab",
    // which cannot start with "abc" — sound prune
    assert(!prefixIntersects("ab", "ab", "abc"))
    // min shorter than the prefix but below it — range straddles
    assert(prefixIntersects("a", "az", "ab"))
    // min's truncation equals the prefix (min itself is a match) — keep
    assert(prefixIntersects("abz", "ac", "ab"))
    // max equals the prefix exactly — max itself is a match
    assert(prefixIntersects("aa", "ab", "ab"))
    // whole range above the prefix's block
    assert(!prefixIntersects("b", "c", "ab"))
    // whole range below the prefix
    assert(!prefixIntersects("aa", "aaz", "ab"))
    // multi-byte UTF-8: BYTE order, not UTF-16 order — U+FFFF sorts
    // BELOW a supplementary character in UTF-8 bytes (EF.. < F0..), so a
    // [U+FFFF, U+FFFF] range prunes for an emoji prefix even though
    // UTF-16 comparison would order them the other way around
    assert(prefixIntersects("😀", "🙏", "😀"))
    assert(!prefixIntersects("￿", "￿", "😀"))
  }
}
