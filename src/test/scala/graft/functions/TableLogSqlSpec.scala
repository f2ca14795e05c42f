package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The SQL faces of the TableLog maintenance operators
  * ([[TableLogSql]], injected by [[GraftExtensions]]): a PURE-SQL
  * session must be able to run a takedown, a rollback and a vacuum
  * with CDC/ledger semantics identical to the Scala calls — the last
  * surface that was Scala-API-only. */
class TableLogSqlSpec extends SparkSuite {
  import spark.implicits._

  private def fresh(): String =
    java.nio.file.Files.createTempDirectory("graft_sql").toString + "/t"

  private def rows(ids: Range, tag: String): DataFrame =
    ids.map(i => (i.toLong, tag)).toDF("id", "v").coalesce(1)

  /** Run `body` with a session built THROUGH the extensions entry point
    * — the production wiring (`spark.sql.extensions=graft.functions
    * .GraftExtensions` on a real cluster; `withExtensions` here because
    * that conf is STATIC and the suite's SparkContext already exists) —
    * restoring the suite session after. */
  private def withSqlSession[A](body: SparkSession => A): A = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .withExtensions(new GraftExtensions()(_))
      .getOrCreate()
    try body(s)
    finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }

  test("takedown + restore + vacuum from pure SQL; CDC and ledger identical to the Scala calls") {
    val dir = fresh()
    TableLog.appendBatch(rows(0 until 100, "b0"), dir, "r", 0L) // v0
    TableLog.appendBatch(rows(100 until 200, "b1"), dir, "r", 1L) // v1
    withSqlSession { s =>
      // takedown-list shape: routed to deleteIn (per-value pruning)
      val del = s.sql(s"GRAFT DELETE FROM '$dir' WHERE id IN (7, 8, 150)")
      assert(del.schema.fieldNames.toSeq == Seq("deleted_rows"))
      assert(del.head().getLong(0) == 3L)
      assert(TableLog.rows(s, dir) == 197L)
      assert(TableLog.latest(s, dir).get.op == "delete")
      // the delete is CDC-visible exactly like the Scala call
      val (feed, v) = TableLog.readChanges(s, dir, 1L)
      assert(v == 2L)
      val dels = feed.get.filter(col("_change_type") === "delete")
        .select("id").collect().map(_.getLong(0)).sorted.toSeq
      assert(dels == Seq(7L, 8L, 150L))
      // rollback from SQL
      val res = s.sql(s"GRAFT RESTORE '$dir' TO VERSION 1")
      assert(res.schema.fieldNames.toSeq ==
        Seq("restored_to_version", "committed_version", "rows"))
      val r = res.head()
      assert(r.getLong(0) == 1L && r.getLong(1) == 3L && r.getLong(2) == 200L)
      assert(TableLog.rows(s, dir) == 200L)
      assert(TableLog.read(s, dir).filter(col("id") === 7L).count() == 1L,
        "the restore must resurrect the taken-down rows")
      // vacuum from SQL (aggressive grace so the delete's rewrites sweep)
      val vac = s.sql(s"GRAFT VACUUM '$dir' RETAIN 0 MILLISECONDS")
      assert(vac.head().getInt(0) >= 0)
      assert(TableLog.rows(s, dir) == 200L, "vacuum must not touch live rows")
      // and the session still parses plain Spark SQL
      assert(s.sql("SELECT 1 + 1").head().getInt(0) == 2)
    }
  }

  test("predicate routing: point, range and general predicates all delete the same rows as the Scala faces") {
    withSqlSession { s =>
      def mk(): String = {
        val d = fresh()
        TableLog.appendBatch(rows(0 until 100, "x"), d, "r", 0L)
        d
      }
      val d1 = mk() // col = lit -> deleteIn
      assert(s.sql(s"GRAFT DELETE FROM '$d1' WHERE id = 5").head().getLong(0) == 1L)
      val d2 = mk() // BETWEEN -> deleteRange
      assert(s.sql(s"GRAFT DELETE FROM '$d2' WHERE id BETWEEN 10 AND 19")
        .head().getLong(0) == 10L)
      val d3 = mk() // general predicate -> delete(Column)
      assert(s.sql(s"GRAFT DELETE FROM '$d3' WHERE id % 10 = 0 AND v = 'x'")
        .head().getLong(0) == 10L)
      val d4 = mk() // string literal through the IN route
      TableLog.appendBatch(rows(100 until 110, "y"), d4, "r", 1L)
      assert(s.sql(s"GRAFT DELETE FROM '$d4' WHERE v IN ('y')")
        .head().getLong(0) == 10L)
      assert(TableLog.rows(s, d4) == 100L)
    }
  }

  test("GRAFT UPSERT == Scala upsertByKey: rows, CDC update images and ledger shape identical") {
    val sqlDir = fresh()
    val scalaDir = fresh()
    // identical starting tables
    Seq(sqlDir, scalaDir).foreach { d =>
      TableLog.appendBatch(rows(0 until 100, "b0"), d, "r", 0L)
    }
    withSqlSession { s =>
      // replace keys 5..9 and insert 100..104, via a VALUES-shaped query
      val tuples = ((5 until 10) ++ (100 until 105))
        .map(i => s"($i, 'up')").mkString(", ")
      val res = s.sql(s"GRAFT UPSERT INTO '$sqlDir' KEY (id) " +
        s"SELECT CAST(id AS BIGINT) AS id, v FROM (VALUES $tuples) AS t(id, v)")
      assert(res.schema.fieldNames.toSeq == Seq("committed", "upserted_rows"))
      val r = res.head()
      assert(r.getBoolean(0) && r.getLong(1) == 10L)
      // the Scala face on the twin table
      val batch = ((5 until 10) ++ (100 until 105))
        .map(i => (i.toLong, "up")).toDF("id", "v")
      assert(TableLog.upsertByKey(s, scalaDir, batch, "id", "w", 0L))
      // rows identical
      def canon(d: String): Set[Seq[Any]] =
        TableLog.read(s, d).collect().map(_.toSeq.toVector.toSeq).toSet
      assert(canon(sqlDir) == canon(scalaDir))
      assert(TableLog.rows(s, sqlDir) == 105L)
      // ledger shape: the SQL face commits an upsert op like the Scala one
      assert(TableLog.latest(s, sqlDir).get.op ==
        TableLog.latest(s, scalaDir).get.op)
      // CDC with update images: both faces pair the 5 replaced keys and
      // tag the 5 fresh keys as plain appends
      def images(d: String): Map[String, Long] =
        TableLog.readChangesWithUpdates(s, d, 0L, keyColumn = "id")._1.get
          .groupBy(col("_change_type")).count()
          .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
      val (si, oi) = (images(sqlDir), images(scalaDir))
      assert(si == oi, s"SQL face CDC $si != Scala face CDC $oi")
      assert(si == Map("update_preimage" -> 5L, "update_postimage" -> 5L,
        "append" -> 5L), s"got $si")
      // a missing key column is loud, and commits nothing
      val e = intercept[IllegalArgumentException] {
        s.sql(s"GRAFT UPSERT INTO '$sqlDir' KEY (nope) SELECT 1 AS id")
          .collect()
      }
      assert(e.getMessage.contains("nope"), e.getMessage)
      assert(TableLog.rows(s, sqlDir) == 105L)
      // a side-effecting statement as the query tail is rejected at
      // PARSE time — it must not execute before validation fails
      val side = fresh()
      TableLog.appendBatch(rows(0 until 5, "s"), side, "r", 0L)
      val e2 = intercept[IllegalArgumentException] {
        s.sql(s"GRAFT UPSERT INTO '$sqlDir' KEY (id) " +
          s"GRAFT DELETE FROM '$side' WHERE id = 1").collect()
      }
      assert(e2.getMessage.contains("must be a query"), e2.getMessage)
      assert(TableLog.rows(s, side) == 5L,
        "the side-effecting tail must not have executed")
      assert(TableLog.rows(s, sqlDir) == 105L)
    }
  }

  test("GRAFT statements accept catalog identifiers: delete, upsert, restore, vacuum by name") {
    withSqlSession { s =>
      val warehouse = java.nio.file.Files.createTempDirectory("graft_sqlcat")
      s.conf.set("spark.sql.catalog.sqlcat",
        classOf[graft.sources.GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.sqlcat.warehouse", warehouse.toString)
      s.sql("CREATE TABLE sqlcat.ops.t (id BIGINT, v STRING) USING tablelogv2")
      s.sql("INSERT INTO sqlcat.ops.t SELECT id, CONCAT('r', id) FROM RANGE(100)")
      // maintenance by NAME — same commands, identifier target
      assert(s.sql("GRAFT DELETE FROM sqlcat.ops.t WHERE id IN (3, 4)")
        .head().getLong(0) == 2L)
      assert(s.sql("SELECT count(*) FROM sqlcat.ops.t").head().getLong(0) == 98L)
      val up = s.sql("GRAFT UPSERT INTO sqlcat.ops.t KEY (id) " +
        "SELECT id, 'up' AS v FROM RANGE(5)").head()
      assert(up.getBoolean(0) && up.getLong(1) == 5L)
      assert(s.sql("SELECT count(*) FROM sqlcat.ops.t WHERE v = 'up'")
        .head().getLong(0) == 5L)
      // restore to the post-insert version (CREATE = v0, INSERT = v1)
      s.sql("GRAFT RESTORE sqlcat.ops.t TO VERSION 1")
      assert(s.sql("SELECT count(*) FROM sqlcat.ops.t").head().getLong(0) == 100L)
      assert(s.sql("GRAFT VACUUM sqlcat.ops.t RETAIN 0 MILLISECONDS")
        .head().getInt(0) >= 0)
      assert(s.sql("SELECT count(*) FROM sqlcat.ops.t").head().getLong(0) == 100L)
      // an identifier that resolves to a non-graft catalog is loud
      val e = intercept[IllegalArgumentException] {
        s.sql("GRAFT VACUUM spark_catalog.default.nope").collect()
      }
      assert(e.getMessage.contains("graft catalog"), e.getMessage)
      // an unknown table under the graft catalog is loud too
      intercept[Exception] { s.sql("GRAFT VACUUM sqlcat.ops.ghost").collect() }
      s.sql("DROP TABLE sqlcat.ops.t")
    }
  }

  test("GRAFT COMPACT == Scala compact; GRAFT ZORDER records layout; ledger and rows untouched") {
    withSqlSession { s =>
      import s.implicits._
      // two identical small-file tables: SQL compacts one, Scala the other
      val (sqlDir, scalaDir) = (fresh(), fresh())
      Seq(sqlDir, scalaDir).foreach { d =>
        (0 until 6).foreach { b =>
          TableLog.appendBatch(rows(b * 100 until (b + 1) * 100, s"b$b"), d, "w", b.toLong)
        }
      }
      val nSql = s.sql(s"GRAFT COMPACT '$sqlDir'").head().getInt(0)
      val nScala = TableLog.compact(s, scalaDir,
        TableLogSql.DefaultSqlCompactTargetBytes)
      assert(nSql == nScala, s"SQL rewrote $nSql files, Scala $nScala")
      val (mSql, mScala) = (TableLog.latest(s, sqlDir).get,
        TableLog.latest(s, scalaDir).get)
      assert(mSql.op == "compact" && mSql.files.length == mScala.files.length)
      assert(mSql.files.length < 6, "compact must shrink the file count")
      // row set identical to pre-compact (a compact is a rewrite, not a
      // row change), and the streaming ledger survives the rebase
      val got = TableLog.read(s, sqlDir).as[(Long, String)].collect().sortBy(_._1)
      assert(got.length == 600 && got.map(_._1).toSeq == (0L until 600L))
      assert(mSql.commits == TableLog.latest(s, scalaDir).get.commits)
      // ZORDER BY (one col) = range re-layout; BY (two) = Morton — both
      // record the layout columns in the manifest for stats pruning
      val zDir = fresh()
      val r = new scala.util.Random(7)
      (0 until 4).foreach { b =>
        TableLog.appendBatch(
          Seq.tabulate(500)(i => (r.nextInt(1000), r.nextInt(1000), b))
            .toDF("x", "y", "b").coalesce(1), zDir, "w", b.toLong)
      }
      val before = TableLog.read(s, zDir).as[(Int, Int, Int)].collect().sorted
      val nz = s.sql(s"GRAFT ZORDER '$zDir' BY (x, y)").head().getInt(0)
      assert(nz >= 1)
      val mz = TableLog.latest(s, zDir).get
      assert(mz.layout == Seq("x", "y"), s"layout recorded: ${mz.layout}")
      // per-file stats harvested for BOTH dims (what makes readWhere prune)
      assert(mz.files.forall(f =>
        f.stats.contains("x") && f.stats.contains("y")))
      val after = TableLog.read(s, zDir).as[(Int, Int, Int)].collect().sorted
      assert(after.toSeq == before.toSeq, "a re-layout must not change rows")
      // >2-dim guard is TableLog.compactZorder's; 3 columns still work
      assert(s.sql(s"GRAFT ZORDER '$zDir' BY (x, y, b)").head().getInt(0) >= 1)
      // non-numeric z-order dimension is loud
      val sDir = fresh()
      TableLog.appendBatch(rows(0 until 10, "t"), sDir, "w", 0L)
      val ez = intercept[Exception] {
        s.sql(s"GRAFT ZORDER '$sDir' BY (id, v)").collect()
      }
      assert(ez.getMessage.contains("Morton grid"), ez.getMessage)
      // DATE dimensions normalize via epoch days (no legal double cast
      // under ANSI), and NaN/Inf rows clamp to edge cells instead of
      // blowing up the ANSI long cast — the rewrite keeps every row
      val dDir = fresh()
      val weird = s.sql(
        "SELECT DATE'2026-01-01' + CAST(id AS INT) AS d, " +
          "CASE WHEN id = 0 THEN double('NaN') " +
          "WHEN id = 1 THEN double('Infinity') " +
          "WHEN id = 2 THEN double('-Infinity') " +
          "ELSE CAST(id AS DOUBLE) END AS x, id FROM RANGE(100)")
      TableLog.appendBatch(weird.coalesce(1), dDir, "w", 0L)
      assert(s.sql(s"GRAFT ZORDER '$dDir' BY (d, x)").head().getInt(0) >= 1)
      assert(TableLog.read(s, dDir).count() == 100)
      assert(TableLog.latest(s, dDir).get.layout == Seq("d", "x"))
    }
  }

  test("bare identifiers resolve in the session's current namespace after USE") {
    withSqlSession { s =>
      val warehouse = java.nio.file.Files.createTempDirectory("graft_sqlns")
      s.conf.set("spark.sql.catalog.nscat",
        classOf[graft.sources.GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.nscat.warehouse", warehouse.toString)
      // same-named tables at the root and inside a namespace: the GRAFT
      // target must follow Spark's resolution (current namespace), not
      // silently hit the root table
      s.sql("CREATE TABLE nscat.t (id BIGINT) USING tablelogv2")
      s.sql("INSERT INTO nscat.t SELECT id FROM RANGE(10)")
      s.sql("CREATE TABLE nscat.ns.t (id BIGINT) USING tablelogv2")
      s.sql("INSERT INTO nscat.ns.t SELECT id FROM RANGE(10)")
      try {
        s.sql("USE nscat.ns")
        assert(s.sql("GRAFT DELETE FROM t WHERE id < 4").head().getLong(0) == 4L)
        assert(s.sql("SELECT count(*) FROM t").head().getLong(0) == 6L,
          "the namespaced table must be the one deleted from")
        assert(s.sql("SELECT count(*) FROM nscat.t").head().getLong(0) == 10L,
          "the root table must be untouched")
        // multi-part identifiers stay absolute within the catalog
        assert(s.sql("GRAFT DELETE FROM nscat.t WHERE id < 2").head().getLong(0) == 2L)
        assert(s.sql("SELECT count(*) FROM nscat.t").head().getLong(0) == 8L)
        // maintenance by bare name too
        assert(s.sql("GRAFT COMPACT t").head().getInt(0) >= 1)
        assert(s.sql("SELECT count(*) FROM t").head().getLong(0) == 6L)
      } finally s.sql("USE spark_catalog.default")
      s.sql("DROP TABLE nscat.ns.t")
      s.sql("DROP TABLE nscat.t")
    }
  }

  test("errors are loud: bad predicate, unknown version, malformed statement") {
    withSqlSession { s =>
      val dir = fresh()
      TableLog.appendBatch(rows(0 until 10, "x"), dir, "r", 0L)
      val e1 = intercept[IllegalArgumentException] {
        s.sql(s"GRAFT DELETE FROM '$dir' WHERE ??? nonsense")
      }
      assert(e1.getMessage.contains("cannot parse predicate"))
      val e2 = intercept[IllegalStateException] {
        s.sql(s"GRAFT RESTORE '$dir' TO VERSION 99").collect()
      }
      assert(e2.getMessage.contains("99"))
      // a GRAFT-prefixed statement that matches no command falls through
      // to the delegate parser, whose error names the bogus syntax
      intercept[Exception] { s.sql(s"GRAFT FROBNICATE '$dir'") }
      assert(TableLog.rows(s, dir) == 10L)
      // HISTORY of a typo'd path is the shared loud error, not an
      // empty (and thus misleading) zero-row answer
      val e3 = intercept[IllegalStateException] {
        s.sql(s"GRAFT HISTORY '/no/such/table'").collect()
      }
      assert(e3.getMessage.contains("no committed manifest"), e3.getMessage)
    }
  }

  test("GRAFT TRACK STATS / BLOOM register the pruning columns, semantics the Scala calls'") {
    val dir = fresh()
    TableLog.appendBatch(rows(0 until 10, "x"), dir, "r", 0L)
    withSqlSession { s =>
      val v1 = s.sql(s"GRAFT TRACK STATS '$dir' ON (id)").head().getLong(0)
      assert(TableLog.latest(s, dir).get.statsFor == Seq("id"))
      val v2 = s.sql(s"GRAFT TRACK BLOOM '$dir' ON (id, v)").head().getLong(0)
      assert(v2 == v1 + 1)
      assert(TableLog.latest(s, dir).get.bloomFor == Seq("id", "v"))
      // the Scala validation is shared: a bogus column is the same loud error
      val e = intercept[IllegalArgumentException] {
        s.sql(s"GRAFT TRACK BLOOM '$dir' ON (nope)").collect()
      }
      assert(e.getMessage.contains("not in the table schema"), e.getMessage)
    }
  }

  test("GRAFT HISTORY lists the retained timeline; GRAFT RESTORE TO TIMESTAMP resolves through it") {
    withSqlSession { s =>
      val dir = fresh()
      TableLog.appendBatch(rows(0 until 10, "b0"), dir, "r", 0L)  // v0
      TableLog.appendBatch(rows(10 until 30, "b1"), dir, "r", 1L) // v1
      TableLog.deleteIn(s, dir, "id", Seq(5L))                    // v2
      // pin deterministic commit times
      val log = new org.apache.hadoop.fs.Path(dir + "/_graft_log")
      val fs = log.getFileSystem(s.sparkContext.hadoopConfiguration)
      val base = 1700000000000L
      (0 to 2).foreach { v =>
        fs.setTimes(new org.apache.hadoop.fs.Path(log, f"manifest-$v%020d"),
          base + v * 60000L, -1L)
      }
      val hist = s.sql(s"GRAFT HISTORY '$dir'")
      assert(hist.schema.fieldNames.toSeq ==
        Seq("version", "committed_at", "op", "rows", "files"))
      val got = hist.collect().map(r => (r.getLong(0),
        r.getTimestamp(1).getTime, r.getString(2), r.getLong(3))).toSeq
      assert(got == Seq(
        (0L, base, "append", 10L),
        (1L, base + 60000L, "append", 30L),
        (2L, base + 120000L, "delete", 29L)), got.toString)
      // committed_at reads straight back into a travel clause: restore
      // to the instant of v1 (the ISO form; '' path quoting unaffected)
      val iso = java.time.Instant.ofEpochMilli(base + 60000L).toString
      val res = s.sql(s"GRAFT RESTORE '$dir' TO TIMESTAMP '$iso'")
      assert(res.schema.fieldNames.toSeq ==
        Seq("restored_to_version", "committed_version", "rows"))
      val r0 = res.head()
      assert(r0.getLong(0) == 1L && r0.getLong(1) == 3L && r0.getLong(2) == 30L)
      assert(TableLog.read(s, dir).count() == 30L)
      // a timestamp after the newest commit (the restore itself, whose
      // manifest carries a real current mtime) is the loud versionAt edge
      val late = intercept[IllegalStateException] {
        s.sql(s"GRAFT RESTORE '$dir' TO TIMESTAMP '9999-01-01T00:00:00Z'")
          .collect()
      }
      assert(late.getMessage.contains("VERSION AS OF"), late.getMessage)
    }
  }
}
