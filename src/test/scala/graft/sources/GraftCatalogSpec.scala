package graft.sources

import graft.SparkSuite
import graft.functions.TableLog
import org.apache.spark.sql.functions._

/** The named-table face ([[GraftCatalog]]): create, append, read, time
  * travel, alter and drop through a catalog identifier must be the SAME
  * table the path faces see — the catalog is a pointer layer over the
  * TableLog manifest, never a second source of truth. */
class GraftCatalogSpec extends SparkSuite {
  import spark.implicits._

  // one catalog per suite run, registered at runtime (catalog plugins
  // are instantiated lazily on first reference, so runtime conf works)
  private lazy val cat: String = {
    val warehouse = java.nio.file.Files.createTempDirectory("graft_cat")
    spark.conf.set("spark.sql.catalog.gcat", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gcat.warehouse", warehouse.toString)
    "gcat"
  }

  test("create, insert, read, saveAsTable, time travel, alter, drop — all by name") {
    spark.sql(s"CREATE TABLE $cat.ml.docs (id BIGINT, v STRING) USING tablelogv2")
    // the name is listed and described
    assert(spark.sql(s"SHOW TABLES IN $cat.ml").collect()
      .map(_.getString(1)).toSeq == Seq("docs"))
    // insert + select by name
    spark.sql(s"INSERT INTO $cat.ml.docs VALUES (1, 'a'), (2, 'b')")
    assert(spark.sql(s"SELECT count(*) FROM $cat.ml.docs").head().getLong(0) == 2L)
    // DataFrame faces
    Seq((3L, "c")).toDF("id", "v").write.mode("append")
      .saveAsTable(s"$cat.ml.docs")
    assert(spark.read.table(s"$cat.ml.docs").count() == 3L)
    // it IS a TableLog table: the path face reads the same rows
    val cata = spark.sessionState.catalogManager.catalog(cat)
      .asInstanceOf[GraftCatalog]
    val dir = cata.tableDir(
      org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("ml"), "docs"))
    assert(TableLog.read(spark, dir).count() == 3L)
    assert(spark.read.format("tablelogv2").load(dir).count() == 3L)
    // time travel by name: version 0 is the empty CREATE commit
    assert(spark.sql(s"SELECT count(*) FROM $cat.ml.docs VERSION AS OF 0")
      .head().getLong(0) == 0L)
    assert(spark.sql(s"SELECT count(*) FROM $cat.ml.docs VERSION AS OF 1")
      .head().getLong(0) == 2L)
    // ALTER TABLE ADD COLUMN -> an evolve commit; old rows read null
    spark.sql(s"ALTER TABLE $cat.ml.docs ADD COLUMN lang STRING")
    spark.sql(s"INSERT INTO $cat.ml.docs VALUES (4, 'd', 'en')")
    val byLang = spark.read.table(s"$cat.ml.docs")
      .groupBy($"lang").count().collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(byLang == Map(None -> 3L, Some("en") -> 1L))
    // DROP COLUMN -> dropColumn commit
    spark.sql(s"ALTER TABLE $cat.ml.docs DROP COLUMN v")
    assert(spark.read.table(s"$cat.ml.docs").schema.fieldNames.toSeq ==
      Seq("id", "lang"))
    // unsupported alters are loud
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.ml.docs RENAME COLUMN lang TO l")
    }
    assert(e.getMessage.contains("not") && e.getMessage.contains("supported"),
      e.getMessage)
    // DROP TABLE: managed — the name AND the data go
    spark.sql(s"DROP TABLE $cat.ml.docs")
    assert(!new java.io.File(dir).exists(), "managed data must die with the name")
    intercept[Exception] { spark.read.table(s"$cat.ml.docs").count() }
  }

  test("CTAS by name; second CREATE of the same name is loud") {
    spark.sql(s"CREATE TABLE $cat.ctas USING tablelogv2 AS " +
      "SELECT CAST(id AS BIGINT) AS id, CONCAT('r', id) AS v FROM RANGE(10)")
    assert(spark.read.table(s"$cat.ctas").count() == 10L)
    val e = intercept[Exception] {
      spark.sql(s"CREATE TABLE $cat.ctas (id BIGINT) USING tablelogv2")
    }
    assert(e.getMessage.toLowerCase.contains("already exists"), e.getMessage)
    spark.sql(s"DROP TABLE $cat.ctas")
  }

  test("external LOCATION adopts an existing TableLog dir; DROP forgets the name, keeps the data") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cat_ext")
      .toString + "/t"
    TableLog.appendBatch(
      Seq.tabulate(50)(i => (i.toLong, s"x$i")).toDF("id", "v").coalesce(1),
      dir, "w", 0L)
    // adopt with no declared columns: the recorded schema is the truth
    spark.sql(s"CREATE TABLE $cat.ext USING tablelogv2 LOCATION '$dir'")
    assert(spark.read.table(s"$cat.ext").count() == 50L)
    assert(spark.read.table(s"$cat.ext").schema.fieldNames.toSeq ==
      Seq("id", "v"))
    // writes by name land in the adopted dir through the ledger
    spark.sql(s"INSERT INTO $cat.ext VALUES (100, 'y')")
    assert(TableLog.rows(spark, dir) == 51L)
    // a conflicting declared schema is loud
    val e = intercept[Exception] {
      spark.sql(s"CREATE TABLE $cat.ext2 (id BIGINT, wrong DOUBLE) " +
        s"USING tablelogv2 LOCATION '$dir'")
    }
    assert(e.getMessage.contains("already holds"), e.getMessage)
    // DROP external: name forgotten, data intact
    spark.sql(s"DROP TABLE $cat.ext")
    assert(TableLog.rows(spark, dir) == 51L,
      "dropping an external table must not delete its data")
    intercept[Exception] { spark.read.table(s"$cat.ext").count() }
  }

  test("streaming by name: readStream.table tails the version log") {
    spark.sql(s"CREATE TABLE $cat.stream_src (id BIGINT, v STRING) USING tablelogv2")
    val cata = spark.sessionState.catalogManager.catalog(cat)
      .asInstanceOf[GraftCatalog]
    val dir = cata.tableDir(
      org.apache.spark.sql.connector.catalog.Identifier.of(
        Array.empty, "stream_src"))
    TableLog.appendBatch(Seq((1L, "a")).toDF("id", "v").coalesce(1),
      dir, "w", 0L)
    val out = java.nio.file.Files.createTempDirectory("graft_cat_out")
    // reader options flow through the named face exactly as on the
    // path face: since = -1 tails from the beginning of history
    val q = spark.readStream.option("since", "-1").table(s"$cat.stream_src")
      .writeStream.format("parquet").option("path", out.toString + "/p")
      .option("checkpointLocation", out.toString + "/ck")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      TableLog.appendBatch(Seq((2L, "b")).toDF("id", "v").coalesce(1),
        dir, "w", 1L)
      q.processAllAvailable()
    } finally q.stop()
    assert(spark.read.parquet(out.toString + "/p")
      .select($"id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    spark.sql(s"DROP TABLE $cat.stream_src")
  }

  test("a rejected CREATE un-claims the name; reserved and NOT NULL shapes are loud") {
    // a schema-mismatched adopt fails AND leaves the name free
    val dir = java.nio.file.Files.createTempDirectory("graft_cat_rej")
      .toString + "/t"
    TableLog.appendBatch(
      Seq((1L, "a")).toDF("id", "v").coalesce(1), dir, "w", 0L)
    intercept[Exception] {
      spark.sql(s"CREATE TABLE $cat.rej (id BIGINT, wrong DOUBLE) " +
        s"USING tablelogv2 LOCATION '$dir'")
    }
    val cata = spark.sessionState.catalogManager.catalog(cat)
      .asInstanceOf[GraftCatalog]
    assert(!cata.tableExists(
      org.apache.spark.sql.connector.catalog.Identifier.of(
        Array.empty, "rej")),
      "a rejected CREATE must not leave the table registered")
    // ... so a corrected retry succeeds instead of TableAlreadyExists
    spark.sql(s"CREATE TABLE $cat.rej USING tablelogv2 LOCATION '$dir'")
    assert(spark.read.table(s"$cat.rej").count() == 1L)
    spark.sql(s"DROP TABLE $cat.rej")
    // '_'-prefixed names would collide with the pointer tree
    val e = intercept[Exception] {
      spark.sql(s"CREATE TABLE $cat.`_catalog` (id BIGINT) USING tablelogv2")
    }
    assert(e.getMessage.contains("reserved"), e.getMessage)
    // NOT NULL on ADD COLUMN is unsatisfiable for already-written files
    spark.sql(s"CREATE TABLE $cat.nn (id BIGINT) USING tablelogv2")
    val e2 = intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.nn ADD COLUMN x INT NOT NULL")
    }
    assert(e2.getMessage.contains("NOT NULL"), e2.getMessage)
    spark.sql(s"DROP TABLE $cat.nn")
  }

  test("DROP NAMESPACE CASCADE applies DROP TABLE semantics: managed data dies, external survives") {
    spark.sql(s"CREATE TABLE $cat.casc.managed (id BIGINT) USING tablelogv2")
    val ext = java.nio.file.Files.createTempDirectory("graft_cat_casc")
      .toString + "/t"
    TableLog.appendBatch(
      Seq((1L, "a")).toDF("id", "v").coalesce(1), ext, "w", 0L)
    spark.sql(s"CREATE TABLE $cat.casc.ext USING tablelogv2 LOCATION '$ext'")
    val cata = spark.sessionState.catalogManager.catalog(cat)
      .asInstanceOf[GraftCatalog]
    val managedDir = cata.tableDir(
      org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("casc"), "managed"))
    // non-cascade refuses while tables are registered
    intercept[Exception] { spark.sql(s"DROP NAMESPACE $cat.casc") }
    spark.sql(s"DROP NAMESPACE $cat.casc CASCADE")
    assert(!new java.io.File(managedDir).exists(),
      "cascade must reclaim managed tables' data")
    assert(TableLog.rows(spark, ext) == 1L,
      "cascade must not delete external tables' data")
    intercept[Exception] { spark.read.table(s"$cat.casc.ext").count() }
  }

  test("reserved '.' names, managed CREATE never adopts, crashed DROP leaves only the loud stale pointer") {
    val cata = spark.sessionState.catalogManager.catalog(cat)
      .asInstanceOf[GraftCatalog]
    def ident(ns: Array[String], t: String) =
      org.apache.spark.sql.connector.catalog.Identifier.of(ns, t)
    // '.'-prefixed names are skipped by every listing as staging debris
    // — a CREATE that succeeded would never list and a non-cascade DROP
    // NAMESPACE would orphan its managed data; reserved loudly instead
    val e = intercept[Exception] {
      spark.sql(s"CREATE TABLE $cat.`.t` (id BIGINT) USING tablelogv2")
    }
    assert(e.getMessage.contains("reserved"), e.getMessage)
    assert(!cata.tableExists(ident(Array.empty, ".t")))
    // managed CREATE over leftover committed data is loud (adoption is
    // a LOCATION privilege): leftovers at the computed warehouse path
    // must not hand a "fresh" table stale rows
    val warehouse = spark.conf.get(s"spark.sql.catalog.$cat.warehouse")
    val leftoverDir = s"$warehouse/leftover"
    TableLog.appendBatch(
      Seq((1L, "stale")).toDF("id", "v").coalesce(1), leftoverDir, "w", 0L)
    val e2 = intercept[Exception] {
      spark.sql(s"CREATE TABLE $cat.leftover (id BIGINT, v STRING) USING tablelogv2")
    }
    assert(e2.getMessage.contains("must start empty"), e2.getMessage)
    assert(!cata.tableExists(ident(Array.empty, "leftover")),
      "the rejected managed CREATE must un-claim the name")
    // the explicit adopt path stays open
    spark.sql(s"CREATE TABLE $cat.leftover USING tablelogv2 LOCATION '$leftoverDir'")
    assert(spark.read.table(s"$cat.leftover").count() == 1L)
    spark.sql(s"DROP TABLE $cat.leftover")
    // a DROP that crashes between its two deletes (data first, pointer
    // second) leaves a stale pointer — the LOUD failure mode, which a
    // retried DROP clears; the reverse order would orphan data silently
    spark.sql(s"CREATE TABLE $cat.crashd (id BIGINT) USING tablelogv2")
    spark.sql(s"INSERT INTO $cat.crashd VALUES (1)")
    val dirC = cata.tableDir(ident(Array.empty, "crashd"))
    val pC = new org.apache.hadoop.fs.Path(dirC)
    pC.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(pC, true)
    val e3 = intercept[IllegalStateException] {
      spark.read.table(s"$cat.crashd").count()
    }
    assert(e3.getMessage.contains("stale") || e3.getMessage.contains("removed"),
      e3.getMessage)
    spark.sql(s"DROP TABLE $cat.crashd") // the retry clears the pointer
    assert(!cata.tableExists(ident(Array.empty, "crashd")))
  }

  test("a namespace is not a table; bad VERSION AS OF and positioned ADD COLUMN are loud") {
    val cata = spark.sessionState.catalogManager.catalog(cat)
      .asInstanceOf[GraftCatalog]
    def ident(ns: Array[String], t: String) =
      org.apache.spark.sql.connector.catalog.Identifier.of(ns, t)
    spark.sql(s"CREATE TABLE $cat.nst.inner (id BIGINT) USING tablelogv2")
    // the namespace DIRECTORY under _catalog must not read as a table
    assert(!cata.tableExists(ident(Array.empty, "nst")),
      "a namespace directory must not report as a table")
    intercept[org.apache.spark.sql.catalyst.analysis.NoSuchTableException] {
      cata.loadTable(ident(Array.empty, "nst"))
    }
    // non-integer time travel names the table and points at the right mode
    val e = intercept[IllegalArgumentException] {
      cata.loadTable(ident(Array("nst"), "inner"), "2026-01-01")
    }
    assert(e.getMessage.contains("integer") &&
      e.getMessage.contains("TIMESTAMP AS OF"), e.getMessage)
    // FIRST/AFTER and COMMENT would be silently ignored — loud instead
    val e2 = intercept[UnsupportedOperationException] {
      spark.sql(s"ALTER TABLE $cat.nst.inner ADD COLUMN x INT FIRST")
    }
    assert(e2.getMessage.contains("FIRST/AFTER"), e2.getMessage)
    val e3 = intercept[UnsupportedOperationException] {
      spark.sql(s"ALTER TABLE $cat.nst.inner ADD COLUMN x INT COMMENT 'c'")
    }
    assert(e3.getMessage.contains("COMMENT"), e3.getMessage)
    // neither rejected ALTER committed anything
    assert(spark.read.table(s"$cat.nst.inner").schema.fieldNames.toSeq == Seq("id"))
    spark.sql(s"DROP NAMESPACE $cat.nst CASCADE")
  }

  test("SHOW TBLPROPERTIES serves manifest stats — no file walk, snapshot-consistent") {
    spark.sql(s"CREATE TABLE $cat.props (id BIGINT, v STRING) USING tablelogv2")
    spark.sql(s"INSERT INTO $cat.props SELECT id, CONCAT('r', id) FROM RANGE(7)")
    val props = spark.sql(s"SHOW TBLPROPERTIES $cat.props").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val cata = spark.sessionState.catalogManager.catalog(cat)
      .asInstanceOf[GraftCatalog]
    val dir = cata.tableDir(
      org.apache.spark.sql.connector.catalog.Identifier.of(Array.empty, "props"))
    val m = TableLog.latest(spark, dir).get
    // 'provider'/'path' are Spark-reserved keys SHOW filters out; the
    // raw Table.properties() face still carries them
    assert(cata.loadTable(
      org.apache.spark.sql.connector.catalog.Identifier.of(Array.empty, "props"))
      .properties().get("provider") == "tablelogv2")
    assert(props("graft.version") == m.version.toString)
    assert(props("graft.rows") == "7")
    assert(props("graft.bytes") == m.bytes.toString)
    assert(props("graft.files") == m.files.length.toString)
    spark.sql(s"DROP TABLE $cat.props")
  }

  test("TIMESTAMP AS OF by name: clock travel through the catalog, loud at both edges") {
    spark.sql(s"CREATE TABLE $cat.tt.ev (id BIGINT) USING tablelogv2") // v0
    spark.sql(s"INSERT INTO $cat.tt.ev SELECT id FROM RANGE(5)")       // v1
    spark.sql(s"INSERT INTO $cat.tt.ev SELECT id FROM RANGE(5, 12)")   // v2
    val cata = spark.sessionState.catalogManager.catalog(cat)
      .asInstanceOf[GraftCatalog]
    val dir = cata.tableDir(
      org.apache.spark.sql.connector.catalog.Identifier.of(Array("tt"), "ev"))
    val log = new org.apache.hadoop.fs.Path(dir + "/_graft_log")
    val fs = log.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val base = 1700000000000L
    (0 to 2).foreach { v =>
      fs.setTimes(new org.apache.hadoop.fs.Path(log, f"manifest-$v%020d"),
        base + v * 60000L, -1L)
    }
    def at(ms: Long): Long =
      spark.sql(s"SELECT count(*) FROM $cat.tt.ev TIMESTAMP AS OF " +
        s"timestamp_millis(${ms}L)").head().getLong(0)
    assert(at(base) == 0L)              // the empty CREATE commit
    assert(at(base + 60000L) == 5L)     // v1, exactly at its commit
    assert(at(base + 119999L) == 5L)    // between commits -> the earlier
    assert(at(base + 120000L) == 12L)   // v2
    // the timeline TIMESTAMP AS OF resolves against IS what GRAFT
    // HISTORY prints — by catalog name, same resolution path (the
    // command invoked directly: this suite's session has no GRAFT
    // parser; the SQL-text route is TableLogSqlSpec's)
    val hist = graft.functions.GraftHistoryCommand(
        graft.functions.TableLogSql.IdentTarget(Seq(cat, "tt", "ev")))
      .run(spark)
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime)).toSeq
    assert(hist == Seq((0L, base), (1L, base + 60000L), (2L, base + 120000L)),
      hist.toString)
    val early = intercept[Exception] { at(base - 1) }
    assert(early.getMessage.contains("oldest retained"), early.getMessage)
    val late = intercept[Exception] { at(base + 120001L) }
    assert(late.getMessage.contains("VERSION AS OF 2"), late.getMessage)
    spark.sql(s"DROP NAMESPACE $cat.tt CASCADE")
  }

  test("racing CREATEs of one name resolve to exactly one winner") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    cat // force registration before the race
    val attempts = Future.traverse((0 until 4).toList) { i =>
      Future {
        try {
          spark.sql(s"CREATE TABLE $cat.raced (id BIGINT) USING tablelogv2")
          true
        } catch { case _: Exception => false }
      }
    }
    val wins = Await.result(attempts, 2.minutes).count(identity)
    assert(wins == 1, s"$wins CREATEs won the race for one name")
    assert(spark.read.table(s"$cat.raced").schema.fieldNames.toSeq == Seq("id"))
    spark.sql(s"DROP TABLE $cat.raced")
  }
}
