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
    }
  }
}
