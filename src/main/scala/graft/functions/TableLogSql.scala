package graft.functions

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference,
  EqualTo, Expression, GreaterThanOrEqual, In, LessThanOrEqual, Literal}
import org.apache.spark.sql.catalyst.parser.{ParserInterface, ParseException}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StructType}

/** SQL faces for the TableLog MAINTENANCE operators — the last surface
  * that was Scala-API-only. Reads, appends, tailing, the change feed
  * and mergeSchema were already reachable from SQL/Python through
  * `format("tablelog")`/`format("tablelogv2")`; a takedown or a
  * rollback still needed a Scala operator. With
  * `spark.sql.extensions=graft.functions.GraftExtensions` (or
  * [[GraftFunctions.register]]… plus [[TableLogSql.parser]] in tests),
  * a pure-SQL session can run:
  *
  * {{{
  *   GRAFT DELETE FROM '<dir>' WHERE <predicate>       -- returns deleted_rows
  *   GRAFT RESTORE '<dir>' TO VERSION <n>              -- returns version, rows
  *   GRAFT VACUUM '<dir>' [RETAIN <ms> MILLISECONDS]   -- returns deleted_files
  * }}}
  *
  * Semantics are EXACTLY the Scala calls' — the commands are thin
  * driver-side wrappers over [[TableLog.delete]]/[[TableLog.restore]]/
  * [[TableLog.vacuum]], so CDC visibility, ledger fencing, re-plan
  * under racing maintenance and retention rules are shared, not
  * reimplemented. The `GRAFT` keyword prefix keeps the grammar
  * disjoint from Spark SQL: anything else falls through to the
  * delegate parser untouched.
  *
  * The DELETE predicate is parsed by Spark's own expression parser and
  * ROUTED like the Scala faces: `col IN (literals…)` / `col = lit`
  * run as [[TableLog.deleteIn]] (per-value manifest stats pruning —
  * the takedown-list shape), `col BETWEEN lo AND hi` as
  * [[TableLog.deleteRange]] (span pruning), anything else as the
  * general [[TableLog.delete]] over all files. */
object TableLogSql {

  // '<path>' with SQL-standard quote escaping: '' inside the literal is
  // a single quote (a path like /data/o''brien is legal), unescaped by
  // [[unq]] after capture
  private val P = """'((?:[^']|'')+)'"""
  private val DeleteRe =
    s"""(?is)\\s*GRAFT\\s+DELETE\\s+FROM\\s+$P\\s+WHERE\\s+(.+?)\\s*;?\\s*""".r
  private val RestoreRe =
    s"""(?is)\\s*GRAFT\\s+RESTORE\\s+$P\\s+TO\\s+VERSION\\s+(\\d+)\\s*;?\\s*""".r
  private val VacuumRe =
    s"""(?is)\\s*GRAFT\\s+VACUUM\\s+$P(?:\\s+RETAIN\\s+(\\d+)\\s+MILLISECONDS)?\\s*;?\\s*""".r

  private def unq(path: String): String = path.replace("''", "'")

  /** Default vacuum grace for the SQL face when RETAIN is omitted:
    * 7 days, the conservative industry default for lake vacuums —
    * long enough that any realistically-lagging reader or consumer
    * lease has either finished or renewed. */
  val DefaultSqlVacuumGraceMs: Long = 7L * 24 * 60 * 60 * 1000

  /** The graft statement, if `sqlText` is one (None falls through to
    * the delegate parser). */
  def parse(sqlText: String): Option[LogicalPlan] = sqlText match {
    case DeleteRe(dir, predicate) =>
      Some(GraftDeleteCommand(unq(dir), predicate))
    case RestoreRe(dir, v) => Some(GraftRestoreCommand(unq(dir), v.toLong))
    case VacuumRe(dir, retain) =>
      Some(GraftVacuumCommand(unq(dir),
        Option(retain).map(_.toLong).getOrElse(DefaultSqlVacuumGraceMs)))
    case _ => None
  }

  /** The injectable parser: graft statements short-circuit, everything
    * else (plans, expressions, identifiers, schemas) is the delegate's. */
  def parser(delegate: ParserInterface): ParserInterface =
    new ParserInterface {
      override def parsePlan(sqlText: String): LogicalPlan =
        parse(sqlText).getOrElse(delegate.parsePlan(sqlText))
      override def parseExpression(sqlText: String): Expression =
        delegate.parseExpression(sqlText)
      override def parseTableIdentifier(sqlText: String): TableIdentifier =
        delegate.parseTableIdentifier(sqlText)
      override def parseFunctionIdentifier(
          sqlText: String): FunctionIdentifier =
        delegate.parseFunctionIdentifier(sqlText)
      override def parseMultipartIdentifier(sqlText: String): Seq[String] =
        delegate.parseMultipartIdentifier(sqlText)
      override def parseQuery(sqlText: String): LogicalPlan =
        delegate.parseQuery(sqlText)
      override def parseRoutineParam(sqlText: String): StructType =
        delegate.parseRoutineParam(sqlText)
      override def parseTableSchema(sqlText: String): StructType =
        delegate.parseTableSchema(sqlText)
      override def parseDataType(sqlText: String): DataType =
        delegate.parseDataType(sqlText)
    }
}

/** `GRAFT DELETE FROM '<dir>' WHERE <predicate>` — see [[TableLogSql]]. */
final case class GraftDeleteCommand(dir: String, predicateSql: String)
    extends LeafRunnableCommand {

  override val output: Seq[AttributeReference] =
    Seq(AttributeReference("deleted_rows", LongType, nullable = false)())

  private def scalaValue(l: Literal): Any =
    CatalystTypeConverters.convertToScala(l.value, l.dataType)

  override def run(spark: SparkSession): Seq[Row] = {
    val parsed =
      try spark.sessionState.sqlParser.parseExpression(predicateSql)
      catch {
        case e: ParseException => throw new IllegalArgumentException(
          s"GRAFT DELETE: cannot parse predicate '$predicateSql': " +
            e.getMessage, e)
      }
    // route shapes the Scala faces prune better than a full-file-list
    // delete: point/list lookups -> deleteIn, a range -> deleteRange
    val deleted = parsed match {
      case In(a: UnresolvedAttribute, vals)
          if vals.nonEmpty && vals.forall(_.isInstanceOf[Literal]) =>
        TableLog.deleteIn(spark, dir, a.name,
          vals.map(v => scalaValue(v.asInstanceOf[Literal])))
      case EqualTo(a: UnresolvedAttribute, l: Literal) =>
        TableLog.deleteIn(spark, dir, a.name, Seq(scalaValue(l)))
      case EqualTo(l: Literal, a: UnresolvedAttribute) =>
        TableLog.deleteIn(spark, dir, a.name, Seq(scalaValue(l)))
      case And(GreaterThanOrEqual(a: UnresolvedAttribute, lo: Literal),
               LessThanOrEqual(b: UnresolvedAttribute, hi: Literal))
          if a.name == b.name => // how BETWEEN parses
        TableLog.deleteRange(spark, dir, a.name,
          scalaValue(lo), scalaValue(hi))
      case other =>
        TableLog.delete(spark, dir,
          org.apache.spark.sql.graftbridge.column(other))
    }
    Seq(Row(deleted))
  }
}

/** `GRAFT RESTORE '<dir>' TO VERSION <n>` — see [[TableLogSql]]. */
final case class GraftRestoreCommand(dir: String, version: Long)
    extends LeafRunnableCommand {

  override val output: Seq[AttributeReference] = Seq(
    AttributeReference("restored_to_version", LongType, nullable = false)(),
    AttributeReference("committed_version", LongType, nullable = false)(),
    AttributeReference("rows", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val m = TableLog.restore(spark, dir, version)
    Seq(Row(version, m.version, m.rows))
  }
}

/** `GRAFT VACUUM '<dir>' [RETAIN <ms> MILLISECONDS]` — see
  * [[TableLogSql]]. */
final case class GraftVacuumCommand(dir: String, graceMs: Long)
    extends LeafRunnableCommand {

  override val output: Seq[AttributeReference] =
    Seq(AttributeReference("deleted_files", IntegerType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(TableLog.vacuum(spark, dir, graceMs)))
}
