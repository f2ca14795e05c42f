package graft.sources

import org.apache.spark.sql.SQLContext
import org.apache.spark.sql.execution.streaming.Source
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister,
  RelationProvider, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

import graft.functions.TableLog

/** `format("tablelog")` — the lake layer as a plain Spark data source,
  * batch AND stream, so a session that never touches the graft Scala
  * API (SQL, Python, a BI tool) can still read committed snapshots:
  *
  *  - batch: `spark.read.format("tablelog").load(dir)` plans the same
  *    manifest-pinned parquet relation as
  *    [[graft.functions.TableLog.read]] — the file list is answered
  *    from the manifest (zero directory listings, orphans of crashed
  *    commits never served) and every pushable filter prunes files
  *    against the recorded per-file stats through the
  *    [[graft.functions.ManifestFileIndex]]. Time travel via
  *    `.option("versionAsOf", v)`, exactly
  *    [[graft.functions.TableLog.readAt]] (era-correct schema, loud
  *    beyond-retention error). SQL: `CREATE TABLE t USING tablelog
  *    OPTIONS (path '<dir>')` then query `t` — note Spark CACHES the
  *    resolved relation per session, so `t` serves the snapshot pinned
  *    at first use until `REFRESH TABLE t` (or a new session) re-runs
  *    `createRelation` — the standard external-commit contract of
  *    every DSv1 path-based table.
  *  - stream: `spark.readStream.format("tablelog")` is the
  *    version-offset tail ([[TableLogTailProvider]] — exactly-once,
  *    per-batch stats pruning, `since` / `maxVersionsPerTrigger`
  *    options).
  *
  * The relation pins the manifest resolved at `load()` time — the
  * snapshot-isolation contract every TableLog reader has; re-`load()`
  * to see later commits. Registered through the `DataSourceRegister`
  * service file, so the short name works with only the graft jar on
  * the classpath. */
final class TableLogProvider extends RelationProvider
    with StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "tablelog"

  private def dirOf(parameters: Map[String, String]): String =
    parameters.get("path").orElse(parameters.get("dir")).getOrElse(
      throw new IllegalArgumentException(
        "the tablelog source needs the table directory: .load(<dir>) or " +
          ".option(\"dir\", <dir>)"))

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val spark = sqlContext.sparkSession
    val dir = dirOf(parameters)
    val m = parameters.get("versionAsOf") match {
      case Some(v) => TableLog.manifestAt(spark, dir, v.toLong)
      case None => TableLog.latest(spark, dir).getOrElse(
        throw new IllegalStateException(
          s"$dir has no committed manifest — not a TableLog table (or " +
            "never written)"))
    }
    // pre-schema v1 manifests fall back to single-file footer inference
    // (shared with readTail); those files carry no recorded stats, so
    // pruning is conservative (every file kept) either way
    TableLog.hadoopRelation(spark, dir, m, TableLog.schemaOf(spark, dir, m))
  }

  // the streaming face under the same short name: the version-offset
  // tail, with `path` (set by `.load(dir)`) accepted as `dir`
  private val tail = new TableLogTailProvider

  private def withDir(parameters: Map[String, String]): Map[String, String] =
    if (parameters.contains("dir")) parameters
    else parameters.get("path").fold(parameters)(p => parameters + ("dir" -> p))

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    tail.sourceSchema(sqlContext, schema, providerName, withDir(parameters))

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    tail.createSource(sqlContext, metadataPath, schema, providerName,
      withDir(parameters))
}
