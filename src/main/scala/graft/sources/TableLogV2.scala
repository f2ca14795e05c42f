package graft.sources

import java.util

import scala.collection.mutable.LinkedHashMap
import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table,
  TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.execution.datasources.{PartitionDirectory,
  PartitioningAwareFileIndex, PartitionSpec}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.functions.{ManifestFileIndex, TableLog}

/** `format("tablelogv2")` — the DSv2 face of the TableLog batch read
  * (the v1 deprecation de-risk: Spark's investment is in the
  * `TableProvider`/`SupportsRead` contracts — column-stats reporting,
  * runtime filtering — while `format("tablelog")` rides DSv1
  * `RelationProvider`). Deliberately a SPIKE: batch read + `versionAsOf`
  * only, planned as a native `ParquetScan` whose file list is answered
  * by the SAME [[graft.functions.ManifestFileIndex]] as every v1 reader
  * — zero directory listings, orphans of crashed commits never served,
  * and every pushed data filter prunes files against the recorded
  * per-file stats ([[ManifestPinnedFileIndex.listFiles]] delegates to
  * the manifest index, so the v1 and v2 paths can never drift on the
  * pruning rule). Writes and streaming stay on the v1 short name, which
  * remains the production surface.
  *
  * The table pins the manifest resolved at `load()` time — the
  * snapshot-isolation contract every TableLog reader has. */
final class TableLogV2 extends TableProvider with DataSourceRegister {

  override def shortName(): String = "tablelogv2"

  // user-specified schemas are accepted (the engine then skips
  // inferSchema); the manifest-recorded schema is the normal path
  override def supportsExternalMetadata(): Boolean = true

  private def dirOf(options: util.Map[String, String]): String = {
    val ci = new CaseInsensitiveStringMap(options)
    Option(ci.get("path")).orElse(Option(ci.get("dir"))).getOrElse(
      throw new IllegalArgumentException(
        "the tablelogv2 source needs the table directory: .load(<dir>) " +
          "or .option(\"dir\", <dir>)"))
  }

  // resolved ONCE per provider instance and (dir, versionAsOf): the
  // engine calls inferSchema and then getTable separately, and
  // resolving the manifest independently in each would let a racing
  // commit pin the FILE LIST to a different version than the SCHEMA —
  // e.g. a concurrent dropColumn between the two calls would serve the
  // new files under the old schema, resurrecting the dropped column.
  // One resolution per load() is also what the v1 path does.
  private val resolved = new java.util.concurrent.ConcurrentHashMap[
    (String, Option[String]), TableLog.Manifest]()

  private def manifestOf(options: util.Map[String, String]): TableLog.Manifest = {
    val spark = SparkSession.active
    val dir = dirOf(options)
    val ci = new CaseInsensitiveStringMap(options)
    val asOf = Option(ci.get("versionAsOf"))
    resolved.computeIfAbsent((dir, asOf), _ => asOf match {
      case Some(v) => TableLog.manifestAt(spark, dir, v.toLong)
      case None => TableLog.latest(spark, dir).getOrElse(
        throw new IllegalStateException(
          s"$dir has no committed manifest — not a TableLog table (or " +
            "never written)"))
    })
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TableLog.schemaOf(SparkSession.active, dirOf(options), manifestOf(options))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    require(partitioning.isEmpty,
      "tablelogv2 tables are unpartitioned — clustering is " +
        "compact(layoutBy)/trackStats territory")
    new TableLogV2Table(dirOf(properties), manifestOf(properties), schema)
  }
}

/** One pinned TableLog snapshot as a DSv2 [[Table]]: BATCH_READ only,
  * scans built by Spark's own [[ParquetScanBuilder]] (vectorized reader,
  * column pruning, parquet row-group pushdown) over the manifest-pinned
  * file index. */
private[sources] final class TableLogV2Table(dir: String,
    m: TableLog.Manifest, tableSchema: StructType)
    extends Table with SupportsRead {

  override def name(): String = s"tablelogv2.`$dir`@v${m.version}"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    ParquetScanBuilder(SparkSession.active,
      new ManifestPinnedFileIndex(SparkSession.active, dir, m),
      tableSchema, tableSchema, options)
}

/** [[graft.functions.ManifestFileIndex]] widened to the
  * [[PartitioningAwareFileIndex]] shape the v2 file-scan machinery
  * requires. Every answer comes from the manifest: the leaf maps are the
  * entry list rendered as statuses (zero filesystem listings), and
  * `listFiles` — the call [[org.apache.spark.sql.execution.datasources
  * .v2.FileScan]] plans its partitions through — delegates to the
  * manifest index so pushed data filters prune files against the
  * recorded per-file stats exactly as the v1 relation does. */
private[sources] final class ManifestPinnedFileIndex(spark: SparkSession,
    dir: String, m: TableLog.Manifest)
    extends PartitioningAwareFileIndex(spark, Map.empty, None) {

  private val inner = new ManifestFileIndex(spark, dir, m)
  private val base = new Path(dir.stripSuffix("/"))
  private def statuses: Seq[FileStatus] = m.files.map { e =>
    new FileStatus(e.bytes, false, 1, 128L * 1024 * 1024, 0L,
      new Path(base, e.name))
  }

  override def rootPaths: Seq[Path] = Seq(base)
  override def partitionSpec(): PartitionSpec = PartitionSpec.emptySpec
  override def partitionSchema: StructType = StructType(Nil)
  override def leafFiles: LinkedHashMap[Path, FileStatus] =
    LinkedHashMap(statuses.map(s => s.getPath -> s): _*)
  override def leafDirToChildrenFiles: Map[Path, Array[FileStatus]] =
    Map(base -> statuses.toArray)
  override def sizeInBytes: Long = m.bytes
  override def inputFiles: Array[String] = inner.inputFiles
  override def refresh(): Unit = ()

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] =
    inner.listFiles(partitionFilters, dataFilters)
}
