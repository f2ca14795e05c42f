package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps each implemented operator from SURVEY.md §2 to a batch
  * DataFrame plan over the driver's parquet tables; `oracleSql` holds the
  * DuckDB-equivalent SQL (omitted only for ops whose result is checked by
  * ScalaTest instead, e.g. float-path variants of an oracle-checked query).
  * Streaming counterparts live in graft.streaming and are covered by tests.
  */
object SparkEntry {
  private val groups: Seq[QueryGroup] =
    Seq(CoreOps, WindowOps, ExtraOps, MiscOps, JoinOps, TextOps, DedupOps,
      SimilarityOps, MultimodalOps, MlOps, PipelineOps, CurationOps, SketchOps,
      GovernanceOps, ScaleOps)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreOps.queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    groups.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    groups.flatMap(_.oracle).toMap
}
