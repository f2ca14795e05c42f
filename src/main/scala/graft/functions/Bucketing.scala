package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed co-located joins — the shuffle-elimination half of the scale
  * posture that salting ([[SkewJoin]]) and AQE don't cover: a fact table
  * joined on the same key night after night should pay its shuffle ONCE,
  * at write time. Writing both sides `bucketBy(n, key)` + `sortBy(key)`
  * pins identical hash-partitioned layouts in the table metadata, and
  * every later equi-join on that key sort-merge-joins bucket-to-bucket
  * with ZERO Exchange on either side (BucketingSpec proves the plan).
  *
  * At 100 TB: bucket the silver-layer tables on their join keys; bucket
  * count scales with data volume (buckets ≈ data / target-partition-size),
  * and both sides must agree on it.
  */
object Bucketing {

  /** Drop `table` AND its storage directory. With an in-memory catalog
    * (tests, fresh sessions) a previous life's catalog entry is gone but
    * its directory survives, and saveAsTable refuses to reuse the
    * location — every index builder needs this exact sweep, so it lives
    * once here. The location is RESOLVED, not guessed: a cataloged table
    * reports its actual location (any database), and a vanished one maps
    * to the catalog's default managed path for its identifier. EXTERNAL
    * tables are refused loudly — their data is not this helper's to
    * delete. */
  def dropTableAndLocation(spark: SparkSession, table: String): Unit = {
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
    val catalog = spark.sessionState.catalog
    val location: java.net.URI =
      if (catalog.tableExists(ident)) {
        val meta = catalog.getTableMetadata(ident)
        require(meta.tableType ==
            org.apache.spark.sql.catalyst.catalog.CatalogTableType.MANAGED,
          s"refusing to delete data of non-managed table ${ident.quotedString} " +
            s"(type ${meta.tableType.name}, location ${meta.location}) — " +
            "drop external tables explicitly")
        meta.location
      } else catalog.defaultTablePath(ident)
    spark.sql(s"DROP TABLE IF EXISTS ${ident.quotedString}")
    val dir = new org.apache.hadoop.fs.Path(location)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(dir)) fs.delete(dir, true)
  }

  /** Write `df` as a bucketed, per-bucket-sorted managed parquet table.
    * The one-time shuffle this write pays is the shuffle every subsequent
    * same-key join skips. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key).saveAsTable(table)
  }

  /** Equi-join two tables previously written by [[writeBucketed]] with
    * the same key and bucket count. */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
                    key: String, joinType: String = "inner"): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key), joinType)

  /** True iff `df`'s executed plan moves no data: no shuffle Exchange on
    * any side (broadcast exchanges count as moving data too — pass a plan
    * you expect to be fully co-located). Usable as a production guard
    * before launching a huge query. */
  def isCoLocated(df: DataFrame): Boolean = {
    df.queryExecution.executedPlan // force planning
    !df.queryExecution.executedPlan.toString.contains("Exchange")
  }
}
