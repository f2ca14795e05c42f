package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Generic point-in-time (AS-OF) join — the feature-store join Spark has
  * no native operator for, extracted from the `join_asof` query so any
  * pair of tables can use it. For each left row, attach the single
  * right row with the greatest `rightTime <= leftTime` for the same
  * `key`; left rows with no prior right row keep nulls (left
  * semantics).
  *
  * Plan (the scalable shape — never a per-row range probe): union-tag
  * both sides, ONE shuffle on `key`, and a running
  * `last(ignoreNulls)` window propagates the latest right payload onto
  * every left row. State per task is one row; output is |left| rows.
  *
  * Determinism: right rows tied on (key, rightTime) are resolved by the
  * greatest ORDERABLE right payload (struct ordering over the right
  * columns whose types Spark can sort — map-typed columns are excluded
  * from the tiebreak, so with map payloads determinism holds up to the
  * remaining columns) — a total, engine-independent rule, so re-runs
  * and engines agree even with duplicate timestamps. At equal
  * left/right times the right row DOES match (`<=`, the standard AS-OF
  * convention).
  *
  * Null semantics follow SQL joins: a right row with a null key or
  * null time can never match (the predicate is never true), and a left
  * row with a null key or null time keeps a null match — NOT
  * null-equals-null grouping.
  */
object AsofJoin {

  /** `left` columns plus `right`'s non-key columns (null where no right
    * row is at or before the left time). Column names other than `key`
    * must be disjoint between the two inputs. */
  def leftAsof(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String): DataFrame = {
    val rightPayloadCols = right.columns.filterNot(_ == key).toSeq
    val overlap = left.columns.toSet intersect rightPayloadCols.toSet
    require(overlap.isEmpty,
      s"left and right share non-key columns ${overlap.mkString(", ")} — rename before joining")
    require(left.columns.contains(leftTime) && right.columns.contains(rightTime),
      s"time columns missing: $leftTime / $rightTime")
    require(left.schema(leftTime).dataType == right.schema(rightTime).dataType,
      s"time columns must share a type: ${left.schema(leftTime).dataType} vs " +
        s"${right.schema(rightTime).dataType}")

    val rStruct = struct(rightPayloadCols.map(col): _*)
    val rType = StructType(right.select(rightPayloadCols.map(col): _*).schema.fields)
    val lStruct = struct(left.columns.map(col): _*)
    val lType = StructType(left.schema.fields)

    // SQL join null semantics with ONE scan of each side: null-key or
    // null-time RIGHT rows are filtered out (the join predicate can
    // never be true for them), and that alone makes every left row
    // correct without a bypass branch — a null-key left row partitions
    // under the null key where no right rows remain (no null-equals-
    // null grouping), and a null-time left row sorts nulls-first, i.e.
    // before every right row of its key, so its running match is null
    val taggedL = left.select(col(key).as("__k"),
      col(leftTime).as("__t"), lit(1).as("__side"),
      lStruct.as("__l"), lit(null).cast(rType).as("__r"))
    val taggedR = right.filter(col(key).isNotNull && col(rightTime).isNotNull)
      .select(col(key).as("__k"),
        col(rightTime).as("__t"), lit(0).as("__side"),
        lit(null).cast(lType).as("__l"), rStruct.as("__r"))

    // right rows sort before same-instant left rows (side 0 < 1) so the
    // <= convention holds; among right ties, the ORDERABLE slice of the
    // payload ascending makes last() the greatest payload (map-typed
    // columns cannot be sort keys and are left out of the tiebreak)
    val orderableCols = right.select(rightPayloadCols.map(col): _*).schema.fields
      .filter(f => org.apache.spark.sql.catalyst.expressions.RowOrdering
        .isOrderable(f.dataType))
      .map(f => col(s"__r.${f.name}")).toSeq
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t") +: col("__side") +: orderableCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = taggedR.unionByName(taggedL)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val leftOut = left.columns.toSeq.map(c => col(s"__l.$c").as(c))
    val rightOut = rightPayloadCols.map(c => col(s"__m.$c").as(c))
    matched.select(leftOut ++ rightOut: _*)
  }
}
