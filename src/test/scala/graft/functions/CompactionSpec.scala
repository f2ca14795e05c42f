package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Compaction: a fragmented table (file-per-micro-batch profile) is
  * rewritten into few near-target files with identical contents, and
  * the swap leaves no staging debris.
  */
class CompactionSpec extends SparkSuite {
  import spark.implicits._

  private def listParquet(dir: String): Seq[java.io.File] =
    new java.io.File(dir).listFiles().toSeq
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))

  test("compactParquet merges a fragmented table, preserves rows, cleans up") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString + "/t"
    // 40 micro-batch-sized appends → 40+ small files
    (0 until 40).foreach { b =>
      Seq.tabulate(250)(i => (b * 250L + i, s"row-$b-$i"))
        .toDF("id", "payload")
        .coalesce(1).write.mode("append").parquet(dir)
    }
    val before = listParquet(dir)
    assert(before.size >= 40, s"fixture not fragmented: ${before.size} files")
    val bytes = Compaction.dataBytes(spark, dir)
    assert(bytes > 0)

    val target = bytes / 3 // expect ceil(3.x) = 3-4 files
    val written = Compaction.compactParquet(spark, dir, target)
    val after = listParquet(dir)
    assert(after.size == written, s"wrote $written but see ${after.size}")
    assert(after.size <= 4 && after.size < before.size / 5,
      s"not compacted: ${before.size} -> ${after.size}")

    // contents identical
    val got = spark.read.parquet(dir).as[(Long, String)].collect().toSet
    assert(got.size == 10000 && got.contains((9999L, "row-39-249")))

    // staging/backup directories are gone
    val parent = new java.io.File(dir).getParentFile.listFiles().map(_.getName).toSet
    assert(parent.forall(n => !n.contains("__compacting") && !n.contains("__precompact")),
      s"staging debris left: $parent")
  }

  test("targetFiles derivation and coalesceForWrite plan") {
    assert(Compaction.targetFiles(1, 128) == 1)
    assert(Compaction.targetFiles(129, 128) == 2)
    assert(Compaction.targetFiles(128L * 100, 128) == 100)
    intercept[IllegalArgumentException](Compaction.targetFiles(10, 0))
    // shrinking writes coalesce down to the derived file count
    val df = spark.range(1000).toDF("id").repartition(32)
    val planned = Compaction.coalesceForWrite(df, 1000, 100, 50000)
    assert(planned.rdd.getNumPartitions == 2)
  }
}
