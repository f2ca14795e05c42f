package graft.examples

import graft.Sessions
import graft.streaming.{GraftFrame, Sources}
import org.apache.spark.sql.functions._

/** The reference's canonical streaming demo
  * (examples/network_wordcount.py) re-expressed on this engine: watch a
  * directory of text files, split lines into words, keep a running count
  * per word (updating stream → update output mode).
  *
  * usage: graft.examples.StreamingWordCount <inputDir>
  * Prints the word-count table after each availability pass; exits 0 if
  * at least one word was counted.
  */
object StreamingWordCount {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(sys.error("usage: StreamingWordCount <dir>"))
    val spark = Sessions.local(cpus = "4", appName = "graft-wordcount")

    val lines = new GraftFrame(Sources.textDir(spark, dir))
    val counts = lines
      .assign("word", explode(split(col("value"), "\\s+")))
      .where(col("word") =!= "")
      .groupby("word").countAll()

    val q = counts.writeStream
      .format("memory").queryName("wordcounts").outputMode("complete").start()
    // poll until the directory has been drained twice (lets the caller add
    // files mid-run), then report
    (1 to 2).foreach { _ => Thread.sleep(2000); q.processAllAvailable() }
    q.stop()
    val result = spark.table("wordcounts").orderBy(desc("count"), asc("word"))
    result.show(10, truncate = false)
    val total = result.count()
    spark.stop()
    if (total == 0) sys.exit(1)
  }
}
