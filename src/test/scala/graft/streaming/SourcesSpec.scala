package graft.streaming

import java.nio.file.{Files, Paths}

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** File-based source/sink surface (reference from_textfile/filenames,
  * sources.py:116-209; sink_to_textfile, sinks.py:76): new files in a
  * watched directory become events; the text sink writes exactly-once.
  */
class SourcesSpec extends SparkSuite {
  import spark.implicits._

  test("textDir: appended files stream through as lines; text sink round-trips") {
    val src = Files.createTempDirectory("graft_txt_src").toString
    val out = Files.createTempDirectory("graft_txt_out").toString
    val ckpt = Files.createTempDirectory("graft_txt_ckpt").toString

    Files.writeString(Paths.get(src, "a.txt"), "alpha\nbeta\n")
    val lines = Sources.textDir(spark, src)
      .select(upper($"value").as("value")) // a map over the line stream
    val q = Sinks.files(lines, "text", out, ckpt)
    q.processAllAvailable()
    // a new file appearing in the directory is picked up incrementally
    Files.writeString(Paths.get(src, "b.txt"), "gamma\n")
    q.processAllAvailable(); q.stop()

    val got = spark.read.text(out).as[String].collect().sorted
    assert(got.toSeq == Seq("ALPHA", "BETA", "GAMMA"))
  }
}
