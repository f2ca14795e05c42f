package graft.sources

import java.io.{BufferedReader, InputStreamReader}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** streamz `from_process` (sources.py:332-388): spawn an external process
  * and stream its stdout, one event per line (the reference reads to `\n`;
  * `with_end` also emits a trailing unterminated fragment — BufferedReader's
  * readLine gives both behaviors).
  *
  * Options: `cmd` (required; run via `sh -c`, matching the reference's
  * string form, which shlex-splits), `withStderr` (default false — merge
  * stderr into the stream, the reference's `with_stderr`),
  * `numPartitions` (default 1).
  *
  * ```scala
  * spark.readStream
  *   .format(classOf[graft.sources.ProcessSourceProvider].getName)
  *   .option("cmd", "ping localhost")
  *   .load()
  * ```
  *
  * The subprocess runs on the DRIVER (see [[PushSource]] for the
  * contract); when it exits, the stream simply stops producing new rows,
  * like the reference's `stopped` flag.
  */
class ProcessSourceProvider extends PushTableProvider {
  override protected def sourceName: String = "graft-process"

  override protected def buildStream(options: CaseInsensitiveStringMap): PushMicroBatchStream = {
    val cmd = Option(options.get("cmd"))
      .getOrElse(throw new IllegalArgumentException("graft-process source requires option 'cmd'"))
    val withStderr = Option(options.get("withstderr")).exists(_.toBoolean)
    val parts = Option(options.get("numpartitions")).map(_.toInt).getOrElse(1)

    new PushMicroBatchStream(parts) {
      private var process: Process = _
      private var reader: Thread = _

      override protected def startFeeder(): Unit = {
        val pb = new ProcessBuilder("sh", "-c", cmd)
        pb.redirectErrorStream(withStderr)
        process = pb.start()
        reader = new Thread(() => {
          val in = new BufferedReader(new InputStreamReader(
            process.getInputStream, StandardCharsets.UTF_8))
          try {
            var line = in.readLine()
            while (line != null) { push(line); line = in.readLine() }
          } catch { case _: InterruptedException | _: java.io.IOException => () }
          finally in.close()
        }, "graft-process-feeder")
        reader.setDaemon(true)
        reader.start()
      }

      override protected def stopFeeder(): Unit = {
        if (process != null && process.isAlive) process.destroy()
        if (reader != null) reader.join(2000)
      }
    }
  }
}
