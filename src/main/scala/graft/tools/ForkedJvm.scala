package graft.tools

/** Spawn a sibling JVM running one of this project's mains — the
  * harness behind the CROSS-PROCESS multi-writer proofs
  * (CrossProcessSpec, `MwBench --fork`). Every TableLog concurrency
  * spec used to exercise threads of one JVM, where the group-commit
  * queue and the Rename store's mutex statics are shared; a forked
  * child shares NOTHING but the table directory and the commit store's
  * atomic primitive, which is exactly the production multi-writer
  * claim.
  *
  * The child inherits this JVM's classpath and `--add-opens` flags
  * (Spark 4 on JDK 17 needs them outside spark-submit), a bounded heap
  * (several children must fit beside the parent), and the parent's
  * stdio so failures surface in the calling log. */
object ForkedJvm {

  /** The `--add-opens`/`--add-exports` pairs this JVM was started with,
    * re-usable verbatim on a child. */
  private def moduleFlags: Seq[String] = {
    import scala.jdk.CollectionConverters._
    val in = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.toVector
    in.zipWithIndex.flatMap {
      case (f, i) if f == "--add-opens" || f == "--add-exports" =>
        Seq(f, in(i + 1))
      case (f, _) if f.startsWith("--add-opens=") ||
          f.startsWith("--add-exports=") => Seq(f)
      case _ => Nil
    }
  }

  /** Launch `mainClass` with `args` in a fresh JVM; returns the running
    * process (caller waits and checks the exit code). */
  def spawn(mainClass: String, args: Seq[String],
            heap: String = "1800m"): Process = {
    val javaBin = java.nio.file.Paths
      .get(System.getProperty("java.home"), "bin", "java").toString
    val cmd = Seq(javaBin) ++ moduleFlags ++ Seq(
      s"-Xmx$heap",
      "-Dspark.ui.enabled=false",
      "-cp", System.getProperty("java.class.path"),
      mainClass) ++ args
    new ProcessBuilder(cmd: _*).inheritIO().start()
  }
}
