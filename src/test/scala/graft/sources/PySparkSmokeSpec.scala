package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Executes `tools/pyspark_smoke.py` — the "a Python-only operator
  * needs no Scala" claim as a real subprocess artifact: a stock pyspark
  * session (graft classes on the driver classpath, GraftExtensions as
  * the SQL extension, a GraftCatalog registered) drives ingest →
  * mergeSchema evolve → GRAFT DELETE/UPSERT → change feed → time
  * travel → named-catalog maintenance → native SQL kernels, asserting
  * at every step. Gated on a matching pyspark being importable (the
  * classes are compiled against this Spark; a different pyspark would
  * test binary compatibility, not this library), cancelled otherwise. */
class PySparkSmokeSpec extends AnyFunSuite {

  private def pysparkVersion: Option[String] =
    try {
      val p = new ProcessBuilder("python3", "-c",
        "import pyspark; print(pyspark.__version__)")
        .redirectErrorStream(true).start()
      val out = new String(p.getInputStream.readAllBytes()).trim
      if (p.waitFor() == 0) Some(out) else None
    } catch { case _: Exception => None }

  test("the pyspark smoke drives every Python-reachable surface end-to-end") {
    val sparkVersion = org.apache.spark.SPARK_VERSION
    val py = pysparkVersion
    assume(py.contains(sparkVersion),
      s"needs pyspark $sparkVersion importable from python3 (got $py)")
    val classes = new java.io.File("target/scala-2.13/classes")
    assume(classes.isDirectory, "compiled classes not on disk")
    val p = new ProcessBuilder("python3", "tools/pyspark_smoke.py",
      classes.getAbsolutePath).redirectErrorStream(true).start()
    val out = new String(p.getInputStream.readAllBytes())
    assert(p.waitFor() == 0 && out.contains("PYSPARK_SMOKE_OK"),
      s"pyspark smoke failed:\n${out.takeRight(4000)}")
  }
}
