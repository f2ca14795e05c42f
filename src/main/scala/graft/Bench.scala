package graft

/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Results are fully materialized through a noop
  * write (a bare .count() would let Catalyst prune most of the plan).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(appName = "graft-bench")
    // warm the JVM + parquet footers once per input table (codegen,
    // classloading and footer reads are session-level costs, not
    // per-query costs — the measured numbers are steady-state):
    // lineitem, events, documents, embeddings, orders+customer,
    // nation+region, part
    // when SPARK_GRAFT_BENCH_ONLY narrows the run, warm up with the
    // selected queries themselves instead of the full-suite warm list —
    // otherwise single-query iteration still pays three full-data joins
    val warmList = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSeq)
      .getOrElse(Seq("q1_agg", "filter_where", "multimodal_meta", "embed_norm",
        "join_inner_agg", "join_multiway", "join_semi"))
    warmList.foreach { q =>
      try SparkEntry.queries(q)(spark, sfDir).write
        .format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        // a warm-up-only failure must stay visible (stderr, not the JSON
        // line): the measured loop below would re-report a persistent one,
        // but e.g. an OOM that poisons the session would otherwise hide
        System.err.println(s"[bench] warm-up '$q' failed: $e")
      }
    }
    // A failed query reports -1 (never a small elapsed time that would be
    // indistinguishable from success) and lands in the "errors" array.
    // SPARK_GRAFT_BENCH_ONLY=q1,q2 restricts the run (fast iteration on
    // one query); the driver never sets it, so official runs are complete.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = only.fold(SparkEntry.queries)(f =>
      SparkEntry.queries.filter { case (k, _) => f(k) })
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (name, (System.nanoTime() - t0) / 1e9, None: Option[String])
      } catch {
        case e: Throwable =>
          (name, -1.0, Some(Option(e.getMessage).getOrElse(e.getClass.getName)))
      }
    }
    val qs = results.map { case (k, v, _) => "\"" + k + f"""\":$v%.3f""" }
      .mkString("{", ",", "}")
    // truncate BEFORE escaping — truncating after could split an escape
    // pair and leave a dangling backslash that corrupts the JSON line
    def jstr(s: String): String =
      "\"" + s.take(300).flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"
        case c if c < ' ' => " "; case c => c.toString
      } + "\""
    val errs = results.collect { case (k, _, Some(msg)) =>
      s"""{"query":${jstr(k)},"error":${jstr(msg)}}"""
    }.mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
