package graft.tools

import org.apache.spark.sql.functions._

import graft.{Bench, Sessions}
import graft.functions.TableLog

/** Measures [[graft.functions.TableLog.trackBloom]] on the shape it
  * exists for: a POINT LOOKUP on a column the write order does NOT
  * cluster, where per-file min/max spans everything and stats pruning
  * keeps every file. Two tables hold byte-identical rows (ids are a
  * multiplicative-hash permutation of the even numbers — every file
  * spans the full id range); one registered trackBloom(id) before the
  * data landed. Probe keys are ODD: absent from both tables but inside
  * every file's [min, max], so footer stats can never dismiss them —
  * any difference is the parquet bloom's row-group skip inside the
  * scan (executor-side, distributed; nothing driver-side changes).
  *
  * Two probe shapes per table: `count(*) WHERE id = k` (reads only the
  * id column) and `SELECT v WHERE id = k` (without the bloom the
  * surviving row groups decode the payload column too — the takedown
  * locate-pass shape, where the win compounds with width). One JSON
  * line. Args: [rows] (default 20,000,000). */
object BloomBench {
  def main(args: Array[String]): Unit = {
    val env = Bench.contentionEnv()
    val n = args.headOption.map(_.toLong).getOrElse(20000000L)
    val files = 16
    val probes = 10
    val spark = Sessions.local(appName = "graft-bloombench")
    import spark.implicits._

    val base = java.nio.file.Files.createTempDirectory("graft_bloombench")
    val plainDir = s"$base/plain"
    val bloomDir = s"$base/bloom"

    // ids: the even numbers 0..2n-2, each exactly once, scattered by a
    // multiplicative hash (K odd and not divisible by 5 => coprime with
    // n, so i -> i*K mod n is a bijection) — every file spans ~the full
    // range, the worst case for min/max pruning
    val K = 2654435761L
    def data() = spark.range(n)
      .select(((col("id") * K) % n) * 2 as "id",
        concat(lit("payload-"), col("id")) as "v")
      .repartition(files)

    // identical creation order: schema-seed commit, then (for the bloom
    // table) the registration, then the SAME append — so both tables
    // hold the same rows in the same file layout and differ ONLY in the
    // parquet blooms
    TableLog.appendBatch(data().limit(0), plainDir, "w", 0L)
    TableLog.appendBatch(data().limit(0), bloomDir, "w", 0L)
    TableLog.trackBloom(spark, bloomDir, Seq("id"))
    TableLog.appendBatch(data(), plainDir, "w", 1L)
    TableLog.appendBatch(data(), bloomDir, "w", 1L)

    // odd => absent but inside every [min, max]; fixed seed
    val keys = Array.tabulate(probes + 2)(i => (i.toLong * 2097143L + 1L) % (2 * n))
      .map(k => if (k % 2 == 0) k + 1 else k)

    def timeProbes(dir: String, shape: String): Double = {
      def probe(k: Long): Long = shape match {
        case "count" =>
          TableLog.read(spark, dir).where($"id" === k).count()
        case _ =>
          TableLog.read(spark, dir).where($"id" === k)
            .select($"v").collect().length.toLong
      }
      keys.take(2).foreach(probe) // warm (plans, footers, code cache)
      val t0 = System.nanoTime()
      val hits = keys.drop(2).map(probe).sum
      require(hits == 0L, s"probe keys must be absent, got $hits hits")
      (System.nanoTime() - t0) / 1e9
    }

    try {
      val plainCount = timeProbes(plainDir, "count")
      val bloomCount = timeProbes(bloomDir, "count")
      val plainSelect = timeProbes(plainDir, "select")
      val bloomSelect = timeProbes(bloomDir, "select")

      def f(d: Double) = f"$d%.3f"
      println(s"""{"bloom_count_probe_s":${f(bloomCount / probes)}""" +
        s""","plain_count_probe_s":${f(plainCount / probes)}""" +
        s""","count_speedup":${f(plainCount / bloomCount)}""" +
        s""","bloom_select_probe_s":${f(bloomSelect / probes)}""" +
        s""","plain_select_probe_s":${f(plainSelect / probes)}""" +
        s""","select_speedup":${f(plainSelect / bloomSelect)}""" +
        s""","rows":$n,"files":$files,"probes":$probes""" +
        s""","env":$env,"sf":"synthetic"}""")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(base.toFile)
    spark.stop()
  }
}
