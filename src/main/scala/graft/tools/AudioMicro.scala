package graft.tools

import java.util.concurrent.atomic.AtomicLong

/** Micro-profile of the dedup_audio_fingerprint per-row pipeline outside
  * Spark, single- AND multi-threaded — the multi-thread leg reproduces
  * executor-stage lock contention (run_ms >> cpu_ms in graft.Explain) and
  * prints the monitor class the threads pile up on, via ThreadMXBean.
  * `runMain graft.tools.AudioMicro [nDocs] [threads]`.
  */
object AudioMicro {

  private def oneDoc(md: java.security.MessageDigest, id: Long): (Long, Long) = {
    val g = id / 3
    val v = (id % 3).toInt
    val n = (1040 + (g % 13) * 80).toInt
    val levels = Array.tabulate(graft.multimodal.Afp.Frames) { f =>
      md.digest(s"$g|$f".getBytes(java.nio.charset.StandardCharsets.UTF_8))(0) & 0xff
    }
    val blob = graft.multimodal.Multimodal.SyntheticAudio.pcm16(n, 16000) { i =>
      val f = ((i.toLong * graft.multimodal.Afp.Frames) / n).toInt
      val amp = levels(f) * 96 + (i * 37 % 97) + (if (f == 0) v * 512 else 0)
      if (i % 2 == 0) amp else -amp
    }
    graft.multimodal.Afp.energyHashBlob(blob).get
  }

  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 20000
    val threads = if (args.length > 1) args(1).toInt else 32
    // single-thread reference
    val md0 = java.security.MessageDigest.getInstance("MD5")
    (1 to 2).foreach { pass =>
      val t0 = System.nanoTime()
      var id = 0L
      while (id < 3000) { oneDoc(md0, id); id += 1 }
      println(f"1-thread pass $pass: ${(System.nanoTime() - t0) / 1e3 / 3000}%7.2f us/doc")
    }
    // multi-thread leg with a blocked-stack sampler
    val next = new AtomicLong(0)
    val done = new java.util.concurrent.CountDownLatch(threads)
    val workers = (0 until threads).map { _ =>
      new Thread(() => {
        val md = java.security.MessageDigest.getInstance("MD5")
        var id = next.getAndIncrement()
        while (id < n) { oneDoc(md, id); id = next.getAndIncrement() }
        done.countDown()
      })
    }
    val t0 = System.nanoTime()
    workers.foreach(_.start())
    // sample BLOCKED stacks while the workers run
    val samples = new java.util.HashMap[String, Integer]()
    while (done.getCount > 0) {
      Thread.sleep(20)
      workers.foreach { w =>
        if (w.getState == Thread.State.BLOCKED) {
          val st = w.getStackTrace
          if (st.nonEmpty) {
            val key = st.take(3).mkString(" <- ")
            samples.merge(key, 1, (a, b) => a + b)
          }
        }
      }
    }
    done.await()
    val wall = (System.nanoTime() - t0) / 1e6
    println(f"$threads-thread: $wall%9.1f ms for $n docs = ${wall * 1000 / n}%6.2f us/doc (ideal = 1-thread/$threads)")
    println("top BLOCKED stacks:")
    import scala.jdk.CollectionConverters._
    samples.asScala.toSeq.sortBy(-_._2).take(5).foreach { case (k, c) =>
      println(s"  x$c  $k")
    }
  }
}
