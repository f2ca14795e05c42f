package graft.tools

/** Micro-profile of the dedup_audio_fingerprint per-row pipeline,
  * outside Spark: where does the per-document time go — md5 levels,
  * PCM synthesis, the JavaSound WAV encode, or the JavaSound decode?
  * `runMain graft.tools.AudioMicro [nDocs]`.
  */
object AudioMicro {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 3000
    val md = java.security.MessageDigest.getInstance("MD5")
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e6}%9.1f ms  (${(System.nanoTime() - t0) / 1e3 / n}%7.2f us/doc)")
    }
    // warm-up + measured, two passes each
    (1 to 2).foreach { pass =>
      println(s"--- pass $pass (n=$n) ---")
      var blobs: Array[Array[Byte]] = null
      time("md5 levels (65/doc)") {
        var id = 0L
        while (id < n) {
          val g = id / 3
          var f = 0
          while (f < graft.multimodal.Afp.Frames) {
            md.digest(s"$g|$f".getBytes(java.nio.charset.StandardCharsets.UTF_8))
            f += 1
          }
          id += 1
        }
      }
      time("synth+encode (JavaSound)") {
        blobs = new Array[Array[Byte]](n)
        var id = 0L
        while (id < n) {
          val g = id / 3
          val v = (id % 3).toInt
          val nn = (1040 + (g % 13) * 80).toInt
          val levels = Array.tabulate(graft.multimodal.Afp.Frames) { f =>
            md.digest(s"$g|$f".getBytes(java.nio.charset.StandardCharsets.UTF_8))(0) & 0xff
          }
          blobs(id.toInt) = graft.multimodal.Multimodal.SyntheticAudio.pcm16(nn, 16000) { i =>
            val f = ((i.toLong * graft.multimodal.Afp.Frames) / nn).toInt
            val amp = levels(f) * 96 + (i * 37 % 97) + (if (f == 0) v * 512 else 0)
            if (i % 2 == 0) amp else -amp
          }
          id += 1
        }
      }
      time("decode+hash (JavaSound)") {
        var id = 0
        while (id < n) {
          graft.multimodal.Afp.energyHashBlob(blobs(id)).get
          id += 1
        }
      }
    }
  }
}
