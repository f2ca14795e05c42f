package graft.multimodal

import graft.SparkSuite

/** Afp.energyHash on REAL near-duplicate audio: the gain-changed /
  * re-encoded / resampled variants an audio-corpus pass must pair stay
  * within the Hamming-3 verify threshold, unrelated signals stay far,
  * and the banded blocking (DedupOps.phashPairs, shared with images)
  * returns exactly the brute-force pair set — exercised on signal
  * shapes the SQL oracle can't reach (the oracle query covers the
  * synthetic arithmetic path).
  */
class AfpSpec extends SparkSuite {

  /** Structured test signal: 65 frames of ~60 samples whose loudness
    * levels are a seeded md5 byte per frame — decisive adjacent-frame
    * comparisons (levels are ~uniform on [0,255], so most differ by far
    * more than round-trip noise), independent across seeds. */
  private def signal(seed: Int, n: Int = 3900): Array[Int] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val levels = Array.tabulate(Afp.Frames)(f =>
      md.digest(s"$seed|$f".getBytes("UTF-8"))(0) & 0xff)
    Array.tabulate(n) { i =>
      val f = ((i.toLong * Afp.Frames) / n).toInt
      val amp = levels(f) * 96 + (i * 37 % 97)
      if (i % 2 == 0) amp else -amp
    }
  }

  private def wav(samples: Array[Int], rate: Int = 16000): Array[Byte] =
    Multimodal.SyntheticAudio.pcm16(samples.length, rate)(samples(_))

  private def hashOf(bytes: Array[Byte]): (Long, Long) =
    Afp.energyHashBlob(bytes).getOrElse(fail("fixture blob did not decode"))

  test("energy hash: gain/re-encode/resample variants stay within Hamming 3; unrelated far") {
    val base = signal(seed = 7)
    val baseHash = hashOf(wav(base))
    def clip(x: Int) = math.max(-32768, math.min(32767, x))
    val variants = Map(
      // the WAV round trip itself is lossless: re-encoding is exact
      "reencode" -> hashOf(wav(base)),
      // uniform gain: all frame means scale together, order preserved up
      // to floor-division ties
      "gain_-6dB" -> hashOf(wav(base.map(s => s / 2))),
      "gain_+2dB" -> hashOf(wav(base.map(s => clip(s * 5 / 4)))),
      // header-only change: the fingerprint reads samples, not the rate
      "rate_8k_header" -> hashOf(wav(base, rate = 8000)),
      // crude 2:1 decimation: frame boundaries shift by <1 sample
      "downsample_2x" -> hashOf(wav(Array.tabulate(base.length / 2)(i => base(2 * i)))),
      // low-amplitude additive noise, well under the ~96-unit level gaps
      "dither_noise" -> hashOf(wav(base.zipWithIndex.map { case (s, i) =>
        clip(s + (if (s >= 0) 1 else -1) * (i * 13 % 7)) })))
    variants.foreach { case (name, hsh) =>
      val d = Afp.hamming(baseHash, hsh)
      assert(d <= 3, s"$name drifted to Hamming $d from the base")
    }
    (1 to 5).foreach { s =>
      val d = Afp.hamming(baseHash, hashOf(wav(signal(s))))
      assert(d > 10, s"unrelated seed $s landed at Hamming $d of the base")
    }
  }

  test("energy hash: non-audio, non-PCM16, and too-short blobs return None") {
    assert(Afp.energyHashBlob(Array[Byte](1, 2, 3, 4)).isEmpty)
    assert(Afp.energyHashBlob("RIFFxxxxWAVE".getBytes("US-ASCII")).isEmpty)
    // decodable 64-sample clip: one short of a loudness contour — None,
    // not a crash (the pipeline simply never pairs it)
    assert(Afp.energyHashBlob(wav(Array.tabulate(64)(i => i * 100))).isEmpty)
    assert(Afp.energyHashBlob(wav(Array.tabulate(65)(i => i * 100))).isDefined)
  }

  test("phashPairs on audio fingerprints equals the brute-force Hamming scan") {
    import spark.implicits._
    // 4 near-dup families (base + gain + decimated) + 8 unrelated singles
    val blobs: Seq[(Long, (Long, Long))] =
      (0 until 4).flatMap { fam =>
        val base = signal(seed = 100 + fam)
        Seq(
          (fam * 3L, hashOf(wav(base))),
          (fam * 3L + 1, hashOf(wav(base.map(_ / 2)))),
          (fam * 3L + 2, hashOf(wav(Array.tabulate(base.length / 2)(i => base(2 * i))))))
      } ++ (0 until 8).map(u => (100L + u, hashOf(wav(signal(200 + u)))))
    val expected = (for {
      (ia, ha) <- blobs; (ib, hb) <- blobs
      if ia < ib && Afp.hamming(ha, hb) <= 3
    } yield (ia, ib, Afp.hamming(ha, hb))).toSet
    assert(expected.size >= 4 * 2, s"planted families produced only $expected")
    val df = blobs.map { case (id, (hi, lo)) => (id, hi, lo) }.toDF("doc_id", "h_hi", "h_lo")
    val got = graft.queries.DedupOps.phashPairs(df, 3)
      .as[(Long, Long, Int)].collect().map(t => (t._1, t._2, t._3)).toSet
    assert(got == expected, s"banded=${got.size} brute=${expected.size}; diff=${got.diff(expected) ++ expected.diff(got)}")
  }

  test("SPI-direct WAV encode/decode is byte-identical to the AudioSystem entry points") {
    // the hot path resolves the JDK's WAVE reader/writer ONCE and calls
    // them directly (the AudioSystem facade takes a global synchronized
    // provider lock per call — measured 73 s of lock wait on a 32-thread
    // stage); this pins the direct path to the facade bit-for-bit
    val base = signal(seed = 42, n = 1300)
    val blob = wav(base) // SPI-direct writer
    val viaFacade = {
      val data = new Array[Byte](base.length * 2)
      base.indices.foreach { i =>
        data(2 * i) = (base(i) & 0xff).toByte
        data(2 * i + 1) = ((base(i) >> 8) & 0xff).toByte
      }
      val fmt = new javax.sound.sampled.AudioFormat(16000f, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, base.length.toLong)
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    assert(java.util.Arrays.equals(blob, viaFacade),
      "SPI-direct WAVE writer bytes diverge from AudioSystem.write")
    // decode side: the SPI-direct reader recovers the same samples the
    // facade does, and a non-audio blob still raises Unsupported
    val direct = Multimodal.Codec.decodeAudioSamples(blob).get
    val facadeIn = javax.sound.sampled.AudioSystem
      .getAudioInputStream(new java.io.ByteArrayInputStream(blob))
    val facadeBytes = facadeIn.readAllBytes()
    val facadeSamples = Array.tabulate(facadeBytes.length / 2)(i =>
      ((facadeBytes(2 * i) & 0xff) | (facadeBytes(2 * i + 1) << 8)).toShort.toInt)
    assert(direct.sameElements(facadeSamples),
      "SPI-direct decode samples diverge from AudioSystem.getAudioInputStream")
    assert(Multimodal.Codec.decodeAudio(1L, "RIFFxxxxWAVEjunk".getBytes("US-ASCII")).isEmpty,
      "undecodable RIFF/WAVE-sniffed blob must return None, not throw")
  }
}
