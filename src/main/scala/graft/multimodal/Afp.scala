package graft.multimodal

/** Acoustic fingerprinting for near-duplicate audio detection — the
  * audio analogue of [[Phash]], completing the modality coverage of the
  * dedup family (text shingles/minhash/simhash/substring, embeddings,
  * image dHash, now decoded audio). Reference streamz has no audio ops;
  * this is pipeline surface a multimodal corpus pass needs.
  *
  * Energy dHash along TIME: split the PCM stream into 65 frames (frame
  * of sample i is `i*65/n`, the same floor-grid rule as Phash's cells),
  * take each frame's mean |amplitude|, and emit one bit per adjacent
  * frame pair (bit = later frame louder) — 64 bits. The loudness
  * CONTOUR survives what audio pipelines meet in the wild — re-encoding
  * the container, uniform gain changes (all frame means scale together,
  * only ~equal pairs can flip), resampling — while unrelated signals
  * give independent coin-flip bits; AfpSpec pins each of these on real
  * WAV round trips.
  *
  * Everything is INTEGER math on a fixed traversal (frame mean = floor
  * of sum/count over |sample|), so the hash is bit-identical on any JVM
  * and recomputable in SQL — which is what lets the oracle check
  * `dedup_audio_fingerprint` end-to-end. The 64-bit hash is returned as
  * two unsigned-32-bit halves in longs, the exact [[Phash]] contract,
  * so the banded Hamming pair join (`DedupOps.phashPairs`) — band on
  * the four 16-bit words, verify exact Hamming, provably complete for
  * distance ≤ 3 by pigeonhole — is shared unchanged across modalities.
  */
object Afp {

  /** Frame count: 65 frame energies → 64 comparison bits. */
  val Frames = 65

  /** Energy dHash of a decoded sample array as (hi, lo): bit k is 1 iff
    * mean|frame k+1| > mean|frame k|; bits 0..31 in `lo`, 32..63 in
    * `hi`, both in [0, 2^32). Needs at least 65 samples. */
  def energyHash(samples: Array[Int]): (Long, Long) = {
    val n = samples.length
    require(n >= Frames, s"energy hash needs >= $Frames samples, got $n")
    val sums = new Array[Long](Frames)
    val counts = new Array[Long](Frames)
    var i = 0
    while (i < n) {
      val f = ((i.toLong * Frames) / n).toInt
      sums(f) += math.abs(samples(i).toLong)
      counts(f) += 1
      i += 1
    }
    var hi = 0L
    var lo = 0L
    var k = 0
    while (k < Frames - 1) {
      val a = sums(k) / counts(k)
      val b = sums(k + 1) / counts(k + 1)
      if (b > a) {
        if (k < 32) lo |= 1L << k else hi |= 1L << (k - 32)
      }
      k += 1
    }
    (hi, lo)
  }

  /** Fingerprint of an encoded WAV blob via the real JavaSound decode
    * (PCM_SIGNED 16-bit LE), or None when the blob is not decodable
    * audio OR carries fewer than 65 samples (a ~4 ms clip has no
    * loudness contour to hash and must not crash the pipeline — it
    * simply never pairs). */
  def energyHashBlob(bytes: Array[Byte]): Option[(Long, Long)] =
    Multimodal.Codec.decodeAudioSamples(bytes)
      .filter(_.length >= Frames).map(energyHash)

  /** Hamming distance between two (hi, lo) fingerprints. */
  def hamming(a: (Long, Long), b: (Long, Long)): Int =
    java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)
}
