package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video travel as opaque `binary`
  * columns with typed metadata; decode / feature-extract / frame-sample run
  * partition-at-a-time so codec setup cost is amortized across a batch and
  * the plan stays narrow — no shuffle anywhere in this module.
  *
  * The image, audio and video paths are REAL: [[Codec.decodeImage]] sniffs
  * the container by magic bytes and decodes PNG/BMP/GIF/JPEG rasters with
  * the JDK's `javax.imageio`; [[Codec.decodeAudio]] parses RIFF/WAVE PCM
  * with JavaSound; [[Codec.demuxAvi]] walks a RIFF/AVI chunk tree and
  * feeds each MJPEG frame payload back through the JPEG image path (all
  * pure JDK, no external dependency). Only unknown containers (e.g. MP4 —
  * no JDK codec exists) fall back to a clearly-marked deterministic fake
  * (same bytes → same "decode" on any executor — required for
  * retry/speculation safety); a real deployment swaps that branch for
  * ffmpeg bindings etc. and everything downstream is unchanged.
  */
object Multimodal {

  // In-memory ImageIO stream cache: the default (useCache=true) backs every
  // ImageInputStream/ImageOutputStream with a TEMP FILE on disk — one file
  // create+write+delete per encode and per decode, paid per row (and per
  // FRAME on the MJPEG paths). All blobs here are in-memory byte arrays, so
  // the disk cache buys nothing; MemoryCache keeps the whole codec path
  // heap-only. JVM-global, idempotent, pixel-identical output.
  ImageIO.setUseCache(false)

  /** Typed metadata carried alongside a media blob. */
  case class MediaMeta(docId: Long, nBytes: Long, width: Int, height: Int, frames: Int)

  /** One sampled frame's feature vector. */
  case class FrameFeatures(docId: Long, frameIdx: Int, features: Array[Float])

  /** Raster-level facts recovered by a real image decode. Pixel values are
    * band-0 samples (gray level for grayscale images), which avoids any
    * color-space conversion and is exact for lossless containers.
    */
  case class ImagePixels(docId: Long, width: Int, height: Int, format: String,
      pxTopLeft: Int, pxBottomRight: Int, pxSum: Long)

  /** PCM facts recovered by a real audio decode — the audio analogue of
    * [[ImagePixels]]: container-level format plus sample-level values
    * that any stride/endianness/sign error would corrupt. */
  case class AudioPcm(docId: Long, sampleRate: Int, channels: Int, bits: Int,
      nSamples: Long, firstSample: Int, lastSample: Int, absSum: Long)

  /** Frame/raster facts recovered by a real video decode — the video
    * analogue of [[ImagePixels]]: any demux error (frame boundary, order,
    * count, header stride) corrupts at least one of these. Gray values
    * are band-0 samples of the decoded frames. */
  case class VideoPixels(docId: Long, width: Int, height: Int, nFrames: Int,
      firstGray: Int, lastGray: Int, pxSum: Long)

  /** The codec boundary: real `javax.imageio` for image containers, real
    * `javax.sound.sampled` for WAV audio, the deterministic fake for
    * everything else.
    */
  object Codec {

    /** The JDK's registered audio file readers, resolved ONCE. Every
      * `AudioSystem.getAudioInputStream` call funnels through a GLOBAL
      * `synchronized` provider lookup (JDK13Services), which serializes
      * all executor threads of a wide mapPartitions stage — measured 73 s
      * of lock wait against 4 s of CPU on a 32-thread audio-dedup stage.
      * Iterating the same SPI providers directly (the identical decoder
      * classes JavaSound itself dispatches to, in ServiceLoader order)
      * is lock-free after this one materialization. */
    private val audioReaders: List[javax.sound.sampled.spi.AudioFileReader] = {
      val it = java.util.ServiceLoader
        .load(classOf[javax.sound.sampled.spi.AudioFileReader]).iterator()
      val b = List.newBuilder[javax.sound.sampled.spi.AudioFileReader]
      while (it.hasNext) b += it.next()
      b.result()
    }

    private def hasMagic(b: Array[Byte], off: Int, magic: String): Boolean =
      b.length >= off + magic.length &&
        magic.indices.forall(i => b(off + i) == magic.charAt(i).toByte)

    /** Per-KNOWN-JDK-reader magic gates: each predicate is a SUPERSET of
      * that reader's accept domain (every one of these readers begins by
      * reading exactly this magic and throwing
      * UnsupportedAudioFileException on mismatch), so skipping a reader
      * whose gate fails can never change which provider accepts — it only
      * skips a guaranteed reject. Two rejects are worth skipping: the
      * MIDI-synthesizer-backed reader's reject path re-resolves MIDI
      * providers through the uncached globally synchronized JDK13Services
      * registry (thread-dump-verified: 6.6k blocked samples on that
      * monitor in a 32-thread stage — and it sits BEFORE the WAVE readers
      * in ServiceLoader order), and every reject costs an exception
      * construction on the per-document hot path. Unknown (third-party)
      * readers have no gate and are always consulted, in order. */
    private val KnownMagicGates: Map[String, Array[Byte] => Boolean] = Map(
      "com.sun.media.sound.AiffFileReader" ->
        ((b: Array[Byte]) => hasMagic(b, 0, "FORM")),
      "com.sun.media.sound.AuFileReader" ->
        ((b: Array[Byte]) => hasMagic(b, 0, ".snd") || hasMagic(b, 0, "dns.")),
      "com.sun.media.sound.SoftMidiAudioFileReader" ->
        ((b: Array[Byte]) => hasMagic(b, 0, "MThd") ||
          (hasMagic(b, 0, "RIFF") && hasMagic(b, 8, "RMID"))),
      "com.sun.media.sound.WaveFileReader" ->
        ((b: Array[Byte]) => hasMagic(b, 0, "RIFF")),
      "com.sun.media.sound.WaveFloatFileReader" ->
        ((b: Array[Byte]) => hasMagic(b, 0, "RIFF")),
      "com.sun.media.sound.WaveExtensibleFileReader" ->
        ((b: Array[Byte]) => hasMagic(b, 0, "RIFF")))

    /** [[javax.sound.sampled.AudioSystem.getAudioInputStream]] semantics —
      * first provider that does not reject the stream wins — minus the
      * per-call global registry lock (see [[audioReaders]]). The trial
      * order is the FIXED ServiceLoader order (exactly AudioSystem's), so
      * the provider choice matches AudioSystem even if third-party SPI
      * jars register overlapping readers (the r17 move-to-front reorder
      * could not guarantee that — ADVICE r17). Known JDK readers whose
      * magic gate fails are skipped — a provable no-op per
      * [[KnownMagicGates]]. */
    private[multimodal] def audioInputStream(
        bytes: Array[Byte]): javax.sound.sampled.AudioInputStream = {
      val in = new ByteArrayInputStream(bytes)
      var rest = audioReaders
      while (rest.nonEmpty) {
        val r = rest.head
        if (KnownMagicGates.get(r.getClass.getName).forall(_(bytes))) {
          try return r.getAudioInputStream(in)
          catch {
            case _: javax.sound.sampled.UnsupportedAudioFileException =>
              in.reset() // the contract: a rejecting reader restores position
          }
        }
        rest = rest.tail
      }
      throw new javax.sound.sampled.UnsupportedAudioFileException(
        "Stream of unsupported format")
    }

    /** Container sniff by magic bytes — cheap enough to run per row, and it
      * keeps non-image blobs (the common case in a mixed corpus) from ever
      * paying ImageIO reader discovery.
      */
    def imageFormat(bytes: Array[Byte]): Option[String] = {
      def at(i: Int, v: Int): Boolean = (bytes(i) & 0xff) == v
      if (bytes.length < 8) None
      else if (at(0, 0x89) && at(1, 'P') && at(2, 'N') && at(3, 'G')) Some("png")
      else if (at(0, 'B') && at(1, 'M')) Some("bmp")
      else if (at(0, 'G') && at(1, 'I') && at(2, 'F') && at(3, '8')) Some("gif")
      else if (at(0, 0xff) && at(1, 0xd8) && at(2, 0xff)) Some("jpeg")
      else None
    }

    private def readImage(bytes: Array[Byte]): Option[(String, BufferedImage)] =
      imageFormat(bytes).flatMap { fmt =>
        // ImageIO.read returns null (not an exception) on undecodable input
        Option(ImageIO.read(new ByteArrayInputStream(bytes))).map(fmt -> _)
      }

    /** ALL stored frames of an image container — the real multi-frame
      * ("video-style") path: GIF animations yield every frame via the
      * ImageIO sequence reader, single-frame containers yield one. Frames
      * are the STORED rasters (no disposal-method compositing — the right
      * granularity for feature sampling, where each stored delta is a
      * signal in its own right). */
    private def readFrames(bytes: Array[Byte]): Option[(String, Vector[BufferedImage])] =
      imageFormat(bytes).flatMap { fmt =>
        val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
        try {
          val readers = ImageIO.getImageReaders(iis)
          if (!readers.hasNext) None
          else {
            val r = readers.next()
            r.setInput(iis)
            try {
              val n = math.max(r.getNumImages(true), 1)
              Some(fmt -> Vector.tabulate(n)(r.read))
            } finally r.dispose()
          }
        } catch { case _: javax.imageio.IIOException => None }
        finally iis.close()
      }

    /** Mean band-0 level of 8 horizontal stripes, scaled to [0,1] —
      * shared by the single- and multi-frame feature paths. Palette-based
      * rasters (GIF) are rendered to 8-bit gray first, so features are
      * gray levels, not palette indices. */
    private def stripeFeatures(img0: BufferedImage): Array[Float] = {
      val img =
        if (img0.getType == BufferedImage.TYPE_BYTE_GRAY) img0
        else {
          val g = new BufferedImage(img0.getWidth, img0.getHeight,
            BufferedImage.TYPE_BYTE_GRAY)
          val gr = g.createGraphics()
          gr.drawImage(img0, 0, 0, null)
          gr.dispose()
          g
        }
      val r = img.getRaster
      val dim = 8
      val feats = new Array[Float](dim)
      val h = img.getHeight
      var y = 0
      while (y < h) {
        var x = 0
        var rowSum = 0L
        while (x < img.getWidth) { rowSum += r.getSample(x, y, 0); x += 1 }
        feats(y * dim / h) += rowSum.toFloat
        y += 1
      }
      val norm = 255f * img.getWidth * math.max(h / dim, 1)
      var j = 0
      while (j < dim) { feats(j) /= norm; j += 1 }
      feats
    }

    /** REAL decode: parse the blob with `javax.imageio` and return raster
      * facts, or None when the blob is not a decodable image. Deterministic
      * and engine-independent for lossless containers (PNG/BMP/GIF): the
      * samples are the encoded samples.
      */
    def decodeImage(docId: Long, bytes: Array[Byte]): Option[ImagePixels] =
      readImage(bytes).map { case (fmt, img) =>
        val r = img.getRaster
        val (w, h) = (img.getWidth, img.getHeight)
        var sum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { sum += r.getSample(x, y, 0); x += 1 }
          y += 1
        }
        ImagePixels(docId, w, h, fmt,
          r.getSample(0, 0, 0), r.getSample(w - 1, h - 1, 0), sum)
      }

    /** Container sniff for RIFF/WAVE audio. */
    def audioFormat(bytes: Array[Byte]): Option[String] =
      if (bytes.length >= 12 &&
        bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
        bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E')
        Some("wav")
      else None

    /** REAL audio decode: parse a WAV blob with the JDK's JavaSound
      * (`javax.sound.sampled`, no external dependency) and return PCM
      * facts. Supports the signed-16-bit case every PCM pipeline starts
      * from; other encodings return None (caller falls back to the fake).
      * Lossless container → deterministic, engine-independent samples.
      */
    def decodeAudio(docId: Long, bytes: Array[Byte]): Option[AudioPcm] =
      audioFormat(bytes).flatMap { _ =>
        try {
          val in = audioInputStream(bytes)
          try {
            val f = in.getFormat
            val ok = f.getEncoding ==
              javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
              f.getSampleSizeInBits == 16 && !f.isBigEndian
            if (!ok) None
            else {
              val data = in.readAllBytes()
              val n = data.length / 2
              var absSum = 0L
              var first = 0
              var last = 0
              var i = 0
              while (i < n) {
                val s = ((data(2 * i) & 0xff) | (data(2 * i + 1) << 8)).toShort.toInt
                if (i == 0) first = s
                last = s
                absSum += math.abs(s)
                i += 1
              }
              Some(AudioPcm(docId, f.getSampleRate.toInt, f.getChannels, 16,
                n / f.getChannels, first, last, absSum))
            }
          } finally in.close()
        } catch {
          case _: javax.sound.sampled.UnsupportedAudioFileException => None
        }
      }

    /** REAL audio decode to the raw interleaved sample array — the
      * sample-level sibling of [[decodeAudio]], for consumers that need
      * the signal itself (acoustic fingerprinting, [[Afp]]) rather than
      * summary facts. Same support envelope: PCM_SIGNED 16-bit
      * little-endian; anything else returns None. */
    def decodeAudioSamples(bytes: Array[Byte]): Option[Array[Int]] =
      audioFormat(bytes).flatMap { _ =>
        try {
          val in = audioInputStream(bytes)
          try {
            val f = in.getFormat
            val ok = f.getEncoding ==
              javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
              f.getSampleSizeInBits == 16 && !f.isBigEndian
            if (!ok) None
            else {
              val data = in.readAllBytes()
              val out = new Array[Int](data.length / 2)
              var i = 0
              while (i < out.length) {
                out(i) = ((data(2 * i) & 0xff) | (data(2 * i + 1) << 8)).toShort.toInt
                i += 1
              }
              Some(out)
            }
          } finally in.close()
        } catch {
          case _: javax.sound.sampled.UnsupportedAudioFileException => None
        }
      }

    /** Container sniff for RIFF/AVI video. */
    def videoFormat(bytes: Array[Byte]): Option[String] =
      if (bytes.length >= 12 &&
        bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
        bytes(8) == 'A' && bytes(9) == 'V' && bytes(10) == 'I' && bytes(11) == ' ')
        Some("avi")
      else None

    private def leInt(b: Array[Byte], off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
        ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

    /** Pure-JDK MJPEG-in-AVI demux: walk the RIFF chunk tree, recover the
      * stream dims from the `strf` BITMAPINFOHEADER and every video-frame
      * payload (`??dc`/`??db` chunks of the `movi` list — storage order IS
      * presentation order for MJPEG). Payloads are NOT decoded here; the
      * caller feeds them back through the JPEG image path (MJPEG is
      * exactly one JPEG per frame). Returns None unless the blob is a
      * well-formed AVI with at least one frame payload. */
    def demuxAvi(bytes: Array[Byte]): Option[(Int, Int, Vector[Array[Byte]])] =
      videoFormat(bytes).flatMap { _ =>
        var width = 0
        var height = 0
        // a torn chunk ANYWHERE voids the whole blob: "well-formed AVI"
        // is the contract, and returning the frames collected before the
        // tear would silently publish partial decode facts for a
        // truncated upload instead of falling back (shared across the
        // recursion so a tear inside a nested LIST also voids it)
        var torn = false
        // fccType of the most recent 'strh' seen while inside a 'strl'
        // list: a stream's 'strf' is WAVEFORMATEX for audio streams and
        // BITMAPINFOHEADER only for 'vids', so dims must come from a
        // video stream's strf (an audio-first AVI would otherwise yield
        // garbage width/height)
        var strhType = ""
        val frames = Vector.newBuilder[Array[Byte]]
        def walk(start: Int, end: Int, inMovi: Boolean, inStrl: Boolean): Unit = {
          var p = start
          while (!torn && p + 8 <= end) {
            val four = new String(bytes, p, 4, java.nio.charset.StandardCharsets.US_ASCII)
            val size = leInt(bytes, p + 4)
            if (size < 0 || p + 8 + size > end) torn = true // torn chunk
            else {
              if (four == "LIST" && size >= 4) {
                val kind = new String(bytes, p + 8, 4,
                  java.nio.charset.StandardCharsets.US_ASCII)
                if (kind == "strl") strhType = "" // each strl re-declares its type
                walk(p + 12, p + 8 + size, inMovi || kind == "movi", inStrl || kind == "strl")
              } else if (inStrl && four == "strh" && size >= 4) {
                strhType = new String(bytes, p + 8, 4,
                  java.nio.charset.StandardCharsets.US_ASCII)
              } else if (inStrl && strhType == "vids" && four == "strf" && size >= 12 && width == 0) {
                // BITMAPINFOHEADER: biWidth at +4, biHeight at +8 (LE; height
                // may be negative = top-down in the DIB convention)
                width = leInt(bytes, p + 8 + 4)
                height = math.abs(leInt(bytes, p + 8 + 8))
              } else if (inMovi && size > 0 && (four.endsWith("dc") || four.endsWith("db"))) {
                frames += java.util.Arrays.copyOfRange(bytes, p + 8, p + 8 + size)
              }
              p += 8 + size + (size & 1) // RIFF chunks are word-aligned
            }
          }
        }
        // bound the walk at the RIFF-DECLARED extent, not the blob end:
        // trailing junk after a complete RIFF payload does not make the
        // AVI malformed (a spec reader never looks past the declared
        // size), while a declared size beyond the blob is a truncation
        val declaredEnd = 8L + (leInt(bytes, 4) & 0xffffffffL)
        if (declaredEnd > bytes.length) torn = true
        else walk(12, declaredEnd.toInt, inMovi = false, inStrl = false)
        val fs = frames.result()
        if (torn || fs.isEmpty) None else Some((width, height, fs))
      }

    /** Decoded frames of an MJPEG AVI, or None when the blob is not AVI
      * or any frame payload fails the JPEG decode (caller falls back). */
    private def readAviFrames(bytes: Array[Byte]): Option[Vector[BufferedImage]] =
      demuxAvi(bytes).flatMap { case (_, _, payloads) =>
        val imgs = payloads.map(p =>
          Option(ImageIO.read(new ByteArrayInputStream(p))))
        if (imgs.exists(_.isEmpty)) None else Some(imgs.map(_.get))
      }

    /** REAL video decode: demux the AVI, JPEG-decode every frame, return
      * frame/raster facts (see [[VideoPixels]]). */
    def decodeVideo(docId: Long, bytes: Array[Byte]): Option[VideoPixels] =
      readAviFrames(bytes).map { frames =>
        val first = frames.head
        var pxSum = 0L
        frames.foreach { img =>
          val r = img.getRaster
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) { pxSum += r.getSample(x, y, 0); x += 1 }
            y += 1
          }
        }
        VideoPixels(docId, first.getWidth, first.getHeight, frames.size,
          frames.head.getRaster.getSample(0, 0, 0),
          frames.last.getRaster.getSample(0, 0, 0), pxSum)
      }

    /** Metadata + per-frame features. Image containers take the real path
      * — ALL stored frames, so animated GIFs behave like short videos
      * (meta.frames = real frame count, one feature row per frame;
      * features = mean gray level of 8 horizontal stripes in [0,1]);
      * MJPEG AVIs demux and take the same real frame path; anything else
      * takes the deterministic fake.
      */
    def decode(docId: Long, bytes: Array[Byte]): (MediaMeta, Iterator[FrameFeatures]) =
      readFrames(bytes).map(_._2).orElse(readAviFrames(bytes)) match {
        case Some(frames) =>
          val first = frames.head
          val meta = MediaMeta(docId, bytes.length.toLong,
            first.getWidth, first.getHeight, frames.size)
          (meta, frames.iterator.zipWithIndex.map { case (img, f) =>
            FrameFeatures(docId, f, stripeFeatures(img))
          })
        case None => fakeDecode(docId, bytes)
      }

    /** Deterministic FAKE decode for containers with no JDK codec (e.g.
      * MP4/MKV video): metadata derived from the byte length
      * (matching the `multimodal_meta` oracle query) and per-frame features
      * from a rolling byte hash. Replace with real bindings in deployment.
      */
    private[multimodal] def fakeDecode(
        docId: Long, bytes: Array[Byte]): (MediaMeta, Iterator[FrameFeatures]) = {
      val n = bytes.length.toLong
      val meta = MediaMeta(docId, n,
        width = (16 + n % 64).toInt, height = (16 + n % 48).toInt,
        frames = (1 + n % 8).toInt)
      val frames = Iterator.tabulate(meta.frames) { f =>
        // rolling-hash features over a frame-specific byte stride
        val dim = 8
        val feats = new Array[Float](dim)
        var h = 1125899906842597L * (f + 1)
        var i = f
        while (i < bytes.length) {
          h = h * 31 + (bytes(i) & 0xff)
          feats(i % dim) += ((h >>> 40) & 0xff).toFloat / 255f
          i += meta.frames
        }
        FrameFeatures(docId, f, feats)
      }
      (meta, frames)
    }
  }

  /** Deterministic synthetic images for fixtures and pipeline smoke tests:
    * encode a real container from a pixel function, so decode paths can be
    * verified end-to-end without binary fixtures in the repo.
    */
  object SyntheticImages {

    /** Animated grayscale GIF — real multi-frame container for the
      * frame-sampling path. `pixel(x, y, frame)` must return 0..255
      * (use few distinct levels: GIF palettizes, and ImageIO preserves
      * exact gray levels for small palettes). */
    def animatedGray(w: Int, h: Int, nFrames: Int)(
        pixel: (Int, Int, Int) => Int): Array[Byte] = {
      require(w >= 1 && h >= 1 && nFrames >= 1, s"bad dims: ${w}x$h x$nFrames")
      val writer = ImageIO.getImageWritersByFormatName("gif").next()
      val out = new ByteArrayOutputStream()
      val ios = ImageIO.createImageOutputStream(out)
      try {
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        var f = 0
        while (f < nFrames) {
          val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
          val r = img.getRaster
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { r.setSample(x, y, 0, pixel(x, y, f) & 0xff); x += 1 }
            y += 1
          }
          writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
          f += 1
        }
        writer.endWriteSequence()
      } finally { writer.dispose(); ios.close() }
      out.toByteArray
    }

    /** 8-bit grayscale image encoded with the JDK writer for `format`
      * ("png" and "bmp" are lossless for TYPE_BYTE_GRAY; PNG is the safe
      * default). `pixel(x, y)` must return 0..255.
      */
    def gray(w: Int, h: Int, format: String = "png")(pixel: (Int, Int) => Int): Array[Byte] = {
      require(w >= 1 && h >= 1, s"image dims must be >= 1: ${w}x$h")
      val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
      val r = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { r.setSample(x, y, 0, pixel(x, y) & 0xff); x += 1 }
        y += 1
      }
      val out = new ByteArrayOutputStream()
      require(ImageIO.write(img, format, out), s"no JDK writer for format $format")
      out.toByteArray
    }
  }

  /** Deterministic synthetic WAV clips, symmetric with [[SyntheticImages]]:
    * encode real RIFF/WAVE PCM with the JDK writer from a sample function,
    * so the audio decode path verifies end-to-end without binary fixtures.
    */
  object SyntheticAudio {

    /** The JDK's WAVE writer, resolved ONCE — `AudioSystem.write` pays the
      * same per-call global provider lock the decode side does (see
      * [[Codec.audioReaders]]); this is the identical writer instance
      * JavaSound would dispatch to. */
    private val wavWriter: javax.sound.sampled.spi.AudioFileWriter = {
      val it = java.util.ServiceLoader
        .load(classOf[javax.sound.sampled.spi.AudioFileWriter]).iterator()
      var found: javax.sound.sampled.spi.AudioFileWriter = null
      while (found == null && it.hasNext) {
        val w = it.next()
        if (w.isFileTypeSupported(javax.sound.sampled.AudioFileFormat.Type.WAVE))
          found = w
      }
      require(found != null, "no JDK WAVE AudioFileWriter provider")
      found
    }

    /** Mono signed-16-bit little-endian WAV; `sample(i)` must return a
      * value in [-32768, 32767]. */
    def pcm16(n: Int, sampleRate: Int)(sample: Int => Int): Array[Byte] = {
      require(n >= 1 && sampleRate >= 1, s"need n >= 1, rate >= 1: $n, $sampleRate")
      val data = new Array[Byte](n * 2)
      var i = 0
      while (i < n) {
        val s = sample(i)
        data(2 * i) = (s & 0xff).toByte
        data(2 * i + 1) = ((s >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(
        sampleRate.toFloat, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new ByteArrayInputStream(data), fmt, n.toLong)
      val out = new ByteArrayOutputStream()
      wavWriter.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
  }

  /** Deterministic synthetic MJPEG-in-AVI clips, symmetric with
    * [[SyntheticImages]]/[[SyntheticAudio]]: encode a real RIFF/AVI
    * container (avih + strl headers, `movi` list of `00dc` JPEG chunks)
    * so the video demux + decode path verifies end-to-end without binary
    * fixtures in the repo.
    */
  object SyntheticVideo {

    /** Grayscale MJPEG AVI whose every frame is one SOLID gray level
      * `gray(f)`: a flat 8×8 block at max JPEG quality is DC-only under a
      * unit quantizer, so it round-trips BIT-EXACTLY — which is what makes
      * an MJPEG fixture oracle-checkable at all (JPEG is otherwise lossy).
      * `w`/`h` must be multiples of 8 so every block is flat. */
    def mjpegAviFlat(w: Int, h: Int, nFrames: Int)(gray: Int => Int): Array[Byte] =
      mjpegAviBlocks(w, h, nFrames)((f, _, _) => gray(f))

    /** Grayscale MJPEG AVI whose every frame is a grid of FLAT 8×8
      * blocks (`gray(f, bx, by)`) — the per-block generalization of
      * [[mjpegAviFlat]]: JPEG blocks are independent 8×8 transforms, a
      * flat block is DC-only under the unit quantizer, and DC prediction
      * across blocks is LOSSLESS differential coding, so frames with
      * block-level structure still round-trip bit-exactly — which is
      * what a first-frame perceptual-hash fixture needs (a solid frame
      * hashes to all-zero bits). */
    def mjpegAviBlocks(w: Int, h: Int, nFrames: Int)(
        gray: (Int, Int, Int) => Int): Array[Byte] = {
      require(w >= 8 && h >= 8 && w % 8 == 0 && h % 8 == 0,
        s"dims must be positive multiples of 8 for flat-block exactness: ${w}x$h")
      require(nFrames >= 1, s"need nFrames >= 1: $nFrames")
      val frames = (0 until nFrames).map { f =>
        val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
        val r = img.getRaster
        var by = 0
        while (by < h / 8) {
          var bx = 0
          while (bx < w / 8) {
            val g = gray(f, bx, by) & 0xff
            var y = by * 8
            while (y < by * 8 + 8) {
              var x = bx * 8
              while (x < bx * 8 + 8) { r.setSample(x, y, 0, g); x += 1 }
              y += 1
            }
            bx += 1
          }
          by += 1
        }
        encodeJpegMax(img)
      }
      buildAvi(w, h, frames)
    }

    private def encodeJpegMax(img: BufferedImage): Array[Byte] = {
      val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
      val param = writer.getDefaultWriteParam
      param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      param.setCompressionQuality(1.0f) // unit quantizer → flat blocks exact
      val out = new ByteArrayOutputStream()
      val ios = ImageIO.createImageOutputStream(out)
      try {
        writer.setOutput(ios)
        writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
      } finally { writer.dispose(); ios.close() }
      out.toByteArray
    }

    private def le32(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

    private def chunk(four: String, data: Array[Byte]): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      out.write(four.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      out.write(le32(data.length), 0, 4)
      out.write(data, 0, data.length)
      if (data.length % 2 == 1) out.write(0) // word alignment pad
      out.toByteArray
    }

    private def list(kind: String, data: Array[Byte]): Array[Byte] =
      chunk("LIST", kind.getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++ data)

    /** Structurally complete AVI: MainAVIHeader + one video stream
      * (strh 'vids'/'MJPG' + strf BITMAPINFOHEADER) + movi frame chunks.
      * No idx1 (AVIF_HASINDEX unset) — storage order is frame order. */
    private def buildAvi(w: Int, h: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
      val maxFrame = frames.map(_.length).max
      val usPerFrame = 100000 // 10 fps
      val avih = le32(usPerFrame) ++ le32(maxFrame * 10) ++ le32(0) ++ le32(0) ++
        le32(frames.length) ++ le32(0) ++ le32(1) ++ le32(maxFrame) ++
        le32(w) ++ le32(h) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
      val strh = "vids".getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++
        "MJPG".getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++
        le32(0) ++ le32(0) ++ le32(0) ++ le32(1) ++ le32(10) ++ le32(0) ++
        le32(frames.length) ++ le32(maxFrame) ++ le32(-1) ++ le32(0) ++
        Array.fill[Byte](8)(0) // rcFrame
      val strf = le32(40) ++ le32(w) ++ le32(h) ++
        Array[Byte](1, 0, 24, 0) ++ // biPlanes=1, biBitCount=24
        "MJPG".getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++
        le32(w * h * 3) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
      val hdrl = list("hdrl",
        chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
      val movi = list("movi", frames.flatMap(f => chunk("00dc", f)).toArray)
      chunk("RIFF",
        "AVI ".getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++ hdrl ++ movi)
    }
  }

  /** REAL per-blob audio decode, partition-at-a-time (see [[decodeMeta]]). */
  def decodeAudio(ds: Dataset[(Long, Array[Byte])])(
      implicit enc: org.apache.spark.sql.Encoder[AudioPcm]): Dataset[AudioPcm] =
    ds.mapPartitions(_.flatMap { case (id, bytes) => Codec.decodeAudio(id, bytes) })

  /** Attach decoded metadata columns derived from `blobCol`. Narrow —
    * pure per-row expressions, schema known at plan time. These are the
    * FAKE-path formulas (byte-length derived), pinned by the
    * multimodal_meta oracle; real image metadata comes from [[decodeMeta]].
    */
  def withMeta(df: DataFrame, blobCol: String = "blob"): DataFrame =
    df.withColumn("n_bytes", length(col(blobCol)).cast("long"))
      .withColumn("fake_width", lit(16L) + length(col(blobCol)).cast("long") % 64L)
      .withColumn("fake_height", lit(16L) + length(col(blobCol)).cast("long") % 48L)
      .withColumn("fake_frames", lit(1L) + length(col(blobCol)).cast("long") % 8L)

  /** REAL per-blob metadata: decode each (id, blob) partition-at-a-time and
    * emit the recovered MediaMeta (image containers via javax.imageio,
    * others via the fake). Narrow; input partitioning preserved.
    */
  def decodeMeta(ds: Dataset[(Long, Array[Byte])])(
      implicit enc: org.apache.spark.sql.Encoder[MediaMeta]): Dataset[MediaMeta] =
    ds.mapPartitions(_.map { case (id, bytes) => Codec.decode(id, bytes)._1 })

  /** Frame-sampled feature extraction: one output row per sampled frame.
    * Runs partition-at-a-time (the Scala analogue of a pandas `mapInPandas`
    * batch UDF) so codec setup cost is paid once per partition, and the
    * input partitioning is preserved — at 100 TB each executor decodes its
    * own parquet splits with zero data movement.
    */
  def frameFeatures(ds: Dataset[(Long, Array[Byte])], sampleEvery: Int = 1)(
      implicit enc: org.apache.spark.sql.Encoder[FrameFeatures]): Dataset[FrameFeatures] = {
    require(sampleEvery >= 1, s"sampleEvery must be >= 1, got $sampleEvery")
    ds.mapPartitions { it =>
      // per-partition codec setup would go here (native lib init, etc.)
      it.flatMap { case (id, bytes) =>
        val (_, frames) = Codec.decode(id, bytes)
        frames.filter(_.frameIdx % sampleEvery == 0)
      }
    }
  }

  /** "Resize": deterministic re-bucketing of decoded features to a target
    * dimension (mean-pool style), again a narrow map. */
  def resizeFeatures(ds: Dataset[FrameFeatures], dim: Int)(
      implicit enc: org.apache.spark.sql.Encoder[FrameFeatures]): Dataset[FrameFeatures] =
    ds.map { ff =>
      val out = new Array[Float](dim)
      val counts = new Array[Int](dim)
      var i = 0
      while (i < ff.features.length) {
        val j = i * dim / math.max(ff.features.length, 1)
        out(j) += ff.features(i); counts(j) += 1
        i += 1
      }
      var j = 0
      while (j < dim) { if (counts(j) > 0) out(j) /= counts(j); j += 1 }
      ff.copy(features = out)
    }
}
