package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads with typed
  * metadata, plus decode / feature-extract / resize / frame-sample
  * stages.
  *
  * IMAGE decode is REAL: [[decodeMeta]] parses width/height/format
  * from actual image headers and [[decodeStats]] fully decodes the
  * pixels, both via the JDK's `javax.imageio` (PNG/BMP/GIF/JPEG —
  * whatever the JRE's ImageIO SPI registry carries) inside
  * `mapPartitions` — per-row work on executors, payloads never leave
  * the partition. [[fakeDecodeMeta]] remains ONLY as the
  * deterministic stand-in for the text-payload testdata (the
  * `documents` table carries no real media, and the oracle needs a
  * SQL-expressible function); audio/video codecs stay out of scope
  * for the JDK and keep the same seam.
  *
  * At 100 TB: payloads stay columnar binary in parquet (never
  * driver-collected), per-row ops fuse into the scan or run in one
  * mapPartitions pass, and frame-sampling reduces bytes BEFORE any
  * shuffle.
  */
object Multimodal {

  /** Parse real image headers: (width, height, format), nulls for
    * payloads no installed reader claims. Header-only — the reader
    * reports dimensions without decoding pixel data, so the per-row
    * cost is a few hundred bytes of parsing even for huge images.
    */
  def decodeMeta(docs: DataFrame, idCol: String,
                 payloadCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("id"),
        col(payloadCol).cast("binary").as("p"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        headerMeta(bytes) match {
          case Some((w, h, f)) => (id, Some(w), Some(h), Some(f))
          case None => (id, None, None, None)
        }
      })
      .toDF("id", "width", "height", "format")
  }

  /** Full pixel decode → per-image stats (n_pixels, mean luminance
    * 0-255): the feature-extraction stage over a genuinely decoded
    * image, one mapPartitions pass.
    */
  def decodeStats(docs: DataFrame, idCol: String,
                  payloadCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("id"),
        col(payloadCol).cast("binary").as("p"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        decodeImage(bytes) match {
          case Some(img) =>
            val (w, h) = (img.getWidth, img.getHeight)
            var sum = 0.0
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = img.getRGB(x, y)
                sum += 0.299 * ((rgb >> 16) & 0xFF) +
                  0.587 * ((rgb >> 8) & 0xFF) + 0.114 * (rgb & 0xFF)
                x += 1
              }
              y += 1
            }
            (id, Some(w.toLong * h), Some(sum / (w.toLong * h)))
          case None => (id, None, None)
        }
      })
      .toDF("id", "n_pixels", "mean_luma")
  }

  /** Fused decode: ONE `ImageIO.read` per payload yields header meta
    * AND pixel stats — the shape a real feature-extraction stage
    * wants (decode once, emit every feature), vs chaining
    * [[decodeMeta]] + [[decodeStats]] which decodes twice and joins.
    * Columns: (id, width, height, format, n_pixels, mean_luma);
    * all-null metadata for payloads no installed reader claims.
    */
  def decodeFeatures(docs: DataFrame, idCol: String,
                     payloadCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("id"),
        col(payloadCol).cast("binary").as("p"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val fmt = headerMeta(bytes).map(_._3)
        decodeImage(bytes) match {
          case Some(img) =>
            val (w, h) = (img.getWidth, img.getHeight)
            var sum = 0.0
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = img.getRGB(x, y)
                sum += 0.299 * ((rgb >> 16) & 0xFF) +
                  0.587 * ((rgb >> 8) & 0xFF) + 0.114 * (rgb & 0xFF)
                x += 1
              }
              y += 1
            }
            (id, Some(w), Some(h), fmt,
              Some(w.toLong * h), Some(sum / (w.toLong * h)))
          case None => (id, None, None, None, None, None)
        }
      })
      .toDF("id", "width", "height", "format", "n_pixels", "mean_luma")
  }

  /** Encode a real w×h uniform-gray PNG through the SAME JDK codec
    * stack the decode path reads. Exists so the decode operators can
    * be exercised — and ORACLE-CHECKED — against genuine codec
    * round-trips even though the testdata tables carry no media: a
    * query derives (w, h, gray) arithmetically from an id column,
    * encodes, decodes, and the DuckDB oracle predicts the decoded
    * metadata from the same arithmetic.
    */
  def encodeGrayPng(w: Int, h: Int, gray: Int): Array[Byte] = {
    require(w > 0 && h > 0 && gray >= 0 && gray <= 255,
      s"bad test card ${w}x${h} gray=$gray")
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (gray << 16) | (gray << 8) | gray
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    // explicit memory-cached output stream for the same reason as
    // memIn: the OutputStream overload consults the JVM-global
    // useCache default (a temp FILE per encode)
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try javax.imageio.ImageIO.write(img, "png", ios)
    finally ios.close()
    bos.toByteArray
  }

  /** REAL audio decode via the JDK's `javax.sound.sampled` (WAV/AU/
    * AIFF — whatever the JRE's audio SPI registry carries): header
    * meta (sample rate, channels, bits, frame count) plus full-PCM
    * RMS amplitude of the first channel (16-bit signed), one
    * mapPartitions pass. All-null row for payloads no installed
    * reader claims. Columns: (id, sample_rate, channels, bits,
    * n_frames, rms).
    */
  def decodeAudioFeatures(docs: DataFrame, idCol: String,
                          payloadCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("id"),
        col(payloadCol).cast("binary").as("p"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        decodeAudio(bytes) match {
          case Some((rate, ch, bits, frames, rms)) =>
            (id, Some(rate), Some(ch), Some(bits), Some(frames), Some(rms))
          case None => (id, None, None, None, None, None)
        }
      })
      .toDF("id", "sample_rate", "channels", "bits", "n_frames", "rms")
  }

  /** Encode real 16-bit mono little-endian PCM as a WAV container
    * through the SAME JDK codec stack the decode path reads — the
    * audio twin of [[encodeGrayPng]]: a query derives (rate, frames,
    * amplitude) arithmetically from an id, encodes, decodes, and the
    * oracle predicts the decoded values (constant-amplitude samples
    * make the RMS exactly |amp|).
    */
  def encodeConstWav(sampleRate: Int, nFrames: Int, amp: Short): Array[Byte] = {
    require(sampleRate > 0 && nFrames > 0, s"bad wav $sampleRate/$nFrames")
    val pcm = new Array[Byte](nFrames * 2)
    var i = 0
    while (i < nFrames) {
      pcm(2 * i) = (amp & 0xFF).toByte
      pcm(2 * i + 1) = ((amp >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    val w = audioWriters.find(_.isFileTypeSupported(
      javax.sound.sampled.AudioFileFormat.Type.WAVE, ais)).getOrElse(
      throw new IllegalStateException("no WAVE AudioFileWriter on this JVM"))
    w.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** SPI codec providers resolved ONCE per JVM via the public
    * ServiceLoader API instead of per-call `AudioSystem` lookups:
    * every `AudioSystem.getAudioInputStream`/`write` re-enters
    * `JSSecurityManager.getProviders`, a CLASS-synchronized registry
    * walk — and the Gervill `SoftMidiAudioFileReader` it iterates
    * additionally calls `MidiSystem.getMidiFileReaders` through the
    * SAME class lock on EVERY attempt, fully serializing concurrent
    * decodes (jstack-verified: 32 Spark tasks each BLOCKED on
    * JSSecurityManager; an 8-thread decode loop ran SLOWER than 1
    * thread). Caching the readers and dropping the MIDI-backed one
    * (a score format, not PCM — its "decode" would synthesize audio)
    * makes decode 7× faster single-threaded and embarrassingly
    * parallel: 1.11 s → 0.03 s for 20k WAVs on 8 threads.
    */
  private lazy val audioReaders
      : List[javax.sound.sampled.spi.AudioFileReader] = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader])
      .iterator().asScala.toList
      .filterNot(_.getClass.getName.contains("Midi"))
  }
  private lazy val audioWriters
      : List[javax.sound.sampled.spi.AudioFileWriter] = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileWriter])
      .iterator().asScala.toList
  }

  private[ops] def decodeAudio(
      bytes: Array[Byte]): Option[(Int, Int, Int, Long, Double)] = {
    if (bytes == null || bytes.length == 0) return None
    try {
      val ais = audioReaders.iterator.flatMap { r =>
        try Some(r.getAudioInputStream(new java.io.ByteArrayInputStream(bytes)))
        catch {
          case _: javax.sound.sampled.UnsupportedAudioFileException => None
        }
      }.nextOption().getOrElse(
        throw new javax.sound.sampled.UnsupportedAudioFileException(
          "no cached AudioFileReader recognizes the payload"))
      try {
        val f = ais.getFormat
        val frames = ais.getFrameLength
        // RMS over channel 0 of 16-bit signed PCM; other layouts
        // report header meta with NaN-free rms = 0.0
        val rms =
          if (f.getSampleSizeInBits == 16 && frames > 0) {
            val fs = f.getFrameSize
            val buf = ais.readAllBytes()
            val n = math.min(frames, (buf.length / fs).toLong).toInt
            var sum = 0.0
            var i = 0
            // sample byte order follows the container: WAV is
            // little-endian, AU/AIFF are big-endian — reading a fixed
            // order would byte-swap the amplitudes of the other family
            val big = f.isBigEndian
            while (i < n) {
              val b0 = buf(i * fs) & 0xFF
              val b1 = buf(i * fs + 1) & 0xFF
              val s =
                if (big) ((buf(i * fs).toInt) << 8) | b1
                else ((buf(i * fs + 1).toInt) << 8) | b0
              sum += s.toDouble * s.toDouble
              i += 1
            }
            if (n > 0) math.sqrt(sum / n) else 0.0
          } else 0.0
        Some((math.round(f.getSampleRate).toInt, f.getChannels,
          f.getSampleSizeInBits, frames, rms))
      } finally ais.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  // ImageIO's DEFAULT stream cache is a temp FILE per call — for
  // byte-array payloads that is one create+write+delete of an on-disk
  // file per decoded image, a filesystem hot spot under 32 concurrent
  // tasks. Memory caching is strictly better for in-memory sources,
  // but it is scoped HERE, per call, by constructing the memory-
  // cached stream explicitly — never via the process-global
  // `ImageIO.setUseCache(false)`, which would silently change
  // stream-caching for every other ImageIO user in the same JVM the
  // moment this object loads.
  private def memIn(bytes: Array[Byte]) =
    new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(bytes))

  private[ops] def headerMeta(bytes: Array[Byte]): Option[(Int, Int, String)] = {
    if (bytes == null || bytes.length == 0) return None
    try {
      val iis = memIn(bytes)
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try {
            r.setInput(iis)
            Some((r.getWidth(0), r.getHeight(0),
              r.getFormatName.toLowerCase(java.util.Locale.ROOT)))
          } finally r.dispose()
        }
      } finally iis.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  private[ops] def decodeImage(
      bytes: Array[Byte]): Option[java.awt.image.BufferedImage] = {
    if (bytes == null || bytes.length == 0) return None
    // the ImageInputStream overload reads the explicitly memory-cached
    // stream; the InputStream overload would consult the JVM-global
    // useCache default and hit the temp-file path
    try Option(javax.imageio.ImageIO.read(memIn(bytes)))
    catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Wrap raw text bytes as the opaque payload column (the testdata
    * has no real media; the plumbing is payload-agnostic).
    */
  def payload(text: Column): Column = text.cast("binary")

  def payloadBytes(p: Column): Column = octet_length(p)

  /** Deterministic TEXT-PAYLOAD stand-in for [[decodeMeta]] (the
    * testdata carries no real media and the DuckDB oracle needs a
    * SQL-expressible function — real image bytes go through the
    * ImageIO path above):
    * width  = 1 + n_bytes mod 64
    * height = 1 + n_bytes mod 48
    * format = 'fake/' + (n_bytes mod 3)
    */
  def fakeDecodeMeta(p: Column): Column = struct(
    (payloadBytes(p) % 64 + lit(1)).as("width"),
    (payloadBytes(p) % 48 + lit(1)).as("height"),
    concat(lit("fake/"), (payloadBytes(p) % 3).cast("string")).as("format"))

  /** "Resize": keep the first `n` bytes of the payload (deterministic
    * stand-in for a real resample; exercises binary slicing).
    */
  def resize(p: Column, n: Int): Column = substring(p, 1, n)

  /** "Frame-sample" a text payload: every `stride`-th character —
    * the stride-slicing dataflow of video frame extraction. Empty (or
    * null-length) payloads sample to "" — an unguarded
    * sequence(1, 0, stride) throws Illegal sequence boundaries (the
    * ascending step contradicts the descending range).
    */
  def frameSample(text: Column, stride: Int): Column =
    when(length(text) >= 1,
      array_join(
        transform(sequence(lit(1), length(text), lit(stride)),
          i => text.substr(i, lit(1))), ""))
      .otherwise(lit(""))

  /** Full multimodal feature row for a documents-like table. */
  def features(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val p = payload(col(textCol))
    docs.select(
      col(idCol).as("id"),
      payloadBytes(p).as("n_bytes"),
      fakeDecodeMeta(p).as("meta"),
      // hash the HEX of the head bytes, not the raw bytes: DuckDB's
      // md5 only takes VARCHAR, so a raw-byte hash forced the oracle
      // to substr CHARS — equal only while the corpus is pure ASCII
      // (64 bytes ≈ 21 CJK chars). Hex round-trips any byte into both
      // engines' md5 identically (both hex() functions are uppercase).
      md5(hex(resize(p, 64)).cast("binary")).as("head_hash"),
      md5(frameSample(col(textCol), 8).cast("binary")).as("frames_hash"))
  }
}
