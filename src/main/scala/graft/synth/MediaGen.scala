package graft.synth

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One synthesized audio row: a REAL canonical RIFF/WAVE payload
  * (44-byte header + little-endian signed 16-bit mono PCM). */
final case class AudioRow(
    audio_id: String,
    bytes: Array[Byte],
    sample_rate: Int,
    n_samples: Int)

/** One synthesized video row: a REAL MJPEG elementary stream —
  * `n_frames` independently-encoded baseline JPEGs concatenated
  * back-to-back (the Motion-JPEG stream layout; each frame is a
  * complete SOI..EOI image). */
final case class VideoRow(video_id: String, bytes: Array[Byte], n_frames: Int)

/** Generator-truth demux row: where frame `frame_idx` of `video_id`
  * REALLY starts and how long it is — the independent "expected" side
  * of the MJPEG demux oracle (the engine must rediscover these
  * boundaries from the bytes alone). */
final case class ExpectedFrame(
    video_id: String, frame_idx: Int, byte_off: Int, n_bytes: Int)

/** Deterministic audio/video payload generator — the media analog of
  * [[ImageGen]]: every byte is a pure function of (seed, id), so any
  * row can be re-derived on any executor with no shuffle and every
  * codec op gets an independent generator-truth fixture to verify
  * against. Payloads are REAL container formats decoded by REAL JDK
  * codecs (`javax.sound.sampled.AudioSystem` for WAV,
  * `javax.imageio.ImageIO` per MJPEG frame) — no stub step anywhere
  * on these paths. */
object MediaGen {

  // --- audio ----------------------------------------------------------
  private val sampleRates = Array(8000, 16000, 22050)

  /** Number of PCM samples for row id (600..1599 — deliberately NOT a
    * multiple of the RMS window so the dropped tail is exercised). */
  def nSamples(seed: Long, id: Long): Int =
    600 + new ImageGen.Rng(seed, id, 17L).nextInt(1000)

  // own stream tag (20L): sharing nSamples' tag 17 would couple both
  // fields to the identical first splitmix draw
  def sampleRate(seed: Long, id: Long): Int =
    sampleRates(new ImageGen.Rng(seed, id, 20L).nextInt(sampleRates.length))

  /** Signed 16-bit samples for row id — seeded splitmix noise in
    * [-30000, 30000] (sum of squares over any window stays exact in a
    * double and in DuckDB's HUGEINT, which is what makes the RMS oracle
    * bit-exact). */
  def samples(seed: Long, id: Long): Array[Int] = {
    val rng = new ImageGen.Rng(seed, id, 16L)
    Array.fill(nSamples(seed, id))(rng.nextInt(60001) - 30000)
  }

  /** Canonical 44-byte RIFF/WAVE header + little-endian int16 mono PCM.
    * The layout is the public WAV spec, byte for byte; decoding goes
    * through the JDK's real parser (see Multimodal.decodeWav), never
    * through offset arithmetic on this known layout. */
  def wavBytes(sampleRateHz: Int, pcm: Array[Int]): Array[Byte] = {
    val dataLen = pcm.length * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
    out.put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
    out.putShort(1.toShort) // PCM
    out.putShort(1.toShort) // mono
    out.putInt(sampleRateHz)
    out.putInt(sampleRateHz * 2) // byte rate
    out.putShort(2.toShort) // block align
    out.putShort(16.toShort) // bits per sample
    out.put("data".getBytes("US-ASCII")).putInt(dataLen)
    pcm.foreach(s => out.putShort(s.toShort))
    out.array()
  }

  def audioRowFor(seed: Long, id: Long): AudioRow = {
    val pcm = samples(seed, id)
    val sr = sampleRate(seed, id)
    AudioRow(ImageGen.rowId("aud", id), wavBytes(sr, pcm), sr, pcm.length)
  }

  def audio(spark: SparkSession, n: Long, seed: Long = 42L,
      parts: Int = 8): DataFrame = {
    import spark.implicits._
    spark.range(0L, n, 1L, parts).map(audioRowFor(seed, _)).toDF()
  }

  // --- video ----------------------------------------------------------
  def nFrames(seed: Long, id: Long): Int =
    3 + new ImageGen.Rng(seed, id, 18L).nextInt(6)

  /** Per-frame channel values at (x, y): seeded smooth gradient planes
    * (base per channel from the frame's splitmix stream, small spatial
    * slopes, range kept inside 0..255 with no wraparound). Gradients —
    * unlike per-pixel noise, which is JPEG's pathological worst case —
    * survive the lossy round-trip within the PSNR ≥ 40 dB gate, so the
    * generator truth is a usable fidelity reference for the REAL codec,
    * mirroring what natural video frames look like to a DCT codec. */
  def framePixel(seed: Long, id: Long, f: Int, x: Int, y: Int): (Int, Int, Int) = {
    val (a, b, c) = frameBase(seed, id, f)
    (a + x * 2, b + y * 2, c + x + y)
  }

  /** The per-frame channel bases — one Rng draw per FRAME (the spatial
    * slopes in [[framePixel]] are pure arithmetic on top), so frame
    * synthesis costs 3 draws, not 3 per pixel. */
  def frameBase(seed: Long, id: Long, f: Int): (Int, Int, Int) = {
    val rng = new ImageGen.Rng(seed, id * 131 + f, 19L)
    (rng.nextInt(192), rng.nextInt(192), rng.nextInt(192))
  }

  /** Deterministic 16×16 RGB frame `f` of video `id` (see
    * [[framePixel]]). */
  def frameImage(seed: Long, id: Long, f: Int): java.awt.image.BufferedImage = {
    val side = ImageGen.payloadSide
    val img = new java.awt.image.BufferedImage(side, side,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val (a, bb, c) = frameBase(seed, id, f)
    var y = 0
    while (y < side) {
      var x = 0
      while (x < side) {
        val (r, g, b) = (a + x * 2, bb + y * 2, c + x + y)
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    img
  }

  /** Generator-truth pixels of frame `f` — the SAME gradient replayed
    * without touching any codec (the PSNR reference for the lossy JPEG
    * round-trip, exactly like ImageGen.expectedPixels). */
  def expectedFramePixels(seed: Long, id: Long, f: Int): Array[Int] = {
    val side = ImageGen.payloadSide
    val out = new Array[Int](side * side * 3)
    val (a, bb, c) = frameBase(seed, id, f)
    var y = 0
    while (y < side) {
      var x = 0
      while (x < side) {
        val i = (y * side + x) * 3
        out(i) = a + x * 2; out(i + 1) = bb + y * 2; out(i + 2) = c + x + y
        x += 1
      }
      y += 1
    }
    out
  }

  /** MJPEG elementary stream for row id plus the true (offset, length)
    * of every frame. */
  def mjpegWithIndex(seed: Long, id: Long): (Array[Byte], Array[(Int, Int)]) = {
    val k = nFrames(seed, id)
    val frames = Array.tabulate(k)(f =>
      graft.ops.Multimodal.encodeImage(frameImage(seed, id, f), "jpg"))
    val idx = new Array[(Int, Int)](k)
    var off = 0
    var f = 0
    while (f < k) {
      idx(f) = (off, frames(f).length)
      off += frames(f).length
      f += 1
    }
    val out = new Array[Byte](off)
    f = 0
    while (f < k) {
      System.arraycopy(frames(f), 0, out, idx(f)._1, frames(f).length)
      f += 1
    }
    (out, idx)
  }

  def videoRowFor(seed: Long, id: Long): VideoRow = {
    val (bytes, idx) = mjpegWithIndex(seed, id)
    VideoRow(ImageGen.rowId("vid", id), bytes, idx.length)
  }

  def videos(spark: SparkSession, n: Long, seed: Long = 42L,
      parts: Int = 8): DataFrame = {
    import spark.implicits._
    spark.range(0L, n, 1L, parts).map(videoRowFor(seed, _)).toDF()
  }

  /** Generator-truth demux table: one row per frame of every video with
    * its REAL byte offset and length in the stream. */
  def expectedFrames(spark: SparkSession, n: Long, seed: Long = 42L,
      parts: Int = 8): DataFrame = {
    import spark.implicits._
    spark.range(0L, n, 1L, parts).flatMap { id =>
      val (_, idx) = mjpegWithIndex(seed, id)
      idx.iterator.zipWithIndex.map { case ((off, len), f) =>
        ExpectedFrame(ImageGen.rowId("vid", id), f, off, len)
      }
    }.toDF()
  }
}
