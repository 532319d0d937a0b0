package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Multimodal
import graft.synth.MediaGen

/** Real-codec audio/video paths: WAV/PCM through the JDK's
  * javax.sound parser, MJPEG elementary streams through segment-level
  * JPEG demux + ImageIO frame decode. */
class MediaCodecSpec extends AnyFunSuite {
  lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  // --- WAV ------------------------------------------------------------
  test("wav round-trip: decodeWav recovers the exact int16 samples") {
    (0L until 5L).foreach { id =>
      val pcm = MediaGen.samples(42L, id)
      val sr = MediaGen.sampleRate(42L, id)
      val out = Multimodal.decodeWav(MediaGen.wavBytes(sr, pcm))
      assert(out.sampleRate == sr)
      assert(out.channels == 1)
      assert(out.samples.toSeq == pcm.toSeq)
    }
  }

  test("decodeWav is a real parser: extra RIFF chunks before data are navigated") {
    // canonical bytes, then splice a LIST chunk between "fmt " and
    // "data" — offset-44 slicing would read garbage; the JDK parser
    // must skip it by chunk length and return identical samples
    val pcm = MediaGen.samples(42L, 7L)
    val canonical = MediaGen.wavBytes(8000, pcm)
    val listBody = "INFOIART".getBytes("US-ASCII") // 8-byte payload
    val spliced = java.nio.ByteBuffer
      .allocate(canonical.length + 8 + listBody.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    spliced.put(canonical, 0, 36) // RIFF..fmt chunk end
    spliced.put("LIST".getBytes("US-ASCII")).putInt(listBody.length)
    spliced.put(listBody)
    spliced.put(canonical, 36, canonical.length - 36) // data chunk
    val bytes = spliced.array()
    // patch the RIFF size field (bytes 4-7) for the extra chunk
    val riffLen = bytes.length - 8
    (0 until 4).foreach(i => bytes(4 + i) = ((riffLen >> (8 * i)) & 0xff).toByte)
    val out = Multimodal.decodeWav(bytes)
    assert(out.samples.toSeq == pcm.toSeq)
  }

  test("audioRms: real decode, windows match a scalar recompute, tail dropped") {
    val df = MediaGen.audio(spark, 6L, parts = 2)
    val rows = Multimodal.audioRms(df, "audio_id", "bytes", windowSize = 256)
      .collect().map(r => r.id -> r).toMap
    assert(rows.size == 6 && rows.values.forall(_.decode_ok))
    (0L until 6L).foreach { id =>
      val pcm = MediaGen.samples(42L, id)
      val r = rows(f"aud$id%09d")
      assert(r.n_samples == pcm.length)
      assert(r.sample_rate == MediaGen.sampleRate(42L, id))
      assert(r.n_windows == pcm.length / 256)
      val expect = (0 until pcm.length / 256).map { w =>
        math.sqrt(pcm.slice(w * 256, (w + 1) * 256)
          .map(s => s.toDouble * s).sum / 256)
      }
      assert(r.rms.toSeq == expect, "RMS must be bit-exact vs the scalar spec")
    }
  }

  test("audioRms: corrupt and non-PCM payloads yield decode_ok=false rows") {
    val junk = Array.tabulate(100)(_.toByte)
    val truncated = MediaGen.wavBytes(8000, MediaGen.samples(42L, 1L)).take(30)
    val df = Seq(("junk", junk), ("trunc", truncated)).toDF("id", "bytes")
    val rows = Multimodal.audioRms(df, "id", "bytes").collect()
    assert(rows.length == 2 && rows.forall(!_.decode_ok))
  }

  test("audioRms: a STEREO wav is refused, not silently channel-mixed") {
    // patch the canonical mono header to declare 2 channels (offset 22),
    // byte rate sr*4 (offset 28), block align 4 (offset 32) — the JDK
    // parser decodes it fine, but the samples would be L/R interleaved:
    // windowed RMS over them would silently mix channels and n_samples
    // would be 2x the per-channel count, with no field to detect it by
    val bytes = MediaGen.wavBytes(8000, MediaGen.samples(42L, 3L))
    val b = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.putShort(22, 2.toShort)
    b.putInt(28, 8000 * 4)
    b.putShort(32, 4.toShort)
    val df = Seq(("stereo", bytes)).toDF("id", "bytes")
    val rows = Multimodal.audioRms(df, "id", "bytes").collect()
    assert(rows.length == 1 && !rows.head.decode_ok)
  }

  // --- MJPEG ----------------------------------------------------------
  test("demuxMjpeg rediscovers the generator-truth frame boundaries from bytes alone") {
    (0L until 5L).foreach { id =>
      val (bytes, idx) = MediaGen.mjpegWithIndex(42L, id)
      assert(Multimodal.demuxMjpeg(bytes).toSeq == idx.toSeq)
    }
  }

  test("demuxMjpeg skips segments by length: a 0xFFD9 inside COM payload is not EOI") {
    // one real frame, with a COM (0xFFFE) segment whose payload contains
    // the EOI byte pair, spliced right after SOI — a byte-scanning
    // demuxer would split the frame early; the segment parser must not
    val frame = graft.ops.Multimodal.encodeImage(
      MediaGen.frameImage(42L, 0L, 0), "jpg")
    val payload = Array[Byte](0xff.toByte, 0xd9.toByte, 1, 2)
    val com = Array[Byte](0xff.toByte, 0xfe.toByte,
      0, (payload.length + 2).toByte) ++ payload
    val spliced = frame.take(2) ++ com ++ frame.drop(2)
    val idx = Multimodal.demuxMjpeg(spliced)
    assert(idx.toSeq == Seq((0, spliced.length)))
  }

  test("demuxMjpeg honors fill bytes before restart markers inside scan data") {
    // spec B.1.1.2: any marker may be preceded by 0xFF padding. The scan
    // skipper must consume the fill and keep scanning — exiting the scan
    // at 0xFF 0xFF would hand the RST to the segment-level loop, which
    // would then misread the raw entropy bytes after it as marker
    // structure. Synthetic frame (demux validates structure, not
    // decodability): SOI, SOS(len 4), entropy with a stuffed 0xFF, a
    // fill byte + RST0, more entropy, fill byte + EOI.
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    val frame = b(0xff, 0xd8, // SOI
      0xff, 0xda, 0x00, 0x04, 0x01, 0x3f, // SOS header, len 4
      0x11, 0x22, 0xff, 0x00, 0x33, // entropy incl. stuffed 0xFF
      0xff, 0xff, 0xd0, // FILL byte then RST0
      0x44, 0x55, // entropy resumes
      0xff, 0xff, 0xd9) // FILL byte then EOI
    assert(Multimodal.demuxMjpeg(frame).toSeq == Seq((0, frame.length)))
    // and a two-frame stream splits at the right boundary
    val two = frame ++ frame
    assert(Multimodal.demuxMjpeg(two).toSeq ==
      Seq((0, frame.length), (frame.length, frame.length)))
  }

  test("videoFrames: empty payload yields the sentinel row, not zero rows") {
    val df = Seq(("empty", Array.emptyByteArray)).toDF("id", "bytes")
    val rows = Multimodal.videoFrames(df, "id", "bytes").collect()
    assert(rows.length == 1 && !rows.head.decode_ok && rows.head.frame_idx == -1)
  }

  test("videoFrames: every-2nd frame, true extents, real decode, phash from pixels") {
    val df = MediaGen.videos(spark, 4L, parts = 2)
    val out = Multimodal.videoFrames(df, "video_id", "bytes", every = 2)
      .collect().groupBy(_.id)
    (0L until 4L).foreach { id =>
      val (bytes, idx) = MediaGen.mjpegWithIndex(42L, id)
      val rows = out(f"vid$id%09d").sortBy(_.frame_idx)
      assert(rows.map(_.frame_idx).toSeq == (0 until idx.length by 2).toSeq)
      rows.foreach { r =>
        assert(r.decode_ok)
        val (off, len) = idx(r.frame_idx)
        assert((r.byte_off, r.n_bytes) == (off, len))
        assert((r.w, r.h) == (16, 16))
        val img = Multimodal.decodeImage(
          java.util.Arrays.copyOfRange(bytes, off, off + len))
        assert(r.phash == Multimodal.phash64(img))
      }
    }
  }

  test("videoFrames: decoded JPEG frames stay within the lossy fidelity gate (PSNR >= 40dB)") {
    val (bytes, idx) = MediaGen.mjpegWithIndex(42L, 2L)
    idx.zipWithIndex.foreach { case ((off, len), f) =>
      val img = Multimodal.decodeImage(
        java.util.Arrays.copyOfRange(bytes, off, off + len))
      val px = Multimodal.pixelChannels(img)
      val exp = MediaGen.expectedFramePixels(42L, 2L, f)
      assert(px.length == exp.length)
      var mse = 0.0
      px.indices.foreach { i =>
        val d = (px(i) - exp(i)).toDouble; mse += d * d
      }
      val psnr =
        if (mse == 0) Double.PositiveInfinity
        else 10.0 * math.log10(255.0 * 255.0 / (mse / px.length))
      assert(psnr >= 40.0, s"frame $f psnr $psnr")
    }
  }

  test("videoFrames: malformed stream yields a single decode_ok=false row") {
    val df = Seq(("bad", Array.tabulate(512)(_.toByte))).toDF("id", "bytes")
    val rows = Multimodal.videoFrames(df, "id", "bytes").collect()
    assert(rows.length == 1 && !rows.head.decode_ok && rows.head.frame_idx == -1)
  }

  test("videoFrames: a demuxable-but-undecodable frame costs one row, not the task") {
    // frame 0 = real JPEG, frame 1 = bare SOI+EOI (demux-parseable — SOI
    // then the EOI marker closes it — but ImageIO decode throws: no SOF),
    // frame 2 = real JPEG. every=1 so all three are sampled. The guarded
    // per-frame decode must emit decode_ok=false WITH the true extent
    // for frame 1 and still decode frames 0 and 2 (an unguarded lazy
    // decode would fail the whole task instead).
    val f0 = Multimodal.encodeImage(MediaGen.frameImage(42L, 9L, 0), "jpg")
    val f1 = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xd9.toByte)
    val f2 = Multimodal.encodeImage(MediaGen.frameImage(42L, 9L, 1), "jpg")
    val stream = f0 ++ f1 ++ f2
    assert(Multimodal.demuxMjpeg(stream).toSeq ==
      Seq((0, f0.length), (f0.length, 4), (f0.length + 4, f2.length)))
    val df = Seq(("mixed", stream)).toDF("id", "bytes")
    val rows = Multimodal.videoFrames(df, "id", "bytes", every = 1)
      .collect().sortBy(_.frame_idx)
    assert(rows.map(_.frame_idx).toSeq == Seq(0, 1, 2))
    assert(rows(0).decode_ok && rows(2).decode_ok)
    assert(!rows(1).decode_ok &&
      (rows(1).byte_off, rows(1).n_bytes) == (f0.length, 4))
    assert(rows(0).phash == Multimodal.phash64(Multimodal.decodeImage(f0)))
  }
}
