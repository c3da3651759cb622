package graft

import graft.docs.MediaOps
import graft.docs.MediaOps.{DecodedMeta, FakeDecode, MediaDecoder, MediaRow}

/** Executable contract for [[MediaOps.MediaDecoder]] implementations —
  * the conformance kit a real codec (javax.imageio, ffmpeg bindings, …)
  * must pass BEFORE being swapped in through the seam (VERDICT r12
  * "what's missing" #3).
  *
  * Usage for a real implementation:
  * {{{
  * class ImageIoDecodeConformance
  *   extends MediaDecoderConformance("ImageIoDecode", ImageIoDecode)
  * }}}
  *
  * The properties are exactly the assumptions the Spark plumbing makes:
  *
  *  - '''total''': decode never throws — not on empty, truncated,
  *    full-byte-domain garbage, or a null payload cell. At 100 TB one
  *    corrupt item must degrade to a row, not kill the decode pass;
  *    codec exceptions must be wrapped into a result by the impl.
  *  - '''deterministic''': same bytes → same DecodedMeta, on re-decode
  *    and across a java-serialization round-trip of the decoder itself
  *    (executor tasks decode with a DESERIALIZED copy of the instance —
  *    determinism of the original alone is not the property the cluster
  *    relies on).
  *  - '''honest''': media_id/kind pass through untouched, byte_len is
  *    the payload length, declared dims are positive and bounded.
  *  - '''non-mutating''': the payload array is read, never written (rows
  *    may be shared/reused by the runtime).
  *  - '''Spark-path parity''': decoding through the real
  *    `mapPartitions` plumbing ([[MediaOps.decodeStub]]) equals local
  *    decode — closure serialization, encoders, and partition batching
  *    change nothing.
  */
abstract class MediaDecoderConformance(decoderName: String,
                                       decoder: MediaDecoder)
    extends SparkSpec {

  /** Adversarial payload set: empty, single bytes incl. >=0x80, a
    * truncated prefix, the full byte domain, a large pseudo-random body,
    * and a null cell. Real-codec subclasses may append valid encoded
    * samples via [[extraPayloads]]. */
  private def basePayloads: Seq[Array[Byte]] = Seq(
    Array.empty[Byte],
    Array[Byte](0),
    Array[Byte](-1), // 0xff — the signed-byte trap
    "plain ascii text".getBytes("UTF-8"),
    "plain ascii text".getBytes("UTF-8").take(5), // truncated prefix
    Array.tabulate(256)(i => i.toByte), // full byte domain
    Array.tabulate(10000)(i => (i * 31 + 7).toByte), // large garbage
    null,
  )

  /** Hook for real-codec suites: valid encoded samples of the formats
    * the implementation claims to support. */
  protected def extraPayloads: Seq[Array[Byte]] = Seq.empty

  private val kinds = Seq("image", "audio", "video")
  private def rows: Seq[MediaRow] =
    (basePayloads ++ extraPayloads).zipWithIndex.map { case (p, i) =>
      MediaRow(i.toLong, kinds(i % kinds.size), p)
    }

  private def roundTrip(d: MediaDecoder): MediaDecoder = {
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(d); oos.close()
    new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray))
      .readObject().asInstanceOf[MediaDecoder]
  }

  test(s"$decoderName: decode is total — no payload (incl. null/truncated/garbage) throws") {
    rows.foreach { r =>
      val out = try decoder.decode(r) catch {
        case e: Throwable =>
          fail(s"decode threw on payload #${r.media_id} " +
            s"(${Option(r.payload).map(_.length.toString).getOrElse("null")} bytes): $e")
      }
      assert(out != null)
    }
  }

  test(s"$decoderName: decode is deterministic, including across a serialization round-trip") {
    val copied = roundTrip(decoder)
    rows.foreach { r =>
      val a = decoder.decode(r)
      assert(decoder.decode(r) == a, s"re-decode of #${r.media_id} diverged")
      assert(copied.decode(r) == a,
        s"deserialized-decoder decode of #${r.media_id} diverged — executors would disagree with the driver")
    }
  }

  test(s"$decoderName: identity passes through, byte_len is honest, dims are positive and bounded") {
    rows.foreach { r =>
      val out = decoder.decode(r)
      assert(out.media_id == r.media_id && out.kind == r.kind,
        s"#${r.media_id}: identity columns must pass through untouched")
      val len = Option(r.payload).map(_.length.toLong).getOrElse(0L)
      assert(out.byte_len == len, s"#${r.media_id}: byte_len ${out.byte_len} != payload length $len")
      assert(out.width >= 1 && out.height >= 1,
        s"#${r.media_id}: declared dims must be positive (${out.width}x${out.height})")
      assert(out.channels >= 1 && out.channels <= 16,
        s"#${r.media_id}: channels ${out.channels} outside [1, 16]")
    }
  }

  test(s"$decoderName: decode does not mutate the payload") {
    rows.filter(_.payload != null).foreach { r =>
      val before = r.payload.clone()
      decoder.decode(r)
      assert(java.util.Arrays.equals(r.payload, before),
        s"#${r.media_id}: payload bytes changed during decode")
    }
  }

  test(s"$decoderName: mapPartitions path (decodeStub) agrees with local decode") {
    val expected = rows.map(decoder.decode).sortBy(_.media_id)
    val df = spark.createDataFrame(rows)
    val got: Seq[DecodedMeta] =
      MediaOps.decodeStub(df, decoder).collect().toSeq.sortBy(_.media_id)
    assert(got == expected,
      "decode through the Spark plumbing must equal local decode")
  }
}

/** The reference instance: the sandbox stand-in decoder must itself obey
  * the contract it documents. */
class FakeDecodeConformance
    extends MediaDecoderConformance("FakeDecode", FakeDecode)

/** The REAL-codec instance (VERDICT r13 item #6): the seam proven
  * against the JDK-bundled `javax.imageio` readers, not just the fake.
  * Valid PNG/BMP/GIF samples are synthesized in-test via `ImageIO.write`
  * (deterministic pixel fill — no fixtures, no net), appended to the
  * adversarial payload set through [[MediaDecoderConformance.extraPayloads]],
  * and additionally checked for TRUE decoded dimensions — a property the
  * fake can't exhibit. */
class ImageIoDecodeConformance
    extends MediaDecoderConformance("ImageIoDecode", MediaOps.ImageIoDecode) {

  private def encoded(fmt: String, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until w).foreach(x => (0 until h).foreach(y =>
      img.setRGB(x, y, ((x * 31 + y * 7) % 255) << 8)))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, bos),
      s"JDK has no $fmt writer — sample synthesis failed")
    bos.toByteArray
  }

  private lazy val samples: Seq[(String, Int, Int, Array[Byte])] = Seq(
    ("png", 3, 2, encoded("png", 3, 2)),
    ("bmp", 5, 4, encoded("bmp", 5, 4)),
    ("gif", 2, 7, encoded("gif", 2, 7)))

  override protected def extraPayloads: Seq[Array[Byte]] =
    samples.map(_._4)

  test("ImageIoDecode: real encoded images decode to their true dimensions") {
    samples.foreach { case (fmt, w, h, bytes) =>
      val out = MediaOps.ImageIoDecode.decode(
        MediaOps.MediaRow(99L, "image", bytes))
      assert(out.width == w && out.height == h,
        s"$fmt: decoded ${out.width}x${out.height}, encoded ${w}x$h")
      assert(out.channels >= 1 && out.byte_len == bytes.length)
    }
  }

  test("ImageIoDecode: garbage payloads land on the 1x1x1 sentinel, not an exception") {
    val out = MediaOps.ImageIoDecode.decode(
      MediaOps.MediaRow(7L, "image", Array.tabulate(64)(i => (i * 13 + 5).toByte)))
    assert(out.width == 1 && out.height == 1 && out.channels == 1 &&
      out.byte_len == 64)
  }
}

/** The real AUDIO codec instance: the seam proven against the
  * JDK-bundled `javax.sound.sampled` WAV reader. Samples synthesized
  * in-test (deterministic PCM ramp via `AudioSystem.write`), with the
  * pinned audio→DecodedMeta mapping checked against the true header
  * values (rate/frames/channels). */
class WavDecodeConformance
    extends MediaDecoderConformance("WavDecode", MediaOps.WavDecode) {

  private def wav(rateHz: Int, channels: Int, frames: Int): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(rateHz.toFloat, 16,
      channels, true, false)
    val pcm = Array.tabulate(frames * channels * 2)(i => (i * 17 + 3).toByte)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  private lazy val samples: Seq[(Int, Int, Int, Array[Byte])] = Seq(
    (8000, 1, 160, wav(8000, 1, 160)),
    (44100, 2, 441, wav(44100, 2, 441)))

  override protected def extraPayloads: Seq[Array[Byte]] =
    samples.map(_._4)

  test("WavDecode: real WAV headers decode to their true rate/frames/channels") {
    samples.foreach { case (rate, ch, frames, bytes) =>
      val out = MediaOps.WavDecode.decode(
        MediaOps.MediaRow(42L, "audio", bytes))
      assert(out.width == rate && out.height == frames && out.channels == ch,
        s"decoded (${out.width}, ${out.height}, ${out.channels}), " +
          s"encoded ($rate, $frames, $ch)")
      assert(out.byte_len == bytes.length)
    }
  }

  test("WavDecode: an image payload degrades to the sentinel, not an exception") {
    val png = {
      val img = new java.awt.image.BufferedImage(
        2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val out = MediaOps.WavDecode.decode(MediaOps.MediaRow(8L, "audio", png))
    assert(out.width == 1 && out.height == 1 && out.channels == 1)
  }
}
