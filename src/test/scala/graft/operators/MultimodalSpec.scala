package graft.operators

import graft.SparkSpec
import graft.operators.Multimodal.WavCodec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "hello world", "en", "src", 11L),
    (2L, "a" * 100, "en", "src", 100L)
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  private lazy val media = Multimodal.fromDocuments(docs)
  private lazy val wavMedia = Multimodal.wavFromDocuments(spark, docs)

  test("media schema: binary content + typed metadata") {
    assert(media.schema("content").dataType.typeName == "binary")
    val m = media.where($"media_id" === 1).select("meta.format", "meta.n_frames").head()
    assert(m.getString(0) == "fake/rgb8" && m.getInt(1) == 12) // 11 % 16 + 1
    assert(wavMedia.schema("content").dataType.typeName == "binary")
    assert(wavMedia.where($"media_id" === 1).select("meta.format").head().getString(0)
      == "audio/wav")
  }

  test("WavCodec: encode → decode round-trips header fields and every sample") {
    val samples = Multimodal.sawtoothSamples(7L)
    val w = WavCodec.decode(WavCodec.encodeMono16(samples, 8000))
    assert(w.sampleRate == 8000 && w.channels == 1 && w.bitsPerSample == 16)
    assert(w.samples.toSeq == samples.toSeq)
    // negative amplitudes survive the 16-bit little-endian round-trip
    assert(samples.min < 0 && w.samples.min == samples.min)
  }

  test("WavCodec: 8-bit unsigned recentring and chunk walking") {
    // hand-built 8-bit mono file with an extra (skippable) LIST chunk before
    // data; 8-bit WAV stores unsigned bytes centred at 128
    val bb = java.nio.ByteBuffer.allocate(70).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(62).put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(4000).putInt(4000).putShort(1).putShort(8)
    bb.put("LIST".getBytes("US-ASCII")).putInt(6).put("INFOab".getBytes("US-ASCII"))
    bb.put("data".getBytes("US-ASCII")).putInt(4)
      .put(Array[Byte](0, 128.toByte, 255.toByte, 200.toByte))
    val w = WavCodec.decode(bb.array())
    assert(w.sampleRate == 4000 && w.bitsPerSample == 8)
    assert(w.samples.toSeq == Seq(-128, 0, 127, 72))
    // resampling the 8-bit file widens without sign overflow: the
    // full-negative sample must stay full-negative, never wrap positive
    val widened = WavCodec.decode(WavCodec.resample(bb.array(), 4))
    assert(widened.bitsPerSample == 16)
    assert(widened.samples.toSeq == Seq(-32768, 0, 32512, 18432))
  }

  test("WavCodec: 16-bit stereo decode, features, and mono mixdown") {
    // hand-built stereo file: frames (L,R) = (1000,3000), (-2000,-4000),
    // (32767,-32767) — interleaved little-endian
    val frames = Array(1000, 3000, -2000, -4000, 32767, -32767)
    val dataLen = frames.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen).put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(2).putInt(8000).putInt(32000).putShort(4).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    frames.foreach(s => bb.putShort(s.toShort))
    val w = WavCodec.decode(bb.array())
    assert(w.channels == 2 && w.frames == 3 && w.samples.toSeq == frames.toSeq)
    val Seq(dur, _, peak, _) = WavCodec.features(w).toSeq
    assert(dur == 3 / 8000.0) // duration counts FRAMES, not interleaved samples
    assert(peak == 1.0)
    // resample mixes channels per frame: (1000+3000)/2, (-2000-4000)/2,
    // (32767-32767)/2 — then passes through at the same frame count
    val mixed = WavCodec.decode(WavCodec.resample(bb.array(), 3))
    assert(mixed.channels == 1 && mixed.samples.toSeq == Seq(2000, -3000, 0))
  }

  test("WavCodec property: random sample arrays survive encode → decode exactly") {
    val rnd = new scala.util.Random(11)
    (1 to 25).foreach { _ =>
      val n = 1 + rnd.nextInt(400)
      val samples = Array.fill(n)(rnd.nextInt(65536) - 32768) // full signed 16-bit range
      val w = WavCodec.decode(WavCodec.encodeMono16(samples, 8000))
      assert(w.sampleRate == 8000 && w.channels == 1 && w.bitsPerSample == 16)
      assert(w.samples.toSeq == samples.toSeq)
    }
  }

  test("WavCodec: non-PCM, truncated, and non-RIFF payloads are refused") {
    intercept[IllegalArgumentException] {
      WavCodec.decode("not audio at all".getBytes("UTF-8"))
    }
    val good = WavCodec.encodeMono16(Multimodal.sawtoothSamples(3L), 8000)
    intercept[IllegalArgumentException] { WavCodec.decode(good.take(30)) } // truncated
    val nonPcm = good.clone()
    nonPcm(20) = 3 // fmt code 3 = IEEE float — refused, not faked
    intercept[IllegalArgumentException] { WavCodec.decode(nonPcm) }
    // a crafted chunk size near 2^31: Int arithmetic would wrap the
    // off+8+size bound negative and "pass", crashing later with an index
    // error instead of the malformed-input refusal
    val crafted = good.clone()
    crafted(40) = 0xf8.toByte; crafted(41) = 0xff.toByte
    crafted(42) = 0xff.toByte; crafted(43) = 0x7f.toByte // data size = 0x7ffffff8
    val e = intercept[IllegalArgumentException] { WavCodec.decode(crafted) }
    assert(e.getMessage.contains("overruns"))
  }

  test("WavCodec: zero-frame WAV decodes but refuses to resample") {
    val empty = WavCodec.encodeMono16(Array.empty[Int], 8000)
    val w = WavCodec.decode(empty) // structurally valid: header + empty data
    assert(w.frames == 0)
    assert(WavCodec.features(w).toSeq == Seq(0.0, 0.0, 0.0, 0.0))
    // no sample exists to map any output index to — dead-letter, don't crash
    val e = intercept[IllegalArgumentException] {
      WavCodec.resample(empty, targetFrames = 4)
    }
    assert(e.getMessage.contains("zero-frame"))
  }

  test("extractFeatures: real decoded-sample features, deterministic") {
    val f = Multimodal.extractFeatures(spark, wavMedia).collect()
      .map(x => x.media_id -> x).toMap
    val samples1 = Multimodal.sawtoothSamples(1L)
    assert(f(1L).byte_len == 44L + 2L * samples1.length)
    val Seq(dur, rms, peak, zc) = f(1L).features.toSeq
    assert(dur == samples1.length / 8000.0)
    assert(peak == samples1.map(math.abs).max / 32767.0)
    // a sawtooth spends its life mid-ramp: RMS near 1/√3, well off 0 and 1
    assert(rms > 0.4 && rms < 0.7)
    // exact integer crossing count, verified against the raw samples
    val expectedZc = samples1.sliding(2).count(p => (p(0) < 0) != (p(1) < 0))
    assert(zc == expectedZc.toDouble)
    // determinism: same bytes → same features
    val again = Multimodal.extractFeatures(spark, wavMedia).collect()
      .map(x => x.media_id -> x.features).toMap
    assert(again(1L) == f(1L).features)
  }

  test("sampleFrames: bounded deterministic fan-out") {
    val frames = Multimodal.sampleFrames(spark, media, maxFrames = 4).collect()
    val byId = frames.groupBy(_.media_id)
    assert(byId(1L).length == 4) // n_frames = 12 → stride 3 → 4 frames
    assert(byId(1L).map(_.frame_idx).sorted.toSeq == Seq(0, 3, 6, 9))
    assert(byId.values.forall(_.length <= 4))
  }

  test("resizeAll: nearest-neighbour resample to the target frame count") {
    val r = Multimodal.resizeAll(spark, wavMedia, 10, 10).collect()
      .map(row => row.getAs[Long]("media_id") -> row.getAs[Array[Byte]]("resized")).toMap
    val out = WavCodec.decode(r(1L))
    assert(out.frames == 100 && out.sampleRate == 8000 && out.bitsPerSample == 16)
    // each output frame is a REAL source sample at the floor-mapped index
    val src = Multimodal.sawtoothSamples(1L)
    val expected = Array.tabulate(100)(i => src((i.toLong * src.length / 100).toInt))
    assert(out.samples.toSeq == expected.toSeq)
  }
}
