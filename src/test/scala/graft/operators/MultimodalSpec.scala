package graft.operators

import graft.SparkSpec
import graft.operators.Multimodal.{PpmCodec, WavCodec}
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "hello world", "en", "src", 11L),
    (2L, "a" * 100, "en", "src", 100L),
    (11L, "stride fodder", "en", "src", 13L) // nf = 11 % 12 + 2 = 13 → stride 3
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  private lazy val media = Multimodal.y4mFromDocuments(spark, docs)
  private lazy val wavMedia = Multimodal.wavFromDocuments(spark, docs)

  test("media schema: binary content + typed metadata") {
    assert(media.schema("content").dataType.typeName == "binary")
    val m = media.where($"media_id" === 1).select("meta.format", "meta.n_frames").head()
    assert(m.getString(0) == "video/y4m" && m.getInt(1) == 3) // 1 % 12 + 2
    assert(wavMedia.schema("content").dataType.typeName == "binary")
    assert(wavMedia.where($"media_id" === 1).select("meta.format").head().getString(0)
      == "audio/wav")
  }

  test("every media builder emits EXACTLY Multimodal.mediaSchema " +
      "(the declared contract cannot drift from what the stages read)") {
    for (m <- Seq(wavMedia, Multimodal.ppmFromDocuments(spark, docs), media))
      assert(org.apache.spark.sql.types.DataType.equalsIgnoreNullability(
        m.schema, Multimodal.mediaSchema),
        s"builder schema ${m.schema.treeString} != mediaSchema")
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

  test("PpmCodec: encode → decode round-trips dimensions and every pixel") {
    val rgb = Multimodal.gradientPixels(42L, 7, 5)
    val bytes = PpmCodec.encode(7, 5, rgb)
    assert(new String(bytes.take(3), "US-ASCII") == "P6\n")
    val p = PpmCodec.decode(bytes)
    assert(p.width == 7 && p.height == 5)
    assert(p.rgb.toSeq == rgb.toSeq)
  }

  test("PpmCodec property: random images survive encode → decode exactly") {
    val rnd = new scala.util.Random(13)
    (1 to 25).foreach { _ =>
      val w = 1 + rnd.nextInt(24)
      val h = 1 + rnd.nextInt(24)
      val rgb = Array.fill(w * h * 3)(rnd.nextInt(256)) // full 8-bit range
      val p = PpmCodec.decode(PpmCodec.encode(w, h, rgb))
      assert(p.width == w && p.height == h)
      assert(p.rgb.toSeq == rgb.toSeq)
    }
  }

  test("PpmCodec: header comments and arbitrary whitespace tokenize per spec") {
    val rgb = Array.tabulate(2 * 2 * 3)(i => i * 10)
    val canonical = PpmCodec.encode(2, 2, rgb)
    val pixels = canonical.drop("P6\n2 2\n255\n".length)
    val weird = ("P6 # a comment right after the magic\n" +
      "# full-line comment\n  2\t\r\n# another\n2\n255\n").getBytes("US-ASCII") ++ pixels
    val p = PpmCodec.decode(weird)
    assert(p.width == 2 && p.height == 2 && p.rgb.toSeq == rgb.toSeq)
  }

  test("PpmCodec: ASCII PPM, bad maxval, truncation, and crafted dims are refused") {
    val good = PpmCodec.encode(3, 3, Multimodal.gradientPixels(1L, 3, 3))
    // P3 (ASCII) is a different format — refused, not parsed leniently
    val p3 = good.clone(); p3(1) = '3'
    intercept[IllegalArgumentException] { PpmCodec.decode(p3) }
    // 16-bit maxval would change the sample layout — refused, not faked
    intercept[IllegalArgumentException] {
      PpmCodec.decode("P6\n3 3\n65535\n".getBytes("US-ASCII") ++ good.drop(11))
    }
    intercept[IllegalArgumentException] { PpmCodec.decode(good.take(15)) } // truncated pixels
    intercept[IllegalArgumentException] { PpmCodec.decode(good.take(4)) } // truncated header
    // crafted dimensions whose product overflows Int must refuse, not wrap
    intercept[IllegalArgumentException] {
      PpmCodec.decode("P6\n65536 65536\n255\nxxx".getBytes("US-ASCII"))
    }
  }

  test("PpmCodec: integer features match a hand-computed 2x1 case") {
    // pixels: (10,20,30) then (200,10,5) — lums 60 and 215, one edge at >96
    val bytes = PpmCodec.encode(2, 1, Array(10, 20, 30, 200, 10, 5))
    val f = PpmCodec.features(PpmCodec.decode(bytes))
    assert(f.toSeq == Seq(210L, 30L, 35L, 215L, 1L))
    // threshold is exclusive: a diff of exactly 96 is not an edge
    val flat = PpmCodec.encode(2, 1, Array(0, 0, 0, 96, 0, 0))
    assert(PpmCodec.features(PpmCodec.decode(flat)).last == 0L)
  }

  test("PpmCodec: nearest-neighbour resize maps source pixels exactly") {
    val rgb = Multimodal.gradientPixels(9L, 8, 6)
    val resized = PpmCodec.decode(PpmCodec.resize(PpmCodec.encode(8, 6, rgb), 4, 3))
    assert(resized.width == 4 && resized.height == 3)
    // every output pixel equals its ⌊x·srcW/dstW⌋,⌊y·srcH/dstH⌋ source
    for (y <- 0 until 3; x <- 0 until 4; ch <- 0 until 3) {
      val so = ((y * 6 / 3) * 8 + (x * 8 / 4)) * 3 + ch
      assert(resized.rgb((y * 4 + x) * 3 + ch) == rgb(so))
    }
    // upscale repeats source pixels, never interpolates new values
    val up = PpmCodec.decode(PpmCodec.resize(PpmCodec.encode(8, 6, rgb), 16, 6))
    assert(up.rgb((0 * 16 + 1) * 3) == rgb(0), "2x upscale: pixel 1 repeats source 0")
  }

  test("extractImageFeatures: decoded-pixel features over the media table, no shuffle") {
    val docs = spark.range(1, 40).toDF("doc_id")
    val media = Multimodal.ppmFromDocuments(spark, docs)
    val feats = Multimodal.extractImageFeatures(spark, media)
    val rows = feats.collect().map(r => r.getAs[Long]("media_id") -> r).toMap
    assert(rows.size == 39)
    // spot-check id 5 against an independent in-test recompute
    val (w, h) = ((5L % 16 + 4).toInt, (5L % 12 + 4).toInt)
    val f = PpmCodec.features(PpmCodec.Ppm(w, h, Multimodal.gradientPixels(5L, w, h)))
    val r5 = rows(5L)
    assert(r5.getAs[Int]("width") == w && r5.getAs[Int]("height") == h)
    assert(Seq("sum_r", "sum_g", "sum_b", "max_lum", "edge_count")
      .map(r5.getAs[Long]) == f.toSeq)
    assert(r5.getAs[Long]("byte_len") == s"P6\n$w $h\n255\n".length + 3L * w * h)
    // the whole pipeline is narrow: synth → decode → features, zero Exchange
    assert(!feats.queryExecution.executedPlan.toString.contains("Exchange"),
      "image feature extraction must not shuffle")
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

  test("sampleFrames: bounded deterministic fan-out over real decoded frames") {
    val frames = Multimodal.sampleFrames(spark, media, maxFrames = 4).collect()
    val byId = frames.groupBy(_.media_id)
    assert(byId(1L).map(_.frame_idx).sorted.toSeq == Seq(0, 1, 2)) // nf 3, stride 1
    assert(byId(11L).length == 4) // n_frames = 13 → stride 3 → 4 frames
    assert(byId(11L).map(_.frame_idx).sorted.toSeq == Seq(0, 3, 6, 9))
    assert(byId.values.forall(_.length <= 4))
    // each sampled payload is a REAL standalone y4m holding exactly the
    // source video's frame at that index — decodable by the same codec
    val v11 = Multimodal.Y4mCodec.decode(
      media.where($"media_id" === 11).select("content").head().getAs[Array[Byte]](0))
    byId(11L).foreach { fr =>
      val one = Multimodal.Y4mCodec.decode(fr.frame_bytes)
      assert(one.width == v11.width && one.height == v11.height)
      assert(one.frames.length == 1)
      assert(one.frames(0).toSeq == v11.frames(fr.frame_idx).toSeq)
    }
  }

  test("Y4mCodec: encode → decode round-trips dims and every plane sample") {
    val frames = Array.tabulate(5)(Multimodal.videoPlanes(9L, 7, 5, _))
    val v = Multimodal.Y4mCodec.decode(Multimodal.Y4mCodec.encode(7, 5, frames))
    assert(v.width == 7 && v.height == 5 && v.frames.length == 5)
    frames.indices.foreach(f => assert(v.frames(f).toSeq == frames(f).toSeq))
  }

  test("Y4mCodec property: random streams survive encode → decode exactly") {
    val rnd = new scala.util.Random(17)
    (1 to 25).foreach { _ =>
      val w = 1 + rnd.nextInt(12)
      val h = 1 + rnd.nextInt(12)
      val nf = 1 + rnd.nextInt(8)
      val frames = Array.fill(nf)(Array.fill(3 * w * h)(rnd.nextInt(256)))
      val v = Multimodal.Y4mCodec.decode(Multimodal.Y4mCodec.encode(w, h, frames))
      assert(v.width == w && v.height == h && v.frames.length == nf)
      frames.indices.foreach(f => assert(v.frames(f).toSeq == frames(f).toSeq))
    }
  }

  test("Y4mCodec: non-C444, truncated, and poisoned streams dead-letter") {
    val good = Multimodal.Y4mCodec.encode(4, 4, Array(Multimodal.videoPlanes(1L, 4, 4, 0)))
    // default colourspace (no C tag) must be refused, not guessed as 4:2:0
    val no444 = "YUV4MPEG2 W4 H4 F25:1\n".getBytes("US-ASCII") ++ good.drop(
      good.indexOf('\n'.toByte) + 1)
    intercept[IllegalArgumentException](Multimodal.Y4mCodec.decode(no444))
    // truncated mid-frame: the byte count promised by W/H overruns the file
    intercept[IllegalArgumentException](
      Multimodal.Y4mCodec.decode(good.dropRight(5)))
    // a second frame without its FRAME marker
    intercept[IllegalArgumentException](
      Multimodal.Y4mCodec.decode(good ++ Array.fill[Byte](48)(0)))
    // unterminated header line
    intercept[IllegalArgumentException](
      Multimodal.Y4mCodec.decode("YUV4MPEG2 W4 H4 C444".getBytes("US-ASCII")))
    // undelimited magic: a shared 9-byte prefix is not a y4m stream
    intercept[IllegalArgumentException](Multimodal.Y4mCodec.decode(
      ("YUV4MPEG2GARBAGE W4 H4 C444\n" + "FRAME\n").getBytes("US-ASCII")
        ++ Array.fill[Byte](48)(0)))
    // a frameless stream (truncated after the header) dead-letters instead
    // of silently emitting zero rows downstream
    intercept[IllegalArgumentException](Multimodal.Y4mCodec.decode(
      "YUV4MPEG2 W4 H4 F25:1 Ip A1:1 C444\n".getBytes("US-ASCII")))
    // not y4m at all (a WAV asset routed to the video stage)
    intercept[IllegalArgumentException](Multimodal.Y4mCodec.decode(
      WavCodec.encodeMono16(Array(1, 2, 3), 8000)))
    // undelimited FRAME marker: same rationale as the stream magic —
    // "FRAMEGARBAGE\n" is a corrupt stream, not a tagged frame. A tagged
    // frame ("FRAME Xtag\n") still decodes.
    val hdr = new String(good, 0, good.indexOf('\n'.toByte) + 1, "US-ASCII")
    val body = good.drop(hdr.length + "FRAME\n".length)
    intercept[IllegalArgumentException](Multimodal.Y4mCodec.decode(
      hdr.getBytes("US-ASCII") ++ "FRAMEGARBAGE\n".getBytes("US-ASCII") ++ body))
    val tagged = Multimodal.Y4mCodec.decode(
      hdr.getBytes("US-ASCII") ++ "FRAME Xtag\n".getBytes("US-ASCII") ++ body)
    assert(tagged.frames.length == 1 &&
      tagged.frames(0).toSeq == Multimodal.videoPlanes(1L, 4, 4, 0).toSeq)
  }

  test("extractVideoFeatures: per-frame integer features off real decoded planes") {
    val rows = Multimodal.extractVideoFeatures(spark, media)
      .where($"media_id" === 1).orderBy("frame_idx").collect()
    assert(rows.length == 3) // nf = 1 % 12 + 2
    val planes = Array.tabulate(3)(Multimodal.videoPlanes(1L, 5, 5, _))
    val r1 = rows(1)
    assert(r1.getAs[Int]("width") == 5 && r1.getAs[Int]("height") == 5)
    assert(r1.getAs[Long]("sum_y") == planes(1).take(25).map(_.toLong).sum)
    assert(r1.getAs[Long]("sum_u") == planes(1).slice(25, 50).map(_.toLong).sum)
    assert(r1.getAs[Long]("sum_v") == planes(1).slice(50, 75).map(_.toLong).sum)
    assert(r1.getAs[Long]("max_y") == planes(1).take(25).max.toLong)
    assert(r1.getAs[Long]("motion") ==
      (0 until 25).map(i => math.abs(planes(1)(i) - planes(0)(i)).toLong).sum)
    assert(rows(0).getAs[Long]("motion") == 0L) // first frame has no predecessor
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

  test("resizeAll dispatches on meta.format: ppm assets resize as 2-D images, " +
      "unknown formats dead-letter, mixed tables route per row") {
    // an image table through the SAME stage that handles audio — the r16
    // review found the stage decoded everything as WAV, crashing image jobs
    val ppm = Multimodal.ppmFromDocuments(spark, docs)
    val r = Multimodal.resizeAll(spark, ppm, 2, 2).collect()
      .map(row => row.getAs[Long]("media_id") -> row.getAs[Array[Byte]]("resized")).toMap
    val img = Multimodal.PpmCodec.decode(r(1L))
    assert(img.width == 2 && img.height == 2)
    // mixed wav+ppm table: each row routes by its own format
    val mixed = Multimodal.resizeAll(spark, wavMedia.union(ppm), 2, 2).collect()
    assert(mixed.length == docs.count() * 2)
    // a format with no resize fails its row loudly (dead-letter contract)
    val alien = media.limit(1) // video/y4m has no resize
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.resizeAll(spark, alien, 2, 2).collect()
    }
    assert(e.getMessage.contains("no resize") ||
      Option(e.getCause).exists(_.getMessage.contains("no resize")))
  }

  test("sampleFrames rejects maxFrames < 1 at call time, not per-task") {
    val e = intercept[IllegalArgumentException] {
      Multimodal.sampleFrames(spark, media, maxFrames = 0)
    }
    assert(e.getMessage.contains("maxFrames"))
  }
}
