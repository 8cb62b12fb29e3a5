package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `BINARY` columns
  * with typed metadata, plus decode/feature-extract/resize/frame-sample
  * stages. The Spark-side shape — schema, partition-preserving batch
  * transforms, deterministic fan-out — is real and tested, and ALL THREE
  * modalities decode real public containers on executors (no external
  * library; each format is fully specified by its header layout): AUDIO via
  * [[WavCodec]] (RIFF/WAVE integer PCM), IMAGE via [[PpmCodec]] (binary PPM
  * P6), VIDEO via [[Y4mCodec]] (YUV4MPEG2 — plain-text stream header,
  * per-frame `FRAME` markers, raw planar YUV). Feature extraction,
  * resizing/resampling and frame sampling all compute over genuinely decoded
  * samples/pixels/frames.
  */
object Multimodal {

  /** media table schema: one row per asset. The authoritative contract the
    * three builders (`wavFromDocuments`/`ppmFromDocuments`/
    * `y4mFromDocuments`) must emit — MultimodalSpec pins each builder's
    * schema against this value, so it cannot silently drift from what the
    * stages (e.g. [[resizeAll]]'s `meta.format` dispatch) read.
    */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("content", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_frames", IntegerType))))))

  final case class MediaFeatures(media_id: Long, byte_len: Long, features: Seq[Double])
  final case class Frame(media_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  /** Real RIFF/WAVE PCM codec. Parses the RIFF container (`RIFF` size
    * `WAVE`, then even-padded chunks), the `fmt ` chunk (format code 1 =
    * integer PCM only — compressed formats are refused, not faked), and the
    * `data` chunk into raw integer samples: 16-bit signed little-endian or
    * 8-bit unsigned (recentred), mono or interleaved stereo. Encoder writes
    * canonical 44-byte-header 16-bit mono PCM — used by the resampler's
    * output and by test/oracle fixtures.
    */
  object WavCodec {
    /** Decoded PCM audio; `samples` are raw integer amplitudes, interleaved
      * across channels, full scale ±(2^(bits−1)−1).
      */
    final case class Wav(sampleRate: Int, channels: Int, bitsPerSample: Int,
        samples: Array[Int]) {
      def fullScale: Double = ((1 << (bitsPerSample - 1)) - 1).toDouble
      def frames: Int = samples.length / channels
    }

    private def u16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    private def u32(b: Array[Byte], o: Int): Long =
      (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
    private def tag(b: Array[Byte], o: Int): String =
      new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

    /** Parse WAV bytes; throws IllegalArgumentException on anything that is
      * not integer-PCM RIFF/WAVE (a real pipeline dead-letters such rows).
      */
    def decode(bytes: Array[Byte]): Wav = {
      require(bytes.length >= 12 && tag(bytes, 0) == "RIFF" && tag(bytes, 8) == "WAVE",
        s"not a RIFF/WAVE file (${bytes.length} bytes)")
      var off = 12
      var fmt: Option[(Int, Int, Int)] = None // (channels, sampleRate, bits)
      var data: Option[(Int, Int)] = None // (offset, length)
      while (off + 8 <= bytes.length) {
        val id = tag(bytes, off)
        // bounds check in LONG: a crafted/corrupt 32-bit size near 2^31
        // narrowed to Int wraps negative (or wraps the off+8+size sum) and
        // would pass an Int-arithmetic check, turning the promised
        // IllegalArgumentException into an ArrayIndexOutOfBounds deep in the
        // sample loop — or a wrapped offset walking the buffer
        val sizeL = u32(bytes, off + 4)
        require(sizeL <= bytes.length - (off + 8L),
          s"chunk '$id' overruns the file (size $sizeL at offset $off)")
        val size = sizeL.toInt // safe: ≤ bytes.length < 2^31
        id match {
          case "fmt " =>
            require(size >= 16, s"fmt chunk too short ($size bytes)")
            val audioFormat = u16(bytes, off + 8)
            require(audioFormat == 1, s"unsupported WAV format code $audioFormat (PCM=1 only)")
            fmt = Some((u16(bytes, off + 10), u32(bytes, off + 12).toInt, u16(bytes, off + 22)))
          case "data" => data = Some((off + 8, size))
          case _ => () // LIST/INFO/fact etc. — skipped, per the container spec
        }
        off += 8 + size + (size & 1) // chunks are padded to even byte counts
      }
      val (channels, rate, bits) = fmt.getOrElse(
        throw new IllegalArgumentException("missing fmt chunk"))
      val (dOff, dLen) = data.getOrElse(
        throw new IllegalArgumentException("missing data chunk"))
      require(channels == 1 || channels == 2, s"unsupported channel count $channels")
      require(rate > 0, s"invalid sample rate $rate")
      val samples = bits match {
        case 16 =>
          require(dLen % 2 == 0, s"odd data length $dLen for 16-bit PCM")
          Array.tabulate(dLen / 2) { i =>
            // little-endian signed 16-bit
            ((bytes(dOff + 2 * i) & 0xff) | (bytes(dOff + 2 * i + 1) << 8)).toShort.toInt
          }
        case 8 => // 8-bit WAV is UNSIGNED, centred at 128
          Array.tabulate(dLen)(i => (bytes(dOff + i) & 0xff) - 128)
        case b => throw new IllegalArgumentException(s"unsupported bit depth $b (8/16 only)")
      }
      Wav(rate, channels, bits, samples)
    }

    /** Canonical 16-bit mono PCM writer (44-byte header + LE samples). */
    def encodeMono16(samples: Array[Int], sampleRate: Int): Array[Byte] = {
      val dataLen = samples.length * 2
      val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
      bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1) // PCM
        .putShort(1) // mono
        .putInt(sampleRate)
        .putInt(sampleRate * 2) // byte rate
        .putShort(2) // block align
        .putShort(16) // bits
      bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
      samples.foreach(s => bb.putShort(s.toShort))
      bb.array()
    }

    /** Scalar features over the decoded samples — duration (s), RMS, peak
      * (both normalized to full scale), zero-crossing COUNT. Per-term shapes
      * chosen to match the closed-form oracle exactly: v²/fs² summed then
      * averaged, crossings counted as sign-bit changes between consecutive
      * samples. The crossing feature is deliberately the exact integer
      * count, not the rate: rate = count/frames can land EXACTLY on a
      * decimal rounding midpoint (e.g. 41/640 = 0.0640625), where two
      * engines' round-half-up implementations legitimately disagree on the
      * nearest double — an integer is float-exact in any engine. Callers
      * wanting the rate divide by [[Wav.frames]] themselves. Duration and
      * peak cannot hit midpoints (denominators 8000·k and 32767 admit none).
      */
    def features(w: Wav): Array[Double] = {
      val n = w.samples.length
      val fs2 = w.fullScale * w.fullScale
      var sumSq = 0.0; var peak = 0; var crossings = 0; var i = 0
      while (i < n) {
        val v = w.samples(i)
        sumSq += v.toDouble * v / fs2
        if (math.abs(v) > peak) peak = math.abs(v)
        if (i > 0 && ((w.samples(i - 1) < 0) != (v < 0))) crossings += 1
        i += 1
      }
      Array(
        w.frames.toDouble / w.sampleRate,
        if (n == 0) 0.0 else math.sqrt(sumSq / n),
        peak / w.fullScale,
        crossings.toDouble)
    }

    /** Nearest-neighbour resample to `targetFrames` output frames (decode →
      * index-map → re-encode; stereo is mixed to mono by averaging the
      * frame's channels first). The real public algorithm — src index =
      * ⌊i·srcFrames/dstFrames⌋ — not a byte-slice fake.
      */
    def resample(bytes: Array[Byte], targetFrames: Int): Array[Byte] = {
      val w = decode(bytes)
      require(targetFrames > 0, s"invalid target frame count $targetFrames")
      // a structurally valid zero-frame WAV (empty data chunk) has no sample
      // to map any output index to — dead-letter it like decode's contract,
      // instead of an ArrayIndexOutOfBounds deep in the tabulate
      require(w.frames > 0, "cannot resample a zero-frame WAV")
      val mono: Array[Int] =
        if (w.channels == 1) w.samples
        else Array.tabulate(w.frames)(f => (w.samples(2 * f) + w.samples(2 * f + 1)) / 2)
      // widen 8-bit to 16-bit so the output container is uniform: ×256, not
      // ×258-to-full-scale — the 8-bit range is −128..127 and −128×258 =
      // −33024 would overflow the signed 16-bit sample and wrap positive
      val scaled = if (w.bitsPerSample == 16) mono else mono.map(_ * 256)
      val out = Array.tabulate(targetFrames)(i =>
        scaled((i.toLong * w.frames / targetFrames).toInt))
      encodeMono16(out, w.sampleRate)
    }
  }

  /** Real binary-PPM (P6) codec. The netpbm P6 format is fully specified by
    * its header: `P6`, then whitespace-separated width/height/maxval tokens
    * (with `#`-to-end-of-line comments legal anywhere in the header), ONE
    * whitespace byte, then `width·height` raw big-endian RGB triplets.
    * ASCII PPM (P3), other magics, maxval ≠ 255, and short pixel data are
    * refused, not faked — same dead-letter contract as [[WavCodec]].
    */
  object PpmCodec {
    /** Decoded image; `rgb` is row-major R,G,B interleaved, one Int (0-255)
      * per channel sample, length `width·height·3`.
      */
    final case class Ppm(width: Int, height: Int, rgb: Array[Int])

    /** Parse P6 bytes; throws IllegalArgumentException on anything that is
      * not an 8-bit binary PPM.
      */
    def decode(bytes: Array[Byte]): Ppm = {
      require(bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6',
        s"not a binary PPM (P6) file (${bytes.length} bytes)")
      var off = 2
      def isWs(b: Byte) = b == ' ' || b == '\t' || b == '\n' || b == '\r'
      // one header integer token, skipping whitespace and # comments
      def nextInt(what: String): Int = {
        var inComment = false
        while (off < bytes.length &&
          (inComment || isWs(bytes(off)) || bytes(off) == '#')) {
          if (inComment) { if (bytes(off) == '\n') inComment = false }
          else if (bytes(off) == '#') inComment = true
          off += 1
        }
        val start = off
        while (off < bytes.length && bytes(off) >= '0' && bytes(off) <= '9') off += 1
        require(off > start, s"malformed PPM header: expected $what at offset $start")
        require(off - start <= 9, s"malformed PPM header: $what token too long")
        new String(bytes, start, off - start, "US-ASCII").toInt
      }
      val width = nextInt("width")
      val height = nextInt("height")
      val maxval = nextInt("maxval")
      require(width > 0 && height > 0, s"invalid PPM dimensions ${width}x$height")
      require(maxval == 255, s"unsupported PPM maxval $maxval (8-bit only)")
      require(off < bytes.length && isWs(bytes(off)),
        "malformed PPM header: missing single whitespace before pixel data")
      off += 1
      // Long arithmetic: width·height·3 can exceed Int range for crafted dims
      val need = width.toLong * height * 3
      require(need <= bytes.length - off.toLong,
        s"PPM pixel data overruns the file (need $need bytes at offset $off)")
      val n = need.toInt // safe: ≤ bytes.length < 2^31
      val rgb = new Array[Int](n)
      var i = 0
      while (i < n) { rgb(i) = bytes(off + i) & 0xff; i += 1 }
      Ppm(width, height, rgb)
    }

    /** Canonical P6 writer (`P6\nW H\n255\n` + raw triplets). */
    def encode(width: Int, height: Int, rgb: Array[Int]): Array[Byte] = {
      require(rgb.length == width * height * 3,
        s"rgb length ${rgb.length} != ${width}x${height}x3")
      val header = s"P6\n$width $height\n255\n".getBytes("US-ASCII")
      val out = new Array[Byte](header.length + rgb.length)
      System.arraycopy(header, 0, out, 0, header.length)
      var i = 0
      while (i < rgb.length) { out(header.length + i) = rgb(i).toByte; i += 1 }
      out
    }

    /** Scalar features over the decoded pixels, ALL integer-valued (an
      * integer is float-exact in any engine — the WAV leg's midpoint lesson,
      * [[WavCodec.features]]): per-channel sums, max luminance (r+g+b), and
      * a horizontal edge count — adjacent-in-row pixel pairs whose absolute
      * luminance difference exceeds `edgeThreshold`.
      */
    def features(p: Ppm, edgeThreshold: Int = 96): Array[Long] = {
      var sumR = 0L; var sumG = 0L; var sumB = 0L; var maxLum = 0L; var edges = 0L
      var y = 0
      while (y < p.height) {
        var x = 0
        var prevLum = -1L
        while (x < p.width) {
          val o = (y * p.width + x) * 3
          val r = p.rgb(o); val g = p.rgb(o + 1); val b = p.rgb(o + 2)
          sumR += r; sumG += g; sumB += b
          val lum = (r + g + b).toLong
          if (lum > maxLum) maxLum = lum
          if (x > 0 && math.abs(lum - prevLum) > edgeThreshold) edges += 1
          prevLum = lum
          x += 1
        }
        y += 1
      }
      Array(sumR, sumG, sumB, maxLum, edges)
    }

    /** Nearest-neighbour resize to `dstW`×`dstH` (decode → index-map →
      * re-encode): src x = ⌊x·srcW/dstW⌋, src y = ⌊y·srcH/dstH⌋ — the real
      * public algorithm, [[WavCodec.resample]]'s 2-D twin.
      */
    def resize(bytes: Array[Byte], dstW: Int, dstH: Int): Array[Byte] = {
      require(dstW > 0 && dstH > 0, s"invalid resize target ${dstW}x$dstH")
      val p = decode(bytes)
      val out = new Array[Int](dstW * dstH * 3)
      var y = 0
      while (y < dstH) {
        val sy = (y.toLong * p.height / dstH).toInt
        var x = 0
        while (x < dstW) {
          val sx = (x.toLong * p.width / dstW).toInt
          val so = (sy * p.width + sx) * 3
          val o = (y * dstW + x) * 3
          out(o) = p.rgb(so); out(o + 1) = p.rgb(so + 1); out(o + 2) = p.rgb(so + 2)
          x += 1
        }
        y += 1
      }
      encode(dstW, dstH, out)
    }
  }

  /** Real YUV4MPEG2 (y4m) codec. The y4m container is fully specified by its
    * plain-text headers: a stream header line `YUV4MPEG2` followed by
    * space-separated parameter tags (`W<width>`, `H<height>`, frame-rate
    * `F<num>:<den>`, interlacing `I<.>`, aspect `A<num>:<den>`, colourspace
    * `C<name>`, comments `X<..>`) terminated by 0x0A, then per frame a
    * `FRAME` line (its own optional tags, same terminator) and the raw
    * planar YUV bytes. Only `C444` (one full-resolution byte per channel per
    * pixel, no chroma subsampling) is accepted: the container's DEFAULT
    * colourspace is 4:2:0, so an absent or different `C` tag is refused, not
    * guessed — same dead-letter contract as [[WavCodec]]/[[PpmCodec]].
    */
  object Y4mCodec {
    /** Decoded video; each frame is its three planes concatenated
      * (Y then U then V, row-major, one Int 0-255 per sample), length
      * `3·width·height`.
      */
    final case class Y4m(width: Int, height: Int, frames: Array[Array[Int]])

    /** Parse y4m bytes; throws IllegalArgumentException on anything that is
      * not an 8-bit C444 YUV4MPEG2 stream.
      */
    def decode(bytes: Array[Byte]): Y4m = {
      val magic = "YUV4MPEG2".getBytes("US-ASCII")
      // the magic must be DELIMITED (space before tags, or newline for a
      // bare header): a 9-byte prefix match alone would accept
      // "YUV4MPEG2GARBAGE …" with the residue silently dropped as an
      // unknown tag — decoded instead of dead-lettered
      require(bytes.length > magic.length &&
        magic.indices.forall(i => bytes(i) == magic(i)) &&
        (bytes(magic.length) == ' ' || bytes(magic.length) == '\n'),
        s"not a YUV4MPEG2 file (${bytes.length} bytes)")
      var off = magic.length
      def lineEnd(from: Int): Int = {
        var i = from
        while (i < bytes.length && bytes(i) != '\n') i += 1
        require(i < bytes.length, "malformed y4m: unterminated header line")
        i
      }
      val hdrEnd = lineEnd(off)
      var width = -1; var height = -1; var colourspace = ""
      new String(bytes, off, hdrEnd - off, "US-ASCII").trim.split(" ")
        .filter(_.nonEmpty).foreach { tok =>
          def num(what: String): Int = {
            val digits = tok.drop(1)
            require(digits.nonEmpty && digits.length <= 9 &&
              digits.forall(c => c >= '0' && c <= '9'),
              s"malformed y4m header: bad $what tag '$tok'")
            digits.toInt
          }
          tok.charAt(0) match {
            case 'W' => width = num("width")
            case 'H' => height = num("height")
            case 'C' => colourspace = tok.drop(1)
            case _ => () // F/I/A/X — legal, irrelevant to decoding C444 planes
          }
        }
      require(width > 0 && height > 0, s"invalid y4m dimensions ${width}x$height")
      require(colourspace == "444",
        s"unsupported y4m colourspace '$colourspace' (C444 only; the default 4:2:0 is refused, not guessed)")
      off = hdrEnd + 1
      // Long arithmetic: 3·w·h can exceed Int range for crafted dims
      val frameLenL = 3L * width * height
      val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Int]]
      val fm = "FRAME".getBytes("US-ASCII")
      while (off < bytes.length) {
        // the marker must be DELIMITED (space before frame tags, or newline
        // for a bare marker) — same rationale as the stream magic above:
        // "FRAMEGARBAGE\n" is a corrupt stream, not a tagged frame
        require(off + fm.length < bytes.length &&
          fm.indices.forall(i => bytes(off + i) == fm(i)) &&
          (bytes(off + fm.length) == ' ' || bytes(off + fm.length) == '\n'),
          s"malformed y4m: expected FRAME marker at offset $off")
        off = lineEnd(off + fm.length) + 1
        require(frameLenL <= bytes.length - off.toLong,
          s"y4m frame data overruns the file (need $frameLenL bytes at offset $off)")
        val n = frameLenL.toInt // safe: ≤ bytes.length < 2^31
        val plane = new Array[Int](n)
        var i = 0
        while (i < n) { plane(i) = bytes(off + i) & 0xff; i += 1 }
        frames += plane
        off += n
      }
      // a header with no frames is a truncated stream (all frame data
      // lost), and letting it through would silently emit ZERO feature/
      // sample rows for the asset — dead-letter, don't vanish
      require(frames.nonEmpty, "y4m stream carries no frames")
      Y4m(width, height, frames.toArray)
    }

    /** Canonical C444 writer: `YUV4MPEG2 W.. H.. F25:1 Ip A1:1 C444\n`, then
      * `FRAME\n` + raw planes per frame.
      */
    def encode(width: Int, height: Int, frames: Array[Array[Int]]): Array[Byte] = {
      val frameLen = 3 * width * height
      require(frames.forall(_.length == frameLen),
        s"frame plane length != ${width}x${height}x3")
      val header = s"YUV4MPEG2 W$width H$height F25:1 Ip A1:1 C444\n".getBytes("US-ASCII")
      val out = new Array[Byte](header.length + frames.length * (6 + frameLen))
      System.arraycopy(header, 0, out, 0, header.length)
      val fm = "FRAME\n".getBytes("US-ASCII")
      var o = header.length
      frames.foreach { fr =>
        System.arraycopy(fm, 0, out, o, 6)
        o += 6
        var i = 0
        while (i < frameLen) { out(o + i) = fr(i).toByte; i += 1 }
        o += frameLen
      }
      out
    }

    /** Per-frame scalar features, ALL integer-valued (the WAV leg's midpoint
      * lesson, [[WavCodec.features]]): per-plane sums, max luma, and motion —
      * the sum of absolute luma differences against the previous frame (0
      * for the first frame), the one genuinely temporal feature.
      */
    def frameFeatures(v: Y4m): Array[Array[Long]] = {
      val n = v.width * v.height
      v.frames.zipWithIndex.map { case (fr, idx) =>
        var sumY = 0L; var sumU = 0L; var sumV = 0L; var maxY = 0L; var motion = 0L
        var i = 0
        while (i < n) {
          val y = fr(i)
          sumY += y; sumU += fr(n + i); sumV += fr(2 * n + i)
          if (y > maxY) maxY = y
          if (idx > 0) motion += math.abs(y - v.frames(idx - 1)(i))
          i += 1
        }
        Array(sumY, sumU, sumV, maxY, motion)
      }
    }
  }

  /** Deterministic audio fixture: an integer sawtooth derived from the id
    * alone — sample_i = (2·((i·freq) mod sr)·32767) div sr − 32767 at
    * sr = 8000 Hz, freq = id mod 400 + 40, n = (id mod 50 + 10)·20 frames.
    * Integer-exact by construction, so the DuckDB oracle recomputes the same
    * samples from this closed form WITHOUT a WAV parser — a hash match on
    * the features proves the encode → RIFF parse → PCM decode round-trip is
    * sample-exact. The SYNTH is the fixture; [[WavCodec.decode]] feeding the
    * features is the component under test.
    */
  def sawtoothSamples(id: Long): Array[Int] = {
    val freq = (id % 400 + 40).toInt
    val n = ((id % 50 + 10) * 20).toInt
    Array.tabulate(n)(i => ((2L * ((i.toLong * freq) % 8000) * 32767L) / 8000L).toInt - 32767)
  }

  /** Audio media table over the documents ids: one real 16-bit mono PCM WAV
    * asset per row (see [[sawtoothSamples]] for the waveform contract).
    */
  def wavFromDocuments(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => (id, WavCodec.encodeMono16(sawtoothSamples(id), 8000))))
      .toDF("media_id", "content")
      .withColumn("meta", struct(
        lit("audio/wav").as("format"), lit(0).as("width"),
        lit(0).as("height"), lit(0).as("n_frames")))
  }

  /** Deterministic image fixture: an integer gradient derived from the id
    * alone — dimensions w = id mod 16 + 4, h = id mod 12 + 4; pixel (x, y)
    * has r = (3x + 7y + id) mod 256, g = (5x + 11y + 2id) mod 256,
    * b = (xy + 13id) mod 256. Integer-exact by construction, so the DuckDB
    * oracle recomputes the same pixels from this closed form WITHOUT a PPM
    * parser — a hash match on the features proves the encode → header
    * parse → pixel decode round-trip is pixel-exact. The SYNTH is the
    * fixture; [[PpmCodec.decode]] feeding the features is the component
    * under test (the WAV leg's methodology, [[sawtoothSamples]]).
    */
  def gradientPixels(id: Long, w: Int, h: Int): Array[Int] = {
    val rgb = new Array[Int](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val o = (y * w + x) * 3
        rgb(o) = ((3L * x + 7L * y + id) % 256).toInt
        rgb(o + 1) = ((5L * x + 11L * y + 2L * id) % 256).toInt
        rgb(o + 2) = ((x.toLong * y + 13L * id) % 256).toInt
        x += 1
      }
      y += 1
    }
    rgb
  }

  /** Image media table over the documents ids: one real binary-PPM asset per
    * row (see [[gradientPixels]] for the pixel contract).
    */
  def ppmFromDocuments(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val w = (id % 16 + 4).toInt
        val h = (id % 12 + 4).toInt
        (id, PpmCodec.encode(w, h, gradientPixels(id, w, h)), w, h)
      })
      .toDF("media_id", "content", "width", "height")
      .select(col("media_id"), col("content"), struct(
        lit("image/ppm").as("format"), col("width"), col("height"),
        lit(1).as("n_frames")).as("meta"))
  }

  /** Deterministic video fixture: an integer per-frame gradient derived from
    * the id alone — dimensions w = id mod 8 + 4, h = id mod 6 + 4,
    * n_frames = id mod 12 + 2; frame f's planes at pixel (x, y) are
    * Y = (3x + 7y + 11f + id) mod 256, U = (5x + 11y + 13f + 2id) mod 256,
    * V = (xy + 17f + 13id) mod 256. Integer-exact by construction, so the
    * DuckDB oracle recomputes the same planes from this closed form WITHOUT
    * a y4m parser — a hash match on the per-frame features proves the
    * encode → header parse → FRAME walk → plane decode round-trip is
    * byte-exact. The SYNTH is the fixture; [[Y4mCodec.decode]] feeding the
    * features is the component under test ([[sawtoothSamples]]'s
    * methodology on the video modality).
    */
  def videoPlanes(id: Long, w: Int, h: Int, f: Int): Array[Int] = {
    val n = w * h
    val out = new Array[Int](3 * n)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val o = y * w + x
        out(o) = ((3L * x + 7L * y + 11L * f + id) % 256).toInt
        out(n + o) = ((5L * x + 11L * y + 13L * f + 2L * id) % 256).toInt
        out(2 * n + o) = ((x.toLong * y + 17L * f + 13L * id) % 256).toInt
        x += 1
      }
      y += 1
    }
    out
  }

  /** Video media table over the documents ids: one real multi-frame C444
    * YUV4MPEG2 asset per row (see [[videoPlanes]] for the plane contract).
    */
  def y4mFromDocuments(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val w = (id % 8 + 4).toInt
        val h = (id % 6 + 4).toInt
        val nf = (id % 12 + 2).toInt
        (id, Y4mCodec.encode(w, h, Array.tabulate(nf)(videoPlanes(id, w, h, _))),
          w, h, nf)
      })
      .toDF("media_id", "content", "width", "height", "n_frames")
      .select(col("media_id"), col("content"), struct(
        lit("video/y4m").as("format"), col("width"), col("height"),
        col("n_frames")).as("meta"))
  }

  /** Video feature extraction: decodes the REAL y4m payload per row and fans
    * out to one row per frame carrying [[Y4mCodec.frameFeatures]]'s integer
    * scalars (partition-preserving, no shuffle — the UDTF shape of
    * [[extractImageFeatures]]).
    */
  def extractVideoFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select("media_id", "content").where(col("content").isNotNull)
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val v = Y4mCodec.decode(bytes)
        Y4mCodec.frameFeatures(v).zipWithIndex.map { case (f, idx) =>
          (id, idx, v.width, v.height, v.frames.length, bytes.length.toLong,
            f(0), f(1), f(2), f(3), f(4))
        }
      }
      .toDF("media_id", "frame_idx", "width", "height", "n_frames", "byte_len",
        "sum_y", "sum_u", "sum_v", "max_y", "motion")
  }

  /** Image feature extraction: decodes the REAL P6 payload per row
    * (partition-preserving, no shuffle — [[extractFeatures]]'s image twin)
    * and emits [[PpmCodec.features]]'s integer scalars as typed columns.
    */
  def extractImageFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select("media_id", "content").where(col("content").isNotNull)
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val p = PpmCodec.decode(bytes)
        val f = PpmCodec.features(p)
        (id, bytes.length.toLong, p.width, p.height, f(0), f(1), f(2), f(3), f(4))
      })
      .toDF("media_id", "byte_len", "width", "height",
        "sum_r", "sum_g", "sum_b", "max_lum", "edge_count")
  }

  /** Feature extraction: batch-at-a-time over partitions (the Scala analog of
    * `mapInPandas` — one codec invocation per row, vectorizable per batch,
    * partitioning preserved, no shuffle). Decodes the REAL WAV payload; a
    * non-WAV asset fails the row's decode loudly (a production pipeline
    * routes those to a dead-letter side output rather than faking features).
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    // null assets are SKIPPED (a real pipeline dead-letters them): the typed
    // decode would otherwise NPE the whole task on one null payload
    media.select("media_id", "content").where(col("content").isNotNull)
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        MediaFeatures(id, bytes.length.toLong,
          WavCodec.features(WavCodec.decode(bytes)).toIndexedSeq)
      })
  }

  /** Frame sampling: fan one asset out to ≤ maxFrames rows (UDTF shape),
    * deterministic stride over the REAL decoded frame count. Each emitted
    * payload is the sampled frame re-encoded as a standalone single-frame
    * y4m — self-describing and decodable by the same codec, so downstream
    * stages treat a sampled frame exactly like any other video asset. A
    * non-y4m asset fails the row's decode loudly (dead-letter contract, as
    * in [[extractFeatures]]).
    */
  def sampleFrames(spark: SparkSession, media: DataFrame, maxFrames: Int = 4): Dataset[Frame] = {
    // rejected HERE, not as a per-task ArithmeticException inside the
    // stride division on every executor (the nShards guard pattern)
    require(maxFrames >= 1, s"sampleFrames: maxFrames must be >= 1, got $maxFrames")
    import spark.implicits._
    media.select(col("media_id"), col("content"))
      .where(col("content").isNotNull) // null assets skipped, as in extractFeatures
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val v = Y4mCodec.decode(bytes)
        val n = v.frames.length
        val stride = math.max(1, n / maxFrames)
        (0 until n by stride).take(maxFrames).map(f =>
          Frame(id, f, Y4mCodec.encode(v.width, v.height, Array(v.frames(f)))))
      }
  }

  /** Resize stage: metadata-driven (dispatches on `meta.format` — the
    * column exists precisely so stages don't have to sniff payload bytes),
    * partition-preserving. Images resize through [[PpmCodec.resize]]
    * (nearest-neighbour 2-D); for audio the "w × h" target (kept for
    * inventory parity with the image shape) is the output FRAME COUNT
    * through [[WavCodec.resample]]. An asset of any other format fails its
    * row loudly (the module's dead-letter contract, as in
    * [[extractFeatures]]) — an earlier revision ignored the format column
    * and decoded EVERYTHING as WAV, crashing whole image/video stages.
    */
  def resizeAll(spark: SparkSession, media: DataFrame, w: Int, h: Int): DataFrame = {
    import spark.implicits._
    media.select(col("media_id"), col("content"), col("meta.format").as("format"))
      .where(col("content").isNotNull)
      .as[(Long, Array[Byte], String)]
      .mapPartitions(_.map { case (id, bytes, format) =>
        val resized = format match {
          case "audio/wav" => WavCodec.resample(bytes, w * h)
          case "image/ppm" => PpmCodec.resize(bytes, w, h)
          case other => throw new IllegalArgumentException(
            s"resizeAll: no resize for format '$other' (media_id=$id)")
        }
        (id, resized)
      })
      .toDF("media_id", "resized")
  }
}
