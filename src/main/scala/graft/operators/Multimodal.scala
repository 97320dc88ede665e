package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque binary payloads with typed metadata,
  * batch decode / feature-extraction over mapPartitions.
  *
  * The reference's image pipeline (mr/EmdGenerate.java:109-172, HIPI/Lire)
  * reduces to: binary in, per-item features out. Two decode paths:
  *
  * - REAL: a full binary PPM (P6) codec — `encodePpm`/`decodePpm` parse
  *   the actual file format byte-for-byte (header with whitespace and
  *   comment handling, maxval check, raw RGB plane), and
  *   `decodeColorHist` turns decoded pixels into the per-channel color
  *   histograms the reference's Lire featurizer produces. The whole
  *   encode -> decode -> histogram lifecycle is DuckDB-hash-checked
  *   (`q_image_hist`).
  * - REAL, COMPRESSED: a pure-JVM baseline JFIF codec ([[Jpeg]]) —
  *   Huffman + dequant + IDCT decode (1/3-component, 4:2:0-capable,
  *   restart markers) cross-checked against the JDK's independent
  *   ImageIO implementation, plus a grayscale encoder whose
  *   constant-block synthesis is exactly lossless, making the lossy
  *   format DuckDB-hash-checkable (`q_jpeg_hist`). RIFF/WAV PCM audio
  *   is likewise a real chunk-walking codec (`q_audio_rms`).
  * - STUB: `decodeFeatures` (byte histogram + entropy) stands in for
  *   the remaining codec-dependent formats (PNG inflate, video
  *   containers); everything around it — binary column schema,
  *   partition-batched execution, feature schema, downstream joins —
  *   is real and tested.
  */
object Multimodal {

  /** Encode raw RGB pixels as a binary PPM (P6) image — a real,
    * externally-readable file format (any image tool opens it). */
  def encodePpm(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == 3 * width * height,
      s"rgb length ${rgb.length} != 3*$width*$height")
    val header = s"P6\n$width $height\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + rgb.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(rgb, 0, out, header.length, rgb.length)
    out
  }

  /** Parse a binary PPM (P6): magic, whitespace/comment-tolerant header
    * (width, height, maxval <= 255), one whitespace, then the raw RGB
    * plane. Returns None for malformed payloads — a decoder must reject,
    * not crash, at corpus scale. */
  def decodePpm(payload: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    var pos = 0
    def atEnd = pos >= payload.length
    def skipWsAndComments(): Unit = {
      var go = true
      while (go && !atEnd) {
        val c = payload(pos)
        if (c == ' ' || c == '\t' || c == '\n' || c == '\r') pos += 1
        else if (c == '#') { while (!atEnd && payload(pos) != '\n') pos += 1 }
        else go = false
      }
    }
    def readInt(): Option[Int] = {
      skipWsAndComments()
      var v = 0L
      var any = false
      while (!atEnd && payload(pos) >= '0' && payload(pos) <= '9') {
        v = v * 10 + (payload(pos) - '0'); any = true; pos += 1
        if (v > Int.MaxValue) return None
      }
      if (any) Some(v.toInt) else None
    }
    if (payload.length < 2 || payload(0) != 'P' || payload(1) != '6') return None
    pos = 2
    for {
      w <- readInt()
      h <- readInt()
      maxval <- readInt()
      if w > 0 && h > 0 && maxval > 0 && maxval <= 255
      // exactly one whitespace byte separates header and pixel data
      if !atEnd && (payload(pos) == '\n' || payload(pos) == ' ' ||
        payload(pos) == '\t' || payload(pos) == '\r')
      _ = { pos += 1 }
      if payload.length - pos >= 3L * w * h
    } yield (w, h, java.util.Arrays.copyOfRange(payload, pos, pos + 3 * w * h))
  }

  /** Per-channel `bins`-bucket color histograms of decoded RGB pixels,
    * L1-normalized — the Lire-style feature the reference joins on. */
  def decodeColorHist(rgb: Array[Byte], bins: Int = 8): Array[Array[Double]] = {
    val shift = Integer.numberOfTrailingZeros(256 / bins)
    val hist = Array.ofDim[Double](3, bins)
    var i = 0
    while (i < rgb.length) {
      hist(i % 3)((rgb(i) & 0xff) >> shift) += 1.0
      i += 1
    }
    val n = (rgb.length / 3).toDouble
    var c = 0
    while (c < 3) {
      var b = 0
      while (b < bins) { hist(c)(b) /= n; b += 1 }
      c += 1
    }
    hist
  }

  /** Nearest-neighbor resize of an RGB plane (the reference's Lire
    * pre-scale step; deterministic, no filtering kernel). */
  def resizeRgb(w: Int, h: Int, rgb: Array[Byte],
                newW: Int, newH: Int): Array[Byte] = {
    val out = new Array[Byte](3 * newW * newH)
    var y = 0
    while (y < newH) {
      val sy = (y.toLong * h / newH).toInt
      var x = 0
      while (x < newW) {
        val sx = (x.toLong * w / newW).toInt
        val src = 3 * (sy * w + sx)
        val dst = 3 * (y * newW + x)
        out(dst) = rgb(src); out(dst + 1) = rgb(src + 1); out(dst + 2) = rgb(src + 2)
        x += 1
      }
      y += 1
    }
    out
  }

  val ImgW = 16
  val ImgH = 16

  /** Deterministic synthetic image per document: the utf-8 text bytes
    * cycled into a 16x16 RGB plane, encoded as a REAL PPM file. Stands in
    * for an image blob column read via spark.read.format("binaryFile") —
    * but unlike an opaque fake, every payload is a valid image any
    * external tool can open, and the decode path exercises a real
    * byte-level parser. */
  def withImagePayload(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          // empty text -> black image, not a modulo-by-zero crash (the
          // module contract: reject/degrade per row, never abort the job)
          val raw = text.getBytes("UTF-8")
          val src = if (raw.isEmpty) Array[Byte](0) else raw
          val rgb = new Array[Byte](3 * ImgW * ImgH)
          var i = 0
          while (i < rgb.length) { rgb(i) = src(i % src.length); i += 1 }
          (id, encodePpm(ImgW, ImgH, rgb))
        }
      }.toDF("doc_id", "payload")
      .withColumn("meta", struct(
        length(col("payload")).as("n_bytes"), lit("image/x-portable-pixmap").as("mime")))
  }

  /** Full image lifecycle: PPM payload -> real decode -> red-channel
    * 8-bin color histogram, long format (doc_id, bin, w). Malformed
    * payloads are dropped (decoder rejects). DuckDB-checkable because the
    * synthetic pixel plane is an analytic function of the text. */
  def imageRedHist(spark: SparkSession, withPayloadDf: DataFrame): DataFrame = {
    import spark.implicits._
    withPayloadDf.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        decodePpm(payload).toSeq.flatMap { case (_, _, rgb) =>
          val hist = decodeColorHist(rgb)
          hist(0).zipWithIndex.map { case (w, b) => (id, b.toLong, w) }
        }
      }.toDF("doc_id", "bin", "w")
  }

  /** Full resize/recompress lifecycle: PPM payload -> real decode ->
    * nearest-neighbor resize -> RE-ENCODE as PPM -> decode again ->
    * red-channel 8-bin histogram (L1-normalized over the resized plane).
    * The re-encode/decode roundtrip is pixel-identity but drives the
    * encoder on the hot path — the recompress step of a real pipeline.
    * DuckDB-checkable: nearest-neighbor picks source pixel
    * (x*w/newW, y*h/newH) with integer floor, so every resized byte is
    * still an analytic function of the text. */
  def imageResizeHist(spark: SparkSession, withPayloadDf: DataFrame,
                      newW: Int = 9, newH: Int = 9): DataFrame = {
    import spark.implicits._
    withPayloadDf.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        for {
          (w, h, rgb) <- decodePpm(payload).toSeq
          reencoded = encodePpm(newW, newH, resizeRgb(w, h, rgb, newW, newH))
          (_, _, rgb2) <- decodePpm(reencoded).toSeq
          (wv, b) <- decodeColorHist(rgb2)(0).zipWithIndex
        } yield (id, b.toLong, wv)
      }.toDF("doc_id", "bin", "w")
  }

  /** Perceptual average-hash (aHash) of the decoded image: real decode,
    * nearest-neighbor downsample to 8x8, red-plane mean threshold
    * (strict `64*v > sum` — integer cross-multiplication, tie-free in
    * both engines), 64 bits packed LITTLE-endian by raster index into
    * (hash_hi, hash_lo) 32-bit halves (BIGINT-safe in SQL — a single
    * 64-bit pack would shift into the sign bit). The standard
    * image-dedup key: identical-looking images collide, and a Hamming
    * ball around the hash is the classic near-dup relaxation (the
    * simhash banding machinery applies unchanged). Malformed payloads
    * are dropped (decoder rejects). DuckDB-checkable end-to-end because
    * the downsampled red plane stays an analytic function of the text. */
  def imagePerceptualHash(spark: SparkSession,
                          withPayloadDf: DataFrame): DataFrame = {
    import spark.implicits._
    withPayloadDf.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        decodePpm(payload).toSeq.map { case (w, h, rgb) =>
          val small = resizeRgb(w, h, rgb, 8, 8)
          val red = Array.tabulate(64)(i => small(3 * i) & 0xff)
          val sum = red.map(_.toLong).sum
          var hi = 0L
          var lo = 0L
          var i = 0
          while (i < 64) {
            if (64L * red(i) > sum) {
              if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
            }
            i += 1
          }
          (id, hi, lo)
        }
      }.toDF("doc_id", "hash_hi", "hash_lo")
  }

  // ==== Audio (RIFF/WAVE, PCM s16le mono) — the waveform analog of the
  // PPM path: a real, externally-playable uncompressed format, so the
  // decode path exercises genuine chunk-walking byte parsing while the
  // synthesized samples stay an analytic function of the text (DuckDB
  // replays them; compressed codecs remain behind the stub seam). ====

  /** Encode mono 16-bit PCM as a real RIFF/WAVE file (s16le): RIFF
    * header, canonical 16-byte PCM fmt chunk, data chunk. */
  def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = 2 * samples.length
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(sampleRate)
      .putInt(sampleRate * 2).putShort(2).putShort(16)
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < samples.length) { buf.putShort(samples(i)); i += 1 }
    buf.array()
  }

  /** Parse a RIFF/WAVE payload: walks chunks word-aligned (tolerant of
    * extras like LIST/INFO), requires a PCM mono 16-bit fmt chunk before
    * the data chunk. Returns None for malformed payloads — reject, not
    * crash, at corpus scale. */
  def decodeWav(payload: Array[Byte]): Option[(Int, Array[Short])] = {
    if (payload.length < 12) return None
    val buf = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag4(at: Int) = new String(payload, at, 4, "US-ASCII")
    if (tag4(0) != "RIFF" || tag4(8) != "WAVE") return None
    var pos = 12
    var rate = -1
    var fmtOk = false
    while (pos + 8 <= payload.length) {
      val id = tag4(pos)
      val len = buf.getInt(pos + 4)
      // bound check in Long: a crafted len near Int.MaxValue overflows
      // `pos + 8 + len` to negative and would slip past an Int compare
      if (len < 0 || pos.toLong + 8 + len > payload.length) return None
      id match {
        case "fmt " =>
          if (len < 16) return None
          val fmt = buf.getShort(pos + 8)
          val ch = buf.getShort(pos + 10)
          val sr = buf.getInt(pos + 12)
          val bits = buf.getShort(pos + 22)
          if (fmt != 1 || ch != 1 || bits != 16 || sr <= 0) return None
          rate = sr; fmtOk = true
        case "data" =>
          if (!fmtOk || len % 2 != 0) return None
          val out = new Array[Short](len / 2)
          var i = 0
          while (i < out.length) { out(i) = buf.getShort(pos + 8 + 2 * i); i += 1 }
          return Some((rate, out))
        case _ => () // unknown chunk: skip (real WAV files carry LIST etc.)
      }
      pos += 8 + len + (len & 1) // RIFF chunks are word-aligned
    }
    None
  }

  val AudioLen = 320     // synthesized samples per document
  val AudioRate = 8000
  val ResampleLen = 240  // 8000 -> 6000 Hz nearest-index resample
  val RmsWindow = 60     // -> 4 full windows over the resampled signal

  /** Deterministic synthetic waveform per document: text byte (i % len)
    * maps to bipolar sample b*256 - 16384, encoded as a REAL WAV file
    * (any audio tool plays it). Empty text -> one zero source byte, the
    * [[withImagePayload]] convention. */
  def withAudioPayload(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val raw = text.getBytes("UTF-8")
          val src = if (raw.isEmpty) Array[Byte](0) else raw
          val samples = new Array[Short](AudioLen)
          var i = 0
          while (i < AudioLen) {
            samples(i) = ((src(i % src.length) & 0xff) * 256 - 16384).toShort
            i += 1
          }
          (id, encodeWav(AudioRate, samples))
        }
      }.toDF("doc_id", "payload")
      .withColumn("meta", struct(
        length(col("payload")).as("n_bytes"), lit("audio/wav").as("mime")))
  }

  /** Nearest-index resample — the audio analog of [[resizeRgb]]:
    * out(i) = in((i * n) / newN) with integer floor. */
  def resampleNearest(samples: Array[Short], newN: Int): Array[Short] = {
    val out = new Array[Short](newN)
    var i = 0
    while (i < newN) {
      out(i) = samples((i.toLong * samples.length / newN).toInt)
      i += 1
    }
    out
  }

  /** Full audio lifecycle: WAV payload -> real chunk-walking decode ->
    * nearest-index resample -> per-window RMS + rolling fingerprint.
    * Output (doc_id, win_idx, rms, fp); partial tail windows are dropped;
    * malformed payloads are rejected by the decoder.
    *
    * Oracle-exact by construction: the window sum of squares accumulates
    * in a Long (60 * 32768^2 < 2^53, so the Long->Double conversion is
    * exact), sqrt is IEEE correctly rounded in both engines, and the
    * fingerprint is the mod-2^31-1 polynomial fold over (sample + 32768)
    * — the [[frameSample]] / TextCols rolling-hash convention. */
  def audioRmsFingerprint(spark: SparkSession, withAudioDf: DataFrame,
                          newN: Int = ResampleLen,
                          window: Int = RmsWindow): DataFrame = {
    import spark.implicits._
    withAudioDf.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        decodeWav(payload).toSeq.flatMap { case (_, samples) =>
          val r = resampleNearest(samples, newN)
          (0 until r.length / window).map { wi =>
            var sumSq = 0L
            var fp = 1125899906842597L % 2147483647L
            var j = wi * window
            val until = j + window
            while (j < until) {
              val s = r(j).toLong
              sumSq += s * s
              fp = (31 * fp + (s + 32768L)) % 2147483647L
              j += 1
            }
            (id, wi.toLong, math.sqrt(sumSq.toDouble / window), fp)
          }
        }
      }.toDF("doc_id", "win_idx", "rms", "fp")
  }

  val JpegW = 16
  val JpegH = 16

  /** Deterministic synthetic COMPRESSED image per document: a 16x16
    * grayscale JPEG of four constant 8x8 blocks, block b's value = text
    * byte (b % len) — the [[withImagePayload]] convention, but through
    * the real baseline JFIF encoder ([[Jpeg.encodeGray]], unit quant).
    * Constant blocks make the lossy codec exactly lossless (DC-only
    * blocks), so the decode output stays an analytic function of the
    * text and the lifecycle is DuckDB-hash-checkable like the PPM path. */
  def withJpegPayload(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val raw = text.getBytes("UTF-8")
          val src = if (raw.isEmpty) Array[Byte](0) else raw
          val px = new Array[Byte](JpegW * JpegH)
          var i = 0
          while (i < px.length) {
            val bx = (i % JpegW) / 8
            val by = (i / JpegW) / 8
            px(i) = src((by * 2 + bx) % src.length)
            i += 1
          }
          (id, Jpeg.encodeGray(JpegW, JpegH, px))
        }
      }.toDF("doc_id", "payload")
      .withColumn("meta", struct(
        length(col("payload")).as("n_bytes"), lit("image/jpeg").as("mime")))
  }

  /** Full COMPRESSED-image lifecycle: JFIF payload -> real baseline
    * decode (Huffman + dequant + IDCT) -> 8-bin gray histogram, long
    * format (doc_id, bin, w). Malformed payloads are dropped (decoder
    * rejects). The constant-block synthesis keeps every decoded pixel
    * analytic, so a hash match proves the whole encoder+decoder chain. */
  def jpegGrayHist(spark: SparkSession, withJpegDf: DataFrame): DataFrame = {
    import spark.implicits._
    withJpegDf.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        Jpeg.decode(payload).toSeq.flatMap { img =>
          val hist = new Array[Double](8)
          val n = (img.width * img.height).toDouble
          img.planes(0).foreach(v => hist(v >> 5) += 1.0)
          hist.zipWithIndex.map { case (c, b) => (id, b.toLong, c / n) }
        }
      }.toDF("doc_id", "bin", "w")
  }

  /** Deterministic synthetic PNG per document: the utf-8 text bytes
    * cycled into a 16x16 GRAY plane (pixel i = byte i % len), deflated
    * through the real PNG encoder. PNG is lossless, so unlike the JPEG
    * row no constant-block trick is needed — every decoded pixel is the
    * cycled text byte, directly DuckDB-replayable. */
  def withPngPayload(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val raw = text.getBytes("UTF-8")
          val src = if (raw.isEmpty) Array[Byte](0) else raw
          val px = new Array[Byte](JpegW * JpegH)
          var i = 0
          while (i < px.length) { px(i) = src(i % src.length); i += 1 }
          (id, Png.encode(JpegW, JpegH, 1, px))
        }
      }.toDF("doc_id", "payload")
      .withColumn("meta", struct(
        length(col("payload")).as("n_bytes"), lit("image/png").as("mime")))
  }

  /** Full PNG lifecycle: payload -> CRC-verified chunk walk -> inflate
    * -> unfilter -> 8-bin gray histogram, long format (doc_id, bin, w).
    * Malformed payloads are dropped (decoder rejects). */
  def pngGrayHist(spark: SparkSession, withPngDf: DataFrame): DataFrame = {
    import spark.implicits._
    withPngDf.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        Png.decode(payload).toSeq.flatMap { img =>
          val hist = new Array[Double](8)
          val n = (img.width * img.height).toDouble
          img.pixels.foreach(v => hist((v & 0xff) >> 5) += 1.0)
          hist.zipWithIndex.map { case (c, b) => (id, b.toLong, c / n) }
        }
      }.toDF("doc_id", "bin", "w")
  }

  /** Attach a binary payload column + metadata struct to the documents
    * table (payload = utf-8 bytes of text; stands in for an image/audio
    * blob column read via spark.read.format("binaryFile")). */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text"),
      encode(col("text"), "UTF-8").as("payload"))
      .withColumn("meta", struct(
        length(col("payload")).as("n_bytes"),
        lit("text/plain").as("mime")))

  /** === STUB DECODER ===
    * Deterministic fake feature extraction: 8-bucket byte histogram +
    * Shannon entropy. A real implementation would decode the image/audio
    * here (per-partition batching keeps codec init out of the per-row
    * path). */
  private def decodeFeatures(payload: Array[Byte]): (Array[Double], Double) = {
    val hist = new Array[Double](8)
    var i = 0
    while (i < payload.length) {
      hist((payload(i) & 0xff) >> 5) += 1.0
      i += 1
    }
    val n = payload.length.toDouble
    var entropy = 0.0
    var b = 0
    while (b < 8) {
      if (hist(b) > 0) {
        val p = hist(b) / n
        entropy -= p * math.log(p) / math.log(2)
      }
      hist(b) = hist(b) / n
      b += 1
    }
    (hist, entropy)
  }

  /** Batch feature extraction: one decoder "session" per partition, rows
    * processed in sequence (the batch shape a real codec needs). Output:
    * (doc_id, n_bytes, features ARRAY<DOUBLE>[8], entropy). */
  def extractFeatures(spark: SparkSession, withPayloadDf: DataFrame): DataFrame = {
    import spark.implicits._
    withPayloadDf.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // decoder init would happen here, once per partition
        it.map { case (id, payload) =>
          val (hist, entropy) = decodeFeatures(payload)
          (id, payload.length.toLong, hist, entropy)
        }
      }
      .toDF("doc_id", "n_bytes", "features", "entropy")
  }

  /** "Frame sampling" for video-like payloads: split the payload into
    * fixed-size blocks, keep every `stride`-th block's fingerprint.
    * Output: (doc_id, frame_idx, frame_hash).
    *
    * The fingerprint is an UNSIGNED-byte polynomial fold reduced mod
    * 2^31-1 at every step (the rolling-hash convention, TextCols) — both
    * overflow-free under ANSI arithmetic and bit-reproducible in the
    * DuckDB oracle, which replays the fold over the analytically
    * synthesized payload bytes. */
  def frameSample(spark: SparkSession, withPayloadDf: DataFrame,
                  blockSize: Int = 64, stride: Int = 4): DataFrame = {
    import spark.implicits._
    withPayloadDf.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        val nBlocks = math.max(1, payload.length / blockSize)
        (0 until nBlocks by stride).map { f =>
          val from = f * blockSize
          val until = math.min(from + blockSize, payload.length)
          var h = 1125899906842597L % 2147483647L
          var i = from
          while (i < until) {
            h = (31 * h + (payload(i) & 0xffL)) % 2147483647L
            i += 1
          }
          (id, f, h)
        }
      }
      .toDF("doc_id", "frame_idx", "frame_hash")
  }
}
