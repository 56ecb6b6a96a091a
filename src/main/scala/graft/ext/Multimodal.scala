package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column plumbing — engine extension per BASELINE.json.
 *
 * Media (image/audio/video) are opaque `BinaryType` columns with a
 * typed metadata struct. The codec tier is REAL for the formats it
 * names: PPM (`decodePpm`), PNG (zlib inflate + all five filter
 * types), WAV (RIFF walker), and baseline JPEG (a general T.81
 * decoder — canonical Huffman, RSTn restarts, DC prediction, float
 * IDCT, 4:4:4/4:2:0/4:2:2/4:4:0 subsampling — cross-checked
 * pixel-exactly against JDK ImageIO). `decodeStub` remains ONLY as
 * the generic-feature fallback for container formats with no parser
 * here — a deterministic fake a production deployment swaps for a
 * real decoder (JNI/FFI or a `mapInArrow` Python worker).
 *
 * Scale design: media bytes never pass through a shuffle — metadata
 * extraction is a narrow projection; decode/feature-extract runs
 * `mapPartitions` so each task holds one batch of blobs at a time;
 * frame sampling EXPLODEs only the (tiny) per-frame metadata, not the
 * frame bytes.
 */
object Multimodal {

  /** Deterministic per-media seed for clip-extraction offsets
    * ([[AudioHash.extractClips]]/[[VideoHash.extractClips]]): numeric
    * ids use their value directly — the oracle-replayable convention
    * for the synthesized corpus — and non-numeric ids fall back to a
    * stable polynomial codepoint hash instead of throwing
    * NumberFormatException at runtime. */
  private[ext] def idSeed(id: String): Long =
    id.toLongOption.getOrElse(
      math.floorMod(id.foldLeft(0L)((a, c) => a * 31L + c), 1000003L))

  /** Canonical media record schema. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", StringType, nullable = false),
    StructField("media_type", StringType),   // image | audio | video
    StructField("content", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("n_bytes", LongType),
      StructField("sha256", StringType),
      StructField("width", IntegerType),     // null until decoded
      StructField("height", IntegerType),
      StructField("duration_ms", LongType))))))

  /** Wrap a text table into a synthetic media table (the container
    * has no real media; bytes = utf-8 of text, type round-robins).
    * Used by tests/queries to exercise the binary plumbing. */
  def synthesize(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("string").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col(idCol).cast("long"), lit(3)) + 1).cast("int"))
        .as("media_type"),
      col(textCol).cast("binary").as("content"))

  /** Metadata extraction: narrow projection, no decode needed. */
  def withMeta(media: DataFrame): DataFrame =
    media.withColumn("meta", struct(
      octet_length(col("content")).cast("long").as("n_bytes"),
      sha2(col("content"), 256).as("sha256"),
      lit(null).cast("int").as("width"),
      lit(null).cast("int").as("height"),
      lit(null).cast("long").as("duration_ms")))

  /** Decoded-feature row produced by the (stubbed) codec. */
  final case class DecodedMedia(
      media_id: String, media_type: String, n_bytes: Long,
      width: Int, height: Int, duration_ms: Long,
      feature: Array[Float])

  /**
   * Decode / feature-extract over batches — the `mapPartitions` shape
   * a real codec plugs into. The stub derives deterministic fake
   * dimensions/features from the byte content; the BATCHING and
   * SCHEMA are the real contract.
   */
  def decodeStub(media: DataFrame, featureDim: Int = 8): Dataset[DecodedMedia] = {
    val spark = media.sparkSession
    implicit val enc = Encoders.product[DecodedMedia]
    media.select("media_id", "media_type", "content")
      .mapPartitions { rows =>
        // real impl: initialize codec ONCE per partition here — the
        // MessageDigest stands in for that per-partition init
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.flatMap { r =>
          val id = r.getString(0); val tpe = r.getString(1)
          val bytes = r.getAs[Array[Byte]](2)
          if (bytes == null) None  // undecodable blob (null payload):
          // the corrupt-media drop channel — a codec cannot decode
          // what never arrived, and one bad blob must not kill the
          // batch
          else Some {
          // fake dimensions derive from the ENGINE-PORTABLE 60-bit
          // md5 hash (top 15 hex chars == top 60 bits, the same value
          // as TextAnalysis.portableHash60) so even the stub output
          // is oracle-replayable in another engine
          val dig = md.digest(bytes)
          val h = java.nio.ByteBuffer.wrap(dig, 0, 8).getLong >>> 4
          DecodedMedia(
            media_id = id, media_type = tpe, n_bytes = bytes.length.toLong,
            width = (h % 1920 + 1).toInt, height = (h % 1080 + 1).toInt,
            duration_ms = if (tpe == "image") 0L else h % 600000,
            feature = Array.tabulate(featureDim)(i =>
              ((h % 1000003) * (i + 1) % 1000) / 1000.0f))
          }
        }
      }
  }

  /** Binary PPM (P6) encode: `P6\n<comment>\n<w> <h>\n<maxval>\n` +
    * raw RGB triples, row-major. Public, deterministic format
    * (netpbm); used by [[synthesizePpm]] to build real image bytes
    * and by tests to round-trip the decoder. */
  def ppmEncode(width: Int, height: Int, rgb: Array[Byte],
      comment: String = "graft synthetic"): Array[Byte] = {
    require(rgb.length == width * height * 3,
      s"payload ${rgb.length} != $width x $height x 3")
    val header = s"P6\n# $comment\n$width $height\n255\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    header ++ rgb
  }

  /**
   * Synthesize a REAL image table: one valid P6 PPM per input row,
   * dimensions and pixel bytes pure integer arithmetic in the row id —
   * `width = 8 + id mod 16`, `height = 6 + id mod 9`, and byte of
   * pixel p channel c = `(id·31 + p·7 + c·13) mod 256` — so an
   * independent engine can replay every decoded feature from the id
   * alone, without parsing the binary. (This container has no image
   * corpus; the FORMAT is real even though the pixels are synthetic.)
   */
  def synthesizePpm(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long].map { d =>
      val w = 8 + (math.floorMod(d, 16L)).toInt
      val h = 6 + (math.floorMod(d, 9L)).toInt
      val rgb = new Array[Byte](w * h * 3)
      var p = 0
      while (p < w * h) {
        var c = 0
        while (c < 3) {
          rgb(p * 3 + c) =
            math.floorMod(d * 31L + p.toLong * 7L + c * 13L, 256L).toByte
          c += 1
        }
        p += 1
      }
      (d.toString, "image", ppmEncode(w, h, rgb))
    }.toDF("media_id", "media_type", "content")
  }

  /** Per-image features decoded from REAL pixel bytes. Sums and
    * floor-milli means are exact integers — engine-replayable. */
  final case class PpmFeatures(
      media_id: String, width: Int, height: Int, maxval: Int,
      n_pix: Long, r_sum: Long, g_sum: Long, b_sum: Long,
      r_mean_milli: Long, g_mean_milli: Long, b_mean_milli: Long)

  /**
   * REAL codec step for one deterministic public format: parse the P6
   * header (magic, `#` comments, arbitrary whitespace, width, height,
   * maxval) and aggregate the raw RGB payload into per-channel sums
   * and floor-milli means. Runs in the same `mapPartitions` batch
   * shape as [[decodeStub]] — this is the swap point exercised with
   * actual bytes instead of a fake: schema, partitioning, and batch
   * iteration are identical to what a JNI/FFI jpeg/png decoder needs.
   * Media bytes never cross a shuffle; each task holds one batch.
   */
  def decodePpm(media: DataFrame): Dataset[PpmFeatures] = {
    implicit val enc = Encoders.product[PpmFeatures]
    media.select("media_id", "content").mapPartitions { rows =>
      rows.map { r => parsePpm(r.getString(0), r.getAs[Array[Byte]](1)) }
    }
  }

  /** One corrupt row per failed decode — the per-record error channel
    * of [[decodePpmChannel]]. */
  final case class PpmOutcome(
      media_id: String, ok: Long, width: Option[Int], height: Option[Int],
      r_mean_milli: Option[Long], g_mean_milli: Option[Long],
      b_mean_milli: Option[Long])

  /**
   * TOLERANT decode: per-record isolation around [[decodePpm]]'s
   * strict parser — a truncated or garbage blob yields an `ok = 0`
   * row instead of killing the task (at 100 TB one corrupt file per
   * million is a certainty, and a strict codec would fail the stage
   * on every retry). Same `mapPartitions` batch shape; the strict
   * variant remains the right tool when corrupt input must HALT a
   * backfill.
   */
  def decodePpmChannel(media: DataFrame): Dataset[PpmOutcome] = {
    implicit val enc = Encoders.product[PpmOutcome]
    media.select("media_id", "content").mapPartitions { rows =>
      rows.map { r =>
        val id = r.getString(0)
        try {
          val f = parsePpm(id, r.getAs[Array[Byte]](1))
          PpmOutcome(id, 1L, Some(f.width), Some(f.height),
            Some(f.r_mean_milli), Some(f.g_mean_milli),
            Some(f.b_mean_milli))
        } catch { case scala.util.control.NonFatal(_) =>
          PpmOutcome(id, 0L, None, None, None, None, None)
        }
      }
    }
  }

  /** The strict P6 parser shared by [[decodePpm]] (throwing) and
    * [[decodePpmChannel]] (per-record isolation). */
  private def parsePpm(id: String, bIn: Array[Byte]): PpmFeatures = {
    val b = bIn
    require(b != null, s"null PPM payload: media_id=$id")
    require(b.length >= 2 && b(0) == 'P' && b(1) == '6',
      s"not a P6 PPM: media_id=$id")
    var pos = 2
    def skipWsAndComments(): Unit = {
      var done = false
      while (!done && pos < b.length) {
        val ch = b(pos)
        if (ch == '#') { while (pos < b.length && b(pos) != '\n') pos += 1 }
        else if (ch == ' ' || ch == '\n' || ch == '\r' || ch == '\t') pos += 1
        else done = true
      }
    }
    def readInt(): Int = {
      skipWsAndComments()
      require(pos < b.length && b(pos) >= '0' && b(pos) <= '9',
        s"malformed PPM header: media_id=$id at byte $pos")
      var v = 0
      while (pos < b.length && b(pos) >= '0' && b(pos) <= '9') {
        v = v * 10 + (b(pos) - '0'); pos += 1
      }
      v
    }
    val w = readInt(); val h = readInt(); val mx = readInt()
    pos += 1 // exactly ONE whitespace byte separates maxval and payload
    val n = w.toLong * h
    require(b.length - pos >= n * 3,
      s"truncated PPM payload: media_id=$id")
    var rs = 0L; var gs = 0L; var bs = 0L
    var p = 0L
    while (p < n) {
      val o = pos + (p * 3).toInt
      rs += b(o) & 0xff; gs += b(o + 1) & 0xff; bs += b(o + 2) & 0xff
      p += 1
    }
    PpmFeatures(id, w, h, mx, n, rs, gs, bs,
      rs * 1000L / n, gs * 1000L / n, bs * 1000L / n)
  }

  /** Little-endian helpers for RIFF containers. */
  private def le32(v: Int): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  /** Binary RIFF/WAVE encode: canonical PCM container — `RIFF` size
    * `WAVE`, a 16-byte `fmt ` chunk (format 1 = integer PCM), an
    * arbitrary extra chunk (e.g. `LIST`) the decoder must skip, then
    * the `data` chunk with 16-bit little-endian interleaved samples.
    * Odd-sized chunks carry the RIFF word-alignment pad byte. Public,
    * deterministic format; used by [[synthesizeWav]] to build real
    * audio bytes and by tests to round-trip the decoder. */
  def wavEncode(sampleRate: Int, channels: Int, samples: Array[Short],
      junk: Array[Byte] = Array.emptyByteArray): Array[Byte] = {
    require(channels >= 1 && samples.length % channels == 0,
      s"sample count ${samples.length} not a multiple of channels=$channels")
    val bits = 16
    val blockAlign = channels * bits / 8
    val dataLen = samples.length * 2
    def padded(n: Int) = n + (n & 1)
    val junkPart =
      if (junk.isEmpty) Array.emptyByteArray
      else "LIST".getBytes("US-ASCII") ++ le32(junk.length) ++ junk ++
        (if ((junk.length & 1) == 1) Array(0.toByte) else Array.emptyByteArray)
    val riffLen = 4 + (8 + 16) + junkPart.length + 8 + padded(dataLen)
    val out = new java.io.ByteArrayOutputStream(8 + riffLen)
    out.write("RIFF".getBytes("US-ASCII")); out.write(le32(riffLen))
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); out.write(le32(16))
    out.write(le16(1)) // PCM
    out.write(le16(channels)); out.write(le32(sampleRate))
    out.write(le32(sampleRate * blockAlign)) // byte rate
    out.write(le16(blockAlign)); out.write(le16(bits))
    out.write(junkPart)
    out.write("data".getBytes("US-ASCII")); out.write(le32(dataLen))
    samples.foreach(s => out.write(le16(s & 0xffff)))
    if ((dataLen & 1) == 1) out.write(0)
    out.toByteArray
  }

  /**
   * Synthesize a REAL audio table: one valid RIFF/WAVE PCM file per
   * input row, every parameter pure integer arithmetic in the row id —
   * `sample_rate = 8000 + 4000·(id mod 4)`, `channels = 1 + id mod 2`,
   * `n_frames = 50 + id mod 101`, and the 16-bit sample of frame f
   * channel c is `((id·37 + f·11 + c·5) mod 4001) − 2000` — so an
   * independent engine can replay every decoded feature from the id
   * alone, without parsing the binary. Each file also carries a
   * `LIST` chunk of `7 + id mod 4` junk bytes (odd sizes exercise the
   * decoder's word-alignment skip). (This container has no audio
   * corpus; the FORMAT is real even though the waveform is synthetic.)
   */
  def synthesizeWav(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long].map { d =>
      val sr = 8000 + 4000 * math.floorMod(d, 4L).toInt
      val ch = 1 + math.floorMod(d, 2L).toInt
      val nf = 50 + math.floorMod(d, 101L).toInt
      val samples = new Array[Short](nf * ch)
      var f = 0
      while (f < nf) {
        var c = 0
        while (c < ch) {
          samples(f * ch + c) =
            (math.floorMod(d * 37L + f.toLong * 11L + c * 5L, 4001L) - 2000L).toShort
          c += 1
        }
        f += 1
      }
      val junk = Array.tabulate(7 + math.floorMod(d, 4L).toInt)(i =>
        math.floorMod(d + i, 251L).toByte)
      (d.toString, "audio", wavEncode(sr, ch, samples, junk))
    }.toDF("media_id", "media_type", "content")
  }

  /** Per-file features decoded from REAL PCM bytes. All exact
    * integers — engine-replayable. `c1_sum` is 0 for mono. */
  final case class WavFeatures(
      media_id: String, sample_rate: Int, channels: Int, bits: Int,
      n_frames: Long, duration_ms: Long,
      c0_sum: Long, c1_sum: Long, abs_sum: Long, peak: Long)

  /**
   * REAL codec step for a second deterministic public format: walk
   * the RIFF chunk list (magic checks, little-endian sizes, word
   * alignment, unknown-chunk skip), parse the PCM `fmt ` chunk, and
   * aggregate the `data` payload into per-channel sums, total
   * absolute energy, and peak amplitude. Same `mapPartitions` batch
   * shape as [[decodePpm]]: media bytes never cross a shuffle; each
   * task holds one batch of blobs.
   */
  def decodeWav(media: DataFrame): Dataset[WavFeatures] = {
    implicit val enc = Encoders.product[WavFeatures]
    media.select("media_id", "content").mapPartitions { rows =>
      rows.map { r => parseWav(r.getString(0), r.getAs[Array[Byte]](1)) }
    }
  }

  /** Per-record outcome row of [[decodeWavChannel]]. */
  final case class WavOutcome(
      media_id: String, ok: Long, sample_rate: Option[Int],
      channels: Option[Int], n_frames: Option[Long], peak: Option[Long])

  /** TOLERANT WAV decode — per-record isolation around the strict
    * RIFF walker, same contract as [[decodePpmChannel]]: a truncated
    * or garbage container yields an `ok = 0` row instead of failing
    * the stage. */
  def decodeWavChannel(media: DataFrame): Dataset[WavOutcome] = {
    implicit val enc = Encoders.product[WavOutcome]
    media.select("media_id", "content").mapPartitions { rows =>
      rows.map { r =>
        val id = r.getString(0)
        try {
          val f = parseWav(id, r.getAs[Array[Byte]](1))
          WavOutcome(id, 1L, Some(f.sample_rate), Some(f.channels),
            Some(f.n_frames), Some(f.peak))
        } catch { case scala.util.control.NonFatal(_) =>
          WavOutcome(id, 0L, None, None, None, None)
        }
      }
    }
  }

  /** Parsed RIFF/WAVE layout: PCM format params plus the data chunk's
    * byte offset and frame count. `sample(b, lay, f, c)` below reads
    * one 16-bit little-endian sample from it. */
  private[ext] final case class WavLayout(
      sampleRate: Int, channels: Int, bits: Int,
      dataOff: Int, nFrames: Long)

  /** The strict RIFF chunk walk shared by the aggregate decode and
    * the perceptual fingerprinter: magic checks, little-endian sizes,
    * word alignment, unknown-chunk skip, PCM-only `fmt `, bounded
    * `data`. All malformation failures live here, so every consumer
    * inherits identical strictness. */
  private[ext] def wavLayout(id: String, b: Array[Byte]): WavLayout = {
    require(b != null, s"null WAVE payload: media_id=$id")
    def ascii(off: Int, n: Int) = new String(b, off, n, "US-ASCII")
    def u32(off: Int): Long =
      (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
        ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
    def u16(off: Int): Int = (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
    require(b.length >= 12 && ascii(0, 4) == "RIFF" &&
      ascii(8, 4) == "WAVE", s"not a RIFF/WAVE file: media_id=$id")
    var pos = 12
    var sr = -1; var ch = -1; var bits = -1
    var dataOff = -1; var dataLen = -1L
    while (pos + 8 <= b.length && (sr < 0 || dataOff < 0)) {
      val cid = ascii(pos, 4); val clen = u32(pos + 4)
      val body = pos + 8
      cid match {
        case "fmt " =>
          require(clen >= 16, s"short fmt chunk: media_id=$id")
          require(u16(body) == 1, s"non-PCM WAVE: media_id=$id")
          ch = u16(body + 2); sr = u32(body + 4).toInt
          bits = u16(body + 14)
        case "data" => dataOff = body; dataLen = clen
        case _ => // unknown chunk (LIST etc): skip
      }
      pos = body + clen.toInt + (clen.toInt & 1) // word-aligned
    }
    require(sr > 0 && ch > 0 && dataOff >= 0,
      s"missing fmt/data chunk: media_id=$id")
    require(bits == 16, s"unsupported bit depth $bits: media_id=$id")
    require(dataOff + dataLen <= b.length,
      s"truncated data chunk: media_id=$id")
    WavLayout(sr, ch, bits, dataOff, dataLen / (ch * 2))
  }

  /** One 16-bit little-endian PCM sample of frame `f`, channel `c`. */
  private[ext] def wavSample(
      b: Array[Byte], lay: WavLayout, f: Long, c: Int): Long = {
    val off = lay.dataOff + ((f * lay.channels + c) * 2).toInt
    (((b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)).toShort).toLong
  }

  /** The strict RIFF/WAVE parser shared by [[decodeWav]] (throwing)
    * and [[decodeWavChannel]] (per-record isolation). */
  private def parseWav(id: String, b: Array[Byte]): WavFeatures = {
    val lay = wavLayout(id, b)
    val ch = lay.channels
    var c0 = 0L; var c1 = 0L; var abs = 0L; var peak = 0L
    var f = 0L
    while (f < lay.nFrames) {
      var c = 0
      while (c < ch) {
        val v = wavSample(b, lay, f, c)
        if (c == 0) c0 += v else c1 += v
        val a = math.abs(v)
        abs += a; if (a > peak) peak = a
        c += 1
      }
      f += 1
    }
    WavFeatures(id, lay.sampleRate, ch, lay.bits, lay.nFrames,
      lay.nFrames * 1000L / lay.sampleRate, c0, c1, abs, peak)
  }

  // ── PNG (real compression tier): unlike PPM/WAV, the payload is
  // zlib-DEFLATED and scanline-FILTERED, so a correct decode requires
  // real inflate + real filter reconstruction — the encoder applies a
  // different filter per row (cycling all five types) precisely so a
  // broken Paeth/Average path cannot hash-match the oracle. ──

  private def be32(v: Int): Array[Byte] = Array(
    ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def pngChunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val t = typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val crc = new java.util.zip.CRC32()
    crc.update(t); crc.update(data)
    be32(data.length) ++ t ++ data ++ be32(crc.getValue.toInt)
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b)
    val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Real PNG encode (truecolor 8-bit, no interlace): per-row filter
    * type = row mod 5 (None/Sub/Up/Average/Paeth), zlib deflate, the
    * compressed stream SPLIT across two IDAT chunks, an ancillary
    * tEXt chunk the decoder must skip, CRC32 on every chunk. */
  def pngEncode(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == width * height * 3,
      s"payload ${rgb.length} != $width x $height x 3")
    val bpp = 3
    val stride = width * bpp
    val raw = new Array[Byte](height * (1 + stride))
    var y = 0
    while (y < height) {
      val f = y % 5
      raw(y * (1 + stride)) = f.toByte
      var x = 0
      while (x < stride) {
        val cur = rgb(y * stride + x) & 0xff
        val left = if (x >= bpp) rgb(y * stride + x - bpp) & 0xff else 0
        val up = if (y > 0) rgb((y - 1) * stride + x) & 0xff else 0
        val ul = if (y > 0 && x >= bpp)
          rgb((y - 1) * stride + x - bpp) & 0xff else 0
        val filtered = f match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - (left + up) / 2
          case 4 => cur - paeth(left, up, ul)
        }
        raw(y * (1 + stride) + 1 + x) = (filtered & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    // worst-case deflate expansion: ~5 bytes per 16383-byte stored block + header
    val buf = new Array[Byte](raw.length + raw.length / 16383 * 5 + 64)
    var zLen = 0
    while (!deflater.finished())
      zLen += deflater.deflate(buf, zLen, buf.length - zLen)
    deflater.end()
    val z = java.util.Arrays.copyOf(buf, zLen)
    val ihdr = be32(width) ++ be32(height) ++
      Array[Byte](8, 2, 0, 0, 0) // depth 8, truecolor, no interlace
    val split = math.max(1, zLen / 2)
    val sig = Array[Byte](137.toByte, 'P', 'N', 'G', 13, 10, 26, 10)
    sig ++ pngChunk("IHDR", ihdr) ++
      pngChunk("tEXt", "Comment graft synthetic"
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII)) ++
      pngChunk("IDAT", java.util.Arrays.copyOfRange(z, 0, split)) ++
      pngChunk("IDAT", java.util.Arrays.copyOfRange(z, split, zLen)) ++
      pngChunk("IEND", Array.emptyByteArray)
  }

  /** One valid PNG per row; dims and pixels are integer formulas in
    * the id (width = 9 + id mod 12, height = 5 + id mod 7, byte of
    * pixel p channel c = (id·37 + p·11 + c·17) mod 256), so an oracle
    * replays every decoded feature without touching the binary. */
  def synthesizePng(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long].map { d =>
      val w = 9 + math.floorMod(d, 12L).toInt
      val h = 5 + math.floorMod(d, 7L).toInt
      val rgb = new Array[Byte](w * h * 3)
      var p = 0
      while (p < w * h) {
        var c = 0
        while (c < 3) {
          rgb(p * 3 + c) =
            math.floorMod(d * 37L + p.toLong * 11L + c * 17L, 256L).toByte
          c += 1
        }
        p += 1
      }
      (d.toString, "image", pngEncode(w, h, rgb))
    }.toDF("media_id", "media_type", "content")
  }

  final case class PngFeatures(
      media_id: String, width: Int, height: Int, bit_depth: Int,
      color_type: Int, n_idat: Int, n_pix: Long,
      r_sum: Long, g_sum: Long, b_sum: Long,
      r_mean_milli: Long, g_mean_milli: Long, b_mean_milli: Long)

  /** REAL PNG decode in the mapPartitions batch shape: CRC-verified
    * chunk walk (ancillary chunks skipped), multi-IDAT concatenation,
    * zlib inflate, and per-row filter reconstruction (None/Sub/Up/
    * Average/Paeth) before the channel aggregation — the inverse of
    * [[pngEncode]], correct only if every stage is. */
  def decodePng(media: DataFrame): Dataset[PngFeatures] = {
    implicit val enc = Encoders.product[PngFeatures]
    media.select("media_id", "content").mapPartitions { rows =>
      rows.map { r =>
        val id = r.getString(0)
        val b = r.getAs[Array[Byte]](1)
        require(b.length > 8 && (b(0) & 0xff) == 137 && b(1) == 'P' &&
          b(2) == 'N' && b(3) == 'G', s"not a PNG: media_id=$id")
        def u32(off: Int): Long =
          ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
            ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)
        var pos = 8
        var w = 0; var h = 0; var depth = 0; var colorType = 0
        var nIdat = 0
        val idat = new java.io.ByteArrayOutputStream()
        var done = false
        while (!done && pos + 8 <= b.length) {
          val len = u32(pos).toInt
          val typ = new String(b, pos + 4, 4, "US-ASCII")
          val dataOff = pos + 8
          val crc = new java.util.zip.CRC32()
          crc.update(b, pos + 4, 4 + len)
          require((crc.getValue & 0xffffffffL) == u32(dataOff + len),
            s"CRC mismatch in $typ: media_id=$id")
          typ match {
            case "IHDR" =>
              w = u32(dataOff).toInt; h = u32(dataOff + 4).toInt
              depth = b(dataOff + 8) & 0xff
              colorType = b(dataOff + 9) & 0xff
              require(depth == 8 && colorType == 2 &&
                b(dataOff + 12) == 0,
                s"unsupported PNG variant: media_id=$id")
            case "IDAT" =>
              nIdat += 1; idat.write(b, dataOff, len)
            case "IEND" => done = true
            case _ => () // ancillary (tEXt etc.) — skip
          }
          pos = dataOff + len + 4
        }
        require(done && w > 0 && h > 0, s"truncated PNG: media_id=$id")
        val inflater = new java.util.zip.Inflater()
        inflater.setInput(idat.toByteArray)
        val bpp = 3
        val stride = w * bpp
        val raw = new Array[Byte](h * (1 + stride))
        var got = 0
        while (got < raw.length && !inflater.finished()) {
          val n = inflater.inflate(raw, got, raw.length - got)
          if (n == 0 && (inflater.needsInput() || inflater.needsDictionary())) {
            inflater.end()
            throw new IllegalArgumentException(
              s"short/corrupt deflate stream: media_id=$id")
          }
          got += n
        }
        inflater.end()
        require(got == raw.length, s"short inflate: media_id=$id")
        // filter reconstruction in place, row by row
        val img = new Array[Int](h * stride)
        var y = 0
        while (y < h) {
          val f = raw(y * (1 + stride)) & 0xff
          var x = 0
          while (x < stride) {
            val v = raw(y * (1 + stride) + 1 + x) & 0xff
            val left = if (x >= bpp) img(y * stride + x - bpp) else 0
            val up = if (y > 0) img((y - 1) * stride + x) else 0
            val ul = if (y > 0 && x >= bpp)
              img((y - 1) * stride + x - bpp) else 0
            val rec = f match {
              case 0 => v
              case 1 => v + left
              case 2 => v + up
              case 3 => v + (left + up) / 2
              case 4 => v + paeth(left, up, ul)
              case other =>
                throw new IllegalArgumentException(
                  s"bad filter $other: media_id=$id")
            }
            img(y * stride + x) = rec & 0xff
            x += 1
          }
          y += 1
        }
        val n = w.toLong * h
        var rs = 0L; var gs = 0L; var bs = 0L
        var p = 0
        while (p < n) {
          rs += img(p * 3); gs += img(p * 3 + 1); bs += img(p * 3 + 2)
          p += 1
        }
        PngFeatures(id, w, h, depth, colorType, nIdat, n, rs, gs, bs,
          rs * 1000L / n, gs * 1000L / n, bs * 1000L / n)
      }
    }
  }

  /**
   * Frame-sample plan for video: explode per-frame timestamps (every
   * `everyMs`) WITHOUT materializing frame bytes — downstream decode
   * fetches only sampled offsets.
   */
  def frameSamplePlan(decoded: DataFrame, everyMs: Long = 1000L): DataFrame =
    decoded.filter(col("media_type") === "video")
      .withColumn("frame_ts_ms",
        explode(sequence(lit(0L), col("duration_ms"), lit(everyMs))))
      .select(col("media_id"), col("frame_ts_ms"))

  /** Resize request plan for images: pure metadata transform the
    * decoder executes per batch (aspect-preserving fit). Exact
    * integer arithmetic — `(side · maxSide) div max(w, h)`, clamped
    * to ≥ 1 — so another engine replays the output dimensions
    * without any round-half convention entering the contract. */
  def resizePlan(decoded: DataFrame, maxSide: Int = 512): DataFrame = {
    // floor((side·maxSide)/mx) on positive sub-2^53 integers is exact
    // integer division (the product is double-exact, and a non-exact
    // quotient sits ≥ 1/mx away from any integer)
    def fit(side: Column, mx: Column): Column =
      when(mx <= maxSide, side)
        .otherwise(greatest(
          floor(side.cast("double") * maxSide / mx).cast("long"),
          lit(1L)).cast("int"))
    decoded.filter(col("media_type") === "image")
      .withColumn("mx", greatest(col("width"), col("height")))
      .select(col("media_id"), col("width"), col("height"),
        fit(col("width"), col("mx")).cast("int").as("out_width"),
        fit(col("height"), col("mx")).cast("int").as("out_height"))
  }

  // ── Baseline JPEG (ITU-T T.81) ────────────────────────────────────

  /** JFIF YCbCr forward conversion (floor(x+0.5), clamped) — the
    * published BT.601 full-range constants; the decoder and the
    * DuckDB oracle replay the identical literal/order arithmetic. */
  private def rgbToYcc(r: Int, g: Int, b: Int): (Int, Int, Int) = {
    def cl(x: Double): Int =
      math.max(0, math.min(255, math.floor(x).toInt))
    (cl(0.299 * r + 0.587 * g + 0.114 * b + 0.5),
      cl(-0.168736 * r - 0.331264 * g + 0.5 * b + 128.5),
      cl(0.5 * r - 0.418688 * g - 0.081312 * b + 128.5))
  }

  private val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /**
   * Synthetic baseline-JPEG generator for FLAT-8×8-BLOCK images:
   * dimensions must be multiples of 8 and every 8×8 tile must be one
   * RGB color (`require`d). Flat tiles make the lossy pipeline exact:
   * with all-ones quantization tables the only nonzero coefficient is
   * DC = 8·(v−128), which dequantizes and inverse-transforms back to
   * v bit-exactly — so the decode features are a pure function of the
   * synthesis formula (the PNG/PPM oracle convention, kept through a
   * genuinely lossy codec). The file is REAL JFIF baseline — SOI,
   * APP0, DQT, SOF0 (4:4:4), DHT (canonical custom tables: 12
   * DC categories at length 4; EOB at length 1), SOS, entropy-coded
   * MCUs with 0xFF byte stuffing, EOI — and the spec proves the JDK's
   * ImageIO decodes it pixel-exactly.
   */
  def jpegEncode(w: Int, h: Int, rgb: Array[Byte],
      chroma420: Boolean = false, quantScale: Int = 1): Array[Byte] = {
    val tile = if (chroma420) 16 else 8
    require(w > 0 && h > 0 && w % tile == 0 && h % tile == 0,
      s"flat-block JPEG needs $tile-aligned dims, got ${w}x$h")
    require(rgb.length == w * h * 3, "rgb length != w*h*3")
    // quantScale > 1 writes a uniform non-trivial quant table and
    // quantizes the DC accordingly — a REAL re-encode at a different
    // quality. For flat tiles the round-trip stays bit-exact whenever
    // quantScale <= 4: the dequantized DC differs from 8·(v−128) by
    // at most quantScale/2, so the reconstructed value differs from v
    // by at most quantScale/16 < 0.5 and the floor(x+0.5) rounding
    // lands on v exactly (the re-encode-robust dedup row leans on
    // this bound; see q_image_dhash_reencode).
    require(quantScale >= 1 && quantScale <= 255, "quantScale in [1,255]")
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xff); u8(m) }
    marker(0xd8) // SOI
    marker(0xe0); u16(16) // APP0 JFIF
    out.write("JFIF".getBytes("US-ASCII")); u8(0)
    u8(1); u8(1); u8(0); u16(1); u16(1); u8(0); u8(0)
    marker(0xdb); u16(2 + 1 + 64) // DQT: one 8-bit table, id 0
    u8(0x00); (0 until 64).foreach(_ => u8(quantScale))
    marker(0xc0); u16(8 + 3 * 3) // SOF0 baseline
    u8(8); u16(h); u16(w); u8(3)
    // 4:2:0: Y at 2x2, chroma 1x1; else 1x1 everywhere. qt 0 for all
    u8(1); u8(if (chroma420) 0x22 else 0x11); u8(0)
    u8(2); u8(0x11); u8(0)
    u8(3); u8(0x11); u8(0)
    // DHT: DC table 0 — 12 category symbols, all code length 4
    marker(0xc4); u16(2 + 1 + 16 + 12)
    u8(0x00)
    val dcBits = Array(0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    dcBits.foreach(u8); (0 to 11).foreach(u8)
    // DHT: AC table 0 — single EOB symbol at code length 1
    marker(0xc4); u16(2 + 1 + 16 + 1)
    u8(0x10)
    val acBits = Array(1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    acBits.foreach(u8); u8(0x00)
    marker(0xda); u16(6 + 2 * 3) // SOS
    u8(3); (1 to 3).foreach { c => u8(c); u8(0x00) }
    u8(0); u8(63); u8(0)
    // entropy-coded data
    var acc = 0; var nbits = 0
    def putBits(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >> i) & 1); nbits += 1
        if (nbits == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0x00) // byte stuffing
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    // canonical codes for the tables above: DC cat s ⇒ code s (4 bits);
    // AC EOB ⇒ code 0 (1 bit)
    val pred = Array(0, 0, 0)
    def encodeBlockDc(c: Int, v: Int): Unit = {
      // quantized DC (Math.round — half toward +inf, deterministic);
      // the decoder multiplies back by quantScale
      val raw = 8 * (v - 128)
      val dc =
        if (quantScale == 1) raw
        else math.round(raw.toDouble / quantScale).toInt
      val diff = dc - pred(c); pred(c) = dc
      val mag = math.abs(diff)
      val s = 32 - Integer.numberOfLeadingZeros(mag) // 0 for diff=0
      putBits(s, 4) // DC category code == category, 4 bits
      if (s > 0)
        putBits(if (diff >= 0) diff else diff + (1 << s) - 1, s)
      putBits(0, 1) // AC: EOB
    }
    val bw = w / tile; val bh = h / tile
    var by = 0
    while (by < bh) {
      var bx = 0
      while (bx < bw) {
        // tile color from the top-left pixel; require flatness
        val px0 = (by * tile * w + bx * tile) * 3
        val r0 = rgb(px0) & 0xff; val g0 = rgb(px0 + 1) & 0xff
        val b0 = rgb(px0 + 2) & 0xff
        var yy = 0
        while (yy < tile) {
          var xx = 0
          while (xx < tile) {
            val p = ((by * tile + yy) * w + bx * tile + xx) * 3
            require((rgb(p) & 0xff) == r0 && (rgb(p + 1) & 0xff) == g0 &&
              (rgb(p + 2) & 0xff) == b0,
              s"tile ($bx,$by) is not flat — jpegEncode is the " +
                "flat-block synthetic generator")
            xx += 1
          }
          yy += 1
        }
        val (cy, cb, cr) = rgbToYcc(r0, g0, b0)
        if (chroma420) {
          // one MCU = 4 Y blocks (2×2 raster) + Cb + Cr — the tile is
          // flat, so the four Y blocks carry the same DC
          encodeBlockDc(0, cy); encodeBlockDc(0, cy)
          encodeBlockDc(0, cy); encodeBlockDc(0, cy)
          encodeBlockDc(1, cb); encodeBlockDc(2, cr)
        } else {
          encodeBlockDc(0, cy); encodeBlockDc(1, cb); encodeBlockDc(2, cr)
        }
        bx += 1
      }
      by += 1
    }
    if (nbits > 0) { // pad with 1s
      acc = (acc << (8 - nbits)) | ((1 << (8 - nbits)) - 1)
      out.write(acc)
      if (acc == 0xff) out.write(0x00)
    }
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** One flat-tile JPEG per document; dims and tile colors are pure
    * integer arithmetic in the doc id (the PNG/WAV convention). */
  def synthesizeJpeg(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long].map { d =>
      val w = 8 * (1 + math.floorMod(d, 3L).toInt) // 8, 16, 24
      val h = 8 * (1 + math.floorMod(d, 2L).toInt) // 8, 16
      val rgb = new Array[Byte](w * h * 3)
      val bw = w / 8
      var p = 0
      while (p < w * h) {
        val bi = (p / w / 8) * bw + (p % w) / 8
        rgb(p * 3) = math.floorMod(d * 31L + bi * 59L + 7L, 256L).toByte
        rgb(p * 3 + 1) = math.floorMod(d * 17L + bi * 83L + 3L, 256L).toByte
        rgb(p * 3 + 2) = math.floorMod(d * 13L + bi * 29L + 11L, 256L).toByte
        p += 1
      }
      (d.toString, "image", jpegEncode(w, h, rgb))
    }.toDF("media_id", "media_type", "content")
  }

  /** One flat-16×16-tile 4:2:0 JPEG per document — the web-default
    * subsampled layout, exact end-to-end because a flat tile's
    * chroma is flat (the 4:4:4 convention of [[synthesizeJpeg]] at
    * MCU granularity). */
  def synthesizeJpeg420(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long].map { d =>
      val w = 16 * (1 + math.floorMod(d, 2L).toInt) // 16, 32
      val h = 16 * (1 + math.floorMod(d, 3L).toInt) // 16, 32, 48
      val rgb = new Array[Byte](w * h * 3)
      val bw = w / 16
      var p = 0
      while (p < w * h) {
        val bi = (p / w / 16) * bw + (p % w) / 16
        rgb(p * 3) = math.floorMod(d * 41L + bi * 67L + 5L, 256L).toByte
        rgb(p * 3 + 1) = math.floorMod(d * 23L + bi * 71L + 9L, 256L).toByte
        rgb(p * 3 + 2) = math.floorMod(d * 19L + bi * 37L + 13L, 256L).toByte
        p += 1
      }
      (d.toString, "image", jpegEncode(w, h, rgb, chroma420 = true))
    }.toDF("media_id", "media_type", "content")
  }

  final case class JpegFeatures(
      media_id: String, width: Int, height: Int, n_components: Int,
      n_pix: Long, r_sum: Long, g_sum: Long, b_sum: Long,
      r_mean_milli: Long, g_mean_milli: Long, b_mean_milli: Long)

  /**
   * REAL baseline-JPEG decode in the mapPartitions batch shape: the
   * full T.81 path — marker walk, DQT (8/16-bit), DHT canonical
   * Huffman reconstruction (mincode/maxcode/valptr), SOF0, DRI/RSTn
   * restart handling, entropy decode with 0xFF00 unstuffing, DC
   * prediction + AC run-length/ZRL, dequantization, float IDCT
   * (exact separable cosine form, floor(x+0.5) rounding), and BT.601
   * color conversion. General interleaved sampling up to 2×2 —
   * 4:4:4, 4:2:0, 4:2:2, 4:4:0 — with replication chroma upsampling
   * (exact for flat tiles; nearest-neighbor otherwise). Bytes never
   * shuffle; any malformed stream throws with the media id.
   */
  def decodeJpeg(media: DataFrame): Dataset[JpegFeatures] = {
    implicit val enc = Encoders.product[JpegFeatures]
    media.select("media_id", "content").mapPartitions { rows =>
      val cosT = jpegCosTable()
      rows.map(r =>
        parseJpeg(r.getString(0), r.getAs[Array[Byte]](1), cosT))
    }
  }

  final case class JpegOutcome(
      media_id: String, ok: Long, width: Option[Int],
      height: Option[Int], r_mean_milli: Option[Long],
      g_mean_milli: Option[Long], b_mean_milli: Option[Long])

  /** Corrupt-tolerant JPEG channel — per-record isolation over the
    * strict T.81 parser, same contract as [[decodePpmChannel]] /
    * [[decodeWavChannel]]: a truncated/garbage/null stream emits an
    * ok=0 casualty row instead of failing the stage. */
  def decodeJpegChannel(media: DataFrame): Dataset[JpegOutcome] = {
    implicit val enc = Encoders.product[JpegOutcome]
    media.select("media_id", "content").mapPartitions { rows =>
      val cosT = jpegCosTable()
      rows.map { r =>
        val id = r.getString(0)
        try {
          val f = parseJpeg(id, r.getAs[Array[Byte]](1), cosT)
          JpegOutcome(id, 1L, Some(f.width), Some(f.height),
            Some(f.r_mean_milli), Some(f.g_mean_milli),
            Some(f.b_mean_milli))
        } catch { case scala.util.control.NonFatal(_) =>
          JpegOutcome(id, 0L, None, None, None, None, None)
        }
      }
    }
  }

  /** cos((2x+1)uπ/16)·C(u)/2 lookup, shared across a decode batch. */
  private[ext] def jpegCosTable(): Array[Array[Double]] =
    Array.tabulate(8, 8) { (x, u) =>
      val cu = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
      0.5 * cu * math.cos((2 * x + 1) * u * math.Pi / 16.0)
    }

  /** The strict baseline parser shared by [[decodeJpeg]] (throwing)
    * and [[decodeJpegChannel]] (per-record isolation): full decode to
    * RGB, then exact integer channel sums. */
  private def parseJpeg(
      id: String, b: Array[Byte],
      cosT: Array[Array[Double]]): JpegFeatures = {
    val (w, h, rgb) = parseJpegRgb(id, b, cosT)
    var rs = 0L; var gs = 0L; var bs = 0L
    var i = 0
    while (i < w * h) {
      rs += rgb(i * 3) & 0xff
      gs += rgb(i * 3 + 1) & 0xff
      bs += rgb(i * 3 + 2) & 0xff
      i += 1
    }
    val nPix = w.toLong * h
    // nComp re-derived cheaply for the feature row (the RGB decode
    // already validated the stream)
    val nComp = jpegNComp(id, b)
    JpegFeatures(id, w, h, nComp, nPix, rs, gs, bs,
      rs * 1000 / nPix, gs * 1000 / nPix, bs * 1000 / nPix)
  }

  /** Component count from the SOF0 header (for the feature row). */
  private def jpegNComp(id: String, b: Array[Byte]): Int = {
    def u16(off: Int): Int = ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)
    var pos = 2
    while (pos + 4 <= b.length) {
      val m = b(pos + 1) & 0xff
      if (m == 0xc0) return b(pos + 4 + 5) & 0xff
      pos += 2 + u16(pos + 2)
    }
    throw new IllegalArgumentException(s"no SOF0: media_id=$id")
  }

  /** The full T.81 baseline decode to interleaved RGB bytes —
    * [[parseJpeg]]'s engine, also the pixel source for perceptual
    * hashing over JPEG inputs ([[graft.ext.ImageHash.jpegDHash]]). */
  private[ext] def parseJpegRgb(
      id: String, b: Array[Byte],
      cosT: Array[Array[Double]]): (Int, Int, Array[Byte]) = {
    {
        def fail(msg: String): Nothing =
          throw new IllegalArgumentException(s"$msg: media_id=$id")
        if (b == null || b.length < 4 ||
            (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
          fail("not a JPEG")
        def u16(off: Int): Int =
          ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)

        val quant = new Array[Array[Int]](4)
        // huffman tables [class 0=DC|1=AC][id]: (mincode, maxcode,
        // valptr per length 1..16, values)
        val huff = Array.ofDim[(Array[Int], Array[Int], Array[Int],
          Array[Int])](2, 4)
        var w = 0; var h = 0; var nComp = 0
        var compQt: Array[Int] = null
        var compH: Array[Int] = null
        var compV: Array[Int] = null
        var compDc: Array[Int] = null
        var compAc: Array[Int] = null
        var restartInterval = 0
        var pos = 2
        var scanStart = -1
        while (scanStart < 0) {
          if (pos + 4 > b.length) fail("truncated JPEG (no SOS)")
          if ((b(pos) & 0xff) != 0xff) fail("marker sync lost")
          val m = b(pos + 1) & 0xff
          val len = u16(pos + 2)
          val seg = pos + 4
          // a declared segment length past the buffer is corruption —
          // fail with the media id, not a raw bounds exception
          if (seg + len - 2 > b.length) fail("segment overruns buffer")
          m match {
            case 0xdb => // DQT — possibly several tables
              var q = seg
              while (q < seg + len - 2) {
                val prec = (b(q) & 0xf0) >> 4; val tid = b(q) & 0x0f
                if (tid > 3) fail(s"invalid quant table id $tid")
                // bound by the SEGMENT end, not the buffer: a table
                // must not read into the next segment's bytes
                if (q + 1 + (if (prec == 0) 64 else 128) > seg + len - 2)
                  fail("quant table overruns segment")
                val t = new Array[Int](64)
                var i = 0
                while (i < 64) {
                  t(i) = if (prec == 0) b(q + 1 + i) & 0xff
                  else u16(q + 1 + 2 * i)
                  i += 1
                }
                quant(tid) = t
                q += 1 + (if (prec == 0) 64 else 128)
              }
            case 0xc4 => // DHT — possibly several tables
              var q = seg
              while (q < seg + len - 2) {
                val cls = (b(q) & 0xf0) >> 4; val tid = b(q) & 0x0f
                if (cls > 1 || tid > 3)
                  fail(s"invalid huffman table class/id $cls/$tid")
                if (q + 17 > seg + len - 2)
                  fail("huffman table header overruns segment")
                val bits = Array.tabulate(17)(i =>
                  if (i == 0) 0 else b(q + i) & 0xff)
                val total = bits.sum
                if (q + 17 + total > seg + len - 2)
                  fail("huffman table overruns segment")
                val vals = Array.tabulate(total)(i => b(q + 17 + i) & 0xff)
                // canonical code assignment
                val minC = new Array[Int](17); val maxC = new Array[Int](17)
                val valP = new Array[Int](17)
                var code = 0; var k = 0
                var l = 1
                while (l <= 16) {
                  valP(l) = k; minC(l) = code
                  code += bits(l); k += bits(l)
                  maxC(l) = code - 1 // -1 ⇒ no codes at this length
                  if (bits(l) == 0) maxC(l) = -1
                  code <<= 1
                  l += 1
                }
                huff(cls)(tid) = (minC, maxC, valP, vals)
                q += 17 + total
              }
            case 0xc0 => // SOF0 baseline
              h = u16(seg + 1); w = u16(seg + 3)
              nComp = b(seg + 5) & 0xff
              if (nComp != 3 && nComp != 1) fail(s"unsupported nComp=$nComp")
              compQt = new Array[Int](nComp)
              compH = new Array[Int](nComp)
              compV = new Array[Int](nComp)
              var c = 0
              while (c < nComp) {
                val samp = b(seg + 7 + 3 * c) & 0xff
                compH(c) = (samp >> 4) & 0x0f; compV(c) = samp & 0x0f
                if (compH(c) < 1 || compH(c) > 2 ||
                    compV(c) < 1 || compV(c) > 2)
                  fail(s"unsupported sampling factor ${compH(c)}x${compV(c)}")
                compQt(c) = b(seg + 8 + 3 * c) & 0xff
                if (compQt(c) > 3)
                  fail(s"invalid component quant id ${compQt(c)}")
                c += 1
              }
            case 0xc1 | 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca |
                0xcb | 0xcd | 0xce | 0xcf =>
              fail(f"unsupported SOF marker 0xFF$m%02X (baseline only)")
            case 0xdd => restartInterval = u16(seg)
            case 0xda => // SOS
              val ns = b(seg) & 0xff
              if (ns != nComp) fail("scan component mismatch")
              compDc = new Array[Int](nComp)
              compAc = new Array[Int](nComp)
              var c = 0
              while (c < ns) {
                compDc(c) = (b(seg + 2 + 2 * c) & 0xf0) >> 4
                compAc(c) = b(seg + 2 + 2 * c) & 0x0f
                if (compDc(c) > 3 || compAc(c) > 3)
                  fail("invalid scan huffman table id")
                c += 1
              }
              scanStart = seg + 1 + 2 * ns + 3
            case _ => () // APPn, COM, … — skip
          }
          if (scanStart < 0) pos = seg + len - 2
        }
        if (w <= 0 || h <= 0) fail("missing SOF0 before SOS")

        // entropy-coded segment bit reader (FF00 unstuffing, RSTn)
        var bp = scanStart; var bitBuf = 0; var bitCnt = 0
        def nextByte(): Int = {
          if (bp >= b.length) fail("truncated entropy stream")
          val v = b(bp) & 0xff; bp += 1
          if (v == 0xff) {
            if (bp >= b.length) fail("truncated entropy stream")
            val m2 = b(bp) & 0xff
            if (m2 == 0x00) { bp += 1; 0xff }
            else fail("unexpected marker inside entropy stream")
          } else v
        }
        def readBit(): Int = {
          if (bitCnt == 0) { bitBuf = nextByte(); bitCnt = 8 }
          bitCnt -= 1
          (bitBuf >> bitCnt) & 1
        }
        def decodeHuff(tab: (Array[Int], Array[Int], Array[Int], Array[Int]))
            : Int = {
          val (minC, maxC, valP, vals) = tab
          var code = 0; var l = 0
          while (l < 16) {
            code = (code << 1) | readBit(); l += 1
            if (maxC(l) >= 0 && code <= maxC(l) && code >= minC(l))
              return vals(valP(l) + code - minC(l))
          }
          fail("invalid huffman code")
        }
        def receiveExtend(s: Int): Int = {
          if (s == 0) return 0
          var v = 0; var i = 0
          while (i < s) { v = (v << 1) | readBit(); i += 1 }
          if (v < (1 << (s - 1))) v - (1 << s) + 1 else v
        }

        // T.81 A.2: a SINGLE-component scan is NON-interleaved — the
        // MCU is one data unit and the SOF sampling factors do not
        // shape the scan (a grayscale file may legally declare 2×2)
        if (nComp == 1) { compH(0) = 1; compV(0) = 1 }
        // general interleaved-MCU geometry: each MCU carries
        // compV(c)×compH(c) blocks per component — covers 4:4:4,
        // 4:2:0, 4:2:2, 4:4:0; planes store each component at its
        // NATIVE (possibly subsampled) resolution
        val hmax = compH.max; val vmax = compV.max
        val mcuCols = (w + 8 * hmax - 1) / (8 * hmax)
        val mcuRows = (h + 8 * vmax - 1) / (8 * vmax)
        val strideC = Array.tabulate(nComp)(c => mcuCols * 8 * compH(c))
        val planes = Array.tabulate(nComp)(c =>
          new Array[Int](strideC(c) * mcuRows * 8 * compV(c)))
        val pred = new Array[Int](nComp)
        val coef = new Array[Int](64)
        val blk = new Array[Int](64)
        val tmp = new Array[Double](64)
        // decode one entropy-coded block of component c into blk
        def decodeBlock(c: Int): Unit = {
          java.util.Arrays.fill(coef, 0)
          if (huff(0)(compDc(c)) == null || huff(1)(compAc(c)) == null)
            fail("scan references an undefined huffman table")
          val s0 = decodeHuff(huff(0)(compDc(c)))
          pred(c) += receiveExtend(s0)
          coef(0) = pred(c)
          var k = 1
          var eob = false
          while (k < 64 && !eob) {
            val rs = decodeHuff(huff(1)(compAc(c)))
            if (rs == 0x00) eob = true
            else if (rs == 0xf0) k += 16
            else {
              k += (rs >> 4)
              if (k > 63) fail("AC index out of range")
              coef(ZigZag(k)) = receiveExtend(rs & 0x0f)
              k += 1
            }
          }
          val qt = quant(compQt(c))
          if (qt == null) fail("missing quant table")
          // dequant + separable IDCT (rows then columns); the quant
          // table is in zigzag order, coef is natural — index qt by
          // the zigzag position
          var y0 = 0
          while (y0 < 8) {
            var x0 = 0
            while (x0 < 8) {
              var sum = 0.0
              var u = 0
              while (u < 8) {
                sum += cosT(x0)(u) * coef(y0 * 8 + u) *
                  qt(natToZig(y0 * 8 + u))
                u += 1
              }
              tmp(y0 * 8 + x0) = sum
              x0 += 1
            }
            y0 += 1
          }
          var x1 = 0
          while (x1 < 8) {
            var y1 = 0
            while (y1 < 8) {
              var sum = 0.0
              var v = 0
              while (v < 8) {
                sum += cosT(y1)(v) * tmp(v * 8 + x1)
                v += 1
              }
              blk(y1 * 8 + x1) = math.max(0, math.min(255,
                math.floor(sum + 128.5).toInt))
              y1 += 1
            }
            x1 += 1
          }
        }
        var mcu = 0
        var my = 0
        while (my < mcuRows) {
          var mx = 0
          while (mx < mcuCols) {
            if (restartInterval > 0 && mcu > 0 &&
                mcu % restartInterval == 0) {
              // skip to the RSTn marker at a byte boundary — the
              // unconsumed tail may hold a stuffed FF00 (a padding
              // byte whose bits were never read) and optional 0xFF
              // fill bytes (T.81 §B.1.1.2) before the marker; scan
              // past those, consume the RSTn, and only then reset
              // the DC predictors. Anything else is a desync.
              bitCnt = 0
              var found = false
              while (!found) {
                if (bp + 1 >= b.length) fail("truncated restart segment")
                val b0 = b(bp) & 0xff; val b1 = b(bp + 1) & 0xff
                if (b0 == 0xff && (b1 & 0xf8) == 0xd0) {
                  bp += 2; found = true
                } else if (b0 == 0xff && b1 == 0x00) bp += 2 // stuffed pad
                else if (b0 == 0xff && b1 == 0xff) bp += 1   // fill byte
                else fail("expected RSTn at restart boundary")
              }
              java.util.Arrays.fill(pred, 0)
            }
            var c = 0
            while (c < nComp) {
              var bv = 0
              while (bv < compV(c)) {
                var bu = 0
                while (bu < compH(c)) {
                  decodeBlock(c)
                  val plane = planes(c); val st = strideC(c)
                  val rowOff = (my * compV(c) + bv) * 8
                  val colOff = (mx * compH(c) + bu) * 8
                  var yy = 0
                  while (yy < 8) {
                    var xx = 0
                    while (xx < 8) {
                      plane((rowOff + yy) * st + colOff + xx) =
                        blk(yy * 8 + xx)
                      xx += 1
                    }
                    yy += 1
                  }
                  bu += 1
                }
                bv += 1
              }
              c += 1
            }
            mcu += 1
            mx += 1
          }
          my += 1
        }

        // color conversion over the REAL w×h window; subsampled
        // chroma upsamples by replication (box) — exact for the
        // flat-tile certification streams, the standard
        // nearest-neighbor convention otherwise
        val out = new Array[Byte](w * h * 3)
        var py = 0
        while (py < h) {
          var px = 0
          while (px < w) {
            def sample(c: Int): Int =
              planes(c)((py * compV(c) / vmax) * strideC(c) +
                px * compH(c) / hmax)
            val o = (py * w + px) * 3
            if (nComp == 1) {
              val yv = sample(0)
              out(o) = yv.toByte; out(o + 1) = yv.toByte
              out(o + 2) = yv.toByte
            } else {
              val yv = sample(0).toDouble
              val cb = sample(1) - 128
              val cr = sample(2) - 128
              def cl(x: Double): Int =
                math.max(0, math.min(255, math.floor(x).toInt))
              out(o) = cl(yv + 1.402 * cr + 0.5).toByte
              out(o + 1) = cl(yv - 0.344136 * cb - 0.714136 * cr + 0.5).toByte
              out(o + 2) = cl(yv + 1.772 * cb + 0.5).toByte
            }
            px += 1
          }
          py += 1
        }
        (w, h, out)
    }
  }

  /** natural (row-major) index → zigzag position. */
  private lazy val natToZig: Array[Int] = {
    val inv = new Array[Int](64)
    var i = 0
    while (i < 64) { inv(ZigZag(i)) = i; i += 1 }
    inv
  }

  // ── YUV4MPEG2 (Y4M) uncompressed video ────────────────────────────

  /** Frame payload length for a Y4M colorspace tag (the text after
    * `C` in the stream header). C444 carries three full planes; the
    * C420 family (jpeg/mpeg2/paldv — same plane LAYOUT, different
    * chroma siting metadata) carries Y full + Cb,Cr at half
    * resolution each way, which requires even dimensions. Anything
    * else (C422, C411, Cmono) fails loudly — a silent wrong-stride
    * walk would "decode" garbage. */
  private def y4mFrameLen(w: Int, h: Int, cs: String): Long =
    if (cs.startsWith("444")) 3L * w * h
    else if (cs.startsWith("420")) {
      if (w % 2 != 0 || h % 2 != 0)
        throw new IllegalArgumentException(
          s"C420 requires even dimensions, got ${w}x$h")
      w.toLong * h + 2L * (w / 2) * (h / 2)
    } else throw new IllegalArgumentException(
      s"unsupported Y4M colorspace C$cs")

  /**
   * Y4M (YUV4MPEG2) encode — the public uncompressed video container
   * (mjpegtools yuv4mpeg(5)): one ASCII stream header
   * `YUV4MPEG2 W<w> H<h> F<num>:<den> Ip A1:1 C<cs>\n`, then per
   * frame an ASCII `FRAME\n` marker + raw planes (Y, then Cb, then
   * Cr). `frames` carry full per-frame payloads already laid out for
   * `colorspace` (see [[y4mFrameLen]]).
   */
  def y4mEncode(width: Int, height: Int, fpsNum: Int, fpsDen: Int,
      colorspace: String, frames: Seq[Array[Byte]],
      extraParams: String = ""): Array[Byte] = {
    val frameLen = y4mFrameLen(width, height, colorspace)
    frames.foreach(f => require(f.length == frameLen,
      s"frame payload ${f.length} != $frameLen for C$colorspace ${width}x$height"))
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    val out = new java.io.ByteArrayOutputStream()
    out.write((s"YUV4MPEG2 W$width H$height F$fpsNum:$fpsDen Ip A1:1 " +
      s"C$colorspace$extraParams\n").getBytes(ascii))
    frames.foreach { f =>
      out.write("FRAME\n".getBytes(ascii))
      out.write(f)
    }
    out.toByteArray
  }

  /**
   * Synthesize a REAL video table: one valid Y4M stream per input
   * row, dimensions / frame count / colorspace / plane bytes pure
   * integer arithmetic in the row id — `width = 4 + 2·(id mod 6)`,
   * `height = 4 + 2·(id mod 4)` (even, so 4:2:0 is legal),
   * `n_frames = 1 + id mod 5`, colorspace C420jpeg when id is even
   * else C444, 25:1 fps, and plane bytes
   * `Y(f,p) = (id·17 + f·29 + p·7) mod 256`,
   * `Cb(f,q) = (id·23 + f·31 + q·11 + 1) mod 256`,
   * `Cr(f,q) = (id·19 + f·37 + q·13 + 2) mod 256` — so an
   * independent engine replays every decoded feature from the id
   * alone. (No video corpus in this container; the FORMAT and the
   * frame-stride walk are real even though the pixels are synthetic.)
   */
  def synthesizeY4m(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long].map { d =>
      val w = 4 + 2 * math.floorMod(d, 6L).toInt
      val h = 4 + 2 * math.floorMod(d, 4L).toInt
      val nf = 1 + math.floorMod(d, 5L).toInt
      val cs = if (d % 2 == 0) "420jpeg" else "444"
      val cLen = if (cs.startsWith("420")) (w / 2) * (h / 2) else w * h
      val frames = (0 until nf).map { f =>
        val buf = new Array[Byte](w * h + 2 * cLen)
        var p = 0
        while (p < w * h) {
          buf(p) = math.floorMod(d * 17L + f * 29L + p * 7L, 256L).toByte
          p += 1
        }
        var q = 0
        while (q < cLen) {
          buf(w * h + q) =
            math.floorMod(d * 23L + f * 31L + q * 11L + 1L, 256L).toByte
          buf(w * h + cLen + q) =
            math.floorMod(d * 19L + f * 37L + q * 13L + 2L, 256L).toByte
          q += 1
        }
        buf
      }
      (d.toString, "video", y4mEncode(w, h, 25, 1, cs, frames))
    }.toDF("media_id", "media_type", "content")
  }

  /** Per-video features decoded from REAL container bytes. Sums and
    * floor-milli means are exact integers — engine-replayable. */
  final case class Y4mFeatures(
      media_id: String, width: Int, height: Int,
      fps_num: Int, fps_den: Int, colorspace: String,
      n_frames: Long, duration_ms: Long,
      y_sum: Long, cb_sum: Long, cr_sum: Long,
      y_mean_milli: Long, cb_mean_milli: Long, cr_mean_milli: Long)

  /** Strict YUV4MPEG2 parse: stream-header params, then the
    * frame-stride walk — `FRAME[ params]\n` marker + fixed-length
    * planes per frame. Truncated payloads, trailing garbage, a
    * missing marker, or an unsupported colorspace all throw. */
  /** Parsed YUV4MPEG2 stream layout: header params plus the byte
    * offset of each frame's plane payload (Y, then Cb, then Cr). */
  private[ext] final case class Y4mLayout(
      width: Int, height: Int, fpsNum: Int, fpsDen: Int,
      colorspace: String, frameOffsets: Array[Int])

  /** The YUV4MPEG2 container walk shared by the aggregate decode and
    * the perceptual per-frame hasher: stream-header params, then the
    * `FRAME[ params]\n` marker + fixed-stride plane walk, returning
    * every frame's payload offset. All malformation failures live
    * here, so every consumer inherits identical strictness. */
  private[ext] def y4mWalk(id: String, bytes: Array[Byte]): Y4mLayout = {
    def fail(msg: String) =
      throw new IllegalArgumentException(s"Y4M $id: $msg")
    def lineEnd(from: Int): Int = {
      var i = from
      while (i < bytes.length && bytes(i) != '\n') i += 1
      if (i >= bytes.length) fail("unterminated header line") else i
    }
    val magic = "YUV4MPEG2"
    if (bytes.length < magic.length ||
        new String(bytes, 0, magic.length,
          java.nio.charset.StandardCharsets.US_ASCII) != magic)
      fail("bad magic")
    val hEnd = lineEnd(0)
    val header = new String(bytes, 0, hEnd,
      java.nio.charset.StandardCharsets.US_ASCII)
    var w = -1; var h = -1; var fn = 25; var fd = 1
    var cs = "420jpeg" // the documented default when C is absent
    header.split(" ").drop(1).filter(_.nonEmpty).foreach { p =>
      (p.head, p.tail) match {
        case ('W', v) => w = v.toInt
        case ('H', v) => h = v.toInt
        case ('F', v) =>
          val Array(a, b) = v.split(":", 2); fn = a.toInt; fd = b.toInt
        case ('C', v) => cs = v
        case ('I', _) | ('A', _) | ('X', _) => () // interlace/aspect/comment
        case _ => fail(s"unknown header parameter '$p'")
      }
    }
    if (w <= 0 || h <= 0) fail(s"missing/invalid dimensions W$w H$h")
    if (fn <= 0 || fd <= 0) fail(s"invalid frame rate F$fn:$fd")
    val frameLen = y4mFrameLen(w, h, cs) // throws on unsupported cs
    var pos = hEnd + 1
    val offs = scala.collection.mutable.ArrayBuffer.empty[Int]
    while (pos < bytes.length) {
      if (pos + 5 > bytes.length ||
          new String(bytes, pos, 5,
            java.nio.charset.StandardCharsets.US_ASCII) != "FRAME")
        fail(s"expected FRAME marker at offset $pos")
      pos = lineEnd(pos) + 1 // frame params (if any) are ignored
      if (pos + frameLen > bytes.length)
        fail(s"truncated frame ${offs.length + 1}: need $frameLen bytes at $pos")
      offs += pos
      pos += frameLen.toInt
    }
    if (offs.isEmpty) fail("stream has no frames")
    Y4mLayout(w, h, fn, fd, cs, offs.toArray)
  }

  private def parseY4m(id: String, bytes: Array[Byte]): Y4mFeatures = {
    val lay = y4mWalk(id, bytes)
    val w = lay.width; val h = lay.height
    val yLen = w.toLong * h
    val frameLen = y4mFrameLen(w, h, lay.colorspace)
    val cLen = ((frameLen - yLen) / 2).toInt
    var ySum = 0L; var cbSum = 0L; var crSum = 0L
    lay.frameOffsets.foreach { pos =>
      var i = 0
      while (i < yLen) { ySum += bytes(pos + i) & 0xff; i += 1 }
      i = 0
      while (i < cLen) {
        cbSum += bytes(pos + yLen.toInt + i) & 0xff
        crSum += bytes(pos + yLen.toInt + cLen + i) & 0xff
        i += 1
      }
    }
    val nf = lay.frameOffsets.length.toLong
    val nY = nf * yLen
    val nC = nf * cLen
    Y4mFeatures(id, w, h, lay.fpsNum, lay.fpsDen, "C" + lay.colorspace, nf,
      nf * 1000L * lay.fpsDen / lay.fpsNum,
      ySum, cbSum, crSum,
      ySum * 1000L / nY, cbSum * 1000L / nC, crSum * 1000L / nC)
  }

  /**
   * REAL container walk for one deterministic public video format:
   * parse the YUV4MPEG2 stream header and stride through the frames,
   * aggregating per-plane sums and floor-milli means. Same
   * `mapPartitions` batch shape as [[decodePpm]]/[[decodeWav]] —
   * media bytes never cross a shuffle; each task holds one batch.
   * This is the image→audio→VIDEO completion of the codec ladder:
   * the frame-stride walk is exactly what a JNI/FFI h264 decoder
   * replaces, with schema/partitioning/batching unchanged.
   */
  def decodeY4m(media: DataFrame): Dataset[Y4mFeatures] = {
    implicit val enc = Encoders.product[Y4mFeatures]
    media.select("media_id", "content").mapPartitions { rows =>
      rows.map(r => parseY4m(r.getString(0), r.getAs[Array[Byte]](1)))
    }
  }

  /** One row per failed decode — the per-record error channel of
    * [[decodeY4mChannel]]. */
  final case class Y4mOutcome(
      media_id: String, ok: Long, width: Option[Int],
      height: Option[Int], n_frames: Option[Long],
      y_mean_milli: Option[Long])

  /** TOLERANT Y4M decode: per-record isolation around [[parseY4m]] —
    * a truncated or garbage stream yields an `ok = 0` row instead of
    * killing the task (the [[decodePpmChannel]] contract: at 100 TB a
    * corrupt file per million is a certainty). */
  def decodeY4mChannel(media: DataFrame): Dataset[Y4mOutcome] = {
    implicit val enc = Encoders.product[Y4mOutcome]
    media.select("media_id", "content").mapPartitions { rows =>
      rows.map { r =>
        val id = r.getString(0)
        try {
          val f = parseY4m(id, r.getAs[Array[Byte]](1))
          Y4mOutcome(id, 1L, Some(f.width), Some(f.height),
            Some(f.n_frames), Some(f.y_mean_milli))
        } catch {
          case scala.util.control.NonFatal(_) =>
            Y4mOutcome(id, 0L, None, None, None, None)
        }
      }
    }
  }
}
