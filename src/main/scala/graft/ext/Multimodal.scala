package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column plumbing — engine extension per BASELINE.json.
 *
 * Media (image/audio/video) are opaque `BinaryType` columns with a
 * typed metadata struct. The Spark-side plumbing — schema,
 * partitioning, batch iteration shape — is real and tested; the
 * actual codec step is STUBBED (this container has no image/audio
 * libraries) behind `decodeStub`, a deterministic fake that a
 * production deployment swaps for a real decoder (JNI/FFI or a
 * `mapInArrow` Python worker on clusters that ship one).
 *
 * Scale design: media bytes never pass through a shuffle — metadata
 * extraction is a narrow projection; decode/feature-extract runs
 * `mapPartitions` so each task holds one batch of blobs at a time;
 * frame sampling EXPLODEs only the (tiny) per-frame metadata, not the
 * frame bytes.
 */
object Multimodal {

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
        rows.map { r =>
          val id = r.getString(0); val tpe = r.getString(1)
          val bytes = r.getAs[Array[Byte]](2)
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
      rows.map { r =>
        val id = r.getString(0)
        val b = r.getAs[Array[Byte]](1)
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
}
