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
