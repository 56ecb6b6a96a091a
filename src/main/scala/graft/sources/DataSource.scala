package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Result of a connectivity/setup check (reference:
  * Classes/ImportService.php:57-63 merging per-connector Results). */
final case class ValidationResult(
    errors: Seq[String] = Nil,
    warnings: Seq[String] = Nil,
    notices: Seq[String] = Nil) {
  def ok: Boolean = errors.isEmpty
  def merge(other: ValidationResult): ValidationResult =
    ValidationResult(errors ++ other.errors, warnings ++ other.warnings,
      notices ++ other.notices)
}

/**
 * A data source yields a raw (un-keyed) DataFrame — the Spark
 * equivalent of the reference's `DataSourceInterface::load()`
 * returning `DataRecords` (Classes/DataSource/DataSourceInterface.php).
 *
 * Keying (id designation, version normalization, last-wins dedup)
 * happens in the pipeline via [[graft.core.Records.keyRecords]] so
 * every source stays a plain lazy scan that Catalyst can prune.
 */
trait DataSource {
  def load(spark: SparkSession): DataFrame
  def setup(spark: SparkSession): ValidationResult = ValidationResult()

  /** Ordering column making "last occurrence wins" well-defined for
    * this source, if the source has a natural order. */
  def orderColumn: Option[org.apache.spark.sql.Column] = None
}

/**
 * S1 — file source. The reference reads a whole JSON-array file
 * (Classes/DataSource/File/FileSource.php:37-41); we generalize to
 * parquet/csv/json by extension, like the natural Spark reader.
 *
 * For JSON array files the read is multiLine and effectively
 * single-partition, so `monotonically_increasing_id()` preserves file
 * order — which makes last-wins dedup exact (SURVEY §7.4.2). Parquet
 * and CSV at scale are multi-partition; callers needing a total order
 * pass an explicit version/order attribute instead.
 */
final case class FileSource(path: String, format: Option[String] = None,
    options: Map[String, String] = Map.empty)
    extends DataSource {

  private def fmt: String = format.getOrElse {
    path.replaceAll("^.*\\.", "").toLowerCase match {
      case "json" => "json"
      case "csv" => "csv"
      case "orc" => "orc"
      case _ => "parquet"
    }
  }

  override def load(spark: SparkSession): DataFrame = {
    // per-format defaults first, caller-supplied reader options last —
    // an explicit caller option (e.g. header=false, multiLine=false,
    // mergeSchema) always wins over the default
    val withDefaults = fmt match {
      case "json" => spark.read.option("multiLine", "true")
      case "csv" => spark.read.option("header", "true")
        .option("inferSchema", "true")
      case _ => spark.read
    }
    val r = withDefaults.options(options)
    fmt match {
      case "json" => r.json(path)
      case "csv" => r.csv(path)
      case "orc" => r.orc(path)
      case _ => r.parquet(path)
    }
  }

  override def setup(spark: SparkSession): ValidationResult = {
    val p = new java.io.File(path)
    if (!p.exists())
      ValidationResult(errors = Seq(s"File $path does not exist"))
    else if (!p.canRead)
      ValidationResult(errors = Seq(s"File $path is not readable"))
    else ValidationResult()
  }

  override def orderColumn = Some(monotonically_increasing_id())
}

/**
 * S5 — programmatic source (test seam), the reference's
 * `ClosureDataSource` (Classes/DataSource/Closure/ClosureDataSource.php:48-51).
 */
final case class InlineSource(make: SparkSession => DataFrame)
    extends DataSource {
  override def load(spark: SparkSession): DataFrame = make(spark)
  override def orderColumn = Some(monotonically_increasing_id())
}

/**
 * S2 — HTTP JSON source (Classes/DataSource/Http/HttpSource.php:50-74).
 * Driver-side fetch (the endpoint returns one JSON document — a
 * control-feed, not bulk data; bulk flows through distributed file
 * readers, SURVEY §7.4.7) → distributed parse via
 * `spark.read.json(Dataset[String])`.
 *
 * Reference semantics preserved:
 *  - non-200 status is an error (HttpSource.php:57-60);
 *  - an EMPTY result is an error, not an empty sync — guards against
 *    mass-deletion from a broken endpoint (HttpSource.php:70-72).
 */
final case class HttpSource(
    endpoint: String,
    headers: Map[String, String] = Map.empty)
    extends DataSource {

  private[sources] def fetch(): String = {
    import java.net.http.{HttpClient, HttpRequest, HttpResponse}
    import java.net.URI
    val client = HttpClient.newHttpClient()
    val builder = HttpRequest.newBuilder(URI.create(endpoint)).GET()
    headers.foreach { case (k, v) => builder.header(k, v) }
    val resp = client.send(builder.build(), HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() != 200)
      throw new IllegalStateException(
        s"Unexpected response status ${resp.statusCode()} from $endpoint")
    resp.body()
  }

  override def load(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val body = fetch()
    val df = spark.read.json(Seq(body).toDS())
    if (df.isEmpty)
      throw new IllegalStateException(
        s"Empty result from $endpoint — refusing to sync (mass-deletion guard)")
    df
  }

  override def setup(spark: SparkSession): ValidationResult =
    try { fetch(); ValidationResult() }
    catch {
      case e: Exception =>
        ValidationResult(errors = Seq(s"Endpoint $endpoint unreachable: ${e.getMessage}"))
    }

  override def orderColumn = Some(monotonically_increasing_id())
}

/**
 * S3/S4 — JDBC table source (Classes/DataSource/Dbal/DbalSource.php:51-80).
 * The reference's "lazy" narrow read (S4, SELECT id,version only) is
 * subsumed by Catalyst column pruning: a downstream
 * `select(__id, __version)` reaches the JDBC scan as a narrow SELECT.
 *
 * Scale note: `partitionColumn`/`numPartitions` shard the read across
 * executors — the reference's single `SELECT *` would serialize 100 TB
 * through one connection.
 */
final case class JdbcSource(
    url: String,
    table: String,
    properties: Map[String, String] = Map.empty,
    partitionColumn: Option[String] = None,
    numPartitions: Int = 8)
    extends DataSource {

  override def load(spark: SparkSession): DataFrame = {
    val reader = spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
    val withProps = properties.foldLeft(reader) {
      case (r, (k, v)) => r.option(k, v)
    }
    partitionColumn match {
      case Some(pc) =>
        // REAL bounds, queried once driver-side: Spark strides
        // (upper - lower) / numPartitions, so Long.MinValue/MaxValue
        // placeholder bounds would put every realistic key in the one
        // stride covering ~0 — a serial read behind N-1 empty tasks.
        val props = new java.util.Properties()
        properties.foreach { case (k, v) => props.setProperty(k, v) }
        val conn = java.sql.DriverManager.getConnection(url, props)
        val (lo, hi) =
          try {
            val rs = conn.createStatement()
              .executeQuery(s"SELECT MIN($pc), MAX($pc) FROM $table")
            rs.next()
            val lo = rs.getLong(1); val empty = rs.wasNull()
            val hi = rs.getLong(2)
            if (empty) (0L, 1L) else (lo, math.max(hi, lo + 1))
          } finally conn.close()
        withProps.option("partitionColumn", pc)
          .option("numPartitions", numPartitions.toString)
          .option("lowerBound", lo.toString)
          .option("upperBound", hi.toString)
          .load()
      case None => withProps.load()
    }
  }

  override def setup(spark: SparkSession): ValidationResult =
    try {
      load(spark).limit(1).collect()
      ValidationResult()
    } catch {
      case e: Exception =>
        ValidationResult(errors = Seq(s"JDBC source $url/$table: ${e.getMessage}"))
    }
}
