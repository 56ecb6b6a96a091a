package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/**
 * Testdata table reader. The driver-generated `events.parquet` stores
 * `ts` as parquet TIMESTAMP(NANOS), which Spark's vectorized reader
 * rejects; sessions set `spark.sql.legacy.parquet.nanosAsLong=true`
 * and this reader converts the resulting long (nanoseconds) back to a
 * proper TimestampType at microsecond precision (the data is
 * micro-precise — sub-microsecond part is zero, verified).
 */
object Tables {
  def read(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.foldLeft(df) { (acc, f) =>
      if (f.name == "ts" && f.dataType == LongType)
        acc.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else acc
    }
  }

  /**
   * Spread a narrow scan across all cores before CPU-heavy narrow
   * transforms (shingling, hashing, embedding math). A single parquet
   * file with one row group plans as ONE input partition regardless of
   * `maxPartitionBytes` — row groups are the split unit — so without
   * this the per-document work runs on 1 of N cores. At production
   * scale inputs already carry ≥ parallelism partitions and this is a
   * no-op; the shuffle only ever moves data that fit in one partition.
   */
  def spread(df: DataFrame): DataFrame = {
    val want = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < want) df.repartition(want) else df
  }

  /** Session defaults shared by Verify / Bench / tests. */
  def session(appName: String, cpus: String): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(s)
    s
  }
}
