package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/**
 * Testdata table reader. Driver generations have stored `events.ts`
 * two ways, both normalized here to a session-TZ TimestampType so
 * every downstream operator sees ONE type:
 *  - parquet TIMESTAMP(NANOS) — Spark's vectorized reader rejects it;
 *    sessions set `spark.sql.legacy.parquet.nanosAsLong=true` and the
 *    resulting long (nanoseconds) converts back to a TimestampType at
 *    microsecond precision (the data is micro-precise — the
 *    sub-microsecond part is zero, verified);
 *  - parquet TIMESTAMP(MICROS, isAdjustedToUTC=false) — Spark infers
 *    TIMESTAMP_NTZ, which time functions (`unix_micros`, watermarks)
 *    reject; the cast to TimestampType is value-preserving because
 *    sessions pin `spark.sql.session.timeZone=UTC` (the same naive-
 *    as-UTC convention DuckDB applies reading the file).
 */
object Tables {
  def read(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.foldLeft(df) { (acc, f) =>
      if (f.name == "ts" && f.dataType == LongType)
        acc.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else if (f.name == "ts" && f.dataType == TimestampNTZType)
        acc.withColumn("ts", col("ts").cast(TimestampType))
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

  /** Session defaults shared by Verify / Bench / tests.
    *
    * `shuffle.partitions` matches the core count — the gate-SF
    * posture, and the number BUCKETED state tables are created at
    * (their diff joins consume the bucketing only when the bucket
    * count satisfies the join's expected partitioning; a larger
    * global initial number makes the planner disable the bucketed
    * scan and re-exchange the state side, PipelineSpec pins this).
    * For LARGE-scale runs set `GRAFT_INITIAL_PARTITIONS` (e.g. 256):
    * AQE then starts every shuffle that wide and COALESCES by size —
    * small stages still land on a handful of post-coalesce
    * partitions, while a 100×-scale sort gets splits that fit task
    * memory (a fixed 32-way sort of a 60M-row join output OOMs at
    * the default heap — the r17 q_pagerank 100×-kg smoke). This is
    * the knob a real deployment sizes per target SF, together with
    * bucket counts sized to match. */
  def session(appName: String, cpus: String): SparkSession = {
    val initial = sys.env.getOrElse("GRAFT_INITIAL_PARTITIONS", cpus)
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        initial)
      // Production posture knobs, env-parameterized with the local
      // defaults unchanged so driver bench series stay comparable:
      //  - GRAFT_PARQUET_CODEC=zstd shrinks state/index bytes ~30-40%
      //    at similar read speed (guide §6) — the right trade on
      //    object stores; snappy locally (the historical series).
      //  - GRAFT_SHJ_LOCALMAP (e.g. "64m") lets AQE rewrite a
      //    sort-merge join to shuffled-hash when every post-shuffle
      //    build partition is under the bound — skips the sort, with
      //    the OOM risk bounded per partition by the same number
      //    (guide §3.1). Off ("0") by default: at 100 TB the safe
      //    default is SMJ unless the operator is measured.
      .config("spark.sql.parquet.compression.codec",
        sys.env.getOrElse("GRAFT_PARQUET_CODEC", "snappy"))
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
        sys.env.getOrElse("GRAFT_SHJ_LOCALMAP", "0"))
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
