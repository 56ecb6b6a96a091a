package graft.util

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Bucket-partitioned persisted index under the GENERATION-POINTER
 * commit — the common layout of the clip-search indexes
 * ([[graft.ext.AudioHash]], [[graft.ext.VideoHash]]): narrow key rows
 * written `PARTITIONED BY (bucket = pmod(key, nBuckets))`, so an
 * exact-key probe that carries the same bucket column joins against
 * the PARTITION column and dynamic partition pruning narrows the
 * scan to the probed buckets. Commit discipline is [[GenSwap]]: each
 * build/refresh stages a fresh immutable `root/gen-<n>` and flips
 * `root/CURRENT` — O(pointer) commits on object stores, in-flight
 * readers of the previous generation survive one concurrent refresh,
 * crashes leave only orphaned never-referenced dirs. Legacy roots
 * written by the pre-generation in-place swap read transparently
 * (any pending legacy swap completes first) and migrate on their
 * next commit.
 */
object BucketedSwapIndex {

  def manifest(root: String): String = root + ".swap-manifest"

  /** Resolve the committed index dir: generation pointer, or the
    * legacy flat/partitioned root itself (completing a crashed legacy
    * swap first). None ⇔ never built. */
  def resolve(root: String): Option[String] = {
    SwapCommit.recover(root, manifest(root))
    GenSwap.currentDir(root).orElse(
      // legacy = bucket partition dirs or flat part files at the top
      // level; an orphaned gen-* dir (crashed first stage) is NOT
      // legacy data — the root is simply unbuilt
      if (Fs.list(root).exists { st =>
        val n = st.getPath.getName
        (st.isDirectory && !n.startsWith("gen-")) || n.startsWith("part-")
      }) Some(root)
      else None)
  }

  /** Read the committed index (throws like `spark.read.parquet` on a
    * never-built root — the callers' historical contract). */
  def read(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(resolve(root).getOrElse(root))

  /**
   * Stage `rows` + `bucket = pmod(bucketOf, buckets)` partitioned by
   * bucket into a fresh generation, then flip the pointer (sweeping
   * legacy flat files on the first post-migration commit).
   *
   * Degenerate (zero-row) input: a partitionBy write of an empty
   * frame leaves no data file to infer a schema from — detect
   * driver-side after the single write, then rewrite flat from an
   * explicit 1-partition empty frame (bucket becomes a data column;
   * a probe join handles that identically, it just loses pruning).
   */
  def stageAndSwap(
      root: String, rows: DataFrame, bucketOf: Column,
      buckets: Int): Unit = {
    val staging = GenSwap.nextDir(root)
    val bucketed = rows.withColumn("bucket", pmod(bucketOf, lit(buckets)))
    bucketed.repartition(col("bucket"))
      .write.partitionBy("bucket").parquet(staging)
    if (!Fs.hasData(staging, acceptDirs = true)) {
      SwapCommit.deleteRec(staging)
      val spark = rows.sparkSession
      spark.createDataFrame(
        spark.sparkContext.parallelize(
          Seq.empty[org.apache.spark.sql.Row], 1),
        bucketed.schema).write.parquet(staging)
    }
    GenSwap.commit(root, staging)
    GenSwap.cleanupForeign(root)
    SwapCommit.deleteRec(root + ".staging")
  }
}
