package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Bucket-partitioned persisted index behind the manifest-logged
 * whole-dir swap — the common layout of the clip-search indexes
 * ([[graft.ext.AudioHash]], [[graft.ext.VideoHash]]): narrow key rows
 * written `PARTITIONED BY (bucket = pmod(key, nBuckets))`, so an
 * exact-key probe that carries the same bucket column joins against
 * the PARTITION column and dynamic partition pruning narrows the
 * scan to the probed buckets. Commit discipline is [[SwapCommit]]:
 * stage the full next state, swap atomically, crash-recover
 * idempotently — through the Hadoop `FileSystem` of the index path
 * ([[Fs]]), so the layout works on `file://` and HDFS alike (see the
 * object-store caveat on [[SwapCommit]]).
 */
object BucketedSwapIndex {

  def manifest(root: String): String = root + ".swap-manifest"

  /** Complete any crashed swap before reading or re-staging. */
  def recover(root: String): Unit =
    SwapCommit.recover(root, manifest(root))

  /**
   * Stage `rows` + `bucket = pmod(bucketOf, buckets)` partitioned by
   * bucket, then swap into `root`.
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
    val staging = root + ".staging"
    SwapCommit.deleteRec(staging)
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
    SwapCommit.commit(root, staging, manifest(root))
  }
}
