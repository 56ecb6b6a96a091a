package graft.util

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/**
 * Shared plumbing of the persisted generation-pointer index families
 * ([[graft.ext.VectorIndex]], [[graft.ext.DedupIndex]],
 * [[graft.ext.TrainedQuality]]'s model store, [[BucketedSwapIndex]]),
 * extracted so the stage-tables → guard-empty-writes →
 * [[GenSwap.commit]] → read-params discipline — and the
 * DELTA-NARROWED refresh commit built on it — lives once:
 *
 *  - [[ensureReadable]]: the zero-row partitionBy-write guard every
 *    family needs (an empty frame leaves no schema-bearing file, so
 *    the next `spark.read.parquet` throws);
 *  - [[writeAll]]: concurrent independent stage-table writes that
 *    are ALWAYS settled before returning — a failure in one write
 *    never leaves the others running detached against an abandoned
 *    generation dir;
 *  - [[partitionValues]] / [[carryUntouched]]: the
 *    delta-proportional-commit primitive — a refresh Spark-writes
 *    ONLY the `partCol=value` dirs its delta touches and carries
 *    every untouched dir forward via
 *    [[SwapCommit.linkOrCopyRec]] (hard links locally: zero new
 *    bytes; per-object copy on stores without links), so a 0.1%
 *    daily delta stops costing a full-index write volume per commit.
 */
object GenIndex {

  /** Empty-write guard shared by every persisted table here: a
    * partitionBy/spread write of a zero-row frame leaves no
    * schema-bearing file — probe the dir and rewrite a flat empty
    * marker from an explicit schema (partition columns become data
    * columns; readers handle that identically, they just lose
    * pruning). */
  def ensureReadable(
      spark: SparkSession, path: String, schema: => StructType): Unit =
    if (!Fs.hasData(path, acceptDirs = true)) {
      SwapCommit.deleteRec(path)
      spark.createDataFrame(
        spark.sparkContext.parallelize(Seq.empty[Row], 1), schema)
        .write.parquet(path)
    }

  /** One-row params table: build parameters ride the committed state
    * so probes and refreshes read them instead of trusting callers to
    * repeat them. */
  def writeParams(df: DataFrame, dir: String): Unit =
    df.repartition(1).write.parquet(dir)

  def readParamsRow(spark: SparkSession, dir: String): Row =
    spark.read.parquet(dir).collect()(0)

  /** Run independent stage-table writes CONCURRENTLY (Spark job
    * submission is thread-safe; serializing them was measured as pure
    * commit-floor latency in the DedupIndex lifecycle), settling
    * EVERY write before returning: a failure in one must not leave
    * the others running detached — contending for cores — against a
    * generation dir the failure just abandoned. The first failure (in
    * argument order) rethrows after all have settled. */
  def writeAll(writes: (() => Unit)*): Unit = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val settled = writes.map(w => Future(w()))
      .map(f => scala.util.Try(Await.result(f, Duration.Inf)))
    settled.collectFirst { case scala.util.Failure(e) => throw e }
      .foreach(_ => ())
  }

  /** Partition-dir VALUES (the `value` of each `partCol=value` child
    * dir) present under a dir-partitioned table; empty for flat
    * layouts and the degenerate empty marker — callers fall back to a
    * full rewrite there. */
  def partitionValues(tableDir: String, partCol: String): Seq[String] =
    Fs.list(tableDir).collect {
      case st if st.isDirectory &&
          st.getPath.getName.startsWith(partCol + "=") =>
        st.getPath.getName.stripPrefix(partCol + "=")
    }

  /** Carry every partition dir of `prevTable` NOT in `touched` into
    * `newTable` without a rewrite ([[SwapCommit.linkOrCopyRec]]).
    * `touched` holds the string forms of the partition values the
    * refresh Spark-wrote (integer buckets print identically in the
    * dir name and `String.valueOf`). Returns the carried-dir count. */
  def carryUntouched(
      prevTable: String, newTable: String, partCol: String,
      touched: Set[String]): Int = {
    val untouched = partitionValues(prevTable, partCol)
      .filterNot(touched)
    untouched.foreach { v =>
      SwapCommit.linkOrCopyRec(
        s"$prevTable/$partCol=$v", s"$newTable/$partCol=$v")
    }
    untouched.size
  }
}
