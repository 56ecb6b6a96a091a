package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Range (interval) join — match each point to every interval
 * containing it (analytic surface beyond the reference, like
 * [[AsOfJoin]]).
 *
 * The naive formulation is a cross join with a range predicate —
 * Spark plans it as BroadcastNestedLoopJoin (|P|·|I| comparisons), a
 * scale-killer. Spark-first re-expression (ladder rung (a): compose
 * built-ins): BUCKETIZE the domain.
 *
 *  - every point lands in exactly ONE bucket of width `bucketWidth`;
 *  - every interval EXPLODES to the buckets it covers
 *    (`sequence(floor(s/w), floor(e/w))` — ⌈span/w⌉ + 1 rows);
 *  - equi-join on the bucket, then the exact range predicate filters
 *    within the bucket.
 *
 * Because a point has exactly one bucket, each qualifying
 * (point, interval) pair meets exactly once — no dedup pass. The
 * bucket key is the only shuffle; at 100 TB it hash-partitions
 * evenly, and `bucketWidth` trades interval replication (span/width
 * rows per interval) against bucket selectivity — set it near the
 * typical interval span.
 */
object RangeJoin {

  /**
   * @param points      frame with a numeric point column
   * @param pointCol    the point column (numeric/long)
   * @param intervals   frame with numeric [startCol, endCol] bounds
   *                    (inclusive on both ends)
   * @param bucketWidth domain bucket width, same units as the columns
   */
  def rangeJoin(
      points: DataFrame, pointCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val p = points.withColumn("__bucket",
      floor(col(pointCol) / bucketWidth))
    val iv = intervals.withColumn("__bucket",
      explode(sequence(floor(col(startCol) / bucketWidth),
        floor(col(endCol) / bucketWidth))))
    p.join(iv, Seq("__bucket"))
      .filter(col(pointCol) >= col(startCol) &&
        col(pointCol) <= col(endCol))
      .drop("__bucket")
  }

  /** Reference implementation: the range-predicate theta join Spark
    * plans as a nested loop — kept for small inputs and as the spec's
    * equality baseline. */
  def rangeJoinNaive(
      points: DataFrame, pointCol: String,
      intervals: DataFrame, startCol: String, endCol: String): DataFrame =
    points.join(intervals,
      col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
}
