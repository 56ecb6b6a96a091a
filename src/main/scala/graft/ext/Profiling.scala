package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * One-pass data profiling — the "what is in this table" primitive a
 * curation pipeline runs before anything else: per-column row count,
 * null count, exact distinct count, and min/max, in long format
 * (one output row per profiled column).
 *
 * Scale shape: ONE aggregation job for all columns. The multiple
 * exact `count(DISTINCT c)` aggregates plan through Spark's Expand
 * (each input row replicates once per distinct-aggregate, then one
 * partial-aggregated exchange) — a k-column profile costs one scan
 * and one shuffle of k× partially-collapsed rows, not k jobs. The
 * melt from the single result row to long format runs on 1 row.
 * For corpus-scale distinct cardinalities where exactness is not
 * required, `approx_count_distinct` drops the Expand entirely —
 * exactness is this operator's contract because the oracle replays
 * it.
 *
 * Min/max surface as strings so heterogeneous column types share one
 * output schema; callers pre-cast doubles to scaled integers for
 * cross-engine stability (the floor-cents convention).
 */
object Profiling {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "cols must be non-empty")
    require(cols.forall(df.columns.contains),
      s"unknown columns: ${cols.filterNot(df.columns.contains)}")
    val aggs: Seq[Column] =
      count(lit(1)).as("__total") +: cols.flatMap { c =>
        Seq(
          count(col(c)).as(s"__nn_$c"),
          countDistinct(col(c)).as(s"__nd_$c"),
          min(col(c)).cast("string").as(s"__min_$c"),
          max(col(c)).cast("string").as(s"__max_$c"))
      }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val entries = cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col("__total").as("n"),
        (col("__total") - col(s"__nn_$c")).as("n_null"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__min_$c").as("min_s"),
        col(s"__max_$c").as("max_s"))
    }
    one.select(explode(array(entries: _*)).as("p")).select(col("p.*"))
      // empty input profiles to an empty result (the engine-wide
      // empty-in/empty-out contract), not to all-zero rows
      .filter(col("n") > 0)
  }

  /**
   * The 100 TB profiling path: `approx_count_distinct` (HLL++) per
   * column instead of exact distinct — NO Expand, so a k-column
   * profile is one plain aggregate over unreplicated rows. Emitted
   * as a CONTRACT row (the q_approx_distinct convention): the exact
   * distinct count plus an `approx_ok` bit asserting the sketch
   * landed within `relError` of it — the oracle replays the exact
   * values and TRUE, so a drifting sketch turns the row red.
   */
  def profileApprox(
      df: DataFrame, cols: Seq[String],
      rsd: Double = 0.05, relError: Double = 0.10): DataFrame = {
    require(cols.nonEmpty, "cols must be non-empty")
    val aggs: Seq[Column] =
      count(lit(1)).as("__total") +: cols.flatMap { c =>
        Seq(
          count(col(c)).as(s"__nn_$c"),
          countDistinct(col(c)).as(s"__nd_$c"),
          approx_count_distinct(col(c), rsd).as(s"__nda_$c"))
      }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val entries = cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col("__total").as("n"),
        (col("__total") - col(s"__nn_$c")).as("n_null"),
        col(s"__nd_$c").as("n_distinct"),
        (abs(col(s"__nda_$c") - col(s"__nd_$c")).cast("double") <=
          lit(relError) * col(s"__nd_$c").cast("double"))
          .as("approx_ok"))
    }
    one.select(explode(array(entries: _*)).as("p")).select(col("p.*"))
      .filter(col("n") > 0)
  }
}
