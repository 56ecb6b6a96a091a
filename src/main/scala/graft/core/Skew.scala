package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Skew-mitigation utilities. AQE's skew-join handling
 * (`spark.sql.adaptive.skewJoin`) covers sort-merge joins at runtime;
 * this manual salting utility is for the cases AQE can't re-plan —
 * aggregations over hot keys and joins forced to a fixed strategy —
 * and as the explicit technique when a key's skew is known up front
 * (e.g. one user_id owning 10% of a 100 TB event table).
 */
object Skew {

  /**
   * Salted equi-join: the big (skewed) side gets a deterministic salt
   * in [0, saltFactor); the small side is replicated once per salt
   * value; the join key becomes (key, salt), splitting each hot key's
   * rows across `saltFactor` tasks. Result equals the plain inner
   * join, row for row.
   */
  def saltedJoin(
      big: DataFrame, small: DataFrame, key: String,
      saltFactor: Int = 16): DataFrame = {
    val bigSalted = big.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(saltFactor.toLong)))
    val smallReplicated = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltFactor.toLong - 1))))
    bigSalted.join(smallReplicated, Seq(key, "__salt")).drop("__salt")
  }

  /**
   * Two-phase (salted) aggregation for hot grouping keys: aggregate
   * (key, salt) partials first — splitting each hot key across
   * `saltFactor` reducers — then combine partials per key. The caller
   * supplies associative partial/final aggregate pairs.
   */
  def saltedCount(df: DataFrame, key: String, saltFactor: Int = 16): DataFrame =
    df.withColumn("__salt",
        pmod(monotonically_increasing_id(), lit(saltFactor.toLong)))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as("cnt"))

  /**
   * Two-phase count+sum with a DETERMINISTIC salt column (caller
   * supplies it — e.g. `pmod(row_id, 16)`): each hot key's rows
   * split across `__salt` reducers in phase 1, the per-key combine
   * in phase 2 touches `saltFactor` partial rows per key. Result
   * equals the plain `groupBy(key).agg(count, sum)` exactly — both
   * aggregates are associative, which is precisely what makes the
   * split legal (and what the oracle row certifies).
   */
  def saltedCountSum(
      df: DataFrame, key: String, valueCol: String,
      salt: org.apache.spark.sql.Column): DataFrame =
    df.withColumn("__salt", salt)
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__pc"), sum(col(valueCol)).as("__ps"))
      .groupBy(col(key))
      .agg(sum(col("__pc")).as("n"), sum(col("__ps")).as(valueCol))
}
