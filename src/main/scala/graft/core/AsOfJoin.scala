package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of join — for each left row, the latest right row with the same
 * key whose ordering tuple is strictly before the left row's
 * (time-series point-in-time lookup; not in the reference, part of
 * the engine's analytic surface).
 *
 * Spark-first composition (ladder rung (a): compose built-ins before
 * custom plans): tag and UNION both sides, then one window pass per
 * key ordered by (orderTuple, side) carrying the last right ROW
 * forward as a single struct. Left rows sort BEFORE right rows at an
 * identical ordering tuple, so "strictly before" holds and a row
 * never sees a same-tuple right row (or itself in self-joins).
 *
 * The payload travels as ONE struct (right rows always carry a
 * non-null struct; left rows a null one), so `last(ignoreNulls)`
 * skips exactly the left rows: a genuinely NULL payload VALUE in the
 * latest right row survives, and all carried columns come from the
 * same right row — per-column carry would backfill nulls from older
 * rows and could mix fields across rows.
 *
 * Scale shape: ONE shuffle on the key (the union is shuffle-free);
 * compare a naive per-left-row correlated lookup (a join explosion)
 * or range join (quadratic within key). Window state is one row of
 * payload — no growth with history length.
 */
object AsOfJoin {

  /**
   * @param key         equality columns (same names both sides)
   * @param leftOrder   left ordering columns (e.g. ts, id tie-break)
   * @param rightOrder  right ordering columns, positionally matched
   * @param rightPayload right columns to carry; appear as
   *                     `<prefix><name>` on the output
   */
  def asofJoin(
      left: DataFrame, right: DataFrame, key: Seq[String],
      leftOrder: Seq[String], rightOrder: Seq[String],
      rightPayload: Seq[String], prefix: String = "asof_"): DataFrame = {
    require(leftOrder.nonEmpty && leftOrder.size == rightOrder.size)
    require(rightPayload.nonEmpty, "asofJoin needs at least one payload column")

    val ordCols = leftOrder.indices.map(i => s"__ord$i")
    val payloadTypes = rightPayload.map(p =>
      p -> Records.resolveField(right, p).dataType)
    val payloadStruct = org.apache.spark.sql.types.StructType(
      payloadTypes.map { case (p, t) =>
        org.apache.spark.sql.types.StructField(p, t) })

    val lTagged = left.select(
      left.columns.map(col) ++
        leftOrder.zip(ordCols).map { case (c, o) => col(c).as(o) } ++
        Seq(lit(0).as("__side"),
          lit(null).cast(payloadStruct).as("__r")): _*)
    val rTagged = right.select(
      key.map(col) ++
        rightOrder.zip(ordCols).map { case (c, o) => col(c).as(o) } ++
        Seq(lit(1).as("__side"),
          struct(payloadTypes.map { case (p, _) => col(p).as(p) }: _*)
            .as("__r")): _*)
    // align right to the left's full column set (missing → null)
    val rAligned = rTagged.select(lTagged.columns.map(c =>
      if (rTagged.columns.contains(c)) col(c)
      else lit(null).cast(lTagged.schema(c).dataType).as(c)): _*)

    val w = Window.partitionBy(key.map(col): _*)
      .orderBy((ordCols.map(col) :+ col("__side")).map(_.asc): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carried = lTagged.unionByName(rAligned)
      .withColumn("__r_last", last(col("__r"), ignoreNulls = true).over(w))
    val projected = payloadTypes.foldLeft(carried) { case (df, (p, _)) =>
      df.withColumn(s"$prefix$p", col("__r_last").getField(p))
    }
    projected.filter(col("__side") === 0)
      .drop(("__side" +: ordCols) ++ Seq("__r", "__r_last"): _*)
  }
}
