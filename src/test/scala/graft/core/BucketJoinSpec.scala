package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * Bucketed co-located join — the 100 TB pattern for repeated joins on
 * a stable key: both tables bucketed (and sorted) by the join key at
 * write time, so the join needs NO exchange at read time. On a
 * 1000-executor cluster this turns every orders⋈lineitem from a
 * full-table shuffle into a partition-local merge.
 */
class BucketJoinSpec extends SparkSpec {

  test("join of co-bucketed tables plans with zero exchanges") {
    val dir = tmpDir("bucketed")
    val orders = spark.read
      .parquet("/root/testdata/sf0.001/orders.parquet")
    val lineitem = spark.read
      .parquet("/root/testdata/sf0.001/lineitem.parquet")

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$dir/b_orders").saveAsTable("b_orders")
    lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$dir/b_lineitem").saveAsTable("b_lineitem")

    // at test SF Catalyst would (rightly) broadcast the tiny orders
    // side; disable broadcast to surface the big-big regime the
    // bucketing exists for
    val prevThreshold =
      spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {

    val joined = spark.table("b_lineitem")
      .join(spark.table("b_orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(sum(floor(col("l_quantity")).cast("long")).as("qty"))

    val plan = joined.queryExecution.executedPlan.toString
    // the JOIN itself must consume the bucketing: no shuffle below it
    // (the final groupBy may still exchange on its own key)
    val joinIdx = plan.indexOf("SortMergeJoin")
    assert(joinIdx >= 0, plan.take(1500))
    val belowJoin = plan.substring(joinIdx)
    assert(!belowJoin.contains("Exchange hashpartitioning(l_orderkey")
      && !belowJoin.contains("Exchange hashpartitioning(o_orderkey"),
      belowJoin.take(1500))

    // and the result is right (vs the plain-parquet join)
    val expected = lineitem.join(orders,
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(sum(floor(col("l_quantity")).cast("long")).as("qty"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === expected)

    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
