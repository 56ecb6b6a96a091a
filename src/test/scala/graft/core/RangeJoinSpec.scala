package graft.core

import graft.SparkSpec

/** Bucketized range join: equals the naive theta join, without the
  * nested loop. */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val points = Seq(
    (1L, 5L), (2L, 10L), (3L, 15L), (4L, 100L), (5L, -3L))
    .toDF("pid", "p")
  private lazy val intervals = Seq(
    ("a", 0L, 10L),    // catches 5, 10
    ("b", 10L, 20L),   // catches 10, 15
    ("c", 50L, 60L),   // catches nothing
    ("d", -10L, -1L))  // catches -3 (negative domain)
    .toDF("iid", "s", "e")

  test("matches every containing interval exactly once") {
    val out = RangeJoin.rangeJoin(points, "p", intervals, "s", "e", 7L)
      .select("pid", "iid").as[(Long, String)].collect()
    assert(out.length === out.distinct.length) // one bucket per point
    assert(out.toSet === Set(
      (1L, "a"), (2L, "a"), (2L, "b"), (3L, "b"), (5L, "d")))
  }

  test("equals the naive theta join on the test corpus, for any width") {
    val e = graft.util.Tables.read(spark, "/root/testdata/sf0.001", "events")
    val pts = e.select($"event_id",
      org.apache.spark.sql.functions.unix_timestamp($"ts").as("ts_s"))
    val iv = e.filter($"user_id" % 50 === 0)
      .groupBy($"user_id".as("iv_user"))
      .agg(org.apache.spark.sql.functions
        .min(org.apache.spark.sql.functions.unix_timestamp($"ts"))
        .as("start_s"))
      .withColumn("end_s", $"start_s" + 21600L)
    val naive = RangeJoin.rangeJoinNaive(pts, "ts_s", iv, "start_s", "end_s")
      .select("event_id", "iv_user").as[(Long, Long)].collect().toSet
    assert(naive.nonEmpty)
    for (w <- Seq(600L, 3600L, 86400L)) {
      val bucketed = RangeJoin.rangeJoin(pts, "ts_s", iv,
        "start_s", "end_s", w)
        .select("event_id", "iv_user").as[(Long, Long)].collect().toSet
      assert(bucketed === naive, s"width $w")
    }
  }

  test("bucketed plan has no nested-loop join") {
    val plan = RangeJoin.rangeJoin(points, "p", intervals, "s", "e", 7L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(1500))
  }
}
