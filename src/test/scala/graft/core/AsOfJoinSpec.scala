package graft.core

import graft.SparkSpec

/** As-of join: latest strictly-prior right row per key. */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val trades = Seq(
    ("A", 10L, 1L), ("A", 20L, 2L), ("A", 30L, 3L), ("B", 15L, 4L))
    .toDF("sym", "t", "trade_id")
  private lazy val quotes = Seq(
    ("A", 5L, 100.0), ("A", 20L, 101.0), ("A", 25L, 102.0),
    ("B", 99L, 500.0))
    .toDF("sym", "t", "px")

  test("picks the latest strictly-prior right row per key") {
    val out = AsOfJoin.asofJoin(trades, quotes, Seq("sym"),
      leftOrder = Seq("t"), rightOrder = Seq("t"),
      rightPayload = Seq("px"))
      .select("trade_id", "asof_px")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out(1L) === Some(100.0)) // t=10: only quote t=5 is prior
    // t=20: quote at the SAME t is NOT prior (strict) → t=5 wins
    assert(out(2L) === Some(100.0))
    assert(out(3L) === Some(102.0)) // t=30: t=25 quote
    assert(out(4L) === None)        // B: no quote before t=15
  }

  test("NULL payload values survive; all columns come from ONE right row") {
    // latest prior quote at t=20 has px=NULL and src='late' — the
    // carried row must be exactly that row: px NULL (not backfilled
    // from t=5) and src='late' (not mixed from another row)
    val q = Seq(
      ("A", 5L, Option(100.0), "early"),
      ("A", 20L, Option.empty[Double], "late"))
      .toDF("sym", "t", "px", "src")
    val out = AsOfJoin.asofJoin(
      Seq(("A", 30L)).toDF("sym", "t"), q, Seq("sym"),
      Seq("t"), Seq("t"), Seq("px", "src")).head()
    assert(out.isNullAt(out.fieldIndex("asof_px")))
    assert(out.getAs[String]("asof_src") === "late")
  }

  test("self-as-of never sees the row itself") {
    val e = Seq((1L, 10L, "click"), (1L, 20L, "view"), (1L, 30L, "click"))
      .toDF("u", "t", "kind")
    val clicks = e.filter($"kind" === "click")
    val out = AsOfJoin.asofJoin(e, clicks, Seq("u"),
      Seq("t"), Seq("t"), Seq("t"), prefix = "prev_")
      .select("t", "prev_t")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(out(10L) === -1L)  // first click: no prior click, not itself
    assert(out(20L) === 10L)
    assert(out(30L) === 10L)  // prior click, not itself
  }
}
