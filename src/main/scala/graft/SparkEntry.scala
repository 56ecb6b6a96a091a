package graft

import graft.core.{Diff, DiffOptions, Records}
import graft.mapper.Mapper
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Driver contract — one `queries` entry per implemented operator from
 * SURVEY.md §2, each with an equivalent DuckDB oracle in `oracleSql`.
 *
 * Oracle-parity conventions:
 *  - money/double aggregates go through exact integer arithmetic
 *    (`floor(x * 100)` cents) so Spark and DuckDB hash identically —
 *    no FP summation-order drift;
 *  - every computed column is aliased identically on both sides;
 *  - the synthetic source/local pair for diff queries derives
 *    deterministically from `orders` (modular arithmetic on the key)
 *    so both engines construct the same inputs.
 */
object SparkEntry {

  private def t(dir: String, name: String) = s"$dir/$name.parquet"
  private def tbl(s: SparkSession, dir: String, name: String): DataFrame =
    graft.util.Tables.read(s, dir, name)

  /**
   * Deterministic synthetic sync inputs derived from `orders`:
   * source = keys with k%10!=0, version = epoch(orderdate);
   * local  = keys with k%7!=0, version older by a day when k%3=0.
   * ⇒ added = {k%10!=0 ∧ k%7=0}, removed = {k%7!=0 ∧ k%10=0},
   *   updated = {both ∧ k%3=0} (strictly-newer version rule).
   */
  private def syncSource(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(t(dir, "orders"))
      .filter(col("o_orderkey") % 10 =!= 0)
      .select(col("o_orderkey").as("id"),
        unix_timestamp(col("o_orderdate")).as("version"),
        col("o_totalprice"), col("o_orderstatus"))

  private def syncLocal(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(t(dir, "orders"))
      .filter(col("o_orderkey") % 7 =!= 0)
      .select(col("o_orderkey").cast("string").as("id"),
        (unix_timestamp(col("o_orderdate")) +
          when(col("o_orderkey") % 3 === 0, -86400L).otherwise(0L))
          .as("version"))

  private val syncSourceSql =
    """SELECT CAST(o_orderkey AS VARCHAR) AS id,
      |       CAST(epoch(o_orderdate) AS BIGINT) AS version
      |FROM orders WHERE o_orderkey % 10 <> 0""".stripMargin
  private val syncLocalSql =
    """SELECT CAST(o_orderkey AS VARCHAR) AS id,
      |       CAST(epoch(o_orderdate) AS BIGINT)
      |         + CASE WHEN o_orderkey % 3 = 0 THEN -86400 ELSE 0 END AS version
      |FROM orders WHERE o_orderkey % 7 <> 0""".stripMargin

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_changeset")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── D1-D4: the core diff query ────────────────────────────────
    "q_changeset" -> ((s, dir) => {
      val source = Records.keyRecords(syncSource(s, dir), "id", Some("version"))
      Diff.computeDataChanges(source, syncLocal(s, dir)).unioned
    }),

    "q_changeset_force" -> ((s, dir) => {
      val source = Records.keyRecords(syncSource(s, dir), "id", Some("version"))
      Diff.computeDataChanges(source, syncLocal(s, dir),
        DiffOptions(forceUpdates = true)).unioned
    }),

    "q_idset_diff" -> ((s, dir) =>
      Diff.idDiff(syncLocal(s, dir), syncSource(s, dir)
        .select(col("id").cast("string")))),

    // ── K1: keyed last-wins dedup ─────────────────────────────────
    "q_dedup_lastwins" -> ((s, dir) => {
      val li = s.read.parquet(t(dir, "lineitem"))
      // order column must be a TOTAL order for determinism —
      // (l_linenumber, l_partkey, l_suppkey) is unique per order key
      Records.dedupLastWins(
        li.withColumn(Records.IdCol, col("l_orderkey").cast("string")),
        Some(struct(col("l_linenumber"), col("l_partkey"), col("l_suppkey"))))
        .select(col(Records.IdCol).as("id"),
          col("l_linenumber").as("last_line"),
          col("l_partkey").as("last_part"),
          col("l_quantity").as("qty"))
    }),

    // ── K2: version parse/normalize matrix ────────────────────────
    "q_version_parse" -> ((s, dir) => {
      import org.apache.spark.sql.types._
      val e = tbl(s, dir, "events")
      e.select(
        col("event_id").as("id"),
        Records.parseVersion(col("event_id") % 1000, LongType).as("v_int"),
        Records.parseVersion(col("ts"), TimestampType).as("v_ts"),
        Records.parseVersion(col("ts").cast("string"), StringType).as("v_datestr"),
        Records.parseVersion(col("event_id").cast("string"), StringType).as("v_numstr"),
        Records.parseVersion(lit(-5L), LongType).as("v_neg"))
    }),

    // ── M1/M2: declarative mapping + expressions ──────────────────
    "q_mapper" -> ((s, dir) => {
      val c = s.read.parquet(t(dir, "customer"))
      Mapper(Seq(
        "id" -> "c_custkey",
        "name" -> "${upper(record.c_name)}",
        "segment" -> "c_mktsegment",
        "balance_cents" -> "${CAST(floor(record.c_acctbal * 100) AS BIGINT)}",
        "missing" -> "no_such_column"
      )).apply(c)
    }),

    // ── T2: filter + projection pushdown ──────────────────────────
    "q_filter" -> ((s, dir) =>
      s.read.parquet(t(dir, "lineitem"))
        .filter(col("l_quantity") > 30 && col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))),

    // ── Aggregation (engine extension; TPC-H Q1 shape) ────────────
    "q1_agg" -> ((s, dir) =>
      s.read.parquet(t(dir, "lineitem"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(floor(col("l_quantity")).cast("long")).as("sum_qty"),
          sum(floor(col("l_extendedprice") * 100).cast("long")).as("sum_base_cents"),
          count(lit(1)).as("cnt"))),

    // ── Join (engine extension; TPC-H Q3 shape) ───────────────────
    "q3_join" -> ((s, dir) => {
      val c = s.read.parquet(t(dir, "customer"))
        .filter(col("c_mktsegment") === "BUILDING")
      val o = s.read.parquet(t(dir, "orders"))
      val l = s.read.parquet(t(dir, "lineitem"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("l_orderkey"))
        .agg(sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
          .cast("long")).as("revenue_cents"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q_changeset" ->
      s"""WITH source AS ($syncSourceSql), local AS ($syncLocalSql)
         |SELECT s.id AS id, 'add' AS change_type
         |  FROM source s LEFT JOIN local l USING (id) WHERE l.id IS NULL
         |UNION ALL
         |SELECT s.id, 'update' FROM source s JOIN local l USING (id)
         |  WHERE s.version > l.version
         |UNION ALL
         |SELECT l.id, 'remove' FROM local l LEFT JOIN source s USING (id)
         |  WHERE s.id IS NULL""".stripMargin,

    "q_changeset_force" ->
      s"""WITH source AS ($syncSourceSql), local AS ($syncLocalSql)
         |SELECT s.id AS id, 'add' AS change_type
         |  FROM source s LEFT JOIN local l USING (id) WHERE l.id IS NULL
         |UNION ALL
         |SELECT s.id, 'update' FROM source s JOIN local l USING (id)
         |UNION ALL
         |SELECT l.id, 'remove' FROM local l LEFT JOIN source s USING (id)
         |  WHERE s.id IS NULL""".stripMargin,

    "q_idset_diff" ->
      s"""WITH source AS ($syncSourceSql), local AS ($syncLocalSql)
         |SELECT l.id AS id FROM local l LEFT JOIN source s USING (id)
         |WHERE s.id IS NULL""".stripMargin,

    "q_dedup_lastwins" ->
      """SELECT CAST(l_orderkey AS VARCHAR) AS id,
        |       l_linenumber AS last_line, l_partkey AS last_part,
        |       l_quantity AS qty
        |FROM (SELECT *, row_number() OVER
        |        (PARTITION BY l_orderkey
        |         ORDER BY l_linenumber DESC, l_partkey DESC, l_suppkey DESC) AS rn
        |      FROM lineitem) WHERE rn = 1""".stripMargin,

    "q_version_parse" ->
      """SELECT event_id AS id,
        |       event_id % 1000 AS v_int,
        |       CAST(floor(epoch(ts)) AS BIGINT) AS v_ts,
        |       CAST(floor(epoch(CAST(CAST(ts AS VARCHAR) AS TIMESTAMP))) AS BIGINT) AS v_datestr,
        |       CAST(event_id AS BIGINT) AS v_numstr,
        |       CAST(NULL AS BIGINT) AS v_neg
        |FROM events""".stripMargin,

    "q_mapper" ->
      """SELECT c_custkey AS id, upper(c_name) AS name,
        |       c_mktsegment AS segment,
        |       CAST(floor(c_acctbal * 100) AS BIGINT) AS balance_cents,
        |       CAST(NULL AS VARCHAR) AS missing
        |FROM customer""".stripMargin,

    "q_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_quantity > 30 AND l_returnflag = 'R'""".stripMargin,

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |       sum(CAST(floor(l_quantity) AS BIGINT)) AS sum_qty,
        |       sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS sum_base_cents,
        |       count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q3_join" ->
      """SELECT l_orderkey,
        |       sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
        |         AS revenue_cents
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY l_orderkey""".stripMargin
  )
}
