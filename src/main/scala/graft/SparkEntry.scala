package graft

import graft.core.{Diff, DiffOptions, Records}
import graft.ext.{Assemble, Dedup, Multimodal, Similarity, TextAnalysis}
import graft.mapper.Mapper
import graft.pipeline.{ImportService, Preset}
import graft.sources.InlineSource
import graft.targets.{FileTarget, JdbcTarget}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

  /** Temp dirs backing lazily-read result frames can only be freed at
    * JVM exit — one shutdown hook recursively deletes all of them
    * (plain deleteOnExit skips non-empty directories). */
  private val tempDirs =
    java.util.Collections.synchronizedList(new java.util.ArrayList[java.nio.file.Path])
  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      tempDirs.forEach { root =>
        try {
          import java.nio.file._
          Files.walk(root).sorted(java.util.Comparator.reverseOrder())
            .forEach(p => Files.deleteIfExists(p))
        } catch { case _: Exception => () }
      }))
  }
  private def tempStateDir(): String = {
    val p = java.nio.file.Files.createTempDirectory("graft_sync_")
    tempDirs.add(p)
    p.toString
  }
  private def tbl(s: SparkSession, dir: String, name: String): DataFrame =
    graft.util.Tables.read(s, dir, name)
  /** Drop an in-memory Derby database (frees its driver heap).
    * Derby signals a successful drop with SQLState 08006. */
  private def dropDerby(db: String): Unit =
    try java.sql.DriverManager.getConnection(s"jdbc:derby:memory:$db;drop=true")
    catch { case _: java.sql.SQLException => () }

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

  /** Expected post-sync merged state — shared by the FileTarget
    * (`q_sync_apply`, full volume) and JdbcTarget
    * (`q_sync_apply_jdbc`, the k%4=1 slice) e2e runs: the sink
    * changes, the semantics must not. */
  /** Shared oracle CTE chain: per-document exact-integer mean unigram
    * surprisal with language — `j(doc_id, lang, n_tokens, mu_unats)`.
    * Consumed by both ppl-bucket oracles (exact ntile and
    * approx-cutoff replay). */
  private val duckPplMetricCtes: String =
    """toks AS (
      |  SELECT doc_id, regexp_split_to_array(
      |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS t
      |  FROM documents),
      |flat AS (SELECT doc_id, unnest(t) AS tok FROM toks),
      |freq AS (SELECT tok, count(*) AS c FROM flat GROUP BY tok),
      |tot AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM freq),
      |s AS (SELECT doc_id,
      |        CAST(floor(-ln(CAST(c AS DOUBLE) / total) * 1000000)
      |          AS BIGINT) AS u
      |      FROM flat JOIN freq USING (tok) CROSS JOIN tot),
      |doc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
      |               CAST(sum(u) AS BIGINT) AS su
      |        FROM s GROUP BY doc_id),
      |j AS (SELECT d.doc_id, lang, n_tokens,
      |        CAST(su // n_tokens AS BIGINT) AS mu_unats
      |      FROM doc d JOIN documents USING (doc_id))""".stripMargin

  private def syncApplyOracleSql(extraPred: String = ""): String =
    s"""WITH source AS (
      |  SELECT CAST(o_orderkey AS VARCHAR) AS id,
      |         CAST(epoch(o_orderdate) AS BIGINT) AS version,
      |         CAST(floor(o_totalprice * 100) AS BIGINT) AS total_cents,
      |         o_orderstatus AS status
      |  FROM orders WHERE o_orderkey % 10 <> 0$extraPred),
      |local AS (
      |  SELECT CAST(o_orderkey AS VARCHAR) AS id,
      |         CAST(epoch(o_orderdate) AS BIGINT)
      |           + CASE WHEN o_orderkey % 3 = 0 THEN -86400 ELSE 0 END AS version,
      |         CAST(-1 AS BIGINT) AS total_cents, 'OLD' AS status
      |  FROM orders WHERE o_orderkey % 7 <> 0$extraPred)
      |SELECT s.id AS id,
      |  CASE WHEN l.id IS NULL OR s.version > l.version
      |       THEN s.version ELSE l.version END AS version,
      |  CASE WHEN l.id IS NULL OR s.version > l.version
      |       THEN s.total_cents ELSE l.total_cents END AS total_cents,
      |  CASE WHEN l.id IS NULL OR s.version > l.version
      |       THEN s.status ELSE l.status END AS status
      |FROM source s LEFT JOIN local l ON s.id = l.id""".stripMargin

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_changeset")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    parityQueries ++ analyticsQueries ++ extQueries

  /** SURVEY §2.1 reference-parity operators. */
  def parityQueries: Map[String, (SparkSession, String) => DataFrame] = Map(

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

    // ── T1: record map that REWRITES ids → re-dedup (last-wins) ───
    "q_map_rekey" -> ((s, dir) => {
      val keyed = Records.keyRecords(
        s.read.parquet(t(dir, "customer")), "c_custkey")
      val remapped = keyed.withColumn(Records.IdCol,
        (col("c_custkey") % 50).cast("string"))
      Records.dedupLastWins(remapped, Some(col("c_custkey")))
        .select(col(Records.IdCol).as("id"),
          col("c_custkey").as("src_key"), col("c_name").as("name"))
    }),

    // ── T3/T4: dataProcessor hook (arbitrary DataFrame=>DataFrame) ─
    "q_processor" -> ((s, dir) => {
      val processor: DataFrame => DataFrame = df =>
        df.filter(col("o_totalprice") > 150000)
          .withColumn("priority_class",
            substring(col("o_orderpriority"), 1, 1))
      processor(Records.keyRecords(
        s.read.parquet(t(dir, "orders")), "o_orderkey"))
        .select(col(Records.IdCol).as("id"),
          col("o_totalprice").as("total"), col("priority_class"))
    }),

    // ── D3: node-table diff (idPrefix strip + hidden soft-delete) ─
    "q_changeset_node" -> ((s, dir) => {
      val source = Records.keyRecords(syncSource(s, dir), "id", Some("version"))
      val local = s.read.parquet(t(dir, "orders"))
        .filter(col("o_orderkey") % 7 =!= 0)
        .select(
          concat(lit("node-"), col("o_orderkey").cast("string")).as("id"),
          (unix_timestamp(col("o_orderdate")) +
            when(col("o_orderkey") % 3 === 0, -86400L).otherwise(0L))
            .as("version"),
          (col("o_orderkey") % 13 === 0).as("hidden"))
      Diff.computeDataChanges(source, local,
        DiffOptions(localIdPrefix = Some("node-"), hiddenCol = Some("hidden")))
        .unioned
    }),

    // ── C2+W1–W3 end to end: full importData through a FileTarget ──
    // Seeds local state (k%7≠0) with stale payload markers, then runs
    // the whole pipeline — InlineSource → keying → one-join diff →
    // add/update/remove apply — and returns the final target state.
    // The stale markers make each write path distinct in the output:
    // added rows (k%7=0) carry real payload, updated rows (k%3=0,
    // strictly-newer version) get re-mapped payload, untouched
    // survivors keep the marker, removed ids (k%10=0) are gone.
    // State is a BUCKETED table on id (murmur bucketBy + catalog
    // registration): the diff's full-outer join consumes the
    // bucketing, so only the incoming source side exchanges — at
    // 100 TB the state is the big side, and this halves the sync's
    // shuffle volume (plan pinned by PipelineSpec's bucketed-state
    // test; oracle unchanged).
    "q_sync_apply" -> ((s, dir) => {
      val path = tempStateDir() + "/state"
      // bucket count == session shuffle partitions: the source side's
      // dedup exchange already partitions on __id at that count, so
      // the diff join reuses it — ONE exchange in the whole diff
      val target = FileTarget(path,
        buckets = s.conf.get("spark.sql.shuffle.partitions").toInt)
      target.writeState(s,
        graft.util.Tables.spread(s.read.parquet(t(dir, "orders")))
          .filter(col("o_orderkey") % 7 =!= 0)
          .select(col("o_orderkey").cast("string").as("id"),
            (unix_timestamp(col("o_orderdate")) +
              when(col("o_orderkey") % 3 === 0, -86400L).otherwise(0L))
              .as("version"),
            lit(-1L).as("total_cents"), lit("OLD").as("status")))
      val preset = Preset(
        source = InlineSource(sp => syncSource(sp, dir)),
        target = target,
        mapper = Mapper(Seq(
          "total_cents" -> "${floor(record.o_totalprice * 100)}",
          "status" -> "o_orderstatus")),
        idAttribute = "id",
        versionAttribute = Some("version"))
      new ImportService(preset).importData(s)
      // read back through the catalog entry — schema-safe even for a
      // zero-row state (no parquet footer to infer from)
      target.currentState(s).select(col("id"),
        col("version").cast("long"),
        col("total_cents").cast("long"), col("status"))
    }),

    // ── Streaming tier end to end (SURVEY §7.5): the events table
    // replayed as 4 ts-ordered micro-batches through
    // IncrementalSync.start — a file-source stream whose every
    // micro-batch runs the full keying → diff → apply cycle against
    // a partitioned FileTarget (skipRemovedRecords: a micro-batch is
    // a delta, not a snapshot). The version rule (strict > update;
    // in-batch last-wins BY VERSION) makes the final merged state
    // independent of where the batch boundaries fall, so the oracle
    // recomputes it from the FULL table in one pass: per user, the
    // max-version event wins. version = event_id (unique ⇒ the
    // winner is total-ordered and engine-replayable). ──
    "q_sync_incremental" -> ((s, dir) => {
      val work = tempStateDir()
      val preset = Preset(
        source = InlineSource(_ =>
          sys.error("unused — the stream feeds the batches")),
        target = FileTarget(s"$work/state", partitions = 8),
        mapper = Mapper(Seq(
          "event_type" -> "event_type",
          "value_cents" -> "value_cents")),
        idAttribute = "user_id",
        versionAttribute = Some("version"),
        skipRemovedRecords = true)
      val ev = tbl(s, dir, "events").select(
        col("user_id"), col("event_id").as("version"), col("event_type"),
        floor(col("value") * 100).cast("long").as("value_cents"),
        col("ts"))
      val state = graft.streaming.IncrementalSync
        .replaySync(s, ev, "ts", preset, work, nBatches = 4)
      // an all-empty replay never materializes the partitioned state
      // (zero-row partitionBy writes no files), so the snapshot comes
      // back with the minimal (id, version) schema — project the
      // declared output schema stably either way
      def c(name: String, tpe: String): Column =
        (if (state.columns.contains(name)) col(name)
         else lit(null).cast(tpe)).as(name)
      state.select(c("id", "string"), c("version", "long"),
        c("event_type", "string"), c("value_cents", "long"))
    }),

    // ── The same streaming replay against the REAL JDBC sink:
    // every micro-batch's add/update phases run as INSERT/UPDATE
    // statements on a Derby table, and the final merged state is the
    // same batch-boundary-insensitive answer (max-version event per
    // user). The u%4=1 slice bounds the row-at-a-time JDBC protocol
    // cost at bench scale — the q_sync_apply_jdbc convention; the
    // full-volume streaming path stays covered by q_sync_incremental.
    // Together the streaming tier is now certified on BOTH target
    // families (file state and JDBC). ──
    "q_sync_incremental_jdbc" -> ((s, dir) => {
      val db = "syncs_" + java.util.UUID.randomUUID.toString.replace("-", "")
      val url = s"jdbc:derby:memory:$db;create=true"
      val conn = java.sql.DriverManager.getConnection(url)
      try conn.createStatement().execute(
        "CREATE TABLE sync_state (id VARCHAR(32) PRIMARY KEY, " +
          "version BIGINT, event_type VARCHAR(32), value_cents BIGINT)")
      finally conn.close()
      val work = tempStateDir()
      val preset = Preset(
        source = InlineSource(_ =>
          sys.error("unused — the stream feeds the batches")),
        target = JdbcTarget(url, "sync_state"),
        mapper = Mapper(Seq(
          "id" -> "${cast(record.user_id as string)}",
          "version" -> "version",
          "event_type" -> "event_type",
          "value_cents" -> "value_cents")),
        idAttribute = "user_id",
        versionAttribute = Some("version"),
        skipRemovedRecords = true)
      val ev = tbl(s, dir, "events")
        .filter(pmod(col("user_id"), lit(4)) === 1)
        .select(
          col("user_id"), col("event_id").as("version"), col("event_type"),
          floor(col("value") * 100).cast("long").as("value_cents"),
          col("ts"))
      try {
        val state = graft.streaming.IncrementalSync
          .replaySync(s, ev, "ts", preset, work, nBatches = 4)
        def anyCase(name: String): Column =
          col(state.columns.find(_.equalsIgnoreCase(name)).getOrElse(name))
        state.select(col("id"), col("version"),
            anyCase("event_type").as("event_type"),
            anyCase("value_cents").cast("long").as("value_cents"))
          .localCheckpoint() // materialize, then the in-memory db can drop
      } finally dropDerby(db) // drop even on failure — no heap leak
    }),

    // ── Watermarked tumbling-window aggregation, oracle-certified:
    // events replayed as 4 ts-range-ordered micro-batches through
    // windowedCounts (1-hour event-time windows, 0 s watermark
    // delay) into an Append-mode memory sink. Append emits a window
    // exactly when the watermark passes its end, so the emitted set
    // is every window whose end ≤ max(ts) — one GROUP BY + threshold
    // filter for a batch engine. The certification property: windows
    // whose rows STRADDLE micro-batch boundaries accumulate state
    // across batches and still emit the exact batch-engine counts. ──
    "q_stream_window" -> ((s, dir) => {
      val ev = tbl(s, dir, "events")
      val sync = graft.streaming.IncrementalSync
      sync.replayTransform(
        s, ev, sync.tsRangeBatch(ev, "ts", 4), tempStateDir(),
        nBatches = 4)(st =>
        sync.windowedCounts(st, watermark = "0 seconds",
          window_ = "1 hour"))
        .select(unix_timestamp(col("window.start")).as("win_start"),
          col("event_type"), col("n"), col("value_cents"))
    }),

    // ── Watermark LATE-DATA DROP, oracle-certified: every 97th event
    // is held back as a straggler and replayed LAST, after 3
    // ts-range-ordered batches of the rest. Spark's watermark is
    // two-phase (IncrementalExecution): late INPUT rows in batch N
    // are filtered against batch N−1's watermark
    // (eventTimeWatermarkForLateEvents — one batch of grace), while
    // state eviction/emission uses batch N's. The straggler batch
    // therefore drops stragglers whose window closed under
    // W_late = max(on-time ts in batches 0..1) − 30 min and keeps
    // the rest — a deterministic function of the data (verified
    // against the observed per-batch watermark progression), so
    // DuckDB replays the exact kept-row set. On-time rows are never
    // late by construction: ts-range batches are disjoint and
    // increasing, so every row arrives ahead of the operative
    // watermark. ──
    "q_stream_late" -> ((s, dir) => {
      val ev = tbl(s, dir, "events")
      val sync = graft.streaming.IncrementalSync
      val straggler = pmod(col("event_id"), lit(97)) === 0
      val batchCol = when(straggler, lit(3))
        .otherwise(sync.tsRangeBatch(ev, "ts", 3))
      sync.replayTransform(s, ev, batchCol, tempStateDir(),
        nBatches = 4)(st =>
        sync.windowedCounts(st, watermark = "30 minutes",
          window_ = "1 hour"))
        .select(unix_timestamp(col("window.start")).as("win_start"),
          col("event_type"), col("n"), col("value_cents"))
    }),

    // ── Stream-STREAM interval join, oracle-certified: even
    // event_ids are the left stream ("impressions"), odd the right
    // ("clicks"); a click joins impressions of the same user at most
    // 30 min before it. Both sides replay the SAME 4 ts-range
    // batches in lockstep, which is what makes the append output
    // provably COMPLETE: a left row is evicted only when the right
    // watermark passes l.ts + 30 min, and every future right row has
    // a later ts than that watermark (ts-range batches are disjoint
    // and increasing), so no match can arrive after eviction. The
    // streaming result therefore equals the batch interval join,
    // which DuckDB computes directly. ──
    "q_stream_join" -> ((s, dir) => {
      val ev = tbl(s, dir, "events")
      val sync = graft.streaming.IncrementalSync
      val batchCol = sync.tsRangeBatch(ev, "ts", 4)
      sync.replayTransform2(s,
        ev.filter(pmod(col("event_id"), lit(2)) === 0),
        ev.filter(pmod(col("event_id"), lit(2)) === 1),
        batchCol, tempStateDir(), nBatches = 4)((l, r) =>
        sync.streamIntervalJoin(l, r, key = "user_id",
          watermark = "0 seconds", horizon = "30 minutes"))
        .select(col("user_id"),
          col("l_event_id"), col("r_event_id"))
    }),

    // ── Streaming SESSION windows, oracle-certified: per-user
    // sessions closing after 30 min of inactivity, replayed as 4
    // ts-ordered batches — sessions that straddle batch boundaries
    // MERGE in the session-window state and still emit the exact
    // batch-engine aggregate. Append emits a session when the
    // watermark (delay 0 ⇒ max ts) passes its end = last ts + gap;
    // the oracle replays Spark's inclusive merge rule (new session
    // at inter-event gap > 30 min, the same convention as the batch
    // q_sessionize row) and the emission threshold with
    // gaps-and-islands SQL. ──
    "q_stream_session" -> ((s, dir) => {
      val ev = tbl(s, dir, "events")
      val sync = graft.streaming.IncrementalSync
      sync.replayTransform(
        s, ev, sync.tsRangeBatch(ev, "ts", 4), tempStateDir(),
        nBatches = 4)(st =>
        sync.sessionCounts(st, gap = "30 minutes",
          watermark = "0 seconds"))
        .select(col("user_id"),
          unix_timestamp(col("session_window.start")).as("sess_start"),
          col("n"), col("value_cents"))
    }),

    // ── Streaming DEDUP within watermark, oracle-certified: the
    // streaming tier of exact dedup (state bounded by arrival-rate ×
    // horizon — plain dropDuplicates grows state forever). The
    // general operator is spec-pinned only (within a micro-batch the
    // surviving duplicate is iteration-order nondeterministic); THIS
    // row makes the survivor deterministic by construction — the
    // input is pre-deduplicated per (key, batch) to the min-(ts,
    // event_id) row, so each micro-batch carries at most ONE row per
    // key and the emitted set is an exact function of the data. The
    // oracle replays the probed state machine (fixed expiry at
    // first-kept ts + delay; eviction during batch N under the
    // watermark from batches <= N-2 — the eviction watermark lags
    // one batch behind the late-row watermark, fitted empirically;
    // re-arrival after eviction emits again) with a recursive
    // per-key fold over the ≤4 arrivals. Delay 72 h vs
    // ~7.5-day batches exercises BOTH paths: keys kept early in the
    // previous batch evict (~20%), later ones survive. ──
    "q_stream_dedup" -> ((s, dir) => {
      val ev = tbl(s, dir, "events")
      val sync = graft.streaming.IncrementalSync
      val staged = ev
        .withColumn("fp",
          concat_ws(":", col("user_id"), col("event_type")))
        .withColumn("__batch", sync.tsRangeBatch(ev, "ts", 4))
      val w = Window.partitionBy(col("fp"), col("__batch"))
        .orderBy(col("ts"), col("event_id"))
      val uniq = staged.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
      sync.replayTransform(s, uniq, col("__batch"), tempStateDir(),
        nBatches = 4)(st =>
        st.withWatermark("ts", "72 hours")
          .dropDuplicatesWithinWatermark("fp"))
        .select(col("fp"), col("event_id"),
          unix_micros(col("ts")).as("ts_us"))
    }),

    // ── SCD TYPE-2 HISTORY sync, oracle-certified: the replay
    // harness drives 4 ts-ordered micro-batch syncs into Scd2Target —
    // every sync whose diff supersedes a record closes its current
    // history row (sync_out = ordinal) and opens a new one, so the
    // final table is the full change history with validity ranges.
    // The version is a Lehmer-permuted event_id ((id·48271) mod
    // 2³¹−1 — exact integer arithmetic both engines replay), NON-
    // monotone in time, so the strict-`>` update rule genuinely
    // branches: ~half the batch winners supersede the current row
    // (close+open), the rest are version-skips (history untouched) —
    // both SCD2 paths certified. The oracle folds the per-(id, batch)
    // winners through the same open/close state machine recursively
    // and derives validity ranges with lead(). The oracle equates the
    // ledger ordinal with the ts-range batch index bt, which holds
    // because every replay batch is non-empty (equal ts-range splits
    // of the events table) and each micro-batch applies exactly once;
    // the target itself now records its marker only after the staged
    // write, so a failed-and-retried stage cannot desync the two. ──
    "q_sync_scd2" -> ((s, dir) => {
      val work = tempStateDir()
      val preset = Preset(
        source = InlineSource(_ =>
          sys.error("unused — the stream feeds the batches")),
        target = graft.targets.Scd2Target(s"$work/hist"),
        mapper = Mapper(Seq(
          "event_type" -> "event_type",
          "value_cents" -> "value_cents")),
        idAttribute = "user_id",
        versionAttribute = Some("version"),
        skipRemovedRecords = true)
      val ev = tbl(s, dir, "events").select(
        col("user_id"),
        pmod(col("event_id") * 48271L, lit(2147483647L)).as("version"),
        col("event_type"),
        floor(col("value") * 100).cast("long").as("value_cents"),
        col("ts"))
      graft.streaming.IncrementalSync
        .replaySync(s, ev, "ts", preset, work, nBatches = 4)
      val h = graft.targets.Scd2Target(s"$work/hist").history(s)
      def c(name: String, tpe: String): Column =
        (if (h.columns.contains(name)) col(name)
         else lit(null).cast(tpe)).as(name)
      h.select(c("id", "string"), c("version", "long"),
        c("event_type", "string"), c("value_cents", "long"),
        c("sync_in", "long"), c("sync_out", "long"))
    }),

    // ── W1–W3 end to end on the REAL JDBC sink: same importData
    // pipeline as q_sync_apply, but local state lives in a Derby
    // table and the add/update/remove phases run as INSERT / UPDATE
    // ... WHERE id / DELETE WHERE id through JdbcTarget — certifying
    // the reference's DbalTarget semantics
    // (Classes/DataTarget/Dbal/DbalTarget.php:134-155) against the
    // same merged-state oracle. Runs on the deterministic quarter
    // slice k%4=1 — every change class (add k%7=0, update k%3=0,
    // remove k%10=0, survivor) stays populated by CRT, the
    // row-at-a-time JDBC protocol cost stays bounded at bench scale,
    // and the full-volume e2e remains covered by q_sync_apply. ──────
    "q_sync_apply_jdbc" -> ((s, dir) => {
      val db = "sync_" + java.util.UUID.randomUUID.toString.replace("-", "")
      val url = s"jdbc:derby:memory:$db;create=true"
      val conn = java.sql.DriverManager.getConnection(url)
      try conn.createStatement().execute(
        // unquoted DDL ⇒ canonical UPPERCASE names: both Spark's
        // quoted-identifier JDBC writer (seed, uppercase df columns)
        // and JdbcTarget's unquoted statements resolve to them
        "CREATE TABLE sync_state (id VARCHAR(32) PRIMARY KEY, " +
          "version BIGINT, total_cents BIGINT, status VARCHAR(8))")
      finally conn.close()
      graft.util.Tables.spread(s.read.parquet(t(dir, "orders")))
        .filter(col("o_orderkey") % 4 === 1 && col("o_orderkey") % 7 =!= 0)
        .select(col("o_orderkey").cast("string").as("ID"),
          (unix_timestamp(col("o_orderdate")) +
            when(col("o_orderkey") % 3 === 0, -86400L).otherwise(0L))
            .as("VERSION"),
          lit(-1L).as("TOTAL_CENTS"), lit("OLD").as("STATUS"))
        .coalesce(8)
        .write.mode("append")
        .format("jdbc").option("url", url)
        .option("dbtable", "sync_state").save()
      val preset = Preset(
        source = InlineSource(sp =>
          syncSource(sp, dir).filter(col("id") % 4 === 1)),
        target = JdbcTarget(url, "sync_state"),
        mapper = Mapper(Seq(
          "id" -> "id", "version" -> "version",
          "total_cents" -> "${floor(record.o_totalprice * 100)}",
          "status" -> "o_orderstatus")),
        idAttribute = "id", versionAttribute = Some("version"))
      try {
        new ImportService(preset).importData(s)
        s.read.format("jdbc").option("url", url)
          .option("dbtable", "sync_state").load()
          .select(col("ID").as("id"),
            col("VERSION").cast("long").as("version"),
            col("TOTAL_CENTS").cast("long").as("total_cents"),
            col("STATUS").as("status"))
          .localCheckpoint() // materialize, then the in-memory db can drop
      } finally dropDerby(db) // drop even on failure — no heap leak
    }),

    // ── W5: variant fan-out (1 record → N node variants) ──────────
    "q_variants_fanout" -> ((s, dir) => {
      val keyed = Records.keyRecords(
        s.read.parquet(t(dir, "customer")), "c_custkey")
      keyed.withColumn("dim",
          explode(array(lit("de"), lit("en"), lit("fr"))))
        .select(
          concat(col(Records.IdCol), lit("-"), col("dim")).as("variant_id"),
          col(Records.IdCol).as("id"), col("dim"),
          upper(col("c_name")).as("name"))
    }),

    // ── S4: narrow id/version scan (projection pushdown) ──────────
    "q_narrow_scan" -> ((s, dir) =>
      s.read.parquet(t(dir, "orders"))
        .select(col("o_orderkey").cast("string").as("id"),
          unix_timestamp(col("o_orderdate")).as("version"))),

    // ── set ops: semi-join (EXISTS) ───────────────────────────────
    "q_semijoin" -> ((s, dir) => {
      val c = s.read.parquet(t(dir, "customer"))
      val o = s.read.parquet(t(dir, "orders"))
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
    }),

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

  /** Analytics surface (beyond reference parity — the engine is a
    * full Spark SQL engine; these pin the behaviors to oracles). */
  def analyticsQueries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // JSON extraction (source S1/S2 decode JSON; here: nested field)
    "q_json" -> ((s, dir) =>
      tbl(s, dir, "events")
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))),

    // date/time bucketing (K2 version-parse machinery generalized)
    "q_datetime" -> ((s, dir) =>
      tbl(s, dir, "events")
        .groupBy(unix_timestamp(date_trunc("day", col("ts"))).as("day_epoch"))
        .agg(count(lit(1)).as("cnt"),
          sum(floor(col("value") * 100).cast("long")).as("value_cents"))),

    // window functions: rank + running sum per user
    "q_window" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      tbl(s, dir, "events").select(
        col("event_id"), col("user_id"),
        row_number().over(w).as("rn"),
        sum(floor(col("value") * 100).cast("long"))
          .over(w.rowsBetween(Window.unboundedPreceding, 0))
          .as("running_cents"))
    }),

    // relational set ops (set semantics — both engines dedup) over
    // (user, day) keys: purchase∩view days and view∖purchase days,
    // tagged. User-level keys would leave EXCEPT vacuously empty at
    // this density (every user purchases); user-days exercise both
    // branches with real rows.
    "q_setops" -> ((s, dir) => {
      val ev = tbl(s, dir, "events")
      def userDays(t: String) =
        ev.filter(col("event_type") === t)
          .select(col("user_id"),
            floor(unix_timestamp(col("ts")) / 86400L).cast("long")
              .as("day_no"))
      userDays("purchase").intersect(userDays("view"))
        .select(lit("both").as("op"), col("user_id"), col("day_no"))
        .unionByName(
          userDays("view").except(userDays("purchase"))
            .select(lit("view_only").as("op"), col("user_id"),
              col("day_no")))
    }),

    // RANGE-framed window over event time: trailing 7-day sum/count
    // per user. A RANGE frame is defined by the ORDER value, so peer
    // rows (equal ts) share one frame and the result is
    // tie-order-insensitive — the deterministic way to express
    // "trailing window" when the sort key has duplicates (a ROWS
    // frame would be order-dependent there).
    "q_window_range" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(unix_micros(col("ts")))
        .rangeBetween(-7L * 86400L * 1000000L, 0L)
      tbl(s, dir, "events").select(
        col("event_id"), col("user_id"),
        sum(floor(col("value") * 100).cast("long")).over(w)
          .as("trail7d_cents"),
        count(lit(1)).over(w).as("n_7d"))
    }),

    // pivot (long → wide): per-user value_cents by event type. The
    // value list is EXPLICIT — deterministic column set, no
    // distinct-values pre-scan job on the driver
    "q_pivot" -> ((s, dir) =>
      tbl(s, dir, "events")
        .groupBy(col("user_id"))
        .pivot("event_type",
          Seq("click", "error", "purchase", "signup", "view"))
        .agg(sum(floor(col("value") * 100).cast("long")))),

    // unpivot (wide → long): lineitem measures melted to
    // (measure, cents) rows — all cast to exact integer cents BEFORE
    // the melt so the unified value column has one type
    "q_unpivot" -> ((s, dir) =>
      s.read.parquet(t(dir, "lineitem"))
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"), col("l_suppkey"),
          floor(col("l_quantity") * 100).cast("long").as("quantity"),
          floor(col("l_extendedprice") * 100).cast("long").as("extendedprice"),
          floor(col("l_discount") * 100).cast("long").as("discount"),
          floor(col("l_tax") * 100).cast("long").as("tax"))
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber"),
            col("l_partkey"), col("l_suppkey")),
          Array(col("quantity"), col("extendedprice"),
            col("discount"), col("tax")),
          "measure", "cents")),

    // gap-based sessionization (30-minute inactivity boundary)
    "q_sessionize" -> ((s, dir) => {
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      tbl(s, dir, "events")
        .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
        .withColumn("new_session",
          when(col("prev_us").isNull ||
            unix_micros(col("ts")) - col("prev_us") > 1800000000L, 1L)
            .otherwise(0L))
        .withColumn("session_seq",
          sum(col("new_session"))
            .over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
        .select(col("event_id"), col("user_id"), col("session_seq"))
    }),

    // grouping sets: rollup region → nation
    "q_rollup" -> ((s, dir) => {
      val c = s.read.parquet(t(dir, "customer"))
      val n = s.read.parquet(t(dir, "nation"))
      val r = s.read.parquet(t(dir, "region"))
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("cnt"),
          sum(floor(col("c_acctbal") * 100).cast("long")).as("bal_cents"))
    }),

    // top-k with deterministic total order
    "q_topk" -> ((s, dir) =>
      tbl(s, dir, "events")
        .select(col("event_id"),
          floor(col("value") * 100).cast("long").as("value_cents"))
        .orderBy(col("value_cents").desc, col("event_id"))
        .limit(100)),

    // grouped top-k through the custom bounded-buffer Aggregator
    // (map-side combine, no per-group full sort) — oracle-checked
    // against the window formulation in DuckDB
    "q_topk_grouped" -> ((s, dir) =>
      graft.ext.Similarity.topKAgg(
        tbl(s, dir, "events")
          .select(col("event_type").as("q_id"),
            floor(col("value") * 100).cast("double").as("sim"),
            col("event_id").as("n_id")), k = 5)
        .select(col("q_id").as("event_type"),
          col("n_id").as("event_id"),
          col("sim").cast("long").as("value_cents"),
          col("rank").cast("long").as("rank"))),

    // distinct
    "q_distinct" -> ((s, dir) =>
      tbl(s, dir, "events").select(col("event_type")).distinct()),

    // grouping sets: full cube
    "q_cube" -> ((s, dir) =>
      tbl(s, dir, "events")
        .cube(col("event_type"),
          date_format(col("ts"), "yyyy-MM").as("month"))
        .agg(count(lit(1)).as("cnt"))),

    // multi-join aggregation (TPC-H Q5 shape): revenue by nation
    "q5_join" -> ((s, dir) => {
      val r = s.read.parquet(t(dir, "region")).filter(col("r_name") === "ASIA")
      val n = s.read.parquet(t(dir, "nation"))
      val c = s.read.parquet(t(dir, "customer"))
      val o = s.read.parquet(t(dir, "orders"))
      val l = s.read.parquet(t(dir, "lineitem"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount"))
          * 100).cast("long")).as("revenue_cents"))
    }),

    // anti-join (NOT EXISTS): customers with no orders
    "q_antijoin" -> ((s, dir) => {
      val c = s.read.parquet(t(dir, "customer"))
      val o = s.read.parquet(t(dir, "orders"))
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
    }),

    // as-of join: each event's most recent strictly-prior click
    // bucketized range join: events against per-user first-6h
    // windows — one equi-join on the time bucket instead of a
    // nested-loop theta join (oracle: DuckDB range predicate)
    "q_range_join" -> ((s, dir) => {
      val e = tbl(s, dir, "events")
      val pts = e.select(col("event_id"),
        unix_timestamp(col("ts")).as("ts_s"))
      val iv = e.filter(col("user_id") % 50 === 0)
        .groupBy(col("user_id").as("iv_user"))
        .agg(min(unix_timestamp(col("ts"))).as("start_s"))
        .withColumn("end_s", col("start_s") + 21600L)
      graft.core.RangeJoin.rangeJoin(pts, "ts_s", iv,
          "start_s", "end_s", bucketWidth = 3600L)
        .select(col("event_id"), col("iv_user"), col("ts_s"))
    }),

    "q_asof" -> ((s, dir) => {
      val e = tbl(s, dir, "events")
        .withColumn("ts_us", unix_micros(col("ts")))
      val clicks = e.filter(col("event_type") === "click")
      graft.core.AsOfJoin.asofJoin(
        e, clicks, key = Seq("user_id"),
        leftOrder = Seq("ts_us", "event_id"),
        rightOrder = Seq("ts_us", "event_id"),
        rightPayload = Seq("event_id"))
        .select(col("event_id"), col("user_id"),
          col("asof_event_id").as("prev_click_id"))
    }),

    // Exact interpolated percentiles per group. SCALE CONSTRAINT:
    // exact percentile buffers each group's values on its reducer —
    // with few groups that is few hot tasks holding group-size state.
    // At 100 TB swap in approx_percentile (t-digest, mergeable
    // map-side partials, documented error bound); it is not used HERE
    // because the oracle gate needs bit-exact cross-engine results.
    // Compared columns are floor-micro integers: floor(x·1e6) has no
    // round-half convention to disagree about (only the accepted
    // 1-ulp-at-a-boundary risk every micro-unit column carries) —
    // both engines interpolate a + (b−a)·f over the same doubles.
    "q_percentile" -> ((s, dir) =>
      tbl(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(
          floor(percentile(col("value"), lit(0.5)) * 1000000L)
            .cast("long").as("p50_micro"),
          floor(percentile(col("value"), lit(0.95)) * 1000000L)
            .cast("long").as("p95_micro"))),

    // The 100 TB scale path for q_percentile, oracle-certified: Spark's
    // `percentile_approx` (Greenwald-Khanna sketch, mergeable map-side
    // partials — no reducer ever buffers a group). The sketch is
    // DETERMINISTIC below its compression threshold: with error budget
    // 2·n/accuracy < 1 no sample is ever merged away, and query(p)
    // provably returns the element at rank ceil(p·n) — which the
    // DuckDB oracle replays as an exact rank selection (gate groups
    // are ~2000 events at accuracy 10000, budget 0.4). Past the
    // threshold the answer degrades gracefully to ±n/accuracy ranks —
    // the documented approx contract; the gate certifies the sketch
    // path's plumbing and its small-group exactness.
    "q_percentile_approx" -> ((s, dir) =>
      tbl(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(
          floor(percentile_approx(col("value"), lit(0.5), lit(10000))
            * 1000000L).cast("long").as("p50_micro"),
          floor(percentile_approx(col("value"), lit(0.95), lit(10000))
            * 1000000L).cast("long").as("p95_micro"))),

    // salted join for skewed keys — result equals the plain join
    "q_salted_join" -> ((s, dir) => {
      val e = tbl(s, dir, "events")
      val users = e.groupBy(col("user_id"))
        .agg(count(lit(1)).as("user_events"))
      graft.core.Skew.saltedJoin(e, users, "user_id", saltFactor = 8)
        .groupBy(col("user_id"), col("user_events"))
        .agg(count(lit(1)).as("n"))
    }),

    // ── Bloom-prefiltered SELECTIVE join — the runtime-filter shape
    // (what Spark's InjectRuntimeFilter does for DPP-ineligible
    // joins), built explicitly so the prefilter is plan-visible: the
    // ~2%-selective order-key set builds a Bloom sketch (one agg job
    // over the small side); the probe rides the lineitem scan as the
    // codegen'd native BloomFilterMightContain — a NARROW map-side
    // filter that drops ~98% of the fact side BEFORE the join
    // shuffle. The exact semi-join after it absorbs the bloom's
    // false positives, so the output is identical to the plain join
    // — which is exactly what the oracle computes (same
    // composed-path certification as q_contamination_bloom, on the
    // relational tier). At 100 TB the sketch is KB-sized driver
    // metadata; the 98% never leaves the scan stage. ──
    "q_bloom_join" -> ((s, dir) => {
      val sel = tbl(s, dir, "orders")
        .filter(col("o_totalprice") > 490000.0)
        .select(col("o_orderkey"))
      val l = tbl(s, dir, "lineitem")
      val nSel = sel.count()
      val pre =
        if (nSel == 0L) l.filter(lit(false))
        else {
          val bloom = sel.stat.bloomFilter("o_orderkey", nSel, 0.01)
          val bytes = new java.io.ByteArrayOutputStream()
          bloom.writeTo(bytes)
          l.filter(graft.functions.GraftFunctions.bloom_might_contain(
            lit(bytes.toByteArray), col("l_orderkey")))
        }
      pre.join(sel, pre("l_orderkey") === sel("o_orderkey"), "left_semi")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(floor(col("l_extendedprice") * 100).cast("long"))
            .as("revenue_cents"))
    }),

    // ── HLL++ approx-distinct CONTRACT row (the q_percentile_approx
    // certification pattern): per event type, the exact user
    // cardinality plus a boolean asserting the sketch estimate
    // landed within 3·rsd (= 6%) of it. The oracle recomputes the
    // exact count and expects ok = TRUE — the row goes red if the
    // mergeable HLL sketch (the only distinct-count shape that
    // survives 100 TB without shuffling raw ids to one reducer per
    // group) drifts out of its own error bound. ──
    "q_approx_distinct" -> ((s, dir) =>
      tbl(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_exact"),
          approx_count_distinct(col("user_id"), 0.02).as("__approx"))
        .select(col("event_type"), col("n_exact"),
          (abs(col("__approx") - col("n_exact")) <=
            ceil(col("n_exact").cast("double") * 0.06).cast("long"))
            .as("approx_ok"))),

    // ── FUNNEL analysis: per user, the earliest view → first click
    // AFTER that view → first purchase AFTER that click (strict
    // event-order funnel, the product-analytics staple). Three
    // chained window aggregates over ONE hash exchange on user_id —
    // each stage's threshold is a per-user constant from the
    // previous select, so the plan is exchange + 3 WindowExecs, no
    // self-joins. Timestamps exact epoch micros; depth is the count
    // of reached stages. ──
    "q_funnel" -> ((s, dir) => {
      val u = Window.partitionBy(col("user_id"))
      val staged = tbl(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
        .withColumn("t1",
          min(when(col("event_type") === "view", col("us"))).over(u))
        .withColumn("t2",
          min(when(col("event_type") === "click" &&
            col("us") > col("t1"), col("us"))).over(u))
        .withColumn("t3",
          min(when(col("event_type") === "purchase" &&
            col("us") > col("t2"), col("us"))).over(u))
      staged.groupBy(col("user_id"))
        .agg(first(col("t1")).as("t1_us"), first(col("t2")).as("t2_us"),
          first(col("t3")).as("t3_us"))
        .withColumn("depth",
          when(col("t3_us").isNotNull, 3)
            .when(col("t2_us").isNotNull, 2)
            .when(col("t1_us").isNotNull, 1).otherwise(0))
    }),

    // ── COHORT retention: users grouped by first-seen week (vs the
    // corpus start), activity bucketed by week offset from their
    // cohort — the classic retention triangle. Pure integer epoch
    // arithmetic (no calendar functions with engine-specific week
    // conventions); corpus start is a broadcast scalar, first-seen a
    // per-user window min, the triangle one exact distinct-count
    // aggregation. ──
    "q_cohort" -> ((s, dir) => {
      val wk = 604800000000L // 7 days in micros
      val ev = tbl(s, dir, "events")
        .select(col("user_id"), unix_micros(col("ts")).as("us"))
      val t0 = ev.agg(min(col("us")).as("t0"))
      val u = Window.partitionBy(col("user_id"))
      ev.crossJoin(broadcast(t0))
        .withColumn("first_us", min(col("us")).over(u))
        // `div`, not `/`: Spark's `/` on longs is DOUBLE division
        .withColumn("cohort_week",
          expr(s"(first_us - t0) div $wk"))
        .withColumn("week_offset",
          expr(s"(us - t0) div $wk") - col("cohort_week"))
        .groupBy(col("cohort_week"), col("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
    }),

    // ── Salted two-phase AGGREGATION (the agg half of the skew
    // toolkit; q_salted_join covers joins): count+sum per user split
    // across 16 deterministic salts in phase 1, combined per key in
    // phase 2 — result equals the plain groupBy exactly, which is
    // the associativity property the oracle certifies. At 100 TB
    // this is the manual fix for a hot grouping key AQE cannot
    // re-plan (aggregations have no skew-split). ──
    "q_salted_agg" -> ((s, dir) => {
      val e = tbl(s, dir, "events")
        .withColumn("cents", floor(col("value") * 100).cast("long"))
      graft.core.Skew.saltedCountSum(e, "user_id", "cents",
        salt = pmod(col("event_id"), lit(16L)))
    }),

    // ── Distributed GLOBAL RANK (core.Ranking): range-repartition +
    // local rank + broadcast prefix-sum offsets — the total-order
    // rank WITHOUT the single-task empty-PARTITION-BY window. Every
    // 97th rank is emitted to bound the row's output; the oracle is
    // the plain total-order row_number, so a green row proves the
    // distributed recipe equals the naive global window. ──
    "q_global_rank" -> ((s, dir) => {
      val e = tbl(s, dir, "events")
        .select(col("event_id"), unix_micros(col("ts")).as("us"))
      graft.core.Ranking.globalRank(e, Seq(col("us"), col("event_id")))
        .filter(pmod(col("rank"), lit(97L)) === 0)
        .select(col("event_id"), col("us"), col("rank"))
    }),

    // ── Approx TOP-K (heavy hitters) CONTRACT row, completing the
    // sketch family (Bloom, HLL, GK percentile already certified):
    // per event type, the rank-k user-frequency counts from
    // approx_top_k must equal the exact ones — maxItemsTracked is
    // sized above the key cardinality, where the sketch is provably
    // exact, so the gate pins the sketch plumbing (the same
    // total-coverage pattern as q_ann_ivf). Only (rank, count) is
    // compared — counts are tie-proof where the item pick is not. ──
    "q_approx_topk" -> ((s, dir) =>
      tbl(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(expr("approx_top_k(user_id, 5, 10000)").as("tk"))
        .select(col("event_type"), posexplode(col("tk")))
        .select(col("event_type"), (col("pos") + 1).cast("int").as("rank"),
          col("col.count").cast("long").as("n"))),

    // ── S1's JSON path certified IN the oracle harness (it was
    // spec-only: the parquet-driven verify never touched it): a
    // bounded slice stages as ONE JSON ARRAY document — the
    // reference's whole-file model (FileSource.php:37-41) — and
    // flows back through the engine's FileSource multiLine read
    // into an aggregate the oracle recomputes from the parquet
    // table. Green = the staged bytes, the reader, and the JSON
    // number round-trip are all faithful. ──
    "q_source_json" -> ((s, dir) => {
      val slice = tbl(s, dir, "events")
        .filter(pmod(col("event_id"), lit(7)) === 0)
        .select(col("event_id"), col("user_id"), col("event_type"),
          floor(col("value") * 100).cast("long").as("value_cents"))
      if (slice.isEmpty) emptySourceAgg(s)
      else {
        val work = tempStateDir()
        val json = slice.toJSON.collect().mkString("[", ",", "]")
        val f = new java.io.File(work, "events.json")
        java.nio.file.Files.writeString(f.toPath, json)
        graft.sources.FileSource(f.toString).load(s)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("value_cents")).as("cents"),
            min(col("event_id")).as("min_id"),
            max(col("event_id")).as("max_id"))
      }
    }),

    // ── S1's CSV path, same certification shape (distributed
    // header+inferSchema read over a staged part-file directory;
    // inferred INT widths normalized by the explicit casts) ──
    "q_source_csv" -> ((s, dir) => {
      val slice = tbl(s, dir, "events")
        .filter(pmod(col("event_id"), lit(5)) === 0)
        .select(col("event_id"), col("user_id"), col("event_type"),
          floor(col("value") * 100).cast("long").as("value_cents"))
      if (slice.isEmpty) emptySourceAgg(s)
      else {
        val work = tempStateDir()
        slice.coalesce(4).write.option("header", "true")
          .mode("overwrite").csv(s"$work/ev_csv")
        graft.sources.FileSource(s"$work/ev_csv", Some("csv")).load(s)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("value_cents").cast("long")).as("cents"),
            min(col("event_id").cast("long")).as("min_id"),
            max(col("event_id").cast("long")).as("max_id"))
      }
    })
  )

  /** Shared empty-result schema for the staged-source rows (an empty
    * staged file has no inferable schema to aggregate over). */
  private def emptySourceAgg(s: SparkSession): DataFrame =
    s.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("event_type",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("n",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("cents",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("min_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("max_id",
          org.apache.spark.sql.types.LongType))))

  /** LLM-training-data pipeline operators (BASELINE.json north star). */
  def extQueries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // exact dedup on a 5-token-prefix fingerprint (creates real
    // collisions in the synthetic corpus; keeps min doc_id per group)
    "q_dedup_exact" -> ((s, dir) => {
      val d = s.read.parquet(t(dir, "documents"))
      val fp = md5(concat_ws(" ",
        slice(split(lower(trim(col("text"))), "\\s+"), 1, 5)).cast("binary"))
      val w = Window.partitionBy(col("fingerprint")).orderBy(col("doc_id"))
      d.withColumn("fingerprint", fp)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("fingerprint"))
    }),

    // passage-level dedup: chunk fingerprints shared by >1 document
    // (aligned duplication — boilerplate, common prefixes, copies)
    "q_chunk_dedup" -> ((s, dir) =>
      graft.util.Tables.spread(s.read.parquet(t(dir, "documents")))
        .select(col("doc_id"),
          explode(TextAnalysis.chunkHashes(col("text"), 32))
            .as("chunk_hash"))
        .groupBy(col("chunk_hash"))
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          min(col("doc_id")).as("min_doc"),
          max(col("doc_id")).as("max_doc"))
        .filter(col("n_docs") > 1)),

    // content-defined chunking: shared passages found regardless of
    // their offset in the document (the fixed-position variant above
    // only catches aligned duplication)
    "q_cdc_chunks" -> ((s, dir) =>
      TextAnalysis.cdcChunks(
        s.read.parquet(t(dir, "documents")), "doc_id", "text", 64)
        .filter(col("n_tokens") >= 8)
        .groupBy(col("chunk_hash"))
        .agg(countDistinct(col("id")).as("n_docs"),
          count(lit(1)).as("n_occurrences"))
        .filter(col("n_docs") > 1)),

    // deterministic stratified hash sampling — same rows every run,
    // every engine, any partitioning (oracle replays the selection)
    "q_sample_stratified" -> ((s, dir) =>
      graft.ext.Sampling.stratified(
        tbl(s, dir, "events"), "event_id", "event_type",
        rates = Map("view" -> 0.1, "click" -> 0.5), defaultRate = 1.0)
        .select(col("event_id"), col("event_type"), col("user_id"))),

    // text analysis: tokens, ratios, quality, lang-id, fingerprint
    "q_text_analysis" -> ((s, dir) =>
      TextAnalysis.analyze(s.read.parquet(t(dir, "documents")))),

    // PII scrub: redact emails → IPv4s → phones with typed
    // placeholders, counting each class. The corpus carries no PII,
    // so a deterministic contact line derived from doc_id is appended
    // on BOTH engines (the synthetic-input convention the sync
    // queries use) — the scrub does real work and the oracle verifies
    // real redactions.
    "q_pii_scrub" -> ((s, dir) => {
      val withPii = s.read.parquet(t(dir, "documents")).select(col("doc_id"),
        concat(col("text"),
          lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com or +1 (555) 010-"),
          lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
          lit(" at 10."), pmod(col("doc_id"), lit(256)).cast("string"),
          lit(".0.1")).as("text"))
      TextAnalysis.piiScrub(withPii, "doc_id", "text")
    }),

    // HTML→text extraction on synthetic markup (the PII convention:
    // the corpus has no HTML, so a deterministic wrapper derived
    // from doc_id is added on BOTH engines — scripts/styles/
    // comments/tags/entities all exercised, cleaned text replayed
    // byte-for-byte)
    "q_html_strip" -> ((s, dir) => {
      val wrapped = s.read.parquet(t(dir, "documents"))
        .select(col("doc_id"), concat(
          lit("<html><head><title>Doc "), col("doc_id").cast("string"),
          lit("</title><script type=\"text/javascript\">var n=2;\ntrack();</script><style>.c{margin:0}</style></head><body><!-- hdr -->"),
          lit("<p class=\"b\">"), coalesce(col("text"), lit("")),
          lit("</p><div>Tom &amp; Jerry &lt;3 &quot;q&quot;&#39;s&nbsp;end</div></body></html>"))
          .as("text"))
      TextAnalysis.stripHtml(wrapped, "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
    }),

    // corpus-wide duplicate-line removal (C4 repeated-line rule /
    // Dolma paragraph dedup): each non-blank line keeps only its
    // first (doc_id, position) occurrence across the corpus
    "q_line_dedup" -> ((s, dir) => {
      TextAnalysis.c4LineDedup(
        s.read.parquet(t(dir, "documents")), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
    }),

    // Gopher-style repetition quality signals: top token / top 2-gram
    // frequency, longest same-token run, duplicate-token fraction
    "q_quality_repetition" -> ((s, dir) =>
      TextAnalysis.repetitionSignals(
        s.read.parquet(t(dir, "documents")), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")),

    // unigram-LM surprisal scoring (the CCNet/KenLM quality-filter
    // shape: corpus-trained token frequencies → per-doc total/mean
    // surprisal; integer micro-nats before the sum, so the aggregate
    // is exact and order-free)
    "q_unigram_ppl" -> ((s, dir) =>
      Assemble.unigramSurprisal(
        s.read.parquet(t(dir, "documents")), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")),

    // bigram-LM surprisal with add-one smoothing (one rung up the LM
    // ladder toward the CCNet 5-gram scorer): integer micro-nats
    // before the sum, exact integer mean — order-free and replayable
    "q_bigram_ppl" -> ((s, dir) =>
      Assemble.bigramSurprisal(
        s.read.parquet(t(dir, "documents")), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")),

    // exact-k-per-stratum sample (fixed-budget eval sets: "exactly
    // 20 per event type"): portable-hash rank within stratum, the
    // same any-engine/any-partitioning reproducibility contract as
    // the rate-based sampler; WindowGroupLimit keeps the shuffle at
    // O(k·strata·tasks)
    "q_sample_exact_k" -> ((s, dir) =>
      graft.ext.Sampling.exactKPerStratum(
        tbl(s, dir, "events"), "event_id", "event_type", k = 20)
        .select(col("event_id"), col("event_type"), col("user_id"))),

    // deterministic train/val/test split (90/5/5 hash cells):
    // disjoint by construction, stable under reprocessing
    "q_split" -> ((s, dir) =>
      graft.ext.Sampling.split(
        s.read.parquet(t(dir, "documents")), "doc_id")
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n"),
          min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))),

    // interpolated trigram surprisal (Jelinek-Mercer; the LM-ladder
    // rung the CCNet 5-gram scorer generalizes): fixed-order
    // interpolation over exact integer counts, one micro-nat
    // truncation, exact integer per-doc totals
    "q_trigram_ppl" -> ((s, dir) =>
      Assemble.trigramSurprisal(
        s.read.parquet(t(dir, "documents")), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")),

    // deterministic domain-mixture sampling over events: hit target
    // event_type proportions 1:3:6 by downsampling only; exact
    // integer thresholds end to end (signup/error carry no weight —
    // dropped)
    "q_mix_domains" -> ((s, dir) =>
      Assemble.mixture(tbl(s, dir, "events"), "event_id", "event_type",
        Map("view" -> 1L, "click" -> 3L, "purchase" -> 6L))
        .select(col("event_id"), col("event_type"), col("user_id"))),

    // temperature-flattened mixture (T=2 over 1:3:6): integer
    // milli-weights computed once on the driver, identical literals
    // embedded in the oracle — the exact-integer selection unchanged
    "q_mix_temperature" -> ((s, dir) =>
      Assemble.mixtureTemperature(tbl(s, dir, "events"),
        "event_id", "event_type",
        Map("view" -> 1L, "click" -> 3L, "purchase" -> 6L),
        temperature = 2.0, scale = 50L)
        .select(col("event_id"), col("event_type"), col("user_id"))),

    // sequence packing: documents → fixed-512-token training
    // sequences in 8 hash shards (greedy concat-and-chop in id order
    // per shard)
    "q_seq_pack" -> ((s, dir) =>
      Assemble.packSequences(
        s.read.parquet(t(dir, "documents")), "doc_id", "text",
        seqLen = 512, shards = 8)
        .withColumnRenamed("id", "doc_id")),

    // corpus vocabulary with document frequencies (tokenizer/BPE
    // corpus prep): token -> total count + containing-doc count
    "q_vocab" -> ((s, dir) =>
      Assemble.vocabulary(
        s.read.parquet(t(dir, "documents")), "doc_id", "text",
        minCount = 5L)),

    // bigram PMI (collocation mining — the phrase-detection pass of
    // tokenizer/corpus prep): ln((c_ab·N)/(c_a·c_b)) over exact
    // integer counts, truncated once to micro-nats; top collocations
    // by a total order. One explode for bigrams via an in-array zip
    // (no second token shuffle), unigram table joined twice (AQE
    // broadcasts the vocab-sized sides)
    "q_pmi" -> ((s, dir) => {
      val toks = graft.util.Tables.spread(
        s.read.parquet(t(dir, "documents")))
        .select(graft.ext.TextAnalysis.normTokens(col("text")).as("ts"))
        .filter(size(col("ts")) >= 2)
      val bi = toks.select(explode(
          transform(sequence(lit(1), size(col("ts")) - 1),
            i => concat_ws(" ", element_at(col("ts"), i),
              element_at(col("ts"), i + 1)))).as("bigram"))
        .groupBy(col("bigram")).agg(count(lit(1)).as("c_ab"))
        .filter(col("c_ab") >= 5)
      val uni = graft.util.Tables.spread(
        s.read.parquet(t(dir, "documents")))
        .select(explode(
          graft.ext.TextAnalysis.normTokens(col("text"))).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("c"))
      val nRow = uni.agg(sum(col("c"))).head()
      val n = if (nRow.isNullAt(0)) 0L else nRow.getLong(0) // empty corpus
      bi.withColumn("w1", split(col("bigram"), " ").getItem(0))
        .withColumn("w2", split(col("bigram"), " ").getItem(1))
        .join(uni.select(col("tok").as("w1"), col("c").as("c_a")), Seq("w1"))
        .join(uni.select(col("tok").as("w2"), col("c").as("c_b")), Seq("w2"))
        .withColumn("pmi_micro",
          floor(log((col("c_ab") * n).cast("double") /
            (col("c_a") * col("c_b"))) * 1000000L).cast("long"))
        .select(col("bigram"), col("c_ab"), col("c_a"), col("c_b"),
          col("pmi_micro"))
        .orderBy(col("pmi_micro").desc, col("bigram")).limit(50)
    }),

    // TF-IDF top-3 salient terms per document (keyword extraction /
    // topic tagging / per-domain vocabulary-drift monitoring):
    // exact-integer scoring — ln(N/df) truncated ONCE to micro-nats,
    // then tf·idf is pure LONG arithmetic and the per-doc top-k is a
    // total order (score desc, token asc)
    "q_tfidf" -> ((s, dir) =>
      Assemble.tfidfTopTerms(
        s.read.parquet(t(dir, "documents")), "doc_id", "text", topK = 3)
        .withColumnRenamed("id", "doc_id")),

    // int8 embedding quantization (the 4-bytes/dim -> 1 storage
    // path): absmax scale + floor quantizer; the oracle checks the
    // scale (floor-micro integer — no round-half convention; absmax
    // of a float column is the same exact double in both engines)
    // and an exact integer checksum of the quantized vector
    "q_embed_quantize" -> ((s, dir) =>
      Assemble.quantizeInt8(
        s.read.parquet(t(dir, "embeddings")), "vec_id")
        .select(col("vec_id"),
          floor(col("scale") * 1000000L).cast("long").as("scale_micro"),
          aggregate(col("q"), lit(0L), (acc, x) => acc + x).as("q_sum"),
          size(col("q")).cast("long").as("n_dims"))),

    // train/test contamination: 13-gram overlap of each "test" doc
    // (odd ids) against the "train" corpus (even ids) — the
    // decontamination pass run before training. Hash-keyed semi-join;
    // the oracle joins the gram STRINGS, so a green row also
    // certifies the 60-bit hash join is collision-free here.
    "q_contamination" -> ((s, dir) => {
      val d = s.read.parquet(t(dir, "documents"))
      Dedup.contamination(
        d.filter(col("doc_id") % 2 === 0),
        d.filter(col("doc_id") % 2 === 1),
        "doc_id", "text", n = 13)
        .withColumnRenamed("id", "doc_id")
    }),

    // Bloom-prefiltered contamination — IDENTICAL output to
    // q_contamination (same oracle SQL): the test-gram bloom filters
    // the training grams map-side BEFORE their distinct shuffle, and
    // the exact semi-join after it absorbs the bloom's false
    // positives. The green row certifies the composed path is exact.
    "q_contamination_bloom" -> ((s, dir) => {
      val d = s.read.parquet(t(dir, "documents"))
      Dedup.contaminationBloom(
        d.filter(col("doc_id") % 2 === 0),
        d.filter(col("doc_id") % 2 === 1),
        "doc_id", "text", n = 13)
        .withColumnRenamed("id", "doc_id")
    }),

    // near-dup CLUSTERS: minhash pairs collapsed by connected
    // components (large-star/small-star) — transitive closure, so
    // A~B, B~C lands A,B,C in ONE cluster even when A~C was never a
    // pair. Oracle: DuckDB replays the pairs, then a recursive CTE
    // computes reachability and takes the component min.
    "q_dedup_clusters" -> ((s, dir) => {
      val pairs = Dedup.minhashDedup(s.read.parquet(t(dir, "documents")),
        "doc_id", "text", threshold = 0.5,
        baseHash = TextAnalysis.portableHash60)
      Dedup.connectedComponents(pairs, "id_a", "id_b")
        .withColumnRenamed("id", "doc_id")
    }),

    // the capstone composition: fuzzy dedup (minhash pairs → CC →
    // one survivor per cluster) then the deterministic training
    // permutation over the survivors — "prepare this corpus for
    // training" as ONE oracle-certified query
    "q_dedup_shuffle" -> ((s, dir) => {
      val survivors = Dedup.fuzzyDedup(
        s.read.parquet(t(dir, "documents")), "doc_id", "text",
        threshold = 0.5, baseHash = TextAnalysis.portableHash60)
      Assemble.shuffleShards(survivors, "doc_id", shards = 16)
        .withColumnRenamed("id", "doc_id")
    }),

    // quality-aware fuzzy dedup (the Dolma/FineWeb survivor rule):
    // within each near-dup cluster keep the LONGEST doc (token
    // count), ties by lowest id — instead of min-id
    "q_dedup_best" -> ((s, dir) => {
      val d = s.read.parquet(t(dir, "documents"))
      Dedup.fuzzyDedupBest(d, "doc_id", "text",
        metric = TextAnalysis.wsTokenCount(col("text")).cast("long"),
        threshold = 0.5, baseHash = TextAnalysis.portableHash60)
        .select(col("doc_id"), col("n_chars"))
    }),

    // deterministic corpus shuffle-and-shard: reproducible training
    // permutation with no global sort — hash-mod shard, row_number
    // within shard on (hash, id)
    "q_shuffle_shards" -> ((s, dir) =>
      Assemble.shuffleShards(
        s.read.parquet(t(dir, "documents")), "doc_id", shards = 64)
        .withColumnRenamed("id", "doc_id")),

    // LSH bucket-skew pre-flight: per band, bucket counts and the
    // EXACT candidate-pair volume the banded self-join would generate
    // — the number that predicts (and would flag) a degenerate-bucket
    // blowup before a 100 TB dedup run
    "q_lsh_skew" -> ((s, dir) =>
      Dedup.lshBucketStats(s.read.parquet(t(dir, "documents")),
        "doc_id", "text", baseHash = TextAnalysis.portableHash60)),

    // duplicate-passage annotation per document (Dolma-style quality
    // signal): fraction of each doc's 32-token chunks that appear in
    // at least one OTHER document
    "q_dup_chunks" -> ((s, dir) =>
      TextAnalysis.dupChunkStats(
        s.read.parquet(t(dir, "documents")), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")),

    // winnowing (MOSS) shared-substring report: fingerprints present
    // in >1 doc — guaranteed to fire for any shared token run of
    // length >= k + window - 1 = 11, at any offsets
    "q_winnow_dup" -> ((s, dir) => {
      val fps = TextAnalysis.winnowFingerprints(
        s.read.parquet(t(dir, "documents")), "doc_id", "text")
      fps.groupBy(col("fp")).agg(
          count(lit(1)).as("n_docs"),
          min(col("id")).as("min_doc"), max(col("id")).as("max_doc"))
        .filter(col("n_docs") > 1)
    }),

    // shift-robust duplicate-passage annotation: token-weighted dup
    // fraction over content-defined chunks (catches offset-shifted
    // shared passages that fixed-position chunks miss)
    "q_dup_chunks_cdc" -> ((s, dir) =>
      TextAnalysis.dupCdcStats(
        s.read.parquet(t(dir, "documents")), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")),

    // exact duplicated-span annotation (Lee et al. 2022 / Dolma
    // exact-substring signal): maximal cross-doc repeated runs of
    // >= 13 tokens, with exact per-doc token coverage in integer ppm
    "q_span_dedup" -> ((s, dir) =>
      TextAnalysis.dupSpanStats(
        s.read.parquet(t(dir, "documents")), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")),

    // the full Gopher rule battery (Rae et al. 2021, Table A1):
    // per-doc quality signals + the composite pass flag, every
    // fraction rounded before comparison so the flag replays exactly
    "q_gopher_rules" -> ((s, dir) =>
      TextAnalysis.gopherRules(
        s.read.parquet(t(dir, "documents")), "doc_id", "text",
        minWords = 20L)
        .withColumnRenamed("id", "doc_id")),

    // the full Gopher REPETITION battery (Rae et al. 2021, Table A1
    // bottom half): duplicate-line / duplicate-line-char fractions,
    // top-{2,3,4}-gram char fractions, duplicate-{5..10}-gram char
    // fractions with exact overlap-free island coverage — every
    // fraction a truncating integer ppm, so the rows replay exactly
    "q_gopher_repetition" -> ((s, dir) =>
      TextAnalysis.gopherRepetition(
        s.read.parquet(t(dir, "documents")), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")),

    // hashed-bag-of-words linear classifier scoring (the fastText
    // quality-gate shape): token → hash bucket → deterministic
    // weight; exact-integer keep decision, engine-replayable
    "q_quality_classifier" -> ((s, dir) =>
      TextAnalysis.hashedClassifierScore(
        s.read.parquet(t(dir, "documents")), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")),

    // CCNet-style perplexity bucketing: per-language head/middle/tail
    // thirds by exact-integer mean unigram surprisal, split with
    // ntile over a total order — no FP in the bucket decision
    "q_ppl_buckets" -> ((s, dir) =>
      Assemble.pplBuckets(
        s.read.parquet(t(dir, "documents")), "doc_id", "text", "lang")
        .withColumnRenamed("id", "doc_id")),

    // the 100 TB shape of q_ppl_buckets, oracle-certified: split on
    // approx_percentile cutoffs over the salted unique key instead of
    // the per-language ntile funnel. Below the sketch's compression
    // threshold (2·n/accuracy < 1 — gate languages hold ≤ 218 docs at
    // accuracy 10000) the cutoff is provably the element at rank
    // ceil(p·n), which DuckDB replays as an exact rank selection —
    // same contract as q_percentile_approx.
    "q_ppl_buckets_approx" -> ((s, dir) =>
      Assemble.pplBucketsApprox(
        s.read.parquet(t(dir, "documents")), "doc_id", "text", "lang")
        .withColumnRenamed("id", "doc_id")),

    // encoding-damage signals: U+FFFD replacement chars + C0 control
    // chars (minus tab/LF/CR). The corpus is clean, so deterministic
    // damage is injected by doc_id (the synthetic-input convention
    // the PII query uses) — the gate verifies real detections.
    "q_encoding" -> ((s, dir) => {
      val d = s.read.parquet(t(dir, "documents")).select(col("doc_id"),
        concat(col("text"),
          when(pmod(col("doc_id"), lit(7)) === 0, lit("�"))
            .otherwise(lit("")),
          when(pmod(col("doc_id"), lit(5)) === 0, expr("chr(7)"))
            .otherwise(lit(""))).as("text"))
      TextAnalysis.encodingSignals(d, "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
    }),

    // per-document character-distribution entropy in exact integer
    // micro-nats (gibberish / degenerate-text signal)
    "q_char_entropy" -> ((s, dir) =>
      TextAnalysis.charEntropy(
        s.read.parquet(t(dir, "documents")), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")),

    // C4 line-level cleaning: keep lines ending in terminal
    // punctuation with >= minWords words and no boilerplate markers;
    // doc survives with >= minKeptLines lines. The oracle replays the
    // cleaned TEXT byte-for-byte. Documents are single-line prose, so
    // minWords=5/minKeptLines=1 exercises both keep and drop paths.
    "q_c4_lines" -> ((s, dir) =>
      TextAnalysis.c4LineFilter(
        s.read.parquet(t(dir, "documents")), "doc_id", "text",
        minWords = 5, minKeptLines = 1)
        .withColumnRenamed("id", "doc_id")),

    // BPE training, round-1 scoring: weighted adjacent-char-pair
    // counts over the word-type table (the corpus-scale part of
    // tokenizer training; the iterative merge loop is bpeTrain,
    // spec-verified against a hand-computed Sennrich example)
    "q_bpe_pairs" -> ((s, dir) =>
      Assemble.bpePairCounts(
        s.read.parquet(t(dir, "documents")), "doc_id", "text",
        minCount = 5L)),

    // per-document OOV rate against the corpus's own top-100 vocab
    // (tokenizer-coverage signal); vocab selection is a total order —
    // count desc, token asc — so every engine picks the same vocab
    "q_oov_rate" -> ((s, dir) =>
      Assemble.oovRate(
        s.read.parquet(t(dir, "documents")), "doc_id", "text", topN = 100)
        .withColumnRenamed("id", "doc_id")),

    // element-wise mean pooling of embeddings per label (chunk→doc /
    // class-prototype reduction): exact integer micro-units before
    // the sum, one flat row per (label, dim)
    "q_embed_meanpool" -> ((s, dir) =>
      Similarity.meanPoolDims(
        s.read.parquet(t(dir, "embeddings")), "label")
        .withColumnRenamed("g", "label")),

    // the C4-style corpus cleanup, composed end to end: language
    // filter → quality gate → exact dedup (keep min id per
    // fingerprint) — the flagship training-data pipeline shape,
    // oracle-checked as one query
    "q_corpus_clean" -> ((s, dir) => {
      val scored = TextAnalysis.analyze(s.read.parquet(t(dir, "documents")))
      val kept = scored.filter(
        col("lang_guess") === "en" && col("quality") >= 0.5)
      val w = Window.partitionBy(col("fingerprint")).orderBy(col("doc_id"))
      kept.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col("doc_id"), col("lang_guess"), col("quality"),
          col("n_tokens_ws"))
    }),

    // order-aware rolling content hash over portable token hashes —
    // oracle-checked: DuckDB replays the exact polynomial fold
    "q_text_rolling" -> ((s, dir) =>
      s.read.parquet(t(dir, "documents"))
        .select(col("doc_id"),
          TextAnalysis.rollingHash(col("text")).as("rolling_hash"))),

    // brute-force cosine similarity pairs over embeddings
    "q_embed_cosine" -> ((s, dir) => {
      val e = s.read.parquet(t(dir, "embeddings"))
      Similarity.bruteForcePairs(
        e, e.filter(col("vec_id") % 100 === 0), 0.3)
    }),

    // embedding-cosine near-dup dedup: drop the higher id of every
    // pair above threshold (greedy, deterministic; oracle-checked).
    // Pair generation is the bucketed multi-probe IVF join — no
    // corpus broadcast, no all-pairs nested loop; nProbe=6/16 is
    // pinned to exact recall on this corpus by SimilaritySpec + the
    // DuckDB oracle (which recomputes the pairs exhaustively).
    "q_embed_dedup" -> ((s, dir) => {
      val e = s.read.parquet(t(dir, "embeddings"))
      // exact-dup pre-collapse: the cell self-join runs on unique
      // vectors only — duplicate CLIQUES (the dominant shape in a
      // re-crawled corpus) contribute linear rep edges instead of
      // quadratic pairs; the survivor set is provably identical
      val pairs = Similarity.pairGraphCollapsed(
        e, 0.4, nCells = 16, nProbe = 6)
      e.join(pairs.select(col("n_id").as("vec_id")).distinct(),
          Seq("vec_id"), "left_anti")
        .select(col("vec_id"), col("label"))
    }),

    // SemDeDup (Abbas et al. 2023): semantic dedup where each
    // near-dup component keeps the member FARTHEST from its centroid
    // (lowest cosine — the paper's diversity-preserving survivor
    // rule) — centroid from exact integer micro-sums, similarities
    // as fixed-order folds, so the keeper rank replays exactly
    "q_semdedup" -> ((s, dir) =>
      Similarity.semDedup(
        s.read.parquet(t(dir, "embeddings")), 0.4,
        nCells = 16, nProbe = 6)),

    // semantic near-dup CLUSTERS: connected components over the
    // collapsed embedding pair graph (same IVF settings as
    // q_embed_dedup, whose exact recall is spec-pinned; exact-dup
    // members enter through rep edges — components unchanged);
    // oracle recomputes pairs exhaustively and closes them
    // recursively
    "q_embed_clusters" -> ((s, dir) => {
      val e = s.read.parquet(t(dir, "embeddings"))
      val pairs = Similarity.pairGraphCollapsed(
        e, 0.4, nCells = 16, nProbe = 6)
      Dedup.connectedComponents(pairs, "q_id", "n_id")
        .withColumnRenamed("id", "vec_id")
    }),

    // MinHash LSH near-dedup over md5-derived (portable) seeded
    // hashes — oracle-checked: DuckDB recomputes the signatures,
    // band candidates, and true-Jaccard verification end to end
    "q_minhash_dedup" -> ((s, dir) =>
      Dedup.minhashDedup(s.read.parquet(t(dir, "documents")),
        "doc_id", "text", threshold = 0.5,
        baseHash = TextAnalysis.portableHash60)),

    // incremental dedup: today's batch (odd ids) LSH-paired against
    // the accumulated corpus (even ids) — candidate volume scales
    // with the batch, the corpus never self-compares
    "q_minhash_incremental" -> ((s, dir) => {
      val d = s.read.parquet(t(dir, "documents"))
      Dedup.minhashPairsAgainst(
        d.filter(col("doc_id") % 2 === 1),
        d.filter(col("doc_id") % 2 === 0),
        "doc_id", "text", threshold = 0.5,
        baseHash = TextAnalysis.portableHash60)
    }),

    // SimHash near-dup pairs at hamming ≤ 8 over a 60-bit portable
    // signature; 9-segment pigeonhole blocking is exact at radius 8.
    // Oracle-checked: DuckDB replays the signature bit votes and
    // verifies all pairs via bit_count(xor(...))
    "q_simhash_pairs" -> ((s, dir) =>
      Dedup.simhashPairs(s.read.parquet(t(dir, "documents")),
        "doc_id", "text", maxHamming = 8, bits = 60,
        hashFn = TextAnalysis.portableHash60)),

    // n-gram Jaccard near-dup pairs blocked by length bucket
    // (near-dups have near-equal length; oracle-checked)
    "q_ngram_jaccard" -> ((s, dir) => {
      val d = s.read.parquet(t(dir, "documents"))
      Dedup.ngramJaccardPairs(d, "doc_id", "text",
        blockCol = floor(length(col("text")) / 50), threshold = 0.5, n = 3)
    }),

    // LSH-bucketed ANN top-k — oracle-checked: probeRadius=3 is
    // pinned to EXACT agreement with the exhaustive top-5 on this
    // corpus (RecallProbe), so the DuckDB oracle recomputes the
    // brute-force answer; sub-exhaustive production probing
    // (radius 1-2) is recall-pinned by ExtSpec
    "q_ann_lsh" -> ((s, dir) => {
      val e = s.read.parquet(t(dir, "embeddings"))
      Similarity.lshTopK(e, e.filter(col("vec_id") % 100 === 0),
        k = 5, nPlanes = 4, probeRadius = 3)
    }),

    // Trained-centroid IVF ANN: k-means centroids from a
    // deterministic sample, corpus in its nearest cell — oracle-
    // checked: nProbe=7 of 8 cells is pinned to EXACT agreement with
    // the exhaustive top-5 on this corpus (RecallProbe); production
    // probe fractions are recall-pinned by ExtSpec
    "q_ann_ivf_trained" -> ((s, dir) => {
      val e = s.read.parquet(t(dir, "embeddings"))
      val cents = Similarity.trainCentroids(e, nCells = 8)
      Similarity.ivfTopKTrained(e, e.filter(col("vec_id") % 100 === 0),
        k = 5, cents, nProbe = 7)
    }),

    // PQ/ADC ANN with exact refine: corpus compressed to m one-byte
    // codes per vector (deterministic per-subspace k-means
    // codebooks); the full ADC scan runs over the COMPRESSED corpus,
    // then only |queries|·shortlist full vectors are re-ranked
    // exactly. Oracle-checked: shortlist=50 (of a ~640-vector
    // corpus — genuinely sub-exhaustive) re-ranks to EXACT agreement
    // with the exhaustive top-5 (RecallProbe), so the DuckDB oracle
    // recomputes the brute-force answer
    "q_ann_pq" -> ((s, dir) => {
      val e = s.read.parquet(t(dir, "embeddings"))
      val cbs = Similarity.trainPqCodebooks(e, m = 16, k = 32)
      val codes = Similarity.pqEncode(e, cbs)
      Similarity.pqTopKRefined(codes, e,
        e.filter(col("vec_id") % 100 === 0), cbs, k = 5, shortlist = 50)
    }),

    // IVF-style ANN: corpus in its nearest seed cell, queries probe
    // cells in projection order. Oracle-checked at TOTAL coverage
    // (nProbe = nCells): the data-blind seed cells never reach exact
    // recall sub-exhaustively (RecallProbe: 3 misses even at 7/8),
    // so the gate instead pins the PLUMBING — cell assignment, probe
    // expansion, cell join, rank — which at total coverage must
    // reproduce the exhaustive top-5 at any scale; production
    // sub-exhaustive probing (nProbe=3) is recall-pinned by ExtSpec
    "q_ann_ivf" -> ((s, dir) => {
      val e = s.read.parquet(t(dir, "embeddings"))
      val celled = e.withColumn("cell",
        Similarity.ivfAssign(col("embedding"), nCells = 8))
      val q = e.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
          explode(Similarity.ivfProbe(col("embedding"), 8, 8)).as("cell"))
      val c = celled.select(col("vec_id").as("n_id"),
        col("embedding").as("n_vec"), col("cell"))
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("sim").desc, col("n_id"))
      c.join(q, Seq("cell")).filter(col("q_id") =!= col("n_id"))
        .withColumn("sim", graft.functions.GraftFunctions
          .cosine_sim(col("q_vec"), col("n_vec")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("q_id"), col("n_id"), round(col("sim"), 6).as("sim"),
          col("rank"))
    }),

    // multimodal: binary columns + typed metadata (oracle-checked)
    "q_multimodal_meta" -> ((s, dir) => {
      val media = Multimodal.synthesize(
        s.read.parquet(t(dir, "documents")), "doc_id", "text")
      Multimodal.withMeta(media)
        .select(col("media_id"), col("media_type"),
          col("meta.n_bytes").as("n_bytes"),
          col("meta.sha256").as("sha256"))
    }),

    // multimodal decode plumbing: stubbed codec via mapPartitions
    // (rows-only: the fake feature values are JVM-hash derived)
    // decode stub over mapPartitions batches — oracle-checked: the
    // deterministic fake dimensions derive from the portable 60-bit
    // md5 hash, which DuckDB replays (the real-codec swap point keeps
    // the same schema/batch contract)
    "q_multimodal_decode" -> ((s, dir) => {
      val media = Multimodal.synthesize(
        s.read.parquet(t(dir, "documents")), "doc_id", "text")
      Multimodal.decodeStub(media).toDF()
        .select(col("media_id"), col("media_type"), col("n_bytes"),
          col("width"), col("height"), col("duration_ms"))
    }),

    // frame-sample plan: per-video sampled timestamps exploded from
    // METADATA only (frame bytes never materialize); durations come
    // from the portable-hash decode stub, so the oracle replays the
    // exact sampled grid
    "q_multimodal_frames" -> ((s, dir) => {
      val media = Multimodal.synthesize(
        s.read.parquet(t(dir, "documents")), "doc_id", "text")
      Multimodal.frameSamplePlan(
        Multimodal.decodeStub(media).toDF(), everyMs = 60000L)
    }),

    // aspect-preserving resize plan in exact integer arithmetic
    // (no round-half convention in the contract)
    "q_multimodal_resize" -> ((s, dir) => {
      val media = Multimodal.synthesize(
        s.read.parquet(t(dir, "documents")), "doc_id", "text")
      Multimodal.resizePlan(
        Multimodal.decodeStub(media).toDF(), maxSide = 512)
    }),

    // ── REAL codec tier: one valid binary P6 PPM per document
    // (dimensions + pixel bytes are pure integer arithmetic in the
    // doc_id), decoded by an actual header parser + payload
    // aggregation in the mapPartitions batch shape. The oracle
    // replays every feature — width, height, per-channel sums and
    // floor-milli means — from the id formula without touching the
    // binary, which certifies the decoder read the bytes it was
    // handed. (decodeStub remains the audio/video swap point; this
    // row retires the "codec is only a stub" gap for images.) ──
    "q_multimodal_ppm" -> ((s, dir) => {
      val media = Multimodal.synthesizePpm(
        s.read.parquet(t(dir, "documents")), "doc_id")
      Multimodal.decodePpm(media).toDF()
    }),

    // ── REAL codec tier #2, audio: one valid RIFF/WAVE PCM file per
    // document (rate/channels/samples pure integer arithmetic in the
    // doc_id, plus a LIST junk chunk the parser must word-align
    // past), decoded by an actual chunk walker + payload aggregation
    // in the same mapPartitions batch shape. The oracle replays every
    // feature — rate, channels, frame count, floor-ms duration,
    // per-channel sums, absolute energy, peak — from the id formula
    // without touching the binary, certifying the decoder read the
    // bytes it was handed. ──
    "q_multimodal_wav" -> ((s, dir) => {
      val media = Multimodal.synthesizeWav(
        s.read.parquet(t(dir, "documents")), "doc_id")
      Multimodal.decodeWav(media).toDF()
    })
  )

  /** DuckDB replication of the full TextAnalysis projection —
    * shared by q_text_analysis and the corpus-cleanup composition. */
  /** Exhaustive cosine top-5 per query point — the shared oracle for
    * ALL FOUR ANN variants: each query's settings are pinned (by
    * RecallProbe + ExtSpec) to exact agreement with the brute-force
    * answer on the gate corpus, so DuckDB certifies the ANN output by
    * recomputing the search exhaustively. Rank ordering replays the
    * engine's total order (sim desc, n_id asc) on the UNROUNDED sim;
    * `list_dot_product` is bit-identical to the native cosine kernel
    * (both are plain sequential folds — proven by q_embed_cosine). */
  private lazy val duckAnnBruteTop5: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |q AS (SELECT * FROM e WHERE vec_id % 100 = 0),
      |scored AS (
      |  SELECT q.vec_id AS q_id, e.vec_id AS n_id,
      |         list_dot_product(q.v, e.v)
      |           / (sqrt(list_dot_product(q.v, q.v))
      |              * sqrt(list_dot_product(e.v, e.v))) AS s
      |  FROM q JOIN e ON q.vec_id <> e.vec_id),
      |ranked AS (
      |  SELECT q_id, n_id, s,
      |         row_number() OVER (PARTITION BY q_id ORDER BY s DESC, n_id) AS rn
      |  FROM scored)
      |SELECT q_id, n_id, round(s, 6) AS sim, CAST(rn AS INTEGER) AS rank
      |FROM ranked WHERE rn <= 5""".stripMargin

  private lazy val duckTextAnalysis: String =
      ("""WITH base AS (
        |  SELECT doc_id, text,
        |    CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens_ws,
        |    len(regexp_extract_all(text, '\w+|[^\w\s]')) AS n_tokens_bpe,
        |    round(CAST(len(regexp_extract_all(text, '[^\w\s]')) AS DOUBLE)
        |      / greatest(length(text), 1), 6) AS punct_ratio,
        |    (""" + TextAnalysis.Stopwords.map(w =>
          s"len(regexp_extract_all(lower(text), '\\b$w\\b'))").mkString(" + ") +
        """) AS sw,
        |""" + TextAnalysis.LangMarkers.map { case (lang, ms) =>
          "    (" + ms.map(m =>
            s"len(regexp_extract_all(lower(text), '\\b$m\\b'))").mkString(" + ") +
            s") AS s_$lang"
        }.mkString(",\n") + """
        |  FROM documents),
        |r AS (SELECT *,
        |  round(CAST(sw AS DOUBLE) / greatest(n_tokens_ws, 1), 6) AS stopword_ratio
        |  FROM base)
        |SELECT doc_id, CAST(length(text) AS INTEGER) AS n_chars,
        |  CAST(n_tokens_ws AS INTEGER) AS n_tokens_ws,
        |  CAST(n_tokens_bpe AS INTEGER) AS n_tokens_bpe,
        |  punct_ratio, stopword_ratio,
        |  round((least(length(text) / 500.0, 1.0)
        |    + (1.0 - least(punct_ratio * 5, 1.0))
        |    + least(stopword_ratio * 4, 1.0)) / 3, 6) AS quality,
        |  CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es AND s_en >= s_zh THEN 'en'
        |       WHEN s_de >= s_fr AND s_de >= s_es AND s_de >= s_zh THEN 'de'
        |       WHEN s_fr >= s_es AND s_fr >= s_zh THEN 'fr'
        |       WHEN s_es >= s_zh THEN 'es' ELSE 'zh' END AS lang_guess,
        |  md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fingerprint
        |FROM r""").stripMargin

  /** DuckDB replay of [[graft.ext.TextAnalysis.portableHash60]]. */
  private def duckHash60(e: String): String =
    s"CAST(concat('0x', substr(md5($e), 1, 15)) AS BIGINT)"

  /** Shared DuckDB shingle CTE body (3-gram, normalized, distinct) —
    * identical to the q_ngram_jaccard oracle's, minus the block. */
  private val duckShingles =
    """SELECT doc_id,
      |    list_distinct(CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
      |      ELSE [array_to_string(toks[i:i+2], ' ')
      |            FOR i IN range(1, len(toks) - 1)] END) AS sh
      |  FROM (SELECT doc_id,
      |          regexp_split_to_array(
      |            regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
      |        FROM documents)""".stripMargin

  /** DuckDB replay of the 32-hash minhash signature table (ends with
    * a `sigs` CTE, columns m0..m31), shared by the dedup, cluster,
    * incremental, and skew oracles. */
  private lazy val minhashSigCtes: String = {
    val p = graft.ext.Dedup.MinhashP
    val minCols = graft.ext.Dedup.minhashParams(32).zipWithIndex.map {
      case ((a, b), i) => s"min((h * $a + $b) % $p) AS m$i"
    }.mkString(",\n   ")
    s"""docs AS (
       |  $duckShingles),
       |ex AS (SELECT doc_id, ${duckHash60("s")} % $p AS h
       |       FROM (SELECT doc_id, unnest(sh) AS s FROM docs)),
       |sigs AS (SELECT doc_id,
       |   $minCols
       | FROM ex GROUP BY doc_id)""".stripMargin
  }

  /** "some band fully matches" predicate between sig aliases a/b. */
  private lazy val minhashBandConds: String =
    (0 until 8).map { b =>
      (b * 4 until (b + 1) * 4).map(i => s"a.m$i = b.m$i").mkString("(", " AND ", ")")
    }.mkString("\n     OR ")

  /** [[minhashSigCtes]] extended to band candidates → Jaccard-verified
    * pairs (threshold 0.5) — the q_minhash_dedup oracle body, reused
    * by the connected-components oracle. Ends with a
    * `pairs(id_a, id_b, jaccard)` CTE; callers append the final
    * SELECT. */
  private lazy val minhashPairsCtes: String = {
    val bandConds = minhashBandConds
    s"""$minhashSigCtes,
       |cands AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
       |  WHERE $bandConds),
       |pairs AS (SELECT c.id_a, c.id_b,
       |  round(CAST(len(list_intersect(da.sh, db.sh)) AS DOUBLE)
       |    / greatest(len(list_distinct(list_concat(da.sh, db.sh))), 1), 6)
       |    AS jaccard
       |FROM cands c
       |JOIN docs da ON c.id_a = da.doc_id
       |JOIN docs db ON c.id_b = db.doc_id
       |WHERE CAST(len(list_intersect(da.sh, db.sh)) AS DOUBLE)
       |  / greatest(len(list_distinct(list_concat(da.sh, db.sh))), 1) >= 0.5)""".stripMargin
  }

  private val contaminationSql =
    """WITH toks AS (
      |  SELECT doc_id, regexp_split_to_array(
      |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
      |  FROM documents),
      |docs AS (
      |  SELECT doc_id, list_distinct(
      |    CASE WHEN len(toks) < 13 THEN [array_to_string(toks, ' ')]
      |    ELSE [array_to_string(toks[i:i+12], ' ')
      |          FOR i IN range(1, len(toks) - 11)] END) AS sh
      |  FROM toks),
      |traing AS (SELECT DISTINCT unnest(sh) AS g FROM docs
      |           WHERE doc_id % 2 = 0),
      |testg AS (SELECT doc_id, unnest(sh) AS g FROM docs
      |          WHERE doc_id % 2 = 1),
      |tot AS (SELECT doc_id, count(*) AS n_grams FROM testg
      |        GROUP BY doc_id),
      |hit AS (SELECT doc_id, count(*) AS n_hit FROM testg
      |        WHERE g IN (SELECT g FROM traing) GROUP BY doc_id)
      |SELECT t.doc_id, t.n_grams, COALESCE(h.n_hit, 0) AS n_hit,
      |       round(CAST(COALESCE(h.n_hit, 0) AS DOUBLE) / t.n_grams, 6)
      |         AS contaminated_frac
      |FROM tot t LEFT JOIN hit h USING (doc_id)""".stripMargin

  /** DuckDB replay of content-defined chunking — token hashes, h%64
    * boundaries, per-chunk polynomial fingerprints; ends with an
    * `fp(doc_id, chunk_hash, n_tokens)` CTE. ONE definition shared by
    * the q_cdc_chunks and q_dup_chunks_cdc oracles, mirroring the one
    * `TextAnalysis.cdcChunks` both queries call. */
  private lazy val cdcFpCtes: String =
    s"""toks AS (
       |  SELECT doc_id, regexp_split_to_array(
       |    regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS t
       |  FROM documents),
       |flat AS (SELECT doc_id,
       |    unnest(range(1, len(t) + 1)) AS pos,
       |    unnest(list_transform(t, s -> ${duckHash60("s")} % 1000003)) AS h
       |  FROM toks),
       |chunked AS (SELECT doc_id, pos, h,
       |    COALESCE(sum(CASE WHEN h % 64 = 0 THEN 1 ELSE 0 END) OVER
       |      (PARTITION BY doc_id ORDER BY pos
       |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk
       |  FROM flat),
       |fp AS (SELECT doc_id,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list(h ORDER BY pos)),
       |      (a, b) -> (a * 31 + b) % 2147483647) AS chunk_hash,
       |    count(*) AS n_tokens
       |  FROM chunked GROUP BY doc_id, chunk)""".stripMargin

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
        |       CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
        |       CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
        |       count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q3_join" ->
      """SELECT l_orderkey,
        |       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
        |         AS revenue_cents
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY l_orderkey""".stripMargin,

    "q_map_rekey" ->
      """SELECT CAST(c_custkey % 50 AS VARCHAR) AS id,
        |       c_custkey AS src_key, c_name AS name
        |FROM (SELECT *, row_number() OVER
        |        (PARTITION BY c_custkey % 50 ORDER BY c_custkey DESC) AS rn
        |      FROM customer) WHERE rn = 1""".stripMargin,

    "q_processor" ->
      """SELECT CAST(o_orderkey AS VARCHAR) AS id, o_totalprice AS total,
        |       substring(o_orderpriority, 1, 1) AS priority_class
        |FROM orders WHERE o_totalprice > 150000""".stripMargin,

    "q_changeset_node" ->
      s"""WITH source AS ($syncSourceSql), local AS (
         |  SELECT CAST(o_orderkey AS VARCHAR) AS id,
         |         CAST(epoch(o_orderdate) AS BIGINT)
         |           + CASE WHEN o_orderkey % 3 = 0 THEN -86400 ELSE 0 END AS version,
         |         (o_orderkey % 13 = 0) AS hidden
         |  FROM orders WHERE o_orderkey % 7 <> 0)
         |SELECT s.id AS id, 'add' AS change_type
         |  FROM source s LEFT JOIN local l USING (id) WHERE l.id IS NULL
         |UNION ALL
         |SELECT s.id, 'update' FROM source s JOIN local l USING (id)
         |  WHERE s.version > l.version
         |UNION ALL
         |SELECT l.id, 'remove' FROM local l LEFT JOIN source s USING (id)
         |  WHERE s.id IS NULL AND NOT l.hidden""".stripMargin,

    "q_variants_fanout" ->
      """SELECT CAST(c_custkey AS VARCHAR) || '-' || dim AS variant_id,
        |       CAST(c_custkey AS VARCHAR) AS id, dim, upper(c_name) AS name
        |FROM customer CROSS JOIN (SELECT unnest(['de','en','fr']) AS dim)""".stripMargin,

    "q_narrow_scan" ->
      """SELECT CAST(o_orderkey AS VARCHAR) AS id,
        |       CAST(epoch(o_orderdate) AS BIGINT) AS version
        |FROM orders""".stripMargin,

    "q_semijoin" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,

    "q_json" ->
      """SELECT event_id,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events""".stripMargin,

    "q_datetime" ->
      """SELECT CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) AS day_epoch,
        |       count(*) AS cnt,
        |       CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM events GROUP BY 1""".stripMargin,

    "q_window" ->
      """SELECT event_id, user_id,
        |       CAST(row_number() OVER
        |         (PARTITION BY user_id ORDER BY ts, event_id) AS INTEGER) AS rn,
        |       CAST(sum(CAST(floor(value * 100) AS BIGINT)) OVER
        |         (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_cents
        |FROM events""".stripMargin,

    "q_setops" ->
      """WITH p AS (SELECT user_id,
        |    CAST(floor(CAST(floor(epoch(ts)) AS BIGINT) / 86400) AS BIGINT)
        |      AS day_no
        |  FROM events WHERE event_type = 'purchase'),
        |v AS (SELECT user_id,
        |    CAST(floor(CAST(floor(epoch(ts)) AS BIGINT) / 86400) AS BIGINT)
        |      AS day_no
        |  FROM events WHERE event_type = 'view')
        |SELECT 'both' AS op, user_id, day_no FROM
        |  (SELECT * FROM p INTERSECT SELECT * FROM v)
        |UNION ALL
        |SELECT 'view_only' AS op, user_id, day_no FROM
        |  (SELECT * FROM v EXCEPT SELECT * FROM p)""".stripMargin,

    // RANGE frame on epoch micros — peers share a frame, so the
    // trailing sums are tie-order-insensitive on both engines
    "q_window_range" ->
      """SELECT event_id, user_id,
        |       CAST(sum(CAST(floor(value * 100) AS BIGINT)) OVER
        |         (PARTITION BY user_id ORDER BY epoch_us(ts)
        |          RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)
        |         AS BIGINT) AS trail7d_cents,
        |       count(*) OVER
        |         (PARTITION BY user_id ORDER BY epoch_us(ts)
        |          RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)
        |         AS n_7d
        |FROM events""".stripMargin,

    // conditional aggregation replays the explicit-value pivot; a
    // type with no rows for a user is NULL (sum over empty) on both
    // engines
    "q_pivot" ->
      """SELECT user_id,
        |  CAST(sum(CASE WHEN event_type = 'click'
        |      THEN CAST(floor(value * 100) AS BIGINT) END) AS BIGINT) AS click,
        |  CAST(sum(CASE WHEN event_type = 'error'
        |      THEN CAST(floor(value * 100) AS BIGINT) END) AS BIGINT) AS error,
        |  CAST(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(floor(value * 100) AS BIGINT) END) AS BIGINT) AS purchase,
        |  CAST(sum(CASE WHEN event_type = 'signup'
        |      THEN CAST(floor(value * 100) AS BIGINT) END) AS BIGINT) AS signup,
        |  CAST(sum(CASE WHEN event_type = 'view'
        |      THEN CAST(floor(value * 100) AS BIGINT) END) AS BIGINT) AS view
        |FROM events GROUP BY user_id""".stripMargin,

    // UNION ALL replays the melt portably (no engine UNPIVOT syntax
    // dependence)
    "q_unpivot" ->
      """WITH m AS (SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |    CAST(floor(l_quantity * 100) AS BIGINT) AS quantity,
        |    CAST(floor(l_extendedprice * 100) AS BIGINT) AS extendedprice,
        |    CAST(floor(l_discount * 100) AS BIGINT) AS discount,
        |    CAST(floor(l_tax * 100) AS BIGINT) AS tax
        |  FROM lineitem)
        |SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |       'quantity' AS measure, quantity AS cents FROM m
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |       'extendedprice', extendedprice FROM m
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |       'discount', discount FROM m
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |       'tax', tax FROM m""".stripMargin,

    "q_sessionize" ->
      """WITH x AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS us,
        |         lag(epoch_us(ts)) OVER
        |           (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events)
        |SELECT event_id, user_id,
        |       CAST(sum(CASE WHEN prev IS NULL OR us - prev > 1800000000
        |                     THEN 1 ELSE 0 END) OVER
        |         (PARTITION BY user_id ORDER BY us, event_id
        |          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
        |FROM x""".stripMargin,

    "q_rollup" ->
      """SELECT r_name, n_name, count(*) AS cnt,
        |       CAST(sum(CAST(floor(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal_cents
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)""".stripMargin,

    "q_topk" ->
      """SELECT event_id, CAST(floor(value * 100) AS BIGINT) AS value_cents
        |FROM events ORDER BY value_cents DESC, event_id LIMIT 100""".stripMargin,

    "q_topk_grouped" ->
      """SELECT event_type, event_id, value_cents,
        |       CAST(rn AS BIGINT) AS rank
        |FROM (SELECT event_type, event_id,
        |        CAST(floor(value * 100) AS BIGINT) AS value_cents,
        |        row_number() OVER (PARTITION BY event_type
        |          ORDER BY floor(value * 100) DESC, event_id) AS rn
        |      FROM events)
        |WHERE rn <= 5""".stripMargin,

    "q_distinct" -> "SELECT DISTINCT event_type FROM events",

    "q_cube" ->
      """SELECT event_type, strftime(ts, '%Y-%m') AS month, count(*) AS cnt
        |FROM events GROUP BY CUBE (event_type, month)""".stripMargin,

    "q5_join" ->
      """SELECT n_name,
        |       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100)
        |         AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name""".stripMargin,

    "q_antijoin" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,

    "q_range_join" ->
      """WITH iv AS (
        |  SELECT user_id AS iv_user,
        |         CAST(floor(epoch(min(ts))) AS BIGINT) AS start_s
        |  FROM events WHERE user_id % 50 = 0 GROUP BY user_id),
        |pts AS (SELECT event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
        |        FROM events)
        |SELECT p.event_id, i.iv_user, p.ts_s
        |FROM pts p JOIN iv i
        |  ON p.ts_s >= i.start_s AND p.ts_s <= i.start_s + 21600""".stripMargin,

    "q_asof" ->
      """SELECT event_id, user_id,
        |       last_value(CASE WHEN event_type = 'click' THEN event_id END
        |                  IGNORE NULLS)
        |         OVER (PARTITION BY user_id ORDER BY ts, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |         AS prev_click_id
        |FROM events""".stripMargin,

    "q_percentile" ->
      """SELECT event_type,
        |       CAST(floor(quantile_cont(value, 0.5) * 1000000) AS BIGINT)
        |         AS p50_micro,
        |       CAST(floor(quantile_cont(value, 0.95) * 1000000) AS BIGINT)
        |         AS p95_micro
        |FROM events GROUP BY event_type""".stripMargin,

    // replay of the GK-sketch contract (see the query's comment): at
    // gate group sizes the sketch keeps every sample and query(p)
    // returns the element at rank ceil(p·n) — an exact rank selection
    // here. The selected value is a RAW data double (no arithmetic),
    // so floor-micro is 1-ulp-safe.
    "q_percentile_approx" ->
      """WITH r AS (
        |  SELECT event_type, value,
        |         row_number() OVER (PARTITION BY event_type ORDER BY value)
        |           AS rnk,
        |         count(*) OVER (PARTITION BY event_type) AS n
        |  FROM events)
        |SELECT event_type,
        |  CAST(floor(max(CASE WHEN rnk = CAST(ceil(0.5 * n) AS BIGINT)
        |      THEN value END) * 1000000) AS BIGINT) AS p50_micro,
        |  CAST(floor(max(CASE WHEN rnk = CAST(ceil(0.95 * n) AS BIGINT)
        |      THEN value END) * 1000000) AS BIGINT) AS p95_micro
        |FROM r GROUP BY event_type""".stripMargin,

    "q_salted_join" ->
      """WITH users AS (
        |  SELECT user_id, count(*) AS user_events FROM events GROUP BY user_id)
        |SELECT e.user_id, u.user_events, count(*) AS n
        |FROM events e JOIN users u ON e.user_id = u.user_id
        |GROUP BY e.user_id, u.user_events""".stripMargin,

    // the fixed-order Jelinek-Mercer interpolation over exact counts
    "q_trigram_ppl" ->
      """WITH base AS (
        |  SELECT doc_id, regexp_split_to_array(
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS t
        |  FROM documents),
        |toks AS (SELECT doc_id, unnest(range(1, len(t) + 1)) AS pos,
        |                unnest(t) AS tok FROM base),
        |wp AS (SELECT doc_id, pos, tok,
        |         lag(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS p1,
        |         lag(tok, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS p2
        |       FROM toks),
        |uni AS (SELECT tok AS uk, count(*) AS c FROM toks GROUP BY 1),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM uni),
        |bi AS (SELECT p1 AS ba, tok AS bb, count(*) AS c
        |       FROM wp WHERE p1 IS NOT NULL GROUP BY 1, 2),
        |tri AS (SELECT p2 AS ta, p1 AS tb, tok AS tc, count(*) AS c
        |        FROM wp WHERE p2 IS NOT NULL GROUP BY 1, 2, 3),
        |s AS (SELECT doc_id,
        |        CAST(floor(-ln(
        |          CASE WHEN p1 IS NULL THEN CAST(u3.c AS DOUBLE) / tot.n
        |               WHEN p2 IS NULL THEN
        |                 0.7 * (CAST(b23.c AS DOUBLE) / u2.c)
        |                 + 0.3 * (CAST(u3.c AS DOUBLE) / tot.n)
        |               ELSE
        |                 0.6 * (CAST(tr.c AS DOUBLE) / b12.c)
        |                 + 0.3 * (CAST(b23.c AS DOUBLE) / u2.c)
        |                 + 0.1 * (CAST(u3.c AS DOUBLE) / tot.n) END
        |          ) * 1000000) AS BIGINT) AS u
        |      FROM wp
        |      JOIN uni u3 ON wp.tok = u3.uk
        |      LEFT JOIN uni u2 ON wp.p1 = u2.uk
        |      LEFT JOIN bi b23 ON wp.p1 = b23.ba AND wp.tok = b23.bb
        |      LEFT JOIN bi b12 ON wp.p2 = b12.ba AND wp.p1 = b12.bb
        |      LEFT JOIN tri tr ON wp.p2 = tr.ta AND wp.p1 = tr.tb
        |        AND wp.tok = tr.tc
        |      CROSS JOIN tot)
        |SELECT doc_id, count(*) AS n_tokens,
        |  CAST(sum(u) AS BIGINT) AS surprisal_unats,
        |  CAST(sum(u) // count(*) AS BIGINT) AS mean_unats
        |FROM s GROUP BY doc_id""".stripMargin,

    // the plain join — certifying the bloom-prefiltered path is exact
    "q_bloom_join" ->
      """SELECT l_returnflag, count(*) AS n,
        |       CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT))
        |         AS BIGINT) AS revenue_cents
        |FROM lineitem l
        |WHERE l_orderkey IN (
        |  SELECT o_orderkey FROM orders WHERE o_totalprice > 490000)
        |GROUP BY l_returnflag""".stripMargin,

    // exact cardinality + the contract bit the sketch must honor
    "q_approx_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_exact,
        |       TRUE AS approx_ok
        |FROM events GROUP BY event_type""".stripMargin,

    // the plain aggregate the salted two-phase split must equal
    "q_salted_agg" ->
      """SELECT user_id, count(*) AS n,
        |       CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
        |         AS cents
        |FROM events GROUP BY user_id""".stripMargin,

    // the naive total-order rank the distributed recipe must equal
    "q_global_rank" ->
      """WITH r AS (
        |  SELECT event_id, epoch_us(ts) AS us,
        |         row_number() OVER (ORDER BY epoch_us(ts), event_id)
        |           AS rank
        |  FROM events)
        |SELECT event_id, us, CAST(rank AS BIGINT) AS rank
        |FROM r WHERE rank % 97 = 0""".stripMargin,

    // exact rank-k frequencies — what the sized-above-cardinality
    // sketch must reproduce
    "q_approx_topk" ->
      """WITH uc AS (
        |  SELECT event_type, user_id, count(*) AS c
        |  FROM events GROUP BY event_type, user_id),
        |r AS (SELECT event_type, c,
        |        row_number() OVER (PARTITION BY event_type
        |          ORDER BY c DESC) AS rank
        |      FROM uc)
        |SELECT event_type, CAST(rank AS INTEGER) AS rank, c AS n
        |FROM r WHERE rank <= 5""".stripMargin,

    // three chained conditional mins replay the strict-order funnel
    "q_funnel" ->
      """WITH s1 AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS us,
        |    min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END)
        |      OVER (PARTITION BY user_id) AS t1
        |  FROM events),
        |s2 AS (
        |  SELECT *, min(CASE WHEN event_type = 'click' AND us > t1
        |      THEN us END) OVER (PARTITION BY user_id) AS t2
        |  FROM s1),
        |s3 AS (
        |  SELECT *, min(CASE WHEN event_type = 'purchase' AND us > t2
        |      THEN us END) OVER (PARTITION BY user_id) AS t3
        |  FROM s2)
        |SELECT user_id, min(t1) AS t1_us, min(t2) AS t2_us,
        |       min(t3) AS t3_us,
        |       CASE WHEN min(t3) IS NOT NULL THEN 3
        |            WHEN min(t2) IS NOT NULL THEN 2
        |            WHEN min(t1) IS NOT NULL THEN 1 ELSE 0 END AS depth
        |FROM s3 GROUP BY user_id""".stripMargin,

    // integer-week retention triangle from epoch micros
    "q_cohort" ->
      """WITH ev AS (SELECT user_id, epoch_us(ts) AS us FROM events),
        |t0 AS (SELECT min(us) AS t0 FROM ev),
        |f AS (SELECT user_id, us,
        |        min(us) OVER (PARTITION BY user_id) AS first_us
        |      FROM ev)
        |SELECT (first_us - t0.t0) // 604800000000 AS cohort_week,
        |       (us - t0.t0) // 604800000000
        |         - (first_us - t0.t0) // 604800000000 AS week_offset,
        |       count(DISTINCT user_id) AS n_users
        |FROM f, t0 GROUP BY 1, 2""".stripMargin,

    // the staged-JSON round trip must agree with the parquet table
    "q_source_json" ->
      """SELECT event_type, count(*) AS n,
        |       CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
        |         AS cents,
        |       min(event_id) AS min_id, max(event_id) AS max_id
        |FROM events WHERE event_id % 7 = 0
        |GROUP BY event_type""".stripMargin,

    // the staged-CSV round trip must agree with the parquet table
    "q_source_csv" ->
      """SELECT event_type, count(*) AS n,
        |       CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
        |         AS cents,
        |       min(event_id) AS min_id, max(event_id) AS max_id
        |FROM events WHERE event_id % 5 = 0
        |GROUP BY event_type""".stripMargin,

    "q_dedup_exact" ->
      """SELECT doc_id, fingerprint FROM (
        |  SELECT doc_id, fingerprint,
        |         row_number() OVER (PARTITION BY fingerprint ORDER BY doc_id) AS rn
        |  FROM (SELECT doc_id,
        |          md5(array_to_string(
        |            regexp_split_to_array(lower(trim(text)), '\s+')[1:5], ' '))
        |            AS fingerprint
        |        FROM documents)) WHERE rn = 1""".stripMargin,

    "q_chunk_dedup" ->
      s"""WITH toks AS (
         |  SELECT doc_id, regexp_split_to_array(
         |    regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS t
         |  FROM documents),
         |ch AS (
         |  SELECT doc_id,
         |    unnest(list_transform(
         |      range(0, CAST(ceil(len(t) / 32.0) AS INT)),
         |      i -> list_reduce(list_prepend(CAST(0 AS BIGINT),
         |             list_transform(t[i*32+1 : (i+1)*32],
         |               s -> ${duckHash60("s")} % 1000003)),
         |           (a, b) -> (a * 31 + b) % 2147483647))) AS chunk_hash
         |  FROM toks)
         |SELECT chunk_hash, count(DISTINCT doc_id) AS n_docs,
         |       min(doc_id) AS min_doc, max(doc_id) AS max_doc
         |FROM ch GROUP BY chunk_hash HAVING count(DISTINCT doc_id) > 1""".stripMargin,

    "q_dup_chunks_cdc" ->
      s"""WITH $cdcFpCtes,
         |f AS (SELECT * FROM fp WHERE n_tokens >= 8),
         |freq AS (SELECT chunk_hash AS fch, count(DISTINCT doc_id) AS n_docs
         |         FROM f GROUP BY chunk_hash)
         |SELECT doc_id,
         |       CAST(sum(n_tokens) AS BIGINT) AS n_tokens_considered,
         |       CAST(sum(CASE WHEN n_docs >= 2 THEN n_tokens ELSE 0 END)
         |         AS BIGINT) AS n_dup_tokens,
         |       round(CAST(sum(CASE WHEN n_docs >= 2 THEN n_tokens ELSE 0 END)
         |         AS DOUBLE) / sum(n_tokens), 6) AS dup_token_frac
         |FROM f JOIN freq ON f.chunk_hash = freq.fch
         |GROUP BY doc_id""".stripMargin,

    "q_winnow_dup" ->
      s"""WITH toks AS (
         |  SELECT doc_id, regexp_split_to_array(
         |    regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS t
         |  FROM documents),
         |grams AS (
         |  SELECT doc_id,
         |    unnest(range(1, greatest(len(t) - 8 + 1, 0) + 1)) AS pos,
         |    unnest(CASE WHEN len(t) >= 8 THEN
         |      [${duckHash60("array_to_string(t[i:i+7], ' ')")} % 1000003
         |       FOR i IN range(1, len(t) - 6)]
         |      ELSE [] END) AS h
         |  FROM toks),
         |wins AS (
         |  SELECT doc_id,
         |    min(h) OVER (PARTITION BY doc_id ORDER BY pos
         |                 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS fp,
         |    pos
         |  FROM grams),
         |fps AS (SELECT DISTINCT doc_id, fp FROM wins WHERE pos >= 4)
         |SELECT fp, count(*) AS n_docs,
         |       min(doc_id) AS min_doc, max(doc_id) AS max_doc
         |FROM fps GROUP BY fp HAVING count(*) > 1""".stripMargin,

    "q_cdc_chunks" ->
      s"""WITH $cdcFpCtes
         |SELECT chunk_hash, count(DISTINCT doc_id) AS n_docs,
         |       count(*) AS n_occurrences
         |FROM fp WHERE n_tokens >= 8
         |GROUP BY chunk_hash HAVING count(DISTINCT doc_id) > 1""".stripMargin,

    "q_sample_stratified" ->
      s"""SELECT event_id, event_type, user_id FROM events
         |WHERE ${duckHash60("CAST(event_id AS VARCHAR)")} % 1000000
         |  < CASE event_type WHEN 'view' THEN 100000
         |                    WHEN 'click' THEN 500000
         |                    ELSE 1000000 END""".stripMargin,

    // portable-hash rank within stratum, first k — replayed exactly
    "q_sample_exact_k" ->
      s"""WITH r AS (
         |  SELECT event_id, event_type, user_id,
         |         row_number() OVER (PARTITION BY event_type
         |           ORDER BY ${duckHash60("CAST(event_id AS VARCHAR)")},
         |             event_id) AS rk
         |  FROM events)
         |SELECT event_id, event_type, user_id FROM r
         |WHERE rk <= 20""".stripMargin,

    // the 90/5/5 hash-cell assignment, aggregated per split
    "q_split" ->
      s"""WITH a AS (
         |  SELECT doc_id,
         |    CASE WHEN ${duckHash60("CAST(doc_id AS VARCHAR)")} % 100 < 90
         |           THEN 'train'
         |         WHEN ${duckHash60("CAST(doc_id AS VARCHAR)")} % 100 < 95
         |           THEN 'val'
         |         ELSE 'test' END AS split
         |  FROM documents)
         |SELECT split, count(*) AS n, min(doc_id) AS min_id,
         |       max(doc_id) AS max_id
         |FROM a GROUP BY split""".stripMargin,

    "q_text_analysis" -> duckTextAnalysis,

    // same wrapper, same regex chain, same order (script/style →
    // comments → tags → entities with &amp; last → collapse) —
    // cleaned text replayed byte-for-byte
    "q_html_strip" ->
      """WITH w AS (SELECT doc_id,
        |  '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) ||
        |  '</title><script type="text/javascript">var n=2;' || chr(10) ||
        |  'track();</script><style>.c{margin:0}</style></head><body><!-- hdr -->' ||
        |  '<p class="b">' || coalesce(text, '') ||
        |  '</p><div>Tom &amp; Jerry &lt;3 &quot;q&quot;&#39;s&nbsp;end</div></body></html>'
        |    AS raw
        |  FROM documents),
        |s AS (SELECT doc_id, raw, regexp_replace(regexp_replace(raw,
        |         '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
        |         '(?is)<style[^>]*>.*?</style>', ' ', 'g') AS t1
        |      FROM w),
        |t AS (SELECT doc_id, raw, regexp_replace(regexp_replace(t1,
        |         '(?s)<!--.*?-->', ' ', 'g'), '(?s)<[^>]+>', ' ', 'g') AS t2
        |      FROM s),
        |d AS (SELECT doc_id, raw,
        |        replace(replace(replace(replace(replace(replace(t2,
        |          '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
        |          '&#39;', ''''), '&nbsp;', ' '), '&amp;', '&') AS t3
        |      FROM t)
        |SELECT doc_id,
        |  trim(regexp_replace(t3, '[ \t]+', ' ', 'g')) AS clean_text,
        |  CAST(len(regexp_extract_all(raw, '(?s)<[^>]+>')) AS BIGINT)
        |    AS n_tags,
        |  CAST(len(regexp_extract_all(raw, '&(amp|lt|gt|quot|nbsp|#39);'))
        |    AS BIGINT) AS n_entities
        |FROM d""".stripMargin,

    // the same first-(doc,position)-occurrence rule: grouped min of
    // the packed occurrence key per non-blank line, blank lines pass
    // through; 1-based list indexes vs Spark's 0-based positions are
    // a uniform shift, so the min picks the same occurrence
    "q_line_dedup" ->
      """WITH e AS (SELECT doc_id,
        |        unnest(list_transform(
        |          string_split(coalesce(text, ''), chr(10)),
        |          (x, i) -> {'ln': i, 'line': x})) AS s
        |      FROM documents),
        |l AS (SELECT doc_id, s.ln AS ln, s.line AS line FROM e),
        |f AS (SELECT line, min(doc_id * 1000000 + ln) AS first_key
        |      FROM l WHERE length(trim(line)) > 0 GROUP BY line),
        |k AS (SELECT l.doc_id, l.ln, l.line,
        |             (length(trim(l.line)) = 0
        |              OR l.doc_id * 1000000 + l.ln = f.first_key) AS keep
        |      FROM l LEFT JOIN f ON l.line = f.line)
        |SELECT doc_id,
        |       count(*) AS n_lines,
        |       CAST(count(*) FILTER (WHERE NOT keep) AS BIGINT)
        |         AS n_removed,
        |       coalesce(string_agg(line, chr(10) ORDER BY ln)
        |         FILTER (WHERE keep), '') AS cleaned
        |FROM k GROUP BY doc_id""".stripMargin,

    "q_pii_scrub" ->
      s"""WITH p AS (
         |  SELECT doc_id,
         |         text || ' contact user' || CAST(doc_id AS VARCHAR)
         |           || '@example.com or +1 (555) 010-'
         |           || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
         |           || ' at 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.1'
         |           AS text
         |  FROM documents),
         |s1 AS (SELECT doc_id,
         |         CAST(len(regexp_extract_all(text, '${TextAnalysis.EmailRe}'))
         |           AS BIGINT) AS n_emails,
         |         regexp_replace(text, '${TextAnalysis.EmailRe}', '<EMAIL>', 'g')
         |           AS t1
         |       FROM p),
         |s2 AS (SELECT doc_id, n_emails,
         |         CAST(len(regexp_extract_all(t1, '${TextAnalysis.Ipv4Re}'))
         |           AS BIGINT) AS n_ips,
         |         regexp_replace(t1, '${TextAnalysis.Ipv4Re}', '<IP>', 'g') AS t2
         |       FROM s1)
         |SELECT doc_id,
         |       regexp_replace(t2, '${TextAnalysis.PhoneRe}', '<PHONE>', 'g')
         |         AS scrubbed,
         |       n_emails, n_ips,
         |       CAST(len(regexp_extract_all(t2, '${TextAnalysis.PhoneRe}'))
         |         AS BIGINT) AS n_phones
         |FROM s2""".stripMargin,

    "q_unigram_ppl" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS t
        |  FROM documents),
        |flat AS (SELECT doc_id, unnest(t) AS tok FROM toks),
        |freq AS (SELECT tok, count(*) AS c FROM flat GROUP BY tok),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM freq),
        |s AS (SELECT doc_id,
        |        CAST(floor(-ln(CAST(c AS DOUBLE) / total) * 1000000)
        |          AS BIGINT) AS u
        |      FROM flat JOIN freq USING (tok) CROSS JOIN tot)
        |SELECT doc_id, count(*) AS n_tokens,
        |       CAST(sum(u) AS BIGINT) AS surprisal_unats,
        |       CAST(sum(u) // count(*) AS BIGINT) AS mean_unats
        |FROM s GROUP BY doc_id""".stripMargin,

    "q_bigram_ppl" ->
      """WITH base AS (
        |  SELECT doc_id, regexp_split_to_array(
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS t
        |  FROM documents),
        |toks AS (SELECT doc_id, unnest(range(1, len(t) + 1)) AS pos,
        |                unnest(t) AS tok FROM base),
        |wp AS (SELECT doc_id, pos, tok,
        |         lag(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
        |       FROM toks),
        |uni AS (SELECT tok AS u_tok, count(*) AS cu FROM toks GROUP BY 1),
        |v AS (SELECT CAST(count(*) AS BIGINT) AS vn FROM uni),
        |tot AS (SELECT CAST(sum(cu) AS BIGINT) AS total FROM uni),
        |bi AS (SELECT prev AS b_prev, tok AS b_tok, count(*) AS cb
        |       FROM wp WHERE prev IS NOT NULL GROUP BY 1, 2),
        |s AS (SELECT doc_id,
        |        CAST(CASE WHEN prev IS NULL THEN
        |          floor(-ln(CAST(cu AS DOUBLE) / total) * 1000000)
        |        ELSE
        |          floor(-ln(CAST(coalesce(cb, 0) + 1 AS DOUBLE)
        |            / (cu + vn)) * 1000000) END AS BIGINT) AS u
        |      FROM wp
        |      JOIN uni ON coalesce(prev, wp.tok) = u_tok
        |      LEFT JOIN bi ON prev = b_prev AND wp.tok = b_tok
        |      CROSS JOIN tot CROSS JOIN v)
        |SELECT doc_id, count(*) AS n_tokens,
        |  CAST(sum(u) AS BIGINT) AS surprisal_unats,
        |  CAST(sum(u) // count(*) AS BIGINT) AS mean_unats
        |FROM s GROUP BY doc_id""".stripMargin,

    "q_mix_domains" -> {
      val hash = duckHash60("CAST(event_id AS VARCHAR)")
      s"""WITH c AS (SELECT event_type AS d, count(*) AS cd FROM events
         |           GROUP BY 1),
         |w AS (SELECT * FROM (VALUES ('view', 1), ('click', 3),
         |                            ('purchase', 6)) AS t(d, wt)),
         |b AS (SELECT min(cd // wt) AS bu FROM c JOIN w USING (d)),
         |th AS (SELECT d, (wt * bu * 1000000) // cd AS thr
         |       FROM c JOIN w USING (d) CROSS JOIN b)
         |SELECT event_id, event_type, user_id
         |FROM events JOIN th ON event_type = th.d
         |WHERE $hash % 1000000 < thr""".stripMargin
    },

    "q_mix_temperature" -> {
      val hash = duckHash60("CAST(event_id AS VARCHAR)")
      val milli = graft.ext.Assemble.temperatureMilliWeights(
        Map("view" -> 1L, "click" -> 3L, "purchase" -> 6L), 2.0, 50L)
      val values = Seq("view", "click", "purchase")
        .map(d => s"('$d', ${milli(d)})").mkString(", ")
      s"""WITH c AS (SELECT event_type AS d, count(*) AS cd FROM events
         |           GROUP BY 1),
         |w AS (SELECT * FROM (VALUES $values) AS t(d, wt)),
         |b AS (SELECT min(cd // wt) AS bu FROM c JOIN w USING (d)),
         |th AS (SELECT d, (wt * bu * 1000000) // cd AS thr
         |       FROM c JOIN w USING (d) CROSS JOIN b)
         |SELECT event_id, event_type, user_id
         |FROM events JOIN th ON event_type = th.d
         |WHERE $hash % 1000000 < thr""".stripMargin
    },

    "q_seq_pack" -> {
      val hash = duckHash60("CAST(doc_id AS VARCHAR)")
      s"""WITH base AS (
         |  SELECT doc_id,
         |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
         |         ELSE len(regexp_split_to_array(trim(text), '\\s+')) END
         |      AS BIGINT) AS n_tokens,
         |    $hash % 8 AS shard
         |  FROM documents),
         |o AS (SELECT doc_id, shard, n_tokens,
         |        sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
         |          ROWS UNBOUNDED PRECEDING) - n_tokens AS tok_offset
         |      FROM base)
         |SELECT doc_id, shard, n_tokens,
         |       CAST(tok_offset AS BIGINT) AS tok_offset,
         |       CAST(tok_offset // 512 AS BIGINT) AS seq_id
         |FROM o""".stripMargin
    },

    "q_vocab" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS t
        |  FROM documents),
        |flat AS (SELECT doc_id, unnest(t) AS tok FROM toks)
        |SELECT tok, count(*) AS n_total,
        |       count(DISTINCT doc_id) AS n_docs
        |FROM flat GROUP BY tok HAVING count(*) >= 5""".stripMargin,

    // bigrams from 1-based array adjacency; exact integer counts into
    // one ln, truncated to micro-nats; total-order top-50
    "q_pmi" ->
      """WITH toks AS (
        |  SELECT regexp_split_to_array(
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS t
        |  FROM documents),
        |uni AS (SELECT unnest(t) AS tok FROM toks),
        |uc AS (SELECT tok, count(*) AS c FROM uni GROUP BY tok),
        |n AS (SELECT count(*) AS n FROM uni),
        |bi AS (
        |  SELECT t[i] || ' ' || t[i + 1] AS bigram
        |  FROM (SELECT t, unnest(generate_series(1, len(t) - 1)) AS i
        |        FROM toks)),
        |bc AS (SELECT bigram, count(*) AS c_ab FROM bi
        |       GROUP BY bigram HAVING count(*) >= 5),
        |j AS (
        |  SELECT bc.bigram, bc.c_ab, a.c AS c_a, b.c AS c_b,
        |         CAST(floor(ln(CAST(bc.c_ab * n.n AS DOUBLE)
        |             / (a.c * b.c)) * 1000000) AS BIGINT) AS pmi_micro
        |  FROM bc, n,
        |       uc a, uc b
        |  WHERE a.tok = split_part(bc.bigram, ' ', 1)
        |    AND b.tok = split_part(bc.bigram, ' ', 2))
        |SELECT bigram, c_ab, c_a, c_b, pmi_micro
        |FROM j ORDER BY pmi_micro DESC, bigram LIMIT 50""".stripMargin,

    // ln on an exact integer ratio, truncated once to micro-nats —
    // the same double-discipline as q_unigram_ppl; everything after
    // is LONG arithmetic and a total-order rank
    "q_tfidf" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS tok
        |  FROM documents),
        |tf AS (
        |  SELECT doc_id, tok, count(*) AS tf FROM toks
        |  WHERE tok <> '' GROUP BY doc_id, tok),
        |dfreq AS (
        |  SELECT tok, count(*) AS n_docs,
        |         CAST(floor(ln(CAST((SELECT count(*) FROM documents)
        |             AS DOUBLE) / count(*)) * 1000000) AS BIGINT)
        |           AS idf_micro
        |  FROM tf GROUP BY tok),
        |ranked AS (
        |  SELECT tf.doc_id, tf.tok, tf.tf, d.idf_micro,
        |         tf.tf * d.idf_micro AS score_micro,
        |         row_number() OVER (PARTITION BY tf.doc_id
        |           ORDER BY tf.tf * d.idf_micro DESC, tf.tok) AS rnk
        |  FROM tf JOIN dfreq d ON tf.tok = d.tok)
        |SELECT doc_id, tok, tf, idf_micro, score_micro,
        |       CAST(rnk AS INTEGER) AS rank
        |FROM ranked WHERE rnk <= 3""".stripMargin,

    "q_embed_quantize" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |s AS (SELECT vec_id, v,
        |        greatest(list_max(list_transform(v, x -> abs(x))), 1e-30)
        |          AS scale
        |      FROM e)
        |SELECT vec_id, CAST(floor(scale * 1000000) AS BIGINT) AS scale_micro,
        |       CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
        |         list_transform(v, x -> CAST(greatest(least(
        |           floor(x * 127 / scale), 127), -127)
        |           AS BIGINT))), (a, b) -> a + b) AS BIGINT) AS q_sum,
        |       CAST(len(v) AS BIGINT) AS n_dims
        |FROM s""".stripMargin,

    "q_contamination" -> contaminationSql,

    // bloom prefilter is exact by construction — the oracle IS the
    // plain contamination query; a green row certifies that
    "q_contamination_bloom" -> contaminationSql,

    "q_quality_repetition" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS t
        |  FROM documents),
        |flat AS (SELECT doc_id, unnest(range(1, len(t) + 1)) AS pos,
        |                unnest(t) AS tok FROM toks),
        |tokc AS (SELECT doc_id, tok, count(*) AS c FROM flat
        |         GROUP BY doc_id, tok),
        |tt AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
        |              count(*) AS n_distinct, max(c) AS top_tok_n
        |       FROM tokc GROUP BY doc_id),
        |gr AS (SELECT doc_id, tok || ' ' ||
        |         lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS g
        |       FROM flat),
        |gc AS (SELECT doc_id, max(c) AS top_2gram_n FROM
        |        (SELECT doc_id, g, count(*) AS c FROM gr
        |         WHERE g IS NOT NULL GROUP BY doc_id, g)
        |       GROUP BY doc_id),
        |rn AS (SELECT doc_id, pos, tok,
        |         CASE WHEN lag(tok) OVER (PARTITION BY doc_id ORDER BY pos)
        |                IS NULL
        |              OR lag(tok) OVER (PARTITION BY doc_id ORDER BY pos)
        |                <> tok
        |              THEN 1 ELSE 0 END AS chg
        |       FROM flat),
        |sg AS (SELECT doc_id, sum(chg) OVER (PARTITION BY doc_id ORDER BY pos
        |          ROWS UNBOUNDED PRECEDING) AS seg FROM rn),
        |rs AS (SELECT doc_id, max(c) AS max_run FROM
        |        (SELECT doc_id, seg, count(*) AS c FROM sg
        |         GROUP BY doc_id, seg)
        |       GROUP BY doc_id)
        |SELECT t.doc_id, t.n_tokens, t.n_distinct, t.top_tok_n,
        |       COALESCE(g.top_2gram_n, 0) AS top_2gram_n, r.max_run,
        |       round(1.0 - CAST(t.n_distinct AS DOUBLE) / t.n_tokens, 6)
        |         AS dup_tok_frac
        |FROM tt t LEFT JOIN gc g USING (doc_id)
        |LEFT JOIN rs r USING (doc_id)""".stripMargin,

    "q_encoding" ->
      """WITH d AS (
        |  SELECT doc_id, text ||
        |    CASE WHEN doc_id % 7 = 0 THEN '�' ELSE '' END ||
        |    CASE WHEN doc_id % 5 = 0 THEN chr(7) ELSE '' END AS text
        |  FROM documents)
        |SELECT doc_id, CAST(length(text) AS INTEGER) AS n_chars,
        |  CAST(len(regexp_extract_all(text, '�')) AS BIGINT)
        |    AS n_replacement,
        |  CAST(len(regexp_extract_all(text,
        |    '[\x00-\x08\x0B\x0C\x0E-\x1F]')) AS BIGINT) AS n_control,
        |  CAST(CASE WHEN len(regexp_extract_all(text, '�')) = 0
        |    AND len(regexp_extract_all(text,
        |      '[\x00-\x08\x0B\x0C\x0E-\x1F]')) * 100 <= length(text)
        |    THEN 1 ELSE 0 END AS BIGINT) AS enc_clean
        |FROM d""".stripMargin,

    "q_char_entropy" ->
      """WITH chars AS (
        |  SELECT doc_id, substr(text, CAST(i AS INTEGER), 1) AS c
        |  FROM (SELECT doc_id, text,
        |          unnest(range(1, length(text) + 1)) AS i
        |        FROM documents)),
        |counts AS (SELECT doc_id, c, count(*) AS n_c FROM chars
        |           GROUP BY doc_id, c),
        |pd AS (SELECT doc_id, CAST(sum(n_c) AS BIGINT) AS n_chars,
        |              count(*) AS n_distinct
        |       FROM counts GROUP BY doc_id),
        |h AS (SELECT doc_id, n_chars, n_distinct,
        |        CAST(sum(n_c * CAST(floor(
        |          -ln(CAST(n_c AS DOUBLE) / n_chars) * 1000000)
        |          AS BIGINT)) AS BIGINT) AS h_sum
        |      FROM counts JOIN pd USING (doc_id)
        |      GROUP BY doc_id, n_chars, n_distinct)
        |SELECT doc_id, n_chars, n_distinct,
        |  CAST(h_sum // n_chars AS BIGINT) AS entropy_unats
        |FROM h""".stripMargin,

    "q_c4_lines" ->
      """WITH base AS (
        |  SELECT doc_id, string_split(text, chr(10)) AS ls FROM documents),
        |k AS (
        |  SELECT doc_id, ls,
        |    list_filter(ls, l ->
        |      substr(rtrim(l), -1, 1) IN ('.', '!', '?', '"')
        |      AND CASE WHEN length(trim(l)) = 0 THEN 0
        |          ELSE len(regexp_split_to_array(trim(l), '\s+')) END >= 5
        |      AND NOT contains(lower(l), 'javascript')
        |      AND NOT contains(l, '{')
        |      AND NOT contains(lower(l), 'lorem ipsum')) AS kept
        |  FROM base)
        |SELECT doc_id,
        |  coalesce(array_to_string(kept, chr(10)), '') AS cleaned,
        |  CAST(len(ls) AS BIGINT) AS n_lines,
        |  CAST(len(kept) AS BIGINT) AS n_kept,
        |  CAST(CASE WHEN len(kept) >= 1 THEN 1 ELSE 0 END AS BIGINT)
        |    AS c4_keep
        |FROM k""".stripMargin,

    "q_bpe_pairs" ->
      """WITH toks AS (
        |  SELECT unnest(regexp_split_to_array(
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS w
        |  FROM documents),
        |types AS (SELECT w, count(*) AS freq FROM toks
        |          WHERE length(w) > 0 GROUP BY w),
        |p AS (SELECT substr(w, CAST(i AS INTEGER), 2) AS pair, freq
        |      FROM (SELECT w, freq, unnest(range(1, length(w))) AS i
        |            FROM types WHERE length(w) >= 2))
        |SELECT pair, CAST(sum(freq) AS BIGINT) AS n
        |FROM p GROUP BY pair HAVING sum(freq) >= 5""".stripMargin,

    "q_oov_rate" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS tok
        |  FROM documents),
        |freq AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
        |v AS (SELECT tok FROM (
        |        SELECT tok, row_number() OVER (ORDER BY c DESC, tok) AS rn
        |        FROM freq)
        |      WHERE rn <= 100)
        |SELECT doc_id, count(*) AS n_tokens,
        |  CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_oov,
        |  CAST((sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) * 1000000)
        |    // count(*) AS BIGINT) AS oov_ppm
        |FROM toks LEFT JOIN v ON toks.tok = v.tok
        |GROUP BY doc_id""".stripMargin,

    // mean is an exact TRUNCATING integer division — Spark `div`
    // truncates toward zero; replicated sign-explicitly over
    // DuckDB's nonnegative `//`
    "q_embed_meanpool" ->
      """WITH x AS (
        |  SELECT label, CAST(i - 1 AS BIGINT) AS dim,
        |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT)
        |      AS xm
        |  FROM embeddings, LATERAL unnest(range(1, len(embedding) + 1)) t(i)),
        |a AS (SELECT label, dim, count(*) AS n_vecs,
        |        CAST(sum(xm) AS BIGINT) AS sum_micro
        |      FROM x GROUP BY label, dim)
        |SELECT label, dim, n_vecs, sum_micro,
        |  CAST(CASE WHEN sum_micro >= 0 THEN sum_micro // n_vecs
        |       ELSE -((-sum_micro) // n_vecs) END AS BIGINT) AS mean_micro
        |FROM a""".stripMargin,

    "q_gopher_rules" -> {
      val stopSum = graft.ext.TextAnalysis.GopherStops.map(w =>
        s"CASE WHEN regexp_matches(lower(text), '\\b$w\\b') THEN 1 ELSE 0 END")
        .mkString(" + ")
      s"""WITH base AS (
         |  SELECT doc_id, text,
         |    regexp_split_to_array(
         |      regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS t,
         |    string_split(text, chr(10)) AS ls
         |  FROM documents),
         |s AS (
         |  SELECT doc_id,
         |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
         |         ELSE len(regexp_split_to_array(trim(text), '\\s+')) END
         |      AS BIGINT) AS n_words,
         |    CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_transform(t, x -> CAST(length(x) AS BIGINT))),
         |      (a, b) -> a + b) AS BIGINT) AS sum_len,
         |    CAST(len(regexp_extract_all(text, '#'))
         |       + len(regexp_extract_all(text, '\\.\\.\\.')) AS BIGINT) AS n_sym,
         |    CAST(len(ls) AS BIGINT) AS n_lines,
         |    CAST(len(list_filter(ls,
         |      l -> substr(ltrim(l), 1, 1) IN ('-', '*', '•'))) AS BIGINT)
         |      AS n_bullet,
         |    CAST(len(list_filter(ls, l -> ends_with(rtrim(l), '...')))
         |      AS BIGINT) AS n_ell,
         |    CAST(len(list_filter(t, x -> regexp_matches(x, '[a-z]')))
         |      AS BIGINT) AS n_alpha,
         |    CAST($stopSum AS BIGINT) AS n_stop_kinds
         |  FROM base),
         |r AS (
         |  SELECT doc_id, n_words,
         |    round(CAST(sum_len AS DOUBLE) / greatest(n_words, 1), 6)
         |      AS mean_word_len,
         |    round(CAST(n_sym AS DOUBLE) / greatest(n_words, 1), 6)
         |      AS symbol_ratio,
         |    round(CAST(n_bullet AS DOUBLE) / n_lines, 6) AS bullet_line_frac,
         |    round(CAST(n_ell AS DOUBLE) / n_lines, 6) AS ellipsis_line_frac,
         |    round(CAST(n_alpha AS DOUBLE) / greatest(n_words, 1), 6)
         |      AS alpha_word_frac,
         |    n_stop_kinds
         |  FROM s)
         |SELECT doc_id, n_words, mean_word_len, symbol_ratio,
         |  bullet_line_frac, ellipsis_line_frac, alpha_word_frac,
         |  n_stop_kinds,
         |  CAST(CASE WHEN n_words >= 20 AND n_words <= 100000
         |    AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
         |    AND symbol_ratio <= 0.1 AND bullet_line_frac <= 0.9
         |    AND ellipsis_line_frac <= 0.3 AND alpha_word_frac >= 0.8
         |    AND n_stop_kinds >= 2 THEN 1 ELSE 0 END AS BIGINT)
         |    AS gopher_pass
         |FROM r""".stripMargin
    },

    // the Gopher repetition battery: the per-n gram CTEs are generated
    // programmatically; duplicate coverage replays the engine's
    // gaps-and-islands merge on gram STRINGS (the q_span_dedup
    // convention) and the top-gram tie-break (count desc, gram asc)
    "q_gopher_repetition" -> {
      val topNs = 2 to 4
      val dupNs = 5 to 10
      val gramCtes = (topNs ++ dupNs).map { n =>
        s"""g$n AS (
           |  SELECT doc_id, p, array_to_string(t[p : p + ${n - 1}], ' ') AS g
           |  FROM (SELECT doc_id, t, unnest(range(1, len(t) - $n + 2)) AS p
           |        FROM toks WHERE len(t) >= $n))""".stripMargin
      }
      val topCtes = topNs.map { n =>
        s"""top$n AS (
           |  SELECT doc_id, CAST(c * length(g) AS BIGINT) AS top${n}_chars
           |  FROM (SELECT doc_id, g, count(*) AS c,
           |          row_number() OVER (PARTITION BY doc_id
           |            ORDER BY count(*) DESC, g) AS rn
           |        FROM g$n GROUP BY doc_id, g)
           |  WHERE rn = 1)""".stripMargin
      }
      val dupCtes = dupNs.map { n =>
        s"""cov$n AS (
           |  SELECT i.doc_id, CAST(sum(length(array_to_string(
           |           tk.t[i.a : i.b], ' '))) AS BIGINT) AS dup${n}_chars
           |  FROM (SELECT doc_id, island, min(p) AS a, max(p) + ${n - 1} AS b
           |        FROM (SELECT doc_id, p, sum(brk) OVER
           |                (PARTITION BY doc_id ORDER BY p) AS island
           |              FROM (SELECT doc_id, p,
           |                      CASE WHEN p - lag(p) OVER
           |                          (PARTITION BY doc_id ORDER BY p)
           |                        > ${n - 1} THEN 1 ELSE 0 END AS brk
           |                    FROM (SELECT doc_id, p FROM
           |                      (SELECT doc_id, p, count(*) OVER
           |                         (PARTITION BY doc_id, g) AS c FROM g$n)
           |                      WHERE c >= 2)))
           |        GROUP BY doc_id, island) i
           |  JOIN toks tk ON tk.doc_id = i.doc_id
           |  GROUP BY i.doc_id)""".stripMargin
      }
      val topSel = topNs.map(n =>
        s"CAST((coalesce(top${n}_chars, 0) * 1000000) // " +
          s"greatest(coalesce(total_chars, 0), 1) AS BIGINT) " +
          s"AS top${n}_char_ppm")
      val dupSel = dupNs.map(n =>
        s"CAST((coalesce(dup${n}_chars, 0) * 1000000) // " +
          s"greatest(coalesce(total_chars, 0), 1) AS BIGINT) " +
          s"AS dup${n}_char_ppm")
      val joins = (topNs.map(n => s"LEFT JOIN top$n USING (doc_id)") ++
        dupNs.map(n => s"LEFT JOIN cov$n USING (doc_id)"))
        .mkString("\n")
      s"""WITH toks AS (
         |  SELECT doc_id, regexp_split_to_array(
         |    regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS t
         |  FROM documents),
         |base AS (
         |  SELECT doc_id,
         |    CAST(length(array_to_string(t, ' ')) AS BIGINT) AS total_chars
         |  FROM toks),
         |${(gramCtes ++ topCtes ++ dupCtes).mkString(",\n")},
         |lin AS (
         |  SELECT doc_id, line FROM (
         |    SELECT doc_id,
         |      unnest(string_split(coalesce(text, ''), chr(10))) AS line
         |    FROM documents)
         |  WHERE length(trim(line)) > 0),
         |lstat AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines,
         |    CAST(sum(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS dup_lines,
         |    CAST(sum(length(line)) AS BIGINT) AS line_chars,
         |    CAST(sum(CASE WHEN c >= 2 THEN length(line) ELSE 0 END)
         |      AS BIGINT) AS dup_line_chars
         |  FROM (SELECT doc_id, line, count(*) OVER
         |          (PARTITION BY doc_id, line) AS c FROM lin)
         |  GROUP BY doc_id)
         |SELECT base.doc_id, total_chars,
         |  ${(topSel ++ dupSel).mkString(",\n  ")},
         |  CAST((coalesce(dup_lines, 0) * 1000000) //
         |    greatest(coalesce(n_lines, 0), 1) AS BIGINT) AS dup_line_ppm,
         |  CAST((coalesce(dup_line_chars, 0) * 1000000) //
         |    greatest(coalesce(line_chars, 0), 1) AS BIGINT)
         |    AS dup_line_char_ppm
         |FROM base
         |$joins
         |LEFT JOIN lstat USING (doc_id)""".stripMargin
    },

    "q_quality_classifier" -> {
      val bucket = s"${duckHash60("tok")} % 4096"
      val weight =
        s"${duckHash60(s"concat('clf:', CAST($bucket AS VARCHAR))")} % 2001 - 1000"
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(regexp_split_to_array(
         |    regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS tok
         |  FROM documents),
         |w AS (SELECT doc_id, CAST($weight AS BIGINT) AS w_milli FROM toks)
         |SELECT doc_id, count(*) AS n_tokens,
         |  CAST(sum(w_milli) AS BIGINT) AS w_sum_milli,
         |  round(1.0 / (1.0 + exp(-CAST(sum(w_milli) AS DOUBLE)
         |    / (count(*) * 1000.0))), 6) AS score,
         |  CAST(CASE WHEN sum(w_milli) >= 0 THEN 1 ELSE 0 END AS BIGINT)
         |    AS clf_keep
         |FROM w GROUP BY doc_id""".stripMargin
    },

    "q_ppl_buckets" ->
      s"""WITH $duckPplMetricCtes
         |SELECT doc_id, lang, n_tokens, mu_unats,
         |  CASE ntile(3) OVER (PARTITION BY lang ORDER BY mu_unats, doc_id)
         |    WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END
         |    AS ppl_bucket
         |FROM j""".stripMargin,

    // replay of the approx-cutoff contract (Assemble.pplBucketsApprox):
    // below the GK sketch's compression threshold the cutoff IS the
    // element at rank ceil(p·n) of the salted unique key — selected
    // here exactly. `1.0/3` stays a double product on both sides so
    // the ceil sees the identical IEEE value Spark's sketch computed.
    "q_ppl_buckets_approx" ->
      s"""WITH $duckPplMetricCtes,
         |u AS (SELECT doc_id, lang, n_tokens, mu_unats,
         |        mu_unats * 1048576 + (doc_id % 1048576) AS ukey FROM j),
         |r AS (SELECT lang, ukey,
         |        row_number() OVER (PARTITION BY lang ORDER BY ukey) AS rnk,
         |        count(*) OVER (PARTITION BY lang) AS n
         |      FROM u),
         |cuts AS (SELECT lang,
         |    max(CASE WHEN rnk = CAST(ceil((1.0/3) * n) AS BIGINT)
         |        THEN ukey END) AS c33,
         |    max(CASE WHEN rnk = CAST(ceil((2.0/3) * n) AS BIGINT)
         |        THEN ukey END) AS c67
         |  FROM r GROUP BY lang)
         |SELECT doc_id, lang, n_tokens, mu_unats,
         |  CASE WHEN ukey <= c33 THEN 'head'
         |       WHEN ukey <= c67 THEN 'middle' ELSE 'tail' END AS ppl_bucket
         |FROM u JOIN cuts USING (lang)""".stripMargin,

    "q_corpus_clean" ->
      s"""WITH ta AS ($duckTextAnalysis)
         |SELECT doc_id, lang_guess, quality, n_tokens_ws
         |FROM (SELECT *, row_number() OVER
         |        (PARTITION BY fingerprint ORDER BY doc_id) AS rn
         |      FROM ta
         |      WHERE lang_guess = 'en' AND quality >= 0.5)
         |WHERE rn = 1""".stripMargin,

    "q_embed_cosine" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT * FROM e WHERE vec_id % 100 = 0),
        |scored AS (
        |  SELECT q.vec_id AS q_id, e.vec_id AS n_id,
        |         list_dot_product(q.v, e.v)
        |           / (sqrt(list_dot_product(q.v, q.v))
        |              * sqrt(list_dot_product(e.v, e.v))) AS s
        |  FROM q JOIN e ON q.vec_id <> e.vec_id)
        |SELECT q_id, n_id, round(s, 6) AS sim FROM scored WHERE s >= 0.3""".stripMargin,

    // all four ANN variants share the exhaustive oracle — settings in
    // `queries` are pinned to exact recall on the gate corpus
    "q_ann_lsh" -> duckAnnBruteTop5,
    "q_ann_ivf" -> duckAnnBruteTop5,
    "q_ann_ivf_trained" -> duckAnnBruteTop5,
    "q_ann_pq" -> duckAnnBruteTop5,

    "q_embed_dedup" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings),
        |dups AS (
        |  SELECT DISTINCT b.vec_id
        |  FROM e a JOIN e b ON a.vec_id < b.vec_id
        |  WHERE list_dot_product(a.v, b.v)
        |    / (sqrt(list_dot_product(a.v, a.v))
        |       * sqrt(list_dot_product(b.v, b.v))) >= 0.4)
        |SELECT vec_id, label FROM e
        |WHERE vec_id NOT IN (SELECT vec_id FROM dups)""".stripMargin,

    "q_embed_clusters" ->
      """WITH RECURSIVE emb AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |p AS (
        |  SELECT a.vec_id AS ia, b.vec_id AS ib
        |  FROM emb a JOIN emb b ON a.vec_id < b.vec_id
        |  WHERE list_dot_product(a.v, b.v)
        |    / (sqrt(list_dot_product(a.v, a.v))
        |       * sqrt(list_dot_product(b.v, b.v))) >= 0.4),
        |edges AS (SELECT ia AS a, ib AS b FROM p
        |          UNION SELECT ib, ia FROM p),
        |reach AS (
        |  SELECT a AS n, b AS r FROM edges
        |  UNION
        |  SELECT reach.n, g.b FROM reach JOIN edges g ON reach.r = g.a
        |)
        |SELECT n AS vec_id, least(n, min(r)) AS cluster_id
        |FROM reach GROUP BY n""".stripMargin,

    // exhaustive pair graph -> recursive CC -> integer-micro centroid
    // -> fixed-order cosine -> (sim asc, id asc) keeper — the same
    // state the engine computes via the bucketed paths
    "q_semdedup" ->
      """WITH RECURSIVE emb AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |p AS (
        |  SELECT a.vec_id AS ia, b.vec_id AS ib
        |  FROM emb a JOIN emb b ON a.vec_id < b.vec_id
        |  WHERE list_dot_product(a.v, b.v)
        |    / (sqrt(list_dot_product(a.v, a.v))
        |       * sqrt(list_dot_product(b.v, b.v))) >= 0.4),
        |edges AS (SELECT ia AS a, ib AS b FROM p
        |          UNION SELECT ib, ia FROM p),
        |reach AS (
        |  SELECT a AS n, b AS r FROM edges
        |  UNION
        |  SELECT reach.n, g.b FROM reach JOIN edges g ON reach.r = g.a),
        |lab AS (SELECT n AS vec_id, least(n, min(r)) AS cluster_id
        |        FROM reach GROUP BY n),
        |mem AS (SELECT l.vec_id, l.cluster_id, e.v
        |        FROM lab l JOIN emb e USING (vec_id)),
        |cd AS (SELECT cluster_id, CAST(i - 1 AS INT) AS d,
        |              sum(CAST(floor(v[i] * 1000000) AS BIGINT)) AS s,
        |              count(*) AS cnt
        |       FROM mem, LATERAL unnest(range(1, len(v) + 1)) t(i)
        |       GROUP BY 1, 2),
        |ca AS (SELECT cluster_id,
        |              list(CAST(s AS DOUBLE) / (cnt * 1000000.0)
        |                ORDER BY d) AS cent
        |       FROM cd GROUP BY cluster_id),
        |scored AS (SELECT m.vec_id, m.cluster_id,
        |                  list_dot_product(m.v, c.cent)
        |                    / (sqrt(list_dot_product(m.v, m.v))
        |                       * sqrt(list_dot_product(c.cent, c.cent)))
        |                    AS sim
        |           FROM mem m JOIN ca c USING (cluster_id)),
        |verdict AS (SELECT vec_id, cluster_id,
        |                   row_number() OVER (PARTITION BY cluster_id
        |                     ORDER BY sim, vec_id) = 1 AS kept
        |            FROM scored)
        |SELECT e.vec_id, v.cluster_id, coalesce(v.kept, TRUE) AS kept
        |FROM embeddings e LEFT JOIN verdict v USING (vec_id)""".stripMargin,

    "q_ngram_jaccard" ->
      """WITH docs AS (
        |  SELECT doc_id, block,
        |    list_distinct(CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
        |      ELSE [array_to_string(toks[i:i+2], ' ')
        |            FOR i IN range(1, len(toks) - 1)] END) AS sh
        |  FROM (SELECT doc_id, floor(length(text) / 50) AS block,
        |          regexp_split_to_array(
        |            regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
        |        FROM documents))
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |       round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |         / greatest(len(list_distinct(list_concat(a.sh, b.sh))), 1), 6)
        |         AS jaccard
        |FROM docs a JOIN docs b
        |  ON a.block = b.block AND a.doc_id < b.doc_id
        |WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |  / greatest(len(list_distinct(list_concat(a.sh, b.sh))), 1) >= 0.5""".stripMargin,

    "q_sync_apply" -> syncApplyOracleSql(),

    // the streaming replay's final state is batch-boundary-insensitive
    // (strict-> version rule), so one batch pass over the full table
    // reproduces it: the max-version (= max event_id) record per user
    "q_sync_incremental" ->
      """WITH ranked AS (
        |  SELECT CAST(user_id AS VARCHAR) AS id,
        |         CAST(event_id AS BIGINT) AS version,
        |         event_type,
        |         CAST(floor(value * 100) AS BIGINT) AS value_cents,
        |         row_number() OVER (PARTITION BY user_id
        |                            ORDER BY event_id DESC) AS rn
        |  FROM events)
        |SELECT id, version, event_type, value_cents
        |FROM ranked WHERE rn = 1""".stripMargin,

    // same merged-state semantics through the JDBC sink, on the
    // u%4=1 slice (see the query's comment)
    "q_sync_incremental_jdbc" ->
      """WITH ranked AS (
        |  SELECT CAST(user_id AS VARCHAR) AS id,
        |         CAST(event_id AS BIGINT) AS version,
        |         event_type,
        |         CAST(floor(value * 100) AS BIGINT) AS value_cents,
        |         row_number() OVER (PARTITION BY user_id
        |                            ORDER BY event_id DESC) AS rn
        |  FROM events WHERE user_id % 4 = 1)
        |SELECT id, version, event_type, value_cents
        |FROM ranked WHERE rn = 1""".stripMargin,

    // append-mode emission: every window whose end passed the final
    // watermark (delay 0 ⇒ max ts). The replay feeds ts-ordered
    // batches, so no row is ever late — one plain GROUP BY replays
    // the cross-batch state accumulation.
    "q_stream_window" ->
      """WITH w AS (SELECT time_bucket(INTERVAL 1 HOUR, ts) AS wstart,
        |                  event_type, value, ts
        |           FROM events)
        |SELECT CAST(floor(epoch(wstart)) AS BIGINT) AS win_start,
        |       event_type, count(*) AS n,
        |       CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
        |         AS value_cents
        |FROM w
        |WHERE wstart + INTERVAL 1 HOUR <= (SELECT max(ts) FROM events)
        |GROUP BY 1, 2""".stripMargin,

    // the straggler batch (event_id % 97 = 0, replayed last as batch
    // 3) is late-filtered under Spark's TWO-PHASE watermark: late
    // input rows in batch N are dropped against the watermark of
    // batch N−1 (eventTimeWatermarkForLateEvents — one batch of
    // grace), while eviction/emission uses the current one. So the
    // drop threshold is W_late = max(on-time ts in ts-range batches
    // 0..1) − 30 min (the same floor formula tsRangeBatch uses, over
    // the full-table µs bounds), and the emission threshold is
    // W_final = max(ts) − 30 min.
    "q_stream_late" ->
      """WITH b AS (SELECT min(epoch_us(ts)) AS t0, max(epoch_us(ts)) AS t1
        |           FROM events),
        |s AS (SELECT time_bucket(INTERVAL 1 HOUR, ts) AS wstart,
        |             event_type, value, ts,
        |             (event_id % 97 = 0) AS straggler,
        |             CAST(floor((epoch_us(ts) - b.t0) * 3.0
        |               / (b.t1 - b.t0 + 1)) AS INTEGER) AS batch
        |      FROM events, b),
        |wm AS (SELECT max(ts) - INTERVAL 30 MINUTE AS w_late
        |       FROM s WHERE NOT straggler AND batch <= 1),
        |wmf AS (SELECT max(ts) - INTERVAL 30 MINUTE AS w_final FROM s),
        |kept AS (SELECT s.* FROM s, wm
        |         WHERE NOT s.straggler
        |            OR s.wstart + INTERVAL 1 HOUR > wm.w_late)
        |SELECT CAST(floor(epoch(wstart)) AS BIGINT) AS win_start,
        |       event_type, count(*) AS n,
        |       CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
        |         AS value_cents
        |FROM kept, wmf
        |WHERE wstart + INTERVAL 1 HOUR <= wmf.w_final
        |GROUP BY 1, 2""".stripMargin,

    // the streaming interval join emits exactly the batch interval
    // join (see the query's eviction-safety argument): clicks (odd
    // event_id) × impressions (even) of the same user within
    // [l.ts, l.ts + 30 min]
    "q_stream_join" ->
      """SELECT l.user_id,
        |       l.event_id AS l_event_id, r.event_id AS r_event_id
        |FROM events l JOIN events r
        |  ON l.user_id = r.user_id
        | AND l.event_id % 2 = 0 AND r.event_id % 2 = 1
        | AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 30 MINUTE""".stripMargin,

    // gaps-and-islands replay of session_window: the merge rule is
    // INCLUSIVE (spec-pinned on the exact-gap boundary), so a
    // session breaks exactly when the inter-event gap is > 30 min —
    // the same rule as q_sessionize; a session emits when its end
    // (last ts + gap) <= the final watermark. Spark tracks the
    // watermark in MILLISECONDS (EventTimeStats floors event-time
    // micros to ms), and session ends inherit the raw event-time
    // precision — so the emission threshold floors max(ts) to ms
    // before comparing, or a session ending within the final
    // sub-millisecond would emit here but be withheld by Spark.
    // (The tumbling-window oracles don't need this: their window
    // ends are hour-aligned, and for an ms-aligned bound E,
    // E <= max_us  <=>  E <= floor_ms(max_us) — provably identical.)
    // Same-ts events per user collapse into one window on both
    // engines, so ordering ties are immaterial to the aggregates.
    "q_stream_session" ->
      """WITH x AS (SELECT user_id, ts, value, epoch_us(ts) AS us,
        |                  lag(epoch_us(ts)) OVER
        |                    (PARTITION BY user_id ORDER BY ts) AS prev
        |           FROM events),
        |g AS (SELECT *, sum(CASE WHEN prev IS NULL
        |                         OR us - prev > 1800000000
        |                         THEN 1 ELSE 0 END) OVER
        |        (PARTITION BY user_id ORDER BY us
        |         ROWS UNBOUNDED PRECEDING) AS sid
        |      FROM x),
        |s AS (SELECT user_id, sid, min(us) AS start_us, max(us) AS end_us,
        |             count(*) AS n,
        |             CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
        |               AS value_cents
        |      FROM g GROUP BY 1, 2)
        |SELECT user_id,
        |       CAST(floor(start_us / 1000000) AS BIGINT) AS sess_start,
        |       n, value_cents
        |FROM s, (SELECT max(epoch_us(ts)) AS mx FROM events)
        |WHERE end_us + 1800000000 <= (mx // 1000) * 1000""".stripMargin,

    // replays the probed dropDuplicatesWithinWatermark state machine
    // (fixed expiry at first-kept ts + delay, no extension on drop;
    // eviction during batch N under the watermark from batches
    // <= N-2 — the eviction watermark lags one batch behind the
    // late-row watermark, probed empirically and pinned by this row)
    // as a recursive per-key fold over the <= 4 pre-deduped arrivals
    "q_stream_dedup" ->
      """WITH RECURSIVE
        |ev AS (SELECT event_id, epoch_us(ts) AS us,
        |              concat(user_id, ':', event_type) AS fp
        |       FROM events),
        |bnd AS (SELECT min(us) AS t0, max(us) AS t1 FROM ev),
        |batched AS (SELECT ev.*, CAST(floor((ev.us - bnd.t0) * 4.0
        |              / (bnd.t1 - bnd.t0 + 1)) AS INT) AS bt
        |            FROM ev, bnd),
        |uniq AS (SELECT fp, event_id, us, bt FROM (
        |    SELECT *, row_number() OVER (PARTITION BY fp, bt
        |      ORDER BY us, event_id) AS rn
        |    FROM batched) WHERE rn = 1),
        |wm AS (
        |  SELECT k.bt,
        |         (SELECT (max(u.us) // 1000 - 259200000) * 1000
        |          FROM uniq u WHERE u.bt <= k.bt - 2) AS w_us
        |  FROM (SELECT DISTINCT bt FROM uniq) k(bt)),
        |arr AS (SELECT fp, event_id, us, bt,
        |               row_number() OVER (PARTITION BY fp ORDER BY bt)
        |                 AS i
        |        FROM uniq),
        |sim AS (
        |  SELECT fp, event_id, us, bt, i, us AS kept_us, TRUE AS emitted
        |  FROM arr WHERE i = 1
        |  UNION ALL
        |  SELECT a.fp, a.event_id, a.us, a.bt, a.i,
        |         CASE WHEN w.w_us IS NOT NULL
        |                   AND s.kept_us + 259200000000 < w.w_us
        |              THEN a.us ELSE s.kept_us END,
        |         (w.w_us IS NOT NULL
        |          AND s.kept_us + 259200000000 < w.w_us)
        |  FROM sim s JOIN arr a ON a.fp = s.fp AND a.i = s.i + 1
        |  LEFT JOIN wm w ON w.bt = a.bt)
        |SELECT fp, event_id, us AS ts_us FROM sim WHERE emitted""".stripMargin,

    // per-(id, batch) winners folded through the SCD2 open/close
    // state machine: a winner opens iff its version strictly exceeds
    // the currently-open version; validity ranges via lead()
    "q_sync_scd2" ->
      """WITH RECURSIVE
        |ev AS (SELECT user_id,
        |              (event_id * 48271) % 2147483647 AS version,
        |              event_type,
        |              CAST(floor(value * 100) AS BIGINT) AS value_cents,
        |              epoch_us(ts) AS us
        |       FROM events),
        |bnd AS (SELECT min(us) AS t0, max(us) AS t1 FROM ev),
        |batched AS (SELECT ev.*, CAST(floor((ev.us - bnd.t0) * 4.0
        |              / (bnd.t1 - bnd.t0 + 1)) AS INT) AS bt
        |            FROM ev, bnd),
        |winners AS (SELECT user_id, bt, version, event_type, value_cents
        |  FROM (SELECT *, row_number() OVER (PARTITION BY user_id, bt
        |          ORDER BY version DESC) AS rn
        |        FROM batched) WHERE rn = 1),
        |arr AS (SELECT *, row_number() OVER (PARTITION BY user_id
        |          ORDER BY bt) AS i
        |        FROM winners),
        |fold AS (
        |  SELECT user_id, bt, version, event_type, value_cents, i,
        |         version AS kept_v, TRUE AS opened
        |  FROM arr WHERE i = 1
        |  UNION ALL
        |  SELECT a.user_id, a.bt, a.version, a.event_type,
        |         a.value_cents, a.i,
        |         CASE WHEN a.version > f.kept_v THEN a.version
        |              ELSE f.kept_v END,
        |         a.version > f.kept_v
        |  FROM fold f JOIN arr a
        |    ON a.user_id = f.user_id AND a.i = f.i + 1)
        |SELECT CAST(user_id AS VARCHAR) AS id, version, event_type,
        |       value_cents, CAST(bt AS BIGINT) AS sync_in,
        |       CAST(lead(bt) OVER (PARTITION BY user_id ORDER BY bt)
        |         AS BIGINT) AS sync_out
        |FROM fold WHERE opened""".stripMargin,

    // identical merged-state semantics, certified on the JDBC sink
    // (the k%4=1 slice — see the query's comment)
    "q_sync_apply_jdbc" -> syncApplyOracleSql(" AND o_orderkey % 4 = 1"),

    "q_simhash_pairs" -> {
      val sigTerms = (0 until 60).map(j =>
        s"(CASE WHEN sum(CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END) > 0" +
        s" THEN CAST(${1L << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END)")
        .mkString("\n      + ")
      s"""WITH docs AS (
         |  $duckShingles),
         |hs AS (SELECT doc_id, ${duckHash60("s")} AS h
         |       FROM (SELECT doc_id, unnest(sh) AS s FROM docs)),
         |sigs AS (SELECT doc_id, $sigTerms AS sig
         |         FROM hs GROUP BY doc_id)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |       CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
         |FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.sig, b.sig)) <= 8""".stripMargin
    },

    "q_minhash_dedup" ->
      s"""WITH $minhashPairsCtes
         |SELECT id_a, id_b, jaccard FROM pairs""".stripMargin,

    // signatures depend only on the doc, so one sigs CTE serves both
    // sides; the batch/corpus split happens in the candidate join
    "q_minhash_incremental" ->
      s"""WITH $minhashSigCtes,
         |cands AS (SELECT a.doc_id AS id_l, b.doc_id AS id_r
         |  FROM sigs a JOIN sigs b
         |    ON a.doc_id % 2 = 1 AND b.doc_id % 2 = 0
         |  WHERE $minhashBandConds)
         |SELECT c.id_l, c.id_r,
         |  round(CAST(len(list_intersect(da.sh, db.sh)) AS DOUBLE)
         |    / greatest(len(list_distinct(list_concat(da.sh, db.sh))), 1), 6)
         |    AS jaccard
         |FROM cands c
         |JOIN docs da ON c.id_l = da.doc_id
         |JOIN docs db ON c.id_r = db.doc_id
         |WHERE CAST(len(list_intersect(da.sh, db.sh)) AS DOUBLE)
         |  / greatest(len(list_distinct(list_concat(da.sh, db.sh))), 1) >= 0.5""".stripMargin,

    // transitive closure of the verified pair graph via a recursive
    // CTE (reachability), component label = min reachable id
    "q_dedup_clusters" ->
      s"""WITH RECURSIVE $minhashPairsCtes,
         |edges AS (SELECT id_a AS a, id_b AS b FROM pairs
         |          UNION SELECT id_b, id_a FROM pairs),
         |reach AS (
         |  SELECT a AS n, b AS r FROM edges
         |  UNION
         |  SELECT reach.n, e.b FROM reach JOIN edges e ON reach.r = e.a
         |)
         |SELECT n AS doc_id, least(n, min(r)) AS cluster_id
         |FROM reach GROUP BY n""".stripMargin,

    // pairs → recursive closure → drop non-representatives → permute
    // the survivors: every stage of the pipeline replayed in one query
    "q_dedup_shuffle" ->
      s"""WITH RECURSIVE $minhashPairsCtes,
         |edges AS (SELECT id_a AS a, id_b AS b FROM pairs
         |          UNION SELECT id_b, id_a FROM pairs),
         |reach AS (
         |  SELECT a AS n, b AS r FROM edges
         |  UNION
         |  SELECT reach.n, g.b FROM reach JOIN edges g ON reach.r = g.a
         |),
         |dropped AS (SELECT n FROM reach GROUP BY n
         |            HAVING n <> least(n, min(r))),
         |keep AS (SELECT doc_id FROM documents
         |         WHERE doc_id NOT IN (SELECT n FROM dropped)),
         |h AS (
         |  SELECT doc_id,
         |    ${duckHash60("concat(CAST(doc_id AS VARCHAR), ':0')")} AS h
         |  FROM keep)
         |SELECT doc_id, h % 16 AS shard,
         |       CAST(row_number() OVER (
         |         PARTITION BY h % 16 ORDER BY h, doc_id) - 1 AS BIGINT)
         |         AS pos
         |FROM h""".stripMargin,

    "q_dedup_best" ->
      s"""WITH RECURSIVE $minhashPairsCtes,
         |edges AS (SELECT id_a AS a, id_b AS b FROM pairs
         |          UNION SELECT id_b, id_a FROM pairs),
         |reach AS (
         |  SELECT a AS n, b AS r FROM edges
         |  UNION
         |  SELECT reach.n, g.b FROM reach JOIN edges g ON reach.r = g.a
         |),
         |mc AS (SELECT n, least(n, min(r)) AS cl FROM reach GROUP BY n),
         |m AS (SELECT mc.n, mc.cl,
         |        CAST(CASE WHEN length(trim(text)) = 0 THEN 0
         |             ELSE len(regexp_split_to_array(trim(text), '\\s+')) END
         |          AS BIGINT) AS nt
         |      FROM mc JOIN documents ON mc.n = doc_id),
         |dropped AS (SELECT n FROM (
         |    SELECT n, row_number() OVER (
         |      PARTITION BY cl ORDER BY nt DESC, n) AS rn FROM m)
         |  WHERE rn > 1)
         |SELECT doc_id, n_chars FROM documents
         |WHERE doc_id NOT IN (SELECT n FROM dropped)""".stripMargin,

    "q_shuffle_shards" ->
      s"""WITH h AS (
         |  SELECT doc_id,
         |    ${duckHash60("concat(CAST(doc_id AS VARCHAR), ':0')")} AS h
         |  FROM documents)
         |SELECT doc_id, h % 64 AS shard,
         |       CAST(row_number() OVER (
         |         PARTITION BY h % 64 ORDER BY h, doc_id) - 1 AS BIGINT)
         |         AS pos
         |FROM h""".stripMargin,

    // bucket identity: Spark groups by xxhash64(minhash tuple), the
    // oracle by the tuple itself — same partition of docs into
    // buckets (a collision would merge two buckets; none at oracle
    // scale, and the green row certifies that)
    "q_lsh_skew" -> {
      val perBand = (0 until 8).map { b =>
        val cols = (b * 4 until (b + 1) * 4).map(i => s"m$i").mkString(", ")
        s"SELECT $b AS band, count(*) AS c FROM sigs GROUP BY $cols"
      }.mkString("\n  UNION ALL\n  ")
      s"""WITH $minhashSigCtes,
         |per AS (
         |  $perBand)
         |SELECT band, count(*) AS n_buckets, max(c) AS max_bucket,
         |       CAST(sum(c * (c - 1)) // 2 AS BIGINT) AS n_cand_pairs
         |FROM per GROUP BY band""".stripMargin
    },

    "q_dup_chunks" ->
      s"""WITH toks AS (
         |  SELECT doc_id, regexp_split_to_array(
         |    regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS t
         |  FROM documents),
         |ch AS (
         |  SELECT doc_id,
         |    unnest(list_transform(
         |      range(0, CAST(ceil(len(t) / 32.0) AS INT)),
         |      i -> list_reduce(list_prepend(CAST(0 AS BIGINT),
         |             list_transform(t[i*32+1 : (i+1)*32],
         |               s -> ${duckHash60("s")} % 1000003)),
         |           (a, b) -> (a * 31 + b) % 2147483647))) AS ch
         |  FROM toks),
         |freq AS (SELECT ch AS fch, count(DISTINCT doc_id) AS n_docs
         |         FROM ch GROUP BY ch)
         |SELECT doc_id, count(*) AS n_chunks,
         |       CAST(sum(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END)
         |         AS BIGINT) AS n_dup_chunks,
         |       round(CAST(sum(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END)
         |         AS DOUBLE) / count(*), 6) AS dup_chunk_frac
         |FROM ch JOIN freq ON ch.ch = freq.fch
         |GROUP BY doc_id""".stripMargin,

    // exact duplicated-span annotation: the oracle joins gram STRINGS
    // (the contamination convention — certifies the engine's 60-bit
    // gram hashes collision-free), then replays the gaps-and-islands
    // span merge and the exact integer coverage arithmetic
    "q_span_dedup" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS t
        |  FROM documents),
        |pos AS (
        |  SELECT doc_id, t, unnest(range(1, len(t) - 13 + 2)) AS p
        |  FROM toks WHERE len(t) >= 13),
        |grams AS (
        |  SELECT doc_id, p, array_to_string(t[p : p + 12], ' ') AS g
        |  FROM pos),
        |freq AS (
        |  SELECT g AS fg FROM (SELECT DISTINCT doc_id, g FROM grams)
        |  GROUP BY g HAVING count(*) >= 2),
        |dup AS (SELECT doc_id, p FROM grams
        |        WHERE g IN (SELECT fg FROM freq)),
        |brk AS (
        |  SELECT doc_id, p,
        |    CASE WHEN p - lag(p) OVER (PARTITION BY doc_id ORDER BY p)
        |           > 13 THEN 1 ELSE 0 END AS b
        |  FROM dup),
        |isl AS (
        |  SELECT doc_id, p,
        |    sum(b) OVER (PARTITION BY doc_id ORDER BY p) AS island
        |  FROM brk),
        |per_island AS (
        |  SELECT doc_id, island, max(p) - min(p) + 13 AS covered
        |  FROM isl GROUP BY doc_id, island),
        |per_doc AS (
        |  SELECT doc_id, count(*) AS n_spans,
        |         CAST(sum(covered) AS BIGINT) AS dup_tokens
        |  FROM per_island GROUP BY doc_id)
        |SELECT t.doc_id, CAST(len(t.t) AS BIGINT) AS n_tokens,
        |       CAST(coalesce(d.n_spans, 0) AS BIGINT) AS n_spans,
        |       CAST(coalesce(d.dup_tokens, 0) AS BIGINT) AS dup_tokens,
        |       CAST(coalesce(d.dup_tokens, 0) * 1000000 // len(t.t)
        |         AS BIGINT) AS dup_ppm
        |FROM toks t LEFT JOIN per_doc d USING (doc_id)""".stripMargin,

    "q_text_rolling" ->
      s"""SELECT doc_id,
         |  list_reduce(list_prepend(CAST(0 AS BIGINT),
         |    list_transform(
         |      regexp_split_to_array(
         |        regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '),
         |      t -> ${duckHash60("t")} % 1000003)),
         |    (a, b) -> (a * 31 + b) % 2147483647) AS rolling_hash
         |FROM documents""".stripMargin,

    "q_multimodal_decode" ->
      s"""WITH m AS (
         |  SELECT CAST(doc_id AS VARCHAR) AS media_id,
         |         (['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1]
         |           AS media_type,
         |         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         |         ${duckHash60("text")} AS h
         |  FROM documents)
         |SELECT media_id, media_type, n_bytes,
         |       CAST(h % 1920 + 1 AS INT) AS width,
         |       CAST(h % 1080 + 1 AS INT) AS height,
         |       CASE WHEN media_type = 'image' THEN CAST(0 AS BIGINT)
         |            ELSE h % 600000 END AS duration_ms
         |FROM m""".stripMargin,

    "q_multimodal_meta" ->
      """SELECT CAST(doc_id AS VARCHAR) AS media_id,
        |       (['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1] AS media_type,
        |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |       sha256(text) AS sha256
        |FROM documents""".stripMargin,

    "q_multimodal_frames" ->
      s"""WITH m AS (
         |  SELECT CAST(doc_id AS VARCHAR) AS media_id,
         |         (['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1]
         |           AS media_type,
         |         ${duckHash60("text")} AS h
         |  FROM documents),
         |v AS (SELECT media_id, h % 600000 AS duration_ms FROM m
         |      WHERE media_type = 'video')
         |SELECT media_id,
         |  CAST(unnest(range(0, duration_ms + 1, 60000)) AS BIGINT)
         |    AS frame_ts_ms
         |FROM v""".stripMargin,

    "q_multimodal_resize" ->
      s"""WITH m AS (
         |  SELECT CAST(doc_id AS VARCHAR) AS media_id,
         |         (['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1]
         |           AS media_type,
         |         ${duckHash60("text")} AS h
         |  FROM documents),
         |i AS (SELECT media_id,
         |        CAST(h % 1920 + 1 AS INT) AS width,
         |        CAST(h % 1080 + 1 AS INT) AS height
         |      FROM m WHERE media_type = 'image'),
         |x AS (SELECT *, greatest(width, height) AS mx FROM i)
         |SELECT media_id, width, height,
         |  CAST(CASE WHEN mx <= 512 THEN width
         |       ELSE greatest((width * 512) // mx, 1) END AS INT)
         |    AS out_width,
         |  CAST(CASE WHEN mx <= 512 THEN height
         |       ELSE greatest((height * 512) // mx, 1) END AS INT)
         |    AS out_height
         |FROM x""".stripMargin,

    // replays the synthetic-PPM pixel rule (byte of pixel p, channel c
    // = (id·31 + p·7 + c·13) mod 256) from the id alone — certifying
    // the engine's decoder parsed the real header and summed the real
    // payload bytes it was handed
    "q_multimodal_ppm" ->
      """WITH dim AS (
        |  SELECT doc_id,
        |         CAST(8 + doc_id % 16 AS INT) AS width,
        |         CAST(6 + doc_id % 9 AS INT) AS height
        |  FROM documents),
        |px AS (SELECT doc_id, width, height,
        |         unnest(range(0, CAST(width AS BIGINT) * height)) AS p
        |       FROM dim),
        |ch AS (SELECT doc_id, width, height, p, c,
        |         (doc_id * 31 + p * 7 + c * 13) % 256 AS v
        |       FROM px, unnest([0, 1, 2]) t(c)),
        |s AS (SELECT doc_id, width, height,
        |        CAST(width AS BIGINT) * height AS n_pix,
        |        CAST(sum(CASE WHEN c = 0 THEN v END) AS BIGINT) AS r_sum,
        |        CAST(sum(CASE WHEN c = 1 THEN v END) AS BIGINT) AS g_sum,
        |        CAST(sum(CASE WHEN c = 2 THEN v END) AS BIGINT) AS b_sum
        |      FROM ch GROUP BY 1, 2, 3, 4)
        |SELECT CAST(doc_id AS VARCHAR) AS media_id, width, height,
        |       CAST(255 AS INT) AS maxval, n_pix, r_sum, g_sum, b_sum,
        |       CAST(r_sum * 1000 // n_pix AS BIGINT) AS r_mean_milli,
        |       CAST(g_sum * 1000 // n_pix AS BIGINT) AS g_mean_milli,
        |       CAST(b_sum * 1000 // n_pix AS BIGINT) AS b_mean_milli
        |FROM s""".stripMargin,

    // replays graft.ext.Multimodal.synthesizeWav's id formulas —
    // sample of frame f channel c = ((id·37 + f·11 + c·5) mod 4001)
    // − 2000 over nf = 50 + id mod 101 frames — entirely from doc_id
    "q_multimodal_wav" ->
      """WITH p AS (
        |  SELECT doc_id AS d,
        |         8000 + 4000 * (doc_id % 4) AS sr,
        |         1 + doc_id % 2 AS ch,
        |         50 + doc_id % 101 AS nf
        |  FROM documents),
        |s AS (SELECT d, sr, ch, nf, c,
        |        ((d * 37 + f * 11 + c * 5) % 4001) - 2000 AS v
        |      FROM p,
        |           LATERAL unnest(range(0, nf)) t(f),
        |           LATERAL unnest(range(0, ch)) u(c)),
        |a AS (SELECT d, sr, ch, nf,
        |        CAST(sum(CASE WHEN c = 0 THEN v ELSE 0 END) AS BIGINT) AS c0_sum,
        |        CAST(sum(CASE WHEN c = 1 THEN v ELSE 0 END) AS BIGINT) AS c1_sum,
        |        CAST(sum(abs(v)) AS BIGINT) AS abs_sum,
        |        CAST(max(abs(v)) AS BIGINT) AS peak
        |      FROM s GROUP BY 1, 2, 3, 4)
        |SELECT CAST(d AS VARCHAR) AS media_id,
        |       CAST(sr AS INT) AS sample_rate, CAST(ch AS INT) AS channels,
        |       CAST(16 AS INT) AS bits, CAST(nf AS BIGINT) AS n_frames,
        |       CAST(nf * 1000 // sr AS BIGINT) AS duration_ms,
        |       c0_sum, c1_sum, abs_sum, peak
        |FROM a""".stripMargin
  )
}
