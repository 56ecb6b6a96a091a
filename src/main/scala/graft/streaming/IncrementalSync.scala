package graft.streaming

import graft.core.Records
import graft.mapper.Mapper
import graft.pipeline.Preset
import graft.targets.DataTarget
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/**
 * Streaming extension (SURVEY §7.5 — beyond reference parity; the
 * reference is strictly batch, full snapshot per run,
 * ImportService.php:71-88).
 *
 * Three Structured Streaming shapes:
 *  1. incremental sync — each micro-batch is one sync run: the batch
 *     diffs against the target's current state inside `foreachBatch`
 *     and applies add/update/remove, reusing the exact batch
 *     operators (same Diff, same sinks — micro-batch = one
 *     `importData`);
 *  2. watermarked windowed aggregation over an event stream;
 *  3. custom keyed state via `flatMapGroupsWithState`
 *     (session tracking with explicit timeout).
 *
 * Scale note: foreachBatch keeps the mutating-sink pattern identical
 * to batch — state lives in the target, not in Spark state stores, so
 * a 1000-executor streaming job restarts cleanly from the target's
 * own content (the same idempotent re-run semantics the reference's
 * diff gives batch runs).
 */
object IncrementalSync {

  /** Hang guard for the replay harnesses' awaitTermination: a replay
    * that never terminates must fail LOUDLY (and stop the query, not
    * leave it contending for cores), but the bound itself scales with
    * data — the 10-minute default covers every gate/bench shape,
    * while big key-growth smokes (a 100× media replay legitimately
    * runs past 10 minutes) raise it via
    * `SPARK_GRAFT_REPLAY_TIMEOUT_MS` without touching query code. */
  private def replayTimeoutMs: Long =
    sys.env.get("SPARK_GRAFT_REPLAY_TIMEOUT_MS")
      .flatMap(_.toLongOption).getOrElse(600000L)

  /**
   * Run a preset's sync per micro-batch. The stream carries raw
   * source records; keying/diff/apply happen inside foreachBatch via
   * the standard batch operators.
   */
  def start(
      spark: SparkSession,
      stream: DataFrame,
      preset: Preset,
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        // in-batch last-wins dedup orders by the VERSION when the
        // preset has one: a micro-batch of a distributed stream has
        // no meaningful "insertion order" (SURVEY §1.5.1), and the
        // version rule is what makes the whole replay
        // batch-boundary-insensitive — the certification property
        // q_sync_incremental's oracle checks
        val keyed = Records.keyRecords(batch.toDF(), preset.idAttribute,
          preset.versionAttribute,
          orderCol = preset.versionAttribute.map(_ =>
            org.apache.spark.sql.functions.col(Records.VersionCol)))
        val data = preset.dataProcessor.map(_(keyed)).getOrElse(keyed)
        val cs = preset.computeDataChanges(spark, data, force = false)
        val res = preset.target.applyChanges(spark, cs, preset.mapper)
        // row-level sink errors are isolated, not fatal (the
        // reference's import-error contract) — but a stream that
        // silently drops every row is a misconfigured pipeline, not
        // an unlucky batch. Surface loudly either way.
        if (res.errors > 0) {
          Console.err.println(
            s"[stream-sync] batch $batchId: ${res.errors} sink row " +
              s"errors (samples: ${res.errorSamples.take(3)})")
        }
        ()
      }
      .start()

  /**
   * Certification replay: split a STATIC table into `nBatches`
   * timestamp-ordered micro-batches, stream them through [[start]]
   * (file source, `maxFilesPerTrigger = 1`, modification-time
   * ordering), and return the target's final merged state.
   *
   * This is the oracle bridge for the streaming tier: the sync's
   * version rule (strict `>` update, last-wins in-batch dedup by
   * version) makes the final state independent of where the batch
   * boundaries fall, so a batch engine (DuckDB) can recompute the
   * identical state from the FULL table in one pass — per id, the
   * max-version record wins. The preset must set
   * `skipRemovedRecords = true` (a micro-batch is a delta, not a
   * snapshot — absence must not delete).
   *
   * Driver-side work is bounded metadata only: the two ts bounds and
   * the file-listing/mtime stamping of the staged batch files; the
   * table itself never collects.
   */
  def replaySync(
      spark: SparkSession, table: DataFrame, tsCol: String,
      preset: Preset, workDir: String, nBatches: Int = 4,
      batchFiles: Int = 1): DataFrame = {
    require(nBatches >= 1 && batchFiles >= 1,
      "nBatches and batchFiles must be >= 1")
    require(preset.skipRemovedRecords,
      "replaySync needs skipRemovedRecords = true: a micro-batch is a " +
        "delta, not a snapshot")
    val stream = stagedStream(spark, table,
      tsRangeBatch(table, tsCol, nBatches), nBatches,
      s"$workDir/in", batchFiles)
    // NOTE: unlike runToMemorySink, the shuffle-partition count is NOT
    // narrowed here — the foreachBatch diff/apply cycles carry real
    // data volume (the staged table itself, not state-store metadata),
    // and narrowing was measured to HURT (q_sync_incremental 5.6 s →
    // 10.0 s at sf0.1 with 8 partitions: lost parallelism on the
    // per-batch keying window + full-outer diff).
    val q = start(spark, stream, preset, s"$workDir/chk",
      trigger = Trigger.AvailableNow())
    if (!q.awaitTermination(replayTimeoutMs)) {
      q.stop() // don't leave an orphaned stream contending for cores
      sys.error("replaySync: streaming query did not terminate")
    }
    preset.target.currentState(spark)
  }

  /** Epoch-micros ordering column for a timestamp column; numeric ts
    * columns (raw epoch values) order as-is. */
  def tsOrdinal(table: DataFrame, tsCol: String): Column =
    table.schema(tsCol).dataType match {
      case org.apache.spark.sql.types.TimestampType => unix_micros(col(tsCol))
      case _ => col(tsCol).cast("long")
    }

  /** 0..nBatches-1 assignment by equal ts ranges — the deterministic,
    * engine-replayable batch split the streaming oracles share (the
    * bounds agg is bounded driver metadata: two longs). Empty table ⇒
    * null bounds ⇒ every (nonexistent) row maps to batch 0 and the
    * replay still runs with the right schema. */
  def tsRangeBatch(table: DataFrame, tsCol: String, nBatches: Int): Column = {
    val tsOrd = tsOrdinal(table, tsCol)
    val bounds = table.agg(min(tsOrd), max(tsOrd)).head()
    val (t0, t1) =
      if (bounds.isNullAt(0)) (0L, 0L)
      else (bounds.getLong(0), bounds.getLong(1))
    floor((tsOrd - t0).cast("double") * nBatches /
      (t1 - t0 + 1)).cast("int")
  }

  /**
   * Stage `table` as `nBatches` file groups ordered by `batchCol` and
   * return a file-source stream that replays them in that order.
   *
   * Batch k is staged as exactly `batchFiles` files stamped with a
   * fixed, strictly increasing per-batch mtime: the file stream
   * source orders by modification time, so with
   * `maxFilesPerTrigger = batchFiles` the query replays the batches
   * in order (files WITHIN a batch may process in any order — the
   * caller's semantics must not depend on intra-batch order). This is
   * replay-harness granularity, not a production write shape:
   * production feeds [[start]] / the transforms from a real stream
   * source and nothing is staged.
   */
  def stagedStream(
      spark: SparkSession, table: DataFrame, batchCol: Column,
      nBatches: Int, inDir: String, batchFiles: Int = 1): DataFrame = {
    val schema = stageBatches(spark, table, batchCol, nBatches,
      inDir, batchFiles)
    readStaged(spark, inDir, schema, batchFiles)
  }

  /** The staging half of [[stagedStream]]: write the batch files and
    * return the row schema — so several replay queries over the SAME
    * staged inputs (the three interval-join variants certify three
    * join types of one input pair) stage ONCE and each attach their
    * own stream via [[readStaged]]. */
  def stageBatches(
      spark: SparkSession, table: DataFrame, batchCol: Column,
      nBatches: Int, inDir: String, batchFiles: Int = 1)
      : org.apache.spark.sql.types.StructType = {
    val batched = table.withColumn("__batch", batchCol)
    val mtimeBase = 1000000000000L // fixed: replay order, not wall time
    if (batchFiles == 1) {
      // single staging job: hash-partitioning on __batch puts all of a
      // batch's rows in one task, and the dynamic-partition writer
      // splits per __batch=k/ dir — exactly one file per batch in ONE
      // Spark job instead of nBatches sequential filter+write jobs
      // (each a full pass over the table). The driver then flattens
      // the k subdirs into inDir with the per-batch mtime the file
      // source orders on — bounded metadata work (nBatches renames).
      val staging = s"$inDir/__staging"
      batched.repartition(nBatches, col("__batch"))
        .write.partitionBy("__batch").mode("overwrite").parquet(staging)
      (0 until nBatches).foreach { k =>
        Option(new java.io.File(s"$staging/__batch=$k").listFiles())
          .getOrElse(Array.empty)
          .filter(_.getName.endsWith(".parquet"))
          .foreach { f =>
            // prefix with the batch index: a task that writes several
            // __batch=k/ dirs reuses ONE part-file name across them,
            // so flattening without the prefix silently overwrites
            val dst = new java.io.File(inDir, s"b$k-${f.getName}")
            if (!f.renameTo(dst))
              sys.error(s"stagedStream: rename failed for ${f.getPath}")
            dst.setLastModified(mtimeBase + k * 60000L)
          }
      }
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(staging))
    } else {
      val stamped = scala.collection.mutable.Set.empty[String]
      (0 until nBatches).foreach { k =>
        batched.filter(col("__batch") === k).drop("__batch")
          .repartition(batchFiles)
          .write.mode("append").parquet(inDir)
        Option(new java.io.File(inDir).listFiles()).getOrElse(Array.empty)
          .filter(f => f.getName.endsWith(".parquet") &&
            !stamped.contains(f.getName))
          .foreach { f =>
            f.setLastModified(mtimeBase + k * 60000L)
            stamped += f.getName
          }
      }
    }
    batched.drop("__batch").schema
  }

  /** The read half of [[stagedStream]]: a file-source stream over an
    * already-staged batch dir (mtime-ordered replay). */
  def readStaged(
      spark: SparkSession, inDir: String,
      schema: org.apache.spark.sql.types.StructType,
      batchFiles: Int = 1): DataFrame =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", batchFiles.toString).parquet(inDir)

  private val replayNames = new java.util.concurrent.atomic.AtomicLong(0L)

  /**
   * Certification replay for STATELESS-sink streaming transforms:
   * stage `table` into `batchCol`-ordered micro-batches, run
   * `transform` over the staged stream in Append mode into a memory
   * sink, and return the sink's content.
   *
   * The memory sink collects to the driver, so this is ONLY for
   * transforms whose output fits one machine at certification scale
   * (windowed counts, the gate-sized join pair list) — it is the
   * oracle bridge that lets DuckDB replay watermark semantics, not a
   * production sink (production `writeStream`s to
   * files/Kafka/foreachBatch). The sink table is snapshotted and
   * dropped before returning, so repeated replays don't accumulate
   * driver heap.
   */
  def replayTransform(
      spark: SparkSession, table: DataFrame, batchCol: Column,
      workDir: String, nBatches: Int = 4, batchFiles: Int = 1,
      outputMode: OutputMode = OutputMode.Append)(
      transform: DataFrame => DataFrame): DataFrame = {
    val stream = stagedStream(spark, table, batchCol, nBatches,
      s"$workDir/in", batchFiles)
    runToMemorySink(spark, transform(stream), workDir, outputMode)
  }

  /**
   * Two-stream variant of [[replayTransform]] for stream-STREAM
   * operators (interval joins): both sides are staged with the SAME
   * `batchCol` (so micro-batch k of each side covers the same ts
   * range — compute it once over the union table and it resolves
   * against either side), and the query advances them in lockstep:
   * each AvailableNow micro-batch takes the next mtime-ordered file
   * from BOTH sources. The global watermark is the min across
   * sources, so neither side can race ahead and evict state the
   * other still needs.
   */
  def replayTransform2(
      spark: SparkSession, left: DataFrame, right: DataFrame,
      batchCol: Column, workDir: String, nBatches: Int = 4)(
      transform: (DataFrame, DataFrame) => DataFrame): DataFrame = {
    val ls = stagedStream(spark, left, batchCol, nBatches, s"$workDir/inL")
    val rs = stagedStream(spark, right, batchCol, nBatches, s"$workDir/inR")
    runToMemorySink(spark, transform(ls, rs), workDir)
  }

  /** [[replayTransform2]] over PRE-staged input dirs: the staging is
    * input-shaped, not query-shaped, so N queries over one input
    * pair (the three interval-join types) share one [[stageBatches]]
    * pass and pay only their own replay. `workDir` must still be
    * query-private (it holds the checkpoint). */
  def replayTransform2Staged(
      spark: SparkSession, inL: String, inR: String,
      schema: org.apache.spark.sql.types.StructType, workDir: String)(
      transform: (DataFrame, DataFrame) => DataFrame): DataFrame =
    runToMemorySink(spark,
      transform(readStaged(spark, inL, schema),
        readStaged(spark, inR, schema)), workDir)

  /**
   * foreachBatch replay for per-micro-batch BATCH transforms — stream
   * shapes a streaming plan cannot express (a banded candidate join
   * with its own aggregations against a static corpus, the parity
   * diff cycle, anything with a `distinct`/`collect_list` that is
   * per-ingest-batch, not per-stream). Stages `table` into
   * `nBatches`, drives the stream with `foreachBatch` applying
   * `perBatch` to each micro-batch, appends the result stamped with
   * the batch ordinal (`__batch`) to a distributed parquet sink, and
   * returns the sink contents. Production is the same `foreachBatch`
   * against a real source; output never touches the driver.
   */
  def replayForeachBatch(
      spark: SparkSession, table: DataFrame, batchCol: Column,
      workDir: String, nBatches: Int = 4)(
      perBatch: DataFrame => DataFrame): DataFrame = {
    val stream = stagedStream(spark, table, batchCol, nBatches,
      s"$workDir/in")
    val outDir = s"$workDir/fb_out"
    // schema anchor for the all-empty case — no action is triggered
    val outSchema = perBatch(table.limit(0))
      .withColumn("__batch", lit(0L)).schema
    val q = stream.writeStream
      .option("checkpointLocation", s"$workDir/fb_chk")
      .trigger(Trigger.AvailableNow())
      .foreachBatch {
        (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
          val b = batch.toDF()
          // Stamp with the STAGED batch ordinal re-derived from the
          // rows (all rows of a staged file share one batchCol value
          // by construction), NOT the stream's batchId: an EMPTY
          // staged batch writes no file, so later batchIds shift down
          // and would silently desync the stamps from the staging key.
          // The "one value per micro-batch" invariant holds only while
          // maxFilesPerTrigger matches the per-batch file count — so
          // ASSERT it instead of sampling one row (which would
          // silently mis-stamp a multi-batch trigger, and NPE on a
          // NULL ordinal). Single-valuedness via ONE min/max
          // aggregation pass — no distinct shuffle, one Spark job
          // (r15 ADVICE); nulls counted explicitly since min/max
          // skip them. Fail-fast on a multi-batch trigger is
          // deliberate: silent mis-stamping corrupts the replay.
          val s = b.agg(
            min(batchCol.cast("long")).as("mn"),
            max(batchCol.cast("long")).as("mx"),
            count(lit(1)).as("n"),
            count(when(batchCol.isNull, lit(1))).as("nNull")).head()
          require(s.getLong(3) == 0L,
            "replayForeachBatch: staged batch ordinal is NULL")
          require(s.getLong(2) == 0L || s.getLong(0) == s.getLong(1),
            "replayForeachBatch: micro-batch spans more than one " +
              "staged batch — the maxFilesPerTrigger/per-batch-file " +
              "invariant is violated; stamps would desync")
          val ord = if (s.getLong(2) == 0L) None else Some(s.getLong(0))
          ord.foreach { o =>
            perBatch(b)
              .withColumn("__batch", lit(o))
              .write.mode("append").parquet(outDir)
          }
          ()
      }
      .start()
    if (!q.awaitTermination(replayTimeoutMs)) {
      q.stop()
      sys.error("replayForeachBatch: streaming query did not terminate")
    }
    val hasData = Option(new java.io.File(outDir).listFiles())
      .exists(_.exists(_.getName.endsWith(".parquet")))
    if (hasData) spark.read.parquet(outDir)
    else spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), outSchema)
  }

  private def runToMemorySink(
      spark: SparkSession, out: DataFrame, workDir: String,
      outputMode: OutputMode = OutputMode.Append): DataFrame = {
    val name = s"graft_replay_${replayNames.incrementAndGet()}"
    // Replay-harness scope only: each stateful operator opens one state
    // store per shuffle partition per micro-batch (a stream-stream join
    // opens FOUR), so 32 partitions x 4 batches is hundreds of store
    // open/commit cycles for certification-scale data. 8 partitions
    // keeps the distributed shape (results are partitioning-invariant)
    // and cuts the fixed replay cost ~proportionally. The partition
    // count is pinned into the checkpoint at the first batch, so it
    // must be set BEFORE start(); production callers run start()
    // themselves and are untouched.
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    // Replay checkpoints are never resumed (each replay certifies one
    // deterministic run, then the dir is garbage) — so their WAL /
    // offset-log / state-store fsyncs buy nothing. Place them on
    // tmpfs when available and delete on completion; PRODUCTION
    // checkpoints are the [[start]] caller's path and stay durable.
    val shm = new java.io.File("/dev/shm")
    val chkDir =
      if (shm.isDirectory && shm.canWrite)
        java.nio.file.Files
          .createTempDirectory(shm.toPath, "graft_chk_").toString
      else s"$workDir/chk"
    // Append-mode replays land in a DISTRIBUTED parquet sink and read
    // back through the sink's own _spark_metadata log — output never
    // touches the driver, at any volume (retires the memory-sink
    // collect the stream-join/enrich rows used to pay). Update mode
    // has no file-sink support in Spark, so it keeps the memory sink
    // — its certified rows emit per-touched-key deltas, gate-sized by
    // construction.
    val outDir = s"$workDir/replay_out_$name"
    val append = outputMode == OutputMode.Append
    try {
      val writer = out.writeStream
        .outputMode(outputMode)
        .option("checkpointLocation", chkDir)
        .trigger(Trigger.AvailableNow())
      val q =
        if (append) writer.format("parquet").option("path", outDir).start()
        else writer.format("memory").queryName(name).start()
      if (!q.awaitTermination(replayTimeoutMs)) {
        q.stop() // don't leave an orphaned stream contending for cores
        sys.error("replayTransform: streaming query did not terminate")
      }
      // restored only after termination: the stream clones the session
      // conf when its query thread initializes, which can be AFTER
      // start() returns — restoring earlier would race the clone
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      if (chkDir.startsWith("/dev/shm")) {
        try org.apache.commons.io.FileUtils
          .deleteDirectory(new java.io.File(chkDir))
        catch { case scala.util.control.NonFatal(_) => () }
      }
    }
    if (append) {
      // an all-empty replay commits no data files — preserve the
      // transform's schema instead of failing parquet inference
      val hasData = Option(new java.io.File(outDir).listFiles())
        .exists(_.exists(_.getName.endsWith(".parquet")))
      if (hasData) spark.read.parquet(outDir)
      else spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), out.schema)
    } else {
      // the memory sink pins the result on the driver for the JVM's
      // lifetime (clearCache does not release it) — snapshot to
      // executor-side blocks and drop the sink table so repeated
      // replays (bench min-of-3, retries) don't accumulate driver heap
      val snap = spark.table(name).localCheckpoint()
      spark.catalog.dropTempView(name)
      snap
    }
  }

  /**
   * Streaming exact dedup — the streaming tier of
   * [[graft.ext.Dedup.exact]]: fingerprint each document and drop
   * duplicate fingerprints within the watermark horizon.
   * `dropDuplicatesWithinWatermark` EVICTS state older than the
   * watermark, so state is bounded by (arrival rate × horizon) —
   * plain `dropDuplicates` on a stream grows state forever, which is
   * the difference between a pipeline that runs for months and one
   * that OOMs.
   *
   * Probed semantics (Spark 4.1.2, micro-batch replay): state expiry
   * is FIXED at first-kept event time + delay — a dropped duplicate
   * does NOT extend it — and eviction during batch N uses the
   * watermark derived from batches <= N-2 (the EVICTION watermark
   * lags one batch behind the late-row watermark; fitted exactly
   * against a 4-batch replay and pinned by the q_stream_dedup oracle
   * row), so a re-arrival after eviction emits again. The GENERAL
   * operator is spec-pinned rather than oracle-certified: within a
   * micro-batch the surviving duplicate is iteration-order
   * nondeterministic, and its event time sets the state expiry, so
   * the emitted set is not a deterministic function of the data
   * whenever a fingerprint has same-batch duplicates with distinct
   * timestamps. The certified q_stream_dedup row closes that gap by
   * construction — its input is pre-deduplicated per (key, batch) to
   * the min-(ts, id) row, making the survivor (and therefore the
   * whole emitted set) deterministic and engine-replayable.
   */
  def streamingDedup(
      docs: DataFrame, textCol: String = "text",
      tsCol: String = "ts", watermark: String = "10 minutes"): DataFrame =
    docs
      .withColumn("fingerprint",
        graft.ext.TextAnalysis.fingerprint(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("fingerprint")

  /** Watermarked tumbling-window aggregation over an event stream. */
  def windowedCounts(
      events: DataFrame,
      watermark: String = "10 minutes",
      window_ : String = "5 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("value") * 100).cast("long")).as("value_cents"))

  /**
   * Watermarked SESSION-window aggregation: per-user sessions that
   * close after `gap` of inactivity. Spark merges an event into the
   * running session iff its ts is within `gap` of the session end
   * INCLUSIVE (spec-pinned on the exact-gap boundary), so the batch
   * equivalent is gaps-and-islands with a new session at inter-event
   * gap strictly > `gap` — the same convention as the batch
   * sessionize operator. In Append mode a session emits when the
   * watermark passes its end (= last event ts + gap); state is one
   * open session per active user, evicted on emission.
   */
  def sessionCounts(
      events: DataFrame, gap: String = "30 minutes",
      watermark: String = "0 seconds"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("value") * 100).cast("long")).as("value_cents"))

  /**
   * Watermarked stream-stream interval join: each right-side row
   * joins left-side rows of the same key whose timestamp precedes it
   * by at most `horizon` (click-to-view attribution, impression
   * matching). BOTH sides carry watermarks and the join predicate
   * bounds the time range in BOTH directions — that is what lets
   * Spark evict join state; an unbounded stream-stream join grows
   * state forever (the same class of leak streamingDedup avoids).
   *
   * Output schema: `key` once, then every other column of each side
   * prefixed `l_` / `r_` (so `l_ts`, `r_ts`) — no duplicate names,
   * usable without side aliases. The join condition is built with the
   * Column API, so key/timestamp names needing quoting just work.
   */
  /** Stream-stream interval join. `joinType` "inner" (default) or
    * "left_outer": the outer variant emits a null-extended row when
    * the watermark evicts an unmatched left row from state — under
    * the ts-range replay the emitted null set is exactly the left
    * rows with no match whose `ts + horizon` falls strictly before
    * the FINAL global watermark `min(max left ts, max right ts)`
    * (probed on Spark 4.1.2; left rows closer to stream end stay in
    * state when the stream drains and never null-emit — the
    * streaming-vs-batch outer-join divergence by design). */
  def streamIntervalJoin(
      left: DataFrame, right: DataFrame, key: String,
      tsCol: String = "ts", watermark: String = "10 minutes",
      horizon: String = "30 minutes",
      joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark(tsCol, watermark)
    val r = right.withWatermark(tsCol, watermark)
    val joined = l.join(r,
      l.col(key) === r.col(key) &&
        r.col(tsCol) >= l.col(tsCol) &&
        r.col(tsCol) <= l.col(tsCol) + expr(s"interval $horizon"),
      joinType)
    // coalesce: a right-null-extended row (full/right outer) has no
    // left side — taking l.key verbatim would blank the join key
    val out =
      coalesce(l.col(key), r.col(key)).as(key) +:
        (left.columns.filter(_ != key).map(c => l.col(c).as(s"l_$c")) ++
          right.columns.filter(_ != key).map(c => r.col(c).as(s"r_$c")))
    joined.select(out.toIndexedSeq: _*)
  }

  final case class SessionEvent(user_id: Long, ts: java.sql.Timestamp,
      value: Double)
  final case class SessionState(nEvents: Long, totalCents: Long,
      lastTs: Long)
  final case class SessionOutput(user_id: Long, nEvents: Long,
      totalCents: Long, closed: Boolean)

  /**
   * Custom keyed state: per-user running session via
   * flatMapGroupsWithState with processing-time timeout — emits a
   * closed-session row when a user goes quiet.
   */
  def sessionize(events: Dataset[SessionEvent],
      timeoutMs: Long = 30 * 60 * 1000): Dataset[SessionOutput] = {
    import events.sparkSession.implicits._
    // timeoutMs <= 0 disables the inactivity timeout (useful for
    // deterministic tests; production uses the timeout to emit
    // closed-session records when a user goes quiet)
    val timeoutConf =
      if (timeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOutput](
        OutputMode.Append, timeoutConf) {
        (userId: Long, rows: Iterator[SessionEvent],
         state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOutput(userId, s.nEvents, s.totalCents, closed = true))
          } else {
            val evs = rows.toSeq
            val prev = state.getOption.getOrElse(SessionState(0L, 0L, 0L))
            val next = SessionState(
              prev.nEvents + evs.size,
              prev.totalCents + evs.map(e => math.floor(e.value * 100).toLong).sum,
              evs.map(_.ts.getTime).maxOption.getOrElse(prev.lastTs))
            state.update(next)
            if (timeoutMs > 0) state.setTimeoutDuration(timeoutMs)
            Iterator(SessionOutput(userId, next.nEvents, next.totalCents,
              closed = false))
          }
      }
  }
}
