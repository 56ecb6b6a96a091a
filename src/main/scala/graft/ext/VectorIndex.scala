package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Persisted IVF-PQ vector index — the build-once / probe-many split a
 * production vector store runs on, instead of re-training centroids
 * and re-encoding the corpus inside every query
 * (cf. `q_ann_ivf_trained`, which certifies the in-query path).
 *
 * Layout under the index root (all parquet):
 *  - `centroids/`  (cell, centroid)           — nCells rows
 *  - `codebooks/`  (subspace, code, codeword) — m·k rows
 *  - `corpus/seg=<k>/` (id, codes, vec, cell, __cbucket=…) — each
 *    segment PARTITIONED BY the bounded cell bucket, rows sorted by
 *    cell within (the IVF inverted lists ARE the partition layout);
 *    refreshes APPEND one delta-sized segment and mask drops via the
 *    `tomb/` ledger ([[graft.util.GenIndex.readSegmented]]) — the
 *    delta-proportional-commit layout, compacted past
 *    [[graft.util.GenIndex.MaxSegments]] segments
 *
 * Commit discipline: every build/refresh stages the full next state
 * under `<root>.staging` and swaps it in through a manifest-logged
 * whole-dir move (the FileTarget two-phase-commit pattern,
 * `targets/DataTarget.scala`): a crash anywhere between manifest
 * write and delete is completed idempotently by the next
 * open/build/refresh — readers never observe a half-written index.
 *
 * Refresh is ChangeSet-driven ([[refresh]]): re-encode ONLY the
 * added+updated vectors, drop the removed+updated ids, keep the
 * trained model tables untouched (retraining is a deliberate,
 * separate [[build]] — the FAISS/IVF operational convention). The
 * model tables are the only driver-side reads (nCells + m·k rows —
 * bounded index METADATA, same discipline as the ≤2048-vector
 * training samples); corpus vectors never collect.
 */
object VectorIndex {

  private def centroidsPath(root: String) = s"$root/centroids"
  private def codebooksPath(root: String) = s"$root/codebooks"
  private def corpusPath(root: String) = s"$root/corpus"
  private def tombPath(root: String) = s"$root/tomb"
  private def manifestFile(root: String) = root + ".swap-manifest"

  /** LIVE corpus rows (segments unioned, tombstone ledger applied) —
    * the read every probe and refresh plans against. Public: the
    * spec-side view of committed state. */
  def corpusTable(spark: SparkSession, root: String): DataFrame =
    graft.util.GenIndex.readSegmented(
      spark, corpusPath(root), tombPath(root))

  private def commitSwap(root: String, staging: String): Unit =
    graft.util.SwapCommit.commit(root, staging, manifestFile(root))

  /** Crash recovery: a pending manifest means the last build/refresh
    * staged fully but died mid-swap — finish it. Every reader/writer
    * calls this first. */
  def recover(root: String): Unit =
    graft.util.SwapCommit.recover(root, manifestFile(root))

  private def stageModel(
      spark: SparkSession, staging: String,
      cents: Seq[Seq[Float]], cbs: Seq[Seq[Seq[Float]]]): Unit = {
    import spark.implicits._
    cents.zipWithIndex.map { case (c, i) => (i, c) }
      .toDF("cell", "centroid")
      .repartition(1).write.parquet(centroidsPath(staging))
    cbs.zipWithIndex.flatMap { case (book, j) =>
      book.zipWithIndex.map { case (cw, c) => (j, c, cw) }
    }.toDF("subspace", "code", "codeword")
      .repartition(1).write.parquet(codebooksPath(staging))
  }

  /** Fixed count of corpus partition DIRECTORIES. A `partitionBy`
    * over the raw cell id writes one dir per cell — fine at the
    * pinned certification cell counts, absurd under occupancy sizing
    * (nCells ∝ corpus: ~4M dirs at 10⁹ vectors, where dir listing
    * alone dwarfs the probe). Cells hash into a BOUNDED set of
    * `__cbucket` dirs instead, with rows SORTED BY `cell` inside each
    * bucket: dynamic partition pruning narrows the scan to the probed
    * buckets, and parquet row-group stats on the sorted cell column
    * prune within them — two-level pruning whose dir count never
    * grows with the corpus. (pmod keeps small pinned indexes
    * one-cell-per-dir: nCells ≤ 64 ⇒ bucket == cell.) */
  private val CorpusBuckets = 64

  private def bucketOfCell(cell: Column): Column =
    pmod(cell, lit(CorpusBuckets))

  private def writeCorpus(
      spark: SparkSession, segDir: String, encoded: DataFrame): Unit =
    encoded.withColumn("__cbucket", bucketOfCell(col("cell")))
      .repartition(col("__cbucket"))
      .sortWithinPartitions(col("cell"))
      .write.partitionBy("__cbucket").parquet(segDir)

  private def stageCorpus(
      spark: SparkSession, staging: String, encoded: DataFrame): Unit = {
    writeCorpus(spark, s"${corpusPath(staging)}/seg=0", encoded)
    // Degenerate (zero-row) corpus: a partitionBy write of an empty
    // frame leaves no data file to infer a schema from. Detected
    // driver-side AFTER the single write (a pre-probe of the plan —
    // the old persist+isEmpty — cost a second partial execution of
    // the possibly refresh-merged plan); the empty marker then
    // rewrites flat from an explicit empty frame (no plan
    // re-execution), with `__cbucket` as a data column — the probe
    // join handles that identically, it just loses pruning.
    graft.util.GenIndex.ensureSegReadable(spark, corpusPath(staging),
      s"${corpusPath(staging)}/seg=0",
      encoded.withColumn("__cbucket", lit(0)).schema)
  }

  /** Stage the REFRESHED corpus into `dir` — DELTA-PROPORTIONAL via
    * the segment/tombstone layout ([[graft.util.GenIndex]] scaladoc):
    * Spark writes ONE delta-sized `seg=<k>` (the re-encoded changed
    * vectors) plus the tombstone ledger; previous segments hard-link
    * forward. Past [[graft.util.GenIndex.MaxSegments]] segments the
    * refresh COMPACTS — a full rewrite of the live state into a
    * fresh seg=0 with the ledger cleared. `deltaCommit = false`
    * forces the compaction path (the [[graft.tools.RefreshScale]]
    * A/B hook); legacy/degenerate layouts fall back automatically. */
  private def stageRefreshedCorpus(
      spark: SparkSession, dir: String, prevRoot: String,
      changedVecs: DataFrame, droppedIds: DataFrame,
      cents: Seq[Seq[Float]], cbs: Seq[Seq[Seq[Float]]],
      idCol: String, vecCol: String, deltaCommit: Boolean): Unit = {
    val prev = corpusTable(spark, prevRoot).drop("__cbucket")
    // carry EVERY corpus column except the layout bucket — metadata
    // columns a build declared ride through refreshes; changedVecs
    // must carry them under the same names
    val metaCols = prev.columns.toSeq
      .filterNot(Set("id", "codes", "vec", "cell"))
    val drop = droppedIds.select(col("id"))
    val segs = graft.util.GenIndex.segValues(corpusPath(prevRoot))
    if (deltaCommit && segs.nonEmpty &&
        segs.size < graft.util.GenIndex.MaxSegments) {
      val sv = segs.max + 1
      // delta segment and tombstone ledger are independent writes —
      // overlap them (the DedupIndex.refresh writeAll discipline)
      graft.util.GenIndex.writeAll(
        () => {
          writeCorpus(spark, s"${corpusPath(dir)}/seg=$sv",
            encode(changedVecs, cents, cbs, idCol, vecCol, metaCols))
          graft.util.GenIndex.carrySegs(
            corpusPath(prevRoot), corpusPath(dir))
        },
        () => graft.util.GenIndex.stageTomb(spark, tombPath(prevRoot),
          tombPath(dir), drop, sv))
    } else {
      val kept = prev.join(drop, Seq("id"), "left_anti")
      val merged = kept.unionByName(
        encode(changedVecs, cents, cbs, idCol, vecCol, metaCols))
      stageCorpus(spark, dir, merged)
    }
  }

  /** One-pass corpus encode: cell assignment + PQ codes + the raw
    * vector (kept for the exact re-rank fetch) + any carried
    * metadata columns (the filtered-probe payload), using the exact
    * [[Similarity.pqEncode]] / [[Similarity.centroidAssign]]
    * semantics. */
  private def encode(
      corpus: DataFrame, cents: Seq[Seq[Float]],
      cbs: Seq[Seq[Seq[Float]]], idCol: String,
      vecCol: String, metaCols: Seq[String]): DataFrame =
    graft.util.Tables.spread(corpus).select(
      Seq(col(idCol).as("id"),
        Similarity.pqCodesCol(col(vecCol), cbs).as("codes"),
        col(vecCol).as("vec"),
        Similarity.centroidAssign(col(vecCol), cents).as("cell")) ++
        metaCols.map(col): _*)

  /**
   * Train (centroids + codebooks) and encode the whole corpus, then
   * commit the staged index. The ONLY full-corpus passes are ONE
   * deterministic 2048-row training-sample scan (shared by both
   * trainers — [[Similarity.trainSample]]) and the one encode scan.
   */
  /** Train + encode + write a COMPLETE index layout into `dir` —
    * shared by the in-place swap ([[build]]) and generation-pointer
    * ([[buildGen]]) commit disciplines. */
  private def stageFull(
      spark: SparkSession, dir: String, corpus: DataFrame,
      nCells: Int, m: Int, k: Int, idCol: String,
      vecCol: String, sampleN: Int = 2048,
      metaCols: Seq[String] = Nil): Unit = {
    val sample = Similarity.trainSample(corpus, sampleN,
      idCol = idCol, vecCol = vecCol)
    val cents = Similarity.trainCentroidsOnSample(sample, nCells)
    val cbs = Similarity.trainPqCodebooksOnSample(sample, m = m, k = k)
    val enc =
      if (cents.isEmpty || cbs.isEmpty)
        // degenerate training corpus ⇒ empty index, schema preserved
        corpus.select(Seq(col(idCol).as("id"),
          array().cast("array<int>").as("codes"),
          col(vecCol).as("vec"), lit(0).as("cell")) ++
          metaCols.map(col): _*).limit(0)
      else encode(corpus, cents, cbs, idCol, vecCol, metaCols)
    graft.util.SwapCommit.deleteRec(dir)
    // the model tables and the encoded corpus are independent writes
    // into the same staging dir — overlap them (the DedupIndex.build
    // writeAll discipline); all settle before the caller commits
    graft.util.GenIndex.writeAll(
      () => stageModel(spark, dir, cents, cbs),
      () => stageCorpus(spark, dir, enc))
  }

  /** `metaCols`: corpus columns carried verbatim into the index's
    * corpus table — the payload [[probe]]'s `filter` evaluates
    * against (filtered vector search served FROM the index, predicate
    * pushed to the parquet scan). */
  def build(
      spark: SparkSession, corpus: DataFrame, root: String,
      nCells: Int = 8, m: Int = 16, k: Int = 32,
      idCol: String = "vec_id", vecCol: String = "embedding",
      metaCols: Seq[String] = Nil): Unit = {
    recover(root)
    val staging = root + ".staging"
    stageFull(spark, staging, corpus, nCells, m, k, idCol, vecCol,
      metaCols = metaCols)
    commitSwap(root, staging)
  }

  /** [[build]] with the cell count SIZED FROM THE CORPUS
    * ([[Similarity.sizedCells]]: constant expected occupancy) — the
    * production entry point at scale. The pinned-nCells [[build]] is
    * the oracle-certification shape: its exhaustive-recall oracle
    * probes at TOTAL cell coverage, which makes the ADC candidate
    * volume O(|queries|·n) — measured 7.0× wall for 3.3× data at
    * 100× key-growth (BASELINE.md r16). Sizing holds candidates per
    * query at O(nProbe · targetPerCell) instead, trading recall the
    * IVF way (a true neighbor can land outside the probed cells);
    * raise nProbe/targetPerCell for recall-critical serving. The
    * training sample grows with the cell count (≥16 samples per
    * centroid, capped) so Lloyd's rounds still see enough points per
    * cell; it stays bounded driver-side metadata. Returns the cell
    * count chosen. */
  def buildAuto(
      spark: SparkSession, corpus: DataFrame, root: String,
      targetPerCell: Int = 256, m: Int = 16, k: Int = 32,
      idCol: String = "vec_id", vecCol: String = "embedding",
      metaCols: Seq[String] = Nil): Int = {
    recover(root)
    val n = corpus.filter(col(vecCol).isNotNull).count()
    val nCells = Similarity.sizedCells(n, targetPerCell, floor = 8)
    val sampleN = math.min(65536, math.max(2048, 16 * nCells))
    val staging = root + ".staging"
    stageFull(spark, staging, corpus, nCells, m, k, idCol, vecCol,
      sampleN, metaCols)
    commitSwap(root, staging)
    nCells
  }

  /** [[build]] under the GENERATION-POINTER commit
    * ([[graft.util.GenSwap]]): the index is written as an immutable
    * `root/gen-<n>` dir and `root/CURRENT` flips to it. Use this
    * layout when probes must keep serving ACROSS refreshes (the
    * in-place swap fails pre-swap plans loudly — see the spec) or
    * when the index lives on an object store, where the whole-dir
    * rename swap is a per-object copy. */
  def buildGen(
      spark: SparkSession, corpus: DataFrame, root: String,
      nCells: Int = 8, m: Int = 16, k: Int = 32,
      idCol: String = "vec_id", vecCol: String = "embedding",
      metaCols: Seq[String] = Nil): Unit = {
    val gen = graft.util.GenSwap.nextDir(root)
    stageFull(spark, gen, corpus, nCells, m, k, idCol, vecCol,
      metaCols = metaCols)
    graft.util.GenSwap.commit(root, gen)
  }

  private def readCentroids(
      spark: SparkSession, root: String): Seq[Seq[Float]] =
    spark.read.parquet(centroidsPath(root)).orderBy(col("cell"))
      .collect().map(_.getSeq[Float](1).toSeq).toSeq

  private def readCodebooks(
      spark: SparkSession, root: String): Seq[Seq[Seq[Float]]] =
    spark.read.parquet(codebooksPath(root))
      .orderBy(col("subspace"), col("code")).collect()
      .groupBy(_.getInt(0)).toSeq.sortBy(_._1)
      .map(_._2.map(_.getSeq[Float](2).toSeq).toSeq)

  // Serving-side model cache: the trained tables are bounded index
  // METADATA (nCells + m·k rows), but each probe otherwise pays two
  // driver-side Spark reads for them — a server keeps the model hot
  // and revalidates against the files. Keyed on the model files'
  // (name, size, mtime) fingerprint, so any build/refresh commit
  // (which rewrites or re-copies the model dirs) naturally misses and
  // re-reads; bounded like the plane-matrix cache.
  private val MaxModelEntries = 32
  private val modelCache = new java.util.concurrent.ConcurrentHashMap[
    String, (Seq[Seq[Float]], Seq[Seq[Seq[Float]]])]()

  private def dirFingerprint(path: String): String =
    graft.util.Fs.fingerprint(path)

  private def readModel(spark: SparkSession, root: String)
      : (Seq[Seq[Float]], Seq[Seq[Seq[Float]]]) = {
    val key = root + "#" + dirFingerprint(centroidsPath(root)) +
      "#" + dirFingerprint(codebooksPath(root))
    val hit = modelCache.get(key)
    if (hit != null) return hit
    if (modelCache.size >= MaxModelEntries) modelCache.clear()
    modelCache.computeIfAbsent(key, _ =>
      (readCentroids(spark, root), readCodebooks(spark, root)))
  }

  /**
   * ChangeSet-driven incremental refresh: `changedVecs` (added ∪
   * updated, with idCol/vecCol) re-encode under the EXISTING model;
   * `droppedIds` (removed ∪ updated, one `id` column) drop. The
   * next state commits through the same manifest swap. The staged
   * corpus is DELTA-PROPORTIONAL ([[stageRefreshedCorpus]]): one
   * delta-sized segment + the tombstone ledger Spark-write; previous
   * segments hard-link into staging, and the links survive the
   * swap's delete of the live dir. Reader consequence (spec-pinned):
   * a plan captured before a DELTA refresh keeps serving the
   * complete OLD state (its segment files persist under the same
   * names) — consistent-stale, never mixed; a COMPACTION refresh
   * (segment bound reached, or `deltaCommit = false`) replaces the
   * file set and fails pre-swap plans loudly.
   */
  def refresh(
      spark: SparkSession, root: String, changedVecs: DataFrame,
      droppedIds: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding", deltaCommit: Boolean = true): Unit = {
    recover(root)
    val (cents, cbs) = readModel(spark, root)
    if (cents.isEmpty || cbs.isEmpty) {
      // a degenerate (empty-corpus) build stored no model — new
      // vectors CANNOT encode against it; silently committing an
      // index without them would report success while dropping data
      if (!changedVecs.isEmpty)
        throw new IllegalStateException(
          s"vector index at $root has no trained model — rebuild " +
            "before refreshing with new vectors")
      return
    }
    // safe to plan lazily over the previous state: the staging write
    // fully materializes into <root>.staging BEFORE commitSwap
    // deletes the live dir
    val staging = root + ".staging"
    graft.util.SwapCommit.deleteRec(staging)
    // the model tables are untouched by a refresh (retraining is a
    // deliberate, separate build) — carry them into staging with a
    // driver-side file copy (bounded index metadata: nCells + m·k
    // rows) instead of two Spark re-write jobs
    graft.util.SwapCommit.copyRec(
      centroidsPath(root), centroidsPath(staging))
    graft.util.SwapCommit.copyRec(
      codebooksPath(root), codebooksPath(staging))
    stageRefreshedCorpus(spark, staging, root,
      changedVecs, droppedIds, cents, cbs, idCol, vecCol, deltaCommit)
    commitSwap(root, staging)
  }

  /** [[refresh]] under the generation-pointer commit: reads the
    * CURRENT generation, stages the merged corpus (and the unchanged
    * model tables — a driver-side copy of bounded metadata) into a
    * FRESH `gen-<n+1>` dir, then flips the pointer. The previous
    * generation stays on disk until the commit after next, so a
    * reader that resolved it mid-refresh keeps a complete, immutable
    * index — zero-downtime serving (asserted in VectorIndexSpec). */
  def refreshGen(
      spark: SparkSession, root: String, changedVecs: DataFrame,
      droppedIds: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding", deltaCommit: Boolean = true): Unit = {
    val cur = graft.util.GenSwap.currentDir(root).getOrElse(
      throw new IllegalStateException(
        s"no committed generation at $root — buildGen first"))
    val (cents, cbs) = readModel(spark, cur)
    if (cents.isEmpty || cbs.isEmpty) {
      // same no-model guard as [[refresh]]
      if (!changedVecs.isEmpty)
        throw new IllegalStateException(
          s"vector index at $root has no trained model — rebuild " +
            "before refreshing with new vectors")
      return
    }
    val gen = graft.util.GenSwap.nextDir(root)
    graft.util.SwapCommit.copyRec(centroidsPath(cur), centroidsPath(gen))
    graft.util.SwapCommit.copyRec(codebooksPath(cur), codebooksPath(gen))
    // unlike the in-place swap there is NO read-while-write hazard to
    // reason about: the refresh plan reads the old generation and
    // writes the new one — different immutable dirs by design (and
    // the delta-narrowed path links untouched dirs between them)
    stageRefreshedCorpus(spark, gen, cur,
      changedVecs, droppedIds, cents, cbs, idCol, vecCol, deltaCommit)
    graft.util.GenSwap.commit(root, gen)
  }

  /** [[probe]] against the CURRENT generation of a
    * generation-pointer index; resolves the pointer once per call,
    * then plans against that immutable dir. Empty result when no
    * generation has committed yet (mirrors the degenerate-model
    * probe). */
  def probeGen(
      spark: SparkSession, root: String, queries: DataFrame,
      k: Int, nProbe: Int, shortlist: Int = 50,
      idCol: String = "vec_id", vecCol: String = "embedding",
      filter: Option[Column] = None): DataFrame =
    graft.util.GenSwap.currentDir(root) match {
      case Some(cur) =>
        probe(spark, cur, queries, k, nProbe, shortlist, idCol, vecCol,
          filter)
      case None =>
        queries.select(col(idCol).as("q_id"), col(idCol).as("n_id"),
          lit(0.0).as("sim"), lit(1).as("rank")).limit(0)
    }

  /** Ingest-time SEMANTIC dedup served from the persisted index —
    * the embedding-space twin of [[DedupIndex.probe]]'s minhash
    * dedup-at-ingest: each batch row probes the index for its nearest
    * indexed neighbor ([[probe]] with k = 1), and rows whose exact
    * re-ranked cosine reaches `threshold` are DROPPED as semantic
    * duplicates of already-ingested data; the survivors — the rows an
    * ingest should actually add — return with their columns
    * untouched. Only the batch pays a probe; the corpus never
    * self-compares (the q_minhash_incremental property), so the cost
    * scales with the batch, not the accumulated 100 TB state.
    *
    * Exactness contract: the drop decision compares the round-6
    * cosine (the [[probe]] output contract) of the best SHORTLISTED
    * candidate, so it equals the brute-force `max cos ≥ threshold`
    * rule whenever the true nearest neighbor survives the ADC
    * shortlist — size `shortlist` generously for near-threshold
    * corpora (the gate pins exact agreement at its settings; serving
    * trades like any IVF probe). For a PROVABLY brute-force-equal
    * decision independent of the corpus distribution, pass
    * `shortlist >= corpus size` with total cell coverage: the ADC cut
    * then never prunes anything and the refine stage ranks every
    * candidate by exact cosine — the certification shape when a
    * corpus change could erode the empirical threshold margin, at
    * O(|batch|·n) cost. A batch id that ALSO exists in the
    * index never matches itself ([[probe]]'s self-exclusion): a
    * re-ingested update is judged against its neighbors, not its own
    * stored copy. An index with no committed model (degenerate empty
    * build) drops nothing. */
  def dedupIngest(
      spark: SparkSession, root: String, batch: DataFrame,
      threshold: Double, nProbe: Int, shortlist: Int = 200,
      idCol: String = "vec_id", vecCol: String = "embedding",
      broadcastBatch: Boolean = true): DataFrame = {
    val top1 = probe(spark, root, batch, k = 1, nProbe = nProbe,
      shortlist = shortlist, idCol = idCol, vecCol = vecCol,
      broadcastQueries = broadcastBatch)
    val dupIds = top1.filter(col("sim") >= threshold)
      .select(col("q_id").as(idCol))
    batch.join(dupIds, Seq(idCol), "left_anti")
  }

  /**
   * Probe-only search: NO training, NO corpus encode — the plan
   * reads the persisted model tables (driver-side, bounded) and the
   * encoded corpus. Two corpus-table touches, both narrow: the ADC
   * scoring scan reads (id, codes, cell) ONLY — parquet column
   * pruning keeps the 4·d-byte vectors out of the scored stream —
   * and the exact re-rank fetches (id, vec) for just the
   * |queries|·shortlist surviving rows.
   *
   * `filter`: metadata predicate over columns the build carried
   * (`metaCols`) — PRE-FILTER semantics: the predicate prunes the
   * corpus BEFORE any scoring, landing in the parquet scan's
   * PushedFilters, so selective predicates shrink the scored stream
   * instead of discarding scored rows and losing k-coverage (the
   * post-filter failure mode). Queries keep their unfiltered
   * identity, matching the brute-force `q_ann_filtered` semantics.
   */
  /** `broadcastQueries`: the scoring join's strategy for the query
    * side. `true` (default) pins a broadcast — it keeps the corpus
    * scan shuffle-free and dynamic partition pruning alive, and it
    * measured 2.2× FASTER than the shuffled join even at a 40k-row
    * ingest batch over a 200k corpus (20.7 s vs 46.1 s, BASELINE.md
    * r17). `false` leaves the strategy to Spark/AQE for batches
    * whose exploded (|batch|·nProbe rows × d floats) query side no
    * longer fits a sane broadcast — the driver and every task
    * materialize that table in memory, so at some batch size the
    * pinned hint stops being an optimization and becomes an OOM. */
  def probe(
      spark: SparkSession, root: String, queries: DataFrame,
      k: Int, nProbe: Int, shortlist: Int = 50,
      idCol: String = "vec_id", vecCol: String = "embedding",
      filter: Option[Column] = None,
      broadcastQueries: Boolean = true): DataFrame = {
    require(shortlist >= k, "shortlist must be >= k")
    recover(root)
    val (cents, cbs) = readModel(spark, root)
    if (cents.isEmpty || cbs.isEmpty)
      return queries.select(col(idCol).as("q_id"), col(idCol).as("n_id"),
        lit(0.0).as("sim"), lit(1).as("rank")).limit(0)
    val corpus = filter.foldLeft(
      corpusTable(spark, root))((c, f) => c.filter(f))

    // spread() the query side: the normalize + centroid-probe
    // projection is the CPU-heavy per-query stage, and a bulk ingest
    // batch read from few parquet files otherwise runs it on
    // file-count-many tasks (measured: 7 tasks carrying 110
    // CPU-seconds at a 40k-row batch — the whole gate wall)
    val q = graft.util.Tables.spread(queries)
      .select(col(idCol).as("q_id"),
        Similarity.l2norm(col(vecCol)).as("q_norm"),
        explode(Similarity.centroidProbe(col(vecCol), cents, nProbe))
          .as("cell"))
    // the broadcast scoring join carries q_norm per candidate (it
    // must — ADC needs it), but the shortlist WINDOW exchange ships
    // only (q_id, id, adc): the d-dim vectors are projected away
    // before the shuffle and re-joined for the tiny surviving set.
    // The join key includes the `__cbucket` PARTITION column when the
    // layout has it (dynamic partition pruning to the probed buckets;
    // row-group stats on the within-bucket-sorted `cell` prune the
    // rest) — `cell` alone on pre-bucketing or degenerate-flat
    // layouts. ADC per pair via the native PqAdcScore kernel
    // (identity as in pqTopK: Σ_j dot(q_j, cw_{j,code_j}) =
    // dot(q, concat_j cw)) — no per-pair reconstruction array, no
    // interpreted HOF decode.
    val bucketed = corpus.columns.contains("__cbucket")
    val corpusKeys = if (bucketed)
      corpus.select(col("id"), col("codes"), col("cell"),
        col("__cbucket"))
    else corpus.select(col("id"), col("codes"), col("cell"))
    val qKeyed = if (bucketed)
      q.withColumn("__cbucket", bucketOfCell(col("cell")))
    else q
    val joinKeys = if (bucketed) Seq("cell", "__cbucket") else Seq("cell")
    val scored = corpusKeys
      .join(if (broadcastQueries) broadcast(qKeyed) else qKeyed,
        joinKeys)
      .filter(col("q_id") =!= col("id"))
      .select(col("q_id"), col("id"),
        graft.functions.GraftFunctions.pq_adc_score(
          col("codes"), col("q_norm"), cbs).as("adc"))
    // shortlist via the row_number window. The bounded TopK
    // aggregator (map-side partial combine) was A/B'd here at 100×
    // key-growth and did NOT beat the window (24.2 s vs 15–20 s
    // probe, same band) — the window's per-partition sort is not the
    // bottleneck at local shuffle widths, and the udaf object-agg
    // pays per-row buffer churn. Re-measure on a real cluster before
    // swapping: the aggregator's wire bound (≤ shortlist per (q_id,
    // map task)) only pays when candidates-per-query-per-task far
    // exceeds the shortlist.
    val bySl = Window.partitionBy(col("q_id"))
      .orderBy(col("adc").desc, col("id"))
    val short = scored.withColumn("slrank", row_number().over(bySl))
      .filter(col("slrank") <= shortlist)
      .select(col("q_id"), col("id"))
    val qRaw = queries.select(col(idCol).as("q_id"),
      col(vecCol).as("q_raw"))
    val refined = short
      .join(corpus.select(col("id"), col("vec")), Seq("id"))
      .join(if (broadcastQueries) broadcast(qRaw) else qRaw,
        Seq("q_id"))
      .withColumn("sim", graft.functions.GraftFunctions.cosine_sim(
        col("q_raw"), col("vec")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("id"))
    refined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("id").as("n_id"),
        round(col("sim"), 6).as("sim"), col("rank"))
  }
}
