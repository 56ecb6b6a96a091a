package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Persisted MinHash-LSH near-dup index — dedup-at-ingest served from
 * disk. [[Dedup.minhashPairsAgainst]] is the right shape for a
 * one-off batch×corpus comparison, but it RE-SHINGLES and re-bands
 * the accumulated corpus on every call — at 100 TB the daily ingest
 * would pay a full historical-corpus text pass per day. This index
 * persists what that pass computes — the banded signatures and the
 * verification shingle sets — so a probe pays only the BATCH side:
 * shingle/sign the increment, join its band buckets against the
 * stored bands, verify candidates by exact n-gram Jaccard against
 * the stored shingles. Answers are bit-identical to
 * `minhashPairsAgainst(batch, corpus)` at the same parameters (the
 * stored tables are exactly that call's intermediates).
 *
 * Layout under the generation root ([[graft.util.GenSwap]] — the
 * same O(pointer) object-store commit as every persisted state
 * here):
 *  - `gen-<n>/bands/`    (id, band, bucket) PARTITIONED BY
 *    `__bbucket = pmod(bucket, 64)`, rows sorted by (band, bucket)
 *    inside each dir: a broadcast probe joins on the partition
 *    column, so dynamic partition pruning narrows the scan to the
 *    batch's buckets and row-group stats prune within
 *  - `gen-<n>/shingles/` (id, sh) — the exact-verification sets
 *  - `gen-<n>/params/`   (k, bands, n) — one row; probes and
 *    refreshes read the build's parameters instead of trusting
 *    callers to repeat them
 *
 * Refresh is ChangeSet-driven ([[refresh]]): drop removed+updated
 * ids from both tables, append the re-shingled delta — work
 * proportional to the delta, the corpus text never re-reads.
 */
object DedupIndex {

  private def bandsPath(dir: String) = s"$dir/bands"
  private def shinglesPath(dir: String) = s"$dir/shingles"
  private def paramsPath(dir: String) = s"$dir/params"

  /** Fixed band-bucket directory count — bounded like the vector
    * index's `__cbucket` (the dir count must not grow with the
    * corpus). */
  private val BandBuckets = 64L

  private def bucketDir(bucket: Column): Column =
    pmod(bucket, lit(BandBuckets))

  /** Rewrite-from-empty guard shared by both tables: a
    * partitionBy/spread write of a zero-row frame leaves no
    * schema-bearing file (the VectorIndex.stageCorpus convention). */
  private def ensureReadable(
      spark: SparkSession, path: String, schema: => DataFrame): Unit =
    if (!graft.util.Fs.hasData(path, acceptDirs = true)) {
      graft.util.SwapCommit.deleteRec(path)
      spark.createDataFrame(
        spark.sparkContext.parallelize(
          Seq.empty[org.apache.spark.sql.Row], 1),
        schema.schema).write.parquet(path)
    }

  private def stageTables(
      spark: SparkSession, dir: String, banded: DataFrame,
      shingles: DataFrame, k: Int, nBands: Int, n: Int): Unit = {
    // the three writes are independent (bands/shingles read the SAME
    // cached shingled frame or disjoint parquet inputs) — run them
    // concurrently, the NodeTarget.commitState overlap pattern: Spark
    // job submission is thread-safe, and serializing them was pure
    // commit-floor latency. Failures surface at the Await, before
    // the generation commits.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    val shF = Future {
      shingles.write.parquet(shinglesPath(dir))
      ensureReadable(spark, shinglesPath(dir), shingles)
    }
    val pF = Future {
      import spark.implicits._
      Seq((k, nBands, n)).toDF("k", "bands", "n")
        .repartition(1).write.parquet(paramsPath(dir))
    }
    val bb = banded.withColumn("__bbucket", bucketDir(col("bucket")))
    bb.repartition(col("__bbucket"))
      .sortWithinPartitions(col("band"), col("bucket"))
      .write.partitionBy("__bbucket").parquet(bandsPath(dir))
    ensureReadable(spark, bandsPath(dir), bb.withColumn("__bbucket", lit(0L)))
    Await.result(shF, scala.concurrent.duration.Duration.Inf)
    Await.result(pF, scala.concurrent.duration.Duration.Inf)
  }

  private def readParams(
      spark: SparkSession, dir: String): (Int, Int, Int) = {
    val r = spark.read.parquet(paramsPath(dir)).collect()(0)
    (r.getInt(0), r.getInt(1), r.getInt(2))
  }

  /** Shingle + sign + band the corpus once and commit the index.
    * The shingled frame is cached across the two table writes — the
    * shingle pipeline is interpreted-HOF-heavy (zip_with/array_sort
    * lambdas never codegen), so re-evaluating it per write is the
    * cost that matters at any scale. */
  def build(
      spark: SparkSession, corpus: DataFrame, root: String,
      k: Int = 32, bands: Int = 8, n: Int = 3,
      idCol: String = "doc_id", textCol: String = "text",
      baseHash: Column => Column = xxhash64(_)): Unit = {
    val gen = graft.util.GenSwap.nextDir(root)
    val sh = Dedup.shingled(corpus, idCol, textCol, n).persist()
    try {
      val banded = Dedup.bandedSignatures(
        Dedup.signaturesFromShingled(sh, k, baseHash), k, bands)
      stageTables(spark, gen, banded, sh, k, bands, n)
      graft.util.GenSwap.commit(root, gen)
    } finally { sh.unpersist(); () }
  }

  /** ChangeSet-driven refresh: `changedDocs` (added ∪ updated, with
    * idCol/textCol) re-shingle and re-band; `droppedIds` (removed ∪
    * updated, one `id` column) drop from both tables. Parameters come
    * from the stored `params` row — the delta is signed exactly like
    * the build. */
  def refresh(
      spark: SparkSession, root: String, changedDocs: DataFrame,
      droppedIds: DataFrame, idCol: String = "doc_id",
      textCol: String = "text",
      baseHash: Column => Column = xxhash64(_)): Unit = {
    val cur = graft.util.GenSwap.currentDir(root).getOrElse(
      throw new IllegalStateException(
        s"no committed dedup index at $root — build first"))
    val (k, nBands, n) = readParams(spark, cur)
    // drop ids are consumed by TWO anti-joins and the delta by two
    // table writes — cache both (the delta's shingle pipeline is the
    // expensive re-evaluation; the id set is the diff join's output,
    // which would otherwise re-run per use)
    val drop = droppedIds.select(col("id")).persist()
    val chSh = Dedup.shingled(changedDocs, idCol, textCol, n).persist()
    try {
      val prevB = spark.read.parquet(bandsPath(cur)).drop("__bbucket")
        .select(col("id"), col("band"), col("bucket"))
      val prevS = spark.read.parquet(shinglesPath(cur))
        .select(col("id"), col("sh"))
      val chB = Dedup.bandedSignatures(
        Dedup.signaturesFromShingled(chSh, k, baseHash), k, nBands)
      val gen = graft.util.GenSwap.nextDir(root)
      stageTables(spark, gen,
        prevB.join(drop, Seq("id"), "left_anti").unionByName(chB),
        prevS.join(drop, Seq("id"), "left_anti").unionByName(chSh),
        k, nBands, n)
      graft.util.GenSwap.commit(root, gen)
    } finally { drop.unpersist(); chSh.unpersist(); () }
  }

  /**
   * Near-dup pairs of `batch` against the INDEXED corpus:
   * (id_l = batch id, id_r = corpus id, jaccard), every candidate
   * verified by exact n-gram Jaccard ≥ `threshold` — bit-identical to
   * [[Dedup.minhashPairsAgainst]] over the same corpus/parameters.
   * Only the batch shingles in-plan; the corpus side is two narrow
   * index-table scans (bands statically pruned to the batch's bucket
   * dirs — see the isin note in the body; shingles fetched for the
   * surviving candidate ids only). Equal ids across the two sides are
   * excluded (a doc already in the corpus is not a near-dup of
   * itself). Empty result when no index has committed yet.
   */
  def probe(
      spark: SparkSession, root: String, batch: DataFrame,
      threshold: Double = 0.8, idCol: String = "doc_id",
      textCol: String = "text",
      baseHash: Column => Column = xxhash64(_)): DataFrame = {
    val cur = graft.util.GenSwap.currentDir(root) match {
      case Some(c) => c
      case None =>
        return batch.select(col(idCol).as("id_l"), col(idCol).as("id_r"),
          lit(0.0).as("jaccard")).limit(0)
    }
    val (k, nBands, nShingle) = readParams(spark, cur)
    val bSh = Dedup.shingled(batch, idCol, textCol, nShingle).persist()
    val bB = Dedup.bandedSignatures(
      Dedup.signaturesFromShingled(bSh, k, baseHash), k, nBands)
      .withColumnRenamed("id", "id_l").persist()
    try {
      val cB = spark.read.parquet(bandsPath(cur))
        .withColumnRenamed("id", "id_r")
      val bucketed = cB.columns.contains("__bbucket")
      // STATIC partition pruning: the batch's distinct bucket-dir set
      // is ≤ 64 values — collect it from the CACHED batch bands (one
      // tiny aggregation over in-memory blocks) and filter the scan
      // explicitly. Deliberately NOT dynamic partition pruning: the
      // DPP subquery re-executes the batch's whole shingle/sign
      // pipeline when AQE fails to reuse the broadcast (measured 2×
      // probe wall at 100× key-growth), while this isin lands in
      // PartitionFilters for free and prunes identically.
      val bKeyed = if (bucketed)
        bB.withColumn("__bbucket",
          bucketDir(col("bucket")).cast(cB.schema("__bbucket").dataType))
      else bB
      val cBpruned = if (bucketed) {
        val dirs = bKeyed.select(col("__bbucket")).distinct()
          .collect().map(_.get(0)).toSeq
        cB.filter(col("__bbucket").isInCollection(dirs))
      } else cB
      val keys = if (bucketed) Seq("band", "bucket", "__bbucket")
        else Seq("band", "bucket")
      val cands = cBpruned.join(broadcast(bKeyed), keys)
        .filter(col("id_l") =!= col("id_r"))
        .select(col("id_l"), col("id_r")).distinct()
      val corpusSh = spark.read.parquet(shinglesPath(cur))
      val verified = cands
        .join(bSh.select(col("id").as("id_l"), col("sh").as("sh_l")),
          Seq("id_l"))
        .join(corpusSh.select(col("id").as("id_r"), col("sh").as("sh_r")),
          Seq("id_r"))
        .withColumn("jaccard", Dedup.jaccardExpr(col("sh_l"), col("sh_r")))
        .filter(col("jaccard") >= threshold)
        .select(col("id_l"), col("id_r"),
          round(col("jaccard"), 6).as("jaccard"))
      verified.localCheckpoint()
    } finally { bSh.unpersist(); bB.unpersist(); () }
  }
}
