package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic sampling for training-data curation (engine
 * extension; BASELINE.json north star).
 *
 * `df.sample()` is seed-and-partitioning dependent — re-running on a
 * repartitioned 100 TB corpus selects DIFFERENT rows, which breaks
 * reproducibility and incremental reprocessing. Hash sampling keys
 * the decision on the RECORD ID via the engine-portable 60-bit md5
 * hash ([[TextAnalysis.portableHash60]]): the same row is kept in
 * every run, on every engine, under any partitioning — and an oracle
 * can replay the exact selection.
 *
 * Scale shape: a pure narrow filter — no shuffle, pushes past
 * projections, combines with any downstream pipeline.
 */
object Sampling {

  private val Buckets = 1000000L

  private def keep(idCol: Column, rate: Double): Column =
    pmod(TextAnalysis.portableHash60(idCol.cast("string")), lit(Buckets)) <
      math.round(rate * Buckets)

  /** Keep a stable `rate` fraction keyed on `idCol`. */
  def byHash(df: DataFrame, idCol: String, rate: Double): DataFrame = {
    require(rate >= 0.0 && rate <= 1.0, "rate must be in [0, 1]")
    df.filter(keep(col(idCol), rate))
  }

  /**
   * EXACT-k-per-stratum sample: the fixed-budget variant (eval-set
   * construction wants "exactly 20 per class", not "about 2%") —
   * rank each stratum's rows by the portable hash (ties by id, a
   * total order) and keep the first `k`. Same reproducibility
   * contract as [[byHash]]: any run, any engine, any partitioning
   * selects the SAME rows, and an oracle replays the selection.
   *
   * Scale shape: the row_number + `<= k` filter triggers Spark's
   * WindowGroupLimit — each task keeps its own top-k per stratum
   * BEFORE the exchange, so the shuffle moves O(k · strata · tasks)
   * rows, never the corpus, even though strata are corpus-scale
   * partitions.
   */
  def exactKPerStratum(
      df: DataFrame, idCol: String, stratumCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val h = TextAnalysis.portableHash60(col(idCol).cast("string"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol)).orderBy(h, col(idCol))
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k).drop("__rk")
  }

  /**
   * Deterministic train/val/test assignment: hash-bucket the id into
   * 100 cells, split by integer thresholds (90/5/5 shipped as
   * percents). The assignment is a pure narrow projection — stable
   * under reprocessing, disjoint by construction, engine-replayable.
   */
  def split(
      df: DataFrame, idCol: String,
      trainPct: Int = 90, valPct: Int = 5): DataFrame = {
    require(trainPct > 0 && valPct > 0 && trainPct + valPct < 100,
      "train/val percents must leave room for test")
    val cell = pmod(
      TextAnalysis.portableHash60(col(idCol).cast("string")), lit(100L))
    df.withColumn("split",
      when(cell < trainPct, "train")
        .when(cell < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /**
   * Stratified variant: per-stratum rates (e.g. downsample `view`
   * events to 10% but keep every `purchase`). Strata missing from
   * `rates` fall back to `defaultRate`.
   */
  def stratified(
      df: DataFrame, idCol: String, stratumCol: String,
      rates: Map[String, Double], defaultRate: Double = 1.0): DataFrame = {
    require((defaultRate +: rates.values.toSeq)
      .forall(r => r >= 0.0 && r <= 1.0), "rates must be in [0, 1]")
    // thresholds resolve to INTEGERS driver-side: comparing the hash
    // against `rate * Buckets` as a double would make the boundary
    // bucket engine-dependent (0.1 * 1e6 folds to 100000.00000000001)
    val thresholdCol = rates.foldLeft(
      lit(math.round(defaultRate * Buckets))) {
      case (acc, (stratum, r)) =>
        when(col(stratumCol) === stratum,
          lit(math.round(r * Buckets))).otherwise(acc)
    }
    df.filter(
      pmod(TextAnalysis.portableHash60(col(idCol).cast("string")),
        lit(Buckets)) < thresholdCol)
  }

  /**
   * Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-Res):
   * each row draws a deterministic uniform u from its id's portable
   * hash and is keyed by `-ln(u) / w`; the k SMALLEST keys are the
   * sample. Heavier rows draw smaller keys in expectation, giving
   * exact probability-proportional-to-size semantics — the curation
   * primitive behind "sample 1M docs weighted by quality score".
   *
   * Determinism: u = (hash mod 1e6 + 0.5) / 1e6 (never 0, so ln is
   * finite), the key is floored to nano units, and ordering ties
   * break on the id — the same k rows on every run, every engine,
   * any partitioning, replayable by an oracle.
   *
   * Scale shape: the key is a narrow projection; `orderBy().limit(k)`
   * plans as TakeOrderedAndProject — per-partition k-heaps, one
   * O(k · partitions) gather, never a full sort. The rank window runs
   * AFTER the limit, over k rows only.
   */
  def weightedTopK(
      df: DataFrame, idCol: String, weightCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val u = (pmod(TextAnalysis.portableHash60(col(idCol).cast("string")),
      lit(Buckets)).cast("double") + lit(0.5)) / lit(Buckets.toDouble)
    val key = -log(u) / col(weightCol).cast("double")
    val top = df
      .filter(col(weightCol) > 0)
      .withColumn("key_nano", floor(key * lit(1000000000L)).cast("long"))
      .orderBy(col("key_nano"), col(idCol))
      .limit(k)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("key_nano"), col(idCol))
    top.withColumn("rank", row_number().over(w))
  }

  /**
   * DSIR-style importance selection (Xie et al. 2023, "Data Selection
   * for Language Models via Importance Resampling"): score each raw
   * document by how much its hashed-n-gram profile resembles a TARGET
   * distribution — a predicate naming the high-quality slice (the
   * paper's "Wikipedia-like" target) — and keep the `topK` highest.
   *
   * Features are the paper's hashed unigrams + bigrams (the hashing
   * trick buckets the open vocabulary into `dim` cells). Integer-exact
   * variant: the per-bucket importance weight is the add-one-smoothed
   * target/raw likelihood RATIO in ppm, `((tc+1)·1e6) div (rc+1)`,
   * instead of a float log-ratio — the per-document score is then an
   * order-independent BIGINT sum, bit-stable under any partitioning
   * and replayable exactly by an oracle (a log-sum would depend on FP
   * summation order). Selection is deterministic top-k (ties broken
   * by id) rather than Gumbel resampling, for the same reason.
   *
   * Scale shape: ONE tokenize pass — the (doc, bucket) count is the
   * only corpus-sized shuffle (map-side combine collapses repeats
   * before the exchange), and because the raw/target distributions
   * are a single conditional rollup of that same frame, the weights
   * subtree is byte-identical to the scoring side and ReuseExchange
   * materializes the pass once. The weight table is a ≤`dim`-row
   * broadcast and the final selection plans as TakeOrderedAndProject
   * (per-partition k-heaps, no full sort) — at 100 TB nothing wider
   * than the bucketed counts ever moves, and the corpus is read and
   * tokenized exactly once.
   */
  def dsirSelect(
      docs: DataFrame, idCol: String, textCol: String,
      targetPred: Column, dim: Int = 1024, topK: Int = 50): DataFrame = {
    require(dim > 0, "dim must be positive")
    require(topK > 0, "topK must be positive")
    val toks = TextAnalysis.normTokens(col(textCol))
    val bigrams = zip_with(
      slice(toks, lit(1), size(toks) - 1), slice(toks, lit(2), size(toks) - 1),
      (a, b) => concat(a, lit(" "), b))
    val buckets = graft.util.Tables.spread(docs)
      .select(col(idCol).as("doc_id"), targetPred.as("is_t"),
        explode(concat(toks, bigrams)).as("feat"))
      .select(col("doc_id"), col("is_t"),
        pmod(TextAnalysis.portableHash60(col("feat")),
          lit(dim.toLong)).as("bucket"))
    val perDoc = buckets
      .groupBy(col("doc_id"), col("is_t"), col("bucket"))
      .agg(count(lit(1)).as("c"))
    // raw and target counts in ONE rollup of perDoc (a conditional
    // sum instead of a second branch) — the weights subtree is then
    // byte-identical to the scoring side's perDoc, so ReuseExchange
    // computes the corpus tokenize+count pass exactly once
    val weights = perDoc.groupBy(col("bucket"))
      .agg(sum(col("c")).as("rc"),
        sum(when(col("is_t"), col("c")).otherwise(lit(0L))).as("tc"))
      .select(col("bucket"),
        expr("((tc + 1) * 1000000) div (rc + 1)").as("w_ppm"))
    perDoc
      .join(broadcast(weights), Seq("bucket"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_feats"),
        sum(col("c") * col("w_ppm")).as("imp_sum"))
      .withColumn("imp_ppf", expr("imp_sum div n_feats"))
      .orderBy(col("imp_ppf").desc, col("doc_id"))
      .limit(topK)
  }
}
