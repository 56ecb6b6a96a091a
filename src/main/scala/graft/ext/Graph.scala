package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Bounded-iteration graph analytics over edge frames (engine
 * extension; BASELINE.json north star — link-graph signals like
 * PageRank feed crawl-frontier and quality weighting in web-scale
 * training-data curation).
 *
 * All arithmetic is FIXED-POINT (scaled longs with integer
 * division), not floating-point: integer sums are exact and
 * order-independent, so the result is bit-identical under any
 * partitioning, any engine — which is what makes a distributed rank
 * oracle-replayable at all (double summation order would diverge in
 * the last ulp between engines).
 *
 * Scale shape: the edge frame is hash-partitioned by `src` ONCE
 * (with out-degree attached) and cached; each iteration is one
 * shuffle of the rank frame to the edge partitioning, one
 * map-side-combined groupBy(dst), and one left join back onto the
 * node set. Iteration count is a small constant (the operator is
 * power-iteration with early stop delegated to the caller), so the
 * whole computation is O(iterations) shuffles of O(|V| + |E|) rows —
 * no driver-side state beyond the loop counter.
 */
object Graph {

  /**
   * Power-iteration PageRank in fixed-point arithmetic.
   *
   * Per iteration, with `scale` = 1e6 and damping d = dampMilli/1000:
   * {{{
   *   contrib(e)  = rank(src(e)) div outdeg(src(e))        // exact
   *   rank'(n)    = (1000 - dampMilli) * scale / 1000
   *               + (sum(contrib into n) * dampMilli) div 1000
   * }}}
   * Nodes with no in-edges keep the base term. Dangling mass (nodes
   * with no out-edges) leaks, the common simplification — both sides
   * of the oracle compute the same quantity, which is the contract
   * that matters here.
   *
   * @return (node, rank_micro) — rank in millionths, exact longs.
   */
  def pageRank(
      edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 3, dampMilli: Long = 850,
      scale: Long = 1000000L,
      /** `true` ⇒ the caller guarantees `edges` carries no duplicate
        * (src, dst) rows, and the defensive `distinct()` below — a
        * full-width shuffle of the edge list, the single biggest
        * exchange in the whole computation when the caller already
        * deduped — is skipped. Duplicate edges under `true` would
        * double-count contributions, so only pass it when
        * distinctness is structural (e.g. a deduped pair list
        * unioned with its own reversal over disjoint namespaces). */
      edgesDistinct: Boolean = false): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    require(dampMilli >= 0 && dampMilli <= 1000, "dampMilli in [0, 1000]")
    val eRaw = edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val e = if (edgesDistinct) eRaw else eRaw.distinct()
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    // one partitioning AND one sort, attached degree, reused by every
    // iteration: the per-iteration join is a sort-merge against the
    // (small) rank frame, and InMemoryTableScan propagates both the
    // cached plan's partitioning and its ordering — so pre-sorting
    // the big side here means each iteration re-sorts ONLY the rank
    // frame, not the edge list (bucketed-table reasoning, §2.4)
    val eDeg = e.join(outdeg, "src").repartition(col("src"))
      .sortWithinPartitions(col("src")).cache()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .sortWithinPartitions(col("node")).cache()
    val base = (1000L - dampMilli) * scale / 1000L
    try {
      var ranks = nodes.withColumn("rank", lit(scale))
      for (_ <- 1 to iterations) {
        val contrib = eDeg
          .join(ranks.withColumnRenamed("node", "src"), "src")
          // `div` (integer division) keeps the math exact — a double
          // `/` would lose precision past 2^53 on hub accumulations
          .select(col("dst"), expr("rank div outdeg").as("c"))
        val inSum = contrib.groupBy(col("dst")).agg(sum(col("c")).as("s"))
        ranks = nodes
          .join(inSum.withColumnRenamed("dst", "node"), Seq("node"), "left")
          .select(col("node"),
            (lit(base) + expr(s"(coalesce(s, 0L) * $dampMilli) div 1000"))
              .as("rank"))
      }
      // materialize the result through its own persist() so the input
      // caches can be released here, then return the persisted frame.
      // Deliberately NOT localCheckpoint(): checkpoint blocks are
      // unrecomputable — an executor loss after return would
      // permanently fail downstream actions — while persisted blocks
      // recompute from lineage (slower without the input caches, but
      // correct). The caller owns the returned frame's storage
      // (`unpersist()` when done — the ChangeSet.persisted contract).
      val result = ranks.select(col("node"), col("rank").as("rank_micro"))
        .persist()
      result.count()
      result
    } finally {
      eDeg.unpersist()
      nodes.unpersist()
    }
  }
}
