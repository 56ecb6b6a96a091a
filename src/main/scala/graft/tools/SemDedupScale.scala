package graft.tools

import org.apache.spark.sql.functions._

/** Builder-local A/B of the semantic-dedup cell sizing (BASELINE.md
  * r16): pinned nCells=16 (the oracle-certification shape) vs the
  * occupancy-sized production path ([[graft.ext.Similarity
  * .semDedupAuto]]) on the same embeddings table. Usage:
  * SemDedupScale <dir> [reps] [--auto-only]
  * (--auto-only skips the pinned shapes — at ≥100× key-growth their
  * quadratic within-cell volume makes them minutes-per-rep; the
  * decade table only needs the production path there.) */
object SemDedupScale {
  def main(args: Array[String]): Unit = {
    val autoOnly = args.contains("--auto-only")
    val pos = args.filterNot(_ == "--auto-only")
    val dir = pos(0)
    val reps = if (pos.length > 1) pos(1).toInt else 2
    val spark = graft.util.Tables.session("semdedup-scale", "32")
    graft.SparkEntry.queries("q1_agg")(spark, dir).count() // warm
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = emb.count()
    def best(tag: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      val times = (1 to reps).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val rows = f.count()
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      println(f"[semdedup] $tag%-18s n=$n%8d best=${times.map(_._1).min}%7.2fs rows=${times.head._2}")
    }
    if (!autoOnly) best("semdedup_pinned")(
      graft.ext.Similarity.semDedup(emb, 0.4, nCells = 16, nProbe = 6))
    best("semdedup_auto")(
      graft.ext.Similarity.semDedupAuto(emb, 0.4, targetPerCell = 128,
        nProbe = 6))
    if (!autoOnly) best("clusters_pinned") {
      val pairs = graft.ext.Similarity.pairGraphCollapsed(
        emb, 0.4, nCells = 16, nProbe = 6)
      graft.ext.Dedup.connectedComponents(pairs, "q_id", "n_id")
    }
    best("clusters_auto") {
      val pairs = graft.ext.Similarity.pairGraphCollapsedAuto(
        emb, 0.4, targetPerCell = 128, nProbe = 6)
      graft.ext.Dedup.connectedComponents(pairs, "q_id", "n_id")
    }
    if (!autoOnly) best("dedup_pinned") {
      val pairs = graft.ext.Similarity.pairGraphCollapsed(
        emb, 0.4, nCells = 16, nProbe = 6)
      emb.join(pairs.select(col("n_id").as("vec_id")).distinct(),
        Seq("vec_id"), "left_anti")
    }
    best("dedup_auto") {
      val pairs = graft.ext.Similarity.pairGraphCollapsedAuto(
        emb, 0.4, targetPerCell = 128, nProbe = 6)
      emb.join(pairs.select(col("n_id").as("vec_id")).distinct(),
        Seq("vec_id"), "left_anti")
    }
    spark.stop()
  }
}
