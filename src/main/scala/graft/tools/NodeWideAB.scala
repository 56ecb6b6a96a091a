package graft.tools

import graft.mapper.Mapper
import graft.pipeline.{ImportService, Preset}
import graft.sources.InlineSource
import graft.targets.NodeTarget
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Builder-local wide-node-table A/B (r15 verdict task 5, BASELINE.md
  * r16): a node state of ~20 mapped attribute columns × 4 variants,
  * built from `orders`, then an incremental sync (~1% updates, ~1%
  * removes, rest unchanged) measured under the 2×2 of
  *   idx  ∈ {keyed `_dstate` index present, deleted ⇒ the legacy
  *           full-table aggregation read} ×
  *   blank∈ {unchanged-row payload blanking on, off}
  * interleaved (one rep of every combo per round), best-of-reps.
  * Usage: NodeWideAB <dir> [reps] */
object NodeWideAB {
  private val NAttrs = 20

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = graft.util.Tables.session("node-wide-ab", "32")

    def source(s: SparkSession, delta: Boolean): DataFrame = {
      val o = s.read.parquet(s"$dir/orders.parquet")
      val keep = if (delta) o.filter(col("o_orderkey") % 97 =!= 0) else o
      val bump =
        if (delta) when(col("o_orderkey") % 100 === 0, 86400L).otherwise(0L)
        else lit(0L)
      keep.select(
        Seq(col("o_orderkey").cast("string").as("id"),
          (unix_timestamp(col("o_orderdate")) + bump).as("version")) ++
          (1 to NAttrs).map(i =>
            concat_ws("-", col("o_orderstatus"), lit(i),
              col("o_custkey"), col("o_totalprice"), col("o_orderdate"))
              .as(s"attr$i")): _*)
    }
    val mapper = Mapper((1 to NAttrs).map(i => s"attr$i" -> s"attr$i"))
    def preset(path: String, delta: Boolean) = {
      val tgt = NodeTarget(path, idPrefix = "node-",
        variantsResolver =
          _ => array(lit("a"), lit("b"), lit("c"), lit("d")))
      Preset(InlineSource(s => source(s, delta)), tgt, mapper,
        idAttribute = "id", versionAttribute = Some("version"),
        diffOptions = tgt.diffOptions)
    }

    val work = java.nio.file.Files.createTempDirectory("nodewide").toString
    val basePath = s"$work/base/nodes"
    val t0 = System.nanoTime()
    new ImportService(preset(basePath, delta = false)).importData(spark)
    println(f"[nodewide] sync1 build ${(System.nanoTime() - t0) / 1e9}%7.2fs")

    val combos = for (idx <- Seq(true, false); blank <- Seq(true, false))
      yield (idx, blank)
    val best = scala.collection.mutable.Map[(Boolean, Boolean), Double]()
    try {
      // rotate the combo order per rep: a fixed order hands the
      // first combo every rep's cold-cache cost (measured: a clean
      // monotone within-rep decrease at sf0.1 that dwarfed the
      // combo deltas)
      for (r <- 1 to reps;
           (idx, blank) <- combos.drop(r % combos.size) ++
             combos.take(r % combos.size)) {
        val runDir = s"$work/run"
        graft.util.SwapCommit.deleteRec(new java.io.File(runDir))
        val p = s"$runDir/nodes"
        graft.util.SwapCommit.copyRec(
          new java.io.File(basePath), new java.io.File(p))
        if (!idx)
          graft.util.SwapCommit.deleteRec(new java.io.File(s"$p/_dstate"))
        graft.core.Diff.blankUnchangedPayloads = blank
        spark.catalog.clearCache()
        val t = System.nanoTime()
        val res = new ImportService(preset(p, delta = true)).importData(spark)
        val dt = (System.nanoTime() - t) / 1e9
        best((idx, blank)) =
          math.min(best.getOrElse((idx, blank), Double.MaxValue), dt)
        println(f"[nodewide] rep$r idx=$idx%-5s blank=$blank%-5s " +
          f"sync2=$dt%7.2fs (a=${res.added} u=${res.updated} r=${res.removed})")
      }
    } finally graft.core.Diff.blankUnchangedPayloads = true
    best.toSeq.sortBy(_._1.toString).foreach { case ((i, b), v) =>
      println(f"[nodewide] BEST idx=$i%-5s blank=$b%-5s $v%7.2fs")
    }
    spark.stop()
  }
}
