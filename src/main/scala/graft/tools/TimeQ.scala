package graft.tools

/** Wall-clock one or more SparkEntry queries against a data dir
  * (builder-local iteration + scale-cliff smokes; not part of the
  * driver contract). Each query is fully materialized via count()
  * after a shared-session warmup, so numbers compare across runs on
  * an idle host. Usage: TimeQ <dir> <query>... [-r N]
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val rest = args.drop(1)
    // -e: also print the executed plan's scan lines (pushdown audit).
    // Strip it FIRST so `-r <n> -e` and `-e -r <n>` both parse.
    val explain = rest.contains("-e")
    val noE = rest.filterNot(_ == "-e")
    val rIdx = noE.indexOf("-r")
    val reps = if (rIdx >= 0 && rIdx + 1 < noE.length) noE(rIdx + 1).toInt else 1
    val names = if (rIdx >= 0) noE.take(rIdx) ++ noE.drop(rIdx + 2) else noE
    val spark = graft.util.Tables.session("timeq", "32")
    // warmup: JIT + codegen + file index on a cheap query
    graft.SparkEntry.queries("q1_agg")(spark, dir).count()
    names.foreach { name =>
      var lastDf: org.apache.spark.sql.DataFrame = null
      val secs = (1 to reps).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        lastDf = graft.SparkEntry.queries(name)(spark, dir)
        val n = lastDf.count()
        val s = (System.nanoTime() - t0) / 1e9
        (s, n)
      }
      val best = secs.map(_._1).min
      println(f"[timeq] $name%-24s best=$best%7.2fs rows=${secs.head._2}")
      if (explain) {
        // reuse the timed frame — rebuilding would re-execute any
        // eager localCheckpoint inside the query
        val plan = lastDf.queryExecution.executedPlan.toString
        val lines = plan.split("\n").filter(l =>
          l.contains("Scan parquet") || l.contains("PushedFilters"))
        if (lines.isEmpty)
          println("[plan] (no parquet scan visible — the query returns " +
            "a checkpointed/materialized result; inner plans already ran)")
        else lines.foreach(l => println("[plan] " + l.trim.take(400)))
      }
    }
    spark.stop()
  }
}
