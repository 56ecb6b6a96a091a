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
    val rIdx = rest.indexOf("-r")
    val reps = if (rIdx >= 0 && rIdx + 1 < rest.length) rest(rIdx + 1).toInt else 1
    val afterR = if (rIdx >= 0) rest.take(rIdx) ++ rest.drop(rIdx + 2) else rest
    // -e: also print the executed plan's scan lines (pushdown audit)
    val explain = afterR.contains("-e")
    val names = afterR.filterNot(_ == "-e")
    val spark = graft.util.Tables.session("timeq", "32")
    // warmup: JIT + codegen + file index on a cheap query
    graft.SparkEntry.queries("q1_agg")(spark, dir).count()
    names.foreach { name =>
      val secs = (1 to reps).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val n = graft.SparkEntry.queries(name)(spark, dir).count()
        val s = (System.nanoTime() - t0) / 1e9
        (s, n)
      }
      val best = secs.map(_._1).min
      println(f"[timeq] $name%-24s best=$best%7.2fs rows=${secs.head._2}")
      if (explain) {
        val plan = graft.SparkEntry.queries(name)(spark, dir)
          .queryExecution.executedPlan.toString
        plan.split("\n").filter(l =>
            l.contains("Scan parquet") || l.contains("PushedFilters"))
          .foreach(l => println("[plan] " + l.trim.take(400)))
      }
    }
    spark.stop()
  }
}
