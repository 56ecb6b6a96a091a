package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The q_rag_incremental lifecycle (two syncs, ChangeSet-driven
  * refresh) with [[graft.ext.Assemble.publishIndex]]'s df-cap on —
  * the heap-shape smoke for the 100×-key-growth row that OOMs the
  * ranking window at default driver memory when hot stop-word tokens
  * concentrate millions of postings in one partition (BASELINE.md
  * r16). Usage: RagCapSmoke <dir> [dfCap] [-r N]. Builder-local, not
  * part of the driver contract; the certified registry row stays
  * uncapped.
  */
object RagCapSmoke {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val dfCap = args.drop(1).headOption.filterNot(_ == "-r")
      .map(_.toLong).getOrElse(100000L)
    val rIdx = args.indexOf("-r")
    val reps = if (rIdx >= 0 && rIdx + 1 < args.length)
      args(rIdx + 1).toInt else 1
    val spark = graft.util.Tables.session("ragcap", "32")
    graft.SparkEntry.queries("q1_agg")(spark, dir).count() // warmup

    def run(): DataFrame = {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id").cast("string").as("id"), col("text"))
      val initial = docs
        .filter(pmod(col("id").cast("long"), lit(7)) =!= 0)
        .select(col("id"),
          when(pmod(col("id").cast("long"), lit(3)) === 0,
            concat(lit("stale "), col("text")))
            .otherwise(col("text")).as("text"),
          lit(1L).as("version"))
      val source = docs
        .filter(pmod(col("id").cast("long"), lit(5)) =!= 4)
        .select(col("id"),
          when(pmod(col("id").cast("long"), lit(3)) === 0, lit(2L))
            .otherwise(lit(1L)).as("version"),
          col("text"))
      val p1 = graft.ext.Assemble.ragPostings(initial, "id", "text", 8, 4)
        .localCheckpoint()
      val pub1 = graft.ext.Assemble.publishIndex(p1, 3, dfCap)
        .localCheckpoint()
      val cs = graft.core.Diff.computeDataChanges(
        graft.core.Records.keyRecords(source, "id", Some("version")),
        initial.select(col("id"), col("version")))
      val changed = cs.added.select(col("id"), col("text"))
        .unionByName(cs.updated.select(col("id"), col("text")))
      val dropped = cs.removedIds
        .unionByName(cs.updated.select(col("id")))
      val (_, pub2) = graft.ext.Assemble.refreshRagIndex(p1, pub1,
        changed, dropped, "id", "text", 8, 4, 3, dfCap)
      pub2
    }

    val secs = (1 to reps).map { _ =>
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val n = run().count()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[ragcap] dfCap=$dfCap rep: $s%7.2fs rows=$n")
      s
    }
    println(f"[ragcap] dfCap=$dfCap best=${secs.min}%7.2fs " +
      f"xmx=${Runtime.getRuntime.maxMemory() / (1L << 30)}g")
    spark.stop()
  }
}
