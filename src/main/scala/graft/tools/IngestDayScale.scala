package graft.tools

import org.apache.spark.sql.functions._

/** 100x key-growth smoke of the ingest-day capstone in its PRODUCTION
  * shape ([[graft.ext.IngestDay.run]] with `pinned = false`:
  * occupancy-sized cells, nProbe 8, bounded shortlist — the
  * certification row q_ingest_day pins total coverage + corpus-sized
  * shortlists, which is O(|batch|·n) by design and not the shape a
  * 100 TB day runs). Prints the wall and the stage histogram.
  * Builder-local profiling, not part of the driver contract.
  * Usage: IngestDayScale <dir> */
object IngestDayScale {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = graft.util.Tables.session("ingest-day-scale", "32")
    graft.SparkEntry.queries("q1_agg")(spark, dir).count() // warm
    val work = java.nio.file.Files
      .createTempDirectory("ingestday").toString
    val t0 = System.nanoTime()
    val out = graft.ext.IngestDay.run(spark,
      spark.read.parquet(s"$dir/documents.parquet"),
      spark.read.parquet(s"$dir/embeddings.parquet"),
      work, pinned = false)
    val hist = out.groupBy(col("stage")).agg(count(lit(1)).as("n"))
      .collect().map(r => s"${r.getString(0)}=${r.getLong(1)}")
      .sorted.mkString(" ")
    println(f"[ingestday] wall ${(System.nanoTime() - t0) / 1e9}%.2fs" +
      s"  stages: $hist")
    spark.stop()
  }
}
