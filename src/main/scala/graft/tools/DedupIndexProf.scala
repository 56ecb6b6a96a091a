package graft.tools

import org.apache.spark.sql.functions._

/** Phase breakdown of the q_dedup_index lifecycle (build / refresh /
  * probe) — builder-local profiling, not part of the driver
  * contract. Usage: DedupIndexProf <dir> */
object DedupIndexProf {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = graft.util.Tables.session("didx-prof", "32")
    graft.SparkEntry.queries("q1_agg")(spark, dir).count() // warm
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val a = f
      println(f"[didxprof] $tag%-12s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      a
    }
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val root = java.nio.file.Files
      .createTempDirectory("didxprof").toString + "/idx"
    val initial = d.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id").cast("string").as("id"),
        when(col("doc_id") % 6 === 0, concat(lit("stale "), col("text")))
          .otherwise(col("text")).as("text"),
        lit(1L).as("version"))
    time("build") {
      graft.ext.DedupIndex.build(spark, initial, root, k = 32,
        bands = 8, n = 3, idCol = "id", textCol = "text",
        baseHash = graft.ext.TextAnalysis.portableHash60)
    }
    val source = d
      .filter(col("doc_id") % 2 === 0 && col("doc_id") % 10 =!= 6)
      .select(col("doc_id").cast("string").as("id"),
        when(col("doc_id") % 6 === 0, lit(2L)).otherwise(lit(1L))
          .as("version"),
        col("text"))
    val cs = time("diff") {
      graft.core.Diff.computeDataChanges(
        graft.core.Records.keyRecords(source, "id", Some("version")),
        initial.select(col("id"), col("version")))
    }
    val changed = cs.added.select(col("id"), col("text"))
      .unionByName(cs.updated.select(col("id"), col("text")))
    val dropped = cs.removedIds.unionByName(cs.updated.select(col("id")))
    time("refresh") {
      graft.ext.DedupIndex.refresh(spark, root, changed, dropped,
        idCol = "id", textCol = "text",
        baseHash = graft.ext.TextAnalysis.portableHash60)
    }
    val batch = d.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id").cast("string").as("id"), col("text"))
    time("probe") {
      graft.ext.DedupIndex.probe(spark, root, batch, threshold = 0.5,
        idCol = "id", textCol = "text",
        baseHash = graft.ext.TextAnalysis.portableHash60).count()
    }
    spark.stop()
  }
}
