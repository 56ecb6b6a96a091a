package graft.tools

import org.apache.spark.sql.functions._

/** One-off stage profiler for the heavy bench queries (builder-local
  * iteration only; not part of the driver contract). */
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = graft.util.Tables.session("prof", "32")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }
    val docsRaw = spark.read.parquet(s"$dir/documents.parquet")
    time("read.count")(docsRaw.count())

    import graft.ext.{Dedup, TextAnalysis}
    val shingled = graft.util.Tables.spread(docsRaw).select(
      col("doc_id").as("id"), Dedup.shingles(col("text"), 3).as("sh"))
    time("shingle+persist.count") { shingled.persist().count() }
    val sigs = time("signatures.build") {
      Dedup.minhashSignatures(docsRaw, "doc_id", "text",
        baseHash = TextAnalysis.portableHash60)
    }
    time("signatures.count")(sigs.count())
    val cands = time("candidates.count") {
      Dedup.minhashCandidates(docsRaw, "doc_id", "text",
        baseHash = TextAnalysis.portableHash60).count()
    }
    println(s"[prof] n_cands=$cands")
    time("full minhashDedup") {
      Dedup.minhashDedup(docsRaw, "doc_id", "text", threshold = 0.5,
        baseHash = TextAnalysis.portableHash60).count()
    }
    time("full minhashDedup (warm)") {
      Dedup.minhashDedup(docsRaw, "doc_id", "text", threshold = 0.5,
        baseHash = TextAnalysis.portableHash60).count()
    }
    spark.stop()
  }
}
