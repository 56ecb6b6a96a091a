package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiling entry point (not part of the public surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.util.Tables.session("scratch", "8")
    val dir = "/root/testdata/sf0.1"
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scratch] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs rows=$n")
    }
    val jq = graft.SparkEntry.queries("q_ngram_jaccard")
    time("ngram run1") { jq(spark, dir).count() }
    time("ngram run2") { jq(spark, dir).count() }
    val mh = graft.SparkEntry.queries("q_minhash_dedup")
    time("minhash run1") { mh(spark, dir).count() }
    val sp = graft.SparkEntry.queries("q_simhash_pairs")
    time("simhash run1") { sp(spark, dir).count() }
    import org.apache.spark.sql.functions._
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val docs = d.select(col("doc_id").as("id"),
      floor(length(col("text")) / 50).as("block"),
      graft.ext.Dedup.shingles(col("text"), 3).as("sh"))
      .withColumn("sz", size(col("sh")))
    val inv = docs.select(col("id"), col("block"), col("sz"),
      explode(col("sh")).as("s"))
    time("inv rows") { inv.count() }
    val dfreq = inv.groupBy(col("block"), col("s")).agg(count(lit(1)).as("df"))
    time("dfreq rows") { dfreq.count() }
    time("df>100 shingles") { dfreq.filter(col("df") > 100).count() }
    val rankW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("block"), col("id")).orderBy(col("df"), col("s"))
    val prefix = inv.join(dfreq, Seq("block", "s"))
      .withColumn("rk", row_number().over(rankW))
      .filter(col("rk") <= col("sz") - ceil(lit(0.5) * col("sz")) + 1)
    time("prefix rows") { prefix.count() }
    val l = prefix.as("l"); val r = prefix.as("r")
    val joined = l.join(r,
      col("l.s") === col("r.s") && col("l.block") === col("r.block") &&
      col("l.id") < col("r.id"))
    time("prefix join rows") { joined.count() }
    val cands = joined.select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .distinct()
    time("cands") { cands.count() }
    spark.stop()
  }
}
