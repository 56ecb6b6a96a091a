package graft.tools

import graft.ext.TrainedQuality
import org.apache.spark.sql.functions._

/** One-off phase profiler for the trained-quality rows
  * (builder-local iteration only; not part of the driver contract). */
object NbProf {
  def main(args: Array[String]): Unit = {
    val spark = graft.util.Tables.session("nbprof", "32")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[nbprof] $name%-32s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    // warmup
    docs.select(count(lit(1))).collect()

    import graft.ext.TextAnalysis
    time("explode only") {
      graft.util.Tables.spread(docs).select(col("doc_id").as("id"),
        explode(TextAnalysis.normTokens(col("text"))).as("tok"))
        .select(count(lit(1))).collect()
    }
    time("explode + hash60") {
      graft.util.Tables.spread(docs).select(col("doc_id").as("id"),
        explode(TextAnalysis.normTokens(col("text"))).as("tok"))
        .select(sum(pmod(TextAnalysis.portableHash60(col("tok")),
          lit(1000003L))))
        .collect()
    }
    time("explode + hash60 + groupBy(id,bucket)") {
      graft.util.Tables.spread(docs).select(col("doc_id").as("id"),
        explode(TextAnalysis.normTokens(col("text"))).as("tok"))
        .groupBy(col("id"),
          pmod(TextAnalysis.portableHash60(col("tok")), lit(64L))
            .as("bucket"))
        .agg(count(lit(1)).as("cnt"))
        .select(count(lit(1))).collect()
    }
    time("full bucketAgg (with stop_cnt)") {
      TrainedQuality.features(docs, "doc_id", "text", 64)
        .select(count(lit(1))).collect()
    }
    val feat = time("features (tokenize+agg)") {
      val f = TrainedQuality.features(docs, "doc_id", "text", 64).persist()
      f.count(); f
    }
    val labels = time("teacherLabels (2nd pass)") {
      val l = TrainedQuality.teacherLabels(docs, "doc_id", "text").persist()
      l.count(); l
    }
    val trainFeat = time("trainFeat join") {
      val tf = feat.join(labels, Seq("id"))
        .filter(pmod(col("id"), lit(10L)) < 8).persist()
      tf.count(); tf
    }
    val model = time("train (countsOf x2)") {
      TrainedQuality.train(trainFeat, 64)
    }
    time("scoreWith + label join + count") {
      TrainedQuality.scoreWith(feat, model)
        .join(labels, Seq("id")).count()
    }
    time("nbQuality end-to-end (cold cache)") {
      spark.catalog.clearCache()
      TrainedQuality.nbQuality(docs, "doc_id", "text").count()
    }
    time("nbQuality 2nd run") {
      spark.catalog.clearCache()
      TrainedQuality.nbQuality(docs, "doc_id", "text").count()
    }
    spark.stop()
  }
}
