package graft.tools

import org.apache.spark.sql.functions._

/** Microbenchmark of the minhash signature pipeline's stages —
  * locates the per-doc cost inside signaturesFromShingled
  * (builder-local profiling, not part of the driver contract).
  * Usage: SigProf <dir> */
object SigProf {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.util.Tables.session("sig-prof", "32")
    val taskTime = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val m = s.stageInfo.taskMetrics
          if (m != null) taskTime.addAndGet(m.executorRunTime)
          ()
        }
      })
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") % 2 === 1)
      .select(col("doc_id").cast("string").as("id"), col("text"))
    val hash = graft.ext.TextAnalysis.portableHash60 _
    val p = graft.ext.Dedup.MinhashP
    val params = graft.ext.Dedup.minhashParams(32)

    def time(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val runs = (1 to 3).map { _ =>
        Thread.sleep(100); taskTime.set(0)
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        Thread.sleep(200)
        (dt, taskTime.get / 1e3)
      }
      val best = runs.minBy(_._1)
      println(f"[sigprof] $label%-34s wall=${best._1}%6.2fs task=${best._2}%7.1fs")
    }

    val sh = graft.ext.Dedup.shingled(d, "id", "text", 3)
    val ex = sh.select(col("id"), explode(col("sh")).as("s"))
    time("shingle array")(sh)
    time("explode")(ex)
    time("explode+xxhash64")(ex.select(col("id"), xxhash64(col("s")).as("h")))
    time("explode+hash60")(ex.select(col("id"), hash(col("s")).as("h")))
    val h = ex.select(col("id"), pmod(hash(col("s")), lit(p)).as("h"))
    time("explode+hash60+pmod")(h)
    val wide = h.select(col("id") +:
      params.zipWithIndex.map { case ((a, b), i) =>
        pmod(col("h") * a + b, lit(p)).as(s"h$i") }: _*)
    time("+32 pmod cols")(wide)
    time("+groupBy 32 mins")(
      wide.groupBy("id").agg(min("h0").as("m0"),
        (1 until 32).map(i => min(s"h$i").as(s"m$i")): _*))
    time("full sigs (prod path)")(
      graft.ext.Dedup.signaturesFromShingled(
        graft.ext.Dedup.shingled(d, "id", "text", 3), 32, hash))
    // arrays-instead-of-columns alternative: one array expr + explode-free agg?
    time("full bands (prod path)")(
      graft.ext.Dedup.bandedSignatures(
        graft.ext.Dedup.signaturesFromShingled(
          graft.ext.Dedup.shingled(d, "id", "text", 3), 32, hash), 32, 8))
    spark.stop()
  }
}
