package graft.tools

import org.apache.spark.sql.functions._

/** Stage-metric phase breakdown of the q_dedup_index lifecycle —
  * per phase: wall, Spark jobs launched, summed task time, shuffle
  * read/write bytes (builder-local profiling, not part of the driver
  * contract). A second rep of each phase separates one-time codegen
  * from steady-state. Usage: DedupIndexProf2 <dir> */
object DedupIndexProf2 {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = graft.util.Tables.session("didx-prof2", "32")
    graft.SparkEntry.queries("q1_agg")(spark, dir).count() // warm
    val taskTime = new java.util.concurrent.atomic.AtomicLong(0L)
    val shufR = new java.util.concurrent.atomic.AtomicLong(0L)
    val shufW = new java.util.concurrent.atomic.AtomicLong(0L)
    val jobs = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); ()
        }
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val m = s.stageInfo.taskMetrics
          if (m != null) {
            taskTime.addAndGet(m.executorRunTime)
            shufR.addAndGet(m.shuffleReadMetrics.totalBytesRead)
            shufW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          }
          ()
        }
      })
    def time[A](tag: String)(f: => A): A = {
      Thread.sleep(200)
      taskTime.set(0); shufR.set(0); shufW.set(0); jobs.set(0)
      val t0 = System.nanoTime()
      val a = f
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // drain listener
      println(f"[didx2] $tag%-16s ${dt}%7.2fs jobs=${jobs.get}%3d " +
        f"task=${taskTime.get / 1e3}%7.1fs " +
        f"shufR=${shufR.get / 1e6}%8.1fMB shufW=${shufW.get / 1e6}%8.1fMB")
      a
    }
    val hash = graft.ext.TextAnalysis.portableHash60 _
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val initial = d.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id").cast("string").as("id"),
        when(col("doc_id") % 6 === 0, concat(lit("stale "), col("text")))
          .otherwise(col("text")).as("text"),
        lit(1L).as("version"))
    val source = d
      .filter(col("doc_id") % 2 === 0 && col("doc_id") % 10 =!= 6)
      .select(col("doc_id").cast("string").as("id"),
        when(col("doc_id") % 6 === 0, lit(2L)).otherwise(lit(1L))
          .as("version"),
        col("text"))
    val batch = d.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id").cast("string").as("id"), col("text"))
    for (rep <- 1 to 2) {
      println(s"== rep $rep ==")
      val root = java.nio.file.Files
        .createTempDirectory("didxprof2").toString + "/idx"
      time("build") {
        graft.ext.DedupIndex.build(spark, initial, root, k = 32,
          bands = 8, n = 3, idCol = "id", textCol = "text",
          baseHash = hash)
      }
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
          idCol = "id", textCol = "text", baseHash = hash)
      }
      time("probe") {
        graft.ext.DedupIndex.probe(spark, root, batch, threshold = 0.5,
          idCol = "id", textCol = "text", baseHash = hash).count()
      }
      // sub-phases of probe, separately (everything warm by now)
      val cur = graft.util.GenSwap.currentDir(root).get
      time("probe:shingle") {
        graft.ext.Dedup.shingled(batch, "id", "text", 3)
          .write.format("noop").mode("overwrite").save()
      }
      time("probe:sigs") {
        graft.ext.Dedup.signaturesFromShingled(
          graft.ext.Dedup.shingled(batch, "id", "text", 3), 32, hash)
          .write.format("noop").mode("overwrite").save()
      }
      time("probe:bands") {
        graft.ext.Dedup.bandedSignatures(
          graft.ext.Dedup.signaturesFromShingled(
            graft.ext.Dedup.shingled(batch, "id", "text", 3), 32, hash),
          32, 8)
          .write.format("noop").mode("overwrite").save()
      }
      time("idx:bandsscan") {
        graft.ext.DedupIndex.bandsTable(spark, cur)
          .write.format("noop").mode("overwrite").save()
      }
      time("idx:shinglescan") {
        graft.ext.DedupIndex.shinglesTable(spark, cur)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
