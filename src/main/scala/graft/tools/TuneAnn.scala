package graft.tools

import graft.ext.Similarity
import org.apache.spark.sql.functions._

/** Recall tuner for the ANN tier (builder-local iteration only). */
object TuneAnn {
  def main(args: Array[String]): Unit = {
    val spark = graft.util.Tables.session("tune-ann", "16")
    import spark.implicits._
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = e.filter($"vec_id" % 100 === 0)
    val brute = Similarity.bruteForceTopK(e, q, k = 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    def recall(ann: Set[(Long, Long)]): Double =
      (ann & brute).size.toDouble / brute.size

    for (nPlanes <- Seq(4, 5, 6); radius <- Seq(1, 2, 3) if radius <= nPlanes) {
      val ann = Similarity.lshTopK(e, q, k = 5, nPlanes = nPlanes,
          probeRadius = radius)
        .select("q_id", "n_id").as[(Long, Long)].collect().toSet
      val probes = (0 to radius).map(r =>
        (0 until nPlanes).combinations(r).size).sum
      println(f"[tune] lsh planes=$nPlanes radius=$radius " +
        f"probes=$probes/${1 << nPlanes} recall=${recall(ann)}%.3f")
    }
    for (nCells <- Seq(8, 16); nProbe <- Seq(3, 4, 5, 6) if nProbe <= nCells) {
      val cents = Similarity.trainCentroids(e, nCells)
      val ann = Similarity.ivfTopKTrained(e, q, k = 5, cents, nProbe)
        .select("q_id", "n_id").as[(Long, Long)].collect().toSet
      println(f"[tune] ivf-trained cells=$nCells probe=$nProbe " +
        f"recall=${recall(ann)}%.3f")
    }
    for (nCells <- Seq(8, 16); nProbe <- Seq(3, 4, 5, 6) if nProbe <= nCells) {
      val celled = e.withColumn("cell",
        Similarity.ivfAssign($"embedding", nCells))
      val qc = q.select($"vec_id".as("q_id"), $"embedding".as("q_vec"),
        explode(Similarity.ivfProbe($"embedding", nCells, nProbe)).as("cell"))
      val cc = celled.select($"vec_id".as("n_id"),
        $"embedding".as("n_vec"), $"cell")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"q_id").orderBy($"sim".desc, $"n_id")
      val ann = cc.join(qc, Seq("cell")).filter($"q_id" =!= $"n_id")
        .withColumn("sim", graft.functions.GraftFunctions
          .cosine_sim($"q_vec", $"n_vec"))
        .withColumn("rank", row_number().over(w))
        .filter($"rank" <= 5)
        .select("q_id", "n_id").as[(Long, Long)].collect().toSet
      println(f"[tune] ivf-pseudo cells=$nCells probe=$nProbe " +
        f"recall=${recall(ann)}%.3f")
    }
    spark.stop()
  }
}
