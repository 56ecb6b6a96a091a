package graft.tools

import graft.ext.Similarity
import org.apache.spark.sql.functions._

/**
 * Local tuning harness (not part of the library surface): for each
 * candidate ANN setting, does the ANN top-k output EXACTLY equal the
 * brute-force top-k (ids, ranks, rounded sims) on a gate corpus?
 * Exact equality is what lets an ANN query carry the exhaustive
 * DuckDB oracle — recall pinned at 1.0 by the gate itself.
 *
 * Usage: runMain graft.tools.RecallProbe /root/testdata/sf0.01
 */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.util.Tables.session("graft-recall-probe",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = e.filter(col("vec_id") % 100 === 0)

    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double, Int)] =
      df.select(col("q_id").cast("long"), col("n_id").cast("long"),
          col("sim").cast("double"), col("rank").cast("int"))
        .collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet

    val brute = rows(Similarity.bruteForceTopK(e, q, k = 5))

    def check(name: String, df: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val got = rows(df)
      val dt = (System.nanoTime() - t0) / 1e9
      val extra = got -- brute
      val miss = brute -- got
      println(f"$name%-40s exact=${got == brute}%-5s " +
        f"miss=${miss.size}%2d extra=${extra.size}%2d $dt%6.2fs")
      spark.catalog.clearCache()
    }

    check("lsh np=4 r=2 (shipped)",
      Similarity.lshTopK(e, q, k = 5, nPlanes = 4, probeRadius = 2))
    check("lsh np=4 r=3",
      Similarity.lshTopK(e, q, k = 5, nPlanes = 4, probeRadius = 3))
    check("lsh np=6 r=3",
      Similarity.lshTopK(e, q, k = 5, nPlanes = 6, probeRadius = 3))
    check("lsh np=8 r=4",
      Similarity.lshTopK(e, q, k = 5, nPlanes = 8, probeRadius = 4))

    def ivf(nCells: Int, nProbe: Int) = {
      val celled = e.withColumn("cell",
        Similarity.ivfAssign(col("embedding"), nCells))
      val qq = e.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
          explode(Similarity.ivfProbe(col("embedding"), nCells, nProbe))
            .as("cell"))
      val c = celled.select(col("vec_id").as("n_id"),
        col("embedding").as("n_vec"), col("cell"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))
      c.join(qq, Seq("cell")).filter(col("q_id") =!= col("n_id"))
        .withColumn("sim", graft.functions.GraftFunctions
          .cosine_sim(col("q_vec"), col("n_vec")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("q_id"), col("n_id"), round(col("sim"), 6).as("sim"),
          col("rank"))
    }
    check("ivf nc=8 np=3 (shipped)", ivf(8, 3))
    check("ivf nc=8 np=7", ivf(8, 7))
    check("ivf nc=16 np=6", ivf(16, 6))
    check("ivf nc=16 np=8", ivf(16, 8))
    check("ivf nc=16 np=10", ivf(16, 10))
    check("ivf nc=4 np=3", ivf(4, 3))

    def ivfT(nProbe: Int) = {
      val cents = Similarity.trainCentroids(e, nCells = 8)
      Similarity.ivfTopKTrained(e, q, k = 5, cents, nProbe = nProbe)
    }
    check("ivfT nc=8 np=6 (shipped)", ivfT(6))
    check("ivfT nc=8 np=7", ivfT(7))

    {
      val cbs = Similarity.trainPqCodebooks(e, m = 16, k = 32)
      val codes = Similarity.pqEncode(e, cbs)
      check("pq m=16 k=32 short=50 (shipped)",
        Similarity.pqTopKRefined(codes, e, q, cbs, k = 5, shortlist = 50))
    }
    spark.stop()
  }
}
