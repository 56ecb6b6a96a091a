package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Salting utilities: results must equal the unsalted equivalents. */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  private lazy val skewed = (1 to 1000).map(i =>
    (if (i % 10 == 0) 1L else i.toLong, s"v$i")).toDF("k", "v")
  private lazy val dims = Seq((1L, "hot"), (2L, "cold"), (7L, "warm"))
    .toDF("k", "label")

  test("saltedJoin equals the plain inner join") {
    val plain = skewed.join(dims, "k").select("k", "v", "label")
      .as[(Long, String, String)].collect().toSet
    val salted = Skew.saltedJoin(skewed, dims, "k", saltFactor = 4)
      .select("k", "v", "label").as[(Long, String, String)].collect().toSet
    assert(salted === plain)
    // the hot key survives intact: 100 decade rows + i=1 itself
    assert(salted.count(_._1 == 1L) === 101)
  }

  test("saltedCount equals the plain count") {
    val plain = skewed.groupBy("k").count()
      .as[(Long, Long)].collect().toMap
    val salted = Skew.saltedCount(skewed, "k", saltFactor = 4)
      .as[(Long, Long)].collect().toMap
    assert(salted === plain)
  }

  test("saltedCountSum equals the plain count+sum under any salt") {
    val withV = skewed.withColumn("v2", col("k") * 10 + length(col("v")))
    val plain = withV.groupBy("k")
      .agg(count(lit(1)).as("n"), sum(col("v2")).as("v2"))
      .as[(Long, Long, Long)].collect().toSet
    for (salt <- Seq(pmod(col("v2"), lit(4L)), lit(0L))) {
      val salted = Skew.saltedCountSum(withV, "k", "v2", salt)
        .as[(Long, Long, Long)].collect().toSet
      assert(salted === plain)
    }
  }

  test("globalRank: distributed rank equals the naive global window " +
      "at every partition count (boundary-independent)") {
    import graft.core.Ranking
    val df = spark.range(0, 500).select(
      (col("id") * 7919 % 501).as("a"), col("id").as("b"))
    val naive = df.withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("a"), col("b"))).cast("long"))
      .as[(Long, Long, Long)].collect().toSet
    for (p <- Seq(1, 3, 16)) {
      val got = Ranking.globalRank(df, Seq(col("a"), col("b")), p)
        .select(col("a"), col("b"), col("rank"))
        .as[(Long, Long, Long)].collect().toSet
      assert(got === naive, s"partitions=$p")
    }
  }
}
