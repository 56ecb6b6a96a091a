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
}
