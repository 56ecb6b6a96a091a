package graft.core

import graft.SparkSpec
import org.apache.spark.SparkException
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Keying semantics — ports the reference's only unit test file
 * (Tests/Unit/ValueObject/DataRecordsTest.php) and widens per
 * SURVEY §5: dedup last-wins, version parse matrix, error asymmetry.
 */
class RecordsSpec extends SparkSpec {
  import spark.implicits._

  test("empty input yields empty keyed records (DataRecordsTest:18-22)") {
    val df = Seq.empty[(String, Long)].toDF("id", "version")
    assert(Records.keyRecords(df, "id", Some("version")).count() === 0)
  }

  test("count semantics 0/1/2 rows (DataRecordsTest:24-43)") {
    for (n <- 0 to 2) {
      val df = (1 to n).map(i => (s"id$i", i.toLong)).toDF("id", "version")
      assert(Records.keyRecords(df, "id", Some("version")).count() === n)
    }
  }

  test("duplicate id keeps LAST occurrence (DataRecords.php:30-44)") {
    val df = Seq(
      ("p2", 1L, "Alan"), ("p2", 2L, "ALAN"), ("p1", 3L, "Ada"))
      .toDF("id", "version", "name")
    val keyed = Records.keyRecords(df, "id", Some("version"),
      orderCol = Some(monotonically_increasing_id()))
    val p2 = keyed.filter($"__id" === "p2").collect()
    assert(p2.length === 1)
    assert(p2.head.getAs[String]("name") === "ALAN")
    assert(p2.head.getAs[Long]("__version") === 2L)
  }

  test("id is coerced to string (DataRecords.php:34)") {
    val df = Seq((42, 1L)).toDF("id", "version")
    val row = Records.keyRecords(df, "id", Some("version")).collect().head
    assert(row.getAs[String]("__id") === "42")
  }

  test("missing id attribute is an error (DataRecords.php:31-33)") {
    val df = Seq((null.asInstanceOf[String], 1L)).toDF("id", "version")
    val e = intercept[Exception] {
      Records.keyRecords(df, "id", Some("version")).collect()
    }
    assert(e.getMessage.contains("Missing id attribute"))
  }

  test("missing version is an error when configured (DataRecords.php:36-38)") {
    val df = Seq(("a", null.asInstanceOf[java.lang.Long])).toDF("id", "version")
    val e = intercept[Exception] {
      Records.keyRecords(df, "id", Some("version")).collect()
    }
    assert(e.getMessage.contains("Missing version attribute"))
  }

  test("no version configured ⇒ version column null (DataVersion NONE)") {
    val df = Seq(("a", "x")).toDF("id", "payload")
    val row = Records.keyRecords(df, "id", None).collect().head
    assert(row.isNullAt(row.fieldIndex("__version")))
  }

  // ── DataVersion::parse matrix (DataVersion.php:48-70) ───────────

  test("version parse: int passes through") {
    val df = Seq(("a", 42L)).toDF("id", "v")
    assert(df.select(Records.parseVersion(df, "v")).as[Long].head() === 42L)
  }

  test("version parse: negative int rejected → null (DataVersion.php:27-29)") {
    val df = Seq(("a", -1L)).toDF("id", "v")
    assert(df.select(Records.parseVersion(df, "v")).head().isNullAt(0))
  }

  test("version parse: ISO date string → epoch seconds") {
    val df = Seq(("a", "2024-08-07T12:00:00+00:00")).toDF("id", "v")
    assert(df.select(Records.parseVersion(df, "v")).as[Long].head() === 1723032000L)
  }

  test("version parse: numeric string → long (DataVersion.php:60-62)") {
    val df = Seq(("a", "1722945600")).toDF("id", "v")
    assert(df.select(Records.parseVersion(df, "v")).as[Long].head() === 1722945600L)
  }

  test("version parse: timestamp column → epoch seconds") {
    val df = Seq(("a", java.sql.Timestamp.valueOf("2024-08-07 12:00:00")))
      .toDF("id", "v")
    assert(df.select(Records.parseVersion(df, "v")).as[Long].head() === 1723032000L)
  }

  test("version parse: struct {date, timezone} → epoch (DataVersion.php:51-53)") {
    val df = Seq(("a", ("2024-08-07 12:00:00", "UTC")))
      .toDF("id", "v")
      .withColumn("v", struct($"v._1".as("date"), $"v._2".as("timezone")))
    assert(df.select(Records.parseVersion(df, "v")).as[Long].head() === 1723032000L)
  }

  test("version parse: garbage string → null") {
    val df = Seq(("a", "not-a-date")).toDF("id", "v")
    assert(df.select(Records.parseVersion(df, "v")).head().isNullAt(0))
  }
}
