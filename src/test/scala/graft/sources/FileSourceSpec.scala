package graft.sources

import graft.SparkSpec

/** File source format handling (S1 generalized to csv/parquet). */
class FileSourceSpec extends SparkSpec {
  import spark.implicits._

  test("csv with header and schema inference") {
    val dir = tmpDir("fs-csv")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "data.csv"),
      "id,version,name\na,1,Ada\nb,2,Bob\n")
    val df = FileSource(s"$dir/data.csv").load(spark)
    assert(df.count() === 2)
    assert(df.schema("version").dataType ===
      org.apache.spark.sql.types.IntegerType)
  }

  test("caller-supplied option overrides the per-format default " +
    "(header=false wins over the csv header default)") {
    val dir = tmpDir("fs-csv-nohdr")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "data.csv"),
      "a,1\nb,2\n")
    val df = FileSource(s"$dir/data.csv",
      options = Map("header" -> "false")).load(spark)
    // with header=false the first line is data, not column names
    assert(df.count() === 2)
    assert(df.columns.head.startsWith("_c"))
  }

  test("parquet round trip") {
    val dir = tmpDir("fs-parquet")
    Seq(("a", 1L)).toDF("id", "version").write.parquet(s"$dir/data.parquet")
    val df = FileSource(s"$dir/data.parquet").load(spark)
    assert(df.count() === 1)
  }

  test("orc round trip preserves types; extension sniffing picks orc") {
    val dir = tmpDir("fs-orc")
    Seq(("a", 1L, 2.5), ("b", 2L, -0.5)).toDF("id", "version", "score")
      .write.orc(s"$dir/data.orc")
    val df = FileSource(s"$dir/data.orc").load(spark)
    assert(df.count() === 2)
    assert(df.schema("version").dataType ===
      org.apache.spark.sql.types.LongType)
    assert(df.schema("score").dataType ===
      org.apache.spark.sql.types.DoubleType)
  }

  test("explicit format overrides extension sniffing") {
    val dir = tmpDir("fs-fmt")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "data.txt"),
      """[{"id": "a", "version": 1}]""")
    val df = FileSource(s"$dir/data.txt", format = Some("json")).load(spark)
    assert(df.count() === 1)
  }

  test("mergeSchema option: two parquet generations read as one " +
    "frame, legacy rows surface the added column as NULL") {
    val dir = tmpDir("fs-evolve")
    Seq(("a", 1L)).toDF("id", "version")
      .write.parquet(s"$dir/gen1")
    Seq(("b", 2L, 42L)).toDF("id", "version", "score")
      .write.parquet(s"$dir/gen2")
    val df = FileSource(s"$dir/gen*", Some("parquet"),
      Map("mergeSchema" -> "true")).load(spark)
    assert(df.columns.toSet === Set("id", "version", "score"))
    val rows = df.collect().map(r =>
      (r.getString(0), r.isNullAt(df.columns.indexOf("score")))).toSet
    assert(rows === Set(("a", true), ("b", false)))
  }

  test("setup flags missing and unreadable paths") {
    assert(!FileSource("/does/not/exist.json").setup(spark).ok)
    val dir = tmpDir("fs-ok")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "x.json"), "[]")
    assert(FileSource(s"$dir/x.json").setup(spark).ok)
  }
}
