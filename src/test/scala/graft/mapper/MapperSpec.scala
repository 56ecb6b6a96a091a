package graft.mapper

import graft.SparkSpec

/** Mapping semantics (Mapper.php:24-49, EelEvaluator.php:28-50). */
class MapperSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(("p1", "ada", 100.0, 19.0))
    .toDF("id", "name", "priceNet", "vat")

  test("verbatim attribute pass-through") {
    val out = Mapper(Seq("target_id" -> "id")).apply(df)
    assert(out.columns.toSeq === Seq("target_id"))
    assert(out.as[String].head() === "p1")
  }

  test("missing attribute maps to NULL, not error (Mapper.php:39-40)") {
    val out = Mapper(Seq("x" -> "does_not_exist")).apply(df)
    assert(out.head().isNullAt(0))
  }

  test("${...} expression with record. references (README.md:238-240)") {
    val out = Mapper(Seq(
      "name" -> "${upper(record.name)}",
      "gross" -> "${record.priceNet + record.vat}")).apply(df)
    val row = out.head()
    assert(row.getString(0) === "ADA")
    assert(row.getDouble(1) === 119.0)
  }

  test("non-enveloped string with expression syntax is a column name") {
    // `upper(name)` without ${} is treated as a (missing) column name
    val out = Mapper(Seq("x" -> "upper(name)")).apply(df)
    assert(out.head().isNullAt(0))
  }

  test("isExpression detection mirrors EelEvaluator.php:28-31") {
    assert(Mapper.asExpression("${record.a}").contains("record.a"))
    assert(Mapper.asExpression("  ${1 + 2}  ").contains("1 + 2"))
    assert(Mapper.asExpression("plain_column").isEmpty)
  }

  test("record refs not rewritten inside string literals") {
    assert(Mapper.rewriteRecordRefs("concat(record.a, 'record.b')")
      === "concat(a, 'record.b')")
  }

  test("applyKeepingKeys retains __id/__version for the sink") {
    val keyed = graft.core.Records.keyRecords(
      Seq(("p1", 7L, "ada")).toDF("id", "version", "name"),
      "id", Some("version"))
    val out = Mapper(Seq("n" -> "${upper(record.name)}"))
      .applyKeepingKeys(keyed)
    assert(out.columns.toSet === Set("__id", "__version", "n"))
  }

  test("custom helpers are usable inside ${...} rules " +
      "(EelEvaluator.php:23-26 custom Eel helpers)") {
    import spark.implicits._
    Helpers.register(spark, "cents", "x DOUBLE",
      "CAST(floor(x * 100) AS BIGINT)")
    Helpers.register(spark, "shout", "s STRING", "upper(s) || '!'")
    val df = Seq(("a", 1.239, "hi")).toDF("id", "price", "word")
    val out = Mapper(Seq(
      "c" -> "${cents(record.price)}",
      "w" -> "${shout(record.word)}")).apply(df).head()
    assert(out.getLong(0) === 123L)
    assert(out.getString(1) === "HI!")
    // SQL-bodied helpers inline at analysis: no UDF node in the plan
    val plan = Mapper(Seq("c" -> "${cents(record.price)}"))
      .apply(df).queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("udf"), plan)
  }
}
