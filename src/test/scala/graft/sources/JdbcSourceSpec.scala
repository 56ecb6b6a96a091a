package graft.sources

import graft.SparkSpec
import graft.mapper.Mapper
import graft.pipeline.{ImportService, Preset}
import graft.targets.JdbcTarget
import java.sql.DriverManager

/** JDBC source (S3/S4) + the reference's main deployment shape:
  * DBAL table → diff → DBAL table (DbalSource + DbalTarget). */
class JdbcSourceSpec extends SparkSpec {

  private def db(name: String, ddlAndRows: Seq[String]): String = {
    val url = s"jdbc:derby:memory:$name;create=true"
    val conn = DriverManager.getConnection(url)
    ddlAndRows.foreach(conn.createStatement().executeUpdate)
    conn.close()
    s"jdbc:derby:memory:$name"
  }

  test("jdbc scan reads table; column pruning reaches the source (S4)") {
    val url = db("src1", Seq(
      "CREATE TABLE items (id VARCHAR(8), version BIGINT, payload VARCHAR(64))",
      "INSERT INTO items VALUES ('a', 1, 'x'), ('b', 2, 'y')"))
    val df = JdbcSource(url, "items").load(spark)
    assert(df.count() === 2)
    // narrow select only reads (ID, VERSION) from the JDBC scan — the
    // reference's lazy-loading narrow read, free via Catalyst pruning
    val narrow = df.select("id", "version")
    val scan = narrow.queryExecution.executedPlan.collectLeaves().head
    assert(scan.toString.contains("ID") && !scan.toString.contains("PAYLOAD"))
  }

  test("partitioned read uses real min/max bounds: no empty shards") {
    val url = db("src_part", Seq(
      "CREATE TABLE items (id BIGINT, version BIGINT)",
      "INSERT INTO items VALUES " +
        (1 to 40).map(i => s"($i, $i)").mkString(", ")))
    val df = JdbcSource(url, "items",
      partitionColumn = Some("id"), numPartitions = 4).load(spark)
    // with Long.MinValue/MaxValue placeholder bounds all 40 rows land
    // in one stride; real bounds (1..40) give 4 busy partitions
    val counts = df.rdd
      .mapPartitionsWithIndex((i, it) => Iterator(i -> it.size))
      .collect().toMap
    assert(counts.size === 4)
    assert(counts.values.forall(_ > 0), counts.toString)
    assert(counts.values.sum === 40)
  }

  test("setup reports unreachable database (C4)") {
    assert(!JdbcSource("jdbc:derby:memory:nope_does_not_exist", "t")
      .setup(spark).ok)
  }

  test("end-to-end DBAL→DBAL sync: the reference's main deployment") {
    val srcUrl = db("e2esrc", Seq(
      "CREATE TABLE people (id VARCHAR(8), version BIGINT, name VARCHAR(32))",
      "INSERT INTO people VALUES ('a', 2, 'Ada'), ('b', 1, 'Bob')"))
    val tgtUrl = db("e2etgt", Seq(
      "CREATE TABLE persons (id VARCHAR(8) PRIMARY KEY, " +
        "name VARCHAR(32), version BIGINT)",
      "INSERT INTO persons VALUES ('a', 'Old Ada', 1)",
      "INSERT INTO persons VALUES ('z', 'Zoe', 1)"))
    val preset = Preset(
      JdbcSource(srcUrl, "people"),
      JdbcTarget(tgtUrl, "persons"),
      Mapper(Seq("id" -> "${record.__id}", "name" -> "name",
        "version" -> "${record.__version}")),
      idAttribute = "id", versionAttribute = Some("version"))
    val r = new ImportService(preset).importData(spark)
    // b added; a updated (2 > 1); z removed
    assert((r.added, r.updated, r.removed) === ((1L, 1L, 1L)))
    val conn = DriverManager.getConnection(tgtUrl)
    val rs = conn.createStatement()
      .executeQuery("SELECT id, name, version FROM persons ORDER BY id")
    val rows = Iterator.continually(rs)
      .takeWhile(_.next())
      .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toList
    conn.close()
    assert(rows === List(("a", "Ada", 2L), ("b", "Bob", 1L)))
  }
}
