package graft.targets

import graft.SparkSpec
import graft.core.{Diff, Records}
import graft.mapper.Mapper
import graft.pipeline.{ImportService, Preset}
import graft.sources.InlineSource
import java.sql.DriverManager

/**
 * JDBC merge sink (W1-W4) against embedded Derby — the batched
 * INSERT/UPDATE/DELETE path with per-row error isolation.
 */
class JdbcTargetSpec extends SparkSpec {
  import spark.implicits._

  private def freshDb(name: String): String = {
    val url = s"jdbc:derby:memory:$name;create=true"
    val conn = DriverManager.getConnection(url)
    conn.createStatement().executeUpdate(
      "CREATE TABLE persons (id VARCHAR(32) PRIMARY KEY, " +
        "name VARCHAR(10), version BIGINT)")
    conn.close()
    s"jdbc:derby:memory:$name"
  }

  private def rows(url: String): Set[(String, String, Long)] = {
    val conn = DriverManager.getConnection(url)
    val rs = conn.createStatement().executeQuery("SELECT * FROM persons")
    val buf = scala.collection.mutable.Set[(String, String, Long)]()
    while (rs.next()) buf += ((rs.getString(1), rs.getString(2), rs.getLong(3)))
    conn.close(); buf.toSet
  }

  private val mapper = Mapper(Seq("id" -> "${record.__id}",
    "name" -> "name", "version" -> "${record.__version}"))

  test("full jdbc sync: insert, update, delete via batched statements") {
    val url = freshDb("sync1")
    val target = JdbcTarget(url, "persons")
    def preset(data: Seq[(String, Long, String)]) = Preset(
      InlineSource(s => { import s.implicits._
        data.toDF("id", "version", "name") }),
      target, mapper, idAttribute = "id", versionAttribute = Some("version"))

    // run 1: all inserts
    val r1 = new ImportService(preset(Seq(
      ("a", 1L, "Ada"), ("b", 1L, "Bob")))).importData(spark)
    assert((r1.added, r1.errors) === ((2L, 0L)))
    assert(rows(url) === Set(("a", "Ada", 1L), ("b", "Bob", 1L)))

    // run 2: update a (newer), remove b, add c
    val r2 = new ImportService(preset(Seq(
      ("a", 2L, "Ada2"), ("c", 1L, "Cyd")))).importData(spark)
    assert((r2.added, r2.updated, r2.removed) === ((1L, 1L, 1L)))
    assert(rows(url) === Set(("a", "Ada2", 2L), ("c", "Cyd", 1L)))
  }

  test("per-row error isolation: oversize value fails its row only, " +
      "with id + message on the error event") {
    val url = freshDb("sync2")
    // default batchSize: all three rows share one batch, so this
    // exercises the failed-batch row-by-row fallback — survivors must
    // land even if the driver stopped the batch at b's failure
    val target = JdbcTarget(url, "persons")
    val preset = Preset(
      InlineSource(s => { import s.implicits._
        Seq(("a", 1L, "ok"),
          ("b", 1L, "this-name-is-way-too-long-for-varchar10"),
          ("c", 1L, "fine")).toDF("id", "version", "name") }),
      target, mapper, idAttribute = "id", versionAttribute = Some("version"))
    val errEvents = scala.collection.mutable.ArrayBuffer[String]()
    val r = new ImportService(preset)
      .on((e, p) => if (e == graft.pipeline.ImportEvent.Error)
        errEvents += p.toString)
      .importData(spark)
    // row-by-row fallback makes the count exact, not >= 1
    assert(r.errors === 1)
    // the failing record's id and the db message are reported
    // (reference: ImportService.php:144-146 error event payload)
    assert(r.errorSamples.exists { case (id, msg) =>
      id == "b" && msg != null && msg.nonEmpty })
    assert(errEvents.exists(m => m.contains("\"b\"")))
    // the two good rows landed despite b's failure (SURVEY §1.5.5)
    assert(rows(url).map(_._1) === Set("a", "c"))
  }

  test("per-row isolation holds at batchSize=1 too") {
    val url = freshDb("sync2b")
    val target = JdbcTarget(url, "persons", batchSize = 1)
    val preset = Preset(
      InlineSource(s => { import s.implicits._
        Seq(("a", 1L, "ok"),
          ("b", 1L, "this-name-is-way-too-long-for-varchar10"),
          ("c", 1L, "fine")).toDF("id", "version", "name") }),
      target, mapper, idAttribute = "id", versionAttribute = Some("version"))
    val r = new ImportService(preset).importData(spark)
    assert(r.errors === 1)
    assert(rows(url).map(_._1) === Set("a", "c"))
  }

  test("mid-batch CHECK-constraint violations in BOTH phases: exact " +
      "error count, survivors land, remove phase still runs, import " +
      "completes (ImportService.php:144-149 continuation semantics)") {
    // integrity constraint enforced by the DATABASE, not a bind-time
    // data error: version must stay under 100
    val name = "sync_ck"
    val url = s"jdbc:derby:memory:$name;create=true"
    val conn = DriverManager.getConnection(url)
    conn.createStatement().executeUpdate(
      "CREATE TABLE persons (id VARCHAR(32) PRIMARY KEY, " +
        "name VARCHAR(10), version BIGINT, CHECK (version < 100))")
    conn.close()
    val target = JdbcTarget(s"jdbc:derby:memory:$name", "persons")
    def preset(data: Seq[(String, Long, String)]) = Preset(
      InlineSource(s => { import s.implicits._
        data.toDF("id", "version", "name") }),
      target, mapper, idAttribute = "id", versionAttribute = Some("version"))

    // sync 1: clean baseline
    val r1 = new ImportService(preset(Seq(
      ("a", 1L, "Ada"), ("b", 2L, "Bob"), ("c", 3L, "Cyd"))))
      .importData(spark)
    assert((r1.added, r1.errors) === ((3L, 0L)))

    // sync 2 in one batch per phase:
    //   UPDATE phase: a@150 violates CHECK mid-batch, b@5 succeeds
    //   INSERT phase: d@200 violates CHECK mid-batch, e@4 succeeds
    //   REMOVE phase: c absent from source -> must still delete
    val errEvents = scala.collection.mutable.ArrayBuffer[String]()
    val r2 = new ImportService(preset(Seq(
      ("a", 150L, "AdaX"), ("b", 5L, "Bob2"),
      ("d", 200L, "Dug"), ("e", 4L, "Eve"))))
      .on((e, p) => if (e == graft.pipeline.ImportEvent.Error)
        errEvents += p.toString)
      .importData(spark)
    // the import COMPLETED (no throw) with exactly the two bad rows
    // counted — the reference's per-record \Error continuation, not
    // the abort-the-import \Exception path
    assert(r2.errors === 2L)
    assert(r2.removed === 1L)
    assert(r2.errorSamples.map(_._1).toSet === Set("a", "d"))
    assert(errEvents.exists(_.contains("\"a\"")) &&
      errEvents.exists(_.contains("\"d\"")))
    // survivors of each phase landed; the failed update left a's old
    // row intact; the failed insert left no d row; c's delete ran
    assert(rows(s"jdbc:derby:memory:$name") === Set(
      ("a", "Ada", 1L),   // update rejected by CHECK -> row unchanged
      ("b", "Bob2", 5L),  // same-batch survivor applied
      ("e", "Eve", 4L)))  // insert-phase survivor applied, c removed
  }

  test("connection-class failure aborts the run instead of counting " +
      "errors (ImportService.php:147-149 Exception semantics)") {
    val good = freshDb("sync6")
    val data = Records.keyRecords(
      Seq(("a", 1L, "Ada")).toDF("id", "version", "name"),
      "id", Some("version"))
    val cs = Diff.computeDataChanges(data,
      JdbcTarget(good, "persons").currentState(spark),
      graft.core.DiffOptions())
    // a database that refuses connections: every write task dies on
    // getConnection — the import must THROW, not return "errors=N"
    val poisoned = JdbcTarget("jdbc:derby:memory:no_such_db", "persons")
    intercept[Exception] { poisoned.applyChanges(spark, cs, mapper) }
  }

  test("removeAll returns affected count (DbalTarget.php:160-167)") {
    val url = freshDb("sync3")
    val target = JdbcTarget(url, "persons")
    val conn = DriverManager.getConnection(url)
    conn.createStatement().executeUpdate(
      "INSERT INTO persons VALUES ('x', 'X', 1)")
    conn.close()
    assert(target.removeAll(spark) === 1L)
    assert(rows(url).isEmpty)
  }

  test("currentState reads narrow id/version snapshot") {
    val url = freshDb("sync4")
    val conn = DriverManager.getConnection(url)
    conn.createStatement().executeUpdate("INSERT INTO persons VALUES ('x', 'X', 7)")
    conn.close()
    val state = JdbcTarget(url, "persons").currentState(spark)
    val row = state.select("id", "version").head()
    assert(row.getString(0) === "x" && row.getLong(1) === 7L)
  }

  test("setup warns when table missing (DbalTarget.php:47-64)") {
    val url = freshDb("sync5")
    assert(JdbcTarget(url, "nope").setup(spark).warnings.nonEmpty)
    assert(JdbcTarget(url, "persons").setup(spark).ok)
  }
}
