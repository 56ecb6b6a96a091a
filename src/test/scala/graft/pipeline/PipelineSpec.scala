package graft.pipeline

import graft.SparkSpec
import graft.core.DiffOptions
import graft.mapper.Mapper
import graft.sources.{FileSource, InlineSource}
import graft.targets.FileTarget
import org.apache.spark.sql.functions._

/**
 * End-to-end sync pipeline — the SURVEY §7.2 minimum slice:
 * JSON FileSource → keying → mapping → diff vs FileTarget → apply,
 * across multiple runs (idempotence, update, remove).
 */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private def writeFixture(dir: String, name: String, json: String): String = {
    val p = java.nio.file.Paths.get(dir, name)
    java.nio.file.Files.writeString(p, json)
    p.toString
  }

  private val personsJson =
    """[
      |  {"id": "p1", "given_name": "Ada",  "family_name": "Lovelace", "version": 3},
      |  {"id": "p2", "given_name": "Alan", "family_name": "Turing",   "version": 1},
      |  {"id": "p2", "given_name": "ALAN", "family_name": "TURING",   "version": 2},
      |  {"id": "p3", "given_name": "Edsger", "family_name": "Dijkstra", "version": 1}
      |]""".stripMargin

  private val mapper = Mapper(Seq(
    "firstName" -> "${initcap(record.given_name)}",
    "lastName" -> "family_name"))

  test("full sync lifecycle: add, idempotent re-run, update, remove") {
    val dir = tmpDir("pipeline")
    val fixture = writeFixture(dir, "persons.json", personsJson)
    val target = FileTarget(s"$dir/target")
    val preset = Preset(FileSource(fixture), target, mapper,
      idAttribute = "id", versionAttribute = Some("version"))
    val service = new ImportService(preset)

    // run 1: everything added; duplicate p2 deduped last-wins
    val r1 = service.importData(spark)
    assert((r1.added, r1.updated, r1.removed) === ((3L, 0L, 0L)))
    val state1 = spark.read.parquet(s"$dir/target")
    assert(state1.count() === 3)
    val p2 = state1.filter($"id" === "p2").head()
    assert(p2.getAs[String]("firstName") === "Alan") // initcap of ALAN (last-wins)
    assert(p2.getAs[Long]("version") === 2L)

    // run 2: unchanged source ⇒ empty changeset (idempotence)
    val r2 = service.importData(spark)
    assert((r2.added, r2.updated, r2.removed) === ((0L, 0L, 0L)))

    // run 3: p1 bumped, p3 gone, p4 new
    writeFixture(dir, "persons.json",
      """[
        |  {"id": "p1", "given_name": "ada2", "family_name": "Lovelace", "version": 4},
        |  {"id": "p2", "given_name": "ALAN", "family_name": "TURING",  "version": 2},
        |  {"id": "p4", "given_name": "Grace", "family_name": "Hopper", "version": 1}
        |]""".stripMargin)
    val r3 = service.importData(spark)
    assert((r3.added, r3.updated, r3.removed) === ((1L, 1L, 1L)))
    val state3 = spark.read.parquet(s"$dir/target")
    assert(state3.count() === 3)
    assert(state3.filter($"id" === "p1").head().getAs[String]("firstName") === "Ada2")
    assert(state3.filter($"id" === "p3").count() === 0)

    // run 4: force ⇒ every surviving source row updates
    val r4 = service.importData(spark, forceUpdates = true)
    assert((r4.added, r4.updated, r4.removed) === ((0L, 3L, 0L)))
  }

  test("skip guards throw before any write (ImportService.php:77-82)") {
    val dir = tmpDir("pipeline-skip")
    val source = InlineSource(s => {
      import s.implicits._
      Seq(("a", 1L)).toDF("id", "version")
    })
    val target = FileTarget(s"$dir/target")
    val preset = Preset(source, target, Mapper(Seq("id" -> "id")),
      idAttribute = "id", versionAttribute = Some("version"),
      skipAddedRecords = true)
    // diff zeroes the added branch ⇒ no exception, no writes
    val r = new ImportService(preset).importData(spark)
    assert(r.added === 0)
  }

  test("prune refuses to run with skip flags (ImportService.php:96-100)") {
    val dir = tmpDir("pipeline-prune")
    val preset = Preset(
      InlineSource(s => { import s.implicits._; Seq(("a", 1L)).toDF("id", "version") }),
      FileTarget(s"$dir/target"), Mapper(Seq("id" -> "id")),
      idAttribute = "id", versionAttribute = Some("version"),
      skipRemovedRecords = true)
    intercept[ImportServiceException] {
      new ImportService(preset).removeAllData(spark)
    }
  }

  test("prune removes all and returns count (DbalTarget.php:160-167)") {
    val dir = tmpDir("pipeline-prune2")
    val preset = Preset(
      InlineSource(s => { import s.implicits._
        Seq(("a", 1L), ("b", 2L)).toDF("id", "version") }),
      FileTarget(s"$dir/target"), Mapper(Seq("id" -> "id")),
      idAttribute = "id", versionAttribute = Some("version"))
    val svc = new ImportService(preset)
    svc.importData(spark)
    assert(svc.removeAllData(spark) === 2L)
    assert(svc.importData(spark).added === 2L) // resync from scratch
  }

  test("dataProcessor runs between load and diff (Preset.php:44-50)") {
    val dir = tmpDir("pipeline-proc")
    val preset = Preset(
      InlineSource(s => { import s.implicits._
        Seq(("a", 1L, 10), ("b", 2L, 99)).toDF("id", "version", "score") }),
      FileTarget(s"$dir/target"),
      Mapper(Seq("id" -> "id", "score" -> "score")),
      idAttribute = "id", versionAttribute = Some("version"),
      dataProcessor = Some(df => df.filter(col("score") < 50)))
    val r = new ImportService(preset).importData(spark)
    assert(r.added === 1)
  }

  test("all 13 lifecycle events fire in reference order " +
      "(ImportService.php:17-31)") {
    val dir = tmpDir("pipeline-events")
    // seed: b (stale → update), c (absent from source → remove);
    // source: a (new → add), b
    def preset(src: Seq[(String, Long)]) = Preset(
      InlineSource(s => { import s.implicits._; src.toDF("id", "version") }),
      FileTarget(s"$dir/target"), Mapper(Seq("id" -> "id")),
      idAttribute = "id", versionAttribute = Some("version"))
    new ImportService(preset(Seq("b" -> 1L, "c" -> 1L))).importData(spark)
    val seen = scala.collection.mutable.ArrayBuffer[ImportEvent.Value]()
    new ImportService(preset(Seq("a" -> 1L, "b" -> 2L)))
      .on((e, _) => seen += e).importData(spark)
    import ImportEvent._
    assert(seen.toSeq === Seq(PreComputeChanges, PreImportData,
      PreAddData, DoAddData, PostAddData,
      PreUpdateData, DoUpdateData, PostUpdateData,
      PreRemoveData, DoRemoveData, PostRemoveData,
      Finalize))
    // Error is the 13th member of the surface; it fires on record
    // failures (JdbcTargetSpec covers it with ids and messages)
    assert(ImportEvent.values.size === 13)
  }

  test("setup validates source path (FileSource.php:26-35)") {
    val preset = Preset(FileSource("/nonexistent/file.json"),
      FileTarget(tmpDir("t")), Mapper(Seq("id" -> "id")), "id")
    assert(!new ImportService(preset).setup(spark).ok)
  }
}
