package graft.core

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * ChangeSet diff semantics (D1-D4) including the FIXTURES.md expected
 * outcomes and randomized invariants from SURVEY §5.2 (seeded — the
 * scalacheck-style generators are hand-rolled to stay inside the
 * build's offline dependency set).
 */
class DiffSpec extends SparkSpec {
  import spark.implicits._

  // keyed-shape frame built directly (a null version is legal INPUT to
  // the diff — it means DataVersion::NONE; keyRecords would reject it
  // at ingest, which RecordsSpec covers separately)
  private def sourceDf(rows: Seq[(String, java.lang.Long)]): DataFrame =
    rows.toDF("id", "version")
      .withColumn(Records.IdCol, col("id"))
      .withColumn(Records.VersionCol, col("version"))

  private def localDf(rows: Seq[(String, java.lang.Long)]): DataFrame =
    rows.toDF("id", "version")

  // FIXTURES.md persons scenario
  private val persons = Seq(("p1", 3L: java.lang.Long), ("p2", 2L: java.lang.Long),
    ("p3", 1L: java.lang.Long))
  private val personsLocal = Seq(("p2", 2L: java.lang.Long), ("p9", 1L: java.lang.Long))

  test("persons fixture: added={p1,p3}, updated={}, removed={p9}") {
    val cs = Diff.computeDataChanges(sourceDf(persons), localDf(personsLocal))
    assert(cs.added.select("__id").as[String].collect().toSet === Set("p1", "p3"))
    // p2 source version 2 is NOT > local 2 (strictly greater rule)
    assert(cs.updated.count() === 0)
    assert(cs.removedIds.as[String].collect().toSet === Set("p9"))
  }

  test("forceUpdates ⇒ updated = source ∩ local (DbalTarget.php:80-82)") {
    val cs = Diff.computeDataChanges(sourceDf(persons), localDf(personsLocal),
      DiffOptions(forceUpdates = true))
    assert(cs.updated.select("__id").as[String].collect().toSet === Set("p2"))
  }

  test("missing version on either side ⇒ update (DbalTarget.php:106-116)") {
    val src = sourceDf(Seq(("a", null), ("b", 5L: java.lang.Long)))
    val loc = localDf(Seq(("a", 9L: java.lang.Long), ("b", null)))
    val cs = Diff.computeDataChanges(src, loc)
    assert(cs.updated.select("__id").as[String].collect().toSet === Set("a", "b"))
  }

  test("skip flags zero the branches (DbalTarget.php:69,75-77)") {
    val cs = Diff.computeDataChanges(sourceDf(persons), localDf(personsLocal),
      DiffOptions(skipAddedRecords = true, skipRemovedRecords = true))
    assert(cs.added.count() === 0)
    assert(cs.removedIds.count() === 0)
  }

  test("idPrefix strip + hidden exclusion (ContentRepositoryTarget.php:95-107)") {
    val src = sourceDf(Seq(("1", 10L: java.lang.Long), ("2", 10L: java.lang.Long)))
    val loc = Seq(("node-2", 5L, false), ("node-3", 5L, false), ("node-4", 5L, true))
      .toDF("id", "version", "hidden")
    val cs = Diff.computeDataChanges(src, loc,
      DiffOptions(localIdPrefix = Some("node-"), hiddenCol = Some("hidden")))
    assert(cs.added.select("__id").as[String].collect().toSet === Set("1"))
    assert(cs.updated.select("__id").as[String].collect().toSet === Set("2"))
    // 3 removed; 4 hidden ⇒ NOT removed
    assert(cs.removedIds.as[String].collect().toSet === Set("3"))
  }

  test("idPrefix with regex metacharacters strips literally") {
    // 'node.' as a regex would match 'nodeX' too; the strip must be
    // literal (reference does a fixed-length substr)
    val src = sourceDf(Seq(("1", 10L: java.lang.Long)))
    val loc = Seq(("node.1", 5L), ("nodeX2", 5L)).toDF("id", "version")
    val cs = Diff.computeDataChanges(src, loc,
      DiffOptions(localIdPrefix = Some("node.")))
    // node.1 → 1 (updated); nodeX2 stays nodeX2 (removed), NOT '2'
    assert(cs.updated.select("__id").as[String].collect().toSet === Set("1"))
    assert(cs.removedIds.as[String].collect().toSet === Set("nodeX2"))
  }

  test("idDiff = left key set minus right (DataIds.php:52-55)") {
    val l = Seq("a", "b", "c").toDF("id")
    val r = Seq("b").toDF("id")
    assert(Diff.idDiff(l, r).as[String].collect().toSet === Set("a", "c"))
  }

  // ── property-based invariants (SURVEY §5.2) ─────────────────────

  test("invariants: partition of source, removed = local∖source, monotonic") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 8) {
      val srcRows = (1 to 12).map(_ => rnd.nextInt(20)).distinct
        .map(i => (s"k$i", rnd.nextLong(4): java.lang.Long))
      val locRows = (1 to 12).map(_ => rnd.nextInt(20)).distinct
        .map(i => (s"k$i", rnd.nextLong(4): java.lang.Long))
      val src = sourceDf(srcRows); val loc = localDf(locRows)
      val cs = Diff.computeDataChanges(src, loc)
      val srcIds = srcRows.map(_._1).toSet
      val locIds = locRows.map(_._1).toSet
      val added = cs.added.select("__id").as[String].collect().toSet
      val updated = cs.updated.select("__id").as[String].collect().toSet
      val removed = cs.removedIds.as[String].collect().toSet
      assert(added === srcIds -- locIds)
      assert(removed === locIds -- srcIds)
      assert(updated.subsetOf(srcIds intersect locIds))
      val locVer = locRows.toMap
      srcRows.filter(r => locIds.contains(r._1)).foreach { case (id, v) =>
        val expectUpdate = v == null || locVer(id) == null || v > locVer(id)
        assert(updated.contains(id) === expectUpdate, s"id=$id v=$v loc=${locVer(id)}")
      }
    }
  }

  test("idempotence: syncing source state against itself yields empty changeset") {
    val rows = Seq(("a", 1L: java.lang.Long), ("b", 2L: java.lang.Long))
    val cs = Diff.computeDataChanges(sourceDf(rows), localDf(rows))
    assert(cs.added.count() === 0)
    assert(cs.updated.count() === 0)
    assert(cs.removedIds.count() === 0)
  }
}
