package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * ChangeSet — the result of the engine's core query: a full-outer
 * id+version comparison of the keyed source against the target's
 * current state (reference: Classes/ValueObject/ChangeSet.php:11-21,
 * Classes/DataTarget/Dbal/DbalTarget.php:66-85).
 *
 * Each member is a lazy DataFrame (logical plan); nothing executes
 * until the sink applies it.
 */
final case class ChangeSet(
    added: DataFrame,
    updated: DataFrame,
    removedIds: DataFrame) {
  /** Single-frame view with a `change_type` discriminator — handy for
    * tests, oracles, and a one-pass sink. */
  def unioned: DataFrame = {
    val a = added.select(col(Records.IdCol).as("id"))
      .withColumn("change_type", lit("add"))
    val u = updated.select(col(Records.IdCol).as("id"))
      .withColumn("change_type", lit("update"))
    val r = removedIds.select(col("id"))
      .withColumn("change_type", lit("remove"))
    a.unionByName(u).unionByName(r)
  }
}

/** Options controlling the diff (reference: Classes/Preset.php:19-39,
  * Classes/DataTarget/Dbal/DbalTarget.php:66-85). */
final case class DiffOptions(
    forceUpdates: Boolean = false,
    skipAddedRecords: Boolean = false,
    skipRemovedRecords: Boolean = false,
    /** D3: strip this prefix from local ids before comparing
      * (ContentRepositoryTarget.php:99). */
    localIdPrefix: Option[String] = None,
    /** D3: name of a boolean "hidden" column in the local state; hidden
      * rows are excluded from removal candidates but NOT treated as
      * added (ContentRepositoryTarget.php:95-107). */
    hiddenCol: Option[String] = None)

/**
 * The core diff query (reference operators D1-D4, SURVEY §2.1).
 *
 * Spark-first shape: ONE full-outer join on id; the three change
 * branches are filters over it, so Catalyst plans a single shuffle
 * (or a broadcast join when the local id/version snapshot is small —
 * it is 2 narrow columns, exactly the reference's narrow read,
 * DbalTarget.php:118-128, which Catalyst's column pruning gives us
 * for free).
 *
 * Scale note (100 TB): the local snapshot is pruned to (id, version
 * [, hidden]) before the join — at 1000 executors this is the only
 * state that moves; source-side attribute columns stay put until the
 * sink projects them. Skew on id is handled by AQE skew-join.
 */
object Diff {

  /** D4 — update-needed predicate (DbalTarget.php:106-116):
    * update iff force ∨ source.version unset ∨ local.version unset ∨
    * source.version > local.version. Strictly greater-than. */
  def updateNeeded(sourceVersion: Column, localVersion: Column, force: Boolean): Column =
    if (force) lit(true)
    else sourceVersion.isNull || localVersion.isNull || (sourceVersion > localVersion)

  /**
   * Compute the ChangeSet.
   *
   * @param source keyed source (has `__id`, `__version`, plus raw
   *               attribute columns — the diff runs on RAW attributes;
   *               mapping applies at write time, DbalTarget.php:136,145)
   * @param local  target current-state snapshot with columns
   *               `id` (string), `version` (long, nullable)
   *               [, hiddenCol]
   */
  def computeDataChanges(
      source: DataFrame,
      local: DataFrame,
      opts: DiffOptions = DiffOptions()): ChangeSet = {

    val localId = opts.localIdPrefix match {
      case Some(p) => expr(s"regexp_replace(id, '^${p}', '')")
      case None => col("id")
    }
    val hidden = opts.hiddenCol
      .map(h => coalesce(col(h).cast("boolean"), lit(false)))
      .getOrElse(lit(false))

    // Narrow local snapshot: (id, version, hidden) only — column
    // pruning to the scan, mirrors the reference's narrow SELECT.
    val localSnap = local.select(
      localId.as("__local_id"),
      col("version").cast("long").as("__local_version"),
      hidden.as("__local_hidden"))

    val joined = source.join(
      localSnap,
      source(Records.IdCol) === localSnap("__local_id"),
      "full_outer")

    val srcCols = source.columns.map(source(_))

    val added =
      if (opts.skipAddedRecords) source.limit(0)
      else joined.filter(col("__local_id").isNull).select(srcCols: _*)

    val updated = joined
      .filter(
        source(Records.IdCol).isNotNull && col("__local_id").isNotNull &&
          updateNeeded(source(Records.VersionCol), col("__local_version"),
            opts.forceUpdates))
      .select(srcCols: _*)

    // Removal candidates: local ∖ source, hidden rows excluded
    // (ContentRepositoryTarget.php:95-107). Hidden rows are neither
    // removed nor added — they simply stay.
    val removedIds =
      if (opts.skipRemovedRecords)
        local.select(col("id").cast("string").as("id")).limit(0)
      else joined
        .filter(source(Records.IdCol).isNull && !col("__local_hidden"))
        .select(col("__local_id").as("id"))

    ChangeSet(added, updated, removedIds)
  }

  /** D1 — id-set difference (DataIds::diff, DataIds.php:52-55):
    * ids present in `left` but not in `right`. Left-anti join — no
    * full shuffle of attributes, ids only. */
  def idDiff(left: DataFrame, right: DataFrame): DataFrame =
    left.select(col(left.columns.head).cast("string").as("id"))
      .join(
        right.select(col(right.columns.head).cast("string").as("id")),
        Seq("id"), "left_anti")
}
