package graft.targets

import graft.core.{ChangeSet, Records}
import graft.mapper.Mapper
import graft.sources.ValidationResult
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Counters returned by a sink application — feeds the event surface
  * (reference: Classes/Command/ImportCommandController.php:191-254
  * progress counters). */
final case class ApplyResult(
    added: Long, updated: Long, removed: Long, errors: Long = 0,
    errorSamples: Seq[(String, String)] = Nil)

/**
 * A data target owns the local state the diff runs against and applies
 * ChangeSets — the Spark equivalent of `DataTargetInterface`
 * (reference: Classes/DataTarget/DataTargetInterface.php).
 *
 * Contract mirrors the reference lifecycle (SURVEY §3.1):
 *  - `currentState` — narrow (id, version) snapshot
 *    (DbalTarget.php:118-128); Catalyst prunes wider states.
 *  - `applyChanges` — add → update → remove phase order
 *    (ImportService.php:84-86); mapping applies AT WRITE TIME, the
 *    diff ran on raw attributes (DbalTarget.php:136,145).
 *  - `removeAll` — prune (DbalTarget.php:160-167).
 *  - `finalize` — deferred flush hook (ContentRepositoryTarget.php:238-243).
 */
trait DataTarget {
  def currentState(spark: SparkSession): DataFrame

  /** Apply a ChangeSet. `dispatch` receives the per-phase lifecycle
    * events (Pre/Do/Post × add/update/remove) in the reference's
    * order (ImportService.php:133-211) — the target owns phase
    * sequencing, so it owns the phase event surface too. `Do*`
    * events carry the phase's record count (a distributed engine has
    * no per-record hook; SURVEY §1.5.3). Empty phases stay silent,
    * mirroring the reference's early return on empty record sets. */
  def applyChanges(
      spark: SparkSession, cs: ChangeSet, mapper: Mapper,
      dispatch: DataTarget.EventDispatch = DataTarget.noopDispatch): ApplyResult
  def removeAll(spark: SparkSession): Long
  def setup(spark: SparkSession): ValidationResult = ValidationResult()
  def finalizeRun(spark: SparkSession): Unit = ()
}

object DataTarget {
  type EventDispatch = (graft.pipeline.ImportEvent.Value, Any) => Unit
  val noopDispatch: EventDispatch = (_, _) => ()

  /** `Do*` event payload: the phase's record count plus a bounded id
    * sample. The reference dispatches one event PER RECORD with the
    * record itself (ImportService.php:140-209) — a distributed engine
    * aggregates, and the sample restores the progress detail its CLI
    * prints (ImportCommandController.php:191-254) without shipping
    * phase data through the driver. */
  final case class PhaseProgress(count: Long, sampleIds: Seq[String]) {
    override def toString: String =
      s"$count record(s)" + (if (sampleIds.isEmpty) ""
        else sampleIds.mkString(" (e.g. ", ", ", ")"))
  }

  /** First `n` ids of a phase frame (one tiny job on the cached
    * diff; never the phase data itself). Falls back from the
    * configured id column to `id`/`__id`/first column — phase frames
    * differ per target (mapped rows vs raw removed-id sets). */
  def sampleIds(df: DataFrame, idCol: String, n: Int = 5): Seq[String] = {
    val c = Seq(idCol, "id", Records.IdCol).find(df.columns.contains)
      .getOrElse(df.columns.head)
    df.select(col(c).cast("string")).limit(n)
      .collect().map(_.getString(0)).toSeq
  }

  /** Phase-event sequence for snapshot-merge targets (File/Node):
    * the merge commits all three phases in ONE atomic write, so the
    * nine phase events fire in reference order at commit time —
    * `Post*` here means "phase data is in the committed snapshot".
    * Row-oriented targets (JDBC) instead interleave events with
    * their physical per-phase writes. */
  def dispatchSnapshotPhases(
      dispatch: EventDispatch,
      added: DataFrame, nAdd: Long,
      updated: DataFrame, nUpd: Long,
      removedIds: DataFrame, nRem: Long,
      idCol: String = "id"): Unit = {
    import graft.pipeline.ImportEvent._
    if (nAdd > 0) {
      dispatch(PreAddData, added)
      dispatch(DoAddData, PhaseProgress(nAdd, sampleIds(added, idCol)))
      dispatch(PostAddData, nAdd)
    }
    if (nUpd > 0) {
      dispatch(PreUpdateData, updated)
      dispatch(DoUpdateData, PhaseProgress(nUpd, sampleIds(updated, idCol)))
      dispatch(PostUpdateData, nUpd)
    }
    if (nRem > 0) {
      dispatch(PreRemoveData, removedIds)
      dispatch(DoRemoveData, PhaseProgress(nRem, sampleIds(removedIds, idCol)))
      dispatch(PostRemoveData, nRem)
    }
  }
}

/**
 * Parquet-backed target (the fast-test / lakehouse sink). State lives
 * as one parquet dataset keyed by `id` with a `version` column plus
 * mapped attribute columns.
 *
 * Spark has no in-place parquet mutation, so apply = snapshot merge:
 * new state = (old ∖ (updated ∪ removed)) ∪ mapped(added ∪ updated)
 * written atomically via overwrite. This is the standard
 * copy-on-write lakehouse pattern (what Delta/Iceberg do per file
 * group); at 100 TB the same logic applies per partition directory
 * with dynamic partition overwrite rather than whole-table rewrite.
 */
final case class FileTarget(
    path: String,
    idColumn: String = "id",
    versionColumn: Option[String] = Some("version"),
    /** > 0 ⇒ hash-partitioned copy-on-write: state lives under
      * `pt=<bucket>/` dirs keyed by `pmod(xxhash64(id), partitions)`
      * and a sync rewrites ONLY the partitions its changed ids touch.
      * At 100 TB this turns the snapshot merge from O(table) into
      * O(touched partitions) — the lakehouse incremental-merge
      * pattern. 0 (default) = single-snapshot whole-table rewrite. */
    partitions: Int = 0)
    extends DataTarget {

  /** Partition bucket for an id column. */
  private def bucketOf(id: org.apache.spark.sql.Column) =
    pmod(xxhash64(id.cast("string")), lit(partitions.toLong))

  private def exists: Boolean = {
    val f = new java.io.File(path)
    f.exists() && (f.listFiles() != null && f.listFiles().nonEmpty)
  }

  override def currentState(spark: SparkSession): DataFrame =
    if (!exists) {
      spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("version",
            org.apache.spark.sql.types.LongType))))
    } else {
      val df = spark.read.parquet(path)
      val ver = versionColumn.filter(df.columns.contains)
        .map(col(_).cast("long")).getOrElse(lit(null).cast("long"))
      df.withColumn("id", col(idColumn).cast("string"))
        .withColumn("version", ver)
    }

  override def applyChanges(
      spark: SparkSession, cs: ChangeSet, mapper: Mapper,
      dispatch: DataTarget.EventDispatch): ApplyResult = {
    // Mapping at write time; __version rides along as the new version.
    def mapped(df: DataFrame): DataFrame = {
      val m = mapper.applyKeepingKeys(df)
      m.withColumn(idColumn, col(Records.IdCol))
        .withColumn("version", col(Records.VersionCol))
        .drop(Records.IdCol, Records.VersionCol)
    }
    cs.persisted() // one evaluation of the diff join for all branches
    val addedM = mapped(cs.added)
    val updatedM = mapped(cs.updated)
    val (nAdd, nUpd, nRem) = cs.counts // one job, not three

    // touched partition buckets (partitioned mode): collect is ≤
    // `partitions` longs, driver-side metadata — not data
    val touchedParts: Array[Long] =
      if (partitions > 0)
        cs.changes.filter(col("__change").isNotNull)
          .select(bucketOf(col("__change_id")).as("pt"))
          .distinct().collect().map(_.getLong(0)).sorted
      else Array.empty
    val touchedSet = touchedParts.toSet

    val old0 = currentState(spark)
    // partitioned mode: restrict the merge to touched buckets via the
    // PARTITION DIRECTORY column — Catalyst prunes untouched dirs out
    // of the scan entirely (they are neither read nor rewritten)
    val old =
      if (partitions > 0 && old0.columns.contains("pt"))
        old0.filter(col("pt").isInCollection(touchedSet))
      else old0
    val touched = cs.updated.select(col(Records.IdCol).as("id"))
      .unionByName(cs.removedIds.select(col("id")))
    // align the surviving rows to the mapped schema — the old state
    // may lack newly-mapped columns (first run / mapping change)
    val surviving = old.join(touched, Seq("id"), "left_anti")
    val survivors = surviving.select(addedM.schema.map { f =>
      val srcName =
        if (f.name == idColumn) "id"
        else surviving.columns.find(_.equalsIgnoreCase(f.name)).getOrElse("")
      (if (srcName.nonEmpty) col(srcName).cast(f.dataType)
       else lit(null).cast(f.dataType)).as(f.name)
    }: _*)
    val next = survivors.unionByName(addedM).unionByName(updatedM)

    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
    }
    val staging = path + ".staging"
    if (partitions > 0) {
      // Partitioned copy-on-write: only the buckets containing a
      // changed id are recomputed and swapped; untouched partition
      // dirs are not read, written, or moved.
      val nextTouched = next
        .withColumn("pt", bucketOf(col(idColumn)))
        .filter(col("pt").isInCollection(touchedSet))
      nextTouched.write.mode("overwrite")
        .partitionBy("pt").parquet(staging)
      touchedParts.foreach { p =>
        val src = new java.io.File(s"$staging/pt=$p")
        val dst = new java.io.File(s"$path/pt=$p")
        if (dst.exists()) rm(dst)
        dst.getParentFile.mkdirs()
        if (src.exists()) src.renameTo(dst)
        // a touched bucket whose rows were all removed simply
        // disappears (no staging dir written for it)
      }
      rm(new java.io.File(staging))
    } else {
      // Overwrite must not read-while-write the same path: stage then
      // swap.
      next.write.mode("overwrite").parquet(staging)
      val dir = new java.io.File(path)
      if (dir.exists()) rm(dir)
      new java.io.File(staging).renameTo(dir)
    }
    // Dispatch BEFORE releasing the cached diff: the phase payload
    // frames (addedM/updatedM) are plans over the persisted ChangeSet
    // whose subtree reads the just-overwritten target path — a
    // listener evaluating them after unpersist would re-diff against
    // the POST-commit state (an empty re-diff), not the phase's data.
    DataTarget.dispatchSnapshotPhases(dispatch,
      addedM, nAdd, updatedM, nUpd, cs.removedIds, nRem, idCol = idColumn)
    cs.unpersist()
    ApplyResult(nAdd, nUpd, nRem)
  }

  override def removeAll(spark: SparkSession): Long = {
    val n = if (exists) currentState(spark).count() else 0L
    val dir = new java.io.File(path)
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
    }
    if (dir.exists()) rm(dir)
    n
  }
}
