package graft.targets

import graft.core.{ChangeSet, Records}
import graft.mapper.Mapper
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Node-table target — the data semantics of the reference's
 * ContentRepository target (W5-W9,
 * Classes/DataTarget/ContentRepository/ContentRepositoryTarget.php)
 * modeled against a plain "node" table (parquet-backed), with the
 * Neos/Flow CMS plumbing (Fusion caches, Doctrine EM) out of scope
 * per SURVEY §7.4.6.
 *
 * Semantics preserved:
 *  - `idPrefix` — node identifier = prefix + record id; stripped
 *    before diffing (ContentRepositoryTarget.php:99);
 *  - variant fan-out — one record becomes N node variants, one per
 *    dimension returned by the resolver (`:173-192`): an `explode`
 *    over a resolver column, the reference's one UDTF-shaped hook;
 *  - soft delete — removal hides (`hidden := true`) instead of
 *    deleting when configured (`:245-256`); hidden nodes are excluded
 *    from removal candidates but un-hidden on update (`:95-107,202`);
 *  - remove-all under a root path (`:215-236`);
 *  - parent resolution — a `parentPathResolver` places each record
 *    under a record-derived parent path instead of flat
 *    `rootPath/id`, and missing parent container nodes are
 *    auto-created (`:161-171` parentNodeResolver + `:363-392`
 *    getNodeDataByPath auto-creation). Container rows carry the
 *    reserved `auto:` identifier prefix and are excluded from the
 *    diff state — they are structure, not records.
 *
 * Node table schema: (identifier, variant, path, hidden,
 * version, <mapped columns...>).
 */
final case class NodeTarget(
    path: String,
    idPrefix: String = "",
    softDelete: Boolean = false,
    rootPath: String = "/sites",
    /** record DataFrame → array column of dimension values; default
      * single empty variant (no dimensions configured). */
    variantsResolver: DataFrame => Column = _ => array(lit("")),
    /** record DataFrame → parent path column; default flat rootPath.
      * Missing parents are auto-created as container rows. */
    parentPathResolver: Option[DataFrame => Column] = None
) extends DataTarget {

  /** Reserved identifier prefix for auto-created parent containers. */
  private val AutoParent = "auto:"

  private def exists: Boolean = {
    val f = new java.io.File(path)
    f.exists() && Option(f.listFiles()).exists(_.nonEmpty)
  }

  private def emptyState(spark: SparkSession): DataFrame =
    spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
      StructType(Seq(
        StructField("identifier", StringType),
        StructField("variant", StringType),
        StructField("path", StringType),
        StructField("hidden", BooleanType),
        StructField("version", LongType))))

  private def nodes(spark: SparkSession): DataFrame =
    if (exists) spark.read.parquet(path) else emptyState(spark)

  /** Diff state: one row per record id (variants collapse), version =
    * max over variants (the reference keys its node cache by stripped
    * identifier, ContentRepositoryTarget.php:88-93). */
  override def currentState(spark: SparkSession): DataFrame =
    nodes(spark)
      .filter(!col("identifier").startsWith(AutoParent))
      .groupBy(col("identifier").as("id"))
      .agg(max(col("version")).as("version"),
        // a record is "hidden" for diff purposes iff ALL its variants
        // are hidden (an un-hidden variant still syncs normally)
        min(col("hidden").cast("int")).cast("boolean").as("hidden"))

  /** DiffOptions this target requires (wired by the Preset). */
  def diffOptions: graft.core.DiffOptions = graft.core.DiffOptions(
    localIdPrefix = if (idPrefix.nonEmpty) Some(idPrefix) else None,
    hiddenCol = Some("hidden"))

  override def applyChanges(
      spark: SparkSession, cs: ChangeSet, mapper: Mapper,
      dispatch: DataTarget.EventDispatch): ApplyResult = {

    // W5 fan-out: record → one node row per variant, at WRITE time
    // (ContentRepositoryTarget.php:173-192)
    def toNodes(df: DataFrame): DataFrame = {
      // parent resolution at write time (`:161-171`): the resolver
      // column evaluates against the RECORD attributes, pre-mapping
      val parent = parentPathResolver.map(_(df)).getOrElse(lit(rootPath))
      val withParent = df.withColumn("__parent", parent)
      val mapped = mapper.applyKeeping(withParent, Seq("__parent"))
        .withColumn("variant", explode(variantsResolver(df)))
      mapped.select(
        Seq(
          concat(lit(idPrefix), col(Records.IdCol)).as("identifier"),
          col("variant"),
          concat(col("__parent"), lit("/"), col(Records.IdCol)).as("path"),
          lit(false).as("hidden"),
          col(Records.VersionCol).as("version")) ++
          mapped.columns.filterNot(c =>
            c.startsWith("__") || c == "variant").map(col): _*)
    }

    val csp = cs.persisted() // single evaluation of the diff join
    val addedN = toNodes(csp.added).cache()
    val updatedN = toNodes(csp.updated).cache()
    val removedP = csp.removedIds
      .select(concat(lit(idPrefix), col("id")).as("identifier")).cache()

    val old = nodes(spark)
    val oldAligned = addedN.schema.fields.foldLeft(old) { (acc, f) =>
      if (acc.columns.exists(_.equalsIgnoreCase(f.name))) acc
      else acc.withColumn(f.name, lit(null).cast(f.dataType))
    }.select(addedN.columns.map(col): _*)

    // updates replace every variant of the id and un-hide (W6, `:195-206`)
    val untouched = oldAligned
      .join(updatedN.select("identifier").distinct(), Seq("identifier"), "left_anti")

    val next =
      if (softDelete) {
        // W7 soft delete: flag instead of dropping (`:245-256`)
        val flagged = untouched.join(removedP.withColumn("__rm", lit(true)),
            Seq("identifier"), "left_outer")
          .withColumn("hidden", when(col("__rm"), lit(true))
            .otherwise(col("hidden")))
          .drop("__rm")
        flagged.unionByName(addedN).unionByName(updatedN)
      } else {
        untouched.join(removedP, Seq("identifier"), "left_anti")
          .unionByName(addedN).unionByName(updatedN)
      }

    // Auto-create missing parent containers (`:363-392`): one row
    // per resolver-derived parent path with no node at that path yet.
    // Containers re-derive from the written paths (strip the last
    // segment), carry the reserved `auto:` identifier, and survive
    // re-runs through `untouched` — so a second import is a no-op.
    val withParents =
      if (parentPathResolver.isEmpty) next
      else {
        val pPaths = addedN.select(col("path"))
          .unionByName(updatedN.select(col("path")))
          .select(regexp_replace(col("path"), "/[^/]*$", "").as("ppath"))
          .filter(col("ppath") =!= "").distinct()
        val missing = pPaths.join(
          oldAligned.select(col("path").as("ppath")).distinct(),
          Seq("ppath"), "left_anti")
        val containers = missing.select(addedN.columns.map {
          case "identifier" =>
            concat(lit(AutoParent), md5(col("ppath"))).as("identifier")
          case "variant" => lit("").as("variant")
          case "path" => col("ppath").as("path")
          case "hidden" => lit(false).as("hidden")
          case c => lit(null).cast(addedN.schema(c).dataType).as(c)
        }: _*)
        next.unionByName(containers)
      }

    val staging = path + ".staging"
    withParents.write.mode("overwrite").parquet(staging)
    val dir = new java.io.File(path)
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
    }
    if (dir.exists()) rm(dir)
    new java.io.File(staging).renameTo(dir)

    // record counts == distinct fanned-out identifiers (1 record →
    // 1 identifier across variants) — one aggregation over the diff.
    // Deliberately AFTER the state write: the write is the action that
    // materializes the lazy localCheckpoint (overlapped with the write
    // pipeline), so this aggregation re-scans in-memory checkpoint
    // blocks instead of forcing its own standalone diff evaluation.
    val (nAdd, nUpd, nRem) = csp.counts
    DataTarget.dispatchSnapshotPhases(dispatch,
      addedN, nAdd, updatedN, nUpd, removedP, nRem, idCol = "identifier")
    val res = ApplyResult(nAdd, nUpd, nRem)
    addedN.unpersist(); updatedN.unpersist(); removedP.unpersist()
    csp.unpersist()
    res
  }

  /** W8 — remove/hide all nodes STRICTLY UNDER the root path
    * (`:215-236`: `path LIKE rootNodePath||'/%'`). The root container
    * node itself is not affected, and sibling paths sharing the root
    * as a string prefix (`/sites/oddball` under root `/sites/odd`)
    * don't match — the reference's `'/'` separator is part of the
    * pattern, so it is part of ours. */
  override def removeAll(spark: SparkSession): Long = {
    if (!exists) return 0L
    val under = col("path").startsWith(rootPath.stripSuffix("/") + "/")
    val all = nodes(spark).cache()
    val n = all.filter(under).select("identifier").distinct().count()
    val dir = new java.io.File(path)
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
    }
    if (!softDelete && all.filter(!under).isEmpty) {
      // nothing survives — drop the state wholesale, no empty rewrite
      rm(dir)
    } else {
      val next =
        if (softDelete)
          all.withColumn("hidden", when(under, lit(true)).otherwise(col("hidden")))
        else all.filter(!under)
      val staging = path + ".staging"
      next.write.mode("overwrite").parquet(staging)
      rm(dir); new java.io.File(staging).renameTo(dir)
    }
    all.unpersist()
    n
  }
}
