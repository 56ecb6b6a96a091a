package graft.targets

import graft.core.{ChangeSet, Records}
import graft.mapper.Mapper
import graft.sources.ValidationResult
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import java.sql.{Connection, DriverManager, PreparedStatement}

/**
 * JDBC merge target — the custom sink the reference's DbalTarget
 * implies (W1-W4, Classes/DataTarget/Dbal/DbalTarget.php:134-167).
 *
 * Spark's built-in JDBC writer only appends/overwrites; the sync
 * semantics need per-row INSERT / UPDATE ... WHERE id / DELETE WHERE
 * id. Spark-first shape: `foreachPartition` over each ChangeSet
 * branch, one connection per partition, `addBatch`/`executeBatch`
 * every `batchSize` rows (reference flushes every 1000,
 * ContentRepositoryTarget.php:45).
 *
 * Per-record error isolation (SURVEY §1.5.5): a row failure inside
 * the batch loop is caught, counted on an accumulator together with a
 * capped (id, message) sample, and the loop continues — mirroring the
 * reference, which continues past per-record `\Error` carrying the
 * record and message on the error event, and only aborts on
 * `\Exception` (ImportService.php:144-149). The `\Exception` class
 * maps to connection-level failures (non-transient/timeout): those
 * rethrow, fail the task, and abort the import. A failed batch is
 * re-executed row by row first — JDBC drivers may stop a batch at the
 * first failure, and committing only the pre-failure prefix would
 * silently lose the survivors.
 *
 * Scale note (100 TB): writes shard naturally by partition — 1000
 * executors each hold one connection and stream batches; no driver
 * bottleneck, no collect. Batch size bounds memory per task.
 */
final case class JdbcTarget(
    url: String,
    table: String,
    idColumn: String = "id",
    versionColumn: Option[String] = Some("version"),
    properties: Map[String, String] = Map.empty,
    batchSize: Int = 1000)
    extends DataTarget {

  private def connect(): Connection = {
    val props = new java.util.Properties()
    properties.foreach { case (k, v) => props.setProperty(k, v) }
    DriverManager.getConnection(url, props)
  }

  override def currentState(spark: SparkSession): DataFrame = {
    val reader = spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
    val df = properties.foldLeft(reader) { case (r, (k, v)) => r.option(k, v) }
      .load()
    // JDBC dialects report their own identifier case (e.g. Derby
    // uppercases) — resolve configured names case-insensitively.
    def actual(name: String): Option[String] =
      df.columns.find(_.equalsIgnoreCase(name))
    val ver = versionColumn.flatMap(actual)
      .map(col(_).cast("long")).getOrElse(lit(null).cast("long"))
    df.withColumn("id",
        col(actual(idColumn).getOrElse(idColumn)).cast("string"))
      .withColumn("version", ver)
  }

  /** Set one mapped value on a PreparedStatement, null-safely. */
  private def bind(ps: PreparedStatement, i: Int, v: Any): Unit = v match {
    case null => ps.setObject(i, null)
    case s: String => ps.setString(i, s)
    case l: Long => ps.setLong(i, l)
    case n: Int => ps.setInt(i, n)
    case d: Double => ps.setDouble(i, d)
    case f: Float => ps.setFloat(i, f)
    case b: Boolean => ps.setBoolean(i, b)
    case t: java.sql.Timestamp => ps.setTimestamp(i, t)
    case t: java.time.Instant => ps.setTimestamp(i, java.sql.Timestamp.from(t))
    case d: java.sql.Date => ps.setDate(i, d)
    case d: java.math.BigDecimal => ps.setBigDecimal(i, d)
    case other => ps.setObject(i, other)
  }

  /** Per-partition cap on collected (id, message) error samples —
    * bounds accumulator traffic when a whole partition fails. */
  private val SamplesPerPartition = 10

  /** Fatal = the reference's abort-the-import `\Exception` class:
    * the connection (not a record) is broken, so continuing would
    * turn a dead sink into "N errors, import finished". */
  private def isFatal(e: Throwable): Boolean = e match {
    case _: java.sql.SQLNonTransientConnectionException => true
    case _: java.sql.SQLTransientConnectionException => true
    case _: java.sql.SQLTimeoutException => true
    case _: java.sql.SQLRecoverableException => true
    case _ => false
  }

  /** Run `sql` batched over a DataFrame's rows; returns (error count,
    * capped (id, message) samples). Per-row bind failures are
    * isolated; a failed batch falls back to row-by-row re-execution
    * so survivors are applied and the error count is exact; fatal
    * (connection-class) failures rethrow and abort the import. */
  private def batchedWrite(
      df: DataFrame, sql: String,
      binder: (PreparedStatement, Row) => Unit,
      idOf: Row => String): (Long, Seq[(String, String)]) = {
    val spark = df.sparkSession
    val errAcc = spark.sparkContext.longAccumulator("sink-errors")
    val samplesAcc = spark.sparkContext
      .collectionAccumulator[(String, String)]("sink-error-samples")
    val bs = batchSize
    val (u, props, cap) = (url, properties, SamplesPerPartition)
    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.nonEmpty) {
        val p = new java.util.Properties()
        props.foreach { case (k, v) => p.setProperty(k, v) }
        val conn = DriverManager.getConnection(u, p)
        try {
          conn.setAutoCommit(false)
          val ps = conn.prepareStatement(sql)
          val buf = scala.collection.mutable.ArrayBuffer.empty[Row]
          var sampled = 0
          def recordError(row: Row, e: Throwable): Unit = {
            errAcc.add(1)
            if (sampled < cap) {
              samplesAcc.add(idOf(row) -> String.valueOf(e.getMessage))
              sampled += 1
            }
          }
          def flush(): Unit = if (buf.nonEmpty) {
            try { ps.executeBatch(); conn.commit() }
            catch {
              case e: Throwable if isFatal(e) => throw e
              case _: java.sql.SQLException =>
                // the driver may have stopped mid-batch — roll back
                // the batch's PARTIAL effects (rows executed before
                // the failure are still pending in the transaction;
                // re-executing them would fake duplicate-key errors),
                // then re-execute row by row so survivors land and
                // errors are exact
                conn.rollback()
                ps.clearBatch()
                buf.foreach { row =>
                  try { binder(ps, row); ps.executeUpdate() }
                  catch {
                    case f: Throwable if isFatal(f) => throw f
                    case e: Exception =>
                      recordError(row, e); ps.clearParameters()
                  }
                }
                conn.commit()
            }
            buf.clear()
          }
          rows.foreach { row =>
            try { binder(ps, row); ps.addBatch(); buf += row }
            catch {
              case e: Throwable if isFatal(e) => throw e
              case e: Exception => recordError(row, e); ps.clearParameters()
            }
            if (buf.size >= bs) flush()
          }
          flush()
        } finally conn.close()
      }
    }
    import scala.jdk.CollectionConverters._
    (errAcc.value, samplesAcc.value.asScala.toSeq.take(20))
  }

  override def applyChanges(
      spark: SparkSession, cs: ChangeSet, mapper: Mapper,
      dispatch: DataTarget.EventDispatch): ApplyResult = {
    import graft.pipeline.ImportEvent._
    def mapped(df: DataFrame): DataFrame = mapper.applyKeepingKeys(df)

    // MATERIALIZE the ChangeSet before the first write: the shared
    // changes frame is a lazy plan over the live target table — once
    // the sink starts mutating it, re-evaluation would see the new
    // state (the reference snapshots local rows per run for the same
    // reason, DbalTarget.php:118-128 localRowsCache). One persist
    // covers all three branches AND the counts.
    val csp = cs.persisted()
    val addedM = mapped(csp.added)
    val updatedM = mapped(csp.updated)
    val removed = csp.removedIds
    val (nAdd, nUpd, nRem) = csp.counts // one job, not three
    val dataCols = addedM.columns.filterNot(_.startsWith("__")).toSeq
    var errs = 0L
    var samples = Seq.empty[(String, String)]
    val rowId = (row: Row) => row.getAs[Any](Records.IdCol).toString

    // W1 — INSERT per added record (DbalTarget.php:134-137); events
    // bracket the phase's physical writes, as in the reference loop
    if (nAdd > 0) {
      dispatch(PreAddData, addedM)
      dispatch(DoAddData, DataTarget.PhaseProgress(nAdd,
        DataTarget.sampleIds(addedM, Records.IdCol)))
      val insertSql = s"INSERT INTO $table (${dataCols.mkString(", ")}) " +
        s"VALUES (${dataCols.map(_ => "?").mkString(", ")})"
      val (e, sm) = batchedWrite(addedM, insertSql, (ps, row) => {
        dataCols.zipWithIndex.foreach { case (c, i) =>
          bind(ps, i + 1, row.getAs[Any](c))
        }
      }, rowId)
      errs += e; samples ++= sm
      dispatch(PostAddData, nAdd)
    }

    // W2 — UPDATE ... WHERE id (DbalTarget.php:143-146)
    val updCols = dataCols.filterNot(_ == idColumn)
    if (nUpd > 0 && updCols.nonEmpty) {
      dispatch(PreUpdateData, updatedM)
      dispatch(DoUpdateData, DataTarget.PhaseProgress(nUpd,
        DataTarget.sampleIds(updatedM, Records.IdCol)))
      val updateSql = s"UPDATE $table SET " +
        updCols.map(c => s"$c = ?").mkString(", ") + s" WHERE $idColumn = ?"
      val (e, sm) = batchedWrite(updatedM, updateSql, (ps, row) => {
        updCols.zipWithIndex.foreach { case (c, i) =>
          bind(ps, i + 1, row.getAs[Any](c))
        }
        ps.setString(updCols.size + 1, row.getAs[Any](Records.IdCol).toString)
      }, rowId)
      errs += e; samples ++= sm
      dispatch(PostUpdateData, nUpd)
    }

    // W3 — DELETE WHERE id (DbalTarget.php:152-155)
    if (nRem > 0) {
      dispatch(PreRemoveData, removed)
      dispatch(DoRemoveData, DataTarget.PhaseProgress(nRem,
        DataTarget.sampleIds(removed, "id")))
      val deleteSql = s"DELETE FROM $table WHERE $idColumn = ?"
      val (e, sm) = batchedWrite(removed, deleteSql, (ps, row) =>
        ps.setString(1, row.getAs[Any]("id").toString),
        row => row.getAs[Any]("id").toString)
      errs += e; samples ++= sm
      dispatch(PostRemoveData, nRem)
    }

    val res = ApplyResult(nAdd, nUpd, nRem, errs, samples.take(20))
    csp.unpersist()
    res
  }

  /** W4 — truncate-all, driver-side single statement returning the
    * affected count (DbalTarget.php:160-167). */
  override def removeAll(spark: SparkSession): Long = {
    val conn = connect()
    try {
      val st = conn.createStatement()
      st.executeUpdate(s"DELETE FROM $table").toLong
    } finally conn.close()
  }

  /** C4 — connectivity + table existence; creates the table from a DDL
    * template if provided (CREATE TABLE IF NOT EXISTS semantics,
    * SURVEY §3.3). */
  override def setup(spark: SparkSession): ValidationResult =
    try {
      val conn = connect()
      try {
        val rs = conn.getMetaData.getTables(null, null, table.toUpperCase, null)
        if (!rs.next())
          ValidationResult(warnings = Seq(s"Table $table does not exist"))
        else ValidationResult()
      } finally conn.close()
    } catch {
      case e: Exception =>
        ValidationResult(errors = Seq(s"JDBC target $url: ${e.getMessage}"))
    }
}
