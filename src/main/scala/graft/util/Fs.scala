package graft.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}

/**
 * Storage access for the persisted-state layer (swap sinks, vector
 * index, clip indexes): every probe and walk goes through the Hadoop
 * `FileSystem` API resolved from the path's own scheme, so the state
 * dirs work unchanged on `file://` (the test/sandbox layout) and on
 * HDFS-like stores, instead of hard-wiring `java.io.File`. Paths
 * without a scheme resolve against the active session's default
 * filesystem — exactly how `spark.read.parquet(path)` resolves the
 * same string, so the probe and the read always agree on a store.
 */
object Fs {

  /** Active session's Hadoop conf when one exists (carries
    * `fs.defaultFS` plus any object-store credentials the deployment
    * set); a vanilla local conf otherwise (driver tools, early CLI). */
  def conf: Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())

  def path(s: String): Path = new Path(s)

  def fsOf(p: Path): FileSystem = p.getFileSystem(conf)

  def exists(p: Path): Boolean = fsOf(p).exists(p)
  def exists(s: String): Boolean = exists(path(s))

  def isDir(s: String): Boolean = {
    val p = path(s)
    val fs = fsOf(p)
    fs.exists(p) && fs.getFileStatus(p).isDirectory
  }

  /** Children of `dir`, empty when the dir is missing (the
    * `Option(listFiles())` idiom — Hadoop throws on a missing path). */
  def list(p: Path): Seq[FileStatus] = {
    val fs = fsOf(p)
    if (fs.exists(p)) fs.listStatus(p).toSeq else Seq.empty
  }
  def list(s: String): Seq[FileStatus] = list(path(s))

  /** True iff a Spark write under `dir` produced schema-bearing data:
    * a `part-` file (non-empty when `requireBytes`), or — for
    * `partitionBy` layouts when `acceptDirs` — a partition
    * subdirectory. The degenerate-(zero-row)-write detector shared by
    * the swap sinks: a coalesce/partitionBy write of an empty frame
    * can leave NO data file, making the next `spark.read.parquet`
    * throw, so writers probe and rewrite from an explicit empty frame. */
  def hasData(dir: String, acceptDirs: Boolean,
      requireBytes: Boolean = false): Boolean =
    list(dir).exists(st =>
      (acceptDirs && st.isDirectory) ||
        (st.getPath.getName.startsWith("part-") &&
          (!requireBytes || st.getLen > 0)))

  /** Stable content fingerprint of a dir's immediate children
    * ((name, size, mtime) triples) — the serving-side model-cache key
    * in [[graft.ext.VectorIndex]]: any commit that rewrites the dir
    * changes the fingerprint, so caches miss and re-read. */
  def fingerprint(dir: String): String =
    list(dir)
      .map(st => s"${st.getPath.getName}:${st.getLen}:${st.getModificationTime}")
      .sorted.mkString("|").hashCode.toHexString

  def mkdirs(s: String): Unit = { fsOf(path(s)).mkdirs(path(s)); () }

  /** Create an empty marker file (the SCD2 apply-ledger entry). */
  def touch(s: String): Unit = {
    val p = path(s)
    fsOf(p).create(p, false).close()
  }
}
