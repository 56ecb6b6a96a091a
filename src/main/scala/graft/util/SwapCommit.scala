package graft.util

import java.io.File

import org.apache.hadoop.fs.{FileUtil, Path}

/**
 * Manifest-logged whole-dir swap — the two-phase-commit primitive
 * shared by the snapshot sinks ([[graft.targets.Scd2Target]],
 * [[graft.targets.NodeTarget]]), the persisted vector index
 * ([[graft.ext.VectorIndex]]) and the clip indexes
 * ([[BucketedSwapIndex]]): stage the full next state, atomically
 * record the staging dir in a manifest, replay the idempotent
 * rm+rename, delete the manifest. A crash anywhere between manifest
 * write and delete is completed by the next reader/writer via
 * [[recover]] — the staged next-state is never lost mid-swap.
 * (FileTarget's bucketed/partitioned layouts keep their own
 * multi-step manifest in `targets/DataTarget.scala`; this helper is
 * the single-directory form.)
 *
 * Storage: all I/O goes through the Hadoop `FileSystem` resolved
 * from each path ([[Fs]]), so the protocol runs unchanged on
 * `file://` and on HDFS, where directory rename is atomic and the
 * swap is invisible to concurrent readers. On object stores (S3-like)
 * rename is a per-object copy: the manifest replay still makes the
 * commit CRASH-CONSISTENT (an interrupted swap is finished by the
 * next touch, staged state is never lost), but a concurrent reader
 * can observe the window between the live-dir delete and the rename
 * completing — single-writer/exclusive-reader deployments (this
 * library's sync model: one import run owns the target) are safe;
 * serving-while-committing on an object store wants a
 * generation-pointer layout instead of an in-place swap.
 * `java.io.File` overloads remain for local-only call sites (tests,
 * bench tools) and pin `file://` explicitly via `File.toURI`.
 */
object SwapCommit {

  def deleteRec(p: Path): Unit = {
    val fs = Fs.fsOf(p)
    if (fs.exists(p)) { fs.delete(p, true); () }
  }

  def deleteRec(f: File): Unit = deleteRec(new Path(f.toURI))
  def deleteRec(s: String): Unit = deleteRec(Fs.path(s))

  /** Recursive driver-side copy (bounded metadata dirs only — e.g.
    * carrying an unchanged model table into a staging dir without a
    * Spark re-write job). Replicates the CONTENTS of `src` at `dst`
    * (cp -r src/. dst), overwriting existing files — not Hadoop
    * `FileUtil.copy`'s cp-into-dir behavior. */
  def copyRec(src: Path, dst: Path): Unit = {
    val sfs = Fs.fsOf(src)
    val dfs = Fs.fsOf(dst)
    if (sfs.getFileStatus(src).isDirectory) {
      dfs.mkdirs(dst)
      sfs.listStatus(src).foreach { st =>
        copyRec(st.getPath, new Path(dst, st.getPath.getName))
      }
    } else {
      FileUtil.copy(sfs, src, dfs, dst,
        /* deleteSource = */ false, /* overwrite = */ true, Fs.conf)
      ()
    }
  }

  def copyRec(src: File, dst: File): Unit =
    copyRec(new Path(src.toURI), new Path(dst.toURI))
  def copyRec(src: String, dst: String): Unit =
    copyRec(Fs.path(src), Fs.path(dst))

  /** Carry an immutable directory tree forward WITHOUT rewriting its
    * bytes where the store allows it: when both ends resolve to a
    * local filesystem, every file is HARD-LINKED — O(metadata) per
    * file, zero new bytes on disk, and the link survives deletion of
    * the source dir (an in-place swap may link from the live dir it
    * is about to replace). Elsewhere falls back to [[copyRec]]: on
    * object stores that is a per-object copy — no executor re-encode,
    * but O(bytes) through the copier; a store-native server-side copy
    * (or a manifest-indirection layout that references unchanged dirs
    * in place) is the upgrade path when carried state outgrows that.
    * The delta-narrowed index refreshes ([[graft.ext.DedupIndex]],
    * [[graft.ext.VectorIndex]], [[graft.ext.TrainedQuality]]) use
    * this to carry untouched partition dirs into a new generation. */
  def linkOrCopyRec(src: Path, dst: Path): Unit = {
    val sfs = Fs.fsOf(src)
    val dfs = Fs.fsOf(dst)
    def isLocal(fs: org.apache.hadoop.fs.FileSystem): Boolean = fs match {
      case _: org.apache.hadoop.fs.LocalFileSystem => true
      case _: org.apache.hadoop.fs.RawLocalFileSystem => true
      case _ => false
    }
    if (!(isLocal(sfs) && isLocal(dfs))) { copyRec(src, dst); return }
    def walk(s: Path, d: Path): Unit =
      if (sfs.getFileStatus(s).isDirectory) {
        dfs.mkdirs(d)
        sfs.listStatus(s).foreach(st =>
          walk(st.getPath, new Path(d, st.getPath.getName)))
      } else {
        val sNio = java.nio.file.Paths.get(s.toUri.getPath)
        val dNio = java.nio.file.Paths.get(d.toUri.getPath)
        java.nio.file.Files.deleteIfExists(dNio)
        try { java.nio.file.Files.createLink(dNio, sNio); () }
        catch {
          // cross-device / no-hardlink filesystems: fall back per file
          case _: UnsupportedOperationException |
              _: java.nio.file.FileSystemException =>
            FileUtil.copy(sfs, s, dfs, d,
              /* deleteSource = */ false, /* overwrite = */ true,
              Fs.conf)
            ()
        }
      }
    walk(src, dst)
  }

  def linkOrCopyRec(src: String, dst: String): Unit =
    linkOrCopyRec(Fs.path(src), Fs.path(dst))

  /** Write the manifest atomically (tmp + rename) — only after the
    * staging dir is fully materialized — then complete the swap. At
    * entry no pending manifest can exist (writers [[recover]] first
    * and [[complete]] removes it), so the defensive delete before the
    * rename never races a real recovery record. */
  def commit(live: Path, staging: Path, manifest: Path): Unit = {
    val fs = Fs.fsOf(manifest)
    val tmp = manifest.suffix(".tmp")
    val out = fs.create(tmp, true)
    try out.write(staging.toString.getBytes("UTF-8"))
    finally out.close()
    if (fs.exists(manifest)) fs.delete(manifest, false)
    if (!fs.rename(tmp, manifest))
      throw new java.io.IOException(
        s"manifest rename failed: $tmp -> $manifest")
    complete(live, manifest)
  }

  def commit(live: File, staging: File, manifest: File): Unit =
    commit(new Path(live.toURI), new Path(staging.toURI),
      new Path(manifest.toURI))
  def commit(live: String, staging: String, manifest: String): Unit =
    commit(Fs.path(live), Fs.path(staging), Fs.path(manifest))

  /** Idempotent swap replay: staging still present ⇒ rm(live) +
    * rename; staging absent ⇒ the rename already happened and only
    * the manifest cleanup remained. */
  private def complete(live: Path, manifest: Path): Unit = {
    val mfs = Fs.fsOf(manifest)
    val in = mfs.open(manifest)
    val recorded =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
    val staging = Fs.path(recorded)
    val sfs = Fs.fsOf(staging)
    if (sfs.exists(staging)) {
      deleteRec(live)
      if (!sfs.rename(staging, live))
        throw new java.io.IOException(
          s"swap rename failed: $staging -> $live")
    }
    mfs.delete(manifest, false)
    ()
  }

  /** Finish a swap a crashed writer left pending — call before any
    * read or write of the live dir. */
  def recover(live: Path, manifest: Path): Unit = {
    if (Fs.fsOf(manifest).exists(manifest)) complete(live, manifest)
  }

  def recover(live: File, manifest: File): Unit =
    recover(new Path(live.toURI), new Path(manifest.toURI))
  def recover(live: String, manifest: String): Unit =
    recover(Fs.path(live), Fs.path(manifest))
}
