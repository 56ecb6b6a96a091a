package graft.util

import java.io.File
import java.nio.file.{Files, Paths, StandardCopyOption}

/**
 * Manifest-logged whole-dir swap — the two-phase-commit primitive
 * shared by the snapshot sinks ([[graft.targets.Scd2Target]]) and
 * the persisted vector index ([[graft.ext.VectorIndex]]): stage the
 * full next state, atomically record the staging dir in a manifest,
 * replay the idempotent rm+rename, delete the manifest. A crash
 * anywhere between manifest write and delete is completed by the
 * next reader/writer via [[recover]] — the staged next-state is
 * never lost mid-swap. (FileTarget's bucketed/partitioned layouts
 * keep their own multi-step manifest in `targets/DataTarget.scala`;
 * this helper is the single-directory form.)
 */
object SwapCommit {

  def deleteRec(f: File): Unit = if (f.exists()) {
    Files.walk(f.toPath).sorted(java.util.Comparator.reverseOrder())
      .forEach(p => { Files.deleteIfExists(p); () })
  }

  /** Recursive driver-side copy (bounded metadata dirs only — e.g.
    * carrying an unchanged model table into a staging dir without a
    * Spark re-write job). */
  def copyRec(src: File, dst: File): Unit = {
    val sp = src.toPath; val dp = dst.toPath
    Files.walk(sp).forEach { p =>
      val t = dp.resolve(sp.relativize(p))
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else {
        Option(t.getParent).foreach(x => Files.createDirectories(x))
        Files.copy(p, t, StandardCopyOption.REPLACE_EXISTING)
      }
      ()
    }
  }

  /** Write the manifest atomically (tmp + POSIX rename) — only after
    * the staging dir is fully materialized — then complete the swap. */
  def commit(live: File, staging: File, manifest: File): Unit = {
    val tmp = Paths.get(manifest.getPath + ".tmp")
    // a cwd-relative single-segment manifest path has no parent
    Option(tmp.getParent).foreach(p => Files.createDirectories(p))
    Files.writeString(tmp, staging.getPath)
    Files.move(tmp, manifest.toPath,
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
    complete(live, manifest)
  }

  /** Idempotent swap replay: staging still present ⇒ rm(live) +
    * rename; staging absent ⇒ the rename already happened and only
    * the manifest cleanup remained. */
  private def complete(live: File, manifest: File): Unit = {
    val staging = new File(
      new String(Files.readAllBytes(manifest.toPath), "UTF-8").trim)
    if (staging.exists()) {
      deleteRec(live)
      Files.move(staging.toPath, live.toPath)
      ()
    }
    manifest.delete()
    ()
  }

  /** Finish a swap a crashed writer left pending — call before any
    * read or write of the live dir. */
  def recover(live: File, manifest: File): Unit =
    if (manifest.exists()) complete(live, manifest)
}
