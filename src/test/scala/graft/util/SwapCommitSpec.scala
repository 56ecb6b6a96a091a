package graft.util

import graft.SparkSpec

/** The manifest-logged swap over the Hadoop `FileSystem` API: commit,
  * crash recovery from both failure windows, contents-copy semantics,
  * explicit-scheme (`file://`) routing, and the degenerate-write
  * detector — the storage layer every swap sink shares. */
class SwapCommitSpec extends SparkSpec {
  import spark.implicits._

  private def write(dir: String, rows: Seq[(String, Int)]): Unit =
    rows.toDF("id", "v").repartition(1).write
      .mode("overwrite").parquet(dir)

  private def readSet(dir: String): Set[(String, Int)] =
    spark.read.parquet(dir).as[(String, Int)].collect().toSet

  test("commit swaps staging into live and clears the manifest; " +
      "works with an explicit file:// scheme") {
    val root = tmpDir("swap")
    val live = s"$root/state"
    val manifest = s"$root/state.swap-manifest"
    write(live, Seq(("old", 1)))
    write(s"$live.staging", Seq(("new", 2)))
    // explicit scheme on every leg: proves the path-derived FS routing
    SwapCommit.commit(s"file://$live", s"file://$live.staging",
      s"file://$manifest")
    assert(readSet(live) === Set(("new", 2)))
    assert(!Fs.exists(manifest) && !Fs.exists(s"$live.staging"))
  }

  test("recover completes a swap that crashed before the rename " +
      "(manifest present, staging present, live still old)") {
    val root = tmpDir("swap-crash1")
    val live = s"$root/state"
    val manifest = s"$root/state.swap-manifest"
    write(live, Seq(("old", 1)))
    write(s"$live.staging", Seq(("new", 2)))
    // simulate the crash window: manifest recorded, swap not replayed
    val p = Fs.path(manifest)
    val out = Fs.fsOf(p).create(p, true)
    out.write(s"$live.staging".getBytes("UTF-8")); out.close()
    SwapCommit.recover(live, manifest)
    assert(readSet(live) === Set(("new", 2)))
    assert(!Fs.exists(manifest))
  }

  test("recover after the rename already happened (staging gone) " +
      "only clears the manifest — idempotent replay") {
    val root = tmpDir("swap-crash2")
    val live = s"$root/state"
    val manifest = s"$root/state.swap-manifest"
    write(live, Seq(("new", 2))) // rename completed before the crash
    val p = Fs.path(manifest)
    val out = Fs.fsOf(p).create(p, true)
    out.write(s"$live.staging".getBytes("UTF-8")); out.close()
    SwapCommit.recover(live, manifest)
    assert(readSet(live) === Set(("new", 2)))
    assert(!Fs.exists(manifest))
    SwapCommit.recover(live, manifest) // no manifest: no-op
    assert(readSet(live) === Set(("new", 2)))
  }

  test("copyRec replicates CONTENTS at dst (not cp-into-dir) and " +
      "overwrites existing files") {
    val root = tmpDir("swap-copy")
    val src = s"$root/src"
    val dst = s"$root/dst"
    Fs.mkdirs(s"$src/sub")
    Fs.touch(s"$src/a.txt")
    Fs.touch(s"$src/sub/b.txt")
    Fs.mkdirs(dst) // dst EXISTS: java.nio semantics merge into it
    Fs.touch(s"$dst/c.txt")
    SwapCommit.copyRec(src, dst)
    assert(Fs.exists(s"$dst/a.txt"))
    assert(Fs.exists(s"$dst/sub/b.txt")) // contents, not dst/src/sub
    assert(Fs.exists(s"$dst/c.txt")) // merge keeps unrelated files
    assert(!Fs.exists(s"$dst/src"))
    SwapCommit.copyRec(src, dst) // overwrite path: second copy is a no-op
    assert(Fs.exists(s"$dst/a.txt"))
  }

  test("Fs.hasData distinguishes real data files from empty/degenerate " +
      "writes; fingerprint changes when a dir's contents change") {
    val root = tmpDir("fs-hasdata")
    val d = s"$root/out"
    assert(!Fs.hasData(d, acceptDirs = true)) // missing dir
    Seq(("a", 1)).toDF("id", "v").repartition(1)
      .write.parquet(d)
    assert(Fs.hasData(d, acceptDirs = false, requireBytes = true))
    val fp1 = Fs.fingerprint(d)
    Seq(("a", 1), ("b", 2)).toDF("id", "v").repartition(1)
      .write.mode("overwrite").parquet(d)
    assert(Fs.fingerprint(d) !== fp1)
    // partitionBy layout: data lives in subdirs — acceptDirs sees it
    val pd = s"$root/part"
    Seq(("a", 1)).toDF("id", "bucket")
      .write.partitionBy("bucket").parquet(pd)
    assert(Fs.hasData(pd, acceptDirs = true))
    assert(!Fs.hasData(pd, acceptDirs = false, requireBytes = true))
  }
}
