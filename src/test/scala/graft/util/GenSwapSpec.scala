package graft.util

import graft.SparkSpec

/** A local FileSystem registered under a scheme that has NO
  * AbstractFileSystem binding — `FileContext.getFileContext` then
  * throws `UnsupportedFileSystemException` exactly as it does on s3a
  * without an `fs.AbstractFileSystem.<scheme>.impl` entry, forcing
  * [[GenSwap.commit]] onto its delete+rename fallback branch. */
class TestRawFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "testraw"
  override def getUri: java.net.URI = java.net.URI.create("testraw:///")
}

/** The generation-pointer commit's NON-ATOMIC fallback (stores with
  * no AbstractFileSystem binding) and the pointer-window protocol:
  * commits land, pruning holds {new, previous}, an in-flight flip is
  * waited out, and a flip that DIED mid-window fails loudly instead
  * of silently serving "no generation". The atomic (FileContext)
  * path is VectorIndexSpec's business. */
class GenSwapSpec extends SparkSpec {

  private def conf = spark.sparkContext.hadoopConfiguration

  private def rawRoot(prefix: String): String = {
    conf.set("fs.testraw.impl", classOf[TestRawFs].getName)
    "testraw://" + tmpDir(prefix)
  }

  private def touchGen(root: String, name: String): String = {
    Fs.mkdirs(s"$root/$name")
    Fs.touch(s"$root/$name/data")
    s"$root/$name"
  }

  test("the testraw scheme really has no AbstractFileSystem binding " +
      "(the commit below exercises the fallback, not the atomic path)") {
    conf.set("fs.testraw.impl", classOf[TestRawFs].getName)
    intercept[org.apache.hadoop.fs.UnsupportedFileSystemException] {
      org.apache.hadoop.fs.FileContext.getFileContext(
        java.net.URI.create("testraw:///"), conf)
    }
  }

  test("fallback commit: pointer lands, re-commit overwrites it, and " +
      "pruning retains exactly {new, previous}") {
    val root = rawRoot("genswap-fb")
    touchGen(root, "gen-00000000")
    GenSwap.commit(root, s"$root/gen-00000000")
    assert(GenSwap.currentGen(root) === Some("gen-00000000"))
    assert(!Fs.exists(s"$root/CURRENT.tmp")) // rename consumed the tmp
    // second commit crosses the delete+rename window with a pointer
    // already present
    touchGen(root, "gen-00000001")
    GenSwap.commit(root, s"$root/gen-00000001")
    assert(GenSwap.currentGen(root) === Some("gen-00000001"))
    assert(Fs.exists(s"$root/gen-00000000")) // previous retained
    // third commit prunes the oldest: exactly {new, previous} survive
    touchGen(root, "gen-00000002")
    GenSwap.commit(root, s"$root/gen-00000002")
    assert(GenSwap.currentGen(root) === Some("gen-00000002"))
    assert(Fs.exists(s"$root/gen-00000001"))
    assert(!Fs.exists(s"$root/gen-00000000"))
    assert(GenSwap.nextDir(root).endsWith("gen-00000003"))
  }

  test("a reader inside the fallback's no-pointer window waits the " +
      "flip out instead of answering 'no generation'") {
    val root = rawRoot("genswap-window")
    touchGen(root, "gen-00000000")
    GenSwap.commit(root, s"$root/gen-00000000")
    // reconstruct the mid-window state by hand: tmp written, pointer
    // deleted, rename not yet executed
    val p = Fs.path(s"$root/CURRENT")
    val fs = Fs.fsOf(p)
    val out = fs.create(p.suffix(".tmp"), true)
    out.write("gen-00000000".getBytes("UTF-8")); out.close()
    fs.delete(p, false)
    // the writer's rename lands while the reader is retrying
    val flip = new Thread(() => {
      Thread.sleep(150)
      fs.rename(p.suffix(".tmp"), p); ()
    })
    flip.start()
    assert(GenSwap.currentGen(root) === Some("gen-00000000"))
    flip.join()
  }

  test("two-refresh reader limit: a plan pinned to gen-N keeps serving " +
      "through ONE later commit, then fails LOUDLY (never wrong " +
      "answers) once commit N+2 prunes its dir") {
    val root = tmpDir("genswap-limit")
    import spark.implicits._
    def commitGen(v: Long): String = {
      val gen = GenSwap.nextDir(root)
      Seq((v, s"g$v")).toDF("id", "tag").write.parquet(s"$gen/t")
      GenSwap.commit(root, gen)
      gen
    }
    def isLoudMissingFile(t: Throwable): Boolean = {
      var c: Throwable = t
      while (c != null) {
        if (c.isInstanceOf[java.io.FileNotFoundException]) return true
        val m = Option(c.getMessage).getOrElse("")
        if (m.contains("PATH_NOT_FOUND") || m.contains("does not exist")
          || m.contains("FileNotFound")) return true
        c = if (c.getCause eq c) null else c.getCause
      }
      false
    }
    val gen0 = commitGen(0L)
    // the reader resolves the pointer ONCE and pins its plan to gen-0
    val pinned = spark.read.parquet(s"$gen0/t")
    assert(pinned.select("tag").collect().map(_.getString(0)).toSeq
      === Seq("g0"))
    // one refresh later: gen-0 is the retained previous generation,
    // the pinned plan still serves — the documented one-commit grace
    commitGen(1L)
    assert(Fs.exists(s"$gen0/t"))
    assert(pinned.count() === 1L)
    // two refreshes later: gen-0 is pruned; the pinned plan must fail
    // with a missing-file error, not return empty/stale rows...
    commitGen(2L)
    assert(!Fs.exists(gen0))
    val stale = intercept[Throwable](pinned.count())
    assert(isLoudMissingFile(stale),
      s"stale pinned plan failed with the wrong error: $stale")
    // ...and a FRESH read of the dead dir fails at plan time too
    val replan = intercept[Throwable](
      spark.read.parquet(s"$gen0/t").count())
    assert(isLoudMissingFile(replan),
      s"re-plan over the pruned dir failed with the wrong error: $replan")
    // re-resolving the pointer (the documented recovery) serves gen-2
    val cur = GenSwap.currentDir(root).get
    assert(spark.read.parquet(s"$cur/t").select("tag")
      .collect().map(_.getString(0)).toSeq === Seq("g2"))
  }

  test("a flip that DIED mid-window (tmp present, pointer gone) fails " +
      "loudly; a genuinely uncommitted root still reads as None") {
    val root = rawRoot("genswap-dead")
    touchGen(root, "gen-00000000")
    GenSwap.commit(root, s"$root/gen-00000000")
    val p = Fs.path(s"$root/CURRENT")
    val fs = Fs.fsOf(p)
    val out = fs.create(p.suffix(".tmp"), true)
    out.write("gen-00000000".getBytes("UTF-8")); out.close()
    fs.delete(p, false)
    val e = intercept[IllegalStateException](GenSwap.currentGen(root))
    assert(e.getMessage.contains("CURRENT.tmp"))
    // no tmp, no pointer — e.g. a stage crashed before its first
    // commit: that IS "no generation", orphaned dir notwithstanding
    val fresh = rawRoot("genswap-none")
    touchGen(fresh, "gen-00000000") // staged but never committed
    assert(GenSwap.currentGen(fresh) === None)
    assert(GenSwap.currentDir(fresh) === None)
  }
}
