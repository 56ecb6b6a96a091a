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
