package graft

import org.apache.spark.sql.functions._

/**
 * Robustness: every `SparkEntry.queries` entry must run (and return
 * an empty result, not crash) on EMPTY input tables with the
 * production schemas. At 100 TB this is not a corner case — a
 * partition-pruned scan, a fresh tenant, or a filtered branch hands
 * every operator a zero-row frame routinely; `head()` on empty,
 * divide-by-zero in a ratio, or a `require` on corpus size must not
 * take the pipeline down.
 *
 * Split into two half-suites (A = even index, B = odd, over the
 * sorted query list — every query in exactly one) so the sweep can
 * run in separate concurrent test JVMs (build.sbt `testGrouping`);
 * same tests, same assertions.
 */
abstract class EmptyInputSpecBase(half: Int) extends SparkSpec {

  private lazy val emptyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_empty_").toString
    val src = "/root/testdata/sf0.001"
    val files = Option(new java.io.File(src).listFiles()).getOrElse(
      fail(s"schema source $src is missing — cannot build empty fixtures"))
    files.filter(_.getName.endsWith(".parquet"))
      .foreach { f =>
        // limit(0) preserves the exact schema, including the nanos ts
        spark.read.parquet(f.getAbsolutePath).limit(0)
          .write.mode("overwrite").parquet(s"$dir/${f.getName}")
      }
    dir
  }

  SparkEntry.queries.toSeq.sortBy(_._1).zipWithIndex
    .filter(_._2 % 2 == half).map(_._1)
    .foreach { case (name, fn) =>
      test(s"$name returns an empty result on empty inputs") {
        val n = fn(spark, emptyDir).count()
        assert(n === 0L, s"$name produced $n rows from empty inputs")
        spark.catalog.clearCache()
      }
    }
}

class EmptyInputSpecA extends EmptyInputSpecBase(0)
class EmptyInputSpecB extends EmptyInputSpecBase(1)
