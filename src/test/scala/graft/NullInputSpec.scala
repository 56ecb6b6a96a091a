package graft

import org.apache.spark.sql.functions._

/**
 * Dirty-data robustness: every `SparkEntry.queries` entry must RUN
 * (complete without throwing — dropping or null-propagating the dirty
 * rows is each operator's documented choice) on inputs where ~10% of
 * PAYLOAD values are NULL. At 100 TB null payloads are not a corner
 * case: a crawler emits documents with no text, an upstream join
 * leaves metadata unresolved, a decoder fails a blob. Keys, join
 * columns, and timestamps stay non-null — nulling those changes query
 * semantics rather than testing robustness; payload nulls are the
 * dirt a pipeline must shrug off.
 *
 * The battery asserts liveness (no exception, a well-defined count),
 * not specific outputs — output semantics under nulls are pinned
 * per-operator by their own specs (e.g. c4LineDedup's coalesce,
 * langId's empty-text path, the mapper's missing ⇒ NULL contract).
 *
 * Split into two half-suites (A = even index, B = odd, over the
 * sorted query list — every query in exactly one) so the two heaviest
 * suites in the tree can run in separate concurrent test JVMs
 * (build.sbt `testGrouping`); same tests, same assertions.
 */
abstract class NullInputSpecBase(half: Int) extends SparkSpec {

  /** id-deterministic 10% null injection per (table, payload cols). */
  private lazy val dirtyDir: String = {
    val dir = tmpDir("graft_nulls_")
    val src = "/root/testdata/sf0.001"
    // payload columns per table — never ids, join keys, or ts
    val payload: Map[String, (String, Seq[String])] = Map(
      "documents" -> ("doc_id", Seq("text", "lang", "source")),
      "events" -> ("event_id", Seq("props", "value")),
      "embeddings" -> ("vec_id", Seq("embedding", "label")),
      "orders" -> ("o_orderkey", Seq("o_orderpriority")),
      "lineitem" -> ("l_orderkey", Seq("l_returnflag", "l_linestatus")),
      "part" -> ("p_partkey", Seq("p_name", "p_type")),
      "customer" -> ("c_custkey", Seq("c_mktsegment")))
    new java.io.File(src).listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .foreach { f =>
        val name = f.getName.stripSuffix(".parquet")
        val df = spark.read.parquet(f.getAbsolutePath)
        val out = payload.get(name) match {
          case Some((idCol, cols)) =>
            cols.foldLeft(df)((acc, c) =>
              acc.withColumn(c,
                when(pmod(col(idCol), lit(10)) === 3,
                  lit(null).cast(df.schema(c).dataType))
                  .otherwise(col(c))))
          case None => df
        }
        out.write.mode("overwrite").parquet(s"$dir/${f.getName}")
      }
    dir
  }

  SparkEntry.queries.toSeq.sortBy(_._1).zipWithIndex
    .filter(_._2 % 2 == half).map(_._1)
    .foreach { case (name, fn) =>
      test(s"$name survives 10% null payloads") {
        val n = fn(spark, dirtyDir).count()
        assert(n >= 0L, s"$name returned a negative count")
        spark.catalog.clearCache()
      }
    }
}

class NullInputSpecA extends NullInputSpecBase(0)
class NullInputSpecB extends NullInputSpecBase(1)
