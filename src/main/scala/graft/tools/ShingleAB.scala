package graft.tools

import org.apache.spark.sql.functions._

/** Microbenchmark: native word_shingles kernel vs the HOF reference
  * formulation, same inputs, min-of-N — the isolation harness for the
  * r18 kernel decision (not part of the driver contract). */
object ShingleAB {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = 5
    val spark = graft.util.Tables.session("shingle-ab", "32")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))

    def hofShingles(text: org.apache.spark.sql.Column, n: Int) = {
      val tokens = graft.ext.TextAnalysis.normTokens(text)
      val nTok = size(tokens)
      val grams = (2 to n).foldLeft(tokens) { (acc, k) =>
        zip_with(acc, slice(tokens, lit(k), greatest(nTok - k + 1, lit(0))),
          (a, b) => concat(a, lit(" "), b))
      }
      array_sort(array_distinct(
        when(nTok < n, array(concat_ws(" ", tokens)))
          .otherwise(slice(grams, lit(1), nTok - n + 1))))
    }

    def time(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val secs = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[shingle-ab] $label%-28s min=${secs.min}%6.3fs  all=${secs.map(x => f"$x%.2f").mkString(",")}")
    }

    // warm both codegen shapes once
    docs.select(explode(graft.ext.Dedup.shingles(col("text"), 3))).count()
    docs.select(explode(hofShingles(col("text"), 3))).count()

    time("kernel shingles->explode") {
      docs.select(explode(graft.ext.Dedup.shingles(col("text"), 3)))
    }
    time("hof    shingles->explode") {
      docs.select(explode(hofShingles(col("text"), 3)))
    }
    time("kernel full minhash sigs") {
      graft.ext.Dedup.minhashSignatures(docs, "doc_id", "text")
    }
    time("hof    full minhash sigs") {
      graft.ext.Dedup.signaturesFromShingled(
        graft.util.Tables.spread(docs).select(col("doc_id").as("id"),
          hofShingles(col("text"), 3).as("sh")), 32, xxhash64(_))
    }
    spark.stop()
  }
}
