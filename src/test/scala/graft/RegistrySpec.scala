package graft

/** Registry ↔ oracle contract: every query has an oracle and vice
  * versa (the driver's set-equality check), including the LAZY
  * data-parameterized tail (the trained-unigram oracle trains on
  * `Shared.verifySfDir` at dump time — exercised here against a
  * self-contained fixture corpus, no external testdata dependency). */
class RegistrySpec extends SparkSpec {
  import spark.implicits._

  test("queries and oracleSql cover exactly the same names, and the " +
      "lazy trained-unigram oracle materializes against the dump-time " +
      "corpus dir") {
    val dir = tmpDir("registry-fixture")
    Seq(
      (1L, "the quick brown fox"),
      (2L, "jumps over the lazy dog"),
      (3L, "pack my box with five dozen jugs"),
      (4L, "the lazy dog naps"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val prev = graft.registry.Shared.verifySfDir
    try {
      graft.registry.Shared.verifySfDir = dir
      val q = SparkEntry.queries.keySet
      val o = SparkEntry.oracleSql // materializes the lazy tail
      assert(q === o.keySet,
        s"orphan oracles: ${o.keySet -- q}; missing oracles: ${q -- o.keySet}")
      assert(o.values.forall(_.trim.nonEmpty))
      // the trained literals must reflect THIS corpus: the fixture's
      // dominant multi-codepoint piece ("the ") appears in the vocab
      // VALUES list
      val trained = o("q_unigram_encode_trained")
      assert(trained.contains("VALUES"))
      assert(trained.contains("('the'") || trained.contains("('laz'") ||
        trained.contains("('dog'"), "trained vocab literals missing")
    } finally graft.registry.Shared.verifySfDir = prev
  }
}
