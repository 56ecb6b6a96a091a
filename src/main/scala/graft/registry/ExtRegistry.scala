package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}

/** LLM-training-data pipeline operators (BASELINE.json
  * north star) — the aggregation over the per-domain
  * registry files under `registry/ext/` (split r16; the
  * entries themselves moved verbatim). Key sets are
  * asserted disjoint so a split mistake cannot silently
  * shadow a query. */
private[graft] object ExtRegistry {

  private def parts: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] = Seq(
    (ext.DedupRegistry.queries, ext.DedupRegistry.oracles),
    (ext.SimilarityRegistry.queries, ext.SimilarityRegistry.oracles),
    (ext.MultimodalRegistry.queries, ext.MultimodalRegistry.oracles),
    (ext.TextQualityRegistry.queries, ext.TextQualityRegistry.oracles),
    (ext.AssembleRegistry.queries, ext.AssembleRegistry.oracles),
    (ext.SamplingRegistry.queries, ext.SamplingRegistry.oracles),
    (ext.IngestDayRegistry.queries, ext.IngestDayRegistry.oracles)
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = {
    val qs = parts.map(_._1)
    val merged = qs.reduce(_ ++ _)
    require(merged.size == qs.map(_.size).sum,
      "duplicate query keys across registry/ext files")
    merged
  }

  val oracles: Map[String, String] = {
    val os = parts.map(_._2)
    val merged = os.reduce(_ ++ _)
    require(merged.size == os.map(_.size).sum,
      "duplicate oracle keys across registry/ext files")
    merged
  }

  /** Oracles whose SQL depends on the dump-time corpus (trained-model
    * literals) — generated LAZILY when [[graft.SparkEntry.oracleSql]]
    * is materialized by the Verify dump, after `Shared.verifySfDir`
    * is set and a session is active. Kept out of the eager [[oracles]]
    * val so loading the registry never touches data. */
  def lazyOracles: Map[String, String] = Map(
    "q_unigram_encode_trained" -> Shared.unigramTrainedSql(
      Shared.trainedUnigramVocab(
        org.apache.spark.sql.SparkSession.active, Shared.verifySfDir),
      maxPieceLen = 4, maxWordLen = 40)
  )
}
