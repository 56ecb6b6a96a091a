package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * End-to-end curation funnel — the composition a real 100 TB
 * training-data run executes, with per-document drop accounting
 * (engine extension; BASELINE.json north star). Every document gets
 * exactly one label: the FIRST stage that rejected it, or `kept`.
 * Per-stage counts — the funnel observability every curation run
 * needs ("why did 40% of my corpus disappear?") — are one tiny
 * groupBy away from the output.
 *
 * Stage order follows the published pipelines (Rae 2021 Gopher §A1,
 * RefinedWeb, Dolma): cheap narrow predicates first (holdout split,
 * language, length), then the gram-join stages (benchmark
 * contamination, dedup), then model-based selection (DSIR) last,
 * over the smallest surviving set.
 *
 * Scale shape: each stage consumes only the previous stage's
 * survivors, so the expensive passes run over progressively smaller
 * frames; the label assembly is three id-keyed left joins of
 * id-only flag frames onto one narrow base projection. The
 * contamination stage is a semi-join against the DISTINCT eval-gram
 * hash set (at production scale, prefilter with
 * [[Dedup.contaminationBloom]]'s native bloom probe); dedup is a
 * prefix-fingerprint window (WindowGroupLimit shape);
 * selection is [[Sampling.dsirSelect]] (one tokenize pass,
 * ReuseExchange, broadcast weights). On a cluster you would persist
 * each survivor frame; the lineage recompute here costs narrow
 * scans only.
 */
object Curation {

  /**
   * Label every document with its funnel outcome.
   *
   * Stages, first failure wins:
   *  1. `eval_holdout` — id ≡ `evalRes` (mod `evalMod`): the slice
   *     reserved as the benchmark/eval reference set.
   *  2. `lang_filter`  — language ≠ `targetLang`.
   *  3. `too_short`    — fewer than `minWords` whitespace words.
   *  4. `contaminated` — shares ≥ 1 distinct `contamN`-gram with the
   *     eval slice (ALL eval docs count: the benchmark is external,
   *     so its other attributes don't gate its grams).
   *  5. `dup`          — a surviving doc with a smaller id has the
   *     same `fpTokens`-word prefix fingerprint.
   *  6. `dsir_cut`     — not in the DSIR top-`keepK` selection over
   *     the remaining survivors (target = `targetPred`).
   *  7. `kept`.
   *
   * @return (doc_id, stage) — one row per input document.
   */
  def funnel(
      docs: DataFrame, idCol: String, textCol: String, langCol: String,
      targetPred: Column, targetLang: String = "en",
      evalMod: Long = 19, evalRes: Long = 3, minWords: Int = 30,
      contamN: Int = 13, fpTokens: Int = 5, keepK: Int = 100,
      dim: Int = 1024): DataFrame = {
    require(evalMod > 0, "evalMod must be positive")
    require(minWords > 0, "minWords must be positive")
    val base = graft.util.Tables.spread(docs).select(
      col(idCol).as("doc_id"), col(textCol).as("text"),
      (col(idCol) % evalMod === evalRes).as("s_eval"),
      (col(langCol) =!= targetLang).as("s_lang"),
      (TextAnalysis.wsTokenCount(col(textCol)) < minWords).as("s_short"),
      targetPred.as("is_t"))
    val evalGrams = base.filter(col("s_eval"))
      .select(explode(Dedup.shingles(col("text"), contamN)).as("g"))
      .select(TextAnalysis.portableHash60(col("g")).as("gh")).distinct()
    val pre = base.filter(!col("s_eval") && !col("s_lang") && !col("s_short"))
    val contamIds = pre
      .select(col("doc_id"), explode(Dedup.shingles(col("text"), contamN)).as("g"))
      .select(col("doc_id"), TextAnalysis.portableHash60(col("g")).as("gh"))
      .join(evalGrams, Seq("gh"), "left_semi")
      .select(col("doc_id")).distinct()
    // prefix fingerprint (first `fpTokens` normalized words), the
    // q_dedup_exact convention: catches title/boilerplate-prefix
    // duplicates that whole-text hashing misses — and actually fires
    // on real corpora where copies differ in a trailing timestamp
    val fp = md5(concat_ws(" ",
      slice(split(lower(trim(col("text"))), "\\s+"), 1, fpTokens))
      .cast("binary"))
    val ranked = pre.join(contamIds, Seq("doc_id"), "left_anti")
      .withColumn("fp", fp)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("fp")).orderBy(col("doc_id"))))
    val dupIds = ranked.filter(col("rn") > 1).select(col("doc_id"))
    val selIds = Sampling.dsirSelect(
        ranked.filter(col("rn") === 1)
          .select(col("doc_id"), col("text"), col("is_t")),
        "doc_id", "text", col("is_t"), dim, keepK)
      .select(col("doc_id"))
    base.select(col("doc_id"), col("s_eval"), col("s_lang"), col("s_short"))
      .join(contamIds.withColumn("c_contam", lit(true)), Seq("doc_id"), "left")
      .join(dupIds.withColumn("c_dup", lit(true)), Seq("doc_id"), "left")
      .join(selIds.withColumn("c_sel", lit(true)), Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("s_eval"), "eval_holdout")
          .when(col("s_lang"), "lang_filter")
          .when(col("s_short"), "too_short")
          .when(col("c_contam"), "contaminated")
          .when(col("c_dup"), "dup")
          .when(col("c_sel"), "kept")
          .otherwise("dsir_cut").as("stage"))
  }
}
