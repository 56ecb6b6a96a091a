package graft.registry

import graft.core.{Diff, DiffOptions, Records}
import graft.ext.{Assemble, AudioHash, Curation, Dedup, ImageHash, Multimodal, Similarity, TextAnalysis, VideoHash}
import graft.mapper.Mapper
import graft.pipeline.{ImportService, Preset}
import graft.sources.InlineSource
import graft.targets.{FileTarget, JdbcTarget}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Shared._

  /** LLM-training-data pipeline operators (BASELINE.json north star). */
private[graft] object ExtRegistry {

  /** Shared BPE merge-ladder fixture for the q_bpe_apply /
    * q_bpe_encode / q_bpe_pack rows: the t+h→th→the chain plus two
    * `</w>`-bearing merges (word-final `e</w>`, whole-word `the</w>`)
    * so the rows certify that merges over the [[graft.ext.Assemble
    * .bpeTrain]] end-of-word alphabet actually apply. */
  private val bpeFixtureMerges: Seq[(String, String)] = Seq(
    "t" -> "h", "th" -> "e", "i" -> "n", "a" -> "n",
    "an" -> "d", "e" -> "r", "o" -> "n", "o" -> "u",
    "e" -> "</w>", "th" -> "e</w>")

  /** DuckDB replay of [[graft.ext.Assemble.bpeMergeChain]]: the same
    * double-space canonical form (` c ` per char + ` </w> `), the
    * same plain-substring replace per merge, the same final
    * single-space collapse — byte-exact against the Spark side. */
  private def duckBpeChain(
      wExpr: String, merges: Seq[(String, String)]): String = {
    val spaced =
      s"regexp_replace($wExpr, '(.)', ' \\1 ', 'g') || ' </w> '"
    val merged = merges.foldLeft(spaced) { case (acc, (a, b)) =>
      s"replace($acc, ' $a  $b ', ' ${a + b} ')"
    }
    s"trim(replace($merged, '  ', ' '))"
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // exact dedup on a 5-token-prefix fingerprint (creates real
    // collisions in the synthetic corpus; keeps min doc_id per group)
    "q_dedup_exact" -> ((s, dir) => {
      val d = s.read.parquet(t(dir, "documents"))
      val fp = md5(concat_ws(" ",
        slice(split(lower(trim(col("text"))), "\\s+"), 1, 5)).cast("binary"))
      val w = Window.partitionBy(col("fingerprint")).orderBy(col("doc_id"))
      d.withColumn("fingerprint", fp)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("fingerprint"))
    }),

    // passage-level dedup: chunk fingerprints shared by >1 document
    // (aligned duplication — boilerplate, common prefixes, copies)
    "q_chunk_dedup" -> ((s, dir) =>
      graft.util.Tables.spread(s.read.parquet(t(dir, "documents")))
        .select(col("doc_id"),
          explode(TextAnalysis.chunkHashes(col("text"), 32))
            .as("chunk_hash"))
        .groupBy(col("chunk_hash"))
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          min(col("doc_id")).as("min_doc"),
          max(col("doc_id")).as("max_doc"))
        .filter(col("n_docs") > 1)),

    // content-defined chunking: shared passages found regardless of
    // their offset in the document (the fixed-position variant above
    // only catches aligned duplication)
    "q_cdc_chunks" -> ((s, dir) =>
      TextAnalysis.cdcChunks(
        s.read.parquet(t(dir, "documents")), "doc_id", "text", 64)
        .filter(col("n_tokens") >= 8)
        .groupBy(col("chunk_hash"))
        .agg(countDistinct(col("id")).as("n_docs"),
          count(lit(1)).as("n_occurrences"))
        .filter(col("n_docs") > 1)),

    // deterministic stratified hash sampling — same rows every run,
    // every engine, any partitioning (oracle replays the selection)
    "q_sample_stratified" -> ((s, dir) =>
      graft.ext.Sampling.stratified(
        tbl(s, dir, "events"), "event_id", "event_type",
        rates = Map("view" -> 0.1, "click" -> 0.5), defaultRate = 1.0)
        .select(col("event_id"), col("event_type"), col("user_id"))),

    // text analysis: tokens, ratios, quality, lang-id, fingerprint
    "q_text_analysis" -> ((s, dir) =>
      TextAnalysis.analyze(s.read.parquet(t(dir, "documents")))),

    // PII scrub: redact emails → IPv4s → phones with typed
    // placeholders, counting each class. The corpus carries no PII,
    // so a deterministic contact line derived from doc_id is appended
    // on BOTH engines (the synthetic-input convention the sync
    // queries use) — the scrub does real work and the oracle verifies
    // real redactions.
    "q_pii_scrub" -> ((s, dir) => {
      val withPii = s.read.parquet(t(dir, "documents")).select(col("doc_id"),
        concat(col("text"),
          lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com or +1 (555) 010-"),
          lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
          lit(" at 10."), pmod(col("doc_id"), lit(256)).cast("string"),
          lit(".0.1")).as("text"))
      TextAnalysis.piiScrub(withPii, "doc_id", "text")
    }),

    // HTML→text extraction on synthetic markup (the PII convention:
    // the corpus has no HTML, so a deterministic wrapper derived
    // from doc_id is added on BOTH engines — scripts/styles/
    // comments/tags/entities all exercised, cleaned text replayed
    // byte-for-byte)
    "q_html_strip" -> ((s, dir) => {
      val wrapped = s.read.parquet(t(dir, "documents"))
        .select(col("doc_id"), concat(
          lit("<html><head><title>Doc "), col("doc_id").cast("string"),
          lit("</title><script type=\"text/javascript\">var n=2;\ntrack();</script><style>.c{margin:0}</style></head><body><!-- hdr -->"),
          lit("<p class=\"b\">"), coalesce(col("text"), lit("")),
          lit("</p><div>Tom &amp; Jerry &lt;3 &quot;q&quot;&#39;s&nbsp;end</div></body></html>"))
          .as("text"))
      TextAnalysis.stripHtml(wrapped, "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
    }),

    // corpus-wide duplicate-line removal (C4 repeated-line rule /
    // Dolma paragraph dedup): each non-blank line keeps only its
    // first (doc_id, position) occurrence across the corpus
    "q_line_dedup" -> ((s, dir) => {
      TextAnalysis.c4LineDedup(
        s.read.parquet(t(dir, "documents")), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
    }),

    // Gopher-style repetition quality signals: top token / top 2-gram
    // frequency, longest same-token run, duplicate-token fraction
    "q_quality_repetition" -> ((s, dir) =>
      TextAnalysis.repetitionSignals(
        s.read.parquet(t(dir, "documents")), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")),

    // unigram-LM surprisal scoring (the CCNet/KenLM quality-filter
    // shape: corpus-trained token frequencies → per-doc total/mean
    // surprisal; integer micro-nats before the sum, so the aggregate
    // is exact and order-free)
    "q_unigram_ppl" -> ((s, dir) =>
      Assemble.unigramSurprisal(
        s.read.parquet(t(dir, "documents")), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")),

    // bigram-LM surprisal with add-one smoothing (one rung up the LM
    // ladder toward the CCNet 5-gram scorer): integer micro-nats
    // before the sum, exact integer mean — order-free and replayable
    "q_bigram_ppl" -> ((s, dir) =>
      Assemble.bigramSurprisal(
        s.read.parquet(t(dir, "documents")), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")),

    // exact-k-per-stratum sample (fixed-budget eval sets: "exactly
    // 20 per event type"): portable-hash rank within stratum, the
    // same any-engine/any-partitioning reproducibility contract as
    // the rate-based sampler; WindowGroupLimit keeps the shuffle at
    // O(k·strata·tasks)
    "q_sample_exact_k" -> ((s, dir) =>
      graft.ext.Sampling.exactKPerStratum(
        tbl(s, dir, "events"), "event_id", "event_type", k = 20)
        .select(col("event_id"), col("event_type"), col("user_id"))),

    // DSIR-style importance selection (Xie 2023): hashed
    // unigram+bigram likelihood-ratio scoring against the English
    // slice as the target distribution; integer-ppm weights so the
    // per-doc score is an order-independent BIGINT sum, top-k via
    // TakeOrderedAndProject
    "q_dsir_select" -> ((s, dir) =>
      graft.ext.Sampling.dsirSelect(
        s.read.parquet(t(dir, "documents")), "doc_id", "text",
        targetPred = col("lang") === "en", dim = 1024, topK = 50)),

    // end-to-end curation funnel capstone: holdout → language →
    // length → contamination → dedup → DSIR selection, one first-fail
    // label per document — the composition a real curation run
    // executes, with the drop accounting it needs
    "q_curation_funnel" -> ((s, dir) =>
      Curation.funnel(
        s.read.parquet(t(dir, "documents")), "doc_id", "text", "lang",
        targetPred = col("source").isin("src0", "src1", "src2"))),

    // tokenizer fertility audit per language over the trained-merge
    // fixture: pieces/word and chars/piece in truncating ppm — the
    // multilingual "is the vocab fair" diagnostic, one tokenize pass
    "q_tok_fertility" -> ((s, dir) =>
      Assemble.tokenizerFertility(
        s.read.parquet(t(dir, "documents")), "doc_id", "text", "lang",
        bpeFixtureMerges)),

    // deterministic train/val/test split (90/5/5 hash cells):
    // disjoint by construction, stable under reprocessing
    "q_split" -> ((s, dir) =>
      graft.ext.Sampling.split(
        s.read.parquet(t(dir, "documents")), "doc_id")
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n"),
          min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))),

    // interpolated trigram surprisal (Jelinek-Mercer; the LM-ladder
    // rung the CCNet 5-gram scorer generalizes): fixed-order
    // interpolation over exact integer counts, one micro-nat
    // truncation, exact integer per-doc totals
    "q_trigram_ppl" -> ((s, dir) =>
      Assemble.trigramSurprisal(
        s.read.parquet(t(dir, "documents")), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")),

    // stupid backoff (Brants 2007) on a genuine train/score split:
    // even doc_ids train the count tables, odd doc_ids are scored
    // held-out — trigram → 0.4·bigram → 0.16·smoothed-unigram with
    // per-doc OOV counts; backoff actually fires, unlike
    // self-trained scorers
    "q_backoff_ppl" -> ((s, dir) => {
      val d = s.read.parquet(t(dir, "documents"))
      Assemble.stupidBackoff(
        d.filter(col("doc_id") % 2 === 0),
        d.filter(col("doc_id") % 2 === 1), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
    }),

    // interpolated Kneser-Ney bigram (Chen & Goodman 1999 — the
    // KenLM/SRILM standard) on the same held-out split: discounted
    // bigram mass interpolated with the CONTINUATION distribution
    // (distinct-context counts, not raw frequency); all four model
    // tables are mergeable groupBys, one micro-nat truncation
    "q_kn_ppl" -> ((s, dir) => {
      val d = s.read.parquet(t(dir, "documents"))
      Assemble.knSurprisal(
        d.filter(col("doc_id") % 2 === 0),
        d.filter(col("doc_id") % 2 === 1), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
    }),

    // the full trigram Kneser-Ney recursion (KenLM's default order-3
    // shape): discounted trigrams → continuation-count middle order
    // → continuation unigram; five mergeable model tables
    "q_kn3_ppl" -> ((s, dir) => {
      val d = s.read.parquet(t(dir, "documents"))
      Assemble.kn3Surprisal(
        d.filter(col("doc_id") % 2 === 0),
        d.filter(col("doc_id") % 2 === 1), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
    }),

    // unigram-LM tokenization (Kudo 2018, the SentencePiece family —
    // the other production tokenizer besides BPE): frequency-seeded
    // piece vocabulary (singles ∪ top-512 substrings ≤ 4 cps),
    // Viterbi segmentation over the DISTINCT word-type table with
    // micro-nat piece costs; the DP minimizes (cost, n_pieces)
    // packed into one BIGINT so both engines land on identical
    // values even across cost ties
    "q_unigram_encode" -> ((s, dir) =>
      Assemble.unigramEncode(
        s.read.parquet(t(dir, "documents")), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")),

    // the TRAINED end of the unigram tokenizer (Kudo 2018 §3.1/§4 —
    // the loop SentencePiece actually ships): capped frequency seed →
    // 2 forward-backward EM rounds → likelihood-loss prune to 256
    // multis, all driver math over the bounded word-type table
    // (memoized per corpus), then the one distributed broadcast-
    // Viterbi encode under the trained packed costs. The oracle gets
    // the same trained (piece, cost) pairs as literals — the
    // q_mix_temperature driver-literal convention — and replays the
    // encode DP independently (Shared.unigramTrainedSql, generated
    // lazily at dump time so the literals train on the dump's corpus)
    "q_unigram_encode_trained" -> ((s, dir) =>
      Assemble.unigramEncodeWithVocab(
        s.read.parquet(t(dir, "documents")), "doc_id", "text",
        trainedUnigramVocab(s, dir))
        .withColumnRenamed("id", "doc_id")),

    // CLUSTER-BALANCED (diversity) selection — the semantic-shard
    // counterpart of domain mixing (the D4-style "balance over
    // embedding clusters, not metadata domains" pass of corpus
    // curation): each vector lands in one of 16 cells via the
    // exact-integer quantized-projection argmax (intCellAssign —
    // oracle-replayable bit for bit, unlike the float plane kernel),
    // then the equal-weight mixture flattens every cell toward the
    // smallest one with the exact-integer hash-threshold selection.
    // Composition of two certified pieces; selection is a narrow
    // filter, zero shuffles beyond the per-cell counts
    "q_embed_balanced" -> ((s, dir) => {
      val celled = s.read.parquet(t(dir, "embeddings"))
        .select(col("vec_id"),
          Similarity.intCellAssign(col("embedding"), 16)
            .cast("string").as("cell"))
      Assemble.mixture(celled, "vec_id", "cell",
        (0 until 16).map(k => k.toString -> 1L).toMap)
        .select(col("vec_id"), col("cell").cast("int").as("cell"))
    }),

    // deterministic domain-mixture sampling over events: hit target
    // event_type proportions 1:3:6 by downsampling only; exact
    // integer thresholds end to end (signup/error carry no weight —
    // dropped)
    "q_mix_domains" -> ((s, dir) =>
      Assemble.mixture(tbl(s, dir, "events"), "event_id", "event_type",
        Map("view" -> 1L, "click" -> 3L, "purchase" -> 6L))
        .select(col("event_id"), col("event_type"), col("user_id"))),

    // temperature-flattened mixture (T=2 over 1:3:6): integer
    // milli-weights computed once on the driver, identical literals
    // embedded in the oracle — the exact-integer selection unchanged
    "q_mix_temperature" -> ((s, dir) =>
      Assemble.mixtureTemperature(tbl(s, dir, "events"),
        "event_id", "event_type",
        Map("view" -> 1L, "click" -> 3L, "purchase" -> 6L),
        temperature = 2.0, scale = 50L)
        .select(col("event_id"), col("event_type"), col("user_id"))),

    // sequence packing: documents → fixed-512-token training
    // sequences in 8 hash shards (greedy concat-and-chop in id order
    // per shard)
    "q_seq_pack" -> ((s, dir) =>
      Assemble.packSequences(
        s.read.parquet(t(dir, "documents")), "doc_id", "text",
        seqLen = 512, shards = 8)
        .withColumnRenamed("id", "doc_id")),

    // corpus vocabulary with document frequencies (tokenizer/BPE
    // corpus prep): token -> total count + containing-doc count
    "q_vocab" -> ((s, dir) =>
      Assemble.vocabulary(
        s.read.parquet(t(dir, "documents")), "doc_id", "text",
        minCount = 5L)),

    // bigram PMI (collocation mining — the phrase-detection pass of
    // tokenizer/corpus prep): ln((c_ab·N)/(c_a·c_b)) over exact
    // integer counts, truncated once to micro-nats; top collocations
    // by a total order. One explode for bigrams via an in-array zip
    // (no second token shuffle), unigram table joined twice (AQE
    // broadcasts the vocab-sized sides)
    "q_pmi" -> ((s, dir) => {
      val toks = graft.util.Tables.spread(
        s.read.parquet(t(dir, "documents")))
        .select(graft.ext.TextAnalysis.normTokens(col("text")).as("ts"))
        .filter(size(col("ts")) >= 2)
      val bi = toks.select(explode(
          transform(sequence(lit(1), size(col("ts")) - 1),
            i => concat_ws(" ", element_at(col("ts"), i),
              element_at(col("ts"), i + 1)))).as("bigram"))
        .groupBy(col("bigram")).agg(count(lit(1)).as("c_ab"))
        .filter(col("c_ab") >= 5)
      val uni = graft.util.Tables.spread(
        s.read.parquet(t(dir, "documents")))
        .select(explode(
          graft.ext.TextAnalysis.normTokens(col("text"))).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("c"))
      val nRow = uni.agg(sum(col("c"))).head()
      val n = if (nRow.isNullAt(0)) 0L else nRow.getLong(0) // empty corpus
      bi.withColumn("w1", split(col("bigram"), " ").getItem(0))
        .withColumn("w2", split(col("bigram"), " ").getItem(1))
        .join(uni.select(col("tok").as("w1"), col("c").as("c_a")), Seq("w1"))
        .join(uni.select(col("tok").as("w2"), col("c").as("c_b")), Seq("w2"))
        .withColumn("pmi_micro",
          floor(log((col("c_ab") * n).cast("double") /
            (col("c_a") * col("c_b"))) * 1000000L).cast("long"))
        .select(col("bigram"), col("c_ab"), col("c_a"), col("c_b"),
          col("pmi_micro"))
        .orderBy(col("pmi_micro").desc, col("bigram")).limit(50)
    }),

    // TF-IDF top-3 salient terms per document (keyword extraction /
    // topic tagging / per-domain vocabulary-drift monitoring):
    // exact-integer scoring — ln(N/df) truncated ONCE to micro-nats,
    // then tf·idf is pure LONG arithmetic and the per-doc top-k is a
    // total order (score desc, token asc)
    "q_tfidf" -> ((s, dir) =>
      Assemble.tfidfTopTerms(
        s.read.parquet(t(dir, "documents")), "doc_id", "text", topK = 3)
        .withColumnRenamed("id", "doc_id")),

    // int8 embedding quantization (the 4-bytes/dim -> 1 storage
    // path): absmax scale + floor quantizer; the oracle checks the
    // scale (floor-micro integer — no round-half convention; absmax
    // of a float column is the same exact double in both engines)
    // and an exact integer checksum of the quantized vector
    "q_embed_quantize" -> ((s, dir) =>
      Assemble.quantizeInt8(
        s.read.parquet(t(dir, "embeddings")), "vec_id")
        .select(col("vec_id"),
          floor(col("scale") * 1000000L).cast("long").as("scale_micro"),
          aggregate(col("q"), lit(0L), (acc, x) => acc + x).as("q_sum"),
          size(col("q")).cast("long").as("n_dims"))),

    // train/test contamination: 13-gram overlap of each "test" doc
    // (odd ids) against the "train" corpus (even ids) — the
    // decontamination pass run before training. Hash-keyed semi-join;
    // the oracle joins the gram STRINGS, so a green row also
    // certifies the 60-bit hash join is collision-free here.
    "q_contamination" -> ((s, dir) => {
      val d = s.read.parquet(t(dir, "documents"))
      Dedup.contamination(
        d.filter(col("doc_id") % 2 === 0),
        d.filter(col("doc_id") % 2 === 1),
        "doc_id", "text", n = 13)
        .withColumnRenamed("id", "doc_id")
    }),

    // cross-source n-gram leakage matrix: distinct shared grams +
    // Jaccard ppm per source pair (which benchmark leaks into which
    // crawl slice); one gram-keyed shuffle, S²-bounded output
    "q_source_overlap" -> ((s, dir) =>
      Dedup.sourceOverlap(
        s.read.parquet(t(dir, "documents")), "source", "text", n = 3)),

    // Bloom-prefiltered contamination — IDENTICAL output to
    // q_contamination (same oracle SQL): the test-gram bloom filters
    // the training grams map-side BEFORE their distinct shuffle, and
    // the exact semi-join after it absorbs the bloom's false
    // positives. The green row certifies the composed path is exact.
    "q_contamination_bloom" -> ((s, dir) => {
      val d = s.read.parquet(t(dir, "documents"))
      Dedup.contaminationBloom(
        d.filter(col("doc_id") % 2 === 0),
        d.filter(col("doc_id") % 2 === 1),
        "doc_id", "text", n = 13)
        .withColumnRenamed("id", "doc_id")
    }),

    // near-dup CLUSTERS: minhash pairs collapsed by connected
    // components (large-star/small-star) — transitive closure, so
    // A~B, B~C lands A,B,C in ONE cluster even when A~C was never a
    // pair. Oracle: DuckDB replays the pairs, then a recursive CTE
    // computes reachability and takes the component min.
    "q_dedup_clusters" -> ((s, dir) => {
      val pairs = Dedup.minhashDedup(s.read.parquet(t(dir, "documents")),
        "doc_id", "text", threshold = 0.5,
        baseHash = TextAnalysis.portableHash60)
      Dedup.connectedComponents(pairs, "id_a", "id_b")
        .withColumnRenamed("id", "doc_id")
    }),

    // the capstone composition: fuzzy dedup (minhash pairs → CC →
    // one survivor per cluster) then the deterministic training
    // permutation over the survivors — "prepare this corpus for
    // training" as ONE oracle-certified query
    "q_dedup_shuffle" -> ((s, dir) => {
      val survivors = Dedup.fuzzyDedup(
        s.read.parquet(t(dir, "documents")), "doc_id", "text",
        threshold = 0.5, baseHash = TextAnalysis.portableHash60)
      Assemble.shuffleShards(survivors, "doc_id", shards = 16)
        .withColumnRenamed("id", "doc_id")
    }),

    // quality-aware fuzzy dedup (the Dolma/FineWeb survivor rule):
    // within each near-dup cluster keep the LONGEST doc (token
    // count), ties by lowest id — instead of min-id
    "q_dedup_best" -> ((s, dir) => {
      val d = s.read.parquet(t(dir, "documents"))
      Dedup.fuzzyDedupBest(d, "doc_id", "text",
        metric = TextAnalysis.wsTokenCount(col("text")).cast("long"),
        threshold = 0.5, baseHash = TextAnalysis.portableHash60)
        .select(col("doc_id"), col("n_chars"))
    }),

    // deterministic corpus shuffle-and-shard: reproducible training
    // permutation with no global sort — hash-mod shard, row_number
    // within shard on (hash, id)
    "q_shuffle_shards" -> ((s, dir) =>
      Assemble.shuffleShards(
        s.read.parquet(t(dir, "documents")), "doc_id", shards = 64)
        .withColumnRenamed("id", "doc_id")),

    // LSH bucket-skew pre-flight: per band, bucket counts and the
    // EXACT candidate-pair volume the banded self-join would generate
    // — the number that predicts (and would flag) a degenerate-bucket
    // blowup before a 100 TB dedup run
    "q_lsh_skew" -> ((s, dir) =>
      Dedup.lshBucketStats(s.read.parquet(t(dir, "documents")),
        "doc_id", "text", baseHash = TextAnalysis.portableHash60)),

    // duplicate-passage annotation per document (Dolma-style quality
    // signal): fraction of each doc's 32-token chunks that appear in
    // at least one OTHER document
    "q_dup_chunks" -> ((s, dir) =>
      TextAnalysis.dupChunkStats(
        s.read.parquet(t(dir, "documents")), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")),

    // winnowing (MOSS) shared-substring report: fingerprints present
    // in >1 doc — guaranteed to fire for any shared token run of
    // length >= k + window - 1 = 11, at any offsets
    "q_winnow_dup" -> ((s, dir) => {
      val fps = TextAnalysis.winnowFingerprints(
        s.read.parquet(t(dir, "documents")), "doc_id", "text")
      fps.groupBy(col("fp")).agg(
          count(lit(1)).as("n_docs"),
          min(col("id")).as("min_doc"), max(col("id")).as("max_doc"))
        .filter(col("n_docs") > 1)
    }),

    // shift-robust duplicate-passage annotation: token-weighted dup
    // fraction over content-defined chunks (catches offset-shifted
    // shared passages that fixed-position chunks miss)
    "q_dup_chunks_cdc" -> ((s, dir) =>
      TextAnalysis.dupCdcStats(
        s.read.parquet(t(dir, "documents")), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")),

    // exact duplicated-span annotation (Lee et al. 2022 / Dolma
    // exact-substring signal): maximal cross-doc repeated runs of
    // >= 13 tokens, with exact per-doc token coverage in integer ppm
    "q_span_dedup" -> ((s, dir) =>
      TextAnalysis.dupSpanStats(
        s.read.parquet(t(dir, "documents")), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")),

    // the REMOVAL half of cross-doc substring dedup (Lee et al. 2022
    // — the operation, not just the statistic): every 13-gram shared
    // across documents keeps its globally-first occurrence (min
    // (doc_id, position)); every other occurrence's token range is
    // cut (islands merge overlaps) and the document re-assembles
    // from surviving tokens — the oracle rebuilds every scrubbed
    // byte independently
    "q_span_scrub" -> ((s, dir) =>
      TextAnalysis.scrubDupSpans(
        s.read.parquet(t(dir, "documents")), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")),

    // the full Gopher rule battery (Rae et al. 2021, Table A1):
    // per-doc quality signals + the composite pass flag, every
    // fraction rounded before comparison so the flag replays exactly
    "q_gopher_rules" -> ((s, dir) =>
      TextAnalysis.gopherRules(
        s.read.parquet(t(dir, "documents")), "doc_id", "text",
        minWords = 20L)
        .withColumnRenamed("id", "doc_id")),

    // the full Gopher REPETITION battery (Rae et al. 2021, Table A1
    // bottom half): duplicate-line / duplicate-line-char fractions,
    // top-{2,3,4}-gram char fractions, duplicate-{5..10}-gram char
    // fractions with exact overlap-free island coverage — every
    // fraction a truncating integer ppm, so the rows replay exactly
    "q_gopher_repetition" -> ((s, dir) =>
      TextAnalysis.gopherRepetition(
        s.read.parquet(t(dir, "documents")), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")),

    // hashed-bag-of-words linear classifier scoring (the fastText
    // quality-gate shape): token → hash bucket → deterministic
    // weight; exact-integer keep decision, engine-replayable
    "q_quality_classifier" -> ((s, dir) =>
      TextAnalysis.hashedClassifierScore(
        s.read.parquet(t(dir, "documents")), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")),

    // per-language length-outlier cut (z-score > 2): tiny sufficient-
    // statistics aggregate broadcast back over one more narrow pass;
    // the flag decision is exact integer-derived DOUBLE arithmetic,
    // so the oracle replays it bit-for-bit (no FP mean/stddev)
    "q_zscore_outliers" -> ((s, dir) =>
      TextAnalysis.lengthOutliers(
        s.read.parquet(t(dir, "documents")), "lang", "n_chars",
        nSigma = 2)
        .withColumnRenamed("grp", "lang")),

    // CCNet-style perplexity bucketing: per-language head/middle/tail
    // thirds by exact-integer mean unigram surprisal, split with
    // ntile over a total order — no FP in the bucket decision
    "q_ppl_buckets" -> ((s, dir) =>
      Assemble.pplBuckets(
        s.read.parquet(t(dir, "documents")), "doc_id", "text", "lang")
        .withColumnRenamed("id", "doc_id")),

    // the 100 TB shape of q_ppl_buckets, oracle-certified: split on
    // approx_percentile cutoffs over the salted unique key instead of
    // the per-language ntile funnel. Below the sketch's compression
    // threshold (2·n/accuracy < 1 — gate languages hold ≤ 218 docs at
    // accuracy 10000) the cutoff is provably the element at rank
    // ceil(p·n), which DuckDB replays as an exact rank selection —
    // same contract as q_percentile_approx.
    "q_ppl_buckets_approx" -> ((s, dir) =>
      Assemble.pplBucketsApprox(
        s.read.parquet(t(dir, "documents")), "doc_id", "text", "lang")
        .withColumnRenamed("id", "doc_id")),

    // encoding-damage signals: U+FFFD replacement chars + C0 control
    // chars (minus tab/LF/CR). The corpus is clean, so deterministic
    // damage is injected by doc_id (the synthetic-input convention
    // the PII query uses) — the gate verifies real detections.
    "q_encoding" -> ((s, dir) => {
      val d = s.read.parquet(t(dir, "documents")).select(col("doc_id"),
        concat(col("text"),
          when(pmod(col("doc_id"), lit(7)) === 0, lit("�"))
            .otherwise(lit("")),
          when(pmod(col("doc_id"), lit(5)) === 0, expr("chr(7)"))
            .otherwise(lit(""))).as("text"))
      TextAnalysis.encodingSignals(d, "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
    }),

    // binary-level exact media dedup: group blobs by sha256 from the
    // metadata projection (bytes never shuffle — only the 64-char
    // digest does), count copies, keep min media_id; the standard
    // first pass over any image/audio corpus
    "q_media_dedup" -> ((s, dir) => {
      val d = s.read.parquet(t(dir, "documents"))
      // every doc_id ≡ 7 (mod 10) carries the BYTES of doc_id − 7 —
      // deterministic exact-duplicate blobs for the dedup to find
      val dup = d.select(col("doc_id"),
        when(pmod(col("doc_id"), lit(10)) === 7, col("doc_id") - 7)
          .otherwise(col("doc_id")).as("src_id"))
        .join(d.select(col("doc_id").as("b_id"), col("text").as("b_text")),
          col("src_id") === col("b_id"))
        .select(col("doc_id"), col("b_text").as("text"))
      val media = Multimodal.synthesize(dup, "doc_id", "text")
      Multimodal.withMeta(media)
        .groupBy(col("meta.sha256").as("sha"))
        .agg(count(lit(1)).as("n_copies"),
          min(col("media_id")).as("keeper_id"))
    }),

    // sharded JSONL export → re-ingest round trip: per-shard counts +
    // content hashes computed from the RE-READ lines must equal the
    // oracle's over the parquet original — JSON escaping (newlines,
    // quotes, unicode) must round-trip byte-exactly for the hashes
    // to meet
    "q_export_jsonl" -> ((s, dir) => {
      val docs = s.read.parquet(t(dir, "documents"))
        .select(col("doc_id"), col("text"), col("lang"),
          pmod(col("doc_id"), lit(8L)).as("shard"))
      val work = tempStateDir()
      Assemble.exportJsonl(docs, s"$work/jsonl")
      // explicit schema: an all-empty export has no lines to infer
      // from (and names the shard partition column's type)
      s.read.schema("doc_id LONG, text STRING, lang STRING, shard LONG")
        .json(s"$work/jsonl")
        .groupBy(col("shard").cast("long").as("shard"))
        .agg(count(lit(1)).as("n"),
          sum(pmod(TextAnalysis.portableHash60(col("text")),
            lit(1000003L))).as("h_sum"),
          min(col("doc_id")).as("min_id"),
          max(col("doc_id")).as("max_id"))
    }),

    // URL/domain gate over synthetic-but-well-formed URLs derived
    // from the doc_id (host rotation incl. blocked domains and
    // IP-literal hosts, id-dependent path depth, periodic query
    // strings) — parse_url on the engine side, regexp replay in the
    // oracle, agreement certified by the hash gate
    "q_url_filter" -> ((s, dir) => {
      val d = s.read.parquet(t(dir, "documents")).select(col("doc_id"),
        concat(lit("https://"),
          when(pmod(col("doc_id"), lit(11)) === 3,
            concat(lit("10.0.0."), pmod(col("doc_id"), lit(256))))
            .otherwise(element_at(array(
              lit("example.com"), lit("blog.example.com"),
              lit("spam.bad"), lit("news.site"), lit("files.host")),
              (pmod(col("doc_id"), lit(5)) + 1).cast("int"))),
          lit("/d"), col("doc_id"),
          repeat(lit("/s"), pmod(col("doc_id"), lit(3)).cast("int")),
          when(pmod(col("doc_id"), lit(7)) === 0,
            concat(lit("?q="), pmod(col("doc_id"), lit(13))))
            .otherwise(lit(""))).as("url"))
      TextAnalysis.urlSignals(d, "doc_id", "url",
        Seq("spam.bad", "files.host"))
        .withColumnRenamed("id", "doc_id")
    }),

    // Unicode NFC normalization signals (native codegen'd
    // nfc_normalize): decomposed sequences injected by doc_id
    // convention (e + U+0301, A + U+030A), plus a precomposed é as
    // the negative control — composed and decomposed forms must end
    // at the SAME post-NFC fingerprint
    "q_nfc_normalize" -> ((s, dir) => {
      val d = s.read.parquet(t(dir, "documents")).select(col("doc_id"),
        concat(col("text"),
          when(pmod(col("doc_id"), lit(3)) === 0, lit("e\u0301"))
            .otherwise(lit("")),
          when(pmod(col("doc_id"), lit(4)) === 0, lit("A\u030A"))
            .otherwise(lit("")),
          when(pmod(col("doc_id"), lit(11)) === 0, lit("\u00e9"))
            .otherwise(lit(""))).as("text"))
      TextAnalysis.nfcSignals(d, "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
    }),

    // per-document character-distribution entropy in exact integer
    // micro-nats (gibberish / degenerate-text signal)
    "q_char_entropy" -> ((s, dir) =>
      TextAnalysis.charEntropy(
        s.read.parquet(t(dir, "documents")), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")),

    // C4 line-level cleaning: keep lines ending in terminal
    // punctuation with >= minWords words and no boilerplate markers;
    // doc survives with >= minKeptLines lines. The oracle replays the
    // cleaned TEXT byte-for-byte. Documents are single-line prose, so
    // minWords=5/minKeptLines=1 exercises both keep and drop paths.
    "q_c4_lines" -> ((s, dir) =>
      TextAnalysis.c4LineFilter(
        s.read.parquet(t(dir, "documents")), "doc_id", "text",
        minWords = 5, minKeptLines = 1)
        .withColumnRenamed("id", "doc_id")),

    // ── the fused single-pass quality annotator: every gate signal
    // (gopher rules, repetition, entropy, encoding, C4 lines, URL)
    // + composite keep in ONE corpus scan, ZERO shuffles — the
    // production 100 TB shape (six scans fused to one; the two
    // formerly-shuffling signals re-expressed as per-row sorted-array
    // folds). Same damage/URL injection conventions as the
    // individual rows; oracle = the join of the six replays. ──
    "q_quality_fused" -> ((s, dir) => {
      val d = s.read.parquet(t(dir, "documents"))
        .select(col("doc_id"), col("text"),
          concat(col("text"),
            when(pmod(col("doc_id"), lit(7)) === 0, lit("�"))
              .otherwise(lit("")),
            when(pmod(col("doc_id"), lit(5)) === 0, expr("chr(7)"))
              .otherwise(lit(""))).as("enc_text"),
          concat(lit("https://"),
            when(pmod(col("doc_id"), lit(11)) === 3,
              concat(lit("10.0.0."), pmod(col("doc_id"), lit(256))))
              .otherwise(element_at(array(
                lit("example.com"), lit("blog.example.com"),
                lit("spam.bad"), lit("news.site"), lit("files.host")),
                (pmod(col("doc_id"), lit(5)) + 1).cast("int"))),
            lit("/d"), col("doc_id"),
            repeat(lit("/s"), pmod(col("doc_id"), lit(3)).cast("int")),
            when(pmod(col("doc_id"), lit(7)) === 0,
              concat(lit("?q="), pmod(col("doc_id"), lit(13))))
              .otherwise(lit(""))).as("url"))
      TextAnalysis.annotateQuality(d, "doc_id", "text",
        encTextCol = "enc_text", urlCol = "url",
        blockedDomains = Seq("spam.bad", "files.host"),
        gopherMinWords = 20L, c4MinWords = 5, c4MinKeptLines = 1)
        .withColumnRenamed("id", "doc_id")
    }),

    // BPE training, round-1 scoring: weighted adjacent-char-pair
    // counts over the word-type table (the corpus-scale part of
    // tokenizer training; the iterative merge loop is bpeTrain,
    // spec-verified against a hand-computed Sennrich example)
    "q_bpe_pairs" -> ((s, dir) =>
      Assemble.bpePairCounts(
        s.read.parquet(t(dir, "documents")), "doc_id", "text",
        minCount = 5L)),

    // per-document OOV rate against the corpus's own top-100 vocab
    // (tokenizer-coverage signal); vocab selection is a total order —
    // count desc, token asc — so every engine picks the same vocab
    "q_oov_rate" -> ((s, dir) =>
      Assemble.oovRate(
        s.read.parquet(t(dir, "documents")), "doc_id", "text", topN = 100)
        .withColumnRenamed("id", "doc_id")),

    // element-wise mean pooling of embeddings per label (chunk→doc /
    // class-prototype reduction): exact integer micro-units before
    // the sum, one flat row per (label, dim)
    "q_embed_meanpool" -> ((s, dir) =>
      Similarity.meanPoolDims(
        s.read.parquet(t(dir, "embeddings")), "label")
        .withColumnRenamed("g", "label")),

    // the C4-style corpus cleanup, composed end to end: language
    // filter → quality gate → exact dedup (keep min id per
    // fingerprint) — the flagship training-data pipeline shape,
    // oracle-checked as one query
    "q_corpus_clean" -> ((s, dir) => {
      val scored = TextAnalysis.analyze(s.read.parquet(t(dir, "documents")))
      val kept = scored.filter(
        col("lang_guess") === "en" && col("quality") >= 0.5)
      val w = Window.partitionBy(col("fingerprint")).orderBy(col("doc_id"))
      kept.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col("doc_id"), col("lang_guess"), col("quality"),
          col("n_tokens_ws"))
    }),

    // order-aware rolling content hash over portable token hashes —
    // oracle-checked: DuckDB replays the exact polynomial fold
    "q_text_rolling" -> ((s, dir) =>
      s.read.parquet(t(dir, "documents"))
        .select(col("doc_id"),
          TextAnalysis.rollingHash(col("text")).as("rolling_hash"))),

    // brute-force cosine similarity pairs over embeddings
    "q_embed_cosine" -> ((s, dir) => {
      val e = s.read.parquet(t(dir, "embeddings"))
      Similarity.bruteForcePairs(
        e, e.filter(col("vec_id") % 100 === 0), 0.3)
    }),

    // embedding-cosine near-dup dedup: drop the higher id of every
    // pair above threshold (greedy, deterministic; oracle-checked).
    // Pair generation is the bucketed multi-probe IVF join — no
    // corpus broadcast, no all-pairs nested loop; nProbe=6/16 is
    // pinned to exact recall on this corpus by SimilaritySpec + the
    // DuckDB oracle (which recomputes the pairs exhaustively).
    "q_embed_dedup" -> ((s, dir) => {
      val e = s.read.parquet(t(dir, "embeddings"))
      // exact-dup pre-collapse: the cell self-join runs on unique
      // vectors only — duplicate CLIQUES (the dominant shape in a
      // re-crawled corpus) contribute linear rep edges instead of
      // quadratic pairs; the survivor set is provably identical
      val pairs = Similarity.pairGraphCollapsed(
        e, 0.4, nCells = 16, nProbe = 6)
      e.join(pairs.select(col("n_id").as("vec_id")).distinct(),
          Seq("vec_id"), "left_anti")
        .select(col("vec_id"), col("label"))
    }),

    // SemDeDup (Abbas et al. 2023): semantic dedup where each
    // near-dup component keeps the member FARTHEST from its centroid
    // (lowest cosine — the paper's diversity-preserving survivor
    // rule) — centroid from exact integer micro-sums, similarities
    // as fixed-order folds, so the keeper rank replays exactly
    "q_semdedup" -> ((s, dir) =>
      Similarity.semDedup(
        s.read.parquet(t(dir, "embeddings")), 0.4,
        nCells = 16, nProbe = 6)),

    // semantic near-dup CLUSTERS: connected components over the
    // collapsed embedding pair graph (same IVF settings as
    // q_embed_dedup, whose exact recall is spec-pinned; exact-dup
    // members enter through rep edges — components unchanged);
    // oracle recomputes pairs exhaustively and closes them
    // recursively
    "q_embed_clusters" -> ((s, dir) => {
      val e = s.read.parquet(t(dir, "embeddings"))
      val pairs = Similarity.pairGraphCollapsed(
        e, 0.4, nCells = 16, nProbe = 6)
      Dedup.connectedComponents(pairs, "q_id", "n_id")
        .withColumnRenamed("id", "vec_id")
    }),

    // MinHash LSH near-dedup over md5-derived (portable) seeded
    // hashes — oracle-checked: DuckDB recomputes the signatures,
    // band candidates, and true-Jaccard verification end to end
    "q_minhash_dedup" -> ((s, dir) =>
      Dedup.minhashDedup(s.read.parquet(t(dir, "documents")),
        "doc_id", "text", threshold = 0.5,
        baseHash = TextAnalysis.portableHash60)),

    // incremental dedup: today's batch (odd ids) LSH-paired against
    // the accumulated corpus (even ids) — candidate volume scales
    // with the batch, the corpus never self-compares
    "q_minhash_incremental" -> ((s, dir) => {
      val d = s.read.parquet(t(dir, "documents"))
      Dedup.minhashPairsAgainst(
        d.filter(col("doc_id") % 2 === 1),
        d.filter(col("doc_id") % 2 === 0),
        "doc_id", "text", threshold = 0.5,
        baseHash = TextAnalysis.portableHash60)
    }),

    // SimHash near-dup pairs at hamming ≤ 8 over a 60-bit portable
    // signature; 9-segment pigeonhole blocking is exact at radius 8.
    // Oracle-checked: DuckDB replays the signature bit votes and
    // verifies all pairs via bit_count(xor(...))
    "q_simhash_pairs" -> ((s, dir) =>
      Dedup.simhashPairs(s.read.parquet(t(dir, "documents")),
        "doc_id", "text", maxHamming = 8, bits = 60,
        hashFn = TextAnalysis.portableHash60)),

    // n-gram Jaccard near-dup pairs blocked by length bucket
    // (near-dups have near-equal length; oracle-checked)
    "q_ngram_jaccard" -> ((s, dir) => {
      val d = s.read.parquet(t(dir, "documents"))
      Dedup.ngramJaccardPairs(d, "doc_id", "text",
        blockCol = floor(length(col("text")) / 50), threshold = 0.5, n = 3)
    }),

    // LSH-bucketed ANN top-k — oracle-checked: probeRadius=3 is
    // pinned to EXACT agreement with the exhaustive top-5 on this
    // corpus (RecallProbe), so the DuckDB oracle recomputes the
    // brute-force answer; sub-exhaustive production probing
    // (radius 1-2) is recall-pinned by ExtSpec
    "q_ann_lsh" -> ((s, dir) => {
      val e = s.read.parquet(t(dir, "embeddings"))
      Similarity.lshTopK(e, e.filter(col("vec_id") % 100 === 0),
        k = 5, nPlanes = 4, probeRadius = 3)
    }),

    // metadata-FILTERED vector search: neighbors must satisfy a
    // metadata predicate (label < 5) — the pre-filter strategy, where
    // the predicate prunes the corpus BEFORE any scoring (at scale it
    // pushes to the parquet scan; the post-filter alternative scores
    // everything then discards, losing k-coverage under selective
    // predicates). Exact top-5 within the filtered corpus, so the
    // DuckDB oracle replays it with the same predicate
    "q_ann_filtered" -> ((s, dir) => {
      val e = s.read.parquet(t(dir, "embeddings"))
      Similarity.bruteForceTopK(
        e.filter(col("label") < 5),
        e.filter(col("vec_id") % 100 === 0), k = 5)
    }),

    // SEMANTIC decontamination (the embedding-level counterpart of
    // the n-gram q_contamination rows): every held-out vector (label
    // >= 8) annotated with how many train vectors sit above cosine
    // 0.5 and the closest one — the eval-leakage audit run before a
    // benchmark score is trusted. Train side scans, held-out side
    // broadcasts; past broadcastable sizes the pair generator swaps
    // for the bucketed IVF join (q_embed_dedup's path)
    "q_semantic_leakage" -> ((s, dir) => {
      val e = s.read.parquet(t(dir, "embeddings"))
      val test = e.filter(col("label") >= 8)
      val pairs = Similarity.bruteForcePairs(
        e.filter(col("label") < 8), test, 0.5)
      val hits = pairs.groupBy(col("q_id"))
        .agg(count(lit(1)).as("n_hits"), max(col("sim")).as("max_sim"))
      test.select(col("vec_id").as("q_id"))
        .join(hits, Seq("q_id"), "left")
        .select(col("q_id"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"),
          col("max_sim"),
          col("n_hits").isNotNull.cast("long").as("leaked"))
    }),

    // MMR diversified top-3 over the 10 nearest candidates (λ=0.7):
    // the greedy diversity re-rank after similarity search — cost
    // bounded by |queries|·kCand², independent of corpus size.
    // Oracle-checked: DuckDB unrolls the same greedy steps over the
    // same rounded sims
    "q_mmr_rerank" -> ((s, dir) => {
      val e = s.read.parquet(t(dir, "embeddings"))
      Similarity.mmrTopK(e, e.filter(col("vec_id") % 100 === 0),
        kCand = 10, k = 3, lambdaMilli = 700)
    }),

    // Trained-centroid IVF ANN: k-means centroids from a
    // deterministic sample, corpus in its nearest cell — oracle-
    // checked: nProbe=7 of 8 cells is pinned to EXACT agreement with
    // the exhaustive top-5 on this corpus (RecallProbe); production
    // probe fractions are recall-pinned by ExtSpec
    "q_ann_ivf_trained" -> ((s, dir) => {
      val e = s.read.parquet(t(dir, "embeddings"))
      val cents = Similarity.trainCentroids(e, nCells = 8)
      Similarity.ivfTopKTrained(e, e.filter(col("vec_id") % 100 === 0),
        k = 5, cents, nProbe = 7)
    }),

    // PQ/ADC ANN with exact refine: corpus compressed to m one-byte
    // codes per vector (deterministic per-subspace k-means
    // codebooks); the full ADC scan runs over the COMPRESSED corpus,
    // then only |queries|·shortlist full vectors are re-ranked
    // exactly. Oracle-checked: shortlist=50 (of a ~640-vector
    // corpus — genuinely sub-exhaustive) re-ranks to EXACT agreement
    // with the exhaustive top-5 (RecallProbe), so the DuckDB oracle
    // recomputes the brute-force answer
    "q_ann_pq" -> ((s, dir) => {
      val e = s.read.parquet(t(dir, "embeddings"))
      val cbs = Similarity.trainPqCodebooks(e, m = 16, k = 32)
      val codes = Similarity.pqEncode(e, cbs)
      Similarity.pqTopKRefined(codes, e,
        e.filter(col("vec_id") % 100 === 0), cbs, k = 5, shortlist = 50)
    }),

    // ── Persisted ANN index (build / refresh / probe split): build
    // trains + encodes a PERTURBED initial corpus into on-disk index
    // tables (manifest-committed); a ChangeSet then drives an
    // incremental refresh to the final corpus (re-encode only the
    // delta, model tables untouched); the returned frame is the
    // PROBE-ONLY query — no training or corpus-encode stage in its
    // plan, just index-table scans. nProbe = nCells pins total cell
    // coverage (the q_ann_ivf convention: the gate certifies the
    // persistence/refresh/probe plumbing; sub-exhaustive recall is
    // the recall-pinned in-query rows' business); ADC shortlist =
    // 100 of the 400-vector final corpus stays genuinely
    // sub-exhaustive with exact re-rank from stored vectors (the
    // stale model's worst true-top-5 ADC rank is 59 — RecallProbe-
    // style margin ~1.7×). Oracle: brute-force top-5 over the final
    // corpus. ──
    "q_ann_persisted" -> ((s, dir) => {
      val e = s.read.parquet(t(dir, "embeddings"))
      val root = tempStateDir() + "/annidx"
      // initial corpus: %7!=0 rows plus the to-be-removed %5=4
      // slice; %3=0 vectors are STALE (reversed) until their update
      val initial = e.filter(col("vec_id") % 7 =!= 0)
        .select(col("vec_id"),
          when(col("vec_id") % 3 === 0, reverse(col("embedding")))
            .otherwise(col("embedding")).as("embedding"),
          lit(1L).as("version"))
      graft.ext.VectorIndex.build(s, initial, root,
        nCells = 8, m = 16, k = 32)
      // sync source = final corpus: %5!=4, true vectors, version
      // bumped on the stale rows
      val source = e.filter(col("vec_id") % 5 =!= 4)
        .select(col("vec_id").cast("string").as("id"),
          when(col("vec_id") % 3 === 0, lit(2L)).otherwise(lit(1L))
            .as("version"),
          col("embedding"))
      val cs = Diff.computeDataChanges(
        Records.keyRecords(source, "id", Some("version")),
        initial.select(col("vec_id").cast("string").as("id"),
          col("version")))
      val changed = cs.added.select(col("id"), col("embedding"))
        .unionByName(cs.updated.select(col("id"), col("embedding")))
        .select(col("id").cast("long").as("vec_id"), col("embedding"))
      val dropped = cs.removedIds.unionByName(cs.updated.select(col("id")))
        .select(col("id").cast("long").as("id"))
      graft.ext.VectorIndex.refresh(s, root, changed, dropped)
      val queries = e.filter(col("vec_id") % 100 === 0 &&
        col("vec_id") % 5 =!= 4)
      graft.ext.VectorIndex.probe(s, root, queries,
        k = 5, nProbe = 8, shortlist = 100)
    }),

    // ── SERVING latency of the persisted index, separated from its
    // construction: q_ann_persisted times build + ChangeSet refresh +
    // probe in one row (8.9 s in-suite r13 — almost all index
    // construction); this row probes an ALREADY-COMMITTED index over
    // the same final corpus (built once per dir via a harness memo,
    // so the bench's min-of-3 reports pure probe reps). The plan has
    // no training/encode stages — model-table reads + the
    // cell-pruned ADC scan + exact re-rank. Same oracle as
    // q_ann_persisted: exhaustive top-5 over the final corpus. ──
    "q_ann_probe" -> ((s, dir) => {
      val root = annProbeIndex(s, dir)
      val e = s.read.parquet(t(dir, "embeddings"))
      val queries = e.filter(col("vec_id") % 100 === 0 &&
        col("vec_id") % 5 =!= 4)
      graft.ext.VectorIndex.probe(s, root, queries,
        k = 5, nProbe = 8, shortlist = 100)
    }),

    // IVF-style ANN: corpus in its nearest seed cell, queries probe
    // cells in projection order. Oracle-checked at TOTAL coverage
    // (nProbe = nCells): the data-blind seed cells never reach exact
    // recall sub-exhaustively (RecallProbe: 3 misses even at 7/8),
    // so the gate instead pins the PLUMBING — cell assignment, probe
    // expansion, cell join, rank — which at total coverage must
    // reproduce the exhaustive top-5 at any scale; production
    // sub-exhaustive probing (nProbe=3) is recall-pinned by ExtSpec
    "q_ann_ivf" -> ((s, dir) => {
      val e = s.read.parquet(t(dir, "embeddings"))
      val celled = e.withColumn("cell",
        Similarity.ivfAssign(col("embedding"), nCells = 8))
      val q = e.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
          explode(Similarity.ivfProbe(col("embedding"), 8, 8)).as("cell"))
      val c = celled.select(col("vec_id").as("n_id"),
        col("embedding").as("n_vec"), col("cell"))
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("sim").desc, col("n_id"))
      c.join(q, Seq("cell")).filter(col("q_id") =!= col("n_id"))
        .withColumn("sim", graft.functions.GraftFunctions
          .cosine_sim(col("q_vec"), col("n_vec")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("q_id"), col("n_id"), round(col("sim"), 6).as("sim"),
          col("rank"))
    }),

    // multimodal: binary columns + typed metadata (oracle-checked)
    "q_multimodal_meta" -> ((s, dir) => {
      val media = Multimodal.synthesize(
        s.read.parquet(t(dir, "documents")), "doc_id", "text")
      Multimodal.withMeta(media)
        .select(col("media_id"), col("media_type"),
          col("meta.n_bytes").as("n_bytes"),
          col("meta.sha256").as("sha256"))
    }),

    // multimodal decode plumbing: stubbed codec via mapPartitions
    // (rows-only: the fake feature values are JVM-hash derived)
    // decode stub over mapPartitions batches — oracle-checked: the
    // deterministic fake dimensions derive from the portable 60-bit
    // md5 hash, which DuckDB replays (the real-codec swap point keeps
    // the same schema/batch contract)
    "q_multimodal_decode" -> ((s, dir) => {
      val media = Multimodal.synthesize(
        s.read.parquet(t(dir, "documents")), "doc_id", "text")
      Multimodal.decodeStub(media).toDF()
        .select(col("media_id"), col("media_type"), col("n_bytes"),
          col("width"), col("height"), col("duration_ms"))
    }),

    // frame-sample plan: per-video sampled timestamps exploded from
    // METADATA only (frame bytes never materialize); durations come
    // from the portable-hash decode stub, so the oracle replays the
    // exact sampled grid
    "q_multimodal_frames" -> ((s, dir) => {
      val media = Multimodal.synthesize(
        s.read.parquet(t(dir, "documents")), "doc_id", "text")
      Multimodal.frameSamplePlan(
        Multimodal.decodeStub(media).toDF(), everyMs = 60000L)
    }),

    // aspect-preserving resize plan in exact integer arithmetic
    // (no round-half convention in the contract)
    "q_multimodal_resize" -> ((s, dir) => {
      val media = Multimodal.synthesize(
        s.read.parquet(t(dir, "documents")), "doc_id", "text")
      Multimodal.resizePlan(
        Multimodal.decodeStub(media).toDF(), maxSide = 512)
    }),

    // ── REAL codec tier: one valid binary P6 PPM per document
    // (dimensions + pixel bytes are pure integer arithmetic in the
    // doc_id), decoded by an actual header parser + payload
    // aggregation in the mapPartitions batch shape. The oracle
    // replays every feature — width, height, per-channel sums and
    // floor-milli means — from the id formula without touching the
    // binary, which certifies the decoder read the bytes it was
    // handed. (decodeStub remains the audio/video swap point; this
    // row retires the "codec is only a stub" gap for images.) ──
    "q_multimodal_ppm" -> ((s, dir) => {
      val media = Multimodal.synthesizePpm(
        s.read.parquet(t(dir, "documents")), "doc_id")
      Multimodal.decodePpm(media).toDF()
    }),

    // perceptual near-dup tier for images: REAL P6 decode →
    // 9×8 gradient-sign dHash (exact integer luma/box math) → banded
    // LSH pair join (4×16-bit bands + dims in the block key;
    // pigeonhole-complete for hamming ≤ 3) → bit_count(xor) verify.
    // Every 10th image gets a single-pixel-vandalized twin (id+"v")
    // — a PLANTED hamming≤1 pair the banded join must recover, so
    // the row certifies recall, not just precision.
    "q_image_dhash" -> ((s, dir) => {
      val base = Multimodal.synthesizePpm(
        s.read.parquet(t(dir, "documents")), "doc_id")
      val twins = ImageHash.vandalizeFirstPixel(
        base.filter(col("media_id").cast("long") % 10 === 0), "v")
      ImageHash.dhashPairs(base.unionByName(twins))
    }),

    // the PRODUCTION path of the perceptual tier: pair enumeration is
    // quadratic in duplicate-cluster size (the ~sf1 key-growth smoke
    // measured 3,088 → 517,776 within-cluster pairs for 10× data), so
    // the scale output is a per-image cluster assignment — exact-hash
    // collapse, banded pairing + connected components over the
    // DISTINCT hash table, one join back. Same planted-twin input as
    // the pair row, so recall is certified here too.
    "q_image_dhash_clusters" -> ((s, dir) => {
      val base = Multimodal.synthesizePpm(
        s.read.parquet(t(dir, "documents")), "doc_id")
      val twins = ImageHash.vandalizeFirstPixel(
        base.filter(col("media_id").cast("long") % 10 === 0), "v")
      ImageHash.dhashClusters(base.unionByName(twins))
    }),

    // incremental perceptual ingest, IMAGE tier: today's batch is
    // the single-pixel-vandalized RE-UPLOADS of every 10th image
    // (the realistic ingest case — slightly-edited copies arriving
    // against the accumulated corpus), banded-joined against the
    // full base corpus with no corpus self-comparison. Every batch
    // image has a guaranteed hamming ≤ 1 source, so the row
    // certifies cross-join RECALL, not just precision.
    "q_image_dhash_incremental" -> ((s, dir) => {
      val media = Multimodal.synthesizePpm(
        s.read.parquet(t(dir, "documents")), "doc_id")
      val batch = ImageHash.vandalizeFirstPixel(
        media.filter(col("media_id").cast("long") % 10 === 0), "v")
      ImageHash.dhashPairsAgainst(batch, media)
    }),

    // RE-ENCODE-robust perceptual dedup: the realistic near-dup is a
    // lossy RE-SAVE, not pixel vandalism — every 10th JPEG is decoded
    // (full T.81) and re-encoded at quantScale=4 (different DQT,
    // different entropy bytes ⇒ sha256 dedup misses it), then the
    // re-upload batch is banded-joined against the full JPEG corpus.
    // For the flat-tile corpus the quant-4 round trip is provably
    // pixel-exact (DC error ≤ 4/16 < the 0.5 rounding radius), so
    // the gradient-sign hash survives with hamming 0 BY CONSTRUCTION
    // — the oracle replays every twin's hash as its source's hash
    // from the tile formula and recomputes the full ≤3 pair set.
    "q_image_dhash_reencode" -> ((s, dir) => {
      val media = Multimodal.synthesizeJpeg(
        s.read.parquet(t(dir, "documents")), "doc_id")
      val batch = ImageHash.reencodeJpeg(
        media.filter(col("media_id").cast("long") % 10 === 0), "r",
        quantScale = 4)
      ImageHash.jpegDHashPairsAgainst(batch, media)
    }),

    // the PRODUCTION path for re-encoded corpora (the key-growth
    // smoke read the pair row at 100× output): exact-hash collapse +
    // banded pairing + CC over representatives over the SAME
    // corpus ∪ re-encoded twins — O(n) cluster assignments instead
    // of output-quadratic pair enumeration
    "q_image_dhash_reencode_clusters" -> ((s, dir) => {
      val media = Multimodal.synthesizeJpeg(
        s.read.parquet(t(dir, "documents")), "doc_id")
      val batch = ImageHash.reencodeJpeg(
        media.filter(col("media_id").cast("long") % 10 === 0), "r",
        quantScale = 4)
      ImageHash.jpegDHashClusters(media.unionByName(batch))
    }),

    // audio counterpart of q_multimodal_corrupt: id%7==3 WAVs
    // truncated mid-container; the tolerant RIFF walker emits ok=0
    // casualties and decodes the rest
    "q_wav_corrupt" -> ((s, dir) => {
      val media = Multimodal.synthesizeWav(
          s.read.parquet(t(dir, "documents")), "doc_id")
        .withColumn("content",
          when(pmod(col("media_id").cast("long"), lit(7)) === 3,
            expr("substring(content, 1, 20)"))
            .otherwise(col("content")))
      Multimodal.decodeWavChannel(media).toDF()
    }),

    // lossy-codec counterpart of q_multimodal_corrupt: id%7==5 JFIF
    // streams truncated to 40 bytes (mid-header — before any SOS);
    // the tolerant T.81 channel emits ok=0 casualties and decodes
    // the rest bit-exactly
    "q_jpeg_corrupt" -> ((s, dir) => {
      val media = Multimodal.synthesizeJpeg(
          s.read.parquet(t(dir, "documents")), "doc_id")
        .withColumn("content",
          when(pmod(col("media_id").cast("long"), lit(7)) === 5,
            expr("substring(content, 1, 40)"))
            .otherwise(col("content")))
      Multimodal.decodeJpegChannel(media).toDF()
    }),

    // VIDEO rung of the codec ladder (image→audio→video): real
    // YUV4MPEG2 container walk — stream-header params, per-frame
    // FRAME markers, fixed-stride plane accumulation over BOTH
    // C420jpeg (even ids) and C444 (odd ids) layouts; every decoded
    // feature replays from the id formula
    "q_multimodal_y4m" -> ((s, dir) => {
      val media = Multimodal.synthesizeY4m(
        s.read.parquet(t(dir, "documents")), "doc_id")
      Multimodal.decodeY4m(media).toDF()
    }),

    // VIDEO rung of the perceptual ladder: per-frame luma dHash over
    // the real Y4M container walk, banded LSH on the frame-0 hash,
    // max-over-aligned-frames verification; planted first-luma-byte
    // twins (doc_id%10=0) certify recall through the banded join
    "q_video_dhash" -> ((s, dir) => {
      val base = Multimodal.synthesizeY4m(
        s.read.parquet(t(dir, "documents")), "doc_id")
      val twins = VideoHash.vandalizeFirstLuma(
        base.filter(col("media_id").cast("long") % 10 === 0), "v")
      VideoHash.y4mDhashPairs(base.unionByName(twins))
    }),

    // production path of the video tier (the q_image_dhash_clusters
    // argument): exact frame-signature collapse + CC over
    // representatives — O(n) output where pair enumeration read
    // 16.2M rows at key-growth ~sf1
    "q_video_dhash_clusters" -> ((s, dir) => {
      val base = Multimodal.synthesizeY4m(
        s.read.parquet(t(dir, "documents")), "doc_id")
      val twins = VideoHash.vandalizeFirstLuma(
        base.filter(col("media_id").cast("long") % 10 === 0), "v")
      VideoHash.y4mDhashClusters(base.unionByName(twins))
    }),

    // CLIP-IN-CORPUS video search: 2-frame clips sliced from real
    // Y4M bytes and re-encoded as standalone streams (certifying the
    // container path end to end), located by an exact-key join of
    // 2-frame window keys (dims + both frame hashes — n_frames NOT
    // in the key, so a clip is found inside LONGER videos); clips
    // from id%4==1 videos with >= 2 frames at offset id mod (nf-1)
    "q_video_clip_match" -> ((s, dir) => {
      val media = Multimodal.synthesizeY4m(
        s.read.parquet(t(dir, "documents")), "doc_id")
      val clips = VideoHash.extractClips(
        media.filter(col("media_id").cast("long") % 5 =!= 0 &&
          col("media_id").cast("long") % 4 === 1), 2, "c")
      VideoHash.clipMatches(clips, media)
    }),

    // ── PERSISTED incremental clip-search index, VIDEO tier — the
    // q_audio_clip_incremental scenario over 2-frame window keys:
    // build from a v0 corpus (%7!=0 files, %3==0 carrying STALE
    // video — first luma byte vandalized), then TWO ChangeSet-driven
    // syncs (sync1 adds %7==0 + updates the stale %3==0 to true
    // content via version bump; sync2 removes the %5==4 slice), then
    // probe with REAL extracted 2-frame clips re-encoded through the
    // Y4M container path. The oracle replays the search over the
    // final corpus from the luma formula, so any refresh drift
    // (stale windows surviving, dropped rows missing, duplicated
    // ids) hash-mismatches: refresh ≡ full rebuild, bit-exact.
    // Index: bucket-partitioned by hi0 (mod 16) behind the
    // manifest-logged swap; probes prune to their buckets. ──
    "q_video_clip_incremental" -> ((s, dir) => {
      val media = Multimodal.synthesizeY4m(
        s.read.parquet(t(dir, "documents")), "doc_id")
      val idL = col("media_id").cast("long")
      val root = tempStateDir() + "/vclipidx"
      val stale = VideoHash.vandalizeFirstLuma(
        media.filter(idL % 7 =!= 0 && idL % 3 === 0), "")
      val initial = media.filter(idL % 7 =!= 0 && idL % 3 =!= 0)
        .unionByName(stale)
      VideoHash.buildClipIndex(s, initial, root)
      def keyed(src: DataFrame) =
        Records.keyRecords(src, "id", Some("version"))
      // sync 1: every id, true content, stale files version-bumped
      val src1 = media.select(col("media_id").as("id"),
        when(idL % 3 === 0, 2L).otherwise(1L).as("version"),
        col("content"))
      val st1 = initial.select(col("media_id").as("id"),
        lit(1L).as("version"))
      val cs1 = Diff.computeDataChanges(keyed(src1), st1)
      VideoHash.refreshClipIndex(s, root,
        cs1.added.unionByName(cs1.updated)
          .select(col("id").as("media_id"), col("content")),
        cs1.removedIds.unionByName(cs1.updated.select(col("id"))))
      // sync 2: the %5==4 slice leaves the corpus
      val src2 = media.filter(idL % 5 =!= 4)
        .select(col("media_id").as("id"),
          when(idL % 3 === 0, 2L).otherwise(1L).as("version"),
          col("content"))
      val st2 = media.select(col("media_id").as("id"),
        when(idL % 3 === 0, 2L).otherwise(1L).as("version"))
      val cs2 = Diff.computeDataChanges(keyed(src2), st2)
      VideoHash.refreshClipIndex(s, root,
        cs2.added.unionByName(cs2.updated)
          .select(col("id").as("media_id"), col("content")),
        cs2.removedIds.unionByName(cs2.updated.select(col("id"))))
      val clips = VideoHash.extractClips(
        media.filter(idL % 4 === 1 && idL % 5 =!= 0 && idL % 5 =!= 4),
        2, "c")
      VideoHash.searchClipIndex(s, root, clips)
    }),

    // incremental perceptual ingest, VIDEO tier: the vandalized
    // re-uploads of every 10th video banded-joined (frame-0 hash)
    // against the full corpus, aligned-frame max verification —
    // closes the pairs/clusters/incremental × image/video/audio
    // matrix; guaranteed hamming ≤ 1 sources certify recall
    "q_video_dhash_incremental" -> ((s, dir) => {
      val media = Multimodal.synthesizeY4m(
        s.read.parquet(t(dir, "documents")), "doc_id")
      val batch = VideoHash.vandalizeFirstLuma(
        media.filter(col("media_id").cast("long") % 10 === 0), "v")
      VideoHash.y4mDhashPairsAgainst(batch, media)
    }),

    // video casualties: id%7==4 streams truncated to 15 bytes (mid
    // stream-header); the tolerant channel emits ok=0 and decodes
    // the rest exactly
    "q_y4m_corrupt" -> ((s, dir) => {
      val media = Multimodal.synthesizeY4m(
          s.read.parquet(t(dir, "documents")), "doc_id")
        .withColumn("content",
          when(pmod(col("media_id").cast("long"), lit(7)) === 4,
            expr("substring(content, 1, 15)"))
            .otherwise(col("content")))
      Multimodal.decodeY4mChannel(media).toDF()
    }),

    // AUDIO rung of the perceptual ladder (images → video → audio):
    // real RIFF walk → channel-0 lag-1 |diff| envelope over 65 integer
    // time boxes → 64 sign-of-envelope-delta bits (Haitsma-Kalker
    // 2002 restated in exact integers) → banded LSH pair join
    // (4×16-bit bands + format params in the block key;
    // pigeonhole-complete for hamming ≤ 3) → bit_count(xor) verify.
    // Every 10th file gets a first-sample-zeroed twin (id+"v") — a
    // PLANTED hamming≤1 pair the banded join must recover, so the
    // row certifies recall, not just precision.
    "q_audio_fp" -> ((s, dir) => {
      val base = Multimodal.synthesizeWav(
        s.read.parquet(t(dir, "documents")), "doc_id")
      val twins = AudioHash.vandalizeFirstSample(
        base.filter(col("media_id").cast("long") % 10 === 0), "v")
      AudioHash.wavFpPairs(base.unionByName(twins))
    }),

    // production path of the audio tier (the q_image_dhash_clusters
    // argument): exact-fingerprint collapse + CC over representatives
    // — O(n) output where pair enumeration is quadratic in
    // duplicate-clique size
    "q_audio_fp_clusters" -> ((s, dir) => {
      val base = Multimodal.synthesizeWav(
        s.read.parquet(t(dir, "documents")), "doc_id")
      val twins = AudioHash.vandalizeFirstSample(
        base.filter(col("media_id").cast("long") % 10 === 0), "v")
      AudioHash.wavFpClusters(base.unionByName(twins))
    }),

    // incremental perceptual ingest: today's batch (id%3==0)
    // banded-joined against the accumulated corpus (id%3!=0) — the
    // q_minhash_incremental shape for the audio tier: candidate
    // volume scales with the batch, the corpus never self-compares.
    // (An even/odd split would be vacuous here: the synthetic channel
    // count is 1 + id%2, so opposite parities never share a format
    // block — %3 mixes both parities on both sides.)
    "q_audio_fp_incremental" -> ((s, dir) => {
      val media = Multimodal.synthesizeWav(
        s.read.parquet(t(dir, "documents")), "doc_id")
      AudioHash.wavFpPairsAgainst(
        media.filter(col("media_id").cast("long") % 3 === 0),
        media.filter(col("media_id").cast("long") % 3 =!= 0))
    }),

    // CLIP-IN-CORPUS audio search (Haitsma-Kalker block search): a
    // sliding-window sub-fingerprint index over every file (32-bit
    // envelope fp + positional checksum per aligned offset; ~28-byte
    // rows, bytes never shuffle), probed by REAL extracted clips —
    // frames [id%7, id%7+32) sliced and re-encoded as standalone
    // RIFF/WAVE, so a match certifies the byte-level codec path end
    // to end while the oracle replays the clip key as the source
    // window key at the extraction offset
    "q_audio_clip_match" -> ((s, dir) => {
      val media = Multimodal.synthesizeWav(
        s.read.parquet(t(dir, "documents")), "doc_id")
      val clips = AudioHash.extractClips(
        media.filter(col("media_id").cast("long") % 5 === 0), 32, "c")
      AudioHash.clipMatches(clips, media)
    }),

    // ── PERSISTED incremental clip-search index: the window-
    // fingerprint table is the corpus-scale artifact (rows ∝ total
    // duration), so it must refresh from ChangeSet deltas, not
    // rebuild per query. Build from a v0 corpus (%7!=0 files, %3==0
    // carrying STALE audio — first sample zeroed), then TWO
    // ChangeSet-driven syncs: sync1 adds the %7==0 files and updates
    // the stale %3==0 ones to true content (version bump drives the
    // diff); sync2 removes the %5==4 slice. The probe then searches
    // REAL extracted clips (%5==0 sources, offset id%7) against the
    // refreshed index — the oracle replays the search over the final
    // corpus from the sample formula, so any refresh drift (stale
    // windows surviving, dropped rows missing, duplicated ids) would
    // hash-mismatch: refresh ≡ full rebuild, bit-exact. Index layout:
    // bucket-partitioned by fp (mod 16) behind a manifest-logged
    // whole-dir swap; the probe's bucket key joins the partition
    // column, so partition pruning narrows the scan. ──
    "q_audio_clip_incremental" -> ((s, dir) => {
      val media = Multimodal.synthesizeWav(
        s.read.parquet(t(dir, "documents")), "doc_id")
      val idL = col("media_id").cast("long")
      val root = tempStateDir() + "/clipidx"
      val stale = AudioHash.vandalizeFirstSample(
        media.filter(idL % 7 =!= 0 && idL % 3 === 0), "")
      val initial = media.filter(idL % 7 =!= 0 && idL % 3 =!= 0)
        .unionByName(stale)
      AudioHash.buildClipIndex(s, initial, root)
      def keyed(src: DataFrame) =
        Records.keyRecords(src, "id", Some("version"))
      // sync 1: every id, true content, stale files version-bumped
      val src1 = media.select(col("media_id").as("id"),
        when(idL % 3 === 0, 2L).otherwise(1L).as("version"),
        col("content"))
      val st1 = initial.select(col("media_id").as("id"),
        lit(1L).as("version"))
      val cs1 = Diff.computeDataChanges(keyed(src1), st1)
      AudioHash.refreshClipIndex(s, root,
        cs1.added.unionByName(cs1.updated)
          .select(col("id").as("media_id"), col("content")),
        cs1.removedIds.unionByName(cs1.updated.select(col("id"))))
      // sync 2: the %5==4 slice leaves the corpus
      val src2 = media.filter(idL % 5 =!= 4)
        .select(col("media_id").as("id"),
          when(idL % 3 === 0, 2L).otherwise(1L).as("version"),
          col("content"))
      val st2 = media.select(col("media_id").as("id"),
        when(idL % 3 === 0, 2L).otherwise(1L).as("version"))
      val cs2 = Diff.computeDataChanges(keyed(src2), st2)
      AudioHash.refreshClipIndex(s, root,
        cs2.added.unionByName(cs2.updated)
          .select(col("id").as("media_id"), col("content")),
        cs2.removedIds.unionByName(cs2.updated.select(col("id"))))
      val clips = AudioHash.extractClips(
        media.filter(idL % 5 === 0), 32, "c")
      AudioHash.searchClipIndex(s, root, clips)
    }),

    // STREAMING perceptual ingest: the q_audio_fp_incremental batch
    // arrives as 4 micro-batches through a real foreachBatch stream
    // (the production ingest sink shape — a banded candidate join
    // with its own aggregations is per-ingest-batch work a streaming
    // plan cannot express); each micro-batch pairs against the
    // static corpus and appends to a distributed parquet sink with
    // its batch ordinal. Union over batches = exactly the
    // incremental pair set, which is what the oracle certifies,
    // batch stamps included. (The corpus index is re-derived per
    // batch here; production persists it — q_ann_persisted's shape.)
    "q_stream_media_dedup" -> ((s, dir) => {
      val media = Multimodal.synthesizeWav(
        s.read.parquet(t(dir, "documents")), "doc_id")
      val corpus = media.filter(col("media_id").cast("long") % 3 =!= 0)
      val arriving = media.filter(col("media_id").cast("long") % 3 === 0)
      graft.streaming.IncrementalSync.replayForeachBatch(
        s, arriving,
        expr("pmod(CAST(media_id AS BIGINT) div 3, 4)").cast("int"),
        tempStateDir(), nBatches = 4)(
        b => AudioHash.wavFpPairsAgainst(b, corpus))
        .select(col("batch_id"), col("corpus_id"), col("hamming"),
          col("__batch").as("batch"))
    }),

    // corrupt-media isolation: every id%7==2 blob truncated to its
    // first 10 bytes — the tolerant channel decodes the rest and
    // emits ok=0 rows for the casualties instead of failing the
    // stage (oracle replays both halves from the id formula alone)
    "q_multimodal_corrupt" -> ((s, dir) => {
      val media = Multimodal.synthesizePpm(
          s.read.parquet(t(dir, "documents")), "doc_id")
        .withColumn("content",
          when(pmod(col("media_id").cast("long"), lit(7)) === 2,
            expr("substring(content, 1, 10)"))
            .otherwise(col("content")))
      Multimodal.decodePpmChannel(media).toDF()
    }),

    // ── REAL codec tier #3, compressed images: one valid PNG per
    // document (zlib-deflated, per-row filters cycling all five
    // types, two IDAT chunks, ancillary tEXt, CRC32 everywhere);
    // decode = CRC-verified chunk walk + inflate + filter
    // reconstruction. The oracle replays every feature from the
    // id formula, so a broken Paeth/Average/inflate path cannot
    // hash-match. ──
    "q_multimodal_png" -> ((s, dir) => {
      val media = Multimodal.synthesizePng(
        s.read.parquet(t(dir, "documents")), "doc_id")
      Multimodal.decodePng(media).toDF()
    }),

    // ── REAL codec tier #1b, lossy: one valid baseline JFIF per
    // document — flat 8×8 tiles make the lossy pipeline exact (all-
    // ones quant tables ⇒ only DC survives, which round-trips
    // bit-exactly), so the full T.81 decode path (marker walk, DHT
    // canonical Huffman, entropy decode, dequant, float IDCT, BT.601
    // conversion) certifies against a pure id-formula oracle that
    // replays the YCbCr round-trip arithmetic in SQL. ──
    "q_multimodal_jpeg" -> ((s, dir) => {
      val media = Multimodal.synthesizeJpeg(
        s.read.parquet(t(dir, "documents")), "doc_id")
      Multimodal.decodeJpeg(media).toDF()
    }),

    // the web-default 4:2:0 layout through the same decoder: 16×16
    // flat tiles keep the subsampled pipeline exact (flat chroma
    // downsamples and replication-upsamples to itself), so the
    // general MCU-interleave/upsample path certifies against the
    // same pure id-formula oracle shape
    "q_multimodal_jpeg420" -> ((s, dir) => {
      val media = Multimodal.synthesizeJpeg420(
        s.read.parquet(t(dir, "documents")), "doc_id")
      Multimodal.decodeJpeg(media).toDF()
    }),

    // ── REAL codec tier #2, audio: one valid RIFF/WAVE PCM file per
    // document (rate/channels/samples pure integer arithmetic in the
    // doc_id, plus a LIST junk chunk the parser must word-align
    // past), decoded by an actual chunk walker + payload aggregation
    // in the same mapPartitions batch shape. The oracle replays every
    // feature — rate, channels, frame count, floor-ms duration,
    // per-channel sums, absolute energy, peak — from the id formula
    // without touching the binary, certifying the decoder read the
    // bytes it was handed. ──
    "q_multimodal_wav" -> ((s, dir) => {
      val media = Multimodal.synthesizeWav(
        s.read.parquet(t(dir, "documents")), "doc_id")
      Multimodal.decodeWav(media).toDF()
    }),

    // fixed-point PageRank over the customer↔supplier order graph
    // (both directions, namespaced node ids) — integer arithmetic
    // end-to-end, so the distributed power iteration is exactly
    // oracle-replayable (double sums are order-dependent; longs
    // aren't). pageRank returns a persisted (caller-owned) frame;
    // the Verify/Bench/TimeQ harnesses release it via their
    // per-query clearCache.
    "q_pagerank" -> ((s, dir) => {
      val o = tbl(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
      val l = tbl(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"))
      val pairs = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("a"),
          concat(lit("s"), col("l_suppkey")).as("b"))
        .distinct()
      val edges = pairs.union(
        pairs.select(col("b").as("a"), col("a").as("b")))
      graft.ext.Graph.pageRank(edges, "a", "b", iterations = 3)
    }),

    // BM25 retrieval scoring against a fixed query-term set — zero
    // token shuffle (per-term tf and dl are narrow array expressions;
    // corpus stats fold back as literals; top-k is a per-partition
    // heap)
    "q_bm25" -> ((s, dir) =>
      Assemble.bm25TopDocs(
        s.read.parquet(t(dir, "documents")), "doc_id", "text",
        Seq("spark", "join", "window"), topK = 20)
        .withColumnRenamed("id", "doc_id")),

    // weighted sampling without replacement (Efraimidis–Spirakis
    // A-Res) — probability proportional to n_chars, deterministic
    // hash uniforms, k smallest -ln(u)/w keys
    "q_sample_weighted" -> ((s, dir) =>
      graft.ext.Sampling.weightedTopK(
        s.read.parquet(t(dir, "documents"))
          .select(col("doc_id"), col("n_chars")),
        "doc_id", "n_chars", k = 25)),

    // one-pass multi-column profile: per-column n / nulls / exact
    // distinct / min / max through a single Expand-planned aggregate
    "q_profile" -> ((s, dir) =>
      graft.ext.Profiling.profile(
        tbl(s, dir, "events").select(col("event_id"), col("user_id"),
          col("event_type"),
          floor(col("value") * 100).cast("long").as("value_cents")),
        Seq("event_id", "user_id", "event_type", "value_cents"))),

    // overlapping fixed-token chunking with materialized chunk text
    // (the RAG/embedding splitter) — pure narrow explode, no shuffle
    "q_chunk_text" -> ((s, dir) =>
      TextAnalysis.chunkText(
        s.read.parquet(t(dir, "documents")), "doc_id", "text",
        chunkTokens = 8, overlap = 4)
        .withColumnRenamed("id", "doc_id")),

    // the 100 TB profile path (HLL++, no Expand) as a contract row:
    // exact distinct + an approx_ok bit the oracle pins to TRUE
    "q_profile_approx" -> ((s, dir) =>
      graft.ext.Profiling.profileApprox(
        tbl(s, dir, "events").select(col("event_id"), col("user_id"),
          col("event_type"),
          floor(col("value") * 100).cast("long").as("value_cents")),
        Seq("event_id", "user_id", "event_type", "value_cents"))),

    // inverted index with capped postings — the BM25 serving-side
    // companion; one (token, doc) shuffle, rank + df off one window
    // exchange
    "q_inverted_index" -> ((s, dir) =>
      Assemble.invertedIndex(
        s.read.parquet(t(dir, "documents")), "doc_id", "text",
        maxPostings = 5)
        .withColumnRenamed("id", "doc_id")),

    // retrieval capstone: chunk the corpus (8-token windows, overlap
    // 4), then build the capped inverted index over CHUNKS — the
    // "prepare corpus for RAG serving" pipeline as one query; both
    // stages are the certified operators composed
    "q_rag_index" -> ((s, dir) => {
      val chunks = TextAnalysis.chunkText(
        s.read.parquet(t(dir, "documents")), "doc_id", "text",
        chunkTokens = 8, overlap = 4)
        .select(concat(col("id"), lit("#"), col("chunk_idx"))
          .as("chunk_id"), col("chunk_text"))
      Assemble.invertedIndex(chunks, "chunk_id", "chunk_text",
        maxPostings = 3)
        .withColumnRenamed("id", "chunk_id")
    }),

    // ── ChangeSet-driven incremental index maintenance: sync 1
    // builds the index over a perturbed initial corpus; sync 2's
    // ChangeSet (adds %7=0 docs, updates %3=0 docs to their final
    // text, removes the %5=4 slice) drives refreshRagIndex — only
    // the delta is re-chunked, only touched tokens re-publish. The
    // oracle replays a FULL REBUILD over the final corpus; green =
    // the incremental path is bit-identical to rebuild. ──
    "q_rag_incremental" -> ((s, dir) => {
      val docs = s.read.parquet(t(dir, "documents"))
        .select(col("doc_id").cast("string").as("id"), col("text"))
      // initial state (sync 1): %7!=0 docs plus the to-be-removed
      // %5=4 slice; %3=0 docs carry STALE text (they update later)
      val initial = docs
        .filter(pmod(col("id").cast("long"), lit(7)) =!= 0)
        .select(col("id"),
          when(pmod(col("id").cast("long"), lit(3)) === 0,
            concat(lit("stale "), col("text")))
            .otherwise(col("text")).as("text"),
          lit(1L).as("version"))
      // sync-2 source = the final corpus: %5!=4, original text,
      // version bumped on the %3=0 docs so the diff marks them
      val source = docs
        .filter(pmod(col("id").cast("long"), lit(5)) =!= 4)
        .select(col("id"),
          when(pmod(col("id").cast("long"), lit(3)) === 0, lit(2L))
            .otherwise(lit(1L)).as("version"),
          col("text"))
      val p1 = Assemble.ragPostings(initial, "id", "text", 8, 4)
        .localCheckpoint()
      val pub1 = Assemble.publishIndex(p1, 3).localCheckpoint()
      val cs = Diff.computeDataChanges(
        Records.keyRecords(source, "id", Some("version")),
        initial.select(col("id"), col("version")))
      val changed = cs.added.select(col("id"), col("text"))
        .unionByName(cs.updated.select(col("id"), col("text")))
      val dropped = cs.removedIds
        .unionByName(cs.updated.select(col("id")))
      val (_, pub2) = Assemble.refreshRagIndex(p1, pub1,
        changed, dropped, "id", "text", 8, 4, 3)
      pub2
    }),

    // BPE APPLY over the top-200 vocabulary with the shared 10-merge
    // ladder (t+h→th→the, …, plus </w>-bearing merges) — certifies
    // the tokenizer-apply path (training is bpeTrain, spec-certified)
    // over bpeTrain's own end-of-word alphabet; the boundary-aware
    // double-space replace replays byte-exactly in both engines
    "q_bpe_apply" -> ((s, dir) =>
      Assemble.bpeApply(
        s.read.parquet(t(dir, "documents")), "doc_id", "text",
        merges = bpeFixtureMerges, topWords = 200)),

    // BPE corpus ENCODE: the same merge ladder applied to FULL
    // document text — merge chain runs once per word TYPE, joins
    // back broadcast, and per-document piece sequences reassemble in
    // word order; every output byte oracle-replayed
    "q_bpe_encode" -> ((s, dir) =>
      Assemble.bpeEncode(
        s.read.parquet(t(dir, "documents")), "doc_id", "text",
        bpeFixtureMerges)
        .withColumnRenamed("id", "doc_id")),

    // sequence packing over REAL tokenizer output: bpeEncode's
    // per-document piece counts feed the greedy concat-and-chop
    // packer (packSequencesByCount) instead of the whitespace proxy
    "q_bpe_pack" -> ((s, dir) =>
      Assemble.packSequencesByCount(
        Assemble.bpeEncode(
          s.read.parquet(t(dir, "documents")), "doc_id", "text",
          bpeFixtureMerges),
        "id", "n_tokens", seqLen = 512, shards = 8)
        .withColumnRenamed("id", "doc_id")),

    // fill-in-the-middle augmentation (Bavarian 2022): deterministic
    // portable-hash gating + substring re-arrangement — every output
    // byte replays in the oracle; zero shuffles
    "q_fim_transform" -> ((s, dir) =>
      Assemble.fimTransform(
        s.read.parquet(t(dir, "documents")), "doc_id", "text",
        fimRateMilli = 600, spmRateMilli = 500)
        .withColumnRenamed("id", "doc_id")),

    // curriculum phases: distributed global rank by difficulty proxy
    // (n_chars) + exact integer bucket math — no single-task window
    "q_curriculum" -> ((s, dir) =>
      Assemble.curriculumPhases(
        s.read.parquet(t(dir, "documents"))
          .select(col("doc_id"), col("n_chars")),
        "doc_id", Seq(col("n_chars")), phases = 4)
        .select(col("doc_id"), col("n_chars"), col("rank"),
          col("phase")))
  )

  /** DuckDB oracles for this tier's queries. */
  val oracles: Map[String, String] = Map(

    "q_dedup_exact" ->
      """SELECT doc_id, fingerprint FROM (
        |  SELECT doc_id, fingerprint,
        |         row_number() OVER (PARTITION BY fingerprint ORDER BY doc_id) AS rn
        |  FROM (SELECT doc_id,
        |          md5(array_to_string(
        |            regexp_split_to_array(lower(trim(text)), '\s+')[1:5], ' '))
        |            AS fingerprint
        |        FROM documents)) WHERE rn = 1""".stripMargin,

    "q_chunk_dedup" ->
      s"""WITH toks AS (
         |  SELECT doc_id, regexp_split_to_array(
         |    regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS t
         |  FROM documents),
         |ch AS (
         |  SELECT doc_id,
         |    unnest(list_transform(
         |      range(0, CAST(ceil(len(t) / 32.0) AS INT)),
         |      i -> list_reduce(list_prepend(CAST(0 AS BIGINT),
         |             list_transform(t[i*32+1 : (i+1)*32],
         |               s -> ${duckHash60("s")} % 1000003)),
         |           (a, b) -> (a * 31 + b) % 2147483647))) AS chunk_hash
         |  FROM toks)
         |SELECT chunk_hash, count(DISTINCT doc_id) AS n_docs,
         |       min(doc_id) AS min_doc, max(doc_id) AS max_doc
         |FROM ch GROUP BY chunk_hash HAVING count(DISTINCT doc_id) > 1""".stripMargin,

    "q_cdc_chunks" ->
      s"""WITH $cdcFpCtes
         |SELECT chunk_hash, count(DISTINCT doc_id) AS n_docs,
         |       count(*) AS n_occurrences
         |FROM fp WHERE n_tokens >= 8
         |GROUP BY chunk_hash HAVING count(DISTINCT doc_id) > 1""".stripMargin,

    "q_sample_stratified" ->
      s"""SELECT event_id, event_type, user_id FROM events
         |WHERE ${duckHash60("CAST(event_id AS VARCHAR)")} % 1000000
         |  < CASE event_type WHEN 'view' THEN 100000
         |                    WHEN 'click' THEN 500000
         |                    ELSE 1000000 END""".stripMargin,

    "q_text_analysis" -> duckTextAnalysis,

    "q_pii_scrub" ->
      s"""WITH p AS (
         |  SELECT doc_id,
         |         text || ' contact user' || CAST(doc_id AS VARCHAR)
         |           || '@example.com or +1 (555) 010-'
         |           || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
         |           || ' at 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.1'
         |           AS text
         |  FROM documents),
         |s1 AS (SELECT doc_id,
         |         CAST(len(regexp_extract_all(text, '${TextAnalysis.EmailRe}'))
         |           AS BIGINT) AS n_emails,
         |         regexp_replace(text, '${TextAnalysis.EmailRe}', '<EMAIL>', 'g')
         |           AS t1
         |       FROM p),
         |s2 AS (SELECT doc_id, n_emails,
         |         CAST(len(regexp_extract_all(t1, '${TextAnalysis.Ipv4Re}'))
         |           AS BIGINT) AS n_ips,
         |         regexp_replace(t1, '${TextAnalysis.Ipv4Re}', '<IP>', 'g') AS t2
         |       FROM s1)
         |SELECT doc_id,
         |       regexp_replace(t2, '${TextAnalysis.PhoneRe}', '<PHONE>', 'g')
         |         AS scrubbed,
         |       n_emails, n_ips,
         |       CAST(len(regexp_extract_all(t2, '${TextAnalysis.PhoneRe}'))
         |         AS BIGINT) AS n_phones
         |FROM s2""".stripMargin,

    // same wrapper, same regex chain, same order (script/style →
    // comments → tags → entities with &amp; last → collapse) —
    // cleaned text replayed byte-for-byte
    "q_html_strip" ->
      """WITH w AS (SELECT doc_id,
        |  '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) ||
        |  '</title><script type="text/javascript">var n=2;' || chr(10) ||
        |  'track();</script><style>.c{margin:0}</style></head><body><!-- hdr -->' ||
        |  '<p class="b">' || coalesce(text, '') ||
        |  '</p><div>Tom &amp; Jerry &lt;3 &quot;q&quot;&#39;s&nbsp;end</div></body></html>'
        |    AS raw
        |  FROM documents),
        |s AS (SELECT doc_id, raw, regexp_replace(regexp_replace(raw,
        |         '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
        |         '(?is)<style[^>]*>.*?</style>', ' ', 'g') AS t1
        |      FROM w),
        |t AS (SELECT doc_id, raw, regexp_replace(regexp_replace(t1,
        |         '(?s)<!--.*?-->', ' ', 'g'), '(?s)<[^>]+>', ' ', 'g') AS t2
        |      FROM s),
        |d AS (SELECT doc_id, raw,
        |        replace(replace(replace(replace(replace(replace(t2,
        |          '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
        |          '&#39;', ''''), '&nbsp;', ' '), '&amp;', '&') AS t3
        |      FROM t)
        |SELECT doc_id,
        |  trim(regexp_replace(t3, '[ \t]+', ' ', 'g')) AS clean_text,
        |  CAST(len(regexp_extract_all(raw, '(?s)<[^>]+>')) AS BIGINT)
        |    AS n_tags,
        |  CAST(len(regexp_extract_all(raw, '&(amp|lt|gt|quot|nbsp|#39);'))
        |    AS BIGINT) AS n_entities
        |FROM d""".stripMargin,

    // the same first-(doc,position)-occurrence rule: grouped min of
    // the packed occurrence key per non-blank line, blank lines pass
    // through; 1-based list indexes vs Spark's 0-based positions are
    // a uniform shift, so the min picks the same occurrence
    "q_line_dedup" ->
      """WITH e AS (SELECT doc_id,
        |        unnest(list_transform(
        |          string_split(coalesce(text, ''), chr(10)),
        |          (x, i) -> {'ln': i, 'line': x})) AS s
        |      FROM documents),
        |l AS (SELECT doc_id, s.ln AS ln, s.line AS line FROM e),
        |f AS (SELECT line, min(doc_id * 1000000 + ln) AS first_key
        |      FROM l WHERE length(trim(line)) > 0 GROUP BY line),
        |k AS (SELECT l.doc_id, l.ln, l.line,
        |             (length(trim(l.line)) = 0
        |              OR l.doc_id * 1000000 + l.ln = f.first_key) AS keep
        |      FROM l LEFT JOIN f ON l.line = f.line)
        |SELECT doc_id,
        |       count(*) AS n_lines,
        |       CAST(count(*) FILTER (WHERE NOT keep) AS BIGINT)
        |         AS n_removed,
        |       coalesce(string_agg(line, chr(10) ORDER BY ln)
        |         FILTER (WHERE keep), '') AS cleaned
        |FROM k GROUP BY doc_id""".stripMargin,

    "q_quality_repetition" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS t
        |  FROM documents),
        |flat AS (SELECT doc_id, unnest(range(1, len(t) + 1)) AS pos,
        |                unnest(t) AS tok FROM toks),
        |tokc AS (SELECT doc_id, tok, count(*) AS c FROM flat
        |         GROUP BY doc_id, tok),
        |tt AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
        |              count(*) AS n_distinct, max(c) AS top_tok_n
        |       FROM tokc GROUP BY doc_id),
        |gr AS (SELECT doc_id, tok || ' ' ||
        |         lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS g
        |       FROM flat),
        |gc AS (SELECT doc_id, max(c) AS top_2gram_n FROM
        |        (SELECT doc_id, g, count(*) AS c FROM gr
        |         WHERE g IS NOT NULL GROUP BY doc_id, g)
        |       GROUP BY doc_id),
        |rn AS (SELECT doc_id, pos, tok,
        |         CASE WHEN lag(tok) OVER (PARTITION BY doc_id ORDER BY pos)
        |                IS NULL
        |              OR lag(tok) OVER (PARTITION BY doc_id ORDER BY pos)
        |                <> tok
        |              THEN 1 ELSE 0 END AS chg
        |       FROM flat),
        |sg AS (SELECT doc_id, sum(chg) OVER (PARTITION BY doc_id ORDER BY pos
        |          ROWS UNBOUNDED PRECEDING) AS seg FROM rn),
        |rs AS (SELECT doc_id, max(c) AS max_run FROM
        |        (SELECT doc_id, seg, count(*) AS c FROM sg
        |         GROUP BY doc_id, seg)
        |       GROUP BY doc_id)
        |SELECT t.doc_id, t.n_tokens, t.n_distinct, t.top_tok_n,
        |       COALESCE(g.top_2gram_n, 0) AS top_2gram_n, r.max_run,
        |       round(1.0 - CAST(t.n_distinct AS DOUBLE) / t.n_tokens, 6)
        |         AS dup_tok_frac
        |FROM tt t LEFT JOIN gc g USING (doc_id)
        |LEFT JOIN rs r USING (doc_id)""".stripMargin,

    "q_unigram_ppl" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS t
        |  FROM documents),
        |flat AS (SELECT doc_id, unnest(t) AS tok FROM toks),
        |freq AS (SELECT tok, count(*) AS c FROM flat GROUP BY tok),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM freq),
        |s AS (SELECT doc_id,
        |        CAST(floor(-ln(CAST(c AS DOUBLE) / total) * 1000000)
        |          AS BIGINT) AS u
        |      FROM flat JOIN freq USING (tok) CROSS JOIN tot)
        |SELECT doc_id, count(*) AS n_tokens,
        |       CAST(sum(u) AS BIGINT) AS surprisal_unats,
        |       CAST(sum(u) // count(*) AS BIGINT) AS mean_unats
        |FROM s GROUP BY doc_id""".stripMargin,

    "q_bigram_ppl" ->
      """WITH base AS (
        |  SELECT doc_id, regexp_split_to_array(
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS t
        |  FROM documents),
        |toks AS (SELECT doc_id, unnest(range(1, len(t) + 1)) AS pos,
        |                unnest(t) AS tok FROM base),
        |wp AS (SELECT doc_id, pos, tok,
        |         lag(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
        |       FROM toks),
        |uni AS (SELECT tok AS u_tok, count(*) AS cu FROM toks GROUP BY 1),
        |v AS (SELECT CAST(count(*) AS BIGINT) AS vn FROM uni),
        |tot AS (SELECT CAST(sum(cu) AS BIGINT) AS total FROM uni),
        |bi AS (SELECT prev AS b_prev, tok AS b_tok, count(*) AS cb
        |       FROM wp WHERE prev IS NOT NULL GROUP BY 1, 2),
        |s AS (SELECT doc_id,
        |        CAST(CASE WHEN prev IS NULL THEN
        |          floor(-ln(CAST(cu AS DOUBLE) / total) * 1000000)
        |        ELSE
        |          floor(-ln(CAST(coalesce(cb, 0) + 1 AS DOUBLE)
        |            / (cu + vn)) * 1000000) END AS BIGINT) AS u
        |      FROM wp
        |      JOIN uni ON coalesce(prev, wp.tok) = u_tok
        |      LEFT JOIN bi ON prev = b_prev AND wp.tok = b_tok
        |      CROSS JOIN tot CROSS JOIN v)
        |SELECT doc_id, count(*) AS n_tokens,
        |  CAST(sum(u) AS BIGINT) AS surprisal_unats,
        |  CAST(sum(u) // count(*) AS BIGINT) AS mean_unats
        |FROM s GROUP BY doc_id""".stripMargin,

    // portable-hash rank within stratum, first k — replayed exactly
    "q_sample_exact_k" ->
      s"""WITH r AS (
         |  SELECT event_id, event_type, user_id,
         |         row_number() OVER (PARTITION BY event_type
         |           ORDER BY ${duckHash60("CAST(event_id AS VARCHAR)")},
         |             event_id) AS rk
         |  FROM events)
         |SELECT event_id, event_type, user_id FROM r
         |WHERE rk <= 20""".stripMargin,

    // the 90/5/5 hash-cell assignment, aggregated per split
    "q_split" ->
      s"""WITH a AS (
         |  SELECT doc_id,
         |    CASE WHEN ${duckHash60("CAST(doc_id AS VARCHAR)")} % 100 < 90
         |           THEN 'train'
         |         WHEN ${duckHash60("CAST(doc_id AS VARCHAR)")} % 100 < 95
         |           THEN 'val'
         |         ELSE 'test' END AS split
         |  FROM documents)
         |SELECT split, count(*) AS n, min(doc_id) AS min_id,
         |       max(doc_id) AS max_id
         |FROM a GROUP BY split""".stripMargin,

    // DSIR replay: same hashed unigram+bigram buckets, same add-one
    // ppm likelihood-ratio weights, same BIGINT sums, same tie-break
    "q_dsir_select" ->
      s"""WITH rel AS (
         |  SELECT doc_id, (lang = 'en') AS is_t, regexp_split_to_array(
         |    regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS t
         |  FROM documents),
         |${dsirScoreCtes("rel", 1024)}
         |SELECT doc_id, n_feats, imp_sum,
         |  CAST(imp_sum // n_feats AS BIGINT) AS imp_ppf
         |FROM scores ORDER BY imp_ppf DESC, doc_id LIMIT 50""".stripMargin,

    // funnel replay: every stage CTE-chained in first-fail order —
    // gram STRINGS against the engine's 60-bit hashes (collision
    // certification, the q_span_dedup convention), the q_dedup_exact
    // fingerprint window, and the shared DSIR scoring CTEs over the
    // survivors
    "q_curation_funnel" ->
      s"""WITH d0 AS (
         |  SELECT doc_id,
         |    (source IN ('src0', 'src1', 'src2')) AS is_t,
         |    (doc_id % 19 = 3) AS s_eval,
         |    (lang <> 'en') AS s_lang,
         |    (CASE WHEN length(trim(text)) = 0 THEN 0
         |          ELSE len(regexp_split_to_array(trim(text), '\\s+'))
         |     END < 30) AS s_short
         |  FROM documents),
         |toksall AS (
         |  SELECT doc_id, regexp_split_to_array(
         |    regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS t
         |  FROM documents),
         |shx AS (
         |  SELECT doc_id, list_distinct(
         |    CASE WHEN len(t) < 13 THEN [array_to_string(t, ' ')]
         |    ELSE [array_to_string(t[i:i+12], ' ')
         |          FOR i IN range(1, len(t) - 11)] END) AS sh
         |  FROM toksall),
         |eg AS (SELECT DISTINCT unnest(sh) AS g
         |       FROM shx JOIN d0 USING (doc_id) WHERE d0.s_eval),
         |pre AS (SELECT doc_id FROM d0
         |        WHERE NOT s_eval AND NOT s_lang AND NOT s_short),
         |contam AS (
         |  SELECT DISTINCT doc_id
         |  FROM (SELECT doc_id, unnest(sh) AS g
         |        FROM shx JOIN pre USING (doc_id))
         |  WHERE g IN (SELECT g FROM eg)),
         |rk AS (
         |  SELECT doc_id, row_number() OVER (PARTITION BY
         |      md5(array_to_string(regexp_split_to_array(
         |        lower(trim(text)), '\\s+')[1:5], ' '))
         |    ORDER BY doc_id) AS rn
         |  FROM documents JOIN pre USING (doc_id)
         |  WHERE doc_id NOT IN (SELECT doc_id FROM contam)),
         |rel AS (
         |  SELECT toksall.doc_id, d0.is_t, toksall.t
         |  FROM toksall JOIN d0 USING (doc_id) JOIN rk USING (doc_id)
         |  WHERE rk.rn = 1),
         |${dsirScoreCtes("rel", 1024)},
         |sel AS (SELECT doc_id FROM scores
         |        ORDER BY imp_sum // n_feats DESC, doc_id LIMIT 100)
         |SELECT d0.doc_id,
         |  CASE WHEN s_eval THEN 'eval_holdout'
         |       WHEN s_lang THEN 'lang_filter'
         |       WHEN s_short THEN 'too_short'
         |       WHEN doc_id IN (SELECT doc_id FROM contam)
         |         THEN 'contaminated'
         |       WHEN doc_id IN (SELECT doc_id FROM rk WHERE rn > 1)
         |         THEN 'dup'
         |       WHEN doc_id IN (SELECT doc_id FROM sel) THEN 'kept'
         |       ELSE 'dsir_cut' END AS stage
         |FROM d0""".stripMargin,

    // fertility replay over the same encode CTE as q_bpe_encode plus
    // the per-occurrence word-character sum, rolled up per language
    "q_tok_fertility" -> {
      val chain = duckBpeChain("w", bpeFixtureMerges)
      s"""WITH toks0 AS (
         |  SELECT doc_id, lang, regexp_split_to_array(
         |    regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS t
         |  FROM documents),
         |toks AS (
         |  SELECT doc_id, t[i] AS w
         |  FROM (SELECT doc_id, t,
         |          unnest(generate_series(1, len(t))) AS i
         |        FROM toks0)
         |  WHERE length(t[i]) > 0),
         |types AS (SELECT DISTINCT w FROM toks),
         |pieces AS (
         |  SELECT w, CAST(len(string_split($chain, ' ')) AS BIGINT)
         |           AS n_pieces
         |  FROM types),
         |enc AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
         |         CAST(sum(n_pieces) AS BIGINT) AS n_tokens,
         |         CAST(sum(length(w)) AS BIGINT) AS word_chars
         |  FROM toks JOIN pieces USING (w)
         |  GROUP BY doc_id),
         |g AS (
         |  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         |         CAST(sum(n_words) AS BIGINT) AS n_words,
         |         CAST(sum(n_tokens) AS BIGINT) AS n_pieces,
         |         CAST(sum(word_chars) AS BIGINT) AS n_chars
         |  FROM enc JOIN toks0 USING (doc_id)
         |  GROUP BY lang)
         |SELECT lang, n_docs, n_words, n_pieces, n_chars,
         |  CAST((n_pieces * 1000000) // n_words AS BIGINT)
         |    AS fertility_ppm,
         |  CAST((n_chars * 1000000) // n_pieces AS BIGINT)
         |    AS chars_per_piece_ppm
         |FROM g""".stripMargin
    },

    // the fixed-order Jelinek-Mercer interpolation over exact counts
    "q_trigram_ppl" ->
      """WITH base AS (
        |  SELECT doc_id, regexp_split_to_array(
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS t
        |  FROM documents),
        |toks AS (SELECT doc_id, unnest(range(1, len(t) + 1)) AS pos,
        |                unnest(t) AS tok FROM base),
        |wp AS (SELECT doc_id, pos, tok,
        |         lag(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS p1,
        |         lag(tok, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS p2
        |       FROM toks),
        |uni AS (SELECT tok AS uk, count(*) AS c FROM toks GROUP BY 1),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM uni),
        |bi AS (SELECT p1 AS ba, tok AS bb, count(*) AS c
        |       FROM wp WHERE p1 IS NOT NULL GROUP BY 1, 2),
        |tri AS (SELECT p2 AS ta, p1 AS tb, tok AS tc, count(*) AS c
        |        FROM wp WHERE p2 IS NOT NULL GROUP BY 1, 2, 3),
        |s AS (SELECT doc_id,
        |        CAST(floor(-ln(
        |          CASE WHEN p1 IS NULL THEN CAST(u3.c AS DOUBLE) / tot.n
        |               WHEN p2 IS NULL THEN
        |                 0.7 * (CAST(b23.c AS DOUBLE) / u2.c)
        |                 + 0.3 * (CAST(u3.c AS DOUBLE) / tot.n)
        |               ELSE
        |                 0.6 * (CAST(tr.c AS DOUBLE) / b12.c)
        |                 + 0.3 * (CAST(b23.c AS DOUBLE) / u2.c)
        |                 + 0.1 * (CAST(u3.c AS DOUBLE) / tot.n) END
        |          ) * 1000000) AS BIGINT) AS u
        |      FROM wp
        |      JOIN uni u3 ON wp.tok = u3.uk
        |      LEFT JOIN uni u2 ON wp.p1 = u2.uk
        |      LEFT JOIN bi b23 ON wp.p1 = b23.ba AND wp.tok = b23.bb
        |      LEFT JOIN bi b12 ON wp.p2 = b12.ba AND wp.p1 = b12.bb
        |      LEFT JOIN tri tr ON wp.p2 = tr.ta AND wp.p1 = tr.tb
        |        AND wp.tok = tr.tc
        |      CROSS JOIN tot)
        |SELECT doc_id, count(*) AS n_tokens,
        |  CAST(sum(u) AS BIGINT) AS surprisal_unats,
        |  CAST(sum(u) // count(*) AS BIGINT) AS mean_unats
        |FROM s GROUP BY doc_id""".stripMargin,

    // stupid-backoff replay: identical CASE ladder over the same
    // exact integer count tables, identical literal weights and
    // operation order, one micro-nat truncation
    "q_backoff_ppl" ->
      """WITH base AS (
        |  SELECT doc_id, regexp_split_to_array(
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS t
        |  FROM documents),
        |toksT AS (SELECT doc_id, unnest(range(1, len(t) + 1)) AS pos,
        |                 unnest(t) AS tok FROM base WHERE doc_id % 2 = 0),
        |wpT AS (SELECT doc_id, pos, tok,
        |          lag(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS p1,
        |          lag(tok, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS p2
        |        FROM toksT),
        |uni AS (SELECT tok AS uk, count(*) AS c FROM toksT GROUP BY 1),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n,
        |               CAST(count(*) AS BIGINT) AS v FROM uni),
        |bi AS (SELECT p1 AS ba, tok AS bb, count(*) AS c
        |       FROM wpT WHERE p1 IS NOT NULL GROUP BY 1, 2),
        |tri AS (SELECT p2 AS ta, p1 AS tb, tok AS tc, count(*) AS ct
        |        FROM wpT WHERE p2 IS NOT NULL GROUP BY 1, 2, 3),
        |toksS AS (SELECT doc_id, unnest(range(1, len(t) + 1)) AS pos,
        |                 unnest(t) AS tok FROM base WHERE doc_id % 2 = 1),
        |wpS AS (SELECT doc_id, pos, tok,
        |          lag(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS p1,
        |          lag(tok, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS p2
        |        FROM toksS),
        |s AS (SELECT doc_id,
        |        CAST(floor(-ln(
        |          CASE WHEN p1 IS NULL THEN
        |                 CAST(coalesce(u3.c, 0) + 1 AS DOUBLE)
        |                   / CAST(tot.n + tot.v AS DOUBLE)
        |               WHEN p2 IS NULL THEN
        |                 CASE WHEN b23.c IS NOT NULL THEN
        |                        CAST(b23.c AS DOUBLE) / u2.c
        |                      ELSE 0.4 * (CAST(coalesce(u3.c, 0) + 1
        |                          AS DOUBLE)
        |                        / CAST(tot.n + tot.v AS DOUBLE)) END
        |               ELSE
        |                 CASE WHEN tr.ct IS NOT NULL THEN
        |                        CAST(tr.ct AS DOUBLE) / b12.c
        |                      WHEN b23.c IS NOT NULL THEN
        |                        0.4 * (CAST(b23.c AS DOUBLE) / u2.c)
        |                      ELSE 0.16 * (CAST(coalesce(u3.c, 0) + 1
        |                          AS DOUBLE)
        |                        / CAST(tot.n + tot.v AS DOUBLE)) END
        |          END) * 1000000) AS BIGINT) AS u,
        |        CASE WHEN u3.c IS NULL THEN 1 ELSE 0 END AS oov
        |      FROM wpS
        |      LEFT JOIN uni u3 ON wpS.tok = u3.uk
        |      LEFT JOIN uni u2 ON wpS.p1 = u2.uk
        |      LEFT JOIN bi b23 ON wpS.p1 = b23.ba AND wpS.tok = b23.bb
        |      LEFT JOIN bi b12 ON wpS.p2 = b12.ba AND wpS.p1 = b12.bb
        |      LEFT JOIN tri tr ON wpS.p2 = tr.ta AND wpS.p1 = tr.tb
        |        AND wpS.tok = tr.tc
        |      CROSS JOIN tot)
        |SELECT doc_id, count(*) AS n_tokens,
        |  CAST(sum(u) AS BIGINT) AS surprisal_unats,
        |  CAST(sum(u) // count(*) AS BIGINT) AS mean_unats,
        |  CAST(sum(oov) AS BIGINT) AS n_oov
        |FROM s GROUP BY doc_id""".stripMargin,

    // Kneser-Ney replay: identical count tables (bigram, context
    // totals, following-type, preceding-type), identical double
    // expression shape and constant order (D = 0.75 literal,
    // add-one continuation over B + V), one micro-nat truncation
    "q_kn_ppl" ->
      """WITH base AS (
        |  SELECT doc_id, regexp_split_to_array(
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS t
        |  FROM documents),
        |toksT AS (SELECT doc_id, unnest(range(1, len(t) + 1)) AS pos,
        |                 unnest(t) AS tok FROM base WHERE doc_id % 2 = 0),
        |wpT AS (SELECT doc_id, pos, tok,
        |          lag(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS p1
        |        FROM toksT),
        |bi AS (SELECT p1 AS ba, tok AS bb, count(*) AS cab
        |       FROM wpT WHERE p1 IS NOT NULL GROUP BY 1, 2),
        |cctx AS (SELECT ba AS ck, CAST(sum(cab) AS BIGINT) AS cctx,
        |                CAST(count(*) AS BIGINT) AS n1fol
        |         FROM bi GROUP BY 1),
        |npre AS (SELECT bb AS pk, CAST(count(*) AS BIGINT) AS n1pre
        |         FROM bi GROUP BY 1),
        |uni AS (SELECT tok AS uk, count(*) AS c FROM toksT GROUP BY 1),
        |tot AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM bi) AS b,
        |               (SELECT CAST(count(*) AS BIGINT) FROM uni) AS v),
        |toksS AS (SELECT doc_id, unnest(range(1, len(t) + 1)) AS pos,
        |                 unnest(t) AS tok FROM base WHERE doc_id % 2 = 1),
        |wpS AS (SELECT doc_id, pos, tok,
        |          lag(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS p1
        |        FROM toksS),
        |s AS (SELECT doc_id,
        |        CAST(floor(-ln(
        |          CASE WHEN p1 IS NULL OR cc.cctx IS NULL THEN
        |                 CAST(coalesce(np.n1pre, 0) + 1 AS DOUBLE)
        |                   / CAST(tot.b + tot.v AS DOUBLE)
        |               ELSE
        |                 (greatest(CAST(coalesce(b2.cab, 0) AS DOUBLE)
        |                     - 0.75, 0.0)
        |                  + 0.75 * cc.n1fol
        |                    * (CAST(coalesce(np.n1pre, 0) + 1 AS DOUBLE)
        |                       / CAST(tot.b + tot.v AS DOUBLE)))
        |                 / CAST(cc.cctx AS DOUBLE)
        |          END) * 1000000) AS BIGINT) AS u,
        |        CASE WHEN u3.c IS NULL THEN 1 ELSE 0 END AS oov
        |      FROM wpS
        |      LEFT JOIN bi b2 ON wpS.p1 = b2.ba AND wpS.tok = b2.bb
        |      LEFT JOIN cctx cc ON wpS.p1 = cc.ck
        |      LEFT JOIN npre np ON wpS.tok = np.pk
        |      LEFT JOIN uni u3 ON wpS.tok = u3.uk
        |      CROSS JOIN tot)
        |SELECT doc_id, count(*) AS n_tokens,
        |  CAST(sum(u) AS BIGINT) AS surprisal_unats,
        |  CAST(sum(u) // count(*) AS BIGINT) AS mean_unats,
        |  CAST(sum(oov) AS BIGINT) AS n_oov
        |FROM s GROUP BY doc_id""".stripMargin,

    // unigram-LM replay: same candidate frequencies, vocabulary cut,
    // packed micro-nat costs, and the Viterbi DP unrolled to 40
    // chained CTE stages (generated) — integer min end to end
    "q_unigram_encode" -> unigramEncodeSql(512, 4, 40),

    // trigram-KN replay: identical five model tables and the same
    // nested CASE shape (p_mid inlined in both its uses), D = 0.75
    // literals, add-one continuation over B + V, one micro-nat
    // truncation
    "q_kn3_ppl" -> {
      val pcont =
        """CAST(coalesce(np.npre2, 0) + 1 AS DOUBLE)
          |                   / CAST(tot.b + tot.v AS DOUBLE)""".stripMargin
      val pmid =
        s"""CASE WHEN c2.ctot2 IS NULL THEN $pcont
           |               ELSE
           |                 (greatest(CAST(coalesce(m3.npre3, 0) AS DOUBLE)
           |                     - 0.75, 0.0)
           |                  + 0.75 * c2.n1f2c * ($pcont))
           |                 / CAST(c2.ctot2 AS DOUBLE) END""".stripMargin
      s"""WITH base AS (
        |  SELECT doc_id, regexp_split_to_array(
        |    regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS t
        |  FROM documents),
        |toksT AS (SELECT doc_id, unnest(range(1, len(t) + 1)) AS pos,
        |                 unnest(t) AS tok FROM base WHERE doc_id % 2 = 0),
        |wpT AS (SELECT doc_id, pos, tok,
        |          lag(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS p1,
        |          lag(tok, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS p2
        |        FROM toksT),
        |bi AS (SELECT p1 AS ba, tok AS bb, count(*) AS cab
        |       FROM wpT WHERE p1 IS NOT NULL GROUP BY 1, 2),
        |tri AS (SELECT p2 AS ta, p1 AS tb, tok AS tc, count(*) AS ct
        |        FROM wpT WHERE p2 IS NOT NULL GROUP BY 1, 2, 3),
        |cctx3 AS (SELECT ta AS c3a, tb AS c3b,
        |                 CAST(sum(ct) AS BIGINT) AS cctx3,
        |                 CAST(count(*) AS BIGINT) AS n1f3
        |          FROM tri GROUP BY 1, 2),
        |npre3 AS (SELECT tb AS m3v, tc AS m3w,
        |                 CAST(count(*) AS BIGINT) AS npre3
        |          FROM tri GROUP BY 1, 2),
        |ctot2 AS (SELECT m3v AS c2v, CAST(sum(npre3) AS BIGINT) AS ctot2,
        |                 CAST(count(*) AS BIGINT) AS n1f2c
        |          FROM npre3 GROUP BY 1),
        |npre2 AS (SELECT bb AS pk, CAST(count(*) AS BIGINT) AS npre2
        |          FROM bi GROUP BY 1),
        |uni AS (SELECT tok AS uk, count(*) AS c FROM toksT GROUP BY 1),
        |tot AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM bi) AS b,
        |               (SELECT CAST(count(*) AS BIGINT) FROM uni) AS v),
        |toksS AS (SELECT doc_id, unnest(range(1, len(t) + 1)) AS pos,
        |                 unnest(t) AS tok FROM base WHERE doc_id % 2 = 1),
        |wpS AS (SELECT doc_id, pos, tok,
        |          lag(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS p1,
        |          lag(tok, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS p2
        |        FROM toksS),
        |s AS (SELECT doc_id,
        |        CAST(floor(-ln(
        |          CASE WHEN p1 IS NULL THEN $pcont
        |               WHEN p2 IS NULL OR cc3.cctx3 IS NULL THEN $pmid
        |               ELSE
        |                 (greatest(CAST(coalesce(tr.ct, 0) AS DOUBLE)
        |                     - 0.75, 0.0)
        |                  + 0.75 * cc3.n1f3 * ($pmid))
        |                 / CAST(cc3.cctx3 AS DOUBLE)
        |          END) * 1000000) AS BIGINT) AS u,
        |        CASE WHEN u3.c IS NULL THEN 1 ELSE 0 END AS oov
        |      FROM wpS
        |      LEFT JOIN tri tr ON wpS.p2 = tr.ta AND wpS.p1 = tr.tb
        |        AND wpS.tok = tr.tc
        |      LEFT JOIN cctx3 cc3 ON wpS.p2 = cc3.c3a AND wpS.p1 = cc3.c3b
        |      LEFT JOIN npre3 m3 ON wpS.p1 = m3.m3v AND wpS.tok = m3.m3w
        |      LEFT JOIN ctot2 c2 ON wpS.p1 = c2.c2v
        |      LEFT JOIN npre2 np ON wpS.tok = np.pk
        |      LEFT JOIN uni u3 ON wpS.tok = u3.uk
        |      CROSS JOIN tot)
        |SELECT doc_id, count(*) AS n_tokens,
        |  CAST(sum(u) AS BIGINT) AS surprisal_unats,
        |  CAST(sum(u) // count(*) AS BIGINT) AS mean_unats,
        |  CAST(sum(oov) AS BIGINT) AS n_oov
        |FROM s GROUP BY doc_id""".stripMargin
    },

    // quantized-projection cells replayed exactly (floor(e·1000)
    // longs; integer weight stream; argmax ties → max k = the
    // engine's struct-max rule), then the equal-weight mixture
    // thresholds — DuckDB's indexed lambda is 1-BASED, hence (i-1)
    "q_embed_balanced" -> {
      val hash = duckHash60("CAST(vec_id AS VARCHAR)")
      s"""WITH q AS (
         |  SELECT vec_id,
         |         list_transform(CAST(embedding AS DOUBLE[]),
         |           e -> CAST(floor(e * 1000) AS BIGINT)) AS qv
         |  FROM embeddings),
         |ks AS (SELECT vec_id, qv, unnest(range(0, 16)) AS k FROM q),
         |sc AS (
         |  SELECT vec_id, k,
         |    CAST(coalesce(list_sum(list_transform(qv, (x, i) ->
         |      x * ((k * 31 + (i - 1) * 7) % 11 - 5))), 0) AS BIGINT) AS s
         |  FROM ks),
         |cell AS (
         |  SELECT vec_id, k FROM (
         |    SELECT vec_id, k, s,
         |      row_number() OVER (PARTITION BY vec_id
         |                         ORDER BY s DESC, k DESC) AS rn
         |    FROM sc) WHERE rn = 1),
         |c AS (SELECT k, count(*) AS cd FROM cell GROUP BY 1),
         |b AS (SELECT min(cd) AS bu FROM c),
         |th AS (SELECT k, (bu * 1000000) // cd AS thr
         |       FROM c CROSS JOIN b)
         |SELECT cell.vec_id, CAST(cell.k AS INT) AS cell
         |FROM cell JOIN th USING (k)
         |WHERE $hash % 1000000 < thr""".stripMargin
    },

    "q_mix_domains" -> {
      val hash = duckHash60("CAST(event_id AS VARCHAR)")
      s"""WITH c AS (SELECT event_type AS d, count(*) AS cd FROM events
         |           GROUP BY 1),
         |w AS (SELECT * FROM (VALUES ('view', 1), ('click', 3),
         |                            ('purchase', 6)) AS t(d, wt)),
         |b AS (SELECT min(cd // wt) AS bu FROM c JOIN w USING (d)),
         |th AS (SELECT d, (wt * bu * 1000000) // cd AS thr
         |       FROM c JOIN w USING (d) CROSS JOIN b)
         |SELECT event_id, event_type, user_id
         |FROM events JOIN th ON event_type = th.d
         |WHERE $hash % 1000000 < thr""".stripMargin
    },

    "q_mix_temperature" -> {
      val hash = duckHash60("CAST(event_id AS VARCHAR)")
      val milli = graft.ext.Assemble.temperatureMilliWeights(
        Map("view" -> 1L, "click" -> 3L, "purchase" -> 6L), 2.0, 50L)
      val values = Seq("view", "click", "purchase")
        .map(d => s"('$d', ${milli(d)})").mkString(", ")
      s"""WITH c AS (SELECT event_type AS d, count(*) AS cd FROM events
         |           GROUP BY 1),
         |w AS (SELECT * FROM (VALUES $values) AS t(d, wt)),
         |b AS (SELECT min(cd // wt) AS bu FROM c JOIN w USING (d)),
         |th AS (SELECT d, (wt * bu * 1000000) // cd AS thr
         |       FROM c JOIN w USING (d) CROSS JOIN b)
         |SELECT event_id, event_type, user_id
         |FROM events JOIN th ON event_type = th.d
         |WHERE $hash % 1000000 < thr""".stripMargin
    },

    "q_seq_pack" -> {
      val hash = duckHash60("CAST(doc_id AS VARCHAR)")
      s"""WITH base AS (
         |  SELECT doc_id,
         |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
         |         ELSE len(regexp_split_to_array(trim(text), '\\s+')) END
         |      AS BIGINT) AS n_tokens,
         |    $hash % 8 AS shard
         |  FROM documents),
         |o AS (SELECT doc_id, shard, n_tokens,
         |        sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
         |          ROWS UNBOUNDED PRECEDING) - n_tokens AS tok_offset
         |      FROM base)
         |SELECT doc_id, shard, n_tokens,
         |       CAST(tok_offset AS BIGINT) AS tok_offset,
         |       CAST(tok_offset // 512 AS BIGINT) AS seq_id
         |FROM o""".stripMargin
    },

    "q_vocab" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS t
        |  FROM documents),
        |flat AS (SELECT doc_id, unnest(t) AS tok FROM toks)
        |SELECT tok, count(*) AS n_total,
        |       count(DISTINCT doc_id) AS n_docs
        |FROM flat GROUP BY tok HAVING count(*) >= 5""".stripMargin,

    // bigrams from 1-based array adjacency; exact integer counts into
    // one ln, truncated to micro-nats; total-order top-50
    "q_pmi" ->
      """WITH toks AS (
        |  SELECT regexp_split_to_array(
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS t
        |  FROM documents),
        |uni AS (SELECT unnest(t) AS tok FROM toks),
        |uc AS (SELECT tok, count(*) AS c FROM uni GROUP BY tok),
        |n AS (SELECT count(*) AS n FROM uni),
        |bi AS (
        |  SELECT t[i] || ' ' || t[i + 1] AS bigram
        |  FROM (SELECT t, unnest(generate_series(1, len(t) - 1)) AS i
        |        FROM toks)),
        |bc AS (SELECT bigram, count(*) AS c_ab FROM bi
        |       GROUP BY bigram HAVING count(*) >= 5),
        |j AS (
        |  SELECT bc.bigram, bc.c_ab, a.c AS c_a, b.c AS c_b,
        |         CAST(floor(ln(CAST(bc.c_ab * n.n AS DOUBLE)
        |             / (a.c * b.c)) * 1000000) AS BIGINT) AS pmi_micro
        |  FROM bc, n,
        |       uc a, uc b
        |  WHERE a.tok = split_part(bc.bigram, ' ', 1)
        |    AND b.tok = split_part(bc.bigram, ' ', 2))
        |SELECT bigram, c_ab, c_a, c_b, pmi_micro
        |FROM j ORDER BY pmi_micro DESC, bigram LIMIT 50""".stripMargin,

    // ln on an exact integer ratio, truncated once to micro-nats —
    // the same double-discipline as q_unigram_ppl; everything after
    // is LONG arithmetic and a total-order rank
    "q_tfidf" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS tok
        |  FROM documents),
        |tf AS (
        |  SELECT doc_id, tok, count(*) AS tf FROM toks
        |  WHERE tok <> '' GROUP BY doc_id, tok),
        |dfreq AS (
        |  SELECT tok, count(*) AS n_docs,
        |         CAST(floor(ln(CAST((SELECT count(*) FROM documents)
        |             AS DOUBLE) / count(*)) * 1000000) AS BIGINT)
        |           AS idf_micro
        |  FROM tf GROUP BY tok),
        |ranked AS (
        |  SELECT tf.doc_id, tf.tok, tf.tf, d.idf_micro,
        |         tf.tf * d.idf_micro AS score_micro,
        |         row_number() OVER (PARTITION BY tf.doc_id
        |           ORDER BY tf.tf * d.idf_micro DESC, tf.tok) AS rnk
        |  FROM tf JOIN dfreq d ON tf.tok = d.tok)
        |SELECT doc_id, tok, tf, idf_micro, score_micro,
        |       CAST(rnk AS INTEGER) AS rank
        |FROM ranked WHERE rnk <= 3""".stripMargin,

    "q_embed_quantize" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |s AS (SELECT vec_id, v,
        |        greatest(list_max(list_transform(v, x -> abs(x))), 1e-30)
        |          AS scale
        |      FROM e)
        |SELECT vec_id, CAST(floor(scale * 1000000) AS BIGINT) AS scale_micro,
        |       CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
        |         list_transform(v, x -> CAST(greatest(least(
        |           floor(x * 127 / scale), 127), -127)
        |           AS BIGINT))), (a, b) -> a + b) AS BIGINT) AS q_sum,
        |       CAST(len(v) AS BIGINT) AS n_dims
        |FROM s""".stripMargin,

    "q_contamination" -> contaminationSql,

    // gram STRINGS on the oracle side vs 60-bit hashes in the engine:
    // a green row certifies the hash collision-free on the gate
    // corpus (the q_span_dedup convention)
    "q_source_overlap" ->
      s"""WITH docs AS (
         |  $duckShingles),
         |ex AS (SELECT doc_id, unnest(sh) AS g FROM docs),
         |sg AS (SELECT DISTINCT d.source AS src, e.g AS g
         |       FROM ex e JOIN documents d USING (doc_id)),
         |tot AS (SELECT src, count(*) AS total FROM sg GROUP BY src),
         |sh AS (SELECT a.src AS src_a, b.src AS src_b,
         |              CAST(count(*) AS BIGINT) AS shared_grams
         |       FROM sg a JOIN sg b ON a.g = b.g AND a.src < b.src
         |       GROUP BY 1, 2)
         |SELECT src_a, src_b, shared_grams,
         |  CAST(shared_grams * 1000000
         |    // (ta.total + tb.total - shared_grams) AS BIGINT)
         |    AS jaccard_ppm
         |FROM sh
         |JOIN tot ta ON sh.src_a = ta.src
         |JOIN tot tb ON sh.src_b = tb.src""".stripMargin,

    // bloom prefilter is exact by construction — the oracle IS the
    // plain contamination query; a green row certifies that
    "q_contamination_bloom" -> contaminationSql,

    // transitive closure of the verified pair graph via a recursive
    // CTE (reachability), component label = min reachable id
    "q_dedup_clusters" ->
      s"""WITH RECURSIVE $minhashPairsCtes,
         |edges AS (SELECT id_a AS a, id_b AS b FROM pairs
         |          UNION SELECT id_b, id_a FROM pairs),
         |reach AS (
         |  SELECT a AS n, b AS r FROM edges
         |  UNION
         |  SELECT reach.n, e.b FROM reach JOIN edges e ON reach.r = e.a
         |)
         |SELECT n AS doc_id, least(n, min(r)) AS cluster_id
         |FROM reach GROUP BY n""".stripMargin,

    // pairs → recursive closure → drop non-representatives → permute
    // the survivors: every stage of the pipeline replayed in one query
    "q_dedup_shuffle" ->
      s"""WITH RECURSIVE $minhashPairsCtes,
         |edges AS (SELECT id_a AS a, id_b AS b FROM pairs
         |          UNION SELECT id_b, id_a FROM pairs),
         |reach AS (
         |  SELECT a AS n, b AS r FROM edges
         |  UNION
         |  SELECT reach.n, g.b FROM reach JOIN edges g ON reach.r = g.a
         |),
         |dropped AS (SELECT n FROM reach GROUP BY n
         |            HAVING n <> least(n, min(r))),
         |keep AS (SELECT doc_id FROM documents
         |         WHERE doc_id NOT IN (SELECT n FROM dropped)),
         |h AS (
         |  SELECT doc_id,
         |    ${duckHash60("concat(CAST(doc_id AS VARCHAR), ':0')")} AS h
         |  FROM keep)
         |SELECT doc_id, h % 16 AS shard,
         |       CAST(row_number() OVER (
         |         PARTITION BY h % 16 ORDER BY h, doc_id) - 1 AS BIGINT)
         |         AS pos
         |FROM h""".stripMargin,

    "q_dedup_best" ->
      s"""WITH RECURSIVE $minhashPairsCtes,
         |edges AS (SELECT id_a AS a, id_b AS b FROM pairs
         |          UNION SELECT id_b, id_a FROM pairs),
         |reach AS (
         |  SELECT a AS n, b AS r FROM edges
         |  UNION
         |  SELECT reach.n, g.b FROM reach JOIN edges g ON reach.r = g.a
         |),
         |mc AS (SELECT n, least(n, min(r)) AS cl FROM reach GROUP BY n),
         |m AS (SELECT mc.n, mc.cl,
         |        CAST(CASE WHEN length(trim(text)) = 0 THEN 0
         |             ELSE len(regexp_split_to_array(trim(text), '\\s+')) END
         |          AS BIGINT) AS nt
         |      FROM mc JOIN documents ON mc.n = doc_id),
         |dropped AS (SELECT n FROM (
         |    SELECT n, row_number() OVER (
         |      PARTITION BY cl ORDER BY nt DESC, n) AS rn FROM m)
         |  WHERE rn > 1)
         |SELECT doc_id, n_chars FROM documents
         |WHERE doc_id NOT IN (SELECT n FROM dropped)""".stripMargin,

    "q_shuffle_shards" ->
      s"""WITH h AS (
         |  SELECT doc_id,
         |    ${duckHash60("concat(CAST(doc_id AS VARCHAR), ':0')")} AS h
         |  FROM documents)
         |SELECT doc_id, h % 64 AS shard,
         |       CAST(row_number() OVER (
         |         PARTITION BY h % 64 ORDER BY h, doc_id) - 1 AS BIGINT)
         |         AS pos
         |FROM h""".stripMargin,

    // bucket identity: Spark groups by xxhash64(minhash tuple), the
    // oracle by the tuple itself — same partition of docs into
    // buckets (a collision would merge two buckets; none at oracle
    // scale, and the green row certifies that)
    "q_lsh_skew" -> {
      val perBand = (0 until 8).map { b =>
        val cols = (b * 4 until (b + 1) * 4).map(i => s"m$i").mkString(", ")
        s"SELECT $b AS band, count(*) AS c FROM sigs GROUP BY $cols"
      }.mkString("\n  UNION ALL\n  ")
      s"""WITH $minhashSigCtes,
         |per AS (
         |  $perBand)
         |SELECT band, count(*) AS n_buckets, max(c) AS max_bucket,
         |       CAST(sum(c * (c - 1)) // 2 AS BIGINT) AS n_cand_pairs
         |FROM per GROUP BY band""".stripMargin
    },

    "q_dup_chunks" ->
      s"""WITH toks AS (
         |  SELECT doc_id, regexp_split_to_array(
         |    regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS t
         |  FROM documents),
         |ch AS (
         |  SELECT doc_id,
         |    unnest(list_transform(
         |      range(0, CAST(ceil(len(t) / 32.0) AS INT)),
         |      i -> list_reduce(list_prepend(CAST(0 AS BIGINT),
         |             list_transform(t[i*32+1 : (i+1)*32],
         |               s -> ${duckHash60("s")} % 1000003)),
         |           (a, b) -> (a * 31 + b) % 2147483647))) AS ch
         |  FROM toks),
         |freq AS (SELECT ch AS fch, count(DISTINCT doc_id) AS n_docs
         |         FROM ch GROUP BY ch)
         |SELECT doc_id, count(*) AS n_chunks,
         |       CAST(sum(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END)
         |         AS BIGINT) AS n_dup_chunks,
         |       round(CAST(sum(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END)
         |         AS DOUBLE) / count(*), 6) AS dup_chunk_frac
         |FROM ch JOIN freq ON ch.ch = freq.fch
         |GROUP BY doc_id""".stripMargin,

    "q_winnow_dup" ->
      s"""WITH toks AS (
         |  SELECT doc_id, regexp_split_to_array(
         |    regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS t
         |  FROM documents),
         |grams AS (
         |  SELECT doc_id,
         |    unnest(range(1, greatest(len(t) - 8 + 1, 0) + 1)) AS pos,
         |    unnest(CASE WHEN len(t) >= 8 THEN
         |      [${duckHash60("array_to_string(t[i:i+7], ' ')")} % 1000003
         |       FOR i IN range(1, len(t) - 6)]
         |      ELSE [] END) AS h
         |  FROM toks),
         |wins AS (
         |  SELECT doc_id,
         |    min(h) OVER (PARTITION BY doc_id ORDER BY pos
         |                 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS fp,
         |    pos
         |  FROM grams),
         |fps AS (SELECT DISTINCT doc_id, fp FROM wins WHERE pos >= 4)
         |SELECT fp, count(*) AS n_docs,
         |       min(doc_id) AS min_doc, max(doc_id) AS max_doc
         |FROM fps GROUP BY fp HAVING count(*) > 1""".stripMargin,

    "q_dup_chunks_cdc" ->
      s"""WITH $cdcFpCtes,
         |f AS (SELECT * FROM fp WHERE n_tokens >= 8),
         |freq AS (SELECT chunk_hash AS fch, count(DISTINCT doc_id) AS n_docs
         |         FROM f GROUP BY chunk_hash)
         |SELECT doc_id,
         |       CAST(sum(n_tokens) AS BIGINT) AS n_tokens_considered,
         |       CAST(sum(CASE WHEN n_docs >= 2 THEN n_tokens ELSE 0 END)
         |         AS BIGINT) AS n_dup_tokens,
         |       round(CAST(sum(CASE WHEN n_docs >= 2 THEN n_tokens ELSE 0 END)
         |         AS DOUBLE) / sum(n_tokens), 6) AS dup_token_frac
         |FROM f JOIN freq ON f.chunk_hash = freq.fch
         |GROUP BY doc_id""".stripMargin,

    // exact duplicated-span annotation: the oracle joins gram STRINGS
    // (the contamination convention — certifies the engine's 60-bit
    // gram hashes collision-free), then replays the gaps-and-islands
    // span merge and the exact integer coverage arithmetic
    "q_span_dedup" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS t
        |  FROM documents),
        |pos AS (
        |  SELECT doc_id, t, unnest(range(1, len(t) - 13 + 2)) AS p
        |  FROM toks WHERE len(t) >= 13),
        |grams AS (
        |  SELECT doc_id, p, array_to_string(t[p : p + 12], ' ') AS g
        |  FROM pos),
        |freq AS (
        |  SELECT g AS fg FROM (SELECT DISTINCT doc_id, g FROM grams)
        |  GROUP BY g HAVING count(*) >= 2),
        |dup AS (SELECT doc_id, p FROM grams
        |        WHERE g IN (SELECT fg FROM freq)),
        |brk AS (
        |  SELECT doc_id, p,
        |    CASE WHEN p - lag(p) OVER (PARTITION BY doc_id ORDER BY p)
        |           > 13 THEN 1 ELSE 0 END AS b
        |  FROM dup),
        |isl AS (
        |  SELECT doc_id, p,
        |    sum(b) OVER (PARTITION BY doc_id ORDER BY p) AS island
        |  FROM brk),
        |per_island AS (
        |  SELECT doc_id, island, max(p) - min(p) + 13 AS covered
        |  FROM isl GROUP BY doc_id, island),
        |per_doc AS (
        |  SELECT doc_id, count(*) AS n_spans,
        |         CAST(sum(covered) AS BIGINT) AS dup_tokens
        |  FROM per_island GROUP BY doc_id)
        |SELECT t.doc_id, CAST(len(t.t) AS BIGINT) AS n_tokens,
        |       CAST(coalesce(d.n_spans, 0) AS BIGINT) AS n_spans,
        |       CAST(coalesce(d.dup_tokens, 0) AS BIGINT) AS dup_tokens,
        |       CAST(coalesce(d.dup_tokens, 0) * 1000000 // len(t.t)
        |         AS BIGINT) AS dup_ppm
        |FROM toks t LEFT JOIN per_doc d USING (doc_id)""".stripMargin,

    // the scrub replay: same toks/grams/freq CTEs as q_span_dedup,
    // plus the global-first winner (row_number over (doc_id, p) per
    // dup gram), non-winning islands → disjoint cut intervals,
    // positional anti-join, and a per-doc ordered string_agg rebuild
    "q_span_scrub" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS t
        |  FROM documents),
        |pos AS (
        |  SELECT doc_id, t, unnest(range(1, len(t) - 13 + 2)) AS p
        |  FROM toks WHERE len(t) >= 13),
        |grams AS (
        |  SELECT doc_id, p, array_to_string(t[p : p + 12], ' ') AS g
        |  FROM pos),
        |freq AS (
        |  SELECT g AS fg FROM (SELECT DISTINCT doc_id, g FROM grams)
        |  GROUP BY g HAVING count(*) >= 2),
        |occ AS (SELECT doc_id, p, g FROM grams
        |        WHERE g IN (SELECT fg FROM freq)),
        |firsts AS (
        |  SELECT g, doc_id AS fd, p AS fp FROM (
        |    SELECT g, doc_id, p,
        |      row_number() OVER (PARTITION BY g ORDER BY doc_id, p) AS rn
        |    FROM occ) WHERE rn = 1),
        |nonwin AS (
        |  SELECT o.doc_id, o.p FROM occ o JOIN firsts f ON o.g = f.g
        |  WHERE NOT (o.doc_id = f.fd AND o.p = f.fp)),
        |brk AS (
        |  SELECT doc_id, p,
        |    CASE WHEN p - lag(p) OVER (PARTITION BY doc_id ORDER BY p)
        |           > 13 THEN 1 ELSE 0 END AS b
        |  FROM nonwin),
        |isl AS (
        |  SELECT doc_id, p,
        |    sum(b) OVER (PARTITION BY doc_id ORDER BY p) AS island
        |  FROM brk),
        |cuts AS (
        |  SELECT doc_id, min(p) AS s, max(p) + 12 AS e
        |  FROM isl GROUP BY doc_id, island),
        |covered AS (
        |  SELECT c.doc_id, u.i FROM cuts c,
        |    LATERAL unnest(range(c.s, c.e + 1)) u(i)),
        |tokpos AS (
        |  SELECT doc_id, t, unnest(range(1, len(t) + 1)) AS i
        |  FROM toks),
        |keep AS (
        |  SELECT tp.doc_id, tp.i, tp.t[tp.i] AS tok
        |  FROM tokpos tp LEFT JOIN covered c
        |    ON c.doc_id = tp.doc_id AND c.i = tp.i
        |  WHERE c.i IS NULL)
        |SELECT tk.doc_id, CAST(len(tk.t) AS BIGINT) AS n_tokens,
        |  CAST(coalesce(k.kept, 0) AS BIGINT) AS kept_tokens,
        |  coalesce(k.txt, '') AS scrubbed_text
        |FROM toks tk LEFT JOIN (
        |  SELECT doc_id, count(*) AS kept,
        |         string_agg(tok, ' ' ORDER BY i) AS txt
        |  FROM keep GROUP BY doc_id) k USING (doc_id)""".stripMargin,

    "q_gopher_rules" -> {
      val stopSum = graft.ext.TextAnalysis.GopherStops.map(w =>
        s"CASE WHEN regexp_matches(lower(text), '\\b$w\\b') THEN 1 ELSE 0 END")
        .mkString(" + ")
      s"""WITH base AS (
         |  SELECT doc_id, text,
         |    regexp_split_to_array(
         |      regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS t,
         |    string_split(text, chr(10)) AS ls
         |  FROM documents),
         |s AS (
         |  SELECT doc_id,
         |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
         |         ELSE len(regexp_split_to_array(trim(text), '\\s+')) END
         |      AS BIGINT) AS n_words,
         |    CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_transform(t, x -> CAST(length(x) AS BIGINT))),
         |      (a, b) -> a + b) AS BIGINT) AS sum_len,
         |    CAST(len(regexp_extract_all(text, '#'))
         |       + len(regexp_extract_all(text, '\\.\\.\\.')) AS BIGINT) AS n_sym,
         |    CAST(len(ls) AS BIGINT) AS n_lines,
         |    CAST(len(list_filter(ls,
         |      l -> substr(ltrim(l), 1, 1) IN ('-', '*', '•'))) AS BIGINT)
         |      AS n_bullet,
         |    CAST(len(list_filter(ls, l -> ends_with(rtrim(l), '...')))
         |      AS BIGINT) AS n_ell,
         |    CAST(len(list_filter(t, x -> regexp_matches(x, '[a-z]')))
         |      AS BIGINT) AS n_alpha,
         |    CAST($stopSum AS BIGINT) AS n_stop_kinds
         |  FROM base),
         |r AS (
         |  SELECT doc_id, n_words,
         |    round(CAST(sum_len AS DOUBLE) / greatest(n_words, 1), 6)
         |      AS mean_word_len,
         |    round(CAST(n_sym AS DOUBLE) / greatest(n_words, 1), 6)
         |      AS symbol_ratio,
         |    round(CAST(n_bullet AS DOUBLE) / n_lines, 6) AS bullet_line_frac,
         |    round(CAST(n_ell AS DOUBLE) / n_lines, 6) AS ellipsis_line_frac,
         |    round(CAST(n_alpha AS DOUBLE) / greatest(n_words, 1), 6)
         |      AS alpha_word_frac,
         |    n_stop_kinds
         |  FROM s)
         |SELECT doc_id, n_words, mean_word_len, symbol_ratio,
         |  bullet_line_frac, ellipsis_line_frac, alpha_word_frac,
         |  n_stop_kinds,
         |  CAST(CASE WHEN n_words >= 20 AND n_words <= 100000
         |    AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
         |    AND symbol_ratio <= 0.1 AND bullet_line_frac <= 0.9
         |    AND ellipsis_line_frac <= 0.3 AND alpha_word_frac >= 0.8
         |    AND n_stop_kinds >= 2 THEN 1 ELSE 0 END AS BIGINT)
         |    AS gopher_pass
         |FROM r""".stripMargin
    },

    // the Gopher repetition battery: the per-n gram CTEs are generated
    // programmatically; duplicate coverage replays the engine's
    // gaps-and-islands merge on gram STRINGS (the q_span_dedup
    // convention) and the top-gram tie-break (count desc, gram asc)
    "q_gopher_repetition" -> {
      val topNs = 2 to 4
      val dupNs = 5 to 10
      val gramCtes = (topNs ++ dupNs).map { n =>
        s"""g$n AS (
           |  SELECT doc_id, p, array_to_string(t[p : p + ${n - 1}], ' ') AS g
           |  FROM (SELECT doc_id, t, unnest(range(1, len(t) - $n + 2)) AS p
           |        FROM toks WHERE len(t) >= $n))""".stripMargin
      }
      val topCtes = topNs.map { n =>
        s"""top$n AS (
           |  SELECT doc_id, CAST(c * length(g) AS BIGINT) AS top${n}_chars
           |  FROM (SELECT doc_id, g, count(*) AS c,
           |          row_number() OVER (PARTITION BY doc_id
           |            ORDER BY count(*) DESC, g) AS rn
           |        FROM g$n GROUP BY doc_id, g)
           |  WHERE rn = 1)""".stripMargin
      }
      val dupCtes = dupNs.map { n =>
        s"""cov$n AS (
           |  SELECT i.doc_id, CAST(sum(length(array_to_string(
           |           tk.t[i.a : i.b], ' '))) AS BIGINT) AS dup${n}_chars
           |  FROM (SELECT doc_id, island, min(p) AS a, max(p) + ${n - 1} AS b
           |        FROM (SELECT doc_id, p, sum(brk) OVER
           |                (PARTITION BY doc_id ORDER BY p) AS island
           |              FROM (SELECT doc_id, p,
           |                      CASE WHEN p - lag(p) OVER
           |                          (PARTITION BY doc_id ORDER BY p)
           |                        > ${n - 1} THEN 1 ELSE 0 END AS brk
           |                    FROM (SELECT doc_id, p FROM
           |                      (SELECT doc_id, p, count(*) OVER
           |                         (PARTITION BY doc_id, g) AS c FROM g$n)
           |                      WHERE c >= 2)))
           |        GROUP BY doc_id, island) i
           |  JOIN toks tk ON tk.doc_id = i.doc_id
           |  GROUP BY i.doc_id)""".stripMargin
      }
      val topSel = topNs.map(n =>
        s"CAST((coalesce(top${n}_chars, 0) * 1000000) // " +
          s"greatest(coalesce(total_chars, 0), 1) AS BIGINT) " +
          s"AS top${n}_char_ppm")
      val dupSel = dupNs.map(n =>
        s"CAST((coalesce(dup${n}_chars, 0) * 1000000) // " +
          s"greatest(coalesce(total_chars, 0), 1) AS BIGINT) " +
          s"AS dup${n}_char_ppm")
      val joins = (topNs.map(n => s"LEFT JOIN top$n USING (doc_id)") ++
        dupNs.map(n => s"LEFT JOIN cov$n USING (doc_id)"))
        .mkString("\n")
      s"""WITH toks AS (
         |  SELECT doc_id, regexp_split_to_array(
         |    regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS t
         |  FROM documents),
         |base AS (
         |  SELECT doc_id,
         |    CAST(length(array_to_string(t, ' ')) AS BIGINT) AS total_chars
         |  FROM toks),
         |${(gramCtes ++ topCtes ++ dupCtes).mkString(",\n")},
         |lin AS (
         |  SELECT doc_id, line FROM (
         |    SELECT doc_id,
         |      unnest(string_split(coalesce(text, ''), chr(10))) AS line
         |    FROM documents)
         |  WHERE length(trim(line)) > 0),
         |lstat AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines,
         |    CAST(sum(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS dup_lines,
         |    CAST(sum(length(line)) AS BIGINT) AS line_chars,
         |    CAST(sum(CASE WHEN c >= 2 THEN length(line) ELSE 0 END)
         |      AS BIGINT) AS dup_line_chars
         |  FROM (SELECT doc_id, line, count(*) OVER
         |          (PARTITION BY doc_id, line) AS c FROM lin)
         |  GROUP BY doc_id)
         |SELECT base.doc_id, total_chars,
         |  ${(topSel ++ dupSel).mkString(",\n  ")},
         |  CAST((coalesce(dup_lines, 0) * 1000000) //
         |    greatest(coalesce(n_lines, 0), 1) AS BIGINT) AS dup_line_ppm,
         |  CAST((coalesce(dup_line_chars, 0) * 1000000) //
         |    greatest(coalesce(line_chars, 0), 1) AS BIGINT)
         |    AS dup_line_char_ppm
         |FROM base
         |$joins
         |LEFT JOIN lstat USING (doc_id)""".stripMargin
    },

    "q_quality_classifier" -> {
      val bucket = s"${duckHash60("tok")} % 4096"
      val weight =
        s"${duckHash60(s"concat('clf:', CAST($bucket AS VARCHAR))")} % 2001 - 1000"
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(regexp_split_to_array(
         |    regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS tok
         |  FROM documents),
         |w AS (SELECT doc_id, CAST($weight AS BIGINT) AS w_milli FROM toks)
         |SELECT doc_id, count(*) AS n_tokens,
         |  CAST(sum(w_milli) AS BIGINT) AS w_sum_milli,
         |  round(1.0 / (1.0 + exp(-CAST(sum(w_milli) AS DOUBLE)
         |    / (count(*) * 1000.0))), 6) AS score,
         |  CAST(CASE WHEN sum(w_milli) >= 0 THEN 1 ELSE 0 END AS BIGINT)
         |    AS clf_keep
         |FROM w GROUP BY doc_id""".stripMargin
    },

    // outlier test replayed from the same exact integer sufficient
    // statistics: (n−1)·(n·x−S1)² > 4·n·(n·S2−S1²) with every operand
    // CAST to DOUBLE first and the identical left-assoc operation
    // order as the engine — bit-for-bit on any IEEE-754 evaluator
    "q_zscore_outliers" ->
      """WITH d AS (SELECT lang, CAST(n_chars AS BIGINT) AS x
        |           FROM documents),
        |st AS (SELECT lang, count(*) AS n,
        |              CAST(sum(x) AS BIGINT) AS s1,
        |              CAST(sum(x * x) AS BIGINT) AS s2
        |       FROM d GROUP BY lang),
        |f AS (SELECT d.lang, d.x,
        |        CASE WHEN (CAST(n AS DOUBLE) - 1.0)
        |               * (CAST(n AS DOUBLE) * CAST(x AS DOUBLE)
        |                  - CAST(s1 AS DOUBLE))
        |               * (CAST(n AS DOUBLE) * CAST(x AS DOUBLE)
        |                  - CAST(s1 AS DOUBLE))
        |             > 4.0 * CAST(n AS DOUBLE)
        |               * (CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
        |                  - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
        |        THEN 1 ELSE 0 END AS is_out
        |      FROM d JOIN st USING (lang))
        |SELECT lang, count(*) AS n_rows,
        |       CAST(sum(is_out) AS BIGINT) AS n_outliers,
        |       CAST(sum(CASE WHEN is_out = 1 THEN x ELSE 0 END)
        |         AS BIGINT) AS outlier_sum
        |FROM f GROUP BY lang""".stripMargin,

    "q_ppl_buckets" ->
      s"""WITH $duckPplMetricCtes
         |SELECT doc_id, lang, n_tokens, mu_unats,
         |  CASE ntile(3) OVER (PARTITION BY lang ORDER BY mu_unats, doc_id)
         |    WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END
         |    AS ppl_bucket
         |FROM j""".stripMargin,

    // replay of the approx-cutoff contract (Assemble.pplBucketsApprox):
    // below the GK sketch's compression threshold the cutoff IS the
    // element at rank ceil(p·n) of the salted unique key — selected
    // here exactly. `1.0/3` stays a double product on both sides so
    // the ceil sees the identical IEEE value Spark's sketch computed.
    "q_ppl_buckets_approx" ->
      s"""WITH $duckPplMetricCtes,
         |u AS (SELECT doc_id, lang, n_tokens, mu_unats,
         |        mu_unats * 1048576 + (doc_id % 1048576) AS ukey FROM j),
         |r AS (SELECT lang, ukey,
         |        row_number() OVER (PARTITION BY lang ORDER BY ukey) AS rnk,
         |        count(*) OVER (PARTITION BY lang) AS n
         |      FROM u),
         |cuts AS (SELECT lang,
         |    max(CASE WHEN rnk = CAST(ceil((1.0/3) * n) AS BIGINT)
         |        THEN ukey END) AS c33,
         |    max(CASE WHEN rnk = CAST(ceil((2.0/3) * n) AS BIGINT)
         |        THEN ukey END) AS c67
         |  FROM r GROUP BY lang)
         |SELECT doc_id, lang, n_tokens, mu_unats,
         |  CASE WHEN ukey <= c33 THEN 'head'
         |       WHEN ukey <= c67 THEN 'middle' ELSE 'tail' END AS ppl_bucket
         |FROM u JOIN cuts USING (lang)""".stripMargin,

    "q_encoding" ->
      """WITH d AS (
        |  SELECT doc_id, text ||
        |    CASE WHEN doc_id % 7 = 0 THEN '�' ELSE '' END ||
        |    CASE WHEN doc_id % 5 = 0 THEN chr(7) ELSE '' END AS text
        |  FROM documents)
        |SELECT doc_id, CAST(length(text) AS INTEGER) AS n_chars,
        |  CAST(len(regexp_extract_all(text, '�')) AS BIGINT)
        |    AS n_replacement,
        |  CAST(len(regexp_extract_all(text,
        |    '[\x00-\x08\x0B\x0C\x0E-\x1F]')) AS BIGINT) AS n_control,
        |  CAST(CASE WHEN len(regexp_extract_all(text, '�')) = 0
        |    AND len(regexp_extract_all(text,
        |      '[\x00-\x08\x0B\x0C\x0E-\x1F]')) * 100 <= length(text)
        |    THEN 1 ELSE 0 END AS BIGINT) AS enc_clean
        |FROM d""".stripMargin,

    // blob bytes are the utf-8 text (Multimodal.synthesize), so
    // DuckDB's sha256(VARCHAR) hashes the same byte stream Spark's
    // sha2(binary) does; media_id is the STRING doc_id, so the
    // keeper min is lexicographic on both sides
    "q_media_dedup" ->
      """WITH d AS (
        |  SELECT a.doc_id, b.text
        |  FROM (SELECT doc_id,
        |          CASE WHEN doc_id % 10 = 7 THEN doc_id - 7
        |               ELSE doc_id END AS src_id
        |        FROM documents) a
        |  JOIN documents b ON a.src_id = b.doc_id)
        |SELECT sha256(text) AS sha, count(*) AS n_copies,
        |       min(CAST(doc_id AS VARCHAR)) AS keeper_id
        |FROM d GROUP BY 1""".stripMargin,

    // dHash replay at PER-PIXEL granularity from the synthesis
    // formula: same luma weights, same (x·9 div w, y·8 div h) box
    // partition, same floor-milli cells, same hi/lo 32-bit packing,
    // same hamming ≤ 3 cut; pair order under VARCHAR ids, matching
    // the engine's opaque-string media ids. Twin rows (doc_id%10=0,
    // id||'v') replay the single-pixel vandalism exactly: luma at
    // pixel 0 is 128·(299+587+114) = 128000.
    "q_image_dhash" ->
      s"""WITH $dhashPairsCtes
         |SELECT id_a, id_b, hamming FROM pairs""".stripMargin,

    // the cluster row replays the SAME per-pixel pair derivation, then
    // the recursive reachability closure + component min — transitive,
    // so the oracle covers exactly the engine's "every image with at
    // least one near-duplicate" output set (identical-hash siblings
    // are hamming-0 pairs here, cross-hash edges are the banded ones)
    "q_image_dhash_clusters" ->
      s"""WITH RECURSIVE $dhashPairsCtes,
         |edges AS (SELECT id_a AS a, id_b AS b FROM pairs
         |          UNION SELECT id_b, id_a FROM pairs),
         |reach AS (
         |  SELECT a AS n, b AS r FROM edges
         |  UNION
         |  SELECT reach.n, e.b FROM reach JOIN edges e ON reach.r = e.a
         |)
         |SELECT n AS media_id, least(n, min(r)) AS cluster_id
         |FROM reach GROUP BY n""".stripMargin,

    "q_export_jsonl" ->
      s"""SELECT doc_id % 8 AS shard, count(*) AS n,
         |  CAST(sum(${duckHash60("text")} % 1000003) AS BIGINT) AS h_sum,
         |  min(doc_id) AS min_id, max(doc_id) AS max_id
         |FROM documents GROUP BY 1""".stripMargin,

    "q_url_filter" ->
      """WITH d AS (
        |  SELECT doc_id, 'https://' ||
        |    CASE WHEN doc_id % 11 = 3 THEN '10.0.0.' || (doc_id % 256)
        |         ELSE ['example.com', 'blog.example.com', 'spam.bad',
        |               'news.site', 'files.host'][(doc_id % 5) + 1]
        |    END || '/d' || doc_id || repeat('/s', doc_id % 3) ||
        |    CASE WHEN doc_id % 7 = 0 THEN '?q=' || (doc_id % 13)
        |         ELSE '' END AS url
        |  FROM documents),
        |p AS (
        |  SELECT doc_id,
        |    regexp_extract(url, '^https://([^/?#]+)', 1) AS host,
        |    regexp_extract(url, '^https://[^/?#]+([^?#]*)', 1) AS path,
        |    CASE WHEN url LIKE '%?%' THEN 1 ELSE 0 END AS has_query
        |  FROM d),
        |r AS (
        |  SELECT doc_id, host, path, has_query,
        |    CASE WHEN regexp_matches(host, '^[0-9.]+$') THEN 1 ELSE 0
        |      END AS ip_host,
        |    CASE WHEN regexp_matches(host, '^[0-9.]+$') THEN NULL
        |         ELSE string_split(host, '.')[-2] || '.' ||
        |              string_split(host, '.')[-1] END AS reg_domain
        |  FROM p)
        |SELECT doc_id, host, reg_domain,
        |  CAST(len(list_filter(string_split(path, '/'), x -> x <> ''))
        |    AS INTEGER) AS path_depth,
        |  CAST(has_query AS BIGINT) AS has_query,
        |  CAST(ip_host AS BIGINT) AS ip_host,
        |  CAST(CASE WHEN ip_host = 1
        |         OR reg_domain IN ('spam.bad', 'files.host')
        |       THEN 1 ELSE 0 END AS BIGINT) AS blocked,
        |  CAST(CASE WHEN ip_host = 1
        |         OR reg_domain IN ('spam.bad', 'files.host')
        |       THEN 0 ELSE 1 END AS BIGINT) AS url_ok
        |FROM r""".stripMargin,

    // chr(769)=U+0301 combining acute, chr(778)=U+030A combining
    // ring, chr(233)=precomposed \u00e9; mirrors the engine's doc_id
    // injection exactly
    "q_nfc_normalize" ->
      """WITH d AS (
        |  SELECT doc_id, text ||
        |    CASE WHEN doc_id % 3 = 0 THEN 'e' || chr(769) ELSE '' END ||
        |    CASE WHEN doc_id % 4 = 0 THEN 'A' || chr(778) ELSE '' END ||
        |    CASE WHEN doc_id % 11 = 0 THEN chr(233) ELSE '' END AS text
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(CASE WHEN nfc_normalize(text) <> text THEN 1 ELSE 0 END
        |    AS BIGINT) AS changed,
        |  CAST(length(text) AS INTEGER) AS n_chars_raw,
        |  CAST(length(nfc_normalize(text)) AS INTEGER) AS n_chars_nfc,
        |  md5(nfc_normalize(text)) AS fp_nfc
        |FROM d""".stripMargin,

    "q_char_entropy" ->
      """WITH chars AS (
        |  SELECT doc_id, substr(text, CAST(i AS INTEGER), 1) AS c
        |  FROM (SELECT doc_id, text,
        |          unnest(range(1, length(text) + 1)) AS i
        |        FROM documents)),
        |counts AS (SELECT doc_id, c, count(*) AS n_c FROM chars
        |           GROUP BY doc_id, c),
        |pd AS (SELECT doc_id, CAST(sum(n_c) AS BIGINT) AS n_chars,
        |              count(*) AS n_distinct
        |       FROM counts GROUP BY doc_id),
        |h AS (SELECT doc_id, n_chars, n_distinct,
        |        CAST(sum(n_c * CAST(floor(
        |          -ln(CAST(n_c AS DOUBLE) / n_chars) * 1000000)
        |          AS BIGINT)) AS BIGINT) AS h_sum
        |      FROM counts JOIN pd USING (doc_id)
        |      GROUP BY doc_id, n_chars, n_distinct)
        |SELECT doc_id, n_chars, n_distinct,
        |  CAST(h_sum // n_chars AS BIGINT) AS entropy_unats
        |FROM h""".stripMargin,

    // the fused annotator must equal the JOIN of the six individual
    // replays — each CTE block below is the corresponding standalone
    // oracle verbatim (prefixed to avoid CTE collisions), joined on
    // doc_id, plus the composite keep CASE
    "q_quality_fused" -> {
      val stopSum = graft.ext.TextAnalysis.GopherStops.map(w =>
        s"CASE WHEN regexp_matches(lower(text), '\\b$w\\b') THEN 1 ELSE 0 END")
        .mkString(" + ")
      s"""WITH g_base AS (
         |  SELECT doc_id, text,
         |    regexp_split_to_array(
         |      regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS t,
         |    string_split(text, chr(10)) AS ls
         |  FROM documents),
         |g_s AS (
         |  SELECT doc_id,
         |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
         |         ELSE len(regexp_split_to_array(trim(text), '\\s+')) END
         |      AS BIGINT) AS n_words,
         |    CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_transform(t, x -> CAST(length(x) AS BIGINT))),
         |      (a, b) -> a + b) AS BIGINT) AS sum_len,
         |    CAST(len(regexp_extract_all(text, '#'))
         |       + len(regexp_extract_all(text, '\\.\\.\\.')) AS BIGINT) AS n_sym,
         |    CAST(len(ls) AS BIGINT) AS n_lines,
         |    CAST(len(list_filter(ls,
         |      l -> substr(ltrim(l), 1, 1) IN ('-', '*', '•'))) AS BIGINT)
         |      AS n_bullet,
         |    CAST(len(list_filter(ls, l -> ends_with(rtrim(l), '...')))
         |      AS BIGINT) AS n_ell,
         |    CAST(len(list_filter(t, x -> regexp_matches(x, '[a-z]')))
         |      AS BIGINT) AS n_alpha,
         |    CAST($stopSum AS BIGINT) AS n_stop_kinds
         |  FROM g_base),
         |g AS (
         |  SELECT doc_id, n_words,
         |    round(CAST(sum_len AS DOUBLE) / greatest(n_words, 1), 6)
         |      AS mean_word_len,
         |    round(CAST(n_sym AS DOUBLE) / greatest(n_words, 1), 6)
         |      AS symbol_ratio,
         |    round(CAST(n_bullet AS DOUBLE) / n_lines, 6) AS bullet_line_frac,
         |    round(CAST(n_ell AS DOUBLE) / n_lines, 6) AS ellipsis_line_frac,
         |    round(CAST(n_alpha AS DOUBLE) / greatest(n_words, 1), 6)
         |      AS alpha_word_frac,
         |    n_stop_kinds
         |  FROM g_s),
         |rp_toks AS (
         |  SELECT doc_id, regexp_split_to_array(
         |    regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS t
         |  FROM documents),
         |rp_flat AS (SELECT doc_id, unnest(range(1, len(t) + 1)) AS pos,
         |                   unnest(t) AS tok FROM rp_toks),
         |rp_tokc AS (SELECT doc_id, tok, count(*) AS c FROM rp_flat
         |            GROUP BY doc_id, tok),
         |rp_tt AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
         |                 count(*) AS n_distinct, max(c) AS top_tok_n
         |          FROM rp_tokc GROUP BY doc_id),
         |rp_gr AS (SELECT doc_id, tok || ' ' ||
         |            lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS g
         |          FROM rp_flat),
         |rp_gc AS (SELECT doc_id, max(c) AS top_2gram_n FROM
         |           (SELECT doc_id, g, count(*) AS c FROM rp_gr
         |            WHERE g IS NOT NULL GROUP BY doc_id, g)
         |          GROUP BY doc_id),
         |rp_rn AS (SELECT doc_id, pos, tok,
         |            CASE WHEN lag(tok) OVER (PARTITION BY doc_id ORDER BY pos)
         |                   IS NULL
         |                 OR lag(tok) OVER (PARTITION BY doc_id ORDER BY pos)
         |                   <> tok
         |                 THEN 1 ELSE 0 END AS chg
         |          FROM rp_flat),
         |rp_sg AS (SELECT doc_id, sum(chg) OVER (PARTITION BY doc_id
         |            ORDER BY pos ROWS UNBOUNDED PRECEDING) AS seg
         |          FROM rp_rn),
         |rp_rs AS (SELECT doc_id, max(c) AS max_run FROM
         |           (SELECT doc_id, seg, count(*) AS c FROM rp_sg
         |            GROUP BY doc_id, seg)
         |          GROUP BY doc_id),
         |rp AS (
         |  SELECT t.doc_id, t.n_tokens, t.n_distinct, t.top_tok_n,
         |         COALESCE(gg.top_2gram_n, 0) AS top_2gram_n, r.max_run,
         |         round(1.0 - CAST(t.n_distinct AS DOUBLE) / t.n_tokens, 6)
         |           AS dup_tok_frac
         |  FROM rp_tt t LEFT JOIN rp_gc gg USING (doc_id)
         |  LEFT JOIN rp_rs r USING (doc_id)),
         |en_chars AS (
         |  SELECT doc_id, substr(text, CAST(i AS INTEGER), 1) AS c
         |  FROM (SELECT doc_id, text,
         |          unnest(range(1, length(text) + 1)) AS i
         |        FROM documents)),
         |en_counts AS (SELECT doc_id, c, count(*) AS n_c FROM en_chars
         |              GROUP BY doc_id, c),
         |en_pd AS (SELECT doc_id, CAST(sum(n_c) AS BIGINT) AS n_chars,
         |                 count(*) AS n_distinct
         |          FROM en_counts GROUP BY doc_id),
         |en_h AS (SELECT doc_id, n_chars, n_distinct,
         |           CAST(sum(n_c * CAST(floor(
         |             -ln(CAST(n_c AS DOUBLE) / n_chars) * 1000000)
         |             AS BIGINT)) AS BIGINT) AS h_sum
         |         FROM en_counts JOIN en_pd USING (doc_id)
         |         GROUP BY doc_id, n_chars, n_distinct),
         |en AS (SELECT doc_id, n_chars AS ent_n_chars,
         |              n_distinct AS ent_n_distinct,
         |              CAST(h_sum // n_chars AS BIGINT) AS entropy_unats
         |       FROM en_h),
         |ec_d AS (
         |  SELECT doc_id, text ||
         |    CASE WHEN doc_id % 7 = 0 THEN '�' ELSE '' END ||
         |    CASE WHEN doc_id % 5 = 0 THEN chr(7) ELSE '' END AS text
         |  FROM documents),
         |ec AS (
         |  SELECT doc_id, CAST(length(text) AS INTEGER) AS enc_n_chars,
         |    CAST(len(regexp_extract_all(text, '�')) AS BIGINT)
         |      AS n_replacement,
         |    CAST(len(regexp_extract_all(text,
         |      '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]')) AS BIGINT) AS n_control,
         |    CAST(CASE WHEN len(regexp_extract_all(text, '�')) = 0
         |      AND len(regexp_extract_all(text,
         |        '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]')) * 100 <= length(text)
         |      THEN 1 ELSE 0 END AS BIGINT) AS enc_clean
         |  FROM ec_d),
         |c4_base AS (
         |  SELECT doc_id, string_split(text, chr(10)) AS ls FROM documents),
         |c4_k AS (
         |  SELECT doc_id, ls,
         |    list_filter(ls, l ->
         |      substr(rtrim(l), -1, 1) IN ('.', '!', '?', '"')
         |      AND CASE WHEN length(trim(l)) = 0 THEN 0
         |          ELSE len(regexp_split_to_array(trim(l), '\\s+')) END >= 5
         |      AND NOT contains(lower(l), 'javascript')
         |      AND NOT contains(l, '{')
         |      AND NOT contains(lower(l), 'lorem ipsum')) AS kept
         |  FROM c4_base),
         |c4 AS (
         |  SELECT doc_id,
         |    coalesce(array_to_string(kept, chr(10)), '') AS cleaned,
         |    CAST(len(ls) AS BIGINT) AS n_lines,
         |    CAST(len(kept) AS BIGINT) AS n_kept
         |  FROM c4_k),
         |u_d AS (
         |  SELECT doc_id, 'https://' ||
         |    CASE WHEN doc_id % 11 = 3 THEN '10.0.0.' || (doc_id % 256)
         |         ELSE ['example.com', 'blog.example.com', 'spam.bad',
         |               'news.site', 'files.host'][(doc_id % 5) + 1]
         |    END || '/d' || doc_id || repeat('/s', doc_id % 3) ||
         |    CASE WHEN doc_id % 7 = 0 THEN '?q=' || (doc_id % 13)
         |         ELSE '' END AS url
         |  FROM documents),
         |u_p AS (
         |  SELECT doc_id,
         |    regexp_extract(url, '^https://([^/?#]+)', 1) AS host,
         |    regexp_extract(url, '^https://[^/?#]+([^?#]*)', 1) AS path,
         |    CASE WHEN url LIKE '%?%' THEN 1 ELSE 0 END AS has_query
         |  FROM u_d),
         |u_r AS (
         |  SELECT doc_id, host, path, has_query,
         |    CASE WHEN regexp_matches(host, '^[0-9.]+$$') THEN 1 ELSE 0
         |      END AS ip_host,
         |    CASE WHEN regexp_matches(host, '^[0-9.]+$$') THEN NULL
         |         ELSE string_split(host, '.')[-2] || '.' ||
         |              string_split(host, '.')[-1] END AS reg_domain
         |  FROM u_p),
         |u AS (
         |  SELECT doc_id, host, reg_domain,
         |    CAST(len(list_filter(string_split(path, '/'), x -> x <> ''))
         |      AS INTEGER) AS path_depth,
         |    CAST(has_query AS BIGINT) AS has_query,
         |    CAST(ip_host AS BIGINT) AS ip_host,
         |    CAST(CASE WHEN ip_host = 1
         |           OR reg_domain IN ('spam.bad', 'files.host')
         |         THEN 1 ELSE 0 END AS BIGINT) AS blocked,
         |    CAST(CASE WHEN ip_host = 1
         |           OR reg_domain IN ('spam.bad', 'files.host')
         |         THEN 0 ELSE 1 END AS BIGINT) AS url_ok
         |  FROM u_r),
         |j AS (
         |  SELECT g.doc_id, g.n_words, g.mean_word_len, g.symbol_ratio,
         |    g.bullet_line_frac, g.ellipsis_line_frac, g.alpha_word_frac,
         |    g.n_stop_kinds,
         |    CAST(CASE WHEN g.n_words >= 20 AND g.n_words <= 100000
         |      AND g.mean_word_len >= 3.0 AND g.mean_word_len <= 10.0
         |      AND g.symbol_ratio <= 0.1 AND g.bullet_line_frac <= 0.9
         |      AND g.ellipsis_line_frac <= 0.3 AND g.alpha_word_frac >= 0.8
         |      AND g.n_stop_kinds >= 2 THEN 1 ELSE 0 END AS BIGINT)
         |      AS gopher_pass,
         |    rp.n_tokens, rp.n_distinct, rp.top_tok_n, rp.top_2gram_n,
         |    rp.max_run, rp.dup_tok_frac,
         |    en.ent_n_chars, en.ent_n_distinct, en.entropy_unats,
         |    ec.enc_n_chars, ec.n_replacement, ec.n_control, ec.enc_clean,
         |    c4.cleaned, c4.n_lines, c4.n_kept,
         |    CAST(CASE WHEN c4.n_kept >= 1 THEN 1 ELSE 0 END AS BIGINT)
         |      AS c4_keep,
         |    u.host, u.reg_domain, u.path_depth, u.has_query, u.ip_host,
         |    u.blocked, u.url_ok
         |  FROM g LEFT JOIN rp USING (doc_id) LEFT JOIN en USING (doc_id)
         |  LEFT JOIN ec USING (doc_id) LEFT JOIN c4 USING (doc_id)
         |  LEFT JOIN u USING (doc_id))
         |SELECT j.*,
         |  CAST(CASE WHEN gopher_pass = 1 AND c4_keep = 1 AND enc_clean = 1
         |    AND dup_tok_frac <= 0.5 AND max_run <= 20
         |    AND entropy_unats >= 1000000 AND url_ok = 1
         |    THEN 1 ELSE 0 END AS BIGINT) AS quality_keep
         |FROM j""".stripMargin
    },

    "q_c4_lines" ->
      """WITH base AS (
        |  SELECT doc_id, string_split(text, chr(10)) AS ls FROM documents),
        |k AS (
        |  SELECT doc_id, ls,
        |    list_filter(ls, l ->
        |      substr(rtrim(l), -1, 1) IN ('.', '!', '?', '"')
        |      AND CASE WHEN length(trim(l)) = 0 THEN 0
        |          ELSE len(regexp_split_to_array(trim(l), '\s+')) END >= 5
        |      AND NOT contains(lower(l), 'javascript')
        |      AND NOT contains(l, '{')
        |      AND NOT contains(lower(l), 'lorem ipsum')) AS kept
        |  FROM base)
        |SELECT doc_id,
        |  coalesce(array_to_string(kept, chr(10)), '') AS cleaned,
        |  CAST(len(ls) AS BIGINT) AS n_lines,
        |  CAST(len(kept) AS BIGINT) AS n_kept,
        |  CAST(CASE WHEN len(kept) >= 1 THEN 1 ELSE 0 END AS BIGINT)
        |    AS c4_keep
        |FROM k""".stripMargin,

    "q_bpe_pairs" ->
      """WITH toks AS (
        |  SELECT unnest(regexp_split_to_array(
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS w
        |  FROM documents),
        |types AS (SELECT w, count(*) AS freq FROM toks
        |          WHERE length(w) > 0 GROUP BY w),
        |p AS (SELECT substr(w, CAST(i AS INTEGER), 2) AS pair, freq
        |      FROM (SELECT w, freq, unnest(range(1, length(w))) AS i
        |            FROM types WHERE length(w) >= 2))
        |SELECT pair, CAST(sum(freq) AS BIGINT) AS n
        |FROM p GROUP BY pair HAVING sum(freq) >= 5""".stripMargin,

    "q_oov_rate" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS tok
        |  FROM documents),
        |freq AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
        |v AS (SELECT tok FROM (
        |        SELECT tok, row_number() OVER (ORDER BY c DESC, tok) AS rn
        |        FROM freq)
        |      WHERE rn <= 100)
        |SELECT doc_id, count(*) AS n_tokens,
        |  CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_oov,
        |  CAST((sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) * 1000000)
        |    // count(*) AS BIGINT) AS oov_ppm
        |FROM toks LEFT JOIN v ON toks.tok = v.tok
        |GROUP BY doc_id""".stripMargin,

    // mean is an exact TRUNCATING integer division — Spark `div`
    // truncates toward zero; replicated sign-explicitly over
    // DuckDB's nonnegative `//`
    "q_embed_meanpool" ->
      """WITH x AS (
        |  SELECT label, CAST(i - 1 AS BIGINT) AS dim,
        |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT)
        |      AS xm
        |  FROM embeddings, LATERAL unnest(range(1, len(embedding) + 1)) t(i)),
        |a AS (SELECT label, dim, count(*) AS n_vecs,
        |        CAST(sum(xm) AS BIGINT) AS sum_micro
        |      FROM x GROUP BY label, dim)
        |SELECT label, dim, n_vecs, sum_micro,
        |  CAST(CASE WHEN sum_micro >= 0 THEN sum_micro // n_vecs
        |       ELSE -((-sum_micro) // n_vecs) END AS BIGINT) AS mean_micro
        |FROM a""".stripMargin,

    "q_corpus_clean" ->
      s"""WITH ta AS ($duckTextAnalysis)
         |SELECT doc_id, lang_guess, quality, n_tokens_ws
         |FROM (SELECT *, row_number() OVER
         |        (PARTITION BY fingerprint ORDER BY doc_id) AS rn
         |      FROM ta
         |      WHERE lang_guess = 'en' AND quality >= 0.5)
         |WHERE rn = 1""".stripMargin,

    "q_text_rolling" ->
      s"""SELECT doc_id,
         |  list_reduce(list_prepend(CAST(0 AS BIGINT),
         |    list_transform(
         |      regexp_split_to_array(
         |        regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '),
         |      t -> ${duckHash60("t")} % 1000003)),
         |    (a, b) -> (a * 31 + b) % 2147483647) AS rolling_hash
         |FROM documents""".stripMargin,

    "q_embed_cosine" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT * FROM e WHERE vec_id % 100 = 0),
        |scored AS (
        |  SELECT q.vec_id AS q_id, e.vec_id AS n_id,
        |         list_dot_product(q.v, e.v)
        |           / (sqrt(list_dot_product(q.v, q.v))
        |              * sqrt(list_dot_product(e.v, e.v))) AS s
        |  FROM q JOIN e ON q.vec_id <> e.vec_id)
        |SELECT q_id, n_id, round(s, 6) AS sim FROM scored WHERE s >= 0.3""".stripMargin,

    "q_embed_dedup" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings),
        |dups AS (
        |  SELECT DISTINCT b.vec_id
        |  FROM e a JOIN e b ON a.vec_id < b.vec_id
        |  WHERE list_dot_product(a.v, b.v)
        |    / (sqrt(list_dot_product(a.v, a.v))
        |       * sqrt(list_dot_product(b.v, b.v))) >= 0.4)
        |SELECT vec_id, label FROM e
        |WHERE vec_id NOT IN (SELECT vec_id FROM dups)""".stripMargin,

    // exhaustive pair graph -> recursive CC -> integer-micro centroid
    // -> fixed-order cosine -> (sim asc, id asc) keeper — the same
    // state the engine computes via the bucketed paths
    "q_semdedup" ->
      """WITH RECURSIVE emb AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |p AS (
        |  SELECT a.vec_id AS ia, b.vec_id AS ib
        |  FROM emb a JOIN emb b ON a.vec_id < b.vec_id
        |  WHERE list_dot_product(a.v, b.v)
        |    / (sqrt(list_dot_product(a.v, a.v))
        |       * sqrt(list_dot_product(b.v, b.v))) >= 0.4),
        |edges AS (SELECT ia AS a, ib AS b FROM p
        |          UNION SELECT ib, ia FROM p),
        |reach AS (
        |  SELECT a AS n, b AS r FROM edges
        |  UNION
        |  SELECT reach.n, g.b FROM reach JOIN edges g ON reach.r = g.a),
        |lab AS (SELECT n AS vec_id, least(n, min(r)) AS cluster_id
        |        FROM reach GROUP BY n),
        |mem AS (SELECT l.vec_id, l.cluster_id, e.v
        |        FROM lab l JOIN emb e USING (vec_id)),
        |cd AS (SELECT cluster_id, CAST(i - 1 AS INT) AS d,
        |              sum(CAST(floor(v[i] * 1000000) AS BIGINT)) AS s,
        |              count(*) AS cnt
        |       FROM mem, LATERAL unnest(range(1, len(v) + 1)) t(i)
        |       GROUP BY 1, 2),
        |ca AS (SELECT cluster_id,
        |              list(CAST(s AS DOUBLE) / (cnt * 1000000.0)
        |                ORDER BY d) AS cent
        |       FROM cd GROUP BY cluster_id),
        |scored AS (SELECT m.vec_id, m.cluster_id,
        |                  list_dot_product(m.v, c.cent)
        |                    / (sqrt(list_dot_product(m.v, m.v))
        |                       * sqrt(list_dot_product(c.cent, c.cent)))
        |                    AS sim
        |           FROM mem m JOIN ca c USING (cluster_id)),
        |verdict AS (SELECT vec_id, cluster_id,
        |                   row_number() OVER (PARTITION BY cluster_id
        |                     ORDER BY sim, vec_id) = 1 AS kept
        |            FROM scored)
        |SELECT e.vec_id, v.cluster_id, coalesce(v.kept, TRUE) AS kept
        |FROM embeddings e LEFT JOIN verdict v USING (vec_id)""".stripMargin,

    "q_embed_clusters" ->
      """WITH RECURSIVE emb AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |p AS (
        |  SELECT a.vec_id AS ia, b.vec_id AS ib
        |  FROM emb a JOIN emb b ON a.vec_id < b.vec_id
        |  WHERE list_dot_product(a.v, b.v)
        |    / (sqrt(list_dot_product(a.v, a.v))
        |       * sqrt(list_dot_product(b.v, b.v))) >= 0.4),
        |edges AS (SELECT ia AS a, ib AS b FROM p
        |          UNION SELECT ib, ia FROM p),
        |reach AS (
        |  SELECT a AS n, b AS r FROM edges
        |  UNION
        |  SELECT reach.n, g.b FROM reach JOIN edges g ON reach.r = g.a
        |)
        |SELECT n AS vec_id, least(n, min(r)) AS cluster_id
        |FROM reach GROUP BY n""".stripMargin,

    "q_minhash_dedup" ->
      s"""WITH $minhashPairsCtes
         |SELECT id_a, id_b, jaccard FROM pairs""".stripMargin,

    // signatures depend only on the doc, so one sigs CTE serves both
    // sides; the batch/corpus split happens in the candidate join
    "q_minhash_incremental" ->
      s"""WITH $minhashSigCtes,
         |cands AS (SELECT a.doc_id AS id_l, b.doc_id AS id_r
         |  FROM sigs a JOIN sigs b
         |    ON a.doc_id % 2 = 1 AND b.doc_id % 2 = 0
         |  WHERE $minhashBandConds)
         |SELECT c.id_l, c.id_r,
         |  round(CAST(len(list_intersect(da.sh, db.sh)) AS DOUBLE)
         |    / greatest(len(list_distinct(list_concat(da.sh, db.sh))), 1), 6)
         |    AS jaccard
         |FROM cands c
         |JOIN docs da ON c.id_l = da.doc_id
         |JOIN docs db ON c.id_r = db.doc_id
         |WHERE CAST(len(list_intersect(da.sh, db.sh)) AS DOUBLE)
         |  / greatest(len(list_distinct(list_concat(da.sh, db.sh))), 1) >= 0.5""".stripMargin,

    "q_simhash_pairs" -> {
      val sigTerms = (0 until 60).map(j =>
        s"(CASE WHEN sum(CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END) > 0" +
        s" THEN CAST(${1L << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END)")
        .mkString("\n      + ")
      s"""WITH docs AS (
         |  $duckShingles),
         |hs AS (SELECT doc_id, ${duckHash60("s")} AS h
         |       FROM (SELECT doc_id, unnest(sh) AS s FROM docs)),
         |sigs AS (SELECT doc_id, $sigTerms AS sig
         |         FROM hs GROUP BY doc_id)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |       CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
         |FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.sig, b.sig)) <= 8""".stripMargin
    },

    "q_ngram_jaccard" ->
      """WITH docs AS (
        |  SELECT doc_id, block,
        |    list_distinct(CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
        |      ELSE [array_to_string(toks[i:i+2], ' ')
        |            FOR i IN range(1, len(toks) - 1)] END) AS sh
        |  FROM (SELECT doc_id, floor(length(text) / 50) AS block,
        |          regexp_split_to_array(
        |            regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
        |        FROM documents))
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |       round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |         / greatest(len(list_distinct(list_concat(a.sh, b.sh))), 1), 6)
        |         AS jaccard
        |FROM docs a JOIN docs b
        |  ON a.block = b.block AND a.doc_id < b.doc_id
        |WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |  / greatest(len(list_distinct(list_concat(a.sh, b.sh))), 1) >= 0.5""".stripMargin,

    // all four ANN variants share the exhaustive oracle — settings in
    // `queries` are pinned to exact recall on the gate corpus
    "q_ann_lsh" -> duckAnnBruteTop5,

    // same exhaustive replay restricted to the metadata-filtered
    // corpus — the predicate applies to NEIGHBORS only, queries keep
    // their unfiltered identity (the engine's pre-filter semantics)
    "q_ann_filtered" ->
      """WITH e AS (SELECT vec_id, label,
        |             CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |c AS (SELECT * FROM e WHERE label < 5),
        |q AS (SELECT * FROM e WHERE vec_id % 100 = 0),
        |scored AS (
        |  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
        |         list_dot_product(q.v, c.v)
        |           / (sqrt(list_dot_product(q.v, q.v))
        |              * sqrt(list_dot_product(c.v, c.v))) AS s
        |  FROM q JOIN c ON q.vec_id <> c.vec_id),
        |ranked AS (
        |  SELECT q_id, n_id, s,
        |         row_number() OVER (PARTITION BY q_id
        |           ORDER BY s DESC, n_id) AS rn
        |  FROM scored)
        |SELECT q_id, n_id, round(s, 6) AS sim, CAST(rn AS INTEGER) AS rank
        |FROM ranked WHERE rn <= 5""".stripMargin,

    // exhaustive cross-set replay: raw-sim threshold, rounded max —
    // exactly the engine's filter-then-round order
    "q_semantic_leakage" ->
      """WITH e AS (SELECT vec_id, label,
        |             CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |tr AS (SELECT * FROM e WHERE label < 8),
        |te AS (SELECT * FROM e WHERE label >= 8),
        |sc AS (
        |  SELECT te.vec_id AS q_id,
        |         list_dot_product(te.v, tr.v)
        |           / (sqrt(list_dot_product(te.v, te.v))
        |              * sqrt(list_dot_product(tr.v, tr.v))) AS s
        |  FROM te JOIN tr ON te.vec_id <> tr.vec_id),
        |hit AS (SELECT q_id, count(*) AS n_hits,
        |               max(round(s, 6)) AS max_sim
        |        FROM sc WHERE s >= 0.5 GROUP BY q_id)
        |SELECT te.vec_id AS q_id,
        |       CAST(coalesce(hit.n_hits, 0) AS BIGINT) AS n_hits,
        |       hit.max_sim,
        |       CAST(CASE WHEN hit.n_hits IS NOT NULL
        |         THEN 1 ELSE 0 END AS BIGINT) AS leaked
        |FROM te LEFT JOIN hit ON te.vec_id = hit.q_id""".stripMargin,

    // the greedy MMR unrolled: step 1 = raw-sim rank 1; steps 2..3
    // maximize 0.7·rel − 0.3·max-sim-to-selected over the SAME
    // 6-rounded sims and tie order (score desc, id asc) the engine
    // uses. Literal 0.7/0.3 parse to the identical doubles the
    // engine's 700/1000.0 milli-weights produce
    "q_mmr_rerank" ->
      """WITH e AS (SELECT vec_id,
        |             CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT * FROM e WHERE vec_id % 100 = 0),
        |sc AS (
        |  SELECT q.vec_id AS q_id, e.vec_id AS n_id,
        |         list_dot_product(q.v, e.v)
        |           / (sqrt(list_dot_product(q.v, q.v))
        |              * sqrt(list_dot_product(e.v, e.v))) AS s
        |  FROM q JOIN e ON q.vec_id <> e.vec_id),
        |cands AS (
        |  SELECT q_id, n_id, round(s, 6) AS rel, rn AS rank
        |  FROM (SELECT q_id, n_id, s,
        |          row_number() OVER (PARTITION BY q_id
        |            ORDER BY s DESC, n_id) AS rn
        |        FROM sc)
        |  WHERE rn <= 10),
        |pv AS (SELECT c.q_id, c.n_id, e.v
        |       FROM cands c JOIN e ON c.n_id = e.vec_id),
        |ps AS (
        |  SELECT x.q_id, x.n_id AS a, y.n_id AS b,
        |         round(list_dot_product(x.v, y.v)
        |           / (sqrt(list_dot_product(x.v, x.v))
        |              * sqrt(list_dot_product(y.v, y.v))), 6) AS s
        |  FROM pv x JOIN pv y ON x.q_id = y.q_id AND x.n_id <> y.n_id),
        |s1 AS (SELECT q_id, n_id FROM cands WHERE rank = 1),
        |p2 AS (SELECT c.q_id, c.n_id, c.rel, max(ps.s) AS pen
        |       FROM cands c
        |       JOIN ps ON ps.q_id = c.q_id AND ps.a = c.n_id
        |       JOIN s1 ON s1.q_id = ps.q_id AND s1.n_id = ps.b
        |       WHERE NOT EXISTS (SELECT 1 FROM s1 z
        |         WHERE z.q_id = c.q_id AND z.n_id = c.n_id)
        |       GROUP BY 1, 2, 3),
        |n2 AS (SELECT q_id, n_id FROM (
        |         SELECT q_id, n_id, row_number() OVER (PARTITION BY q_id
        |           ORDER BY 0.7 * rel - 0.3 * pen DESC, n_id) AS rn
        |         FROM p2) WHERE rn = 1),
        |sel2 AS (SELECT * FROM s1 UNION ALL SELECT * FROM n2),
        |p3 AS (SELECT c.q_id, c.n_id, c.rel, max(ps.s) AS pen
        |       FROM cands c
        |       JOIN ps ON ps.q_id = c.q_id AND ps.a = c.n_id
        |       JOIN sel2 ON sel2.q_id = ps.q_id AND sel2.n_id = ps.b
        |       WHERE NOT EXISTS (SELECT 1 FROM sel2 z
        |         WHERE z.q_id = c.q_id AND z.n_id = c.n_id)
        |       GROUP BY 1, 2, 3),
        |n3 AS (SELECT q_id, n_id FROM (
        |         SELECT q_id, n_id, row_number() OVER (PARTITION BY q_id
        |           ORDER BY 0.7 * rel - 0.3 * pen DESC, n_id) AS rn
        |         FROM p3) WHERE rn = 1),
        |ranked AS (
        |  SELECT q_id, n_id, 1 AS mmr_rank FROM s1
        |  UNION ALL SELECT q_id, n_id, 2 FROM n2
        |  UNION ALL SELECT q_id, n_id, 3 FROM n3)
        |SELECT r.q_id, r.n_id, c.rel, CAST(r.mmr_rank AS INTEGER)
        |         AS mmr_rank
        |FROM ranked r JOIN cands c
        |  ON r.q_id = c.q_id AND r.n_id = c.n_id""".stripMargin,
    "q_ann_ivf_trained" -> duckAnnBruteTop5,
    "q_ann_pq" -> duckAnnBruteTop5,

    // brute-force replay over the FINAL corpus — the persisted index
    // (built stale, ChangeSet-refreshed, probe-only query) must agree
    "q_ann_persisted" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings WHERE vec_id % 5 <> 4),
        |q AS (SELECT * FROM e WHERE vec_id % 100 = 0),
        |scored AS (
        |  SELECT q.vec_id AS q_id, e.vec_id AS n_id,
        |         list_dot_product(q.v, e.v)
        |           / (sqrt(list_dot_product(q.v, q.v))
        |              * sqrt(list_dot_product(e.v, e.v))) AS s
        |  FROM q JOIN e ON q.vec_id <> e.vec_id),
        |ranked AS (
        |  SELECT q_id, n_id, s,
        |         row_number() OVER (PARTITION BY q_id ORDER BY s DESC, n_id) AS rn
        |  FROM scored)
        |SELECT q_id, n_id, round(s, 6) AS sim, CAST(rn AS INTEGER) AS rank
        |FROM ranked WHERE rn <= 5""".stripMargin,

    // the probe-only row serves the same final corpus from a
    // fresh-model persisted index — same exhaustive replay
    "q_ann_probe" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings WHERE vec_id % 5 <> 4),
        |q AS (SELECT * FROM e WHERE vec_id % 100 = 0),
        |scored AS (
        |  SELECT q.vec_id AS q_id, e.vec_id AS n_id,
        |         list_dot_product(q.v, e.v)
        |           / (sqrt(list_dot_product(q.v, q.v))
        |              * sqrt(list_dot_product(e.v, e.v))) AS s
        |  FROM q JOIN e ON q.vec_id <> e.vec_id),
        |ranked AS (
        |  SELECT q_id, n_id, s,
        |         row_number() OVER (PARTITION BY q_id ORDER BY s DESC, n_id) AS rn
        |  FROM scored)
        |SELECT q_id, n_id, round(s, 6) AS sim, CAST(rn AS INTEGER) AS rank
        |FROM ranked WHERE rn <= 5""".stripMargin,
    "q_ann_ivf" -> duckAnnBruteTop5,

    "q_multimodal_meta" ->
      """SELECT CAST(doc_id AS VARCHAR) AS media_id,
        |       (['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1] AS media_type,
        |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |       sha256(text) AS sha256
        |FROM documents""".stripMargin,

    "q_multimodal_decode" ->
      s"""WITH m AS (
         |  SELECT CAST(doc_id AS VARCHAR) AS media_id,
         |         (['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1]
         |           AS media_type,
         |         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         |         ${duckHash60("text")} AS h
         |  FROM documents)
         |SELECT media_id, media_type, n_bytes,
         |       CAST(h % 1920 + 1 AS INT) AS width,
         |       CAST(h % 1080 + 1 AS INT) AS height,
         |       CASE WHEN media_type = 'image' THEN CAST(0 AS BIGINT)
         |            ELSE h % 600000 END AS duration_ms
         |FROM m""".stripMargin,

    "q_multimodal_frames" ->
      s"""WITH m AS (
         |  SELECT CAST(doc_id AS VARCHAR) AS media_id,
         |         (['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1]
         |           AS media_type,
         |         ${duckHash60("text")} AS h
         |  FROM documents),
         |v AS (SELECT media_id, h % 600000 AS duration_ms FROM m
         |      WHERE media_type = 'video')
         |SELECT media_id,
         |  CAST(unnest(range(0, duration_ms + 1, 60000)) AS BIGINT)
         |    AS frame_ts_ms
         |FROM v""".stripMargin,

    "q_multimodal_resize" ->
      s"""WITH m AS (
         |  SELECT CAST(doc_id AS VARCHAR) AS media_id,
         |         (['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1]
         |           AS media_type,
         |         ${duckHash60("text")} AS h
         |  FROM documents),
         |i AS (SELECT media_id,
         |        CAST(h % 1920 + 1 AS INT) AS width,
         |        CAST(h % 1080 + 1 AS INT) AS height
         |      FROM m WHERE media_type = 'image'),
         |x AS (SELECT *, greatest(width, height) AS mx FROM i)
         |SELECT media_id, width, height,
         |  CAST(CASE WHEN mx <= 512 THEN width
         |       ELSE greatest((width * 512) // mx, 1) END AS INT)
         |    AS out_width,
         |  CAST(CASE WHEN mx <= 512 THEN height
         |       ELSE greatest((height * 512) // mx, 1) END AS INT)
         |    AS out_height
         |FROM x""".stripMargin,

    // replays the synthetic-PPM pixel rule (byte of pixel p, channel c
    // = (id·31 + p·7 + c·13) mod 256) from the id alone — certifying
    // the engine's decoder parsed the real header and summed the real
    // payload bytes it was handed
    // replays graft.ext.Multimodal.synthesizePng's id formulas —
    // byte of pixel p channel c = (id·37 + p·11 + c·17) mod 256 over
    // width = 9 + id mod 12, height = 5 + id mod 7; n_idat pinned to
    // the encoder's two-chunk split
    "q_multimodal_png" ->
      """WITH dim AS (
        |  SELECT doc_id,
        |         CAST(9 + doc_id % 12 AS INT) AS width,
        |         CAST(5 + doc_id % 7 AS INT) AS height
        |  FROM documents),
        |px AS (SELECT doc_id, width, height,
        |         unnest(range(0, CAST(width AS BIGINT) * height)) AS p
        |       FROM dim),
        |ch AS (SELECT doc_id, width, height, p, c,
        |         (doc_id * 37 + p * 11 + c * 17) % 256 AS v
        |       FROM px, unnest([0, 1, 2]) t(c)),
        |s AS (SELECT doc_id, width, height,
        |        CAST(width AS BIGINT) * height AS n_pix,
        |        CAST(sum(CASE WHEN c = 0 THEN v END) AS BIGINT) AS r_sum,
        |        CAST(sum(CASE WHEN c = 1 THEN v END) AS BIGINT) AS g_sum,
        |        CAST(sum(CASE WHEN c = 2 THEN v END) AS BIGINT) AS b_sum
        |      FROM ch GROUP BY 1, 2, 3, 4)
        |SELECT CAST(doc_id AS VARCHAR) AS media_id, width, height,
        |       CAST(8 AS INT) AS bit_depth, CAST(2 AS INT) AS color_type,
        |       CAST(2 AS INT) AS n_idat, n_pix, r_sum, g_sum, b_sum,
        |       CAST(r_sum * 1000 // n_pix AS BIGINT) AS r_mean_milli,
        |       CAST(g_sum * 1000 // n_pix AS BIGINT) AS g_mean_milli,
        |       CAST(b_sum * 1000 // n_pix AS BIGINT) AS b_mean_milli
        |FROM s""".stripMargin,

    // JPEG: the oracle replays the encoder's RGB→YCbCr floor/clamp
    // and the decoder's YCbCr→RGB floor/clamp per flat tile (e-
    // notation literals parse as DOUBLE in DuckDB — identical IEEE
    // arithmetic to the JVM's), ×64 pixels per tile
    "q_multimodal_jpeg" ->
      """WITH dim AS (
        |  SELECT doc_id,
        |         CAST(8 * (1 + doc_id % 3) AS INT) AS width,
        |         CAST(8 * (1 + doc_id % 2) AS INT) AS height
        |  FROM documents),
        |blk AS (SELECT doc_id, width, height,
        |          unnest(range(0, CAST(width // 8 AS BIGINT)
        |            * (height // 8))) AS bi
        |        FROM dim),
        |rgb AS (SELECT doc_id, width, height,
        |          (doc_id * 31 + bi * 59 + 7) % 256 AS r,
        |          (doc_id * 17 + bi * 83 + 3) % 256 AS g,
        |          (doc_id * 13 + bi * 29 + 11) % 256 AS b
        |        FROM blk),
        |ycc AS (SELECT doc_id, width, height,
        |   greatest(0, least(255, CAST(floor(
        |     2.99e-1 * r + 5.87e-1 * g + 1.14e-1 * b + 5e-1)
        |     AS INT)))AS y,
        |   greatest(0, least(255, CAST(floor(
        |     -1.68736e-1 * r - 3.31264e-1 * g + 5e-1 * b + 1.285e2)
        |     AS INT))) AS cb,
        |   greatest(0, least(255, CAST(floor(
        |     5e-1 * r - 4.18688e-1 * g - 8.1312e-2 * b + 1.285e2)
        |     AS INT))) AS cr
        |  FROM rgb),
        |dec AS (SELECT doc_id, width, height,
        |   greatest(0, least(255, CAST(floor(
        |     y + 1.402e0 * (cr - 128) + 5e-1) AS INT))) AS r2,
        |   greatest(0, least(255, CAST(floor(
        |     y - 3.44136e-1 * (cb - 128) - 7.14136e-1 * (cr - 128)
        |     + 5e-1) AS INT))) AS g2,
        |   greatest(0, least(255, CAST(floor(
        |     y + 1.772e0 * (cb - 128) + 5e-1) AS INT))) AS b2
        |  FROM ycc),
        |s AS (SELECT doc_id, width, height,
        |        CAST(width AS BIGINT) * height AS n_pix,
        |        CAST(sum(r2) * 64 AS BIGINT) AS r_sum,
        |        CAST(sum(g2) * 64 AS BIGINT) AS g_sum,
        |        CAST(sum(b2) * 64 AS BIGINT) AS b_sum
        |      FROM dec GROUP BY 1, 2, 3)
        |SELECT CAST(doc_id AS VARCHAR) AS media_id, width, height,
        |       CAST(3 AS INT) AS n_components, n_pix,
        |       r_sum, g_sum, b_sum,
        |       CAST(r_sum * 1000 // n_pix AS BIGINT) AS r_mean_milli,
        |       CAST(g_sum * 1000 // n_pix AS BIGINT) AS g_mean_milli,
        |       CAST(b_sum * 1000 // n_pix AS BIGINT) AS b_mean_milli
        |FROM s""".stripMargin,

    "q_multimodal_ppm" ->
      """WITH dim AS (
        |  SELECT doc_id,
        |         CAST(8 + doc_id % 16 AS INT) AS width,
        |         CAST(6 + doc_id % 9 AS INT) AS height
        |  FROM documents),
        |px AS (SELECT doc_id, width, height,
        |         unnest(range(0, CAST(width AS BIGINT) * height)) AS p
        |       FROM dim),
        |ch AS (SELECT doc_id, width, height, p, c,
        |         (doc_id * 31 + p * 7 + c * 13) % 256 AS v
        |       FROM px, unnest([0, 1, 2]) t(c)),
        |s AS (SELECT doc_id, width, height,
        |        CAST(width AS BIGINT) * height AS n_pix,
        |        CAST(sum(CASE WHEN c = 0 THEN v END) AS BIGINT) AS r_sum,
        |        CAST(sum(CASE WHEN c = 1 THEN v END) AS BIGINT) AS g_sum,
        |        CAST(sum(CASE WHEN c = 2 THEN v END) AS BIGINT) AS b_sum
        |      FROM ch GROUP BY 1, 2, 3, 4)
        |SELECT CAST(doc_id AS VARCHAR) AS media_id, width, height,
        |       CAST(255 AS INT) AS maxval, n_pix, r_sum, g_sum, b_sum,
        |       CAST(r_sum * 1000 // n_pix AS BIGINT) AS r_mean_milli,
        |       CAST(g_sum * 1000 // n_pix AS BIGINT) AS g_mean_milli,
        |       CAST(b_sum * 1000 // n_pix AS BIGINT) AS b_mean_milli
        |FROM s""".stripMargin,

    // audio casualties at id%7==3; survivors replay the
    // q_multimodal_wav id formulas
    "q_wav_corrupt" ->
      """WITH p AS (
        |  SELECT doc_id AS d,
        |         8000 + 4000 * (doc_id % 4) AS sr,
        |         1 + doc_id % 2 AS ch,
        |         50 + doc_id % 101 AS nf
        |  FROM documents),
        |s AS (SELECT d, sr, ch, nf, c,
        |        ((d * 37 + f * 11 + c * 5) % 4001) - 2000 AS v
        |      FROM p,
        |           LATERAL unnest(range(0, nf)) t(f),
        |           LATERAL unnest(range(0, ch)) u(c)),
        |a AS (SELECT d, sr, ch, nf,
        |        CAST(max(abs(v)) AS BIGINT) AS peak
        |      FROM s GROUP BY 1, 2, 3, 4)
        |SELECT CAST(d AS VARCHAR) AS media_id,
        |       CAST(CASE WHEN d % 7 = 3 THEN 0 ELSE 1 END AS BIGINT) AS ok,
        |       CASE WHEN d % 7 = 3 THEN NULL
        |            ELSE CAST(sr AS INT) END AS sample_rate,
        |       CASE WHEN d % 7 = 3 THEN NULL
        |            ELSE CAST(ch AS INT) END AS channels,
        |       CASE WHEN d % 7 = 3 THEN NULL
        |            ELSE CAST(nf AS BIGINT) END AS n_frames,
        |       CASE WHEN d % 7 = 3 THEN NULL ELSE peak END AS peak
        |FROM a""".stripMargin,

    // Y4M replay: per-frame per-plane byte formulas summed over the
    // frame count; chroma plane size switches on the id-parity
    // colorspace (C420jpeg even ids → quarter-res planes, C444 odd)
    "q_multimodal_y4m" ->
      """WITH dim AS (
        |  SELECT doc_id AS d,
        |         CAST(4 + 2 * (doc_id % 6) AS INT) AS w,
        |         CAST(4 + 2 * (doc_id % 4) AS INT) AS h,
        |         1 + doc_id % 5 AS nf,
        |         doc_id % 2 = 0 AS is420
        |  FROM documents),
        |yf AS (SELECT d,
        |         CAST(sum((d * 17 + f * 29 + p * 7) % 256) AS BIGINT)
        |           AS y_sum
        |       FROM dim,
        |            LATERAL unnest(range(0, nf)) t(f),
        |            LATERAL unnest(range(0, CAST(w AS BIGINT) * h)) u(p)
        |       GROUP BY 1),
        |cf AS (SELECT d,
        |         CAST(sum((d * 23 + f * 31 + q * 11 + 1) % 256) AS BIGINT)
        |           AS cb_sum,
        |         CAST(sum((d * 19 + f * 37 + q * 13 + 2) % 256) AS BIGINT)
        |           AS cr_sum,
        |         count(*) AS n_c
        |       FROM dim,
        |            LATERAL unnest(range(0, nf)) t(f),
        |            LATERAL unnest(range(0,
        |              CASE WHEN is420
        |                   THEN CAST(w // 2 AS BIGINT) * (h // 2)
        |                   ELSE CAST(w AS BIGINT) * h END)) u(q)
        |       GROUP BY 1)
        |SELECT CAST(d AS VARCHAR) AS media_id, w AS width, h AS height,
        |       CAST(25 AS INT) AS fps_num, CAST(1 AS INT) AS fps_den,
        |       CASE WHEN is420 THEN 'C420jpeg' ELSE 'C444' END
        |         AS colorspace,
        |       CAST(nf AS BIGINT) AS n_frames,
        |       CAST(nf * 40 AS BIGINT) AS duration_ms,
        |       y_sum, cb_sum, cr_sum,
        |       CAST(y_sum * 1000 // (nf * w * h) AS BIGINT)
        |         AS y_mean_milli,
        |       CAST(cb_sum * 1000 // n_c AS BIGINT) AS cb_mean_milli,
        |       CAST(cr_sum * 1000 // n_c AS BIGINT) AS cr_mean_milli
        |FROM dim JOIN yf USING (d) JOIN cf USING (d)""".stripMargin,

    // video casualties at id%7==4 (mid-header truncation → ok=0,
    // features NULL); survivors replay the q_multimodal_y4m formulas
    "q_y4m_corrupt" ->
      """WITH dim AS (
        |  SELECT doc_id AS d,
        |         CAST(4 + 2 * (doc_id % 6) AS INT) AS w,
        |         CAST(4 + 2 * (doc_id % 4) AS INT) AS h,
        |         1 + doc_id % 5 AS nf
        |  FROM documents),
        |yf AS (SELECT d,
        |         CAST(sum((d * 17 + f * 29 + p * 7) % 256) AS BIGINT)
        |           AS y_sum
        |       FROM dim,
        |            LATERAL unnest(range(0, nf)) t(f),
        |            LATERAL unnest(range(0, CAST(w AS BIGINT) * h)) u(p)
        |       GROUP BY 1)
        |SELECT CAST(d AS VARCHAR) AS media_id,
        |       CAST(CASE WHEN d % 7 = 4 THEN 0 ELSE 1 END AS BIGINT)
        |         AS ok,
        |       CASE WHEN d % 7 = 4 THEN NULL ELSE w END AS width,
        |       CASE WHEN d % 7 = 4 THEN NULL ELSE h END AS height,
        |       CASE WHEN d % 7 = 4 THEN NULL
        |            ELSE CAST(nf AS BIGINT) END AS n_frames,
        |       CASE WHEN d % 7 = 4 THEN NULL
        |            ELSE CAST(y_sum * 1000 // (nf * w * h) AS BIGINT)
        |            END AS y_mean_milli
        |FROM dim JOIN yf USING (d)""".stripMargin,

    // per-pixel per-FRAME dHash replay from the Y4M luma formula
    // (d·17 + f·29 + p·7 mod 256; the twin's f=0,p=0 byte is 128),
    // then the all-pairs max-over-aligned-frames hamming — the banded
    // engine join must produce exactly this set (pigeonhole recall)
    "q_video_dhash" ->
      s"""WITH $videoDhashPairsCtes
         |SELECT id_a, id_b, hamming_max FROM vpairs""".stripMargin,

    // re-upload batch × base corpus from the same per-frame replay
    "q_video_dhash_incremental" -> videoDhashIncrementalSql,

    // 2-frame window keys from the per-frame replay; clip of d =
    // source window at d mod (nf-1)
    "q_video_clip_match" -> videoClipMatchSql,
    // final two-sync corpus = %5 != 4, all-true content; clips from
    // the %4==1, nf>=2 files still in the corpus — a pass proves the
    // refreshed persisted video index equals the full rebuild
    "q_video_clip_incremental" -> videoClipSearchSql(
      corpusPred = "a.d % 5 <> 4",
      clipPred = "c.d % 4 = 1 AND c.d % 5 <> 0 AND c.d % 5 <> 4"),

    // video cluster row: same per-pixel pair replay + the recursive
    // reachability closure + component min (the q_image_dhash_clusters
    // convention) — covers exactly the engine's signature-collapsed CC
    "q_video_dhash_clusters" ->
      s"""WITH RECURSIVE $videoDhashPairsCtes,
         |edges AS (SELECT id_a AS a, id_b AS b FROM vpairs
         |          UNION SELECT id_b, id_a FROM vpairs),
         |reach AS (
         |  SELECT a AS n, b AS r FROM edges
         |  UNION
         |  SELECT reach.n, e.b FROM reach JOIN edges e ON reach.r = e.a
         |)
         |SELECT n AS media_id, least(n, min(r)) AS cluster_id
         |FROM reach GROUP BY n""".stripMargin,

    // batch × corpus cross pairs from the same per-pixel replay
    // (base files, no twins), gated by id mod 3
    "q_image_dhash_incremental" -> imageDhashIncrementalSql,
    "q_image_dhash_reencode" -> jpegDhashReencodeSql,
    "q_image_dhash_reencode_clusters" -> jpegDhashReencodeClustersSql,

    // audio-fingerprint replay at PER-SAMPLE granularity from the
    // synthesis formula: same lag-1 |diff| stream, 65-box integer
    // partition, floor-milli envelope, hi/lo packing, and hamming ≤ 3
    // cut as the engine; pair order under VARCHAR ids. Twin rows
    // (doc_id%10=0, id||'v') replay the zeroed first sample exactly.
    "q_audio_fp" ->
      s"""WITH $audioFpPairsCtes
         |SELECT id_a, id_b, hamming FROM apairs""".stripMargin,

    // the cluster row replays the SAME per-sample pair derivation,
    // then the recursive reachability closure + component min — the
    // q_image_dhash_clusters convention, covering exactly the
    // engine's "every file with at least one near-duplicate" set
    // batch × corpus cross pairs from the same per-sample replay
    // (base files, no twins), gated by id parity
    "q_audio_fp_incremental" -> audioFpIncrementalSql,

    // window keys replayed per (file, offset) from the sample
    // formula; the clip of file d is the source window at d mod 7
    "q_audio_clip_match" -> audioClipMatchSql,
    // final two-sync corpus = %5 != 4, all-true content; clips from
    // the %5==0 files at offset d%7 — a pass proves the refreshed
    // persisted index equals the full rebuild bit-exactly
    "q_audio_clip_incremental" -> audioClipSearchSql(
      corpusPred = "d % 5 <> 4", clipPred = "c.d % 5 = 0"),

    // the streaming row is the SAME incremental pair set with each
    // pair stamped by its arrival micro-batch, (d div 3) mod 4 —
    // certifying the foreachBatch replay applied every batch exactly
    // once against the static corpus
    "q_stream_media_dedup" -> streamMediaDedupSql,

    "q_audio_fp_clusters" ->
      s"""WITH RECURSIVE $audioFpPairsCtes,
         |edges AS (SELECT id_a AS a, id_b AS b FROM apairs
         |          UNION SELECT id_b, id_a FROM apairs),
         |reach AS (
         |  SELECT a AS n, b AS r FROM edges
         |  UNION
         |  SELECT reach.n, e.b FROM reach JOIN edges e ON reach.r = e.a
         |)
         |SELECT n AS media_id, least(n, min(r)) AS cluster_id
         |FROM reach GROUP BY n""".stripMargin,

    // both halves from the id formula: id%7==2 rows are the truncated
    // casualties (ok=0, all features NULL); everything else replays
    // the q_multimodal_ppm means
    // 4:2:0 replay: same YCbCr round-trip arithmetic over 16×16
    // tiles (×256 pixels per tile), dims 16·(1+d%2) × 16·(1+d%3)
    "q_multimodal_jpeg420" ->
      """WITH dim AS (
        |  SELECT doc_id,
        |         CAST(16 * (1 + doc_id % 2) AS INT) AS width,
        |         CAST(16 * (1 + doc_id % 3) AS INT) AS height
        |  FROM documents),
        |blk AS (SELECT doc_id, width, height,
        |          unnest(range(0, CAST(width // 16 AS BIGINT)
        |            * (height // 16))) AS bi
        |        FROM dim),
        |rgb AS (SELECT doc_id, width, height,
        |          (doc_id * 41 + bi * 67 + 5) % 256 AS r,
        |          (doc_id * 23 + bi * 71 + 9) % 256 AS g,
        |          (doc_id * 19 + bi * 37 + 13) % 256 AS b
        |        FROM blk),
        |ycc AS (SELECT doc_id, width, height,
        |   greatest(0, least(255, CAST(floor(
        |     2.99e-1 * r + 5.87e-1 * g + 1.14e-1 * b + 5e-1)
        |     AS INT)))AS y,
        |   greatest(0, least(255, CAST(floor(
        |     -1.68736e-1 * r - 3.31264e-1 * g + 5e-1 * b + 1.285e2)
        |     AS INT))) AS cb,
        |   greatest(0, least(255, CAST(floor(
        |     5e-1 * r - 4.18688e-1 * g - 8.1312e-2 * b + 1.285e2)
        |     AS INT))) AS cr
        |  FROM rgb),
        |dec AS (SELECT doc_id, width, height,
        |   greatest(0, least(255, CAST(floor(
        |     y + 1.402e0 * (cr - 128) + 5e-1) AS INT))) AS r2,
        |   greatest(0, least(255, CAST(floor(
        |     y - 3.44136e-1 * (cb - 128) - 7.14136e-1 * (cr - 128)
        |     + 5e-1) AS INT))) AS g2,
        |   greatest(0, least(255, CAST(floor(
        |     y + 1.772e0 * (cb - 128) + 5e-1) AS INT))) AS b2
        |  FROM ycc),
        |s AS (SELECT doc_id, width, height,
        |        CAST(width AS BIGINT) * height AS n_pix,
        |        CAST(sum(r2) * 256 AS BIGINT) AS r_sum,
        |        CAST(sum(g2) * 256 AS BIGINT) AS g_sum,
        |        CAST(sum(b2) * 256 AS BIGINT) AS b_sum
        |      FROM dec GROUP BY 1, 2, 3)
        |SELECT CAST(doc_id AS VARCHAR) AS media_id, width, height,
        |       CAST(3 AS INT) AS n_components, n_pix,
        |       r_sum, g_sum, b_sum,
        |       CAST(r_sum * 1000 // n_pix AS BIGINT) AS r_mean_milli,
        |       CAST(g_sum * 1000 // n_pix AS BIGINT) AS g_mean_milli,
        |       CAST(b_sum * 1000 // n_pix AS BIGINT) AS b_mean_milli
        |FROM s""".stripMargin,

    // the q_multimodal_jpeg replay gated by the id%7=5 casualty rule
    "q_jpeg_corrupt" ->
      """WITH dim AS (
        |  SELECT doc_id,
        |         CAST(8 * (1 + doc_id % 3) AS INT) AS width,
        |         CAST(8 * (1 + doc_id % 2) AS INT) AS height
        |  FROM documents),
        |blk AS (SELECT doc_id, width, height,
        |          unnest(range(0, CAST(width // 8 AS BIGINT)
        |            * (height // 8))) AS bi
        |        FROM dim),
        |rgb AS (SELECT doc_id, width, height,
        |          (doc_id * 31 + bi * 59 + 7) % 256 AS r,
        |          (doc_id * 17 + bi * 83 + 3) % 256 AS g,
        |          (doc_id * 13 + bi * 29 + 11) % 256 AS b
        |        FROM blk),
        |ycc AS (SELECT doc_id, width, height,
        |   greatest(0, least(255, CAST(floor(
        |     2.99e-1 * r + 5.87e-1 * g + 1.14e-1 * b + 5e-1)
        |     AS INT)))AS y,
        |   greatest(0, least(255, CAST(floor(
        |     -1.68736e-1 * r - 3.31264e-1 * g + 5e-1 * b + 1.285e2)
        |     AS INT))) AS cb,
        |   greatest(0, least(255, CAST(floor(
        |     5e-1 * r - 4.18688e-1 * g - 8.1312e-2 * b + 1.285e2)
        |     AS INT))) AS cr
        |  FROM rgb),
        |dec AS (SELECT doc_id, width, height,
        |   greatest(0, least(255, CAST(floor(
        |     y + 1.402e0 * (cr - 128) + 5e-1) AS INT))) AS r2,
        |   greatest(0, least(255, CAST(floor(
        |     y - 3.44136e-1 * (cb - 128) - 7.14136e-1 * (cr - 128)
        |     + 5e-1) AS INT))) AS g2,
        |   greatest(0, least(255, CAST(floor(
        |     y + 1.772e0 * (cb - 128) + 5e-1) AS INT))) AS b2
        |  FROM ycc),
        |s AS (SELECT doc_id, width, height,
        |        CAST(width AS BIGINT) * height AS n_pix,
        |        CAST(sum(r2) * 64 AS BIGINT) AS r_sum,
        |        CAST(sum(g2) * 64 AS BIGINT) AS g_sum,
        |        CAST(sum(b2) * 64 AS BIGINT) AS b_sum
        |      FROM dec GROUP BY 1, 2, 3)
        |SELECT CAST(doc_id AS VARCHAR) AS media_id,
        |       CAST(CASE WHEN doc_id % 7 = 5 THEN 0 ELSE 1 END AS BIGINT)
        |         AS ok,
        |       CASE WHEN doc_id % 7 = 5 THEN NULL ELSE width END AS width,
        |       CASE WHEN doc_id % 7 = 5 THEN NULL ELSE height END AS height,
        |       CASE WHEN doc_id % 7 = 5 THEN NULL
        |            ELSE CAST(r_sum * 1000 // n_pix AS BIGINT) END
        |         AS r_mean_milli,
        |       CASE WHEN doc_id % 7 = 5 THEN NULL
        |            ELSE CAST(g_sum * 1000 // n_pix AS BIGINT) END
        |         AS g_mean_milli,
        |       CASE WHEN doc_id % 7 = 5 THEN NULL
        |            ELSE CAST(b_sum * 1000 // n_pix AS BIGINT) END
        |         AS b_mean_milli
        |FROM s""".stripMargin,

    "q_multimodal_corrupt" ->
      """WITH dim AS (
        |  SELECT doc_id,
        |         CAST(8 + doc_id % 16 AS INT) AS width,
        |         CAST(6 + doc_id % 9 AS INT) AS height
        |  FROM documents),
        |px AS (SELECT doc_id, width, height,
        |         unnest(range(0, CAST(width AS BIGINT) * height)) AS p
        |       FROM dim),
        |ch AS (SELECT doc_id, width, height, p, c,
        |         (doc_id * 31 + p * 7 + c * 13) % 256 AS v
        |       FROM px, unnest([0, 1, 2]) t(c)),
        |s AS (SELECT doc_id, width, height,
        |        CAST(width AS BIGINT) * height AS n_pix,
        |        CAST(sum(CASE WHEN c = 0 THEN v END) AS BIGINT) AS r_sum,
        |        CAST(sum(CASE WHEN c = 1 THEN v END) AS BIGINT) AS g_sum,
        |        CAST(sum(CASE WHEN c = 2 THEN v END) AS BIGINT) AS b_sum
        |      FROM ch GROUP BY 1, 2, 3, 4)
        |SELECT CAST(doc_id AS VARCHAR) AS media_id,
        |       CAST(CASE WHEN doc_id % 7 = 2 THEN 0 ELSE 1 END AS BIGINT)
        |         AS ok,
        |       CASE WHEN doc_id % 7 = 2 THEN NULL ELSE width END AS width,
        |       CASE WHEN doc_id % 7 = 2 THEN NULL ELSE height END AS height,
        |       CASE WHEN doc_id % 7 = 2 THEN NULL
        |            ELSE CAST(r_sum * 1000 // n_pix AS BIGINT) END
        |         AS r_mean_milli,
        |       CASE WHEN doc_id % 7 = 2 THEN NULL
        |            ELSE CAST(g_sum * 1000 // n_pix AS BIGINT) END
        |         AS g_mean_milli,
        |       CASE WHEN doc_id % 7 = 2 THEN NULL
        |            ELSE CAST(b_sum * 1000 // n_pix AS BIGINT) END
        |         AS b_mean_milli
        |FROM s""".stripMargin,

    // replays graft.ext.Multimodal.synthesizeWav's id formulas —
    // sample of frame f channel c = ((id·37 + f·11 + c·5) mod 4001)
    // − 2000 over nf = 50 + id mod 101 frames — entirely from doc_id
    "q_multimodal_wav" ->
      """WITH p AS (
        |  SELECT doc_id AS d,
        |         8000 + 4000 * (doc_id % 4) AS sr,
        |         1 + doc_id % 2 AS ch,
        |         50 + doc_id % 101 AS nf
        |  FROM documents),
        |s AS (SELECT d, sr, ch, nf, c,
        |        ((d * 37 + f * 11 + c * 5) % 4001) - 2000 AS v
        |      FROM p,
        |           LATERAL unnest(range(0, nf)) t(f),
        |           LATERAL unnest(range(0, ch)) u(c)),
        |a AS (SELECT d, sr, ch, nf,
        |        CAST(sum(CASE WHEN c = 0 THEN v ELSE 0 END) AS BIGINT) AS c0_sum,
        |        CAST(sum(CASE WHEN c = 1 THEN v ELSE 0 END) AS BIGINT) AS c1_sum,
        |        CAST(sum(abs(v)) AS BIGINT) AS abs_sum,
        |        CAST(max(abs(v)) AS BIGINT) AS peak
        |      FROM s GROUP BY 1, 2, 3, 4)
        |SELECT CAST(d AS VARCHAR) AS media_id,
        |       CAST(sr AS INT) AS sample_rate, CAST(ch AS INT) AS channels,
        |       CAST(16 AS INT) AS bits, CAST(nf AS BIGINT) AS n_frames,
        |       CAST(nf * 1000 // sr AS BIGINT) AS duration_ms,
        |       c0_sum, c1_sum, abs_sum, peak
        |FROM a""".stripMargin,

    // fixed-point power iteration unrolled — integer `//` division
    // and integer sums make every iteration exact, so the oracle
    // replays the distributed rank bit-for-bit
    "q_pagerank" -> {
      val iters = (1 to 3).map { k =>
        s"""i$k AS (SELECT e.dst AS node, sum(r.rank // d.outdeg) AS s
           |  FROM e JOIN deg d ON e.src = d.src
           |  JOIN r${k - 1} r ON r.node = e.src
           |  GROUP BY e.dst),
           |r$k AS (SELECT n.node,
           |  CAST(150000 + (coalesce(i.s, 0) * 850) // 1000 AS BIGINT)
           |    AS rank
           |  FROM nodes n LEFT JOIN i$k i ON n.node = i.node)""".stripMargin
      }.mkString(",\n")
      s"""WITH pairs AS (
         |  SELECT DISTINCT 'c' || o_custkey AS a, 's' || l_suppkey AS b
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         |e AS (SELECT a AS src, b AS dst FROM pairs
         |      UNION ALL SELECT b, a FROM pairs),
         |deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
         |nodes AS (SELECT DISTINCT src AS node FROM e),
         |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank FROM nodes),
         |$iters
         |SELECT node, rank AS rank_micro FROM r3""".stripMargin
    },

    // BM25: idf quantized to micro units before scoring, per-term
    // contribution floored before the cross-term sum, and every
    // double expression mirrors the engine's association order
    // (including computing 1 + 1.2 rather than a 2.2 literal)
    "q_bm25" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS t
        |  FROM documents),
        |base AS (
        |  SELECT doc_id,
        |    len(list_filter(t, x -> x <> '')) AS dl,
        |    len(list_filter(t, x -> x = 'spark')) AS tf0,
        |    len(list_filter(t, x -> x = 'join')) AS tf1,
        |    len(list_filter(t, x -> x = 'window')) AS tf2
        |  FROM toks),
        |stats AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(dl) AS BIGINT) AS sdl,
        |    CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df0,
        |    CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df1,
        |    CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df2
        |  FROM base),
        |c AS (
        |  SELECT CAST(sdl AS DOUBLE) / n AS avgdl,
        |    CAST(floor(ln((n - df0 + 0.5) / (df0 + 0.5) + 1) * 1000000)
        |      AS BIGINT) AS idf0,
        |    CAST(floor(ln((n - df1 + 0.5) / (df1 + 0.5) + 1) * 1000000)
        |      AS BIGINT) AS idf1,
        |    CAST(floor(ln((n - df2 + 0.5) / (df2 + 0.5) + 1) * 1000000)
        |      AS BIGINT) AS idf2
        |  FROM stats),
        |scored AS (
        |  SELECT b.doc_id,
        |    CAST(floor(idf0 * tf0 * (1 + 1.2)
        |      / (tf0 + 1.2 * (1 - 0.75 + 0.75 * b.dl / c.avgdl)))
        |      AS BIGINT)
        |    + CAST(floor(idf1 * tf1 * (1 + 1.2)
        |      / (tf1 + 1.2 * (1 - 0.75 + 0.75 * b.dl / c.avgdl)))
        |      AS BIGINT)
        |    + CAST(floor(idf2 * tf2 * (1 + 1.2)
        |      / (tf2 + 1.2 * (1 - 0.75 + 0.75 * b.dl / c.avgdl)))
        |      AS BIGINT) AS score_micro
        |  FROM base b, c)
        |SELECT doc_id, score_micro,
        |  CAST(row_number() OVER (ORDER BY score_micro DESC, doc_id)
        |    AS INTEGER) AS rank
        |FROM scored WHERE score_micro > 0
        |ORDER BY score_micro DESC, doc_id LIMIT 20""".stripMargin,

    // Efraimidis–Spirakis replay: deterministic uniform from the
    // portable hash, -ln(u)/w floored to nano units, k smallest
    "q_sample_weighted" ->
      s"""WITH k AS (
         |  SELECT doc_id, n_chars,
         |    CAST(floor(-ln((${duckHash60("CAST(doc_id AS VARCHAR)")}
         |        % 1000000 + 0.5) / 1000000.0)
         |      / CAST(n_chars AS DOUBLE) * 1000000000) AS BIGINT)
         |      AS key_nano
         |  FROM documents WHERE n_chars > 0)
         |SELECT doc_id, n_chars, key_nano,
         |  CAST(row_number() OVER (ORDER BY key_nano, doc_id) AS INTEGER)
         |    AS rank
         |FROM k ORDER BY key_nano, doc_id LIMIT 25""".stripMargin,

    // per-column stats replayed column-by-column; counts only, no
    // sums, so every aggregate is already BIGINT on both engines
    "q_profile" -> {
      val per = Seq("event_id", "user_id", "event_type", "value_cents")
        .map { c =>
          s"""SELECT '$c' AS col_name, count(*) AS n,
             |  count(*) - count($c) AS n_null,
             |  count(DISTINCT $c) AS n_distinct,
             |  CAST(min($c) AS VARCHAR) AS min_s,
             |  CAST(max($c) AS VARCHAR) AS max_s
             |FROM ev HAVING count(*) > 0""".stripMargin
        }.mkString("\nUNION ALL\n")
      s"""WITH ev AS (
         |  SELECT event_id, user_id, event_type,
         |         CAST(floor(value * 100) AS BIGINT) AS value_cents
         |  FROM events)
         |$per""".stripMargin
    },

    // chunk k covers tokens [1 + 4k, 1 + 4k + 7]; the list slice
    // clamps the trailing partial chunk on both engines
    "q_chunk_text" ->
      """WITH d AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '),
        |    x -> x <> '') AS tk
        |  FROM documents),
        |e AS (SELECT doc_id, tk,
        |        unnest(range(1, len(tk) + 1, 4)) AS start
        |      FROM d WHERE len(tk) > 0)
        |SELECT doc_id, CAST((start - 1) // 4 AS INTEGER) AS chunk_idx,
        |       CAST(start AS INTEGER) AS start_tok,
        |       CAST(len(tk[start:start+7]) AS INTEGER) AS n_toks,
        |       array_to_string(tk[start:start+7], ' ') AS chunk_text
        |FROM e""".stripMargin,

    // exact values + the contract bit the sketch must honor
    "q_profile_approx" -> {
      val per = Seq("event_id", "user_id", "event_type", "value_cents")
        .map { c =>
          s"""SELECT '$c' AS col_name, count(*) AS n,
             |  count(*) - count($c) AS n_null,
             |  count(DISTINCT $c) AS n_distinct,
             |  TRUE AS approx_ok
             |FROM ev HAVING count(*) > 0""".stripMargin
        }.mkString("\nUNION ALL\n")
      s"""WITH ev AS (
         |  SELECT event_id, user_id, event_type,
         |         CAST(floor(value * 100) AS BIGINT) AS value_cents
         |  FROM events)
         |$per""".stripMargin
    },

    // chunk CTE (the q_chunk_text replay) feeding the inverted-index
    // CTE (the q_inverted_index replay) over chunk ids
    "q_rag_index" ->
      """WITH d AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '),
        |    x -> x <> '') AS tk
        |  FROM documents),
        |e AS (SELECT doc_id, tk,
        |        unnest(range(1, len(tk) + 1, 4)) AS start
        |      FROM d WHERE len(tk) > 0),
        |chunks AS (
        |  SELECT doc_id || '#' || CAST((start - 1) // 4 AS INTEGER)
        |           AS chunk_id,
        |         tk[start:start+7] AS ct
        |  FROM e),
        |tf AS (SELECT tok, chunk_id, count(*) AS tf
        |       FROM (SELECT chunk_id, unnest(ct) AS tok FROM chunks)
        |       WHERE tok <> '' GROUP BY 1, 2),
        |r AS (SELECT tok, chunk_id, tf,
        |        row_number() OVER
        |          (PARTITION BY tok ORDER BY tf DESC, chunk_id) AS rank,
        |        count(*) OVER (PARTITION BY tok) AS df
        |      FROM tf)
        |SELECT tok, CAST(df AS BIGINT) AS df, CAST(rank AS INTEGER)
        |         AS rank, chunk_id, tf
        |FROM r WHERE rank <= 3""".stripMargin,

    // byte-exact BPE-apply replay: same boundary-aware merge chain
    // (double-space canonical form + </w> alphabet) over the same
    // total-order top-200 vocabulary
    "q_bpe_apply" -> {
      val chain = duckBpeChain("w", bpeFixtureMerges)
      s"""WITH toks AS (
         |  SELECT unnest(regexp_split_to_array(
         |    regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS w
         |  FROM documents),
         |types AS (SELECT w, count(*) AS freq FROM toks
         |          WHERE length(w) > 0 GROUP BY w),
         |top AS (SELECT w, CAST(freq AS BIGINT) AS freq FROM types
         |        ORDER BY freq DESC, w LIMIT 200)
         |SELECT w, freq, $chain AS pieces,
         |       CAST(len(string_split($chain, ' ')) AS BIGINT)
         |         AS n_pieces
         |FROM top""".stripMargin
    },

    // byte-exact BPE-encode replay: merge chain per word TYPE, join
    // back to positioned tokens, reassemble per document in word
    // order (string_agg ORDER BY pos)
    "q_bpe_encode" -> {
      val chain = duckBpeChain("w", bpeFixtureMerges)
      s"""WITH toks0 AS (
         |  SELECT doc_id, regexp_split_to_array(
         |    regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS t
         |  FROM documents),
         |toks AS (
         |  SELECT doc_id, i AS pos, t[i] AS w
         |  FROM (SELECT doc_id, t,
         |          unnest(generate_series(1, len(t))) AS i
         |        FROM toks0)
         |  WHERE length(t[i]) > 0),
         |types AS (SELECT DISTINCT w FROM toks),
         |pieces AS (
         |  SELECT w, $chain AS pieces,
         |         CAST(len(string_split($chain, ' ')) AS BIGINT)
         |           AS n_pieces
         |  FROM types)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
         |       CAST(sum(n_pieces) AS BIGINT) AS n_tokens,
         |       string_agg(pieces, ' ' ORDER BY pos) AS tokens
         |FROM toks JOIN pieces USING (w)
         |GROUP BY doc_id""".stripMargin
    },

    // packing replay over the encode counts: same hash shard, same
    // per-shard cumsum window, same div-512 sequence id
    "q_bpe_pack" -> {
      val chain = duckBpeChain("w", bpeFixtureMerges)
      val hash = duckHash60("CAST(doc_id AS VARCHAR)")
      s"""WITH toks0 AS (
         |  SELECT doc_id, regexp_split_to_array(
         |    regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS t
         |  FROM documents),
         |toks AS (
         |  SELECT doc_id, t[i] AS w
         |  FROM (SELECT doc_id, t,
         |          unnest(generate_series(1, len(t))) AS i
         |        FROM toks0)
         |  WHERE length(t[i]) > 0),
         |types AS (SELECT DISTINCT w FROM toks),
         |pieces AS (
         |  SELECT w, CAST(len(string_split($chain, ' ')) AS BIGINT)
         |           AS n_pieces
         |  FROM types),
         |enc AS (
         |  SELECT doc_id, CAST(sum(n_pieces) AS BIGINT) AS n_tokens
         |  FROM toks JOIN pieces USING (w)
         |  GROUP BY doc_id),
         |base AS (SELECT doc_id, n_tokens, $hash % 8 AS shard FROM enc),
         |o AS (SELECT doc_id, shard, n_tokens,
         |        sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
         |          ROWS UNBOUNDED PRECEDING) - n_tokens AS tok_offset
         |      FROM base)
         |SELECT doc_id, shard, n_tokens,
         |       CAST(tok_offset AS BIGINT) AS tok_offset,
         |       CAST(tok_offset // 512 AS BIGINT) AS seq_id
         |FROM o""".stripMargin
    },

    // byte-exact FIM replay: same salted portable hashes, same
    // substring arithmetic
    "q_fim_transform" -> {
      val hFim = duckHash60("CAST(doc_id AS VARCHAR) || '#fim'")
      val hS1 = duckHash60("CAST(doc_id AS VARCHAR) || '#s1'")
      val hS2 = duckHash60("CAST(doc_id AS VARCHAR) || '#s2'")
      val hSpm = duckHash60("CAST(doc_id AS VARCHAR) || '#spm'")
      s"""WITH base AS (
         |  SELECT doc_id, text, length(text) AS n,
         |         ($hFim) % 1000 < 600 AND length(text) >= 2 AS applied,
         |         ($hSpm) % 1000 < 500 AS spm,
         |         ($hS1) % (length(text) + 1) AS p1,
         |         ($hS2) % (length(text) + 1) AS p2
         |  FROM documents),
         |sp AS (SELECT doc_id, text, n, applied, spm,
         |         least(p1, p2) AS lo, greatest(p1, p2) AS hi
         |       FROM base),
         |parts AS (SELECT doc_id, text, n, applied, spm, lo, hi,
         |            substr(text, 1, CAST(lo AS INT)) AS pre,
         |            substr(text, CAST(lo + 1 AS INT),
         |              CAST(hi - lo AS INT)) AS mid,
         |            substr(text, CAST(hi + 1 AS INT),
         |              CAST(n - hi AS INT)) AS suf
         |          FROM sp)
         |SELECT doc_id,
         |  CASE WHEN applied THEN
         |         CASE WHEN spm THEN 'spm' ELSE 'psm' END
         |       ELSE 'none' END AS fim_mode,
         |  CASE WHEN applied THEN CAST(lo AS BIGINT) END AS split_lo,
         |  CASE WHEN applied THEN CAST(hi AS BIGINT) END AS split_hi,
         |  CASE WHEN applied THEN
         |         CASE WHEN spm THEN
         |           '<|fim_suffix|>' || suf || '<|fim_prefix|>' || pre
         |             || '<|fim_middle|>' || mid
         |         ELSE
         |           '<|fim_prefix|>' || pre || '<|fim_suffix|>' || suf
         |             || '<|fim_middle|>' || mid
         |         END
         |       ELSE text END AS fim_text,
         |  CAST(n AS BIGINT) AS n_chars
         |FROM parts""".stripMargin
    },

    // full-rebuild replay over the FINAL corpus — the incremental
    // path must match it bit-exactly after the two syncs
    "q_rag_incremental" ->
      """WITH d AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '),
        |    x -> x <> '') AS tk
        |  FROM documents WHERE doc_id % 5 <> 4),
        |e AS (SELECT doc_id, tk,
        |        unnest(range(1, len(tk) + 1, 4)) AS start
        |      FROM d WHERE len(tk) > 0),
        |chunks AS (
        |  SELECT doc_id || '#' || CAST((start - 1) // 4 AS INTEGER)
        |           AS chunk_id,
        |         tk[start:start+7] AS ct
        |  FROM e),
        |tf AS (SELECT tok, chunk_id, count(*) AS tf
        |       FROM (SELECT chunk_id, unnest(ct) AS tok FROM chunks)
        |       WHERE tok <> '' GROUP BY 1, 2),
        |r AS (SELECT tok, chunk_id, tf,
        |        row_number() OVER
        |          (PARTITION BY tok ORDER BY tf DESC, chunk_id) AS rank,
        |        count(*) OVER (PARTITION BY tok) AS df
        |      FROM tf)
        |SELECT tok, CAST(df AS BIGINT) AS df, CAST(rank AS INTEGER)
        |         AS rank, chunk_id, tf
        |FROM r WHERE rank <= 3""".stripMargin,

    "q_inverted_index" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '))
        |    AS tok
        |  FROM documents),
        |tf AS (SELECT tok, doc_id, count(*) AS tf FROM toks
        |       WHERE tok <> '' GROUP BY 1, 2),
        |r AS (SELECT tok, doc_id, tf,
        |        row_number() OVER
        |          (PARTITION BY tok ORDER BY tf DESC, doc_id) AS rank,
        |        count(*) OVER (PARTITION BY tok) AS df
        |      FROM tf)
        |SELECT tok, CAST(df AS BIGINT) AS df, CAST(rank AS INTEGER)
        |         AS rank, doc_id, tf
        |FROM r WHERE rank <= 5""".stripMargin,

    // the naive single-window rank the distributed recipe must equal,
    // plus the explicit equal-width bucket formula (the contract —
    // deliberately NOT SQL NTILE's remainder rule)
    "q_curriculum" ->
      """WITH r AS (SELECT doc_id, n_chars,
        |    row_number() OVER (ORDER BY n_chars, doc_id) AS rank,
        |    (SELECT count(*) FROM documents) AS n
        |  FROM documents)
        |SELECT doc_id, n_chars, CAST(rank AS BIGINT) AS rank,
        |       CAST((rank - 1) * 4 // n + 1 AS INTEGER) AS phase
        |FROM r""".stripMargin,
  )

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
