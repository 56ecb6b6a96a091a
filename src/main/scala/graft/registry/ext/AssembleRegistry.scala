package graft.registry.ext

import graft.core.{Diff, DiffOptions, Records}
import graft.ext.{Assemble, AudioHash, Curation, Dedup, ImageHash, Multimodal, Similarity, TextAnalysis, VideoHash}
import graft.mapper.Mapper
import graft.pipeline.{ImportService, Preset}
import graft.sources.InlineSource
import graft.targets.{FileTarget, JdbcTarget}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.registry.Shared._

/** LM-assembly tier: n-gram/Kneser-Ney/
  backoff perplexity ladder, BPE + unigram tokenizers, vocab/OOV,
  TF-IDF/BM25/PMI/inverted index, packing, FIM, DSIR/curriculum/
  mixing, tokenizer fertility.
  *
  * One ExtRegistry domain file (split from the
  * monolith, r15 verdict task 7) — entries moved
  * verbatim; [[graft.registry.ExtRegistry]]
  * aggregates the domain maps. */
private[graft] object AssembleRegistry {

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

    // BM25 retrieval scoring against a fixed query-term set — zero
    // token shuffle (per-term tf and dl are narrow array expressions;
    // corpus stats fold back as literals; top-k is a per-partition
    // heap)
    "q_bm25" -> ((s, dir) =>
      Assemble.bm25TopDocs(
        s.read.parquet(t(dir, "documents")), "doc_id", "text",
        Seq("spark", "join", "window"), topK = 20)
        .withColumnRenamed("id", "doc_id")),

    // inverted index with capped postings — the BM25 serving-side
    // companion; one (token, doc) shuffle, rank + df off one window
    // exchange
    "q_inverted_index" -> ((s, dir) =>
      Assemble.invertedIndex(
        s.read.parquet(t(dir, "documents")), "doc_id", "text",
        maxPostings = 5)
        .withColumnRenamed("id", "doc_id")),

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
          col("phase"))),
  )

  /** DuckDB oracles for this file's queries. */
  val oracles: Map[String, String] = Map(

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
}
