package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for large-scale training-data pipelines
 * (engine extension beyond the reference surface — BASELINE.json
 * north star). All pure `Column` expression compositions: codegen'd,
 * no UDFs, embarrassingly parallel — each document is scored
 * independently, so the plan is a single narrow projection that scales
 * linearly to 100 TB with zero shuffles.
 */
object TextAnalysis {

  /** The ONE canonical tokenization every shingle/hash/stat operator
    * shares: lowercase, trim, collapse whitespace, split on single
    * spaces. The DuckDB oracles replay this normalization verbatim
    * (`regexp_split_to_array(regexp_replace(lower(trim(text)),
    * '\s+', ' ', 'g'), ' ')`) — keeping it in one place keeps the
    * cross-engine contract in one place. */
  def normTokens(text: Column): Column =
    split(regexp_replace(lower(trim(text)), "\\s+", " "), " ")

  /** Whitespace token count (empty/blank text ⇒ 0). */
  def wsTokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish token count: word pieces + standalone punctuation, the
    * `\w+|[^\w\s]` convention used by most pre-tokenizers. */
  def bpeTokenCount(text: Column): Column =
    regexp_count(text, lit("\\w+|[^\\w\\s]"))

  /** Punctuation character ratio, rounded for cross-engine parity. */
  def punctRatio(text: Column): Column =
    round(regexp_count(text, lit("[^\\w\\s]")).cast("double") /
      greatest(length(text), lit(1)), 6)

  /** Stopword hit ratio over whitespace tokens. */
  val Stopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  def stopwordCount(text: Column): Column =
    Stopwords.map(w =>
      regexp_count(lower(text), lit(s"\\b${w}\\b"))).reduce(_ + _)

  def stopwordRatio(text: Column): Column =
    round(stopwordCount(text).cast("double") /
      greatest(wsTokenCount(text), lit(1)), 6)

  /**
   * Composite quality score in [0,1] — the standard
   * length/punctuation/stopword heuristic (cf. Gopher/C4-style rules):
   * prefers documents of reasonable length, low punctuation noise,
   * and a healthy function-word ratio.
   */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / lit(500.0), lit(1.0))
    val punctPenalty = lit(1.0) - least(punctRatio(text) * 5, lit(1.0))
    val stopScore = least(stopwordRatio(text) * 4, lit(1.0))
    round((lenScore + punctPenalty + stopScore) / 3, 6)
  }

  /**
   * N-gram-heuristic language ID: scores each candidate language by
   * counting hits of its most characteristic function words and picks
   * the argmax (deterministic tie-break by score list order).
   * A real system would use character-n-gram profiles; the operator
   * shape (per-doc scoring → argmax, no shuffle) is identical.
   */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is"),
    "de" -> Seq("der", "und", "die", "ist"),
    "fr" -> Seq("le", "et", "les", "est"),
    "es" -> Seq("el", "y", "los", "es"),
    "zh" -> Seq("的", "是", "了", "在"))

  def langScore(text: Column, markers: Seq[String]): Column =
    markers.map(w => regexp_count(lower(text), lit(s"\\b${w}\\b")))
      .reduce(_ + _)

  def langId(text: Column): Column = {
    // argmax via a single greatest() pass over (score, -index, lang)
    // structs — one expression, still codegen'd.
    val scored = LangMarkers.zipWithIndex.map { case ((lang, ms), i) =>
      struct(langScore(text, ms).as("s"), lit(-i).as("o"), lit(lang).as("l"))
    }
    greatest(scored: _*).getField("l")
  }

  /** Document fingerprint: hash of whitespace-normalized lowercased
    * text — the exact-dedup key. */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(text), "\\s+", " ").cast("binary"))

  /**
   * 60-bit engine-portable hash: the top 15 hex chars of md5,
   * parsed as an integer. Spark and DuckDB
   * (`CAST('0x' || substr(md5(x),1,15) AS BIGINT)`) produce the
   * identical value, which is what lets the sketch queries
   * (simhash / minhash / rolling hash) be oracle-checked end to end.
   * Computed by the codegen'd [[graft.functions.PortableHash60]]
   * kernel — same value as `conv(substring(md5(x),1,15),16,10)`
   * without the hex-string round-trip that dominated BENCH_r02's
   * dedup queries. xxhash64 stays the default for paths that don't
   * need cross-engine replay — it's still faster.
   */
  def portableHash60(c: Column): Column =
    graft.functions.GraftFunctions.portable_hash60(c)

  /** Rolling (Karp-Rabin-style) content hash over words — order-aware
    * fingerprint that, unlike md5, can be windowed for chunk-level
    * dedup. Polynomial accumulation via `aggregate` over the token
    * array; base/mod chosen to stay in exact Long range. Token hashes
    * come from [[portableHash60]], so an oracle can replay the exact
    * polynomial (acc*31 + h) mod p in another engine. */
  def rollingHash(text: Column): Column = {
    val tokens = normTokens(text)
    aggregate(tokens, lit(0L),
      (acc, t) => pmod(acc * 31 + pmod(portableHash60(t), lit(1000003L)),
        lit(2147483647L)))
  }

  /**
   * Fixed-position chunk fingerprints: non-overlapping `chunkTokens`-
   * token chunks, each reduced by the portable rolling hash —
   * passage-level dedup keys. Shared chunk hashes across documents
   * reveal ALIGNED duplication (boilerplate headers/footers, common
   * prefixes, whole-document copies) that per-document similarity
   * reports as one opaque score. Position-shifted copies need
   * content-defined chunking ([[cdcChunkHashes]]).
   */
  def chunkHashes(text: Column, chunkTokens: Int = 32): Column = {
    val tokens = normTokens(text)
    val nChunks = ceil(size(tokens).cast("double") / chunkTokens).cast("int")
    transform(sequence(lit(0), nChunks - 1), i =>
      aggregate(slice(tokens, i * chunkTokens + 1, lit(chunkTokens)), lit(0L),
        (acc, t) => pmod(acc * 31 + pmod(portableHash60(t), lit(1000003L)),
          lit(2147483647L))))
  }

  /**
   * Overlapping fixed-token chunking that MATERIALIZES chunk text —
   * the retrieval/embedding-pipeline splitter ("512-token windows
   * with 64-token overlap") as opposed to [[chunkHashes]], which only
   * fingerprints. One output row per chunk: (id, chunk_idx,
   * start_tok, n_toks, chunk_text), chunk k starting at token
   * 1 + k·(chunkTokens − overlap); a trailing partial chunk emits.
   *
   * Scale shape: a pure narrow explode — tokens never leave their
   * row before the chunk rows are formed, no shuffle; output volume
   * is corpus size × (1 + overlap/(chunkTokens − overlap)).
   */
  def chunkText(
      df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, overlap: Int): DataFrame = {
    require(chunkTokens > 0, "chunkTokens must be positive")
    require(overlap >= 0 && overlap < chunkTokens,
      "overlap must be in [0, chunkTokens)")
    val stride = chunkTokens - overlap
    val toks = filter(normTokens(col(textCol)), t => length(t) > 0)
    df.select(col(idCol).as("id"), toks.as("__toks"))
      .filter(size(col("__toks")) > 0)
      .select(col("id"), col("__toks"),
        explode(sequence(lit(1), size(col("__toks")), lit(stride)))
          .as("start_tok"))
      .select(col("id"),
        (((col("start_tok") - 1) / stride).cast("int")).as("chunk_idx"),
        col("start_tok").cast("int").as("start_tok"),
        slice(col("__toks"), col("start_tok"), lit(chunkTokens))
          .as("__chunk"))
      .withColumn("n_toks", size(col("__chunk")))
      .withColumn("chunk_text", array_join(col("__chunk"), " "))
      .drop("__chunk")
  }

  /**
   * Per-document duplicate-passage annotation (the Dolma/RefinedWeb
   * "fraction of duplicated paragraphs" quality signal): for each doc,
   * how many of its fixed-position chunks ([[chunkHashes]]) also
   * appear in at LEAST one OTHER document. Unlike the dedup queries
   * (which return the shared chunks), this annotates every document —
   * the gating signal a curation pipeline thresholds on ("drop docs
   * that are >30% boilerplate") without deciding for the caller.
   *
   * Scale shape: explode to (id, chunk_hash), ONE shuffle to count
   * distinct docs per hash (distinct-then-count, both combine
   * map-side), join back on the hash, re-aggregate per doc. The
   * fraction is over ALL of the doc's chunks (with multiplicity —
   * it measures how much of the DOCUMENT is duplicated), but a hash
   * only counts as duplicated when some OTHER document contains it;
   * within-doc repetition alone is [[repetitionSignals]]' business.
   *
   * Returns (id, n_chunks, n_dup_chunks, dup_chunk_frac).
   */
  def dupChunkStats(
      df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int = 32): DataFrame = {
    val chunks = graft.util.Tables.spread(df)
      .select(col(idCol).as("id"),
        explode(chunkHashes(col(textCol), chunkTokens)).as("ch"))
      .persist()
    try {
      val docFreq = chunks.distinct().groupBy(col("ch"))
        .agg(count(lit(1)).as("n_docs"))
      val perDoc = chunks.join(docFreq, "ch")
        .groupBy(col("id")).agg(
          count(lit(1)).as("n_chunks"),
          sum(when(col("n_docs") >= 2, 1L).otherwise(0L))
            .as("n_dup_chunks"))
      perDoc.select(col("id"), col("n_chunks"), col("n_dup_chunks"),
          round(col("n_dup_chunks").cast("double") / col("n_chunks"), 6)
            .as("dup_chunk_frac"))
        .localCheckpoint()
    } finally chunks.unpersist()
  }

  /**
   * Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03 —
   * the MOSS algorithm): hash every `k`-token gram, slide a
   * `window`-gram window, keep each window's MINIMUM hash. The
   * guarantee the chunk-based passes lack: any shared token run of
   * length ≥ k + window - 1 yields at least one shared fingerprint,
   * at ANY offset in either document — while storing only ~2/(window+1)
   * of the gram hashes. [[chunkHashes]] needs alignment, [[cdcChunks]]
   * needs a boundary to land inside the overlap; winnowing needs
   * neither.
   *
   * Returns DISTINCT (id, fp) rows — the document's fingerprint set.
   * Shared-substring detection is then a fingerprint equi-join
   * (see the q_winnow_dup query). Only full windows fingerprint, so a
   * doc needs ≥ k + window - 1 tokens to produce any row (shorter
   * docs are absent, deterministically).
   *
   * Scale shape: explode to (id, pos, gram-hash) — positional, NOT
   * the distinct [[graft.ext.Dedup.shingles]] set — then ONE shuffle
   * on the doc id for the rolling window min, then distinct. All
   * hashes portable; an oracle replays window mins exactly.
   */
  def winnowFingerprints(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 8, window: Int = 4): DataFrame = {
    require(k >= 1 && window >= 1, "k and window must be >= 1")
    val tokens = normTokens(col(textCol))
    val nGrams = size(tokens) - k + 1
    // sequence(1, 0) is DESCENDING [1, 0] in Spark, not empty — short
    // docs need the explicit empty branch
    val grams = when(nGrams >= 1,
      transform(sequence(lit(1), nGrams),
        i => concat_ws(" ", slice(tokens, i, lit(k)))))
      .otherwise(array())
    val hashed = graft.util.Tables.spread(df)
      .select(col(idCol).as("id"), posexplode(grams))
      .select(col("id"), (col("pos") + 1).as("pos"),
        pmod(portableHash60(col("col")), lit(1000003L)).as("h"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy("pos")
      .rowsBetween(-(window - 1), 0)
    hashed
      .withColumn("fp", min(col("h")).over(w))
      .filter(col("pos") >= window) // full windows only
      .select(col("id"), col("fp"))
      .distinct()
  }

  /**
   * Shift-robust duplicate-passage annotation: like [[dupChunkStats]]
   * but over CONTENT-DEFINED chunks ([[cdcChunks]]), so a passage two
   * docs share at different offsets still counts — and TOKEN-weighted
   * (`dup_token_frac` = tokens inside cross-doc-duplicated chunks /
   * total tokens), because CDC chunks vary in length and "30% of the
   * document" should mean text, not chunk count. Tiny chunks below
   * `minTokens` are ignored on BOTH sides of the fraction (boundary
   * slivers shared by accident would otherwise inflate it).
   *
   * Returns (id, n_tokens_considered, n_dup_tokens, dup_token_frac).
   */
  def dupCdcStats(
      df: DataFrame, idCol: String, textCol: String,
      avgChunkTokens: Int = 64, minTokens: Int = 8): DataFrame = {
    val chunks = cdcChunks(df, idCol, textCol, avgChunkTokens)
      .filter(col("n_tokens") >= minTokens)
      .select(col("id"), col("chunk_hash"), col("n_tokens"))
      .persist()
    try {
      val docFreq = chunks.select(col("id"), col("chunk_hash")).distinct()
        .groupBy(col("chunk_hash")).agg(count(lit(1)).as("n_docs"))
      chunks.join(docFreq, "chunk_hash")
        .groupBy(col("id")).agg(
          sum(col("n_tokens")).as("n_tokens_considered"),
          sum(when(col("n_docs") >= 2, col("n_tokens")).otherwise(0L))
            .as("n_dup_tokens"))
        .select(col("id"), col("n_tokens_considered"), col("n_dup_tokens"),
          round(col("n_dup_tokens").cast("double") /
            col("n_tokens_considered"), 6).as("dup_token_frac"))
        .localCheckpoint()
    } finally chunks.unpersist()
  }

  /**
   * Exact duplicated-SPAN annotation (the Lee et al. 2022
   * "Deduplicating Training Data Makes Language Models Better" /
   * Dolma exact-substring signal): mark every token position whose
   * `n`-gram also occurs in at least one OTHER document, merge
   * overlapping-or-adjacent marked gram intervals `[p, p+n-1]` into
   * MAXIMAL spans, and report per document the span count and the
   * exact number of tokens inside some cross-document repeated run
   * of ≥ n tokens. Where [[dupChunkStats]] counts whole aligned
   * chunks and [[winnowFingerprints]] samples fingerprints, this
   * names exactly WHICH tokens an exact-substring dedup pass would
   * cut — and because any shared run of length L ≥ n marks all of
   * its L tokens (every window inside it is shared), the coverage is
   * exact at any offset, no alignment or boundary luck required.
   *
   * Span merge: duplicated gram starts p sorted per doc; a new span
   * opens when `p - prev_p > n` (gap too wide for the token
   * intervals to touch); a span covering gram starts [first..last]
   * covers `last - first + n` tokens. All arithmetic is exact
   * integers; `dup_ppm` is truncating integer parts-per-million, so
   * the row replays bit-for-bit in any engine.
   *
   * Scale shape: posexplode to (id, p, gram-hash); distinct-then-
   * count to find cross-doc hashes (both combine map-side); semi-join
   * back (AQE broadcasts when the dup set is small — it is, it's the
   * *shared* content); ONE shuffle on the doc id for the span window;
   * the island aggregations reuse that partitioning (grouping keys ⊇
   * id). Nothing driver-side; partitions bounded by doc length.
   *
   * Returns (id, n_tokens, n_spans, dup_tokens, dup_ppm).
   */
  def dupSpanStats(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 13): DataFrame = {
    require(n >= 1, "n must be >= 1")
    val tokens = normTokens(col(textCol))
    val nGrams = size(tokens) - n + 1
    // sequence(1, 0) is DESCENDING, not empty — explicit empty branch
    val grams = when(nGrams >= 1,
      transform(sequence(lit(1), nGrams),
        i => concat_ws(" ", slice(tokens, i, lit(n)))))
      .otherwise(array())
    val base = graft.util.Tables.spread(df)
      .select(col(idCol).as("id"), size(tokens).as("n_tokens"),
        grams.as("grams"))
      .persist()
    try {
      val pos = base.select(col("id"), posexplode(col("grams")))
        .select(col("id"), (col("pos") + 1).as("p"),
          portableHash60(col("col")).as("gh"))
      val dupGh = pos.select(col("id"), col("gh")).distinct()
        .groupBy(col("gh")).agg(count(lit(1)).as("n_docs"))
        .filter(col("n_docs") >= 2).select(col("gh"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("id").orderBy("p")
      val islands = pos.join(dupGh, Seq("gh"), "left_semi")
        .withColumn("brk",
          when(col("p") - lag(col("p"), 1).over(w) > n, 1).otherwise(0))
        .withColumn("island", sum(col("brk")).over(
          w.rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, 0)))
        .groupBy(col("id"), col("island"))
        .agg((max(col("p")) - min(col("p")) + n).as("covered"))
      val perDoc = islands.groupBy(col("id")).agg(
        count(lit(1)).as("n_spans"),
        sum(col("covered")).as("dup_tokens"))
      base.select(col("id"), col("n_tokens").cast("long").as("n_tokens"))
        .join(perDoc, Seq("id"), "left")
        .select(col("id"), col("n_tokens"),
          coalesce(col("n_spans"), lit(0L)).as("n_spans"),
          coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
          expr("(coalesce(dup_tokens, 0) * 1000000) div n_tokens")
            .as("dup_ppm"))
        .localCheckpoint()
    } finally base.unpersist()
  }

  /**
   * Cross-document EXACT-SUBSTRING SCRUB — the REMOVAL half of
   * [[dupSpanStats]]'s detection (Lee et al. 2022, "Deduplicating
   * Training Data Makes Language Models Better": repeated ≥n-token
   * substrings are cut from the corpus, not just counted). Every
   * n-token gram occurring in ≥2 distinct documents keeps exactly its
   * GLOBALLY FIRST occurrence — minimum (id, position), a total order
   * both engines share — and every other occurrence's token range is
   * cut; overlapping cut ranges merge into islands (the
   * [[dupSpanStats]] island rule, so cut intervals are provably
   * disjoint) and each document re-assembles from its surviving
   * tokens.
   *
   * Scale shape: the [[dupSpanStats]] skeleton — posexplode to (id,
   * p, gram-hash); distinct-then-count for the cross-doc hash set
   * (map-side combine); ONE mergeable min(struct(id, p)) aggregation
   * finds the global first occurrence per dup hash; islands over one
   * id-partitioned window; the per-doc cut list (bounded by span
   * count) drives a single filter over the token array. Nothing
   * driver-side; the rebuild is per-doc local.
   *
   * @return (id, n_tokens, kept_tokens, scrubbed_text) — the text is
   *         whitespace-normalized (both engines rebuild from tokens).
   */
  def scrubDupSpans(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 13): DataFrame = {
    require(n >= 1, "n must be >= 1")
    val tokens = normTokens(col(textCol))
    val nGrams = size(tokens) - n + 1
    // sequence(1, 0) is DESCENDING, not empty — explicit empty branch
    val grams = when(nGrams >= 1,
      transform(sequence(lit(1), nGrams),
        i => concat_ws(" ", slice(tokens, i, lit(n)))))
      .otherwise(array())
    val base = graft.util.Tables.spread(df)
      .select(col(idCol).as("id"), tokens.as("toks"), grams.as("grams"))
      .persist()
    try {
      val pos = base.select(col("id"), posexplode(col("grams")))
        .select(col("id"), (col("pos") + 1).as("p"),
          portableHash60(col("col")).as("gh"))
      val dupGh = pos.select(col("id"), col("gh")).distinct()
        .groupBy(col("gh")).agg(count(lit(1)).as("n_docs"))
        .filter(col("n_docs") >= 2).select(col("gh"))
      val occ = pos.join(dupGh, Seq("gh"), "left_semi")
      // the global first occurrence per dup gram: min over the
      // (id, p) struct — lexicographic, mergeable map-side
      val first = occ.groupBy(col("gh"))
        .agg(min(struct(col("id"), col("p"))).as("f"))
      val nonWin = occ.join(first, Seq("gh"))
        .filter(!(col("id") === col("f.id") && col("p") === col("f.p")))
        .select(col("id"), col("p"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("id").orderBy("p")
      val cuts = nonWin
        .withColumn("brk",
          when(col("p") - lag(col("p"), 1).over(w) > n, 1).otherwise(0))
        .withColumn("island", sum(col("brk")).over(
          w.rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, 0)))
        .groupBy(col("id"), col("island"))
        .agg(min(col("p")).as("start"),
          (max(col("p")) + n - 1).as("end"))
        .groupBy(col("id"))
        .agg(sort_array(collect_list(struct(col("start"), col("end"))))
          .as("cuts"))
      val emptyCuts = array().cast("array<struct<start:int,end:int>>")
      val indexed = zip_with(col("toks"),
        sequence(lit(1), size(col("toks"))),
        (tok, i) => struct(tok.as("tok"), i.as("i")))
      val kept = filter(indexed, s =>
        !exists(coalesce(col("cuts"), emptyCuts), c =>
          s.getField("i") >= c.getField("start") &&
            s.getField("i") <= c.getField("end")))
      base.join(cuts, Seq("id"), "left")
        .select(col("id"),
          size(col("toks")).cast("long").as("n_tokens"),
          size(kept).cast("long").as("kept_tokens"),
          concat_ws(" ",
            transform(kept, s => s.getField("tok"))).as("scrubbed_text"))
        .localCheckpoint()
    } finally base.unpersist()
  }

  /**
   * Content-defined chunking (CDC): a token ends up starting a new
   * chunk wherever its hash satisfies `h % avgChunkTokens == 0` —
   * boundaries derive from CONTENT, not position, so a passage two
   * documents share at DIFFERENT offsets still splits into identical
   * chunks (the insertion-shift problem that defeats fixed-position
   * [[chunkHashes]]; the standard dedup-storage technique applied
   * token-wise). Returns (id, chunk, chunk_hash, n_tokens).
   *
   * Scale shape: explode to (id, pos, token-hash) rows, ONE shuffle
   * on the document id (window cumsum assigns chunk ids), per-chunk
   * fold bounded by chunk length. All hashes portable — an oracle
   * replays boundaries and fingerprints exactly.
   */
  def cdcChunks(
      df: DataFrame, idCol: String, textCol: String,
      avgChunkTokens: Int = 64): DataFrame = {
    val toks = graft.util.Tables.spread(df)
      .select(col(idCol).as("id"),
        posexplode(normTokens(col(textCol))))
      .toDF("id", "pos", "tok")
    val hashed = toks.select(col("id"), col("pos"),
      pmod(portableHash60(col("tok")), lit(1000003L)).as("h"))
      .withColumn("b",
        when(pmod(col("h"), lit(avgChunkTokens.toLong)) === 0, 1L)
          .otherwise(0L))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy("pos")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val chunked = hashed.withColumn("chunk",
      coalesce(sum(col("b")).over(w), lit(0L)))
    chunked.groupBy(col("id"), col("chunk"))
      .agg(sort_array(collect_list(struct(col("pos"), col("h")))).as("hs"))
      .select(col("id"), col("chunk"),
        aggregate(col("hs"), lit(0L), (acc, s) =>
          pmod(acc * 31 + s.getField("h"), lit(2147483647L)))
          .as("chunk_hash"),
        size(col("hs")).cast("long").as("n_tokens"))
  }

  // ── PII scrubbing ─────────────────────────────────────────────────
  // Patterns live in the common Java-regex / RE2 subset so the DuckDB
  // oracle replays them verbatim (with the 'g' flag); both engines'
  // match semantics coincide on these (greedy character classes with
  // a fixed tail — leftmost-first-with-backtracking and
  // leftmost-longest pick the same span).

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  /** Digit-led runs of digits/space/()-. with a digit tail, ≥ 9 chars
    * — phone-shaped. Applied AFTER [[Ipv4Re]] (an IPv4 is itself
    * phone-shaped). */
  val PhoneRe = "\\+?\\d[\\d() .-]{7,}\\d"

  /** The scrub expression alone — emails → IPv4s → phones replaced
    * in class order with typed placeholders. Schema-preserving, so a
    * configured dataProcessor can rewrite a text attribute in place
    * ([[graft.pipeline.Processors]] "scrub_text"). */
  def piiScrubText(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /**
   * PII scrub for training corpora: redact emails → IPv4s → phone
   * numbers (in that order — each class would otherwise swallow the
   * next: `@`-less IPs are phone-shaped) with typed placeholder
   * tokens, counting each class as it is removed. A single narrow
   * projection — per-document regex work, zero shuffles, linear to
   * 100 TB.
   */
  def piiScrub(df: DataFrame, idCol: String, textCol: String): DataFrame =
    graft.util.Tables.spread(df)
      .select(col(idCol), col(textCol).as("__t0"))
      .withColumn("n_emails", regexp_count(col("__t0"), lit(EmailRe)).cast("long"))
      .withColumn("__t1", regexp_replace(col("__t0"), EmailRe, "<EMAIL>"))
      .withColumn("n_ips", regexp_count(col("__t1"), lit(Ipv4Re)).cast("long"))
      .withColumn("__t2", regexp_replace(col("__t1"), Ipv4Re, "<IP>"))
      .withColumn("n_phones", regexp_count(col("__t2"), lit(PhoneRe)).cast("long"))
      .select(col(idCol),
        regexp_replace(col("__t2"), PhoneRe, "<PHONE>").as("scrubbed"),
        col("n_emails"), col("n_ips"), col("n_phones"))

  // ── Repetition signals (Gopher-style quality filters) ─────────────

  /**
   * Per-document repetition statistics — the Gopher/C4 family of
   * repetition-based quality filters: most-frequent-token count,
   * most-frequent-2-gram count, longest consecutive same-token run,
   * and the duplicate-token fraction. Highly repetitive documents
   * (boilerplate, keyword stuffing, degenerate generations) score
   * high and get filtered before training.
   *
   * Scale shape: explode to (id, pos, token) rows — narrow — then
   * every aggregate/window is keyed by the document id, so the plan
   * is id-hash shuffles whose partitions are bounded by document
   * length regardless of corpus size. No driver-side collection, no
   * per-document O(len²) lambda work. The exploded frame feeds three
   * independent aggregation branches, so it is persisted for the
   * call (re-deriving it would re-scan and re-explode the corpus 3×)
   * and the per-document result handed back localCheckpoint'ed —
   * computed, lineage-free, no unpersist obligation on the caller.
   * The trade: checkpoint blocks are not recomputable under executor
   * loss — long-lived consumers at cluster scale should write the
   * result to storage rather than hold the frame.
   */
  def repetitionSignals(
      df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = graft.util.Tables.spread(df)
      .select(col(idCol).as("id"),
        posexplode(normTokens(col(textCol))))
      .toDF("id", "pos", "tok")
      .persist()
    try {
      val w = Window.partitionBy("id").orderBy("pos")

      val tokCounts = toks.groupBy(col("id"), col("tok"))
        .agg(count(lit(1)).as("c"))
      val tokStats = tokCounts.groupBy(col("id")).agg(
        sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        max(col("c")).as("top_tok_n"))

      val gramStats = toks
        .withColumn("next", lead(col("tok"), 1).over(w))
        .filter(col("next").isNotNull)
        .select(col("id"), concat_ws(" ", col("tok"), col("next")).as("g"))
        .groupBy(col("id"), col("g")).agg(count(lit(1)).as("c"))
        .groupBy(col("id")).agg(max(col("c")).as("top_2gram_n"))

      val runStats = toks
        .withColumn("chg",
          when(lag(col("tok"), 1).over(w).isNull ||
            lag(col("tok"), 1).over(w) =!= col("tok"), 1L).otherwise(0L))
        .withColumn("seg",
          sum(col("chg")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy(col("id"), col("seg")).agg(count(lit(1)).as("c"))
        .groupBy(col("id")).agg(max(col("c")).as("max_run"))

      tokStats
        .join(gramStats, Seq("id"), "left")
        .join(runStats, Seq("id"), "left")
        .select(col("id"), col("n_tokens"), col("n_distinct"),
          col("top_tok_n"),
          coalesce(col("top_2gram_n"), lit(0L)).as("top_2gram_n"),
          col("max_run"),
          round(lit(1.0) - col("n_distinct").cast("double") /
            col("n_tokens"), 6).as("dup_tok_frac"))
        .localCheckpoint()
    } finally { toks.unpersist() }
  }

  // ── Gopher rule battery ───────────────────────────────────────────

  /** The Gopher repetition-free quality-filter stopword set (Rae et
    * al. 2021, Table A1) — a document must contain at least two of
    * these to pass. Distinct from [[Stopwords]] (the RATIO heuristic);
    * the rule battery counts KINDS present. */
  val GopherStops: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /**
   * The full Gopher document-quality rule battery (Rae et al. 2021,
   * Table A1) — the standard pre-training hygiene gate: word-count
   * bounds, mean word length, symbol-to-word ratio, bullet-line and
   * ellipsis-line fractions, alphabetic-word fraction, and
   * stopword-kind count, each returned as its own signal plus the
   * composite pass flag (so a pipeline can threshold individual rules
   * differently without recomputing).
   *
   * Every signal is a pure narrow expression over one document — zero
   * shuffles, linear to 100 TB — and every fraction is rounded to 6
   * places BEFORE the rule comparison, so another engine replays the
   * pass flag exactly.
   */
  def gopherRules(
      df: DataFrame, idCol: String, textCol: String,
      minWords: Long = 50L, maxWords: Long = 100000L): DataFrame = {
    val t = col(textCol)
    val toks = normTokens(t)
    val nWords = wsTokenCount(t).cast("long")
    val sumLen = aggregate(toks, lit(0L), (a, x) => a + length(x))
    val meanLen = round(sumLen.cast("double") /
      greatest(nWords, lit(1L)), 6)
    val symRatio = round(
      (regexp_count(t, lit("#")) + regexp_count(t, lit("\\.\\.\\.")))
        .cast("double") / greatest(nWords, lit(1L)), 6)
    val lines = split(t, "\n")
    val nLines = size(lines).cast("long") // split('') = [''] — never 0
    val bulletFrac = round(
      size(filter(lines, l =>
        substring(ltrim(l), 1, 1).isin("-", "*", "•")))
        .cast("double") / nLines, 6)
    val ellipsisFrac = round(
      size(filter(lines, l => endswith(rtrim(l), lit("..."))))
        .cast("double") / nLines, 6)
    val alphaFrac = round(
      size(filter(toks, x => x.rlike("[a-z]"))).cast("double") /
        greatest(nWords, lit(1L)), 6)
    val nStopKinds = GopherStops.map(w =>
      when(lower(t).rlike(s"\\b${w}\\b"), 1L).otherwise(0L))
      .reduce(_ + _)

    graft.util.Tables.spread(df)
      .select(col(idCol).as("id"),
        nWords.as("n_words"), meanLen.as("mean_word_len"),
        symRatio.as("symbol_ratio"), bulletFrac.as("bullet_line_frac"),
        ellipsisFrac.as("ellipsis_line_frac"),
        alphaFrac.as("alpha_word_frac"), nStopKinds.as("n_stop_kinds"))
      .withColumn("gopher_pass",
        (col("n_words") >= minWords && col("n_words") <= maxWords &&
          col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0 &&
          col("symbol_ratio") <= 0.1 &&
          col("bullet_line_frac") <= 0.9 &&
          col("ellipsis_line_frac") <= 0.3 &&
          col("alpha_word_frac") >= 0.8 &&
          col("n_stop_kinds") >= 2L).cast("long"))
  }

  // ── Encoding-damage + entropy signals ─────────────────────────────

  /**
   * Encoding-damage signals: U+FFFD replacement characters (the
   * scar mojibake leaves after a bad decode) and C0 control
   * characters other than tab/newline/CR — the Dolma/C4-family
   * "drop encoding-damaged documents" gate. One narrow regex
   * projection, zero shuffles; both character classes are literal
   * code-point ranges, so any engine replays the counts.
   * `enc_clean` = no replacement chars and control ratio under 1%.
   */
  def encodingSignals(
      df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    graft.util.Tables.spread(df)
      .select(col(idCol).as("id"),
        length(t).as("n_chars"),
        regexp_count(t, lit("�")).cast("long").as("n_replacement"),
        regexp_count(t, lit("[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]"))
          .cast("long").as("n_control"))
      .withColumn("enc_clean",
        (col("n_replacement") === 0L &&
          col("n_control") * 100L <= col("n_chars")).cast("long"))
  }

  /**
   * URL/domain filter signals — the CCNet/Dolma-family "filter by
   * where it came from" gate, run before any text is read: host and
   * path via Spark's native `parse_url`, registered domain as the
   * last two host labels (documented simplification of the public
   *-suffix list; swap in an eTLD table join for production), path
   * depth, query-string presence, IP-literal hosts, and a
   * blocklist-driven keep decision. One narrow projection, zero
   * shuffles — the blocklist is a plan literal (`isin`), the right
   * shape for a list that fits a broadcast at any corpus size.
   * IP-literal hosts have no registered domain (NULL) and are
   * rejected outright, the standard crawl-pipeline rule.
   */
  def urlSignals(df: DataFrame, idCol: String, urlCol: String,
      blockedDomains: Seq[String]): DataFrame = {
    val host = parse_url(col(urlCol), lit("HOST"))
    val path = parse_url(col(urlCol), lit("PATH"))
    val ipHost = host.rlike("^[0-9.]+$")
    val regDomain = when(ipHost, lit(null).cast("string"))
      .otherwise(concat_ws(".", slice(split(host, "\\."), -2, 2)))
    val blocked = ipHost || regDomain.isin(blockedDomains: _*)
    graft.util.Tables.spread(df)
      .select(col(idCol).as("id"),
        host.as("host"), regDomain.as("reg_domain"),
        size(filter(split(path, "/"), s => length(s) > 0))
          .as("path_depth"),
        parse_url(col(urlCol), lit("QUERY")).isNotNull.cast("long")
          .as("has_query"),
        ipHost.cast("long").as("ip_host"),
        blocked.cast("long").as("blocked"),
        (!blocked).cast("long").as("url_ok"))
  }

  /**
   * Unicode canonical-composition (NFC) signals: canonically
   * equivalent text in composed vs decomposed form must fingerprint
   * identically before hash-based dedup, so NFC is the standard
   * pre-hash step in corpus cleanup. `changed` flags documents whose
   * bytes moved under NFC; `fp_nfc` is the post-normalization md5
   * fingerprint downstream dedup keys on. Runs the codegen'd
   * [[graft.functions.NfcNormalize]] native expression — one narrow
   * projection, zero shuffles; DuckDB replays it via its own
   * `nfc_normalize` (both implement the published Unicode algorithm).
   */
  def nfcSignals(df: DataFrame, idCol: String, textCol: String): DataFrame =
    graft.util.Tables.spread(df)
      .select(col(idCol).as("id"), col(textCol).as("raw"),
        graft.functions.GraftFunctions.nfc_normalize(col(textCol)).as("nfc"))
      .select(col("id"),
        (col("raw") =!= col("nfc")).cast("long").as("changed"),
        length(col("raw")).as("n_chars_raw"),
        length(col("nfc")).as("n_chars_nfc"),
        md5(col("nfc").cast("binary")).as("fp_nfc"))

  /**
   * Per-document character-distribution entropy in exact integer
   * micro-nats — the gibberish/degenerate-text signal (natural prose
   * sits in a band; keyboard mash, base64 blobs, and single-char
   * floods fall outside it). H = Σ_c (n_c/N)·(−ln(n_c/N)); each
   * term is fixed to integer micro-nats as n_c · floor(−ln(n_c/N)·1e6)
   * BEFORE the sum, divided by N with truncating integer division —
   * the [[graft.ext.Assemble.unigramSurprisal]] parity discipline,
   * so the result replays exactly.
   *
   * Scale shape: ONE corpus scan — explode to (id, char) (narrow),
   * groupBy(id, char) with map-side combine, then the per-document
   * totals come from a window over the (id, char) COUNT rows (one
   * id-exchange over rows bounded by per-doc alphabet size, not text
   * length), then the final groupBy(id) reuses that partitioning.
   * The first cut joined a second aggregation branch back instead —
   * two corpus scans; the window form halves the I/O.
   */
  def charEntropy(
      df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = graft.util.Tables.spread(df)
      .select(col(idCol).as("id"), explode(split(col(textCol), "")).as("c"))
      .filter(length(col("c")) > 0)
      .groupBy(col("id"), col("c"))
      .agg(count(lit(1)).as("n_c"))
    val w = Window.partitionBy(col("id"))
    counts
      .withColumn("n_chars", sum(col("n_c")).over(w))
      .withColumn("n_distinct", count(lit(1)).over(w))
      .select(col("id"), col("n_chars"), col("n_distinct"),
        (col("n_c") *
          floor(-log(col("n_c").cast("double") / col("n_chars")) * 1000000L)
            .cast("long")).as("h_part"))
      .groupBy(col("id"), col("n_chars"), col("n_distinct"))
      .agg(sum(col("h_part")).as("h_sum"))
      .select(col("id"), col("n_chars"), col("n_distinct"),
        expr("h_sum div n_chars").as("entropy_unats"))
  }

  // ── C4 line-level cleaning ────────────────────────────────────────

  /**
   * The C4 line-level cleaning pass (Raffel et al. 2020): keep only
   * lines that end in terminal punctuation, have at least `minWords`
   * words, and are free of the boilerplate markers ("javascript",
   * '{', "lorem ipsum" — the published rules); a document survives
   * when at least `minKeptLines` lines remain. Returns the cleaned
   * text plus line counts and the keep flag, so a pipeline can gate
   * or just annotate.
   *
   * One narrow projection — line split, filter, re-join are all
   * per-document array expressions; zero shuffles. Every predicate
   * is in the cross-engine-safe subset (suffix char test, word
   * count, substring containment), so the oracle replays the cleaned
   * TEXT byte-for-byte, not just the counts.
   */
  def c4LineFilter(
      df: DataFrame, idCol: String, textCol: String,
      minWords: Int = 5, minKeptLines: Int = 3): DataFrame = {
    val lines = split(col(textCol), "\n")
    def keepLine(l: Column): Column =
      substring(rtrim(l), -1, 1).isin(".", "!", "?", "\"") &&
        size(split(trim(l), "\\s+")) >= minWords &&
        !contains(lower(l), lit("javascript")) &&
        !contains(l, lit("{")) &&
        !contains(lower(l), lit("lorem ipsum"))
    val kept = filter(lines, keepLine(_))
    graft.util.Tables.spread(df)
      .select(col(idCol).as("id"),
        array_join(kept, "\n").as("cleaned"),
        size(lines).cast("long").as("n_lines"),
        size(kept).cast("long").as("n_kept"))
      .withColumn("c4_keep",
        (col("n_kept") >= minKeptLines.toLong).cast("long"))
  }

  // ── Fused single-pass quality annotator ───────────────────────────

  /** Longest run of equal adjacent elements, as a linear array fold —
    * over a sorted array this is the max element frequency; over the
    * original order, the longest same-element run. The `run > 0`
    * guard (instead of a sentinel `prev`) keeps empty-string elements
    * correct. */
  private def maxAdjRun(arr: Column): Column =
    aggregate(arr,
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (st, x) => {
        val cont = st.getField("run") > 0L && st.getField("prev") === x
        val run = when(cont, st.getField("run") + 1L).otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(st.getField("best"), run).as("best"))
      },
      st => st.getField("best"))

  /**
   * Fused single-pass quality annotator: every per-document gate
   * signal the individual queries compute — the Gopher rule battery
   * ([[gopherRules]]), repetition signals ([[repetitionSignals]]),
   * character-distribution entropy ([[charEntropy]]), encoding damage
   * ([[encodingSignals]]), C4 line cleaning ([[c4LineFilter]]), and
   * optionally URL signals ([[urlSignals]]) — in ONE corpus scan,
   * plus the composite `quality_keep` decision.
   *
   * The real 100 TB pipeline cannot afford one scan per signal; this
   * is the production shape. Beyond fusing the narrow batteries, the
   * two signals the standalone operators compute with a shuffle
   * (repetition via explode+window, entropy via explode+groupBy) are
   * re-expressed as per-row array folds over `array_sort`ed token /
   * character arrays — max element frequency = longest equal-adjacent
   * run in the sorted array — so the WHOLE annotator is a narrow
   * projection: one parquet scan, ZERO shuffles, linear to 100 TB.
   * Every fraction is rounded (and every entropy term fixed to
   * integer micro-nats) exactly as in the standalone operators, so
   * the fused output equals their join column-for-column.
   *
   * `encTextCol` lets the caller point the encoding battery at a
   * different (e.g. damage-injected) column; `urlCol = null` skips
   * the URL signals (columns omitted and `quality_keep` ignores
   * them).
   */
  def annotateQuality(
      df: DataFrame, idCol: String, textCol: String,
      encTextCol: String = null, urlCol: String = null,
      blockedDomains: Seq[String] = Nil,
      gopherMinWords: Long = 50L, gopherMaxWords: Long = 100000L,
      c4MinWords: Int = 5, c4MinKeptLines: Int = 3): DataFrame = {
    val t = col(textCol)

    // ── Gopher battery (identical expressions to gopherRules) ──
    val toks = normTokens(t)
    val nWords = wsTokenCount(t).cast("long")
    val sumLen = aggregate(toks, lit(0L), (a, x) => a + length(x))
    val meanLen = round(sumLen.cast("double") /
      greatest(nWords, lit(1L)), 6)
    val symRatio = round(
      (regexp_count(t, lit("#")) + regexp_count(t, lit("\\.\\.\\.")))
        .cast("double") / greatest(nWords, lit(1L)), 6)
    val lines = split(t, "\n")
    val nLines = size(lines).cast("long")
    val bulletFrac = round(
      size(filter(lines, l =>
        substring(ltrim(l), 1, 1).isin("-", "*", "•")))
        .cast("double") / nLines, 6)
    val ellipsisFrac = round(
      size(filter(lines, l => endswith(rtrim(l), lit("..."))))
        .cast("double") / nLines, 6)
    val alphaFrac = round(
      size(filter(toks, x => x.rlike("[a-z]"))).cast("double") /
        greatest(nWords, lit(1L)), 6)
    val nStopKinds = GopherStops.map(w =>
      when(lower(t).rlike(s"\\b${w}\\b"), 1L).otherwise(0L))
      .reduce(_ + _)
    val gopherPass =
      (col("n_words") >= gopherMinWords &&
        col("n_words") <= gopherMaxWords &&
        col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0 &&
        col("symbol_ratio") <= 0.1 &&
        col("bullet_line_frac") <= 0.9 &&
        col("ellipsis_line_frac") <= 0.3 &&
        col("alpha_word_frac") >= 0.8 &&
        col("n_stop_kinds") >= 2L).cast("long")

    // ── repetition signals as folds (parity with repetitionSignals:
    //    same token array, same counts — max frequency computed as
    //    the longest equal-adjacent run of the SORTED array) ──
    val nToks = size(toks).cast("long")
    val topTokN = maxAdjRun(array_sort(toks))
    val bigrams = transform(sequence(lit(1), size(toks) - 1),
      i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1)))
    val top2gramN = when(size(toks) >= 2, maxAdjRun(array_sort(bigrams)))
      .when(nToks.isNotNull, lit(0L))
      .otherwise(lit(null).cast("long"))
    val maxRun = maxAdjRun(toks)
    val nDistinctToks = size(array_distinct(toks)).cast("long")
    val dupTokFrac = round(lit(1.0) -
      nDistinctToks.cast("double") / nToks, 6)

    // ── char entropy as one fold over the sorted char array (parity
    //    with charEntropy: h_part = n_c · floor(−ln(n_c/N)·1e6) per
    //    distinct char, summed, div N — all exact integers) ──
    val chars = filter(split(t, ""), c => length(c) > 0)
    val entN = size(chars).cast("long")
    def hPart(run: Column): Column =
      run * floor(-log(run.cast("double") / entN) * 1000000L)
        .cast("long")
    val entFold = aggregate(array_sort(chars),
      struct(lit("").as("prev"), lit(0L).as("run"),
        lit(0L).as("acc"), lit(0L).as("nd")),
      (st, c) => {
        val cont = st.getField("run") > 0L && st.getField("prev") === c
        val newRun = when(cont, st.getField("run") + 1L).otherwise(lit(1L))
        val acc = when(cont, st.getField("acc")).otherwise(
          st.getField("acc") + when(st.getField("run") > 0L,
            hPart(st.getField("run"))).otherwise(lit(0L)))
        val nd = when(cont, st.getField("nd"))
          .otherwise(st.getField("nd") + 1L)
        struct(c.as("prev"), newRun.as("run"),
          acc.as("acc"), nd.as("nd"))
      },
      st => struct(
        (st.getField("acc") + when(st.getField("run") > 0L,
          hPart(st.getField("run"))).otherwise(lit(0L))).as("h_sum"),
        st.getField("nd").as("nd")))

    // ── encoding battery (on encTextCol when given) ──
    val et = col(Option(encTextCol).getOrElse(textCol))

    // ── C4 line battery (identical expressions to c4LineFilter) ──
    def keepLine(l: Column): Column =
      substring(rtrim(l), -1, 1).isin(".", "!", "?", "\"") &&
        size(split(trim(l), "\\s+")) >= c4MinWords &&
        !contains(lower(l), lit("javascript")) &&
        !contains(l, lit("{")) &&
        !contains(lower(l), lit("lorem ipsum"))
    val kept = filter(lines, keepLine(_))

    // ── URL battery (identical expressions to urlSignals) ──
    val urlCols: Seq[Column] = Option(urlCol).toSeq.flatMap { uc =>
      val host = parse_url(col(uc), lit("HOST"))
      val path = parse_url(col(uc), lit("PATH"))
      val ipHost = host.rlike("^[0-9.]+$")
      val regDomain = when(ipHost, lit(null).cast("string"))
        .otherwise(concat_ws(".", slice(split(host, "\\."), -2, 2)))
      val blocked = ipHost || regDomain.isin(blockedDomains: _*)
      Seq(host.as("host"), regDomain.as("reg_domain"),
        size(filter(split(path, "/"), s => length(s) > 0))
          .as("path_depth"),
        parse_url(col(uc), lit("QUERY")).isNotNull.cast("long")
          .as("has_query"),
        ipHost.cast("long").as("ip_host"),
        blocked.cast("long").as("blocked"),
        (!blocked).cast("long").as("url_ok"))
    }

    val annotated = graft.util.Tables.spread(df)
      .select(Seq(col(idCol).as("id"),
        // gopher
        nWords.as("n_words"), meanLen.as("mean_word_len"),
        symRatio.as("symbol_ratio"), bulletFrac.as("bullet_line_frac"),
        ellipsisFrac.as("ellipsis_line_frac"),
        alphaFrac.as("alpha_word_frac"), nStopKinds.as("n_stop_kinds"),
        // repetition
        nToks.as("n_tokens"), nDistinctToks.as("n_distinct"),
        topTokN.as("top_tok_n"), top2gramN.as("top_2gram_n"),
        maxRun.as("max_run"), dupTokFrac.as("dup_tok_frac"),
        // entropy (absent row ⇔ no chars, matching charEntropy)
        when(entN > 0L, entN).as("ent_n_chars"),
        when(entN > 0L, entFold.getField("nd")).as("ent_n_distinct"),
        entFold.getField("h_sum").as("_h_sum"),
        // encoding
        length(et).as("enc_n_chars"),
        regexp_count(et, lit("�")).cast("long").as("n_replacement"),
        regexp_count(et, lit("[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]"))
          .cast("long").as("n_control"),
        // c4
        array_join(kept, "\n").as("cleaned"),
        nLines.as("n_lines"), size(kept).cast("long").as("n_kept")) ++
        urlCols: _*)
      .withColumn("entropy_unats",
        when(col("ent_n_chars").isNotNull,
          expr("_h_sum div ent_n_chars")))
      .drop("_h_sum")
      .withColumn("gopher_pass", gopherPass)
      .withColumn("enc_clean",
        (col("n_replacement") === 0L &&
          col("n_control") * 100L <= col("enc_n_chars")).cast("long"))
      .withColumn("c4_keep",
        (col("n_kept") >= c4MinKeptLines.toLong).cast("long"))
    val keepParts = Seq(
      col("gopher_pass") === 1L, col("c4_keep") === 1L,
      col("enc_clean") === 1L, col("dup_tok_frac") <= 0.5,
      col("max_run") <= 20L, col("entropy_unats") >= 1000000L) ++
      (if (urlCol != null) Seq(col("url_ok") === 1L) else Nil)
    // CASE-style null handling: an undefined signal fails the gate
    annotated.withColumn("quality_keep",
      when(keepParts.reduce(_ && _), 1L).otherwise(0L))
  }

  /**
   * HTML→text extraction (the WET-style step upstream of every web
   * curation pipeline): drop script/style blocks and comments, strip
   * tags, decode the six common entities, collapse every horizontal
   * whitespace run to one space. Returns the cleaned text plus
   * tag/entity counts so
   * a pipeline can gate on markup density.
   *
   * One narrow projection, zero shuffles. Every pattern sits in the
   * Java-regex/RE2 common subset — in particular NO backreferences
   * (RE2 lacks them), so script and style blocks use two separate
   * literal patterns instead of `<(script|style)>.*?</\1>`. Entity
   * decode runs AFTER tag-stripping (a decoded `&lt;` must not
   * create a strippable tag) and `&amp;` decodes LAST (else
   * `&amp;lt;` would double-decode) — the oracle replays the chain
   * in the same order, so the cleaned text matches byte-for-byte.
   */
  def stripHtml(
      df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val raw = coalesce(col(textCol), lit(""))
    val noBlocks = regexp_replace(
      regexp_replace(raw, "(?is)<script[^>]*>.*?</script>", " "),
      "(?is)<style[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(
      regexp_replace(noBlocks, "(?s)<!--.*?-->", " "),
      "(?s)<[^>]+>", " ")
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (ent, ch)) =>
        regexp_replace(c, java.util.regex.Pattern.quote(ent), ch) }
    graft.util.Tables.spread(df)
      .select(col(idCol).as("id"),
        trim(regexp_replace(decoded, "[ \\t]+", " ")).as("clean_text"),
        regexp_count(raw, lit("(?s)<[^>]+>")).cast("long").as("n_tags"),
        regexp_count(raw, lit("&(amp|lt|gt|quot|nbsp|#39);")).cast("long")
          .as("n_entities"))
  }

  /**
   * Corpus-wide duplicate-LINE removal (the C4 "discard any repeated
   * line" / Dolma paragraph-dedup rule): every non-blank line keeps
   * only its FIRST occurrence across the whole corpus — first in the
   * total order (doc id, line position) — and later copies are
   * dropped; blank lines pass through (deduping them would collapse
   * every paragraph break in the corpus onto one document).
   *
   * Scale shape: posexplode (narrow) → grouped-MIN of the occurrence
   * key per line value (map-side combine shrinks hot boilerplate
   * lines — millions of copies of a nav-bar line partial-aggregate
   * to one row per map task, where a row_number window would drag
   * them all to one reducer) → join back on the line value (AQE
   * skew-splittable) → one groupBy(id) reassembles the text in line
   * order. Two shuffles on the line value, one on id — all linear.
   *
   * The occurrence key packs (id, line_no) as `id·10^6 + line_no`,
   * so documents are limited to 10^6 lines (fine: docs at 100 TB are
   * split well below that) and ids to ~9·10^12.
   */
  def c4LineDedup(
      df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val lines = graft.util.Tables.spread(df)
      .select(col(idCol).as("id"),
        posexplode(split(coalesce(col(textCol), lit("")), "\n"))
          .as(Seq("ln", "line")))
    val occKey = col("id") * lit(1000000L) + col("ln")
    val firsts = lines
      .filter(length(trim(col("line"))) > 0)
      .groupBy(col("line"))
      .agg(min(occKey).as("first_key"))
    lines.join(firsts, Seq("line"), "left")
      .withColumn("keep",
        length(trim(col("line"))) === 0 || occKey === col("first_key"))
      .groupBy(col("id"))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(when(col("keep"), 0L).otherwise(1L)).as("n_removed"),
        array_join(
          transform(
            array_sort(collect_list(
              when(col("keep"), struct(col("ln"), col("line"))))),
            x => x.getField("line")),
          "\n").as("cleaned"))
  }

  /**
   * The FULL Gopher repetition battery (Rae et al. 2021, Table A1) —
   * the signals [[repetitionSignals]]'s top-2-gram subset leaves out:
   *
   *  - duplicate-LINE fraction and duplicate-line CHARACTER fraction
   *    (non-blank lines only: blank lines are paragraph breaks, and
   *    deduping them would flag every multi-paragraph doc);
   *  - top-{2,3,4}-gram character fraction: occurrences of the most
   *    frequent n-gram × its character length, over the normalized
   *    text length (ties break count desc then gram asc — the
   *    engine-replayable total order);
   *  - duplicate-{5..10}-gram character fraction with EXACT overlap
   *    handling: token positions covered by any n-gram occurring
   *    twice or more are unioned into maximal islands (the
   *    [[dupSpanStats]] gaps-and-islands machinery, per doc and per
   *    n), and the covered characters are measured on the normalized
   *    string — no double counting where duplicated grams overlap.
   *
   * All fractions are truncating-integer ppm over the normalized
   * character length (tokens joined by single spaces), so the rows
   * replay exactly in any engine.
   *
   * Scale shape: ONE token explode and ONE window pass (lead 1..9
   * over (doc, pos) — one WindowExec computes every gram arity),
   * then per n a count-over-(id, gram) window, a per-doc island
   * merge, and a slice-length join back to the token arrays. All
   * partitions are doc-bounded; everything map-side combines.
   */
  def gopherRepetition(
      df: DataFrame, idCol: String, textCol: String,
      dupNs: Seq[Int] = 5 to 10, topNs: Seq[Int] = 2 to 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(dupNs.nonEmpty && topNs.nonEmpty, "need at least one n")
    val maxLead = (dupNs ++ topNs).max - 1
    val docs = graft.util.Tables.spread(df)
      .select(col(idCol).as("id"),
        normTokens(col(textCol)).as("t"),
        split(coalesce(col(textCol), lit("")), "\n").as("lines"))
      .withColumn("total_chars",
        length(array_join(col("t"), " ")).cast("long"))
      .persist()
    try {
      val w = Window.partitionBy("id").orderBy("pos")
      val withLeads = docs
        .select(col("id"), posexplode(col("t")).as(Seq("pos", "tok")))
        .select(col("id") +: col("pos") +: col("tok") +:
          (1 to maxLead).map(k => lead(col("tok"), k).over(w).as(s"l$k")): _*)
        .persist()
      try {
        def gramCol(n: Int): Column =
          concat_ws(" ", col("tok") +: (1 until n).map(k => col(s"l$k")): _*)

        // ONE unioned (id, pos, n, g) occurrence stream for every
        // arity — the per-n frames each cost their own window/groupBy
        // exchanges and the final fold joined ~10 frames; the union
        // pays one count window over (id, n, g), one island pass over
        // (id, n), one slice join, and a conditional-sum pivot back
        // to columns (~2.5× fewer exchanges, same rows bit-for-bit)
        require((dupNs ++ topNs).forall(_ >= 2), "gram arities must be >= 2")
        // each branch explodes ONLY its own arities — the dup branch
        // never pays for top-gram rows and vice versa
        def occ(arities: Seq[Int]): DataFrame =
          withLeads.select(col("id"), col("pos"),
              explode(array(arities.map(n =>
                struct(lit(n).as("n"),
                  when(col(s"l${n - 1}").isNotNull, gramCol(n)).as("g"))): _*))
                .as("s"))
            .select(col("id"), col("pos"),
              col("s").getField("n").as("n"), col("s").getField("g").as("g"))
            .filter(col("g").isNotNull)

        val wIdN = Window.partitionBy(col("id"), col("n")).orderBy(col("pos"))
        val dupPos = occ(dupNs)
          .withColumn("c", count(lit(1))
            .over(Window.partitionBy(col("id"), col("n"), col("g"))))
          .filter(col("c") >= 2)
          .select(col("id"), col("n"), col("pos"))
        val islands = dupPos
          .withColumn("brk",
            when(lag(col("pos"), 1).over(wIdN).isNull ||
              col("pos") - lag(col("pos"), 1).over(wIdN) > col("n") - 1, 1L)
              .otherwise(0L))
          .withColumn("isl", sum(col("brk"))
            .over(wIdN.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy(col("id"), col("n"), col("isl"))
          .agg(min(col("pos")).as("a"), max(col("pos")).as("bm"))
          .withColumn("b", col("bm") + col("n") - 1)
        val dupChars = islands
          .join(docs.select(col("id"), col("t")), Seq("id"))
          .select(col("id"), col("n"),
            length(array_join(
              slice(col("t"), col("a") + 1, col("b") - col("a") + 1),
              " ")).cast("long").as("ch"))
          .groupBy(col("id"))
          .agg(
            sum(when(col("n") === dupNs.head, col("ch")))
              .as(s"dup${dupNs.head}_chars"),
            dupNs.tail.map(n =>
              sum(when(col("n") === n, col("ch"))).as(s"dup${n}_chars")): _*)

        val topChars = occ(topNs)
          .groupBy(col("id"), col("n"), col("g"))
          .agg(count(lit(1)).as("c"))
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("id"), col("n"))
              .orderBy(col("c").desc, col("g"))))
          .filter(col("rn") === 1)
          .withColumn("tc", (col("c") * length(col("g"))).cast("long"))
          .groupBy(col("id"))
          .agg(
            sum(when(col("n") === topNs.head, col("tc")))
              .as(s"top${topNs.head}_chars"),
            topNs.tail.map(n =>
              sum(when(col("n") === n, col("tc"))).as(s"top${n}_chars")): _*)

        // duplicate non-blank lines, by count and by characters
        val lineStats = docs
          .select(col("id"), explode(col("lines")).as("line"))
          .filter(length(trim(col("line"))) > 0)
          .withColumn("c", count(lit(1))
            .over(Window.partitionBy(col("id"), col("line"))))
          .groupBy(col("id"))
          .agg(count(lit(1)).as("n_lines"),
            sum(when(col("c") >= 2, 1L).otherwise(0L)).as("dup_lines"),
            sum(length(col("line")).cast("long")).as("line_chars"),
            sum(when(col("c") >= 2, length(col("line")).cast("long"))
              .otherwise(0L)).as("dup_line_chars"))

        val joined = docs.select(col("id"), col("total_chars"))
          .join(dupChars, Seq("id"), "left")
          .join(topChars, Seq("id"), "left")
          .join(lineStats, Seq("id"), "left")
        joined.select(
          col("id") +: col("total_chars") +:
            (topNs.map(n => expr(
              s"(coalesce(top${n}_chars, 0) * 1000000) div " +
                s"greatest(total_chars, 1)").as(s"top${n}_char_ppm")) ++
             dupNs.map(n => expr(
               s"(coalesce(dup${n}_chars, 0) * 1000000) div " +
                 s"greatest(total_chars, 1)").as(s"dup${n}_char_ppm")) ++
             Seq(
               expr("(coalesce(dup_lines, 0) * 1000000) div " +
                 "greatest(n_lines, 1)").as("dup_line_ppm"),
               expr("(coalesce(dup_line_chars, 0) * 1000000) div " +
                 "greatest(line_chars, 1)").as("dup_line_char_ppm"))): _*)
          .localCheckpoint()
      } finally withLeads.unpersist()
    } finally docs.unpersist()
  }

  // ── Hashed linear quality classifier ──────────────────────────────

  /**
   * Hashed-bag-of-words linear classifier scoring — the
   * fastText-classifier shape every production curation stack runs
   * (CCNet/FineWeb "looks like wiki/edu" gates): token → hash bucket
   * (mod `dim`), bucket → weight, document score = sigmoid of the
   * mean bucket weight. Weights here are derived deterministically
   * from the portable hash (milli-units in [-1000, 1000]) so the
   * whole path — including the KEEP decision — is engine-replayable;
   * a real deployment swaps `weightOf` for a trained weight table
   * joined the same way (the plan shape is identical: the weight
   * table is vocabulary-sized metadata, broadcast).
   *
   * The decision is exact-integer: `clf_keep = (Σ w_milli >= 0)` —
   * the sigmoid never enters it (sigmoid is monotone, so score ≥ 0.5
   * ⟺ margin ≥ 0), and the only floating-point output (`score`) is
   * one libm `exp` on an exact ratio, rounded to 6 (the
   * [[graft.ext.Assemble.unigramSurprisal]] parity contract).
   *
   * Scale shape: explode → narrow bucket/weight projection → ONE
   * groupBy(id) with map-side partial sums. An empty/whitespace doc
   * is NOT special-cased: [[normTokens]] yields a single "" token, so
   * it scores the empty-string bucket's hashed weight (one fixed
   * pseudo-weight per (seed, dim)) — deterministic, and replayed
   * identically by any engine tokenizing the same way. Null text
   * drops the document (explode of a null array).
   */
  def hashedClassifierScore(
      df: DataFrame, idCol: String, textCol: String,
      dim: Int = 4096, seed: String = "clf"): DataFrame = {
    require(dim > 0, "dim must be positive")
    val toks = graft.util.Tables.spread(df)
      .select(col(idCol).as("id"),
        explode(normTokens(col(textCol))).as("tok"))
    val weighted = toks.select(col("id"),
      (pmod(portableHash60(
        concat(lit(seed + ":"),
          pmod(portableHash60(col("tok")), lit(dim.toLong)).cast("string"))),
        lit(2001L)) - 1000L).as("w_milli"))
    weighted.groupBy(col("id")).agg(
        count(lit(1)).as("n_tokens"),
        sum(col("w_milli")).as("w_sum_milli"))
      .select(col("id"), col("n_tokens"), col("w_sum_milli"),
        round(lit(1.0) / (lit(1.0) +
          exp(-col("w_sum_milli").cast("double") /
            (col("n_tokens") * 1000.0))), 6).as("score"),
        (col("w_sum_milli") >= 0L).cast("long").as("clf_keep"))
  }

  /**
   * Per-group statistical outlier detection: flag documents whose
   * integer measure (default `n_chars`) sits more than `nSigma`
   * sample standard deviations from its group's mean — the
   * length-outlier cut a corpus-cleaning pass runs per language
   * before the content-level quality gates.
   *
   * Two passes over one scan: a tiny per-group sufficient-statistics
   * aggregate (n, Σx, Σx²: three BIGINTs per group — map-side
   * partials absorb the row volume, the grouped exchange carries one
   * row per group) broadcast-joined back over the measure projection.
   * At 100 TB the stats frame is bytes per language — always a
   * broadcast; the second pass is a narrow codegen'd projection.
   *
   * The outlier decision is exact-replayable: with σ² the SAMPLE
   * variance, |x−μ| > nσ·σ  ⇔  (n−1)·(n·x−S1)² > nSigma²·n·(n·S2−S1²),
   * evaluated in DOUBLE from the exact integer sums with an identical
   * operation order on any IEEE-754 engine — no engine-ordered FP
   * summation anywhere (the only sums are integer S1/S2). Groups with
   * n = 1 (variance undefined) flag nothing: lhs = 0·0 = rhs.
   */
  def lengthOutliers(
      df: DataFrame, groupCol: String, measureCol: String,
      nSigma: Int = 2): DataFrame = {
    val rows = graft.util.Tables.spread(df)
      .select(col(groupCol).as("grp"), col(measureCol).cast("long").as("x"))
      // a null measure cannot be scored — and keeping it would desync
      // n from the S1/S2 sums it divides
      .filter(col("x").isNotNull)
    val stats = rows.groupBy(col("grp")).agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("s1"),
      sum(col("x") * col("x")).as("s2"))
    val nD = col("n").cast("double")
    val dev = nD * col("x").cast("double") - col("s1").cast("double")
    val lhs = (nD - 1.0) * dev * dev
    val rhs = lit((nSigma * nSigma).toDouble) * nD *
      (nD * col("s2").cast("double") -
        col("s1").cast("double") * col("s1").cast("double"))
    rows.join(broadcast(stats), Seq("grp"))
      .withColumn("is_out", (lhs > rhs).cast("long"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("is_out")).as("n_outliers"),
        sum(when(col("is_out") === 1L, col("x")).otherwise(lit(0L)))
          .as("outlier_sum"))
  }

  /** Full per-document analysis projection. */
  def analyze(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    graft.util.Tables.spread(df).select(
      col("doc_id"),
      length(t).as("n_chars"),
      wsTokenCount(t).as("n_tokens_ws"),
      bpeTokenCount(t).as("n_tokens_bpe"),
      punctRatio(t).as("punct_ratio"),
      stopwordRatio(t).as("stopword_ratio"),
      qualityScore(t).as("quality"),
      langId(t).as("lang_guess"),
      fingerprint(t).as("fingerprint"))
  }
}
