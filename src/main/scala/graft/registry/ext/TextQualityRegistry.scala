package graft.registry.ext

import graft.core.{Diff, DiffOptions, Records}
import graft.ext.{Assemble, AudioHash, Curation, Dedup, ImageHash, Multimodal, Similarity, TextAnalysis, TrainedQuality, VideoHash}
import graft.mapper.Mapper
import graft.pipeline.{ImportService, Preset}
import graft.sources.InlineSource
import graft.targets.{FileTarget, JdbcTarget}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.registry.Shared._

/** Text quality + normalization:
  Gopher/C4 rules, repetition and fused annotators, PII scrub, HTML
  strip, URL filter, NFC, encoding guards, entropy, chunking,
  exports.
  *
  * One ExtRegistry domain file (split from the
  * monolith, r15 verdict task 7) — entries moved
  * verbatim; [[graft.registry.ExtRegistry]]
  * aggregates the domain maps. */
private[graft] object TextQualityRegistry {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

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

    // Gopher-style repetition quality signals: top token / top 2-gram
    // frequency, longest same-token run, duplicate-token fraction
    "q_quality_repetition" -> ((s, dir) =>
      TextAnalysis.repetitionSignals(
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

    // TRAINED model-based quality gate ([[TrainedQuality.nbQuality]]):
    // multinomial Naive Bayes over hashed bag-of-words buckets,
    // FITTED to teacher labels (stopword-ratio ≥ 6%) on the
    // doc_id%10<8 slice, scoring every doc — the discriminative
    // classifier step of the GPT-3/CCNet/FineWeb recipes, vs the
    // pseudo-weight (untrained) shape above. Micro-nat integer
    // weights (the unigram-ppl ln-truncation convention) make the
    // fitted model and every margin bit-replayable: the oracle
    // re-runs the whole fit. Held-out agreement with the teacher is
    // 0.84 vs a 0.53 base rate — the model genuinely learns.
    "q_quality_trained" -> ((s, dir) =>
      TrainedQuality.nbQuality(
        s.read.parquet(t(dir, "documents")), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")),

    // ── INCREMENTAL maintenance of the fitted model
    // ([[TrainedQuality.buildModel]]/[[refreshModel]]/
    // [[scoreFromStore]]): the model is integer count tables, and
    // counts are mergeable — a ChangeSet refresh ADDS the delta's
    // counts and RETRACTS removed/updated docs' exact contributions
    // from the stored per-doc feature table (old text never
    // re-reads), committing bit-equal to a from-scratch fit on the
    // final corpus. Same lifecycle fixture as q_dedup_index: build
    // over a perturbed initial corpus (evens; %6=0 docs carry STALE
    // text, the %10=6 slice will be removed), ChangeSet-refresh to
    // the final corpus, then gate the ODD-doc ingest batch from the
    // store. Oracle: fit NB directly on the final corpus and score
    // the batch — the refresh path must agree bit for bit. ──
    "q_quality_trained_incremental" -> ((s, dir) => {
      val d = s.read.parquet(t(dir, "documents"))
        .select(col("doc_id"), col("text"))
      val root = tempStateDir() + "/qmodel"
      val initial = d.filter(col("doc_id") % 2 === 0)
        .select(col("doc_id").cast("string").as("id"),
          when(col("doc_id") % 6 === 0,
            concat(lit("stale "), col("text")))
            .otherwise(col("text")).as("text"),
          lit(1L).as("version"))
      TrainedQuality.buildModel(s, initial, root,
        idCol = "id", textCol = "text")
      val source = d
        .filter(col("doc_id") % 2 === 0 && col("doc_id") % 10 =!= 6)
        .select(col("doc_id").cast("string").as("id"),
          when(col("doc_id") % 6 === 0, lit(2L)).otherwise(lit(1L))
            .as("version"),
          col("text"))
      val cs = Diff.computeDataChanges(
        Records.keyRecords(source, "id", Some("version")),
        initial.select(col("id"), col("version")))
      val changed = cs.added.select(col("id"), col("text"))
        .unionByName(cs.updated.select(col("id"), col("text")))
      val dropped = cs.removedIds.unionByName(cs.updated.select(col("id")))
      TrainedQuality.refreshModel(s, root, changed, dropped,
        idCol = "id", textCol = "text")
      val batch = d.filter(col("doc_id") % 2 === 1)
      TrainedQuality.scoreFromStore(s, root, batch)
        .select(col("id").as("doc_id"), col("margin"), col("clf_keep"))
    }),

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

    // overlapping fixed-token chunking with materialized chunk text
    // (the RAG/embedding splitter) — pure narrow explode, no shuffle
    "q_chunk_text" -> ((s, dir) =>
      TextAnalysis.chunkText(
        s.read.parquet(t(dir, "documents")), "doc_id", "text",
        chunkTokens = 8, overlap = 4)
        .withColumnRenamed("id", "doc_id")),
  )

  /** DuckDB oracles for this file's queries. */
  val oracles: Map[String, String] = Map(

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

    // full NB fit replay: same tokenization/hash as the engine, then
    // per-bucket class token counts over the train slice, micro-nat
    // LLR weights with add-one smoothing on a range(dim) spine
    // (held-out docs can hit train-unseen buckets), the doc-count
    // prior, and exact integer margins. The two-ln shape with double
    // divisions of exact integers is the cross-engine contract
    // (graft.ext.TrainedQuality.train mirrors it term for term).
    "q_quality_trained" -> {
      val dim = 64
      val stopPct = 6
      val stop = graft.ext.TrainedQuality.Stopwords
        .map(s => s"'$s'").mkString(", ")
      val bucket = s"${duckHash60("tok")} % $dim"
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(regexp_split_to_array(
         |    regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '))
         |    AS tok
         |  FROM documents WHERE text IS NOT NULL),
         |feat AS (
         |  SELECT doc_id, CAST($bucket AS BIGINT) AS bucket,
         |         CAST(count(*) AS BIGINT) AS cnt
         |  FROM toks GROUP BY 1, 2),
         |lab AS (
         |  SELECT doc_id,
         |    CAST(CASE WHEN 100 * count(*) FILTER (tok IN ($stop))
         |         >= $stopPct * count(*) THEN 1 ELSE -1 END AS BIGINT)
         |      AS y
         |  FROM toks GROUP BY doc_id),
         |tr AS (
         |  SELECT feat.doc_id, bucket, cnt, y
         |  FROM feat JOIN lab USING (doc_id) WHERE feat.doc_id % 10 < 8),
         |bc AS (
         |  SELECT bucket,
         |         sum(CASE WHEN y = 1 THEN cnt ELSE 0 END) AS cp,
         |         sum(CASE WHEN y = -1 THEN cnt ELSE 0 END) AS cn
         |  FROM tr GROUP BY bucket),
         |tot AS (SELECT sum(cp) AS tp, sum(cn) AS tn FROM bc),
         |dc AS (
         |  SELECT count(DISTINCT CASE WHEN y = 1 THEN doc_id END) AS np,
         |         count(DISTINCT CASE WHEN y = -1 THEN doc_id END) AS nn
         |  FROM tr),
         |w AS (
         |  SELECT r.range AS bucket,
         |    CAST(FLOOR(1000000 * (
         |      ln(CAST(coalesce(cp, 0) + 1 AS DOUBLE)
         |        / CAST(tp + $dim AS DOUBLE)) -
         |      ln(CAST(coalesce(cn, 0) + 1 AS DOUBLE)
         |        / CAST(tn + $dim AS DOUBLE)))) AS BIGINT) AS w
         |  FROM range(0, $dim) r LEFT JOIN bc ON bc.bucket = r.range
         |  CROSS JOIN tot),
         |pri AS (
         |  SELECT CAST(FLOOR(1000000 * ln(CAST(np + 1 AS DOUBLE)
         |    / CAST(nn + 1 AS DOUBLE))) AS BIGINT) AS prior FROM dc)
         |SELECT feat.doc_id, lab.y,
         |  CAST(sum(cnt * w.w) + any_value(prior) AS BIGINT) AS margin,
         |  CAST(CASE WHEN sum(cnt * w.w) + any_value(prior) > 0
         |       THEN 1 ELSE 0 END AS BIGINT) AS clf_keep
         |FROM feat JOIN w USING (bucket) JOIN lab USING (doc_id)
         |CROSS JOIN pri
         |GROUP BY feat.doc_id, lab.y""".stripMargin
    },

    // incremental-model replay: the oracle fits NB DIRECTLY on the
    // final corpus (evens minus the removed %10=6 slice, true text —
    // what the build+refresh lifecycle must converge to) and scores
    // the odd-doc ingest batch; any failure to exactly retract the
    // stale initial text's counts breaks the hash
    "q_quality_trained_incremental" -> {
      val dim = 64
      val stopPct = 6
      val stop = graft.ext.TrainedQuality.Stopwords
        .map(s => s"'$s'").mkString(", ")
      val bucket = s"${duckHash60("tok")} % $dim"
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents
         |  WHERE doc_id % 2 = 0 AND doc_id % 10 != 6
         |    AND text IS NOT NULL),
         |batch AS (
         |  SELECT doc_id, text FROM documents
         |  WHERE doc_id % 2 = 1 AND text IS NOT NULL),
         |ctoks AS (
         |  SELECT doc_id, unnest(regexp_split_to_array(
         |    regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '))
         |    AS tok
         |  FROM corpus),
         |btoks AS (
         |  SELECT doc_id, unnest(regexp_split_to_array(
         |    regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '))
         |    AS tok
         |  FROM batch),
         |lab AS (
         |  SELECT doc_id,
         |    CAST(CASE WHEN 100 * count(*) FILTER (tok IN ($stop))
         |         >= $stopPct * count(*) THEN 1 ELSE -1 END AS BIGINT)
         |      AS y
         |  FROM ctoks GROUP BY doc_id),
         |tr AS (
         |  SELECT ctoks.doc_id, CAST($bucket AS BIGINT) AS bucket,
         |         CAST(count(*) AS BIGINT) AS cnt, any_value(y) AS y
         |  FROM ctoks JOIN lab USING (doc_id) GROUP BY 1, 2),
         |bc AS (
         |  SELECT bucket,
         |         sum(CASE WHEN y = 1 THEN cnt ELSE 0 END) AS cp,
         |         sum(CASE WHEN y = -1 THEN cnt ELSE 0 END) AS cn
         |  FROM tr GROUP BY bucket),
         |tot AS (SELECT sum(cp) AS tp, sum(cn) AS tn FROM bc),
         |dc AS (
         |  SELECT count(CASE WHEN y = 1 THEN 1 END) AS np,
         |         count(CASE WHEN y = -1 THEN 1 END) AS nn
         |  FROM lab),
         |w AS (
         |  SELECT r.range AS bucket,
         |    CAST(FLOOR(1000000 * (
         |      ln(CAST(coalesce(cp, 0) + 1 AS DOUBLE)
         |        / CAST(tp + $dim AS DOUBLE)) -
         |      ln(CAST(coalesce(cn, 0) + 1 AS DOUBLE)
         |        / CAST(tn + $dim AS DOUBLE)))) AS BIGINT) AS w
         |  FROM range(0, $dim) r LEFT JOIN bc ON bc.bucket = r.range
         |  CROSS JOIN tot),
         |pri AS (
         |  SELECT CAST(FLOOR(1000000 * ln(CAST(np + 1 AS DOUBLE)
         |    / CAST(nn + 1 AS DOUBLE))) AS BIGINT) AS prior FROM dc),
         |bfeat AS (
         |  SELECT doc_id, CAST($bucket AS BIGINT) AS bucket,
         |         CAST(count(*) AS BIGINT) AS cnt
         |  FROM btoks GROUP BY 1, 2)
         |SELECT bfeat.doc_id,
         |  CAST(sum(cnt * w.w) + any_value(prior) AS BIGINT) AS margin,
         |  CAST(CASE WHEN sum(cnt * w.w) + any_value(prior) > 0
         |       THEN 1 ELSE 0 END AS BIGINT) AS clf_keep
         |FROM bfeat JOIN w USING (bucket) CROSS JOIN pri
         |GROUP BY bfeat.doc_id""".stripMargin
    },

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
  )
}
