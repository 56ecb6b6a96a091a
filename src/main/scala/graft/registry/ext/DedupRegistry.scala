package graft.registry.ext

import graft.core.{Diff, DiffOptions, Records}
import graft.ext.{Assemble, AudioHash, Curation, Dedup, DedupIndex, ImageHash, Multimodal, Similarity, TextAnalysis, VideoHash}
import graft.mapper.Mapper
import graft.pipeline.{ImportService, Preset}
import graft.sources.InlineSource
import graft.targets.{FileTarget, JdbcTarget}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.registry.Shared._

/** Exact/near-duplicate detection and
  removal: hash dedup, MinHash/SimHash/n-gram-Jaccard candidates,
  connected-component clustering, chunk/CDC/winnowing/span/line
  dedup, contamination + source overlap.
  *
  * One ExtRegistry domain file (split from the
  * monolith, r15 verdict task 7) — entries moved
  * verbatim; [[graft.registry.ExtRegistry]]
  * aggregates the domain maps. */
private[graft] object DedupRegistry {
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

    // corpus-wide duplicate-line removal (C4 repeated-line rule /
    // Dolma paragraph dedup): each non-blank line keeps only its
    // first (doc_id, position) occurrence across the corpus
    "q_line_dedup" -> ((s, dir) => {
      TextAnalysis.c4LineDedup(
        s.read.parquet(t(dir, "documents")), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
    }),

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

    // ── dedup-at-ingest from the PERSISTED minhash index
    // ([[DedupIndex]]): build over a perturbed initial corpus
    // (evens; %6=0 docs carry STALE text, the %10=6 slice will be
    // removed), ChangeSet-refresh to the final corpus (delta-only
    // re-shingle), then probe the ODD-doc ingest batch against the
    // stored bands+shingles. Answer must be bit-identical to
    // minhashPairsAgainst(batch, final corpus) — the oracle replays
    // the full LSH machinery (sigs + band conds + exact Jaccard)
    // over batch × final corpus, the q_minhash_incremental
    // convention. ──
    "q_dedup_index" -> ((s, dir) => {
      val d = s.read.parquet(t(dir, "documents"))
        .select(col("doc_id"), col("text"))
      val root = tempStateDir() + "/dedupidx"
      val initial = d.filter(col("doc_id") % 2 === 0)
        .select(col("doc_id").cast("string").as("id"),
          when(col("doc_id") % 6 === 0,
            concat(lit("stale "), col("text")))
            .otherwise(col("text")).as("text"),
          lit(1L).as("version"))
      DedupIndex.build(s, initial, root, k = 32, bands = 8, n = 3,
        idCol = "id", textCol = "text",
        baseHash = TextAnalysis.portableHash60)
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
      DedupIndex.refresh(s, root, changed, dropped,
        idCol = "id", textCol = "text",
        baseHash = TextAnalysis.portableHash60)
      val batch = d.filter(col("doc_id") % 2 === 1)
        .select(col("doc_id").cast("string").as("id"), col("text"))
      DedupIndex.probe(s, root, batch, threshold = 0.5,
        idCol = "id", textCol = "text",
        baseHash = TextAnalysis.portableHash60)
        .select(col("id_l").cast("long").as("id_l"),
          col("id_r").cast("long").as("id_r"), col("jaccard"))
    }),

    // ── SERVING latency of the persisted dedup index, separated
    // from its construction (the q_ann_probe convention): this row
    // probes an ALREADY-COMMITTED index over the same final corpus
    // (built once per dir via a harness memo), so the bench's
    // min-of-3 reports pure dedup-at-ingest cost — batch shingle/sign
    // + the two index-table joins. Same oracle as q_dedup_index. ──
    "q_dedup_probe" -> ((s, dir) => {
      val root = dedupProbeIndex(s, dir)
      val batch = s.read.parquet(t(dir, "documents"))
        .filter(col("doc_id") % 2 === 1)
        .select(col("doc_id").cast("string").as("id"), col("text"))
      DedupIndex.probe(s, root, batch, threshold = 0.5,
        idCol = "id", textCol = "text",
        baseHash = TextAnalysis.portableHash60)
        .select(col("id_l").cast("long").as("id_l"),
          col("id_r").cast("long").as("id_r"), col("jaccard"))
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
  )

  /** DuckDB oracles for this file's queries. */
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

    // probe-from-persisted-index replay: batch = odd docs, corpus =
    // the FINAL post-refresh state (= evens minus the %10=6 slice at
    // true text — the q_rag_incremental oracle trick); the same sigs
    // CTE serves both sides, band conds + exact Jaccard verify
    "q_dedup_index" -> duckDedupIndexProbe,

    // identical replay: the probe-only row serves the same final
    // corpus from the memoized persisted index
    "q_dedup_probe" -> duckDedupIndexProbe,
  ) ++ oraclesTail

  /** Batch (odds) x final corpus (evens minus %10=6) LSH replay —
    * shared by the lifecycle row and the probe-only serving row. */
  private lazy val duckDedupIndexProbe: String =
      s"""WITH $minhashSigCtes,
         |cands AS (SELECT a.doc_id AS id_l, b.doc_id AS id_r
         |  FROM sigs a JOIN sigs b
         |    ON a.doc_id % 2 = 1 AND b.doc_id % 2 = 0
         |       AND b.doc_id % 10 <> 6
         |  WHERE $minhashBandConds)
         |SELECT c.id_l, c.id_r,
         |  round(CAST(len(list_intersect(da.sh, db.sh)) AS DOUBLE)
         |    / greatest(len(list_distinct(list_concat(da.sh, db.sh))), 1), 6)
         |    AS jaccard
         |FROM cands c
         |JOIN docs da ON c.id_l = da.doc_id
         |JOIN docs db ON c.id_r = db.doc_id
         |WHERE CAST(len(list_intersect(da.sh, db.sh)) AS DOUBLE)
         |  / greatest(len(list_distinct(list_concat(da.sh, db.sh))), 1) >= 0.5""".stripMargin

  private lazy val oraclesTail: Map[String, String] = Map(
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
  )
}
