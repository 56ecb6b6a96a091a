#!/usr/bin/env python3
"""One-shot mechanical split of ExtRegistry.scala (4.6k LoC) into
per-domain registry files under registry/ext/ (r15 verdict task 7).
Zero behavior change: query/oracle bodies move verbatim with their
comments; ExtRegistry becomes the aggregation (`++` over the domain
maps) the SparkEntry contract reads. Kept for provenance of the move;
idempotence is NOT needed."""
import re
import sys
import pathlib

ROOT = pathlib.Path(__file__).resolve().parent.parent
SRC = ROOT / "src/main/scala/graft/registry/ExtRegistry.scala"
OUTDIR = ROOT / "src/main/scala/graft/registry/ext"

lines = SRC.read_text().split("\n")

ENTRY = re.compile(r'^    "([a-z0-9_]+)" ->')


def find(pred, start=0):
    for i in range(start, len(lines)):
        if pred(lines[i]):
            return i
    raise SystemExit(f"marker not found after {start}")


i_obj = find(lambda l: l.startswith("private[graft] object ExtRegistry"))
i_queries = find(lambda l: l.startswith("  val queries:"))
i_oracles_doc = find(lambda l: l.startswith("  /** DuckDB oracles"))
i_oracles = find(lambda l: l.startswith("  val oracles:"))
i_lazy_doc = find(lambda l: l.startswith("  /** Oracles whose SQL"))
i_lazy = find(lambda l: l.startswith("  def lazyOracles"))

header = lines[: i_obj - 1]  # package + imports + blank (doc excluded)
helpers = lines[i_obj + 1 : i_queries]
queries_body = lines[i_queries + 1 : i_oracles_doc - 1]
oracles_body = lines[i_oracles + 1 : i_lazy_doc - 1]
lazy_block = lines[i_lazy_doc : len(lines) - 2]  # up to final "}"

# strip the closing "  )" (+ trailing blanks) off each map body
def strip_close(body):
    while body and body[-1].strip() == "":
        body.pop()
    assert body[-1].strip() == ")", body[-3:]
    body.pop()
    while body and body[-1].strip() == "":
        body.pop()
    return body


queries_body = strip_close(queries_body)
oracles_body = strip_close(oracles_body)


def chunk(body):
    """Split a map body into per-entry chunks, each carrying the
    comment/blank lines that precede it."""
    starts = [i for i, l in enumerate(body) if ENTRY.match(l)]
    assert starts, "no entries"
    # attach preceding comments: chunk k runs from the line after
    # chunk k-1's last code line... simpler: walk back from each
    # start over blank/comment lines
    heads = []
    for s in starts:
        h = s
        while h > 0 and (body[h - 1].strip() == "" or
                         body[h - 1].lstrip().startswith("//")):
            h -= 1
        heads.append(h)
    out = {}
    for k, s in enumerate(starts):
        end = heads[k + 1] if k + 1 < len(starts) else len(body)
        name = ENTRY.match(body[s]).group(1)
        c = body[heads[k]:end]
        while c and c[0].strip() == "":
            c.pop(0)
        while c and c[-1].strip() == "":
            c.pop()
        if not c[-1].rstrip().endswith(","):
            c[-1] = c[-1] + ","
        assert name not in out, f"dup {name}"
        out[name] = c
    return out


qchunks = chunk(queries_body)
ochunks = chunk(oracles_body)

DOMAINS = {
    "DedupRegistry": """Exact/near-duplicate detection and
  removal: hash dedup, MinHash/SimHash/n-gram-Jaccard candidates,
  connected-component clustering, chunk/CDC/winnowing/span/line
  dedup, contamination + source overlap.""",
    "SimilarityRegistry": """Embedding-space operators: cosine/ANN
  (IVF, PQ, LSH, persisted index, filtered probes), semantic dedup +
  clusters, MMR re-rank, leakage audit, RAG index + refresh,
  quantize/meanpool/cluster-balanced selection.""",
    "MultimodalRegistry": """Binary media tier: PPM/PNG/JPEG/Y4M/WAV
  codec walks, tolerant corrupt channels, perceptual image/video/
  audio fingerprints with clusters + incremental ingest, clip-in-
  corpus search (per-query and persisted), streaming media dedup.""",
    "TextQualityRegistry": """Text quality + normalization:
  Gopher/C4 rules, repetition and fused annotators, PII scrub, HTML
  strip, URL filter, NFC, encoding guards, entropy, chunking,
  exports.""",
    "AssembleRegistry": """LM-assembly tier: n-gram/Kneser-Ney/
  backoff perplexity ladder, BPE + unigram tokenizers, vocab/OOV,
  TF-IDF/BM25/PMI/inverted index, packing, FIM, DSIR/curriculum/
  mixing, tokenizer fertility.""",
    "SamplingRegistry": """Sampling + profiling + graph: stratified/
  exact-k/weighted sampling, splits, shuffle shards, z-score
  outliers, exact and sketched profiling, PageRank.""",
}

ASSIGN = {}
def assign(domain, names):
    for n in names.split():
        ASSIGN[n] = domain

assign("DedupRegistry", """
  q_dedup_exact q_chunk_dedup q_cdc_chunks q_line_dedup
  q_dedup_clusters q_dedup_shuffle q_dedup_best q_dup_chunks
  q_winnow_dup q_dup_chunks_cdc q_span_dedup q_span_scrub
  q_minhash_dedup q_minhash_incremental q_simhash_pairs
  q_ngram_jaccard q_contamination q_contamination_bloom
  q_source_overlap q_media_dedup q_lsh_skew""")
assign("SimilarityRegistry", """
  q_embed_balanced q_embed_quantize q_embed_meanpool q_embed_cosine
  q_embed_dedup q_embed_clusters q_semdedup q_ann_lsh q_ann_filtered
  q_ann_ivf_trained q_ann_pq q_ann_persisted q_ann_probe q_ann_ivf
  q_semantic_leakage q_mmr_rerank q_rag_index q_rag_incremental""")
assign("MultimodalRegistry", """
  q_multimodal_meta q_multimodal_decode q_multimodal_frames
  q_multimodal_resize q_multimodal_ppm q_multimodal_png
  q_multimodal_jpeg q_multimodal_jpeg420 q_multimodal_wav
  q_multimodal_y4m q_multimodal_corrupt q_wav_corrupt q_jpeg_corrupt
  q_y4m_corrupt q_image_dhash q_image_dhash_clusters
  q_image_dhash_incremental q_image_dhash_reencode
  q_image_dhash_reencode_clusters q_video_dhash
  q_video_dhash_clusters q_video_dhash_incremental q_video_clip_match
  q_video_clip_incremental q_audio_fp q_audio_fp_clusters
  q_audio_fp_incremental q_audio_clip_match q_audio_clip_incremental
  q_stream_media_dedup""")
assign("TextQualityRegistry", """
  q_text_analysis q_pii_scrub q_html_strip q_quality_repetition
  q_gopher_rules q_gopher_repetition q_quality_classifier
  q_quality_fused q_encoding q_url_filter q_nfc_normalize
  q_char_entropy q_c4_lines q_corpus_clean q_text_rolling
  q_chunk_text q_export_jsonl""")
assign("AssembleRegistry", """
  q_unigram_ppl q_bigram_ppl q_trigram_ppl q_backoff_ppl q_kn_ppl
  q_kn3_ppl q_unigram_encode q_unigram_encode_trained q_ppl_buckets
  q_ppl_buckets_approx q_bpe_pairs q_bpe_apply q_bpe_encode
  q_bpe_pack q_vocab q_oov_rate q_pmi q_tfidf q_bm25
  q_inverted_index q_tok_fertility q_seq_pack q_fim_transform
  q_curriculum q_mix_domains q_mix_temperature q_dsir_select
  q_curation_funnel""")
assign("SamplingRegistry", """
  q_sample_stratified q_sample_exact_k q_sample_weighted q_split
  q_shuffle_shards q_zscore_outliers q_profile q_profile_approx
  q_pagerank""")

missing = set(qchunks) - set(ASSIGN)
extra = set(ASSIGN) - set(qchunks)
assert not missing, f"unassigned queries: {sorted(missing)}"
assert not extra, f"assigned but absent: {sorted(extra)}"
o_missing = set(ochunks) - set(ASSIGN)
assert not o_missing, f"unassigned oracles: {sorted(o_missing)}"

# package-adjust the shared-import line for the ext subpackage
def ext_header():
    out = []
    for l in header:
        if l == "package graft.registry":
            out.append("package graft.registry.ext")
        elif l == "import Shared._":
            out.append("import graft.registry.Shared._")
        else:
            out.append(l)
    return out


OUTDIR.mkdir(parents=True, exist_ok=True)
order = list(DOMAINS)
for dom in order:
    qs = [n for n in qchunks if ASSIGN[n] == dom]
    os_ = [n for n in ochunks if ASSIGN[n] == dom]
    body = []
    body += ext_header()
    body.append(f"/** {DOMAINS[dom]}")
    body.append("  *")
    body.append("  * One ExtRegistry domain file (split from the")
    body.append("  * monolith, r15 verdict task 7) — entries moved")
    body.append("  * verbatim; [[graft.registry.ExtRegistry]]")
    body.append("  * aggregates the domain maps. */")
    body.append(f"private[graft] object {dom} {{")
    if dom == "AssembleRegistry":
        body += helpers
    body.append("  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(")
    for n in qs:
        body.append("")
        body += qchunks[n]
    body.append("  )")
    body.append("")
    body.append("  /** DuckDB oracles for this file's queries. */")
    body.append("  val oracles: Map[String, String] = Map(")
    for n in os_:
        body.append("")
        body += ochunks[n]
    body.append("  )")
    body.append("}")
    (OUTDIR / f"{dom}.scala").write_text("\n".join(body) + "\n")
    print(f"{dom}: {len(qs)} queries, {len(os_)} oracles, "
          f"{len(body)} lines")

# rewrite ExtRegistry as the aggregator
agg = []
agg.append("package graft.registry")
agg.append("")
agg.append("import org.apache.spark.sql.{DataFrame, SparkSession}")
agg.append("")
agg.append("/** LLM-training-data pipeline operators (BASELINE.json")
agg.append("  * north star) — the aggregation over the per-domain")
agg.append("  * registry files under `registry/ext/` (split r16; the")
agg.append("  * entries themselves moved verbatim). Key sets are")
agg.append("  * asserted disjoint so a split mistake cannot silently")
agg.append("  * shadow a query. */")
agg.append("private[graft] object ExtRegistry {")
agg.append("")
agg.append("  private def parts: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] = Seq(")
for dom in order:
    sep = "," if dom != order[-1] else ""
    agg.append(f"    (ext.{dom}.queries, ext.{dom}.oracles){sep}")
agg.append("  )")
agg.append("")
agg.append("  val queries: Map[String, (SparkSession, String) => DataFrame] = {")
agg.append("    val qs = parts.map(_._1)")
agg.append("    val merged = qs.reduce(_ ++ _)")
agg.append("    require(merged.size == qs.map(_.size).sum,")
agg.append("      \"duplicate query keys across registry/ext files\")")
agg.append("    merged")
agg.append("  }")
agg.append("")
agg.append("  val oracles: Map[String, String] = {")
agg.append("    val os = parts.map(_._2)")
agg.append("    val merged = os.reduce(_ ++ _)")
agg.append("    require(merged.size == os.map(_.size).sum,")
agg.append("      \"duplicate oracle keys across registry/ext files\")")
agg.append("    merged")
agg.append("  }")
agg.append("")
agg += lazy_block
agg.append("}")
SRC.write_text("\n".join(agg) + "\n")
print(f"ExtRegistry.scala -> aggregator ({len(agg)} lines)")
