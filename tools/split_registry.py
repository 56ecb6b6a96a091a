#!/usr/bin/env python3
"""One-shot mechanical split of SparkEntry.scala into per-tier registry
files (VERDICT r8 task 8). Zero behavior change: query/oracle bodies are
moved verbatim; only `private` modifiers on shared helpers and the map
headers change. Run from the repo root; idempotence is NOT needed (the
script is kept for provenance of the move)."""
import re, sys

SRC = "src/main/scala/graft/SparkEntry.scala"
lines = open(SRC).read().split("\n")

def find(pred, start=0):
    for i in range(start, len(lines)):
        if pred(lines[i]):
            return i
    raise SystemExit(f"marker not found after {start}")

i_flagship = find(lambda l: l.startswith("  /** Flagship query on sf=0.001"))
i_parity_doc = find(lambda l: l.startswith("  /** SURVEY §2.1 reference-parity"))
i_parity_def = find(lambda l: l.startswith("  def parityQueries"))
i_analytics_doc = find(lambda l: l.startswith("  /** Analytics surface"))
i_analytics_def = find(lambda l: l.startswith("  def analyticsQueries"))
i_empty_doc = find(lambda l: l.startswith("  /** Shared empty-result schema"))
i_ext_doc = find(lambda l: l.startswith("  /** LLM-training-data pipeline operators"))
i_ext_def = find(lambda l: l.startswith("  def extQueries"))
i_duck_doc = find(lambda l: l.startswith("  /** DuckDB replication of the full TextAnalysis"))
i_oracle_def = find(lambda l: l.startswith("  def oracleSql"))
assert lines[-1] == "" and lines[-2] == "}" and lines[-3] == "  )", lines[-3:]

header = lines[:i_flagship - 1]          # package/imports/scaladoc + "object SparkEntry {" ... helpers start at 27
# split header into (file header incl. object line) and helper block
i_obj = find(lambda l: l == "object SparkEntry {")
file_header = lines[:i_obj + 1]
helper_block = lines[i_obj + 1:i_flagship - 1]
entry_block = lines[i_flagship:i_parity_doc - 1]   # entry + queries defs… up to parity doc
parity_block = lines[i_parity_def:i_analytics_doc - 1]
analytics_block = lines[i_analytics_def:i_empty_doc - 1]
empty_block = lines[i_empty_doc:i_ext_doc - 1]
ext_block = lines[i_ext_def:i_duck_doc - 1]
duck_block = lines[i_duck_doc:i_oracle_def - 1]
oracle_block = lines[i_oracle_def:len(lines) - 3]  # def line .. last entry line

ENTRY = re.compile(r'^    "([a-z0-9_]+)" ->')

def keys_of(block):
    return [m.group(1) for l in block if (m := ENTRY.match(l))]

parity_keys, analytics_keys, ext_keys = map(keys_of,
    (parity_block, analytics_block, ext_block))

# --- parse oracle entries into chunks ---
starts = [i for i, l in enumerate(oracle_block) if ENTRY.match(l)]
assert starts, "no oracle entries found"
chunks = []
for a, b in zip(starts, starts[1:] + [len(oracle_block)]):
    chunks.append(oracle_block[a:b])
# move trailing comment/blank lines of chunk k to the head of chunk k+1
for k in range(len(chunks) - 1):
    tail = []
    while chunks[k] and (chunks[k][-1].strip() == "" or
                         chunks[k][-1].lstrip().startswith("//")):
        tail.insert(0, chunks[k].pop())
    chunks[k + 1] = tail + chunks[k + 1]
# normalize: every chunk's last non-blank line ends with ','
for c in chunks:
    for j in range(len(c) - 1, -1, -1):
        if c[j].strip():
            if not c[j].rstrip().endswith(","):
                c[j] = c[j].rstrip() + ","
            break

oracle_by_key = {}
for c in chunks:
    key = next(m.group(1) for l in c if (m := ENTRY.match(l)))
    oracle_by_key[key] = c

all_q = set(parity_keys) | set(analytics_keys) | set(ext_keys)
missing = [k for k in oracle_by_key if k not in all_q]
assert not missing, f"oracle keys with no query: {missing}"
print(f"queries: parity={len(parity_keys)} analytics={len(analytics_keys)} "
      f"ext={len(ext_keys)}; oracles={len(oracle_by_key)}")

IMPORTS = """
import graft.core.{Diff, DiffOptions, Records}
import graft.ext.{Assemble, Dedup, Multimodal, Similarity, TextAnalysis}
import graft.mapper.Mapper
import graft.pipeline.{ImportService, Preset}
import graft.sources.InlineSource
import graft.targets.{FileTarget, JdbcTarget}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Shared._
""".strip("\n")

def strip_private(block):
    out = []
    for l in block:
        l = re.sub(r"^(\s*)private (def|val|lazy val)", r"\1\2", l)
        out.append(l)
    return out

def write(path, text):
    open(path, "w").write(text)
    print("wrote", path)

# --- Shared.scala ---
shared = ["package graft.registry", ""]
shared += [l for l in IMPORTS.split("\n") if not l.startswith("import Shared")]
shared += ["",
  "/** Helpers shared by the per-tier query/oracle registries — the",
  "  * synthetic sync inputs, temp-dir lifecycle, and the DuckDB oracle",
  "  * CTE fragments. Moved verbatim out of SparkEntry (registry split;",
  "  * zero behavior change). */",
  "private[graft] object Shared {"]
shared += strip_private(helper_block)
shared += strip_private([""] + empty_block)
shared += strip_private([""] + duck_block)
shared += ["}", ""]
write("src/main/scala/graft/registry/Shared.scala", "\n".join(shared))

def registry(path, name, doc, qdefline_prefix, qblock, okeys):
    out = ["package graft.registry", "", IMPORTS, ""]
    out += doc
    out += [f"private[graft] object {name} {{"]
    qb = list(qblock)
    qb[0] = re.sub(r"^  def \w+: Map\[String, \(SparkSession, String\) => DataFrame\] = Map\(",
                   "  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(",
                   qb[0])
    assert qb[0].startswith("  val queries"), qb[0]
    out += qb
    out += ["", "  /** DuckDB oracles for this tier's queries. */",
            "  val oracles: Map[String, String] = Map("]
    for k in okeys:
        if k in oracle_by_key:
            out += oracle_by_key[k]
    out += ["  )", "}", ""]
    write(path, "\n".join(out))

registry("src/main/scala/graft/registry/ParityRegistry.scala", "ParityRegistry",
         lines[i_parity_doc:i_parity_def], "parityQueries", parity_block, parity_keys)
registry("src/main/scala/graft/registry/AnalyticsRegistry.scala", "AnalyticsRegistry",
         lines[i_analytics_doc:i_analytics_def], "analyticsQueries", analytics_block,
         analytics_keys)
registry("src/main/scala/graft/registry/ExtRegistry.scala", "ExtRegistry",
         lines[i_ext_doc:i_ext_def], "extQueries", ext_block, ext_keys)

# --- new SparkEntry.scala ---
entry_src = file_header[:2] + [
 "import graft.registry.{AnalyticsRegistry, ExtRegistry, ParityRegistry}",
 "import org.apache.spark.sql.{DataFrame, SparkSession}",
 ""] + [l for l in file_header if l.startswith("/**") or l.startswith(" *")] + [
 "object SparkEntry {",
 ""] + [re.sub(r"^    parityQueries \+\+ analyticsQueries \+\+ extQueries$",
               "    ParityRegistry.queries ++ AnalyticsRegistry.queries ++ ExtRegistry.queries",
               l) for l in entry_block] + [
 "",
 "  /** DuckDB oracle per query (driver contract). */",
 "  def oracleSql: Map[String, String] =",
 "    ParityRegistry.oracles ++ AnalyticsRegistry.oracles ++ ExtRegistry.oracles",
 "}",
 ""]
write(SRC, "\n".join(entry_src))
