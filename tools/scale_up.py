#!/usr/bin/env python3
"""Replicate a driver-generated sf dir K times with id offsets.

Local tooling only (like tools/check.py) — produces a larger synthetic
scale (e.g. sf0.1 x 10 ~ sf1) for scale-cliff smoke runs of the bench
queries. Two modes:

DEFAULT (density-growth): primary-key columns are offset per copy so
dedup/windows see unique ids; orders/lineitem share ONE orderkey stride
so the FK holds across copies. Non-offset keys (user_id, custkey) and
payloads repeat, so PER-KEY densities grow by K: per-user event counts,
exact-dup cliques (every doc/vector becomes a K-clique), and anything
quadratic in per-key density (interval-join pair lists) grows
superlinearly — judge those queries on rows/sec, not wall-clock.

--key-growth: additionally offsets JOIN/user keys per copy (user_id,
custkey, partkey, suppkey — dims replicate with their FK strides) and
salts payload content (documents.text word-rotation + per-copy salt
token; embeddings rotated per copy), so per-key density and duplicate
density stay CONSTANT as K grows. This is the realistic 100 TB shape —
more users and more documents, not 10x events per user and 10-cliques
of every document — and is the mode for judging the dedup/stream-join/
semdedup tiers, whose default-mode ratios are density-biased.

Schema fidelity matters (events.ts layout varies by driver
generation), so this uses pyarrow concat with the original schema,
never a rewrite through another engine's type system.
"""
import sys
import shutil
import pathlib
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# table -> columns to offset per copy (primary ids only)
OFFSET_KEYS = {
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id"],
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey"],  # keeps (orderkey, linenumber) unique
}

# key groups that must share one stride across tables (FK pairs):
# offsetting o_orderkey and l_orderkey by independently computed
# maxima would break every orders⋈lineitem join past copy 0
SHARED_STRIDE = {"o_orderkey": "orderkey", "l_orderkey": "orderkey"}

# --key-growth extras: join/user keys offset per copy, dims replicated.
# nation/region stay fixed-cardinality (they ARE fixed in the real
# world at any scale — 25 nations at 100 TB too).
KG_OFFSET_KEYS = {
    "events": ["user_id"],
    "orders": ["o_custkey"],
    "customer": ["c_custkey"],
    "lineitem": ["l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
}
KG_SHARED_STRIDE = {
    "o_custkey": "custkey", "c_custkey": "custkey",
    "l_partkey": "partkey", "p_partkey": "partkey",
    "l_suppkey": "suppkey", "s_suppkey": "suppkey",
}


def salt_documents(t: pa.Table, i: int) -> pa.Table:
    """Copy-i text salt: replace every 5th word with a copy-and-
    position-specific token. A word ROTATION preserves interior
    shingles (adjacency survives everywhere but the seam), so rotated
    copies stayed J≈0.95 3-gram near-dups of each other — measured,
    not hypothetical. Periodic replacement destroys the 3 shingles
    covering each replaced position in BOTH copies at the SAME
    positions with DIFFERENT tokens, so cross-copy 3-gram Jaccard
    lands at (m-3)/(m+3) = 0.25 for m=5 — under any near-dup
    threshold — while ~80% of each document's original tokens (and
    all of copy 0) survive for realistic text statistics."""
    texts = t.column("text").to_pylist()
    out = []
    for s in texts:
        if s is None:
            out.append(None)
            continue
        w = s.split(" ")
        for p in range(2, len(w), 5):
            w[p] = f"kg{i}p{p}"
        out.append(" ".join(w))
    idx = t.schema.get_field_index("text")
    t = t.set_column(idx, t.schema.field(idx), pa.array(out, pa.string()))
    if "n_chars" in t.column_names:
        nidx = t.schema.get_field_index("n_chars")
        nf = t.schema.field(nidx)
        t = t.set_column(nidx, nf, pa.array(
            [len(x) if x is not None else None for x in out], nf.type))
    return t


def salt_embeddings(t: pa.Table, i: int) -> pa.Table:
    """Copy-i vector salt: rotate each embedding's dimensions by i.
    Norms and the intra-copy similarity structure are EXACTLY
    preserved (rotation is an isometry applied uniformly within the
    copy); cross-copy cosine drops to the random-pair level, so
    near-dup/ANN candidate densities stay constant."""
    idx = t.schema.get_field_index("embedding")
    field = t.schema.field(idx)
    vecs = t.column("embedding").to_pylist()
    dims = [len(v) for v in vecs if v]
    r = i % min(dims) if dims else 0
    out = [(v[r:] + v[:r]) if v else v for v in vecs]
    return t.set_column(idx, field, pa.array(out, field.type))


def scale(src: pathlib.Path, dst: pathlib.Path, k: int,
          key_growth: bool = False) -> None:
    dst.mkdir(parents=True, exist_ok=True)
    offset_keys = {n: list(c) for n, c in OFFSET_KEYS.items()}
    shared_stride = dict(SHARED_STRIDE)
    if key_growth:
        for n, cols in KG_OFFSET_KEYS.items():
            offset_keys[n] = offset_keys.get(n, []) + cols
        shared_stride.update(KG_SHARED_STRIDE)
    # pass 1: one stride per shared group = max over ALL its columns
    shared: dict[str, int] = {}
    for f in sorted(src.glob("*.parquet")):
        for key in offset_keys.get(f.stem, []):
            group = shared_stride.get(key)
            if group is not None:
                m = pc.max(pq.read_table(f, columns=[key]).column(key))
                shared[group] = max(shared.get(group, 0), m.as_py() + 1)
    for f in sorted(src.glob("*.parquet")):
        name = f.stem
        t = pq.read_table(f)
        keys = offset_keys.get(name, [])
        if not keys:
            shutil.copyfile(f, dst / f.name)
            print(f"{name}: copied ({t.num_rows} rows)")
            continue
        stride = {}
        for key in keys:
            group = shared_stride.get(key)
            stride[key] = (shared[group] if group is not None
                           else pc.max(t.column(key)).as_py() + 1)
        copies = [t]
        for i in range(1, k):
            c = t
            for key in keys:
                idx = c.schema.get_field_index(key)
                field = c.schema.field(idx)
                shifted = pc.add(c.column(key), pa.scalar(
                    stride[key] * i, type=field.type))
                c = c.set_column(idx, field, shifted)
            if key_growth and name == "documents":
                c = salt_documents(c, i)
            if key_growth and name == "embeddings":
                c = salt_embeddings(c, i)
            copies.append(c)
        out = pa.concat_tables(copies)
        pq.write_table(out, dst / f.name)
        salted = (" + payload salt" if key_growth and
                  name in ("documents", "embeddings") else "")
        print(f"{name}: {t.num_rows} -> {out.num_rows} rows "
              f"(offset {keys} by {[stride[key] for key in keys]}{salted})")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--key-growth"]
    kg = "--key-growth" in sys.argv[1:]
    src, dst, k = args[0], args[1], int(args[2])
    scale(pathlib.Path(src), pathlib.Path(dst), k, key_growth=kg)
