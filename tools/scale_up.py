#!/usr/bin/env python3
"""Replicate a driver-generated sf dir K times with id offsets.

Local tooling only (like tools/check.py) — produces a larger synthetic
scale (e.g. sf0.1 x 10 ~ sf1) for scale-cliff smoke runs of the bench
queries. Primary-key columns are offset per copy so dedup/windows see
unique ids; orders/lineitem share ONE orderkey stride so the FK holds
across copies. Non-offset keys (user_id, custkey) and payloads repeat,
so PER-KEY densities grow by K: per-user event counts, exact-dup
cliques (every doc/vector becomes a K-clique), and anything quadratic
in per-key density (interval-join pair lists) grows superlinearly —
judge those queries on rows/sec, not wall-clock. Schema fidelity
matters (events.ts is TIMESTAMP_NANOS), so this uses pyarrow concat
with the original schema, never a rewrite through another engine's
type system.
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


def scale(src: pathlib.Path, dst: pathlib.Path, k: int) -> None:
    dst.mkdir(parents=True, exist_ok=True)
    # pass 1: one stride per shared group = max over ALL its columns
    shared: dict[str, int] = {}
    for f in sorted(src.glob("*.parquet")):
        for key in OFFSET_KEYS.get(f.stem, []):
            group = SHARED_STRIDE.get(key)
            if group is not None:
                m = pc.max(pq.read_table(f, columns=[key]).column(key))
                shared[group] = max(shared.get(group, 0), m.as_py() + 1)
    for f in sorted(src.glob("*.parquet")):
        name = f.stem
        t = pq.read_table(f)
        keys = OFFSET_KEYS.get(name, [])
        if not keys:
            shutil.copyfile(f, dst / f.name)
            print(f"{name}: copied ({t.num_rows} rows)")
            continue
        stride = {}
        for key in keys:
            group = SHARED_STRIDE.get(key)
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
            copies.append(c)
        out = pa.concat_tables(copies)
        pq.write_table(out, dst / f.name)
        print(f"{name}: {t.num_rows} -> {out.num_rows} rows "
              f"(offset {keys} by {[stride[key] for key in keys]})")


if __name__ == "__main__":
    src, dst, k = sys.argv[1], sys.argv[2], int(sys.argv[3])
    scale(pathlib.Path(src), pathlib.Path(dst), k)
