#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
Loads each <name>/ parquet result written by graft.Verify, runs the
matching oracle SQL from oracle_sql.json in DuckDB (with each testdata
table registered as a view), and compares row count, column names, and
a hash of the sorted values.
"""
import sys, json, glob, os
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
ok = fail = 0
for name, sql in sorted(oracle.items()):
    res_dir = f"{outdir}/{name}"
    if not os.path.isdir(res_dir):
        print(f"FAIL {name}: no spark result dir"); fail += 1; continue
    try:
        got = con.sql(f"SELECT * FROM '{res_dir}/*.parquet'")
        want = con.sql(sql)
        gcols = sorted(got.columns); wcols = sorted(want.columns)
        if gcols != wcols:
            print(f"FAIL {name}: columns {gcols} vs {wcols}"); fail += 1; continue
        # Type strictness: the driver's hasher is type-sensitive (DuckDB
        # sum(BIGINT) -> HUGEINT burned round 8), so a string-level value
        # compare is NOT enough. Fail on any column-type mismatch between
        # the Spark result and the oracle before hashing values.
        gtypes = dict(zip(got.columns, (str(t) for t in got.types)))
        wtypes = dict(zip(want.columns, (str(t) for t in want.types)))
        mismatch = [(c, gtypes[c], wtypes[c]) for c in gcols
                    if gtypes[c] != wtypes[c]]
        if mismatch:
            det = "; ".join(f"{c}: spark={g} oracle={w}" for c, g, w in mismatch)
            print(f"FAIL {name}: column type mismatch — {det}")
            fail += 1; continue
        collist = ", ".join(f'"{c}"' for c in gcols)
        gh = con.sql(f"SELECT count(*), md5(string_agg(r,'|' ORDER BY r)) FROM (SELECT concat_ws(',',{collist}) r FROM got)").fetchone()
        wh = con.sql(f"SELECT count(*), md5(string_agg(r,'|' ORDER BY r)) FROM (SELECT concat_ws(',',{collist}) r FROM want)").fetchone()
        if gh == wh:
            print(f"OK   {name}: rows={gh[0]}"); ok += 1
        else:
            print(f"FAIL {name}: got rows={gh[0]} hash={gh[1][:8]} want rows={wh[0]} hash={wh[1][:8]}")
            fail += 1
            # show a small diff sample
            try:
                d = con.sql(f"(SELECT concat_ws(',',{collist}) r FROM got EXCEPT SELECT concat_ws(',',{collist}) r FROM want) UNION ALL (SELECT concat('W:',concat_ws(',',{collist})) FROM want EXCEPT SELECT concat('W:',concat_ws(',',{collist})) FROM got) LIMIT 6").fetchall()
                for row in d: print("   diff:", row[0][:160])
            except Exception as e:
                print("   (diff err)", e)
    except Exception as e:
        print(f"FAIL {name}: {e}"); fail += 1
print(f"\n{ok} ok, {fail} fail")
sys.exit(1 if fail else 0)
