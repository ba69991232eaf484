#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify output
against DuckDB oracles and diff strictly (sorted columns, sorted rows,
exact values) AND canonically hash both sides the dtype-sensitive way the
driver does. A value-equal pair like int64 5 vs float64 5.0 (DuckDB sum()
returns HUGEINT -> pandas float64) hashes differently — r3's five
"hash_match=false / values equal" reds were exactly this. Oracles must
CAST(sum(...) AS BIGINT) wherever the Spark side emits a long.
Usage: tools/check.py <sfDir> <verifyOutDir>
"""
import json, sys, glob, math, hashlib
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def norm(df):
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def canonical_hash(df):
    """Stringified row hash over the normalized frame, modeling the driver's
    gate (calibrated against CORRECTNESS_r03: int32-vs-int64 and
    date-vs-datetime64 diffs PASS there, int64-vs-float64 FAILS).
    pandas astype(str) renders ints without width ("5"), all-midnight
    datetimes as bare dates ("2024-01-01"), but floats with a decimal
    point ("5.0") — so a DuckDB HUGEINT sum() (-> float64) against a
    Spark long hashes differently even when values compare equal."""
    h = hashlib.sha256()
    for c in df.columns:
        for v in df[c].astype(str):
            h.update(v.encode())
            h.update(b"\x1f")
    return h.hexdigest()

n_pass = n_fail = 0
for qdir in sorted(glob.glob(f"{out_dir}/*/")):
    name = qdir.rstrip("/").split("/")[-1]
    try:
        mine = pd.concat([pd.read_parquet(p) for p in glob.glob(f"{qdir}/*.parquet")])
    except Exception as e:
        print(f"FAIL {name}: cannot read result: {e}"); n_fail += 1; continue
    if name not in oracle:
        print(f"SKIP {name}: no oracle ({len(mine)} rows)")
        continue
    try:
        exp = con.sql(oracle[name]).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
    a, b = norm(mine), norm(exp)
    if list(a.columns) != list(b.columns):
        print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}")
        n_fail += 1; continue
    if len(a) != len(b):
        print(f"FAIL {name}: rows {len(a)} vs {len(b)}"); n_fail += 1; continue
    bad = None
    for c in a.columns:
        av, bv = a[c], b[c]
        try:
            if av.dtype.kind == "f" or bv.dtype.kind == "f":
                ok = ((av.isna() & bv.isna()) | (av == bv)).all()
            else:
                ok = ((av.isna() & bv.isna()) | (av.astype(str) == bv.astype(str))).all()
        except Exception as e:
            ok = False
        if not ok:
            mism = (~((av.isna() & bv.isna()) | (av.astype(str) == bv.astype(str)))).sum()
            bad = f"col {c}: {mism} mismatched (e.g. {av[~((av.isna() & bv.isna()) | (av.astype(str) == bv.astype(str)))].head(3).tolist()} vs {bv[~((av.isna() & bv.isna()) | (av.astype(str) == bv.astype(str)))].head(3).tolist()})"
            break
    if bad:
        print(f"FAIL {name}: {bad}"); n_fail += 1
    elif canonical_hash(a) != canonical_hash(b):
        dt = {c: (str(a[c].dtype), str(b[c].dtype)) for c in a.columns
              if str(a[c].dtype) != str(b[c].dtype)}
        print(f"FAIL {name}: values equal but canonical hash differs "
              f"(dtype diffs: {dt or 'none — check float rendering/-0.0'})")
        n_fail += 1
    else:
        # a 0-row pass tests nothing — surface it so vacuous gates get
        # caught immediately (round 8 found two that slid by for rounds;
        # RowCountAuditSpec enforces the same rule in the test suite)
        tag = " [WARN: EMPTY — vacuous gate?]" if len(a) == 0 else ""
        print(f"PASS {name} ({len(a)} rows){tag}"); n_pass += 1

print(f"\n{n_pass} pass, {n_fail} fail, {len(oracle)} oracles")
sys.exit(1 if n_fail else 0)
