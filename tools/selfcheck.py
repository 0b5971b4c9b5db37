#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate: compare each
Verify-dumped parquet result against its DuckDB oracle on the same tables.

Usage: tools/selfcheck.py [sfDir] [verifyOut]
(run tools/run_verify.sh first).
"""
import glob
import json
import sys

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
results = {}
for name in sorted(oracle):
    files = glob.glob(f"{OUT}/{name}/*.parquet")
    if not files:
        results[name] = "MISSING spark result"
        continue
    try:
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetch_arrow_table()
        want = con.execute(oracle[name]).fetch_arrow_table()
    except Exception as e:
        results[name] = f"ERROR {e}"
        continue
    g = got.select(sorted(got.column_names)).to_pylist()
    w = want.select(sorted(want.column_names)).to_pylist()
    if sorted(got.column_names) != sorted(want.column_names):
        results[name] = (f"SCHEMA cols {sorted(got.column_names)} vs "
                         f"{sorted(want.column_names)}")
    elif len(g) != len(w):
        results[name] = f"ROWS {len(g)} vs {len(w)}"
    elif g != w:
        bad = next(i for i, (a, b) in enumerate(zip(g, w)) if a != b)
        results[name] = f"VALUES first diff at row {bad}: {g[bad]} vs {w[bad]}"
    else:
        results[name] = f"OK ({len(g)} rows)"

# rows-only queries (no oracle): just confirm the dump exists and has rows
for path in sorted(glob.glob(f"{OUT}/*/")):
    name = path.rstrip("/").split("/")[-1]
    if name in oracle:
        continue
    files = glob.glob(f"{path}*.parquet")
    if not files:
        results[name] = "MISSING (rows-only)"
        continue
    n = con.execute(f"SELECT count(*) FROM read_parquet({files!r})").fetchone()[0]
    results[name] = f"rows-only: {n} rows" + ("" if n > 0 else " !! EMPTY")

# driver-compat gate: the external driver pandas-sorts every result by all
# columns before hashing; list/binary columns raise "unhashable type" there
# even when the value compare above passes. Reproduce that here. The driver
# hash is also dtype-sensitive (e.g. DuckDB SUM(BIGINT) -> HUGEINT ->
# float64 while Spark emits int64), so compare pandas dtypes for oracle
# queries too — to_pylist() above coerces both to Python int and hides it.
for path in sorted(glob.glob(f"{OUT}/*/")):
    name = path.rstrip("/").split("/")[-1]
    files = glob.glob(f"{path}*.parquet")
    if not files:
        continue
    try:
        df = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetch_arrow_table().to_pandas()
        df.sort_values(by=sorted(df.columns), inplace=True)
    except Exception as e:
        results[name] = f"DRIVER-UNHASHABLE {type(e).__name__}: {e}"
        continue
    if name in oracle and results.get(name, "").startswith("OK"):
        try:
            odf = con.execute(oracle[name]).df()
        except Exception:
            continue
        # the driver hash tolerates date-object-vs-datetime64 and
        # int32-vs-int64 (all hash-green in r03) but NOT float-vs-int
        # (e_variant_agg r03: DuckDB SUM(BIGINT)->HUGEINT->float64 vs
        # Spark int64 broke it) and NOT object-vs-numeric (c34 r10: a
        # raw DECIMAL dump reaches pandas as object BigDecimals while
        # DuckDB .df() yields float64) — flag any mixed numeric/object
        # kind pair; {object,datetime64} stays tolerated (dates).
        diff = {}
        for c in set(df.columns) & set(odf.columns):
            gk, ok = df[c].dtype.kind, odf[c].dtype.kind
            pair = {gk, ok}
            numeric = {"f", "i", "u"}
            mixed_num = len(pair & numeric) > 0 and pair != {"i", "u"} \
                and len(pair) > 1 and pair <= (numeric | {"O"})
            if mixed_num:
                diff[c] = (str(df[c].dtype), str(odf[c].dtype))
        if diff:
            results[name] = f"DTYPE spark-vs-oracle {diff}"

fails = 0
for name, r in sorted(results.items()):
    ok = r.startswith("OK") or (r.startswith("rows-only") and "EMPTY" not in r)
    fails += 0 if ok else 1
    print(f"{'PASS' if ok else 'FAIL':4} {name}: {r}")
print(f"\n{len(results) - fails}/{len(results)} pass")
sys.exit(1 if fails else 0)
