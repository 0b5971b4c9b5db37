#!/usr/bin/env python3
"""Regression check for selfcheck.py's driver-compat dtype gate.

The external driver's hash is dtype-sensitive: a raw DECIMAL column
dumped by Spark reaches pandas as dtype `object` (BigDecimal objects)
while the DuckDB oracle's .df() yields float64 — values equal, hash
different (the r10 c34 failure). This script builds exactly that
shape in a scratch dir and asserts selfcheck.py FAILS it with a DTYPE
line; then builds the canonicalized (DOUBLE both sides) shape and
asserts it passes. Run: python3 tools/test_selfcheck_dtypes.py
"""
import decimal
import json
import os
import shutil
import subprocess
import sys
import tempfile

import duckdb
import pandas as pd

root = tempfile.mkdtemp(prefix="selfcheck_dtype_")
sf = os.path.join(root, "sf")
out = os.path.join(root, "out")
os.makedirs(sf)
os.makedirs(os.path.join(out, "q_decimal"))
os.makedirs(os.path.join(out, "q_double"))

con = duckdb.connect()
# minimal table set selfcheck registers
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"COPY (SELECT 1 AS x) TO '{sf}/{t}.parquet'")

# the un-canonicalized dump: object-dtype decimals, float64 oracle
bad = pd.DataFrame({"k": [1, 2],
                    "amt": [decimal.Decimal("1.50"),
                            decimal.Decimal("2.25")]})
bad.to_parquet(os.path.join(out, "q_decimal", "part.parquet"))
good = pd.DataFrame({"k": [1, 2], "amt": [1.50, 2.25]})
good.to_parquet(os.path.join(out, "q_double", "part.parquet"))

with open(os.path.join(out, "oracle_sql.json"), "w") as f:
    json.dump({
        "q_decimal":
            "SELECT * FROM (VALUES (1, 1.50), (2, 2.25)) t(k, amt)",
        "q_double":
            "SELECT * FROM (VALUES (1, CAST(1.50 AS DOUBLE)), "
            "(2, CAST(2.25 AS DOUBLE))) t(k, amt)",
    }, f)

r = subprocess.run(
    [sys.executable, os.path.join(os.path.dirname(__file__),
                                  "selfcheck.py"), sf, out],
    capture_output=True, text=True)
shutil.rmtree(root)
lines = r.stdout.splitlines()
dec = next((l for l in lines if " q_decimal:" in l), "")
dbl = next((l for l in lines if " q_double:" in l), "")
ok = dec.startswith("FAIL") and "DTYPE" in dec and dbl.startswith("PASS")
print(dec)
print(dbl)
print("dtype gate:", "OK" if ok else "BROKEN")
sys.exit(0 if ok else 1)
