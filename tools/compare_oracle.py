#!/usr/bin/env python3
"""Local pre-check of the driver's DuckDB-oracle correctness gate.

Loads each Spark result parquet from the Verify outDir, runs the matching
oracle SQL in DuckDB against the raw testdata tables, sorts columns by
name and rows by all columns, and compares values cell-by-cell (exact for
ints/strings/timestamps, tiny-epsilon report for floats so we can see
HOW values differ when they do).

The comparison is TYPE-STRICT, mirroring the driver's hash gate: DuckDB
column types must match between the spark-parquet scan and the oracle
query (BIGINT vs HUGEINT/DECIMAL is a FAIL even when values are ==), and
cell values must agree on Python type as well as value (Decimal(5) == 5
is True under ==, but hashes differently downstream — so it FAILS here).

Besides the human-readable PASS/FAIL lines, writes a driver-schema
correctness artifact ({"rows_match", "schema_match", "hash_match",
"spark_rows", "oracle_rows", "err"} per query) to the path given as the
third argument (default CORRECTNESS_LOCAL.json in the repo root), so the
repo always carries a machine-readable record of the local gate even if
a driver run's artifact arrives empty.
"""
import json
import math
import sys
import glob
import os
import threading
import time

import duckdb

# Hard per-oracle wall-time ceiling: a single slow DuckDB oracle (the
# q188 CTE-inlining blow-up, round 8/9) silently ate the driver's whole
# compare budget and zeroed the round record. Any oracle that exceeds
# the ceiling is interrupted and FAILS LOUDLY instead.
ORACLE_CEILING_S = float(os.environ.get("GRAFT_ORACLE_CEILING_S", "30"))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT_DIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
RECORD_PATH = sys.argv[3] if len(sys.argv) > 3 else os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "CORRECTNESS_LOCAL.json")

con = duckdb.connect()
for p in glob.glob(os.path.join(SF_DIR, "*.parquet")):
    name = os.path.basename(p)[:-len(".parquet")]
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(os.path.join(OUT_DIR, "oracle_sql.json")))

def canon(rel):
    cols, types, rows = rel.columns, [str(t) for t in rel.types], rel.fetchall()
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    out.sort(key=lambda t: tuple((v is None, str(v)) for v in t))
    return [cols[i] for i in order], [types[i] for i in order], out

record = {}

def rec(name, rows_match=False, schema_match=False, hash_match=False,
        spark_rows=None, oracle_rows=None, err=None):
    record[name] = {"rows_match": rows_match, "schema_match": schema_match,
                    "hash_match": hash_match, "spark_rows": spark_rows,
                    "oracle_rows": oracle_rows, "err": err}

n_pass = n_fail = 0
slowest = []  # (oracle_seconds, name) for the end-of-run summary
for name in sorted(oracle):
    spark_dir = os.path.join(OUT_DIR, name)
    if not os.path.isdir(spark_dir):
        print(f"FAIL {name}: no spark output")
        rec(name, err="no spark output")
        n_fail += 1
        continue
    try:
        sp_cols, sp_types, sp_rows = canon(
            con.sql(f"SELECT * FROM '{spark_dir}/*.parquet'"))
        t0 = time.monotonic()
        timer = threading.Timer(ORACLE_CEILING_S, con.interrupt)
        timer.start()
        try:
            du_cols, du_types, du_rows = canon(con.sql(oracle[name]))
        finally:
            timer.cancel()
        oracle_s = time.monotonic() - t0
        if oracle_s > ORACLE_CEILING_S:
            print(f"FAIL {name}: oracle exceeded {ORACLE_CEILING_S:.0f}s "
                  f"ceiling ({oracle_s:.1f}s) — hint its CTEs MATERIALIZED")
            rec(name, err=f"oracle exceeded {ORACLE_CEILING_S:.0f}s ceiling "
                          f"({oracle_s:.1f}s)")
            n_fail += 1
            continue
    except Exception as e:
        msg = str(e).splitlines()[0][:160]
        if "INTERRUPT" in msg.upper():
            msg = (f"oracle interrupted at {ORACLE_CEILING_S:.0f}s ceiling "
                   f"— hint its CTEs MATERIALIZED")
        print(f"FAIL {name}: {msg}")
        rec(name, err=msg)
        n_fail += 1
        continue
    if sp_cols != du_cols:
        print(f"FAIL {name}: columns {sp_cols} vs {du_cols}")
        rec(name, spark_rows=len(sp_rows), oracle_rows=len(du_rows),
            rows_match=len(sp_rows) == len(du_rows),
            err=f"columns {sp_cols} vs {du_cols}"[:160])
        n_fail += 1
        continue
    if sp_types != du_types:
        diff = [(c, a, b) for c, a, b in zip(sp_cols, sp_types, du_types)
                if a != b]
        print(f"FAIL {name}: types spark vs duckdb {diff}")
        rec(name, spark_rows=len(sp_rows), oracle_rows=len(du_rows),
            rows_match=len(sp_rows) == len(du_rows),
            err=f"types {diff}"[:160])
        n_fail += 1
        continue
    if len(sp_rows) != len(du_rows):
        print(f"FAIL {name}: rows {len(sp_rows)} vs {len(du_rows)}")
        rec(name, schema_match=True,
            spark_rows=len(sp_rows), oracle_rows=len(du_rows),
            err=f"rows {len(sp_rows)} vs {len(du_rows)}")
        n_fail += 1
        continue
    bad = None
    for i, (a, b) in enumerate(zip(sp_rows, du_rows)):
        for j, (x, y) in enumerate(zip(a, b)):
            if x is None and y is None:
                continue
            if isinstance(x, float) and isinstance(y, float):
                if x != y and not (math.isnan(x) and math.isnan(y)):
                    bad = (i, sp_cols[j], x, y, abs(x - y))
                    break
            elif type(x) is not type(y):
                bad = (i, sp_cols[j], f"{type(x).__name__}:{x!r}",
                       f"{type(y).__name__}:{y!r}", None)
                break
            elif x != y:
                bad = (i, sp_cols[j], x, y, None)
                break
        if bad:
            break
    if bad:
        print(f"FAIL {name}: row {bad[0]} col {bad[1]}: spark={bad[2]!r} duckdb={bad[3]!r} delta={bad[4]}")
        rec(name, rows_match=True, schema_match=True,
            spark_rows=len(sp_rows), oracle_rows=len(du_rows),
            err=f"row {bad[0]} col {bad[1]}: spark={bad[2]!r} duckdb={bad[3]!r}"[:160])
        n_fail += 1
    else:
        print(f"PASS {name} ({len(sp_rows)} rows, oracle {oracle_s:.2f}s)")
        rec(name, rows_match=True, schema_match=True, hash_match=True,
            spark_rows=len(sp_rows), oracle_rows=len(du_rows))
        n_pass += 1
    slowest.append((oracle_s, name))

# any spark output without an oracle entry gets the driver's weaker
# rows-only check (auto-derived — a hardcoded list silently skips
# newly added oracle-less queries)
extra = sorted(d for d in os.listdir(OUT_DIR)
               if os.path.isdir(os.path.join(OUT_DIR, d)) and d not in oracle)
for q in extra:
    n = con.sql(f"SELECT count(*) FROM '{OUT_DIR}/{q}/*.parquet'").fetchone()[0]
    status = "INFO" if n > 0 else "FAIL"
    if n == 0:
        n_fail += 1
    rec(q, rows_match=n > 0, spark_rows=n,
        err=None if n > 0 else "rows-only check: 0 rows")
    print(f"{status} {q}: rows-only, {n} rows")

with open(RECORD_PATH, "w") as f:
    json.dump(record, f, indent=2, sort_keys=True)
    f.write("\n")
if slowest:
    top = sorted(slowest, reverse=True)[:5]
    print("slowest oracles: " +
          ", ".join(f"{n}={s:.2f}s" for s, n in top) +
          f" (total oracle time {sum(s for s, _ in slowest):.1f}s)")
print(f"== {n_pass} pass / {n_fail} fail == (record: {RECORD_PATH})")
