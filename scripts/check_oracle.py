#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate: run Verify output
parquet against DuckDB oracle SQL (oracle_sql.json) on the same SF dir.
Compares row count, schema (column names), and per-value hash with columns
sorted by name. Usage: check_oracle.py <verify_out_dir> <sf_dir>"""
import sys, os, json, math, re
import duckdb
import pandas as pd

out_dir, sf_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(v):
    if isinstance(v, float):
        if math.isnan(v): return "nan"
        return repr(v)
    return repr(v)

fails = []
for name in sorted(oracle):
    pq = f"{out_dir}/{name}"
    if not os.path.isdir(pq):
        fails.append((name, "missing spark output")); continue
    got_rel = con.sql(f"SELECT * FROM '{pq}/*.parquet'")
    got_cols = list(got_rel.columns)
    got_types = {c: str(t).upper()
                 for c, t in zip(got_rel.columns, got_rel.types)}
    got = got_rel.fetchall()
    # Driver-harness canary: the real gate sorts result rows with pandas
    # (sort_values -> factorize), which throws on unhashable cells (e.g.
    # an array<long> column -> numpy.ndarray). Replicate that here so an
    # un-hashable battery output fails locally, not in the driver run.
    try:
        pd.DataFrame(got, columns=got_cols).sort_values(by=sorted(got_cols))
    except TypeError as e:
        fails.append((name, f"driver-sort canary: {e}")); continue
    try:
        rel = con.sql(oracle[name])
        exp_types = [str(t).upper() for t in rel.types]
        exp_cols = list(rel.columns)
        exp = rel.fetchall()
    except Exception as e:
        fails.append((name, f"oracle error: {e}")); continue
    # Driver-harness canary #2: the real gate hashes values after a pandas
    # round-trip, where a DuckDB HUGEINT or DECIMAL(38,0) output column
    # (e.g. an uncast sum() over integers) hash-diverges from Spark's
    # int64 even when every value is identical — the q172 failure mode,
    # red for two driver rounds while this script's repr() compare stayed
    # green (Python ints erase the width). Fail on the TYPE so the next
    # uncast oracle reproduces locally: CAST the aggregate AS BIGINT.
    # Any DECIMAL wider than Spark's 18-digit LongDecimal comfort zone is
    # suspect, not just DECIMAL(38,0): e.g. sum over DECIMAL(18,2) widens
    # to DECIMAL(38,2) in DuckDB while Spark emits a narrower decimal —
    # unless the Spark parquet column carries the IDENTICAL DuckDB type,
    # in which case the pandas round-trip treats both sides the same and
    # there is nothing to flag (advisor r19 item 3).
    def _diverges(c, t):
        if t in ("HUGEINT", "UHUGEINT", "INT128"):
            return True
        m = re.match(r"DECIMAL\((\d+),", t)
        return bool(m) and int(m.group(1)) > 18 and got_types.get(c) != t
    wide = [f"{c} ({t})" for c, t in zip(exp_cols, exp_types)
            if _diverges(c, t)]
    if wide:
        fails.append((name, f"oracle type guard: {wide} would hash-diverge "
                      "from Spark int64 in the driver compare — "
                      "CAST ... AS BIGINT in the oracle SQL")); continue
    if sorted(got_cols) != sorted(exp_cols):
        fails.append((name, f"schema: got {got_cols} want {exp_cols}")); continue
    if len(got) != len(exp):
        fails.append((name, f"rows: got {len(got)} want {len(exp)}")); continue
    gi = [got_cols.index(c) for c in sorted(got_cols)]
    ei = [exp_cols.index(c) for c in sorted(exp_cols)]
    for rn, (g, e) in enumerate(zip(got, exp)):
        gr = tuple(canon(g[i]) for i in gi); er = tuple(canon(e[i]) for i in ei)
        if gr != er:
            fails.append((name, f"row {rn}: got {gr} want {er}")); break
    else:
        print(f"  OK {name} ({len(got)} rows)")
if fails:
    print(f"\n{len(fails)} FAILURES:")
    for n, m in fails: print(f"  FAIL {n}: {m}")
    sys.exit(1)
print("\nall queries match")
