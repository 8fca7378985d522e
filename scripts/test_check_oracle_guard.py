#!/usr/bin/env python3
"""Seeded counterexample for check_oracle.py's output-type guard
(VERDICT r17 item 2 / r18 item 2): an UNCAST `sum(n)` oracle returns
DuckDB HUGEINT, which is value-identical to Spark's int64 but
hash-diverges in the driver's pandas-based compare — the q172 failure
mode that stayed red for two driver rounds while the local repr()
compare stayed green. This test proves the guard FIRES on exactly that
oracle shape, and passes once the oracle carries CAST(... AS BIGINT).

Run: python3 scripts/test_check_oracle_guard.py   (exit 0 = guard works)
"""
import json
import os
import subprocess
import sys
import tempfile

import duckdb

HERE = os.path.dirname(os.path.abspath(__file__))
CHECK = os.path.join(HERE, "check_oracle.py")


def run_check(out_dir, sf_dir):
    return subprocess.run(
        [sys.executable, CHECK, out_dir, sf_dir],
        capture_output=True, text=True)


def main():
    with tempfile.TemporaryDirectory() as tmp:
        sf_dir = os.path.join(tmp, "sf")
        out_dir = os.path.join(tmp, "out")
        os.makedirs(sf_dir)
        os.makedirs(out_dir)
        con = duckdb.connect()
        # a tiny 'lineitem' + empty siblings so the view setup succeeds
        con.execute(
            f"COPY (SELECT CAST(r AS INT) AS n FROM range(5) t(r)) "
            f"TO '{sf_dir}/lineitem.parquet'")
        for t in ["region", "nation", "customer", "supplier", "part",
                  "orders", "events", "documents", "embeddings"]:
            con.execute(f"COPY (SELECT 1 AS x) TO '{sf_dir}/{t}.parquet'")
        # the Spark side: a correct int64 result, as Spark would write it
        spark_out = os.path.join(out_dir, "q00_sum")
        os.makedirs(spark_out)
        con.execute(
            f"COPY (SELECT CAST(10 AS BIGINT) AS s) "
            f"TO '{spark_out}/part-0.parquet'")

        # 1. the COUNTEREXAMPLE: uncast sum -> HUGEINT -> guard must fire
        with open(os.path.join(out_dir, "oracle_sql.json"), "w") as f:
            json.dump({"q00_sum": "SELECT sum(n) AS s FROM lineitem"}, f)
        r = run_check(out_dir, sf_dir)
        assert r.returncode == 1, (
            f"guard did NOT fire on an uncast sum(n) oracle\n{r.stdout}")
        assert "oracle type guard" in r.stdout and "HUGEINT" in r.stdout, (
            f"failure was not the type guard:\n{r.stdout}")

        # 2. the q172-discipline oracle: cast AS BIGINT -> must pass
        with open(os.path.join(out_dir, "oracle_sql.json"), "w") as f:
            json.dump({"q00_sum":
                       "SELECT CAST(sum(n) AS BIGINT) AS s FROM lineitem"},
                      f)
        r = run_check(out_dir, sf_dir)
        assert r.returncode == 0, (
            f"cast oracle should pass the guard\n{r.stdout}\n{r.stderr}")
        assert "all queries match" in r.stdout, r.stdout

        # 3. the advisor-r19 shape: sum over DECIMAL(18,2) widens to
        # DECIMAL(38,2) — not DECIMAL(38,0), but it diverges from a
        # non-decimal Spark column the same way; guard must fire
        with open(os.path.join(out_dir, "oracle_sql.json"), "w") as f:
            json.dump({"q00_sum":
                       "SELECT sum(CAST(n AS DECIMAL(18,2))) AS s "
                       "FROM lineitem"}, f)
        r = run_check(out_dir, sf_dir)
        assert r.returncode == 1, (
            f"guard did NOT fire on a DECIMAL(38,2) oracle vs BIGINT "
            f"spark column\n{r.stdout}")
        assert "oracle type guard" in r.stdout and "DECIMAL(38,2)" in \
            r.stdout, f"failure was not the type guard:\n{r.stdout}"

        # 4. ...but when the Spark parquet carries the IDENTICAL wide
        # decimal type, both sides round-trip through pandas the same
        # way — nothing to flag, the check must pass on equal values
        dec_out = os.path.join(out_dir, "q01_dec")
        os.makedirs(dec_out)
        con.execute(
            f"COPY (SELECT CAST(10 AS DECIMAL(38,2)) AS s) "
            f"TO '{dec_out}/part-0.parquet'")
        with open(os.path.join(out_dir, "oracle_sql.json"), "w") as f:
            json.dump({"q01_dec":
                       "SELECT sum(CAST(n AS DECIMAL(18,2))) AS s "
                       "FROM lineitem"}, f)
        r = run_check(out_dir, sf_dir)
        assert r.returncode == 0, (
            f"identical wide-decimal types on both sides should pass"
            f"\n{r.stdout}\n{r.stderr}")
    print("type guard counterexample: OK (fires on HUGEINT and on "
          "mismatched wide DECIMAL, passes on CAST AS BIGINT and on "
          "type-identical wide DECIMAL)")


if __name__ == "__main__":
    main()
