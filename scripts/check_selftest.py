#!/usr/bin/env python3
"""Negative test for check.py's non-scalar column gate.

The driver's comparator sorts rows with pandas and errors on array cells;
check.py must therefore FAIL any query whose output (Spark side or oracle
side) has a list/struct/map column — this test pins that, plus the scalar
happy path, so the local gate can never again silently pass what the
driver rejects (the r11 five-red-rows incident).

Usage: python3 scripts/check_selftest.py   (exit 0 = gate behaves)
"""
import json, os, subprocess, sys, tempfile
import duckdb

HERE = os.path.dirname(os.path.abspath(__file__))
CHECK = os.path.join(HERE, "check.py")

def run_check(sf_dir, out_dir):
    r = subprocess.run([sys.executable, CHECK, sf_dir, out_dir],
                       capture_output=True, text=True)
    return r.returncode, r.stdout + r.stderr

def write_spark_out(out_dir, name, sql):
    d = os.path.join(out_dir, name)
    os.makedirs(d, exist_ok=True)
    duckdb.sql(f"COPY ({sql}) TO '{d}/part-0.parquet' (FORMAT PARQUET)")

def main():
    with tempfile.TemporaryDirectory() as tmp:
        sf_dir = os.path.join(tmp, "sf")
        out_dir = os.path.join(tmp, "out")
        os.makedirs(sf_dir); os.makedirs(out_dir)
        duckdb.sql(f"COPY (SELECT 1 AS k, 'a' AS v) TO '{sf_dir}/tbl.parquet'"
                   " (FORMAT PARQUET)")

        # Case 1: array column in the Spark output -> must FAIL
        write_spark_out(out_dir, "q_arr", "SELECT 1 AS k, [1, 2] AS ids")
        with open(os.path.join(out_dir, "oracle_sql.json"), "w") as f:
            json.dump({"q_arr": "SELECT 1 AS k, [1, 2] AS ids"}, f)
        code, out = run_check(sf_dir, out_dir)
        assert code != 0, "array-column query must fail the gate"
        assert "non-scalar" in out, f"expected non-scalar failure, got:\n{out}"

        # Case 2: scalar columns -> must PASS
        write_spark_out(out_dir, "q_ok", "SELECT 1 AS k, 'a' AS v")
        os.rename(os.path.join(out_dir, "q_arr"),
                  os.path.join(tmp, "q_arr_gone"))
        with open(os.path.join(out_dir, "oracle_sql.json"), "w") as f:
            json.dump({"q_ok": "SELECT k, v FROM tbl"}, f)
        code, out = run_check(sf_dir, out_dir)
        assert code == 0, f"scalar query must pass, got:\n{out}"

        # Case 3: array column only on the ORACLE side -> must FAIL too
        write_spark_out(out_dir, "q_ok2", "SELECT 1 AS k")
        with open(os.path.join(out_dir, "oracle_sql.json"), "w") as f:
            json.dump({"q_ok": "SELECT k, v FROM tbl",
                       "q_ok2": "SELECT [1] AS k"}, f)
        code, out = run_check(sf_dir, out_dir)
        assert code != 0 and "non-scalar" in out, \
            f"oracle-side array must fail the gate, got:\n{out}"
    print("check_selftest: all 3 cases pass")

if __name__ == "__main__":
    main()
