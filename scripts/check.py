#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet dir (Spark output), runs the
matching oracle SQL from oracle_sql.json in DuckDB against the raw
parquet tables in <sfDir>, and compares schema + sorted rows.
"""
import sys, json, math, glob, os
import duckdb

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v

def assert_scalar_cols(cols, types):
    # The driver's comparator sorts result rows with pandas, which cannot
    # order array/struct/map cells (r11 lesson: five rows with array
    # columns passed here on str() sort keys but errored driver-side with
    # "unhashable type: numpy.ndarray"). Any non-scalar output column must
    # FAIL locally so local green implies driver green.
    for c, t in zip(cols, types):
        tu = t.upper()
        if "[]" in tu or tu.startswith(("STRUCT", "MAP", "LIST", "UNION")):
            raise ValueError(f"non-scalar output column {c}: {t} "
                             "(driver comparator cannot sort array cells)")

def rows_of(rel):
    # Type-strict like the driver's hash gate: HUGEINT vs BIGINT (or any
    # numeric widening DuckDB applies on fetch) must FAIL here, not coerce —
    # Python would otherwise accept 5 == 5.0 and hide the drift (r3 lesson:
    # d_pipeline_prep passed locally, failed the driver hash).
    cols = rel.columns
    types = [str(t) for t in rel.types]
    assert_scalar_cols(cols, types)
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    typed_cols = [(cols[i], types[i]) for i in order]
    out = []
    for r in rel.fetchall():
        out.append(tuple(norm(r[i]) for i in order))
    return typed_cols, sorted(out, key=lambda t: tuple(str(x) for x in t))

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # Gate on the UNION of oracle keys, Spark output dirs, and the full
    # query-name manifest: a query that ships without an oracle entry must
    # FAIL here (mirrors the driver's no_oracle reporting —
    # d_skew_salted_join slipped through in r4), including the case where
    # its Spark write ALSO failed (present in neither set without names.json).
    spark_outs = {os.path.basename(d) for d in glob.glob(f"{out_dir}/*")
                  if os.path.isdir(d)}
    manifest_path = f"{out_dir}/names.json"
    manifest = set(json.load(open(manifest_path))) if os.path.exists(manifest_path) else set()
    n_ok = n_bad = 0
    # (manifest names WITH an oracle but no output are caught below by the
    # per-oracle "no spark output" branch)
    for name in sorted((spark_outs | manifest) - set(oracle)):
        print(f"FAIL {name}: no oracle entry"); n_bad += 1
    for name, sql in sorted(oracle.items()):
        spark_path = f"{out_dir}/{name}"
        if not os.path.isdir(spark_path):
            print(f"FAIL {name}: no spark output"); n_bad += 1; continue
        try:
            got_cols, got = rows_of(con.sql(
                f"SELECT * FROM read_parquet('{spark_path}/*.parquet')"))
            want_cols, want = rows_of(con.sql(sql))
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_bad += 1; continue
        if got_cols != want_cols:
            print(f"FAIL {name}: cols {got_cols} != {want_cols}"); n_bad += 1
        elif len(got) != len(want):
            print(f"FAIL {name}: {len(got)} rows != {len(want)}"); n_bad += 1
        elif got != want:
            bad = next(i for i in range(len(got)) if got[i] != want[i])
            print(f"FAIL {name}: first diff row {bad}:\n  spark={got[bad]}\n  duck ={want[bad]}")
            n_bad += 1
        else:
            print(f"ok   {name} ({len(got)} rows)"); n_ok += 1
    print(f"== {n_ok} ok, {n_bad} bad ==")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
