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
    # optional third arg: write a per-query JSON artifact (the
    # CORRECTNESS_SF1-style record) alongside the text report
    json_out = sys.argv[3] if len(sys.argv) > 3 else None
    results = {}
    con = duckdb.connect()
    # big-SF runs: cap DuckDB's memory and give it a spill directory, so a
    # heavy oracle spills instead of drawing the OOM killer (the first
    # sf1.0 gate attempt died on SIGKILL with no per-row output)
    mem = os.environ.get("GRAFT_DUCKDB_MEM")
    if mem:
        con.execute(f"SET memory_limit='{mem}'")
        con.execute("SET temp_directory='/tmp/duckspill'")
    only = os.environ.get("GRAFT_CHECK_ONLY")
    only = set(x.strip() for x in only.split(",") if x.strip()) if only else None
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p)[:-len(".parquet")]
        # driver testdata ships single files; ScaleUp/Spark write
        # DIRECTORIES of part files — glob those for DuckDB
        src_path = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{src_path}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only is not None:
        oracle = {k: v for k, v in oracle.items() if k in only}
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
    def record(name, ok, err, n_spark=None, n_want=None):
        results[name] = {"rows_match": ok and n_spark == n_want,
                         "schema_match": ok, "hash_match": ok,
                         "spark_rows": n_spark, "oracle_rows": n_want,
                         "err": err}
    missing = (spark_outs | manifest) - set(oracle)
    if only is not None:
        missing &= only
    for name in sorted(missing):
        print(f"FAIL {name}: no oracle entry"); n_bad += 1
        record(name, False, "no oracle entry")
    for name, sql in sorted(oracle.items()):
        spark_path = f"{out_dir}/{name}"
        if not os.path.isdir(spark_path):
            print(f"FAIL {name}: no spark output"); n_bad += 1
            record(name, False, "no spark output"); continue
        try:
            got_cols, got = rows_of(con.sql(
                f"SELECT * FROM read_parquet('{spark_path}/*.parquet')"))
            want_cols, want = rows_of(con.sql(sql))
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_bad += 1
            record(name, False, str(e)); continue
        if got_cols != want_cols:
            print(f"FAIL {name}: cols {got_cols} != {want_cols}"); n_bad += 1
            record(name, False, "schema mismatch", len(got), len(want))
        elif len(got) != len(want):
            print(f"FAIL {name}: {len(got)} rows != {len(want)}"); n_bad += 1
            record(name, False, "row count mismatch", len(got), len(want))
        elif got != want:
            bad = next(i for i in range(len(got)) if got[i] != want[i])
            print(f"FAIL {name}: first diff row {bad}:\n  spark={got[bad]}\n  duck ={want[bad]}")
            n_bad += 1
            record(name, False, f"value mismatch at sorted row {bad}",
                   len(got), len(want))
        else:
            print(f"ok   {name} ({len(got)} rows)"); n_ok += 1
            record(name, True, None, len(got), len(want))
    print(f"== {n_ok} ok, {n_bad} bad ==")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
