#!/usr/bin/env python3
"""Negative/positive self-test of bench_json_contract.py (r21).

Covers the exact r19 failure mode: a run log whose bench JSON line was
tail-truncated mid-object must FAIL the contract; a complete line must
PASS; Spark/sbt noise around the line must not confuse either verdict.
"""
import os
import tempfile

from bench_json_contract import has_bench_json

GOOD = ('{"metric":"total","value":12.3,"unit":"sec","runs":3,"agg":"min",'
        '"queries":{"q1_pricing_summary":0.894,"d_dedup_ngram":1.808},'
        '"canary":{"first":0.5,"last":0.4},"sf":"/root/testdata/sf0.1"}')


def log_with(lines):
    fd, path = tempfile.mkstemp(suffix=".log")
    with os.fdopen(fd, "w") as f:
        f.write("\n".join(lines) + "\n")
    return path


def check(name, lines, want):
    path = log_with(lines)
    got = has_bench_json(path)
    os.unlink(path)
    assert got == want, f"{name}: expected {want}, got {got}"
    print(f"ok   {name}")


check("complete line passes",
      ["[info] running graft.Bench", GOOD, "[success] Total time: 637 s"],
      True)
check("truncated line fails (the r19 mode)",
      ["[info] running graft.Bench", GOOD[: len(GOOD) // 2],
       "[success] Total time: 637 s"],
      False)
check("no bench line fails",
      ["[info] running graft.Bench", "[error] boom"],
      False)
check("empty queries map fails",
      ['{"metric":"total","value":1.0,"unit":"sec","queries":{}}'],
      False)
check("missing log fails", [], False) if False else None
assert not has_bench_json("/nonexistent/bench.log")
print("ok   missing log fails")
print("== all bench_json_contract self-tests passed ==")
