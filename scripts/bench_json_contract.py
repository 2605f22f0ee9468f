#!/usr/bin/env python3
"""One-line bench-JSON contract check (r21 — VERDICT r20 item #5).

The round driver recovers per-query numbers by parsing the LAST line of
the bench run's captured stdout as JSON. Round 19's artifact was tail-
truncated mid-line and the driver silently lost the whole round-over-
round comparison (PERF n_common=0). This checker fails a bench attempt
whose run log does not contain a complete, parseable bench JSON line, so
the violation is loud at bench time instead of silent at judging time.

Usage: python3 scripts/bench_json_contract.py <run-log>
Exit 0 when some line parses as the bench JSON ({"metric": ...} with
"unit": "sec" and a non-empty "queries" map); exit 1 otherwise.
"""
import json
import sys


def has_bench_json(path: str) -> bool:
    try:
        with open(path, errors="replace") as f:
            lines = [l.strip() for l in f]
    except OSError:
        return False
    for line in lines:
        if not line.startswith('{"metric"'):
            continue
        try:
            j = json.loads(line)
        except ValueError:
            continue
        if j.get("unit") == "sec" and isinstance(j.get("queries"), dict) \
                and j["queries"]:
            return True
    return False


if __name__ == "__main__":
    if len(sys.argv) != 2:
        print(__doc__, file=sys.stderr)
        sys.exit(2)
    sys.exit(0 if has_bench_json(sys.argv[1]) else 1)
