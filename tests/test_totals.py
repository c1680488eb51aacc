"""The COVERAGE.md totals block is GENERATED (tools/emit_totals.py); this
pins it to the live registry so the hand-edited-drift defect class (r5,
r6, r7 verdicts) cannot recur: any registry/bench change without a
regenerate fails here."""

from __future__ import annotations

import glob
import json
import os
import re

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _totals_block() -> str:
    src = open(os.path.join(ROOT, "COVERAGE.md")).read()
    m = re.search(r"<!-- totals:begin.*?-->\n(.*?)\n<!-- totals:end -->", src, re.S)
    assert m, "COVERAGE.md totals markers missing"
    return m.group(1)


def test_coverage_totals_match_registry():
    import sys

    sys.path.insert(0, ROOT)
    import bench
    import __spark_entry__ as entry

    block = _totals_block()
    m = re.search(r"(\d+) `queries\(\)` entries, (\d+) with DuckDB-oracle", block)
    assert m, block
    assert int(m.group(1)) == len(entry.queries())
    assert int(m.group(2)) == len(entry.oracle_sql())
    m = re.search(r"(\d+) bench headline queries", block)
    assert m, block
    assert int(m.group(1)) == len(bench.HEADLINE)


def test_coverage_totals_match_latest_bench_artifact():
    rounds = []
    for p in glob.glob(os.path.join(ROOT, "BENCH_r*.json")):
        mm = re.match(r"BENCH_r(\d+)\.json$", os.path.basename(p))
        if mm:
            rounds.append((int(mm.group(1)), p))
    assert rounds
    _, path = max(rounds)
    data = json.load(open(path))
    parsed = data.get("parsed", data)
    block = _totals_block()
    assert os.path.basename(path) in block
    assert f"spark_vs_duckdb = {parsed['spark_vs_duckdb']:.3f}" in block
    assert f"{parsed['n_queries']} headline" in block
