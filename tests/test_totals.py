"""The COVERAGE.md totals block is GENERATED (tools/emit_totals.py); this
pins it to the live registry so the hand-edited-drift defect class (r5,
r6, r7 verdicts) cannot recur: any registry/bench change without a
regenerate fails here."""

from __future__ import annotations

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


def _emit_totals_module():
    import sys

    sys.path.insert(0, os.path.join(ROOT, "tools"))
    import emit_totals

    return emit_totals


def test_coverage_totals_match_cited_bench_artifact():
    """The block must cite a real BENCH_r*.json whose RESOLVED totals match.

    Two driver realities this must tolerate (the r8 verdict's red gate):
    - ``"parsed": null`` — the driver's tail-capture truncated the bench's
      JSON line (BENCH_r08.json); totals are then reconstructed from
      BENCH_detail.json via tools/emit_totals.resolve_bench_totals.
    - the driver deposits BENCH_r{N}.json AFTER the round's last commit, so
      the committed block may lawfully cite round N-1; anything older is
      stale and fails.
    """
    et = _emit_totals_module()
    block = _totals_block()
    m = re.search(r"`(BENCH_r(\d+)\.json)`", block)
    assert m, block
    cited_name, cited_round = m.group(1), int(m.group(2))
    artifacts = et.bench_artifacts()
    assert artifacts, "no BENCH_r*.json artifacts on disk"
    newest_round = artifacts[0][0]
    assert cited_round >= newest_round - 1, (
        f"block cites {cited_name} but round {newest_round} exists on disk"
    )
    path = os.path.join(ROOT, cited_name)
    assert os.path.exists(path), cited_name
    totals = et.resolve_bench_totals(path, json.load(open(path)))
    assert totals is not None, f"{cited_name} totals unresolvable"
    assert f"spark_vs_duckdb = {totals['spark_vs_duckdb']:.3f}" in block
    assert f"{totals['n_queries']} headline" in block


def test_resolve_bench_totals_handles_null_parsed(tmp_path):
    """Regression for the r8 red gate: a driver artifact with parsed:null
    must reconstruct from the sibling BENCH_detail.json, not crash."""
    et = _emit_totals_module()
    detail = {
        "queries_warm": {"q1": 2.0, "q2": 1.0},
        "duckdb": {"q1": 1.0, "q2": 1.0},
        "sf": 0.1,
    }
    (tmp_path / "BENCH_detail.json").write_text(json.dumps(detail))
    art = tmp_path / "BENCH_r99.json"
    art.write_text(json.dumps({"parsed": None, "tail": "...truncated", "sf": 0.1}))
    totals = et.resolve_bench_totals(str(art), json.loads(art.read_text()))
    assert totals is not None
    assert totals["n_queries"] == 2
    assert totals["spark_vs_duckdb"] == 1.5
    # and with no detail file at all, resolve returns None instead of raising
    art2 = tmp_path / "sub"
    art2.mkdir()
    p2 = art2 / "BENCH_r98.json"
    p2.write_text(json.dumps({"parsed": None}))
    assert et.resolve_bench_totals(str(p2), json.loads(p2.read_text())) is None
