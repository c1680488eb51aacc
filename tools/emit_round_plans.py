"""Capture EVERY executed physical plan of one registered query.

Runs ``queries()[name]`` from the given repo root (a git worktree of a past
commit, or the live tree) against the given SF dir, then dumps the SQL status
store: one block per Spark SQL execution — its job description, wall duration,
and the full formatted physical plan.  This is the round's before/after plan
artifact for lifecycle entries whose registered DataFrame is only a result
scan: the build/maintenance/serving jobs all appear here, so job-count and
plan-shape claims (overlap layering, checkpoint sources, pruned scans) are
checkable without running Spark.

Usage:
    python tools/emit_round_plans.py <repo_root> <sf_dir> <out_path> <query>

Run ONE tree per process (the package import is cached).  Durations are
informative only — cross-tree timing evidence lives in the A/B protocol
(tools/ab_time.py), not here.
"""

from __future__ import annotations

import sys
import time


def main() -> None:
    root, sf_dir, out_path, name = sys.argv[1:5]
    sys.path.insert(0, root)
    import __spark_entry__ as entrymod
    from azuredatalakeindexer_spark.session import get_spark

    spark = get_spark("round-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    # warm the fixture tables + Arrow worker pool so one-off session costs
    # don't appear as executions of the audited query
    from azuredatalakeindexer_spark.sources.fixtures import TABLES, load_table

    for t in TABLES:
        load_table(spark, sf_dir, t).count()
    store = spark._jsparkSession.sharedState().statusStore()
    skip = store.executionsCount()

    t0 = time.time()
    qs[name](spark, sf_dir).count()
    wall = time.time() - t0

    execs = store.executionsList()
    blocks = []
    n = execs.size()
    t_base = None
    for i in range(n):
        e = execs.apply(i)
        if e.executionId() < skip:
            continue
        if t_base is None:
            t_base = e.submissionTime()
        sub = (e.submissionTime() - t_base) / 1000.0
        dur = "?"
        if e.completionTime().isDefined():
            dur = "%.3f s" % (
                (e.completionTime().get().getTime() - e.submissionTime()) / 1000.0
            )
        # submitted-at offsets make run_concurrent overlap visible: layered
        # executions share a submission window instead of chaining
        blocks.append(
            "=" * 72
            + f"\nexecution {e.executionId()}  [submitted +{sub:.3f} s, "
            + f"ran {dur}]  {e.description()}\n"
            + "=" * 72
            + "\n"
            + e.physicalPlanDescription()
        )
    hdr = (
        f"# query: {name}\n# repo_root: {root}\n# sf_dir: {sf_dir}\n"
        f"# wall (this capture run, informative only): {wall:.3f} s\n"
        f"# spark SQL executions in the lifecycle: {len(blocks)}\n\n"
    )
    with open(out_path, "w") as fh:
        fh.write(hdr + "\n".join(blocks) + "\n")
    print(f"wrote {out_path}: {len(blocks)} executions, wall {wall:.2f}s")
    spark.stop()


if __name__ == "__main__":
    main()
