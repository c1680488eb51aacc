"""A/B timing harness: time named registry queries from a given repo root.

Usage:
    python tools/ab_time.py <repo_root> <sf_dir> <reps> <query> [query ...]

Loads ``__spark_entry__`` from ``repo_root`` (a git worktree of a past
commit, or the live tree) and times each named query ``reps`` times,
printing one JSON line with all raw timings.  Run ONE variant per process —
the package import is cached (bench-discipline note), and never run two
variants concurrently (contention invalidates the numbers).
"""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    root, sf_dir, reps = sys.argv[1], sys.argv[2], int(sys.argv[3])
    names = sys.argv[4:]
    sys.path.insert(0, root)
    import __spark_entry__ as entrymod
    from azuredatalakeindexer_spark.session import get_spark

    spark = get_spark("ab_time")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    from azuredatalakeindexer_spark.sources.fixtures import TABLES, load_table

    for t in TABLES:
        load_table(spark, sf_dir, t).count()
    spark.range(64).repartition(32).mapInPandas(lambda it: it, "id long").count()

    release = getattr(sys.modules.get("bench"), "_release_session_state", None)
    if release is None:
        try:
            import bench  # noqa: F401  (same root as the entry module)

            release = bench._release_session_state
        except Exception:
            release = lambda s: None  # noqa: E731

    out: dict[str, list[float]] = {}
    for name in names:
        fn = qs[name]
        runs = []
        for _ in range(reps):
            t0 = time.time()
            fn(spark, sf_dir).count()
            runs.append(round(time.time() - t0, 3))
            release(spark)
        out[name] = runs
    print(json.dumps({"root": root, "sf": sf_dir, "runs": out}))


if __name__ == "__main__":
    main()
