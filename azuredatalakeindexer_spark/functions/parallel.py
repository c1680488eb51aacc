"""Concurrent independent Spark actions from the driver.

A maintenance op often ends with several INDEPENDENT staged writes
(segment postings / doclens / docvals), each a small action whose cost at
batch scale is dominated by scheduling + the dynamic-partition commit
protocol (driver-side directory renames), not compute.  Running them
sequentially stacks those latencies; submitting them from separate
driver threads lets the scheduler overlap them — Spark explicitly
supports concurrent job submission from one session, and on a real
cluster the same shape keeps independent stages from convoying behind
each other.

Use for INDEPENDENT actions only (no thunk may consume another's
output), and keep the thunk count small (this is latency overlap, not a
work queue).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor


def run_concurrent(*thunks) -> list:
    """Run the given zero-arg callables concurrently, one driver thread
    each; re-raises the first failure after all complete.  Returns their
    results in argument order."""
    thunks = [t for t in thunks if t is not None]
    if len(thunks) <= 1:
        return [t() for t in thunks]
    with ThreadPoolExecutor(max_workers=len(thunks)) as pool:
        futures = [pool.submit(t) for t in thunks]
        return [f.result() for f in futures]
