"""Staged two-phase commit for persisted-index maintenance writes.

WHY.  The incremental maintenance ops (text in-place upsert/delete, LSM
segment writes + compaction, IVF upsert/delete) used to rewrite live
partition directories in place: a crash mid-sequence could leave a
partially-rewritten index — some bucket directories new, some old, stats
inconsistent with postings.  The fix is the standard two-phase layout
every table format (Delta/Iceberg/Hive-ACID) builds on:

1. **Stage**: every new or rewritten directory is written under
   ``<root>/.staging-<id>/`` — the live index is never touched while any
   Spark job can still fail.  Dot-prefixed directories are invisible to
   Spark's file index, so concurrent readers keep serving the old index.
2. **Promote**: a ``PLAN.json`` journal (the exact list of directory
   swaps) is written into the staging directory, then the swaps execute
   as pure filesystem renames — live dir → ``backup/``, staged dir →
   live — and the staging directory (plan + backups) is deleted.

Crash semantics: before the plan file exists nothing live has moved — the
old index serves bit-identical results and the orphaned staging directory
is garbage-collected by the next maintenance op.  After the plan exists,
the swap list is **roll-forward deterministic**: each swap is idempotent
(the rename pair's intermediate states are distinguishable from the
on-disk facts alone), so :func:`recover_staged` — called automatically at
the start of every maintenance op, or explicitly via
:func:`recover_index` — completes the promotion exactly.  The crash
window shrinks from "the whole multi-job write sequence" to "a rename
loop", and even that window is journaled and recoverable.

Single-writer is still assumed (as before); renames are metadata ops on
HDFS/ABFS-hierarchical namespaces.  On flat object stores a "rename" is a
copy — there, point the staging root at the same bucket and accept the
copy, or use a manifest-pointer layout (the documented alternative).

Reference parity note: the reference delegates durability to the Azure
Search service (`BatchingUploader.cs` retries failed batches); here the
engine OWNS the index files, so it must own commit atomicity too.
"""

from __future__ import annotations

import json
import uuid

from pyspark.sql import SparkSession


def _hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path) via the Hadoop FS API (any URI scheme) — local
    replica of ``ann_index._hadoop_fs`` to keep this module import-cycle
    free (ann_index itself stages through this module)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


STAGING_PREFIX = ".staging-"
PLAN_FILE = "PLAN.json"


def _jpath(spark: SparkSession, p: str):
    return spark._jvm.org.apache.hadoop.fs.Path(p)


class StagedCommit:
    """Collects staged writes + the swap list, then promotes atomically
    (journaled roll-forward renames).  Usage::

        commit = StagedCommit(spark, index_root)
        df.write.parquet(commit.stage("postings_new"))
        commit.swap("postings_new", "postings")      # replace whole dir
        commit.swap("p2/bucket=3", "postings/bucket=3")  # replace one part
        commit.remove("postings/bucket=7")           # delete a live dir
        commit.promote()
    """

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root.rstrip("/")
        self.stage_id = uuid.uuid4().hex[:12]
        self.stage_dir = f"{self.root}/{STAGING_PREFIX}{self.stage_id}"
        self.swaps: list[dict] = []

    def stage(self, name: str) -> str:
        """Absolute path under the staging dir to write ``name`` into."""
        return f"{self.stage_dir}/{name}"

    def swap(self, staged_rel: str, live_rel: str) -> None:
        """At promote time: live_rel (if present) moves to backup, then
        staged_rel moves into live_rel's place.  Paths are relative to the
        staging dir / index root respectively."""
        self.swaps.append({"staged": staged_rel, "live": live_rel})

    def remove(self, live_rel: str) -> None:
        """At promote time: live_rel (if present) moves to backup —
        i.e. the directory is deleted from the live layout."""
        self.swaps.append({"staged": None, "live": live_rel})

    def promote(self) -> None:
        """Write the journal, execute the swaps, drop the staging dir.
        A monkeypatched/aborted call before the journal write leaves the
        live index untouched (test-pinned)."""
        fs, _ = _hadoop_fs(self.spark, self.root)
        plan = {"root": self.root, "swaps": self.swaps}
        out = fs.create(_jpath(self.spark, f"{self.stage_dir}/{PLAN_FILE}"), True)
        out.write(bytearray(json.dumps(plan).encode()))
        out.close()
        _execute_plan(self.spark, self.root, self.stage_dir, plan)

    def abort(self) -> None:
        """Drop the staging dir without touching the live index."""
        fs, _ = _hadoop_fs(self.spark, self.root)
        p = _jpath(self.spark, self.stage_dir)
        if fs.exists(p):
            fs.delete(p, True)


def _execute_plan(spark: SparkSession, root: str, stage_dir: str, plan: dict) -> None:
    """Idempotent roll-forward of a promotion journal: apply every swap,
    then drop the staging dir (journal + backups)."""
    _apply_swaps(spark, root, stage_dir, plan["swaps"])
    fs, _ = _hadoop_fs(spark, root)
    sd = _jpath(spark, stage_dir)
    if fs.exists(sd):
        fs.delete(sd, True)


def _apply_swaps(spark: SparkSession, root: str, stage_dir: str, swaps: list) -> None:
    """The rename loop.  Each swap's state is fully determined by which of
    (staged, live, backup) exist:

    - replace: staged gone → already done; staged present + backup present
      → live already moved, finish the second rename; staged present +
      backup absent → not started, do both renames;
    - remove: live present → move it to backup; absent → done.
    """
    fs, _ = _hadoop_fs(spark, root)

    def j(p):
        return _jpath(spark, p)

    for i, sw in enumerate(swaps):
        live = j(f"{root}/{sw['live']}")
        backup = j(f"{stage_dir}/backup/{i}")
        if sw["staged"] is None:
            if fs.exists(live):
                fs.mkdirs(j(f"{stage_dir}/backup"))
                if not fs.rename(live, backup):
                    raise IOError(f"staged-commit: rename {live} -> {backup} failed")
            continue
        staged = j(f"{stage_dir}/{sw['staged']}")
        if not fs.exists(staged):
            continue  # this swap already completed in a prior attempt
        if fs.exists(live):
            if fs.exists(backup):
                # prior attempt crashed between the two renames of ANOTHER
                # ordering — cannot happen for this one (live was moved
                # before staged); treat a present live as not-yet-moved
                fs.delete(backup, True)
            fs.mkdirs(j(f"{stage_dir}/backup"))
            if not fs.rename(live, backup):
                raise IOError(f"staged-commit: rename {live} -> {backup} failed")
        # parent may not exist when the live dir is a partition of a
        # relation being created fresh
        fs.mkdirs(live.getParent())
        if not fs.rename(staged, live):
            raise IOError(f"staged-commit: rename {staged} -> {live} failed")


def recover_staged(spark: SparkSession, root: str) -> int:
    """Complete (roll forward) or discard any interrupted staged commit
    under ``root``.  Journaled stagings re-execute their swap list
    (idempotent); journal-less stagings (crash before promote started)
    are deleted — the live index was never touched.  Returns the number
    of staging directories resolved.  Called automatically by every
    maintenance op; also exposed as :func:`recover_index` for admins."""
    fs, hroot = _hadoop_fs(spark, root)
    if not fs.exists(hroot):
        return 0
    n = 0
    for st in fs.listStatus(hroot):
        name = st.getPath().getName()
        if not (st.isDirectory() and name.startswith(STAGING_PREFIX)):
            continue
        stage_dir = f"{root.rstrip('/')}/{name}"
        plan_p = _jpath(spark, f"{stage_dir}/{PLAN_FILE}")
        if fs.exists(plan_p):
            stream = fs.open(plan_p)
            try:
                data = bytes(
                    spark._jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
                )
            finally:
                stream.close()
            plan = json.loads(data.decode())
            _execute_plan(spark, root.rstrip("/"), stage_dir, plan)
        else:
            fs.delete(st.getPath(), True)
        n += 1
    return n


def recover_index(spark: SparkSession, root: str) -> int:
    """Public entry point: finish or discard interrupted maintenance
    commits on a persisted index (text or IVF)."""
    return recover_staged(spark, root)
