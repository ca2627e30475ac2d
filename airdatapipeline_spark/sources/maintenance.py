"""Table maintenance: small-file compaction for parquet sinks.

The incremental pattern (SNK2 idempotent appends, streaming foreachBatch
sinks) accretes one small file per micro-run; at 100 TB a table served by
millions of KB-sized files is dominated by open/footer overhead and driver
file-listing time. Periodic compaction rewrites each partition into
~target-sized files — the engine-level equivalent of Delta OPTIMIZE /
Iceberg rewrite_data_files, expressed with nothing but repartition + a
staged directory swap.

Reference analogue: none (Postgres autovacuums); this is part of the
owning-your-own-table-format cost the parquet medallion design takes on.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

TARGET_FILE_BYTES = 256 * 1024 * 1024  # cluster default; tests pass smaller


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files if f != "_SUCCESS")
    return total


def data_file_count(path: str) -> int:
    n = 0
    for _root, _dirs, files in os.walk(path):
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n


def _ceil_div(a: int, b: int) -> int:
    return max(1, -(-a // b))


def _count_rows(spark: SparkSession, path: str) -> int:
    """Footer-only row count (no data pages read) — cheap even at 100 TB."""
    return spark.read.parquet(path).count()


def recover_compaction(path: str) -> bool:
    """Heal an interrupted swap: if a previous compaction crashed between
    the two renames, the live path is missing and the data sits intact in
    `<path>.__old__` — restore it. Returns True if a restore happened.
    Idempotent; safe to call before every compaction and from any reader
    that finds the path missing."""
    path = path.rstrip("/")
    old = path + ".__old__"
    if not os.path.exists(path) and os.path.exists(old):
        os.rename(old, path)
        return True
    return False


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = TARGET_FILE_BYTES,
    partition_col: str | None = None,
    verify_rows: bool = True,
) -> dict:
    """Rewrite a parquet directory into ~target-sized files. With
    `partition_col`, each `col=value` directory is split independently into
    ceil(its_bytes / target) files (a skewed 10 GB partition gets 40 files
    at the 256 MB default while small partitions coalesce to one), and the
    partitioning scheme is preserved.

    Durability contract: the rewrite goes to a sibling staging dir and is
    verified (_SUCCESS) before any mutation of the live path. The swap is
    two renames with the previous file set retained at `<path>.__old__`
    until the new set is live; a crash between the renames is healed by
    `recover_compaction` (called automatically on the next run), and a
    failure of the second rename rolls the first back in-process. Readers
    racing the swap can transiently see a missing path — schedule
    compaction off-peak or take a table lock; true atomic swaps need a
    metadata layer (Delta/Iceberg), which is exactly what this helper's
    scope deliberately stops short of.

    With `verify_rows` (default), the staged rewrite is re-read and its
    row count compared to the source's BEFORE any mutation of the live
    path; a mismatch aborts with the live table untouched. Both counts
    are parquet-footer scans (no data read), so the check stays cheap at
    100 TB — it is the self-verification that makes a lost or duplicated
    task output impossible to swap in silently.

    Local-filesystem implementation (os.walk / rename); on HDFS/S3 the
    same logic runs through the Hadoop FileSystem API."""
    path = path.rstrip("/")
    recover_compaction(path)
    before_files = data_file_count(path)
    staging = path + ".__compacting__"
    shutil.rmtree(staging, ignore_errors=True)

    df = spark.read.parquet(path)
    before_rows = _count_rows(spark, path) if verify_rows else None
    if partition_col is not None:
        # per-partition-value byte budgets from the directory layout: a
        # plain repartition(n, partition_col) would hash every value into
        # ONE task (one output file per dir regardless of size), so spread
        # each value over its own ceil(bytes/target) splits
        k_map = {}
        for d in os.listdir(path):
            if d.startswith(f"{partition_col}="):
                v = d.split("=", 1)[1]
                k_map[v] = _ceil_div(_dir_bytes(os.path.join(path, d)), target_file_bytes)
        mapping = F.create_map(
            *[lit for v, k in sorted(k_map.items()) for lit in (F.lit(v), F.lit(k))]
        )
        k_col = F.element_at(mapping, F.col(partition_col).cast("string"))
        split = F.floor(F.rand(20260813) * k_col).cast("int")
        (
            df.withColumn("__split", split)
            .repartition(sum(k_map.values()), F.col(partition_col), F.col("__split"))
            .drop("__split")
            .write.mode("overwrite")
            .partitionBy(partition_col)
            .parquet(staging)
        )
    else:
        n_out = _ceil_div(_dir_bytes(path), target_file_bytes)
        df.repartition(n_out).write.mode("overwrite").parquet(staging)

    if not os.path.exists(os.path.join(staging, "_SUCCESS")):
        raise RuntimeError(f"compaction write to {staging} did not commit")
    if verify_rows:
        after_rows = _count_rows(spark, staging)
        if after_rows != before_rows:
            shutil.rmtree(staging, ignore_errors=True)
            raise RuntimeError(
                f"compaction of {path} aborted before swap: staged rewrite has "
                f"{after_rows} rows, source has {before_rows}; live table untouched"
            )
    old = path + ".__old__"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(path, old)
    try:
        os.rename(staging, path)
    except BaseException:
        os.rename(old, path)  # roll back rename #1; live table untouched
        raise
    shutil.rmtree(old)
    return {
        "path": path,
        "files_before": before_files,
        "files_after": data_file_count(path),
        "target_file_bytes": target_file_bytes,
    }


def delete_keys_partitioned(
    spark: SparkSession,
    path: str,
    part_col: str,
    key_col: str,
    keys: list,
    key_to_part,
) -> list:
    """Surgical key deletion (right-to-be-forgotten) on a table
    partitioned by a key-derived column: compute the affected partition
    values with `key_to_part` (the same function that bucketed the
    writes), rewrite ONLY those partitions without the keys, and swap the
    new directories in. Every other partition's files are untouched — the
    rewrite cost is O(partitions containing the keys), not O(table),
    which is what makes per-user deletes feasible at 100 TB. Returns the
    affected partition values.

    The rewrite goes through a staging directory (never a read-then-
    overwrite of the same path) because of the emptied-partition edge
    case: a partition whose rows are ALL deleted produces no output rows,
    and a dynamic partition overwrite would silently leave its stale
    directory alive — the staged swap removes it instead (regression-
    tested). Swap order is crash-safe the same way compact_parquet is:
    old dirs are parked at `<path>.__del_old__` until every new dir is
    live, so an interrupted run can be healed by moving parked dirs back;
    on HDFS/S3 the same sequence runs through the Hadoop FileSystem API.
    The same shape upgrades to Delta/Iceberg DELETE with file-level
    pruning; on plain parquet the partition is the pruning unit, so the
    bucketing granularity bounds rewrite amplification."""
    parts = sorted({key_to_part(k) for k in keys})
    path = path.rstrip("/")
    staging = path + ".__deleting__"
    trash = path + ".__del_old__"
    shutil.rmtree(staging, ignore_errors=True)
    shutil.rmtree(trash, ignore_errors=True)

    df = spark.read.parquet(path)
    cleaned = df.filter(F.col(part_col).isin(parts)).filter(
        ~F.col(key_col).isin(keys)
    )
    cleaned.write.mode("overwrite").partitionBy(part_col).parquet(staging)
    if not os.path.exists(os.path.join(staging, "_SUCCESS")):
        raise RuntimeError(f"staged delete rewrite to {staging} did not commit")

    os.makedirs(trash)
    swaps = []
    for v in parts:
        old_dir = os.path.join(path, f"{part_col}={v}")
        if os.path.exists(old_dir):
            parked = os.path.join(trash, f"{part_col}={v}")
            os.rename(old_dir, parked)
            swaps.append((old_dir, parked))
    for v in parts:
        new_dir = os.path.join(staging, f"{part_col}={v}")
        if os.path.exists(new_dir):
            os.rename(new_dir, os.path.join(path, f"{part_col}={v}"))
        # a fully-deleted partition has no staged dir: it stays removed
    shutil.rmtree(staging, ignore_errors=True)
    shutil.rmtree(trash, ignore_errors=True)
    return parts
