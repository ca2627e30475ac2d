"""Table maintenance: small-file compaction for parquet sinks.

The incremental pattern (SNK2 idempotent appends, streaming foreachBatch
sinks) accretes one small file per micro-run; at 100 TB a table served by
millions of KB-sized files is dominated by open/footer overhead and driver
file-listing time. Periodic compaction rewrites each partition into
~target-sized files — the engine-level equivalent of Delta OPTIMIZE /
Iceberg rewrite_data_files, expressed with nothing but repartition + an
atomic directory swap.

Reference analogue: none (Postgres autovacuums); this is part of the
owning-your-own-table-format cost the parquet medallion design takes on.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession

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


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = TARGET_FILE_BYTES,
    partition_col: str | None = None,
) -> dict:
    """Rewrite a parquet directory into ceil(bytes/target) files (per
    partition directory when `partition_col` is given, preserving the
    partitioning scheme). The rewrite goes to a sibling staging dir first
    and swaps in only after a successful _SUCCESS commit, so a failed
    compaction never harms the live table. Readers racing the swap see
    either the old or the new file set — the same contract as Spark's own
    dynamic partition overwrite.

    Local-filesystem implementation (os.walk / rename); on HDFS/S3 the same
    logic runs through the Hadoop FileSystem API — only `_dir_bytes` and
    the swap change, the repartition-write core is identical."""
    before_files = data_file_count(path)
    n_out = max(1, -(-_dir_bytes(path) // target_file_bytes))  # ceil div
    staging = path.rstrip("/") + ".__compacting__"
    shutil.rmtree(staging, ignore_errors=True)

    df = spark.read.parquet(path)
    if partition_col is not None:
        # spread within each partition value; partitionBy re-splits the dirs
        (
            df.repartition(n_out, partition_col)
            .write.mode("overwrite")
            .partitionBy(partition_col)
            .parquet(staging)
        )
    else:
        df.repartition(n_out).write.mode("overwrite").parquet(staging)

    if not os.path.exists(os.path.join(staging, "_SUCCESS")):
        raise RuntimeError(f"compaction write to {staging} did not commit")
    old = path.rstrip("/") + ".__old__"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(path, old)
    os.rename(staging, path)
    shutil.rmtree(old)
    return {
        "path": path,
        "files_before": before_files,
        "files_after": data_file_count(path),
        "target_file_bytes": target_file_bytes,
    }
