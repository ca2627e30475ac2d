"""Replica-scaled warehouse builder for scaling benchmarks.

`bench.py` measures each headline query at the driver-provided base scale
AND at a replica-scaled copy (default 10x) to demonstrate near-linear
scaling empirically — the plan audit says a query's shape survives scale;
this measures it on this machine.

Scaling by replication is only honest if the replicas behave like NEW data,
not like duplicates:

- every entity key is offset per copy (`key + copy * KEY_OFFSET`) with the
  SAME offset applied to both sides of every FK edge, so joins stay
  consistent and entity counts grow linearly;
- document text gets a per-copy suffix, so exact/near-dup families don't
  see quadratic duplicate groups that real data growth would never produce
  (near-dup candidate counts on replicated text grow as copies^2 per
  bucket — an artifact of the synthesis, not of the plans);
- embedding vectors are circularly ROTATED by `copy` positions (an
  isometry: norms and within-copy geometry preserved exactly, but sign
  patterns, LSH buckets, BQ/PQ codes and centroid assignments all differ
  per copy) — so distinct codes grow with the data and the ANN scaling
  rows measure honest growth, not ten identical code-sets
  (VERDICT-r8 item 4).

The build is a single declarative plan per table: scan once, cross-join a
`copies`-row broadcast range, offset the keys — no shuffle, parallel write.
A marker file records (src, copies); matching markers skip the rebuild so
the cost is paid once per round, not per bench run.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import TABLES, load_table

KEY_OFFSET = 100_000_000

# key columns to offset per copy, per table (FK edges share offsets)
_KEY_COLS: dict[str, tuple[str, ...]] = {
    "region": (),
    "nation": (),
    "customer": ("c_custkey",),
    "supplier": ("s_suppkey",),
    "part": ("p_partkey",),
    "orders": ("o_orderkey", "o_custkey"),
    "lineitem": ("l_orderkey", "l_partkey", "l_suppkey"),
    "events": ("event_id", "user_id"),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}

# dimension tables copied once, not replicated (every copy joins the same
# nations/regions — exactly how a real warehouse scales facts, not dims)
_SHARED_DIMS = ("region", "nation")


def _marker(out_dir: str) -> str:
    return os.path.join(out_dir, "_REPLICA_BUILT.json")


def build_replica_warehouse(
    spark: SparkSession, src_dir: str, out_dir: str, copies: int = 10,
    tables: tuple[str, ...] | None = None,
) -> str:
    """Build (or reuse) a `copies`-x replica of every table in `src_dir`
    under `out_dir`. Returns `out_dir`, readable via `io.load_table`.
    `tables` restricts the build to a subset (the beyond-10x probe
    replicates only the tables its queries scan — at 100x the unused
    fact tables dominate the build cost); None = all of TABLES."""
    # layout bumps when the synthesis changes (r9: embedding rotation) so
    # stale replicas rebuild instead of silently serving the old shape
    want = {"src": os.path.abspath(src_dir), "copies": copies, "layout": 2}
    if tables is not None:
        want["tables"] = sorted(tables)
    try:
        with open(_marker(out_dir)) as fh:
            if json.load(fh) == want:
                return out_dir
    except (OSError, ValueError):
        pass
    os.makedirs(out_dir, exist_ok=True)
    idx = F.broadcast(
        spark.range(copies).select(F.col("id").cast("long").alias("__copy"))
    )
    for name in TABLES if tables is None else tables:
        df = load_table(spark, src_dir, name)
        if name in _SHARED_DIMS:
            out = df
        else:
            out = df.crossJoin(idx)
            for key in _KEY_COLS[name]:
                out = out.withColumn(key, F.col(key) + F.col("__copy") * KEY_OFFSET)
            if name == "embeddings":
                # per-copy circular rotation (see module docstring): copy 0
                # stays the identity so the query panel (vec_id < 10) and
                # the deterministic centroid/codebook rows are untouched
                out = out.withColumn(
                    "embedding",
                    F.expr(
                        "transform(sequence(1, size(embedding)), i -> "
                        "element_at(embedding, "
                        "((i - 1 + CAST(__copy AS INT)) % size(embedding)) + 1))"
                    ),
                )
            if name == "documents":
                # per-copy text suffix: replicas are near-dups of each other
                # otherwise, and near-dup candidate generation would grow
                # quadratically by construction (see module docstring)
                out = out.withColumn(
                    "text",
                    F.when(
                        F.col("__copy") == 0, F.col("text")
                    ).otherwise(F.concat(F.col("text"), F.lit(" rep"), F.col("__copy"))),
                ).withColumn("n_chars", F.length("text").cast("long"))
            out = out.drop("__copy")
        out.write.mode("overwrite").parquet(os.path.join(out_dir, f"{name}.parquet"))
    with open(_marker(out_dir), "w") as fh:
        json.dump(want, fh)
    return out_dir
