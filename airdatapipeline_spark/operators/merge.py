"""Generalized MERGE INTO on plain parquet.

The repo's sink patterns are all special cases of SQL MERGE: SNK2's
idempotent append (WHEN NOT MATCHED THEN INSERT, enrichment.py:263), the
SCD2 dimension merge (close + reopen, scd.py:29), and incremental Gold
maintenance (partition-scoped recompute, incremental.py). `merge_into`
is the general form — one FULL OUTER equi-join on the merge keys with
presence flags, which is exactly the physical plan a warehouse MERGE
statement compiles to:

- WHEN MATCHED THEN UPDATE  → take the source row's values
- WHEN MATCHED AND <cond> THEN DELETE → drop the row
- WHEN NOT MATCHED THEN INSERT → keep the source-only row
- (not matched by source → target row passes through unchanged)

Scale posture: the single shuffle is the key join; at 100 TB you never
merge against the whole table — restrict the target to the partitions the
source touches (the incremental.py affected-dates pattern) and rewrite
only those with dynamic partition overwrite. On Delta/Iceberg the same
call becomes the engine's MERGE with file-level skipping; the semantics
here are the oracle for that swap.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ColMap = dict[str, Column]


def merge_into(
    target: DataFrame,
    source: DataFrame,
    on: list[str],
    when_matched: str = "update",  # "update" | "ignore"
    matched_delete: Callable[[ColMap, ColMap], Column] | None = None,
    insert_not_matched: bool = True,
) -> DataFrame:
    """Merge `source` into `target` on key columns `on`; both must share
    the same schema. `matched_delete(t_cols, s_cols)` — an optional
    predicate over the target/source column namespaces — deletes matched
    rows it selects (evaluated before the update). Keys must be unique on
    both sides (as MERGE requires; a multi-match is nondeterministic in
    every engine)."""
    if set(target.columns) != set(source.columns):
        raise ValueError("target and source must share one schema")
    if when_matched not in ("update", "ignore"):
        raise ValueError(f"unsupported when_matched: {when_matched!r}")
    data_cols = [c for c in target.columns if c not in on]

    s_ren = source
    for c in data_cols:
        s_ren = s_ren.withColumnRenamed(c, f"__s_{c}")
    s_ren = s_ren.withColumn("__s_present", F.lit(1))
    t = target.withColumn("__t_present", F.lit(1))
    j = t.join(s_ren, on=on, how="full_outer")

    t_cols: ColMap = {c: F.col(c) for c in data_cols}
    s_cols: ColMap = {c: F.col(f"__s_{c}") for c in data_cols}
    matched = F.col("__t_present").isNotNull() & F.col("__s_present").isNotNull()
    t_only = F.col("__s_present").isNull()
    s_only = F.col("__t_present").isNull()

    keep = t_only
    if matched_delete is not None:
        keep = keep | (matched & ~matched_delete(t_cols, s_cols))
    else:
        keep = keep | matched
    if insert_not_matched:
        keep = keep | s_only

    take_source = s_only if when_matched == "ignore" else (s_only | matched)
    out = [
        F.when(take_source, s_cols[c]).otherwise(t_cols[c]).alias(c)
        for c in data_cols
    ]
    return j.filter(keep).select(*on, *out)


def apply_changes(
    snapshot: DataFrame,
    changes: DataFrame,
    on: list[str],
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """Apply an ordered CDC changelog (Debezium-style I/U/D rows with a
    per-key sequence) to a snapshot — the APPLY CHANGES INTO pattern.

    Resolution is latest-wins per key: one window over (key ORDER BY seq
    DESC) picks each key's final change; a final 'D' deletes the key,
    'I'/'U' upserts the row via `merge_into`. Cost: one shuffle for the
    window (on the same key the merge join shuffles on) + the merge's
    full-outer join. At scale the changelog is tiny relative to the
    snapshot and the merge is partition-scoped, exactly as with
    merge_into.

    Duplicate sequence numbers (r12 fuzz hardening): EXACT duplicate rows
    are a redelivered batch — deduplicated up front, so redelivery is a
    no-op by construction. Two DIFFERENT changes sharing one (key, seq)
    are changelog corruption (no latest-wins order exists), and the old
    row_number tie-break silently picked a partition-order-dependent
    winner; now the winning row raises at execution time instead
    (raise_error on a top-of-key seq tie, checked via lead() over the
    SAME window spec as the row_number). Honest cost accounting (visible
    in PLANS.md's snk_cdc_apply_changes delta): the dropDuplicates is
    one extra CHANGELOG-sized all-columns exchange, and adding lead()
    forfeits Spark's WindowGroupLimit top-1 pruning on the window sort —
    both bounded by the changelog, which at scale is orders of magnitude
    smaller than the snapshot the subsequent merge joins. Ties below the
    winning sequence never affect the result and are not policed."""
    data_cols = [c for c in snapshot.columns if c not in on]
    from pyspark.sql import Window

    w = Window.partitionBy(*on).orderBy(F.desc(seq_col))
    latest = (
        changes.dropDuplicates()
        .withColumn("__rn", F.row_number().over(w))
        .withColumn("__next_seq", F.lead(seq_col).over(w))
        .filter(F.col("__rn") == 1)
        .withColumn(
            op_col,
            F.when(
                F.col("__next_seq").eqNullSafe(F.col(seq_col)),
                F.expr(
                    "raise_error('apply_changes: two different changes "
                    "share one (key, seq) — changelog is corrupt')"
                ),
            ).otherwise(F.col(op_col)),
        )
        .drop("__rn", "__next_seq")
    )
    upserts = latest.filter(F.col(op_col) != "D").select(*on, *data_cols)
    deletes = latest.filter(F.col(op_col) == "D").select(*on)
    merged = merge_into(snapshot, upserts, on=on)
    return merged.join(deletes, on=on, how="left_anti")


def snapshot_diff(
    old: DataFrame, new: DataFrame, on: list[str]
) -> DataFrame:
    """Reconcile two snapshots of one table: per key, classify
    added / removed / changed / unchanged — the diff tool for pipeline-run
    regression checks ("what did this deploy change?") and for validating
    merges (diff(old, merge(old, src)) must equal src's effects, which is
    exactly how the registry scenario checks this operator). One full-outer
    key join; change detection is null-safe equality over the non-key
    columns (<=> semantics, so NULL→NULL is unchanged and NULL→value is
    changed)."""
    data_cols = [c for c in old.columns if c not in on]
    if set(old.columns) != set(new.columns):
        raise ValueError("snapshots must share one schema")
    o = old.withColumn("__o", F.lit(1))
    n = new
    for c in data_cols:
        n = n.withColumnRenamed(c, f"__n_{c}")
    n = n.withColumn("__n", F.lit(1))
    j = o.join(n, on=on, how="full_outer")
    same = F.lit(True)
    for c in data_cols:
        same = same & F.col(c).eqNullSafe(F.col(f"__n_{c}"))
    change = (
        F.when(F.col("__o").isNull(), F.lit("added"))
        .when(F.col("__n").isNull(), F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(*on, change.alias("change"))
