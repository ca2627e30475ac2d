"""Slowly-changing-dimension (type 2) merge.

The reference rebuilds its dimension-ish tables destructively on every run
(SNK3 full reload; see SURVEY §2.1) — correct for its ~2k-row tables, but a
100 TB warehouse keeps dimension HISTORY instead: each business key carries
versioned rows with [valid_from, valid_to) validity and an is_current flag,
and a daily update batch closes changed versions and opens new ones. This
module is that upgrade path, expressed as one equi-join + three
projections + union (a single shuffle on the business key; the update batch
is broadcast — it is a daily delta, orders of magnitude smaller than the
dimension).

Change detection is null-safe (IS DISTINCT FROM semantics): an update row
whose attributes all equal the current version is a no-op and must NOT open
a new version — the merge is idempotent under redelivered batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table

DIM_BASE_DATE = "2025-01-01"
UPDATE_EFF_DATE = "2025-06-01"


def scd2_merge(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    attrs: list[str],
    eff_col: str = "eff_date",
) -> DataFrame:
    """Apply one SCD2 update batch to the current dimension snapshot.

    `dim` columns: key, *attrs, valid_from, valid_to, is_current.
    `updates` columns: key, *attrs, eff_col.

    Returns the merged dimension: unchanged rows pass through, changed keys
    get their current row closed (valid_to = eff date, is_current = false)
    plus a new open version. One equi-join on the key (updates broadcast),
    no window functions — the plan a MERGE statement would compile to.

    Only the CURRENT version of a key participates in change detection:
    `dim` is the full dimension INCLUDING closed history rows, and a
    closed version whose attributes differ from today's update is just
    history, not a change — without the is_current gate a second update
    batch would rewrite closed rows' valid_to and open one duplicate
    version per historical row (caught by the r12 multi-batch
    differential fuzz). Updates for keys absent from `dim` are ignored
    (this is an update merge, not an insert path — mirror of the
    registered oracle's semantics)."""
    changed_any = None
    for a in attrs:
        neq = ~F.col(f"d.{a}").eqNullSafe(F.col(f"u.{a}"))
        changed_any = neq if changed_any is None else (changed_any | neq)

    d = dim.alias("d")
    u = F.broadcast(updates).alias("u")
    j = d.join(u, on=F.col(f"d.{key}") == F.col(f"u.{key}"), how="left")

    # current rows: closed out if a genuinely-changed update arrived
    is_changed = (
        F.col(f"u.{key}").isNotNull() & changed_any & F.col("d.is_current")
    )
    current = j.select(
        F.col(f"d.{key}").alias(key),
        *[F.col(f"d.{a}").alias(a) for a in attrs],
        F.col("d.valid_from").alias("valid_from"),
        F.when(is_changed, F.col(f"u.{eff_col}"))
        .otherwise(F.col("d.valid_to"))
        .alias("valid_to"),
        F.when(is_changed, F.lit(False)).otherwise(F.col("d.is_current")).alias("is_current"),
    )
    # new versions for changed keys only
    opened = (
        j.filter(is_changed)
        .select(
            F.col(f"u.{key}").alias(key),
            *[F.col(f"u.{a}").alias(a) for a in attrs],
            F.col(f"u.{eff_col}").alias("valid_from"),
            F.lit(None).cast("date").alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
    )
    return current.unionByName(opened)


CUSTOMER_ATTRS = ["c_name", "c_mktsegment", "c_acctbal"]


def scd2_customer_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 over the customer dimension with a deterministic update batch
    derived from the table itself: keys ≡ 3 (mod 7) change segment and
    balance (must version), keys ≡ 5 (mod 7) arrive with identical
    attributes (must no-op — the idempotence case)."""
    cust = load_table(spark, sf_dir, "customer")
    dim = cust.select(
        "c_custkey",
        *CUSTOMER_ATTRS,
        F.lit(DIM_BASE_DATE).cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    mod7 = F.col("c_custkey") % 7
    updates = (
        cust.filter(mod7.isin(3, 5))
        .select(
            "c_custkey",
            "c_name",
            F.when(mod7 == 3, F.lit("MOVED")).otherwise(F.col("c_mktsegment")).alias(
                "c_mktsegment"
            ),
            F.when(mod7 == 3, F.col("c_acctbal") + 100.0)
            .otherwise(F.col("c_acctbal"))
            .alias("c_acctbal"),
            F.lit(UPDATE_EFF_DATE).cast("date").alias("eff_date"),
        )
    )
    return scd2_merge(dim, updates, "c_custkey", CUSTOMER_ATTRS)
