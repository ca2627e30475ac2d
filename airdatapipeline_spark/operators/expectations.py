"""Declarative data-quality expectations engine.

Generalizes the reference's hand-rolled quality gates (dbt-style tests and
the DAG's row-count/validation checks, SURVEY.md §2.12) into a rule set
evaluated engine-side:

- `not_null`, `unique`, `accepted_values`, `in_range` — SCALAR rules: all
  rules for a table fold into ONE aggregate over ONE scan (each rule is a
  conditional-count expression), so a 100-rule suite on a 100 TB table
  costs a single pass, not 100.
- `foreign_key` — referential integrity as a LEFT ANTI join against the
  referenced key column; the referenced side is key-only (column-pruned)
  and broadcast when small.

Output: one row per rule (rule_id, kind, table, col_name, n_violations,
passed) — the shape a scheduler gates on and a dashboard trends. The
DuckDB oracle recomputes every count independently.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table


@dataclass(frozen=True)
class Expectation:
    rule_id: str
    kind: str  # not_null | unique | accepted_values | in_range | foreign_key
    table: str
    column: str
    values: tuple = field(default_factory=tuple)
    lo: float | None = None
    hi: float | None = None
    ref_table: str | None = None
    ref_column: str | None = None


def _scalar_expr(e: Expectation) -> Column:
    c = F.col(e.column)
    if e.kind == "not_null":
        return F.count(F.when(c.isNull(), 1)).cast("long")
    if e.kind == "unique":
        return (F.count(e.column) - F.count_distinct(c)).cast("long")
    if e.kind == "accepted_values":
        return F.count(F.when(c.isNotNull() & ~c.isin(*e.values), 1)).cast("long")
    if e.kind == "in_range":
        cond = F.lit(False)
        if e.lo is not None:
            cond = cond | (c < F.lit(e.lo))
        if e.hi is not None:
            cond = cond | (c > F.lit(e.hi))
        return F.count(F.when(c.isNotNull() & cond, 1)).cast("long")
    raise ValueError(f"not a scalar rule kind: {e.kind}")


def _result_row(e: Expectation, n: Column) -> list[Column]:
    return [
        F.lit(e.rule_id).alias("rule_id"),
        F.lit(e.kind).alias("kind"),
        F.lit(e.table).alias("table_name"),
        F.lit(e.column).alias("col_name"),
        n.alias("n_violations"),
        (n == 0).alias("passed"),
    ]


def evaluate_expectations(
    tables: dict[str, DataFrame], rules: list[Expectation]
) -> DataFrame:
    """Evaluate `rules` against `tables`. Scalar rules are grouped per
    table into a single aggregate (one scan per table regardless of rule
    count); foreign-key rules each add one anti-join whose referenced side
    is column-pruned to the key. Returns one row per rule."""
    pieces: list[DataFrame] = []
    for tname, df in tables.items():
        scalars = [
            r for r in rules if r.table == tname and r.kind != "foreign_key"
        ]
        if scalars:
            agg = df.agg(
                *[_scalar_expr(r).alias(f"v{i}") for i, r in enumerate(scalars)]
            )
            for i, r in enumerate(scalars):
                pieces.append(agg.select(*_result_row(r, F.col(f"v{i}"))))
    for r in rules:
        if r.kind != "foreign_key":
            continue
        child = tables[r.table].select(F.col(r.column).alias("__fk"))
        parent = tables[r.ref_table].select(
            F.col(r.ref_column).alias("__fk")
        ).distinct()
        orphans = child.filter(F.col("__fk").isNotNull()).join(
            parent, on="__fk", how="left_anti"
        )
        n = orphans.agg(F.count("*").cast("long").alias("n")).select("n")
        pieces.append(n.select(*_result_row(r, F.col("n"))))
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out


# --- the registered TPC-H expectation suite ---------------------------------

TPCH_SUITE: list[Expectation] = [
    Expectation("orders_key_not_null", "not_null", "orders", "o_orderkey"),
    Expectation("orders_key_unique", "unique", "orders", "o_orderkey"),
    # deliberately stricter than the data ('P' exists): a FAILING rule —
    # the report must count violations, not just flag booleans
    Expectation(
        "orders_status_domain", "accepted_values", "orders", "o_orderstatus",
        values=("O", "F"),
    ),
    Expectation("orders_price_positive", "in_range", "orders", "o_totalprice", lo=0.0),
    Expectation(
        "orders_customer_fk", "foreign_key", "orders", "o_custkey",
        ref_table="customer", ref_column="c_custkey",
    ),
    Expectation("lineitem_qty_range", "in_range", "lineitem", "l_quantity", lo=1.0, hi=50.0),
    # stricter than the generator's 0..0.10 — second failing rule
    Expectation("lineitem_discount_cap", "in_range", "lineitem", "l_discount", lo=0.0, hi=0.08),
    Expectation(
        "lineitem_order_fk", "foreign_key", "lineitem", "l_orderkey",
        ref_table="orders", ref_column="o_orderkey",
    ),
    Expectation("customer_key_unique", "unique", "customer", "c_custkey"),
    Expectation("customer_nation_not_null", "not_null", "customer", "c_nationkey"),
]


def tpch_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    tables = {
        t: load_table(spark, sf_dir, t) for t in ("orders", "lineitem", "customer")
    }
    return evaluate_expectations(tables, TPCH_SUITE)
