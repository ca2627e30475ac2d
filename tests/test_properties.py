"""Property-based tests (hypothesis) for operator invariants — a tier the
reference lacks entirely (SURVEY §5: no property tests exist there)."""

import pandas as pd
from hypothesis import given, settings, strategies as st

from airdatapipeline_spark.model import CATEGORIES, SENTIMENTS
from airdatapipeline_spark.operators.enrichment import MockClassifier

VALID_SENT = set(SENTIMENTS) | {"Erro"}
VALID_CAT = set(CATEGORIES) | {"Erro"}


@given(
    keys=st.lists(st.integers(min_value=0, max_value=10**12), min_size=1, max_size=50)
)
@settings(max_examples=50, deadline=None)
def test_mock_classifier_pure_function_of_key(keys):
    """Classifier output depends only on the key — batch composition,
    ordering and duplication must not matter (cluster-determinism)."""
    titles = pd.Series(["t"] * len(keys))
    k = pd.Series(keys)
    out1 = MockClassifier().classify(titles, k)
    # reversed order, same keys
    out2 = MockClassifier().classify(titles.iloc[::-1], k.iloc[::-1])
    merged = pd.DataFrame({"k": keys, "s1": out1["sentiment"].values}).merge(
        pd.DataFrame({"k": list(reversed(keys)), "s2": out2["sentiment"].values}),
        on="k",
    )
    assert (merged.s1 == merged.s2).all()
    assert set(out1["sentiment"].dropna()) <= VALID_SENT
    assert set(out1["category"].dropna()) <= VALID_CAT
    assert out1["confidence_score"].between(0.0, 1.0).all()


@given(
    sentiments=st.lists(
        st.one_of(st.sampled_from(sorted(VALID_SENT)), st.text(max_size=12), st.none()),
        min_size=1,
        max_size=8,
    ),
    confidences=st.lists(
        st.one_of(st.floats(allow_nan=False, allow_infinity=False), st.none()),
        min_size=1,
        max_size=8,
    ),
)
@settings(max_examples=15, deadline=None)
def test_validate_domains_closed_over_domain(spark_global, sentiments, confidences):
    """Whatever garbage comes in, validated output is inside the domain."""
    from pyspark.sql import types as T

    from airdatapipeline_spark.operators.relational import validate_domains

    n = max(len(sentiments), len(confidences))
    sentiments = (sentiments * n)[:n]
    confidences = (confidences * n)[:n]
    schema = T.StructType(
        [
            T.StructField("sentiment", T.StringType(), True),
            T.StructField("category", T.StringType(), True),
            T.StructField("confidence_score", T.DoubleType(), True),
        ]
    )
    df = spark_global.createDataFrame(
        [(s, s, c) for s, c in zip(sentiments, confidences)], schema=schema
    )
    out = validate_domains(df).toPandas()
    assert set(out.sentiment) <= VALID_SENT
    assert set(out.category) <= VALID_CAT
    assert out.confidence_score.between(0.0, 1.0).all()


# session-scoped spark as a plain fixture alias usable inside @given
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def spark_global(spark):
    return spark


def test_partition_invariance_of_aggregates(spark_global):
    """The determinism policy's end-to-end claim: repartitioning the input
    must not change ANY output bit — floating aggregates included."""
    import pyspark.sql.functions as F

    from airdatapipeline_spark.io import load_table
    from airdatapipeline_spark.operators import tpch

    spark = spark_global
    base = tpch.q1_pricing_summary(spark, "/root/testdata/sf0.001").toPandas()
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for parts in ("3", "64"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            again = tpch.q1_pricing_summary(spark, "/root/testdata/sf0.001").toPandas()
            assert base.equals(again), f"q1 output changed with {parts} shuffle partitions"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_simhash_banding_catches_all_close_pairs(spark_global):
    """Pigeonhole guarantee: every pair with Hamming ≤ 3 found by the
    exhaustive sampled search must appear among the banded candidates."""
    from airdatapipeline_spark.operators import dedup

    spark = spark_global
    exhaustive = dedup.simhash_near_pairs(
        spark, "/root/testdata/sf0.001", max_hamming=3, sample_mod=1
    ).toPandas()
    banded = dedup.simhash_lsh_candidates(spark, "/root/testdata/sf0.001").toPandas()
    ex = set(zip(exhaustive.id_a, exhaustive.id_b))
    bd = set(zip(banded.id_a, banded.id_b))
    assert ex <= bd and bd == ex  # identical sets (banding is exact for h<=3)
