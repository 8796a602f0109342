"""Property-based tests (hypothesis) for the order-defined primitives.

These are the pieces where a latent edge case costs silent wrong
answers at scale: the two-phase global prefix scan (NULL runs, negative
values, doubles vs ints, descending order) and the exact Mann-Whitney
AUC (ties, one-class edge handling).  Each property is checked against
the naive single-partition form / a brute-force reference on small
random inputs — few examples, each worth a full Spark job, so
max_examples stays low and the deadline is off.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

_prop = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    vals=st.lists(
        st.one_of(st.none(), st.integers(min_value=-1000, max_value=1000)),
        min_size=1,
        max_size=60,
    ),
    descending=st.booleans(),
)
@_prop
def test_global_prefix_sum_matches_naive_window(spark, vals, descending):
    """Two-phase scan == single-partition window, including NULL runs
    (SUM semantics: NULL until the first non-NULL), negatives, and
    descending order."""
    from big_data_virus_analysis_spark.operators.prefix_sum import global_prefix_sum

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "k int, v int"
    )
    order = [F.col("k").desc()] if descending else [F.col("k")]
    got = {
        r["k"]: r["cum"]
        for r in global_prefix_sum(
            df, "k", "v", "cum", n_buckets=4, order_exprs=order
        ).collect()
    }
    w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    want = {r["k"]: r["cum"] for r in df.withColumn("cum", F.sum("v").over(w)).collect()}
    assert got == want


@given(
    vals=st.lists(
        st.floats(
            min_value=-100, max_value=100, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=50,
    )
)
@_prop
def test_global_prefix_sum_doubles(spark, vals):
    """The double-typed value path (regression: the offset literal used
    to be an int 0, which createDataFrame rejects for DoubleType)."""
    from big_data_virus_analysis_spark.operators.prefix_sum import global_prefix_sum

    df = spark.createDataFrame([(i, float(v)) for i, v in enumerate(vals)], "k int, v double")
    got = {
        r["k"]: r["cum"]
        for r in global_prefix_sum(df, "k", "v", "cum", n_buckets=4).collect()
    }
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    want = {r["k"]: r["cum"] for r in df.withColumn("cum", F.sum("v").over(w)).collect()}
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-9, abs=1e-9)


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),  # score bucket (forces ties)
            st.booleans(),
        ),
        min_size=2,
        max_size=60,
    )
)
@_prop
def test_exact_auc_matches_bruteforce(spark, rows):
    """exact_auc == the O(n^2) Mann-Whitney count with 0.5 tie credit,
    whenever both classes are present."""
    from big_data_virus_analysis_spark.ml.metrics import exact_auc

    pos = [s for s, l in rows if l]
    neg = [s for s, l in rows if not l]
    if not pos or not neg:
        return  # AUC undefined; nothing to check
    df = spark.createDataFrame(
        [(float(s), float(l)) for s, l in rows], "score double, label double"
    )
    got = exact_auc(df, "score", "label")
    want = sum((p > n) + 0.5 * (p == n) for p in pos for n in neg) / (
        len(pos) * len(neg)
    )
    assert got == pytest.approx(want, abs=1e-6)
