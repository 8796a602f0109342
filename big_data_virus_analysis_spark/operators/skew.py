"""Skew-mitigation operators: salted two-phase aggregation.

At 100 TB a handful of hot keys (ubiquitous API tokens like ``Sleep``,
stopword shingles, bot users) can pin a single reducer.  AQE's skew-join
splitting covers joins; for AGGREGATIONS over skewed keys the standard
fix is salting — spread each key over N sub-keys, aggregate twice:

    phase 1: groupBy(key, salt)  — N-way parallel partials per hot key
    phase 2: groupBy(key)        — N rows per key, trivial

For algebraic aggregates (count/sum/min/max) the two-phase result is
exactly the single-phase result, so the DuckDB oracle is the plain
GROUP BY.  Spark's own partial aggregation already does this *within*
map tasks; explicit salting additionally spreads the REDUCE side, which
partial aggregation cannot.

No reference counterpart (the reference never ran wide enough to see
reducer skew); this is north-star scale work (SURVEY.md §4.3 "salting
for skewed tokens").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_count_sum(
    df: DataFrame,
    key: str,
    value: str,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase salted ``groupBy(key).agg(count, sum(value))``.

    Output: ``(key, n, total)`` — bit-identical to the unsalted
    aggregate for these algebraic functions.  The salt is derived from a
    uniform hash of arbitrary other columns via ``spark_partition_id``-
    free arithmetic (monotonically varying row content), here simply a
    random-free deterministic spread: hash of all columns mod n_salts —
    deterministic per row, uniform across rows.
    """
    salted = df.withColumn("_salt", F.pmod(F.hash(*df.columns), F.lit(n_salts)))
    phase1 = salted.groupBy(key, "_salt").agg(
        F.count("*").alias("_n"),
        F.sum(F.col(value).cast("decimal(18,2)")).alias("_s"),
    )
    return (
        phase1.groupBy(key)
        .agg(
            F.sum("_n").alias("n"),
            # exact decimal merge, then ONE cast to double so the final
            # schema carries no Decimal (harness-rendering-proof)
            F.sum("_s").cast("double").alias("total"),
        )
    )


def salted_skew_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    n_salts: int = 16,
) -> DataFrame:
    """Inner equi-join that spreads each hot fact key over ``n_salts``
    reducers: fact rows get a deterministic salt (uniform hash of the
    whole row), the dim side is replicated ``n_salts``× (one explode —
    dim is the SMALL side, so the replication is cheap), and the join
    key becomes ``(key, salt)``.  No single reducer ever sees more than
    ~1/n_salts of a hot key's rows.

    Result is row-identical to ``fact.join(dim, fact_key == dim_key)``
    (the salt only partitions work), which is exactly what the DuckDB
    oracle and the equality test assert.  AQE's skew-join split covers
    sort-merge joins after the fact; explicit salting is the plan-level
    guarantee that also composes under bucketed layouts and disabled
    AQE.  The dim keeps its own key column name so downstream
    projections are unchanged.
    """
    salted_fact = fact.withColumn(
        "_salt", F.pmod(F.hash(*fact.columns), F.lit(n_salts))
    )
    replicated_dim = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted_fact.join(
        replicated_dim,
        (F.col(fact_key) == F.col(dim_key)) & (salted_fact["_salt"] == replicated_dim["_salt"]),
    ).drop("_salt")
