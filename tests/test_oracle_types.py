"""Oracle output-TYPE conformance lint (round-11 directive #1).

Round 10's driver window failed 3 queries on ``hash_match`` with rows
and schema green — DuckDB ``sum()`` over BIGINT returns HUGEINT, and
the driver renders int128 differently from Spark's int64, so the value
hash broke on *type*, not value.  The local gates normalized values
before hashing and were blind to the class.  This lint closes that
hole at the cheapest possible layer:

* ``test_no_hugeint_in_any_oracle`` binds EVERY ``oracle_sql()`` string
  through ``duckdb.sql(...).types`` (no execution, no Spark) and fails
  if any final-projection type contains HUGEINT/UHUGEINT anywhere —
  including inside list/struct columns.
* ``test_ambiguous_numeric_oracles_match_spark_classes`` goes further
  for the queries whose oracle emits a DECIMAL or FLOAT column (the
  other driver-render-ambiguous classes): it compiles the Spark plan
  (schema only) and asserts no HARD divergence per
  ``plans/oracle_typecheck.divergences`` — in particular no
  DECIMAL-where-Spark-is-DOUBLE.  Integer-width and decimal-precision
  divergences stay report-only (ten rounds of driver history tolerate
  them; ``token_stats`` int32-vs-BIGINT passed every window).
* classifier unit tests pin the severity map itself, so the lint can't
  silently rot.

``scripts/check_correctness.py`` applies the same ``divergences()``
check to all 500+ pairs during the full LOCALCHECK run (where the
Spark compile is already paid for).
"""

from __future__ import annotations

import duckdb
import pytest

from big_data_virus_analysis_spark.plans.catalog import CATALOG
from big_data_virus_analysis_spark.plans.oracle_typecheck import (
    divergences,
    duck_class,
    spark_class,
)
from big_data_virus_analysis_spark.sources.tables import TABLE_NAMES

from conftest import SMOKE_SF_DIR

_ORACLES = {n: s.oracle for n, s in CATALOG.items() if s.oracle is not None}


@pytest.fixture(scope="module")
def duck_smoke():
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{SMOKE_SF_DIR}/{name}.parquet'"
        )
    yield con
    con.close()


def _contains_hugeint(t) -> bool:
    tid = t.id
    if tid in ("hugeint", "uhugeint"):
        return True
    if tid in ("list", "struct", "map"):
        return any(_contains_hugeint(c) for _, c in t.children)
    return False


def _contains_decimal(t) -> bool:
    tid = t.id
    if tid == "decimal":
        return True
    if tid in ("list", "struct", "map"):
        return any(_contains_decimal(c) for _, c in t.children)
    return False


def test_no_hugeint_in_any_oracle(duck_smoke):
    """Every oracle's final projection must be HUGEINT-free (the r10
    driver-hash-breaking class).  Pure bind — runs in seconds over the
    whole catalog."""
    offenders = []
    for name, sql in sorted(_ORACLES.items()):
        rel = duck_smoke.sql(sql)
        for col, typ in zip(rel.columns, rel.types):
            if _contains_hugeint(typ):
                offenders.append(f"{name}.{col}: {typ}")
    assert not offenders, (
        "HUGEINT in oracle final projection (driver renders int128 != "
        "int64; add CAST(... AS BIGINT)): " + "; ".join(offenders)
    )


def test_no_decimal_in_any_oracle(duck_smoke):
    """Every oracle's final projection must be DECIMAL-free (the r11
    driver-hash-breaking class, r12 hardening).  The five r11 window
    failures (fleiss/krippendorff num+den, convex_hull edge_len2,
    closest_pair min_d2+d0, farthest_pair diameter_d2) were both-side
    DECIMAL(38,0): DuckDB's pandas fetch renders every decimal as
    float64 while Spark emits decimal.Decimal objects, so the driver
    hash breaks on render ("247" vs "247.0") even when values match.
    Scale>0 decimals break the same way on trailing-zero cents
    ("1.50" vs "1.5").  Keep decimal arithmetic INTERNAL; the final
    emission must be BIGINT (when it provably fits), DOUBLE (when
    value-exact), or a canonical digit string.  Pure bind — seconds
    over the whole catalog."""
    offenders = []
    for name, sql in sorted(_ORACLES.items()):
        rel = duck_smoke.sql(sql)
        for col, typ in zip(rel.columns, rel.types):
            if _contains_decimal(typ):
                offenders.append(f"{name}.{col}: {typ}")
    assert not offenders, (
        "DECIMAL in oracle final projection (driver-render-unsafe; "
        "cast the final emission to BIGINT/DOUBLE/VARCHAR): "
        + "; ".join(offenders)
    )


def _ambiguous(t) -> bool:
    tid = t.id
    if tid in ("decimal", "float", "double"):
        return True
    if tid in ("list", "struct", "map"):
        return any(_ambiguous(c) for _, c in t.children)
    return False


def test_ambiguous_numeric_oracles_match_spark_classes(spark, duck_smoke):
    """For every oracle emitting DECIMAL/FLOAT output, compile the Spark
    plan and assert zero HARD class divergences (decimal-vs-double is
    the known driver-breaking subclass; width/precision stay soft)."""
    hard_all = []
    soft_all = []
    for name, sql in sorted(_ORACLES.items()):
        rel = duck_smoke.sql(sql)
        if not any(_ambiguous(t) for t in rel.types):
            continue
        schema = CATALOG[name].spark(spark, SMOKE_SF_DIR).schema
        hard, soft = divergences(schema, rel.columns, rel.types)
        hard_all.extend(f"{name}: {m}" for m in hard)
        soft_all.extend(f"{name}: {m}" for m in soft)
        spark.catalog.clearCache()
    if soft_all:  # report-only class — visible in -rP output, never fails
        print("tolerated soft divergences:\n  " + "\n  ".join(soft_all))
    assert not hard_all, "hard oracle-type divergences:\n  " + "\n  ".join(
        hard_all
    )


# ---------------------------------------------------------------------------
# classifier unit tests — pin the severity map
# ---------------------------------------------------------------------------


def test_classifier_severities(duck_smoke):
    from pyspark.sql import types as T

    rel = duck_smoke.sql(
        "SELECT sum(x) AS h, 1.5 AS dec21, 1::BIGINT AS b, [sum(x)] AS lh "
        "FROM (SELECT 1::BIGINT AS x)"
    )
    dmap = dict(zip(rel.columns, rel.types))
    assert duck_class(dmap["h"]) == ("hugeint",)
    assert duck_class(dmap["dec21"]) == ("decimal", 2, 1)
    assert duck_class(dmap["b"]) == ("int", "bigint")
    assert duck_class(dmap["lh"]) == ("list", ("hugeint",))

    schema = T.StructType(
        [
            T.StructField("h", T.LongType()),
            T.StructField("dec21", T.DoubleType()),
            T.StructField("b", T.IntegerType()),
            T.StructField("lh", T.ArrayType(T.LongType())),
        ]
    )
    hard, soft = divergences(schema, rel.columns, list(rel.types))
    # HUGEINT (top-level and inside the list) => hard; decimal-vs-double
    # => hard; int-vs-bigint => soft
    assert len(hard) == 3, hard
    assert any("h:" in m or m.startswith("h") for m in hard)
    assert any("dec21" in m for m in hard)
    assert any("lh[]" in m for m in hard)
    assert len(soft) == 1 and "b" in soft[0], soft

    # r12: even a BOTH-SIDE decimal match is hard now (the r11 window
    # failures were both-side DECIMAL(38,0) — render-divergent), and
    # decimal-vs-hugeint stays hard (hugeint is never acceptable)
    ok_schema = T.StructType(
        [
            T.StructField("h", T.DecimalType(38, 0)),
            T.StructField("dec21", T.DecimalType(2, 1)),
            T.StructField("b", T.LongType()),
            T.StructField("lh", T.ArrayType(T.DecimalType(38, 0))),
        ]
    )
    hard2, _ = divergences(ok_schema, rel.columns, list(rel.types))
    assert len(hard2) == 3, hard2
    assert any("dec21" in m and "decimal in final projection" in m
               for m in hard2), hard2

    # column mismatch is hard in both directions
    hard3, _ = divergences(
        T.StructType([T.StructField("zz", T.LongType())]),
        ["b"],
        [dmap["b"]],
    )
    assert len(hard3) == 2, hard3

    assert spark_class(T.DecimalType(28, 2)) == ("decimal", 28, 2)
    assert spark_class(T.ArrayType(T.StringType())) == ("list", ("str",))
