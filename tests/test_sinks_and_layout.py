"""Sinks + physical layout: partitioned writes prune, bucketed tables
co-locate joins (no Exchange), salted aggregation spreads reducers.

These are the storage-layout halves of the 100 TB story (SURVEY.md
§4.3): partition columns for coarse pruning, bucketing for shuffle-free
equi-joins, salting for reducer skew.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_virus_analysis_spark.operators.skew import salted_count_sum
from big_data_virus_analysis_spark.sources.sinks import (
    write_json_lines,
    write_partitioned_parquet,
    write_report_text,
)
from big_data_virus_analysis_spark.sources.tables import load_table

from conftest import SMOKE_SF_DIR
from test_plans import fmt_plan


def test_partitioned_write_prunes(spark, tmp_path):
    docs = load_table(spark, SMOKE_SF_DIR, "documents")
    path = str(tmp_path / "docs_by_lang")
    write_partitioned_parquet(docs, path, partition_by=["lang"])

    back = spark.read.parquet(path)
    assert back.count() == docs.count()
    q = back.where(F.col("lang") == "en").select("doc_id")
    plan = fmt_plan(q)
    # partition pruning: the lang filter is a PartitionFilter on the
    # scan, not a post-scan Filter over all rows
    assert "PartitionFilters: [" in plan
    assert "lang" in plan.split("PartitionFilters")[1].split("]")[0]
    assert q.count() == docs.where(F.col("lang") == "en").count()


def test_report_text_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [("0;0.0;[]",), ("1;1.0;[{\"name\":\"x\",\"size\":1}]",)], "line string"
    )
    path = str(tmp_path / "report")
    write_report_text(df, path, single_file=True)
    back = spark.read.text(path)
    assert sorted(r["value"] for r in back.collect()) == sorted(
        r["line"] for r in df.collect()
    )


def test_json_lines_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, name string")
    path = str(tmp_path / "json_out")
    write_json_lines(df, path, single_file=True)
    back = spark.read.json(path).select("id", "name")
    assert sorted(map(tuple, back.collect())) == [(1, "a"), (2, "b")]


def test_salted_agg_matches_plain(spark):
    ev = load_table(spark, SMOKE_SF_DIR, "events")
    salted = salted_count_sum(ev, "user_id", "value", n_salts=8)
    plain = ev.groupBy("user_id").agg(
        F.count("*").alias("n"),
        # same exact-decimal-accumulate → single-double-cast contract as
        # the operator (no Decimal in final schemas, see audit script)
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total"),
    )
    a = sorted(map(tuple, salted.collect()))
    b = sorted(map(tuple, plain.collect()))
    assert a == b
    # and it really is two aggregation phases (partial+final × 2); AQE's
    # formatted output shows Final + Initial plan trees, so keep one
    plan = fmt_plan(salted).split("== Initial Plan ==")[0]
    assert plan.count("HashAggregate (") == 4


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    """orders + customer bucketed by the join key into the session
    warehouse — the co-located-join layout for 100 TB fact tables."""
    names = ("b_orders", "b_customer")
    orders = load_table(spark, SMOKE_SF_DIR, "orders")
    cust = load_table(spark, SMOKE_SF_DIR, "customer")
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_custkey")
        .sortBy("o_custkey")
        .saveAsTable("b_orders")
    )
    (
        cust.write.mode("overwrite")
        .bucketBy(8, "c_custkey")
        .sortBy("c_custkey")
        .saveAsTable("b_customer")
    )
    yield names
    for n in names:
        spark.sql(f"DROP TABLE IF EXISTS {n}")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    """Equi-join on the bucket key must not exchange either side — the
    layout, not the optimizer, pays for co-location."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = spark.table("b_orders")
        cust = spark.table("b_customer")
        j = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
            "o_orderkey", "c_name"
        )
        plan = fmt_plan(j)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # zero shuffles: bucketing co-locates
        # sanity: same result as the unbucketed join
        want = (
            load_table(spark, SMOKE_SF_DIR, "orders")
            .join(
                load_table(spark, SMOKE_SF_DIR, "customer"),
                F.col("o_custkey") == F.col("c_custkey"),
            )
            .count()
        )
        assert j.count() == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_format_round_trips(spark, tmp_path):
    """orders survives CSV, JSON, and ORC write→read bit-for-bit under
    explicit schemas (no inference scan)."""
    from big_data_virus_analysis_spark.sources import formats, sinks

    orders = load_table(spark, SMOKE_SF_DIR, "orders").limit(200)
    expected = sorted(map(tuple, orders.collect()))
    schema = formats.schema_of(orders)

    p = str(tmp_path / "csv")
    sinks.write_csv(orders, p)
    assert sorted(map(tuple, formats.read_csv(spark, p, schema).collect())) == expected

    p = str(tmp_path / "json")
    sinks.write_json_lines(orders, p)
    assert sorted(map(tuple, formats.read_json(spark, p, schema).collect())) == expected

    p = str(tmp_path / "orc")
    sinks.write_orc(orders, p)
    assert sorted(map(tuple, formats.read_orc(spark, p).collect())) == expected


def test_range_sorted_write_disjoint_files(spark, tmp_path):
    """write_range_sorted produces per-file key ranges that do not
    overlap — a point predicate touches exactly one file's stats."""
    import glob

    from big_data_virus_analysis_spark.sources.sinks import write_range_sorted

    orders = load_table(spark, SMOKE_SF_DIR, "orders")
    out = str(tmp_path / "ranged")
    write_range_sorted(orders, out, "o_totalprice", n_files=4)
    bounds = []
    for f in sorted(glob.glob(out + "/part-*")):
        pf = spark.read.parquet(f)
        lo, hi = pf.agg(F.min("o_totalprice"), F.max("o_totalprice")).first()
        bounds.append((lo, hi))
    bounds.sort()
    assert len(bounds) == 4
    for (_, hi_prev), (lo_next, _) in zip(bounds, bounds[1:]):
        assert hi_prev <= lo_next


def test_zorder_narrows_both_dimensions(spark, tmp_path):
    """Sorting by the Morton value shrinks the average per-file
    bounding box over BOTH keys vs the unsorted layout."""
    import glob

    from big_data_virus_analysis_spark.functions.vectors import zorder_value

    li = load_table(spark, SMOKE_SF_DIR, "lineitem").select("l_partkey", "l_suppkey")

    def avg_box(path):
        areas = []
        for f in sorted(glob.glob(path + "/part-*")):
            pf = spark.read.parquet(f)
            r = pf.agg(
                F.min("l_partkey"), F.max("l_partkey"),
                F.min("l_suppkey"), F.max("l_suppkey"),
            ).first()
            areas.append((r[1] - r[0] + 1) * (r[3] - r[2] + 1))
        return sum(areas) / len(areas)

    base = str(tmp_path / "plain")
    li.repartition(8).write.mode("overwrite").parquet(base)
    zed = str(tmp_path / "zorder")
    (
        li.withColumn("z", zorder_value(F.col("l_partkey"), F.col("l_suppkey")))
        .repartitionByRange(8, "z")
        .sortWithinPartitions("z")
        .drop("z")
        .write.mode("overwrite")
        .parquet(zed)
    )
    assert avg_box(zed) < 0.5 * avg_box(base)


# ---------------------------------------------------------------------------
# Runtime filtering: bloom-filter join pruning + dynamic partition pruning
# ---------------------------------------------------------------------------


def test_runtime_bloom_filter_prunes_fact_scan(spark):
    """With a selective dim filter and a shuffle join, the optimizer
    injects a bloom filter built from the dim side as a
    `might_contain(xxhash64(key))` condition on the FACT scan — rows
    that can't join die before the exchange.  This is the 100 TB
    fact-dim pattern when the dim is too big to broadcast; the
    application-side threshold (default 10 GB) is lowered only for the
    test because local test scans are tiny."""
    conf = spark.conf
    saved = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": conf.get(
            "spark.sql.optimizer.runtime.bloomFilter.enabled"
        ),
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": conf.get(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
        ),
        "spark.sql.autoBroadcastJoinThreshold": conf.get(
            "spark.sql.autoBroadcastJoinThreshold"
        ),
    }
    try:
        conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        li = load_table(spark, SMOKE_SF_DIR, "lineitem")
        pt = load_table(spark, SMOKE_SF_DIR, "part").where("p_size = 1")
        q = li.join(pt, li.l_partkey == pt.p_partkey).groupBy("p_brand").count()
        plan = fmt_plan(q)
        assert "might_contain" in plan
        assert "bloom_filter_agg" in plan
        q.collect()  # the filtered plan still executes correctly
    finally:
        for k, v in saved.items():
            conf.set(k, v)


def test_dynamic_partition_pruning(spark, tmp_path):
    """A partition-columned fact joined to a filtered dim reads only the
    partitions the dim filter selects: the scan carries a
    `dynamicpruningexpression` PartitionFilter fed by a subquery over
    the dim.  At 100 TB this is the difference between scanning one
    month and scanning a decade."""
    li = load_table(spark, SMOKE_SF_DIR, "lineitem")
    fact_path = str(tmp_path / "li_by_month")
    (
        li.withColumn("ship_month", F.date_format("l_shipdate", "yyyy-MM"))
        .write.partitionBy("ship_month")
        .parquet(fact_path)
    )
    dim_path = str(tmp_path / "month_dim")
    (
        li.select(F.date_format("l_shipdate", "yyyy-MM").alias("m"))
        .distinct()
        .withColumn("q", F.substring("m", 6, 2).cast("int"))
        .write.parquet(dim_path)
    )
    fact = spark.read.parquet(fact_path)
    dim = spark.read.parquet(dim_path).where("q = 3")
    q = fact.join(dim, fact.ship_month == dim.m).groupBy("ship_month").agg(
        F.count(F.lit(1)).alias("n")
    )
    plan = fmt_plan(q)
    assert "dynamicpruningexpression" in plan
    got = {r["ship_month"] for r in q.collect()}
    assert got and all(m[5:7] == "03" for m in got)


def test_dynamic_partition_overwrite_preserves_others(spark, tmp_path):
    from big_data_virus_analysis_spark.sources.sinks import write_dynamic_partitions

    path = str(tmp_path / "dyn")
    ev = load_table(spark, SMOKE_SF_DIR, "events").withColumn(
        "etype", F.col("event_type")
    )
    write_dynamic_partitions(ev, path, ["etype"])
    before = spark.read.parquet(path).count()
    # reprocess ONE partition with a reduced subset; others must survive
    one = ev.where(F.col("etype") == "click").limit(10)
    write_dynamic_partitions(one, path, ["etype"])
    after = spark.read.parquet(path)
    n_click = after.where(F.col("etype") == "click").count()
    n_rest = after.where(F.col("etype") != "click").count()
    n_click_orig = ev.where(F.col("etype") == "click").count()
    assert n_click == 10
    assert n_rest == before - n_click_orig


def test_compact_small_files_reduces_file_count(spark, tmp_path):
    import glob

    from big_data_virus_analysis_spark.sources.sinks import compact_small_files

    path = str(tmp_path / "frag")
    ev = load_table(spark, SMOKE_SF_DIR, "events")
    n_rows = ev.count()
    ev.repartition(40).write.parquet(path)
    assert len(glob.glob(path + "/*.parquet")) == 40
    n_files = compact_small_files(spark, path, target_rows_per_file=n_rows)
    assert n_files == 1
    assert len(glob.glob(path + "/*.parquet")) == 1
    assert spark.read.parquet(path).count() == n_rows


def test_contiguous_ids_unique_and_dense(spark):
    from big_data_virus_analysis_spark.functions.vectors import contiguous_ids

    ev = load_table(spark, SMOKE_SF_DIR, "events").repartition(7)
    n = ev.count()
    ids = contiguous_ids(ev).select("row_id")
    stats = ids.agg(
        F.count("*").alias("n"),
        F.count_distinct("row_id").alias("nd"),
        F.min("row_id").alias("lo"),
        F.max("row_id").alias("hi"),
    ).collect()[0]
    assert stats.n == n and stats.nd == n
    assert stats.lo == 0 and stats.hi == n - 1
    # original columns survive
    assert set(contiguous_ids(ev).columns) == set(ev.columns) | {"row_id"}
