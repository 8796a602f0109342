"""Planted-hub adversarial fixture — the hot-key caps must actually FIRE.

r7 VERDICT directive #1: SCALING.md's wedge table shows the hub caps
(``_AA_HUB_CAP=64`` on the adamic-adar wedge pivot, ``DF_CAP=64`` on the
shared dup-graph gram index, ``max_df`` on the n-gram Jaccard inverted
index) bind **zero times** on every committed testdata SF — the capped
code paths and their audit columns had never executed on data.  This
module builds a small fixture with

* a LINEITEM hub part co-ordered with 70 other parts (degree 70 > 64),
  plus a benign pivot part of degree 12 so the capped query still has
  real wedge output, and
* a DOCUMENTS corpus where a 12-token boilerplate prefix appears in all
  120 docs (5 hot 8-grams / 10 hot 3-grams, df=120 > 64) alongside 10
  planted near-dup pairs sharing exactly ``MIN_SHARED`` rare grams,

then runs the capped queries against their DuckDB oracles **on the
fixture** (same cap both engines) and asserts (a) exactness and (b)
that each cap demonstrably bound: ``capped_hubs > 0`` in the output,
hot grams exist above the cap, and the uncapped variant produces a
different (denser) result.
"""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest

from big_data_virus_analysis_spark.operators import graph_edges
from big_data_virus_analysis_spark.operators.dedup import ngram_jaccard_pairs
from big_data_virus_analysis_spark.plans.catalog import CATALOG
from big_data_virus_analysis_spark.plans.round6_graph2 import _AA_HUB_CAP
from big_data_virus_analysis_spark.sources.tables import load_table

from conftest import assert_frames_match

_N_DOCS = 120
_N_PAIRED = 20  # docs 0..19 form 10 planted near-dup pairs
_HUB_DEG = 70  # lineitem hub part degree (> _AA_HUB_CAP = 64)
_PIVOT_DEG = 12  # benign pivot part degree (<= cap)

_BOILER = [f"b{j}" for j in range(12)]  # 12 tokens => 5 hot 8-grams


def _doc_text(i: int) -> str:
    group = f"{i // 2}" if i < _N_PAIRED else f"s{i}"
    toks = (
        _BOILER
        + [f"u{i}x0", f"u{i}x1", f"u{i}x2"]
        + [f"p{group}w{j}" for j in range(12)]
    )
    return " ".join(toks)


@pytest.fixture(scope="module")
def planted_dir(tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("planted_hub")
    docs = pd.DataFrame(
        {
            "doc_id": range(_N_DOCS),
            "text": [_doc_text(i) for i in range(_N_DOCS)],
            "lang": ["en"] * _N_DOCS,
            "source": [f"src{i % 4}" for i in range(_N_DOCS)],
        }
    )
    docs["n_chars"] = docs["text"].str.len()
    docs.to_parquet(os.path.join(d, "documents.parquet"), index=False)

    rows: list[tuple[int, int]] = []
    # hub part 0: co-ordered with parts 1.._HUB_DEG, 2 shared orders
    # each (>= _MIN_COORDERS) -> deg(0) = 70 > _AA_HUB_CAP
    for p in range(1, _HUB_DEG + 1):
        for o in (10_000 + 2 * p, 10_001 + 2 * p):
            rows.append((o, 0))
            rows.append((o, p))
    # benign pivot part 200: co-ordered with 201..212 -> deg 12 <= cap,
    # C(12,2)=66 wedge candidates keep the capped query's output real
    for q in range(201, 201 + _PIVOT_DEG):
        for o in (20_000 + 2 * q, 20_001 + 2 * q):
            rows.append((o, 200))
            rows.append((o, q))
    li = pd.DataFrame(rows, columns=["l_orderkey", "l_partkey"])
    li.to_parquet(os.path.join(d, "lineitem.parquet"), index=False)
    return str(d)


@pytest.fixture(scope="module")
def planted_duck(planted_dir):
    con = duckdb.connect()
    for name in ("documents", "lineitem"):
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"'{os.path.join(planted_dir, name + '.parquet')}'"
        )
    yield con
    con.close()


def test_adamic_adar_hub_cap_binds_and_exact(spark, planted_dir, planted_duck):
    spec = CATALOG["adamic_adar_linkpred"]
    sdf = spec.spark(spark, planted_dir)
    assert_frames_match(
        sdf, planted_duck.execute(spec.oracle).df(), "adamic_adar_planted"
    )
    rows = sdf.collect()
    assert len(rows) == 20  # 66 pivot-wedge candidates, top-20 kept
    assert all(r.capped_hubs == 1 for r in rows), "hub cap did not bind"
    assert all(r.capped_mass_ub > 0 for r in rows)
    # the excluded hub is the planted one: graph degree = distinct
    # co-ordered partner count = _HUB_DEG (each partner shares 2 orders)
    li = load_table(spark, planted_dir, "lineitem")
    deg0 = (
        li.where("l_partkey = 0")
        .select("l_orderkey")
        .join(li.where("l_partkey != 0"), "l_orderkey")
        .select("l_partkey")
        .distinct()
        .count()
    )
    assert deg0 == _HUB_DEG > _AA_HUB_CAP


def test_dup_graph_gram_cap_binds_and_exact(spark, planted_dir, planted_duck):
    # hot grams exist above DF_CAP ...
    docs = load_table(spark, planted_dir, "documents")
    hot_gram = " ".join(_BOILER[:8])
    hot_df = docs.where(docs.text.contains(hot_gram)).count()
    assert hot_df == _N_DOCS > graph_edges.DF_CAP
    # ... the capped edge set is the 10 planted pairs ...
    capped = graph_edges.dup_graph_edges(spark, planted_dir).collect()
    assert sorted((r.u, r.v) for r in capped) == [
        (2 * i, 2 * i + 1) for i in range(_N_PAIRED // 2)
    ]
    # ... the UNCAPPED variant densifies (boilerplate grams alone meet
    # MIN_SHARED for every doc pair) — the cap visibly changes results
    uncapped_n = graph_edges.dup_graph_edges(
        spark, planted_dir, df_cap=10**9
    ).count()
    assert uncapped_n == _N_DOCS * (_N_DOCS - 1) // 2
    # ... and the capped consumer query stays oracle-exact end-to-end
    spec = CATALOG["pagerank_dup_graph_exact"]
    sdf = spec.spark(spark, planted_dir)
    assert_frames_match(
        sdf, planted_duck.execute(spec.oracle).df(), "pagerank_planted"
    )
    assert sdf.count() == _N_PAIRED


def test_ngram_jaccard_max_df_binds_and_exact(spark, planted_dir, planted_duck):
    docs = load_table(spark, planted_dir, "documents")
    cap = 64
    sdf = ngram_jaccard_pairs(docs, n=3, threshold=0.4, max_df=cap)
    oracle = f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), g AS (
      SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS gram
      FROM toks, UNNEST(range(1, greatest(len(t) - 3 + 2, 1))) AS u(i)
    ), cool AS (
      SELECT gram FROM g GROUP BY gram HAVING count(*) <= {cap}
    ), gc AS (
      SELECT g.doc_id, g.gram FROM g JOIN cool USING (gram)
    ), sz AS (
      SELECT doc_id, count(*) AS sz FROM gc GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
      FROM gc a JOIN gc b USING (gram)
      WHERE a.doc_id < b.doc_id GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           round(CAST(i AS DOUBLE) / (sa.sz + sb.sz - i), 6) AS jaccard
    FROM inter
    JOIN sz sa ON inter.doc_a = sa.doc_id
    JOIN sz sb ON inter.doc_b = sb.doc_id
    WHERE round(CAST(i AS DOUBLE) / (sa.sz + sb.sz - i), 6) >= 0.4
    """
    assert_frames_match(
        sdf, planted_duck.execute(oracle).df(), "ngram_jaccard_planted"
    )
    rows = sdf.collect()
    assert len(rows) == _N_PAIRED // 2
    assert all(abs(r.jaccard - 0.5) < 1e-9 for r in rows)
    # hot 3-grams above the cap exist, and without the cap the same
    # pairs score HIGHER (boilerplate grams inflate the intersection)
    hot = planted_duck.execute(
        "WITH toks AS (SELECT doc_id, string_split(text,' ') AS t FROM documents), "
        "g AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+2],' ') AS gram "
        "FROM toks, UNNEST(range(1, greatest(len(t)-3+2,1))) AS u(i)) "
        f"SELECT count(*) FROM (SELECT gram FROM g GROUP BY gram HAVING count(*) > {cap})"
    ).fetchone()[0]
    assert hot == 10  # the 10 boilerplate 3-gram windows
    uncapped = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(docs, n=3, threshold=0.4).collect()
        if (r.doc_a, r.doc_b) in {(2 * i, 2 * i + 1) for i in range(10)}
    }
    assert all(j > 0.5 for j in uncapped.values())
