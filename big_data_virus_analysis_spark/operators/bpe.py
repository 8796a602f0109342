"""Distributed BPE tokenizer training (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units" — public).

The algorithm every LLM tokenizer pipeline runs before anything else:
iteratively merge the most frequent adjacent symbol pair.  The Spark
shape follows the classic implementation exactly:

1. ONE pass over the corpus builds the word-frequency table — after
   this, training never touches the corpus again.  The word-freq table
   is vocabulary-sized (Heaps' law: ~10⁶ rows at 100 TB), so every
   training round is an agg over a small, well-partitioned frame.
2. Each round: explode adjacent symbol pairs weighted by word count →
   hash agg on the pair → global top-1 (TakeOrderedAndProject, one row
   to the driver — the same driver-appropriate O(1) exchange as the
   components convergence checks) → apply the merge to every word's
   symbol array with a per-row left-to-right ``aggregate`` fold.
   ``localCheckpoint`` per round truncates the otherwise-exponential
   lineage (same discipline as dedup_clusters).

Ties break on (count DESC, left ASC, right ASC) so training is fully
deterministic — the test compares the merge list against an
independent pure-Python reference on the same fixture.  No SQL oracle:
the merge loop is iterative (the driver records rows-only), which is
exactly the class of ops SURVEY.md exempts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _word_symbols(documents: DataFrame) -> DataFrame:
    """Vocabulary-sized training table: ``(word, n, syms)`` with syms
    the character-split symbol array."""
    words = documents.select(
        F.explode(F.split(F.col("text"), " ")).alias("word")
    ).where(F.length("word") > 0)
    return (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("syms", F.split(F.col("word"), ""))
    )


def _merge_expr(left: str, right: str):
    """Left-to-right greedy merge of adjacent (left, right) symbol
    occurrences — the standard BPE application rule — as a pure
    ``aggregate`` fold over the symbol array."""
    merged = left + right
    return F.aggregate(
        F.col("syms"),
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def train_bpe(
    documents: DataFrame, n_merges: int = 20, min_pair_count: int = 2
) -> DataFrame:
    """Train ``n_merges`` BPE merges on the corpus.

    Returns the merge table ``(rank, left, right, merged, pair_count)``
    — rank is 1-based merge order.  Stops early when no pair reaches
    ``min_pair_count``.
    """
    spark = documents.sparkSession
    syms = _word_symbols(documents).localCheckpoint(eager=True)
    merges = []
    for rank in range(1, n_merges + 1):
        pairs = syms.select(
            "n",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("syms") - 1),
                    lambda i: F.struct(
                        F.element_at(F.col("syms"), i).alias("l"),
                        F.element_at(F.col("syms"), i + 1).alias("r"),
                    ),
                )
            ).alias("p"),
        ).where(F.size("syms") >= 2)
        top = (
            pairs.groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("l").asc(), F.col("r").asc())
            .limit(1)
            .collect()
        )
        if not top or top[0]["cnt"] < min_pair_count:
            break
        left, right, cnt = top[0]["l"], top[0]["r"], int(top[0]["cnt"])
        merges.append((rank, left, right, left + right, cnt))
        syms = syms.withColumn("syms", _merge_expr(left, right)).localCheckpoint(
            eager=True
        )
    return spark.createDataFrame(
        merges, "rank int, left string, right string, merged string, pair_count bigint"
    )


def bpe_segment(documents: DataFrame, merge_rows: list) -> DataFrame:
    """Apply a trained merge list to the corpus: per-doc BPE token
    stats ``(doc_id, n_words, n_bpe_tokens)``.  Pure map — the merge
    list is a driver-side constant folded into the expression tree
    (production would broadcast a tokenizer artifact the same way)."""
    toks = F.filter(F.split(F.col("text"), " "), lambda t: F.length(t) > 0)
    staged = documents.select("doc_id", toks.alias("_w"))
    per_word = staged.select(
        "doc_id", F.explode("_w").alias("word")
    ).withColumn("syms", F.split(F.col("word"), ""))
    for row in merge_rows:
        per_word = per_word.withColumn("syms", _merge_expr(row["left"], row["right"]))
    return per_word.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum(F.size("syms")).alias("n_bpe_tokens"),
    )
