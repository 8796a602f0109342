"""Feature selection: class-conditional document frequency → information
gain → deterministic top-k ranking.

This is the reference's core analytic (FeatureSelectionCloud.scala
:376-442) re-expressed as ONE declarative plan:

  tokens → dropDuplicates(doc, token)            [1 shuffle, partial agg]
        → groupBy(token) conditional counts      [1 shuffle]
        → filter pos>0 AND neg>0                 [inner-join semantics, no join]
        → + broadcast 1-row totals               [no shuffle]
        → IG expression                          [codegen, no UDF]
        → row_number window over global order    [top-k]

Differences from the reference, by design (SURVEY.md §7):
* the reference computed per-class doc-frequency as two RDDs joined
  inner on token (FeatureSelectionCloud.scala:418) — dropping tokens
  present in only one class.  A conditional aggregate + ``HAVING both >
  0`` has identical semantics with one shuffle instead of three.
* ranks come from ``row_number`` over (IG desc, token asc) — the
  reference used partition-order ``zipWithIndex`` (nondeterministic,
  FeatureSelectionCloud.scala:505).

Scale note: the final rank is a single-partition window over the
*aggregated token table* (vocabulary-sized, ~1e5 rows even at 100 TB of
logs), not over the corpus — this is the same shape Catalyst picks for
``ORDER BY ... LIMIT k`` (TakeOrderedAndProject) and is not a
bottleneck.  The corpus-sized stages all use hash partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.entropy import info_gain, nan_to_zero


def document_tokens(documents: DataFrame, positive_lang: str = "en") -> DataFrame:
    """Tokenize the synthetic ``documents`` table into the corpus shape.

    Returns ``(doc: bigint, cls: string, token: string)`` with
    cls ∈ {'pos','neg'} (positive = ``lang == positive_lang``) — the
    analog of the reference's virus/clean split, driven by a column
    instead of a bucket path.
    """
    return documents.select(
        F.col("doc_id").alias("doc"),
        F.when(F.col("lang") == positive_lang, F.lit("pos")).otherwise(F.lit("neg")).alias("cls"),
        F.explode(F.split(F.col("text"), " ")).alias("token"),
    ).where(F.length("token") > 0)


def doc_frequency_by_class(doc_tokens: DataFrame) -> DataFrame:
    """Per-token document frequency, split by class.

    Input: ``(doc, cls, token)`` (token may repeat within a doc).
    Output: ``(token, pos_df, neg_df)`` — **document** frequency, i.e.
    each doc counts once per token (reference dedup semantics,
    FeatureSelectionCloud.scala:314,337).
    """
    distinct = doc_tokens.dropDuplicates(["doc", "cls", "token"])
    return distinct.groupBy("token").agg(
        F.count_if(F.col("cls") == "pos").alias("pos_df"),
        F.count_if(F.col("cls") == "neg").alias("neg_df"),
    )


def info_gain_ranking(
    doc_tokens: DataFrame,
    k: int = 2000,
    doc_classes: DataFrame | None = None,
) -> DataFrame:
    """Top-k tokens by information gain.

    Output: ``(token, pos_df, neg_df, info_gain: double, rank: int)``,
    rank 1-based by (IG desc, token asc).  Inner-join parity: tokens
    present in only one class are dropped before ranking.

    ``doc_classes``: optional ``(doc, cls)`` frame with one row per
    document.  Passing it skips a full re-scan + explode + distinct of
    the token corpus just to count documents (2.7× on the flagship
    bench) AND matches the reference more closely — its IG denominators
    came from the bucket *listing* (all files, even token-less ones;
    FeatureSelectionCloud.scala:122-123), not from the token sets.
    """
    df = doc_frequency_by_class(doc_tokens)

    doc_cls = (
        doc_classes if doc_classes is not None else doc_tokens.select("doc", "cls").distinct()
    )
    totals = doc_cls.agg(
        F.count_if(F.col("cls") == "pos").alias("p"),
        F.count("*").alias("t"),
    )

    surviving = df.where((F.col("pos_df") > 0) & (F.col("neg_df") > 0))

    scored = (
        surviving.join(F.broadcast(totals))
        .withColumn(
            "info_gain",
            F.round(
                nan_to_zero(
                    info_gain(
                        p=F.col("p"),
                        t=F.col("t"),
                        pg=F.col("pos_df"),
                        tg=F.col("pos_df") + F.col("neg_df"),
                    )
                ),
                6,
            ),
        )
        .drop("p", "t")
    )

    # top-k FIRST (TakeOrderedAndProject: per-partition partial top-k,
    # k-row merge on one reducer), THEN rank the k survivors — the
    # global row_number window only ever sees k rows, so the plan keeps
    # its distributed shape even if the vocabulary surprises you; a
    # global window over all survivors would funnel the whole table
    # through one partition.
    order = [F.col("info_gain").desc(), F.col("token").asc()]
    return (
        scored.orderBy(*order)
        .limit(k)
        .withColumn("rank", F.row_number().over(Window.orderBy(*order)))
    )
