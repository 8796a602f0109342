"""Scalar text expressions (all built-ins — no Python UDFs).

Each helper corresponds to a reference scalar op (SURVEY.md §2.2) and is
a Column-in/Column-out function so it composes inside whole-stage
codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def clean_api_expr(c: Column) -> Column:
    """Strip spaces, '+', '-', '\\r' from a raw log line.

    Reference FeatureSelectionCloud.scala:333-337 (replace list) plus the
    explicit CR strip the reference got implicitly from textFile.
    """
    return F.regexp_replace(c, r"[ +\-\r]", "")


def label_encode(cls: Column, positive: str = "virus") -> Column:
    """class string -> 0.0/1.0 (reference FeatureSelectionCloud.scala:452-456)."""
    return F.when(cls == positive, F.lit(1.0)).otherwise(F.lit(0.0))


def label_decode(label: Column) -> Column:
    """0.0 -> 'Clean', else 'Virus' (reference SVMDT.scala:229-238)."""
    return F.when(label == 0.0, F.lit("Clean")).otherwise(F.lit("Virus"))


def whitespace_tokens(text: Column) -> Column:
    """Split on runs of whitespace, dropping empty tokens."""
    return F.filter(F.split(text, r"\s+"), lambda t: F.length(t) > 0)


def shingles(line: Column, width: int = 14) -> Column:
    """All uppercased sliding character windows of ``width`` as an array.

    The reference's byte-mode tokenizer uppercases a hexdump line and
    emits every 14-char (7-byte) window (createByteFeatures, reference
    FeatureSelectionCloud.scala:257-321, window at :306).  Expressed as
    ``transform(sequence(...))`` — a UDTF-free explode-ready array; no
    Python in the loop.
    """
    n = F.length(line) - F.lit(width - 1)
    return F.when(
        n > 0,
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.upper(line.substr(i, F.lit(width))),
        ),
    ).otherwise(F.array().cast("array<string>"))
