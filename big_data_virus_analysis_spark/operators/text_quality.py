"""Text analysis for training-data pipelines: token statistics, quality
scoring, language identification, document fingerprinting.

All pure built-in expressions (array lambdas, regex, window functions) —
nothing leaves the JVM, every operator has an exact DuckDB oracle.
Patterns are kept to the regex subset where Java regex and RE2 agree.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..sources.tables import fan_out
from .caching import tracked_cache

#: word-token pattern shared with the oracle (letters | digits | single other)
TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

#: tiny per-language stopword lists for the n-gram/stopword heuristic
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "to", "and", "in", "is", "that", "it", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"),
    "es": ("el", "los", "las", "y", "es", "un", "una", "en", "por", "con"),
    "zh": ("de", "shi", "le", "zai", "you", "he", "wo", "ta", "men", "zhe"),
}


def _ws_tokens(text: Column) -> Column:
    return F.filter(F.split(text, " "), lambda t: F.length(t) > 0)


def token_stats(documents: DataFrame) -> DataFrame:
    """Per-doc token counting: whitespace tokens + regex (BPE-ish) tokens.

    Output: ``(doc_id, n_chars, n_ws_tokens, n_re_tokens, avg_token_len)``.
    """
    toks = _ws_tokens(F.col("text"))
    tok_len_sum = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, v: a + v
    )
    return documents.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        F.size(toks).alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(TOKEN_PATTERN), 0)).alias(
            "n_re_tokens"
        ),
        F.round(tok_len_sum.cast("double") / F.size(toks).cast("double"), 6).alias(
            "avg_token_len"
        ),
    )


def quality_score(documents: DataFrame) -> DataFrame:
    """Heuristic quality score in [0,1]:
    0.4·stopword-ratio + 0.3·length-score + 0.3·alpha-ratio.

    Output: ``(doc_id, stop_frac, len_score, alpha_frac, score)``.
    """
    toks = _ws_tokens(F.col("text"))
    stops = LANG_STOPWORDS["en"]
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*stops)))
    n_toks = F.size(toks)
    stop_frac = n_stop.cast("double") / n_toks.cast("double")
    len_score = F.least(F.lit(1.0), n_toks.cast("double") / F.lit(100.0))
    alpha_frac = (
        F.length(F.regexp_replace("text", "[^A-Za-z]", "")).cast("double")
        / F.length("text").cast("double")
    )
    return documents.select(
        "doc_id",
        F.round(stop_frac, 6).alias("stop_frac"),
        F.round(len_score, 6).alias("len_score"),
        F.round(alpha_frac, 6).alias("alpha_frac"),
        F.round(0.4 * stop_frac + 0.3 * len_score + 0.3 * alpha_frac, 6).alias("score"),
    )


def language_id(documents: DataFrame) -> DataFrame:
    """Stopword-profile language ID.

    Scores each candidate language by the fraction of the doc's tokens
    found in that language's stopword list; the winner (score desc, lang
    asc) is the prediction.  The candidate table is a literal — it rides
    as a broadcast build side.

    Output: ``(doc_id, pred_lang, score)``.
    """
    spark = documents.sparkSession
    lw = spark.createDataFrame(
        [(lang, w) for lang, words in sorted(LANG_STOPWORDS.items()) for w in words],
        ["cand_lang", "word"],
    )
    langs = lw.select("cand_lang").distinct()

    tokens = documents.select(
        "doc_id", F.explode(_ws_tokens(F.col("text"))).alias("word")
    )
    n_tokens = tokens.groupBy("doc_id").agg(F.count("*").alias("n_toks"))
    hits = (
        tokens.join(F.broadcast(lw), "word")
        .groupBy("doc_id", "cand_lang")
        .agg(F.count("*").alias("n_hits"))
    )
    scored = (
        n_tokens.crossJoin(F.broadcast(langs))
        .join(hits, ["doc_id", "cand_lang"], "left")
        .withColumn(
            "score",
            F.round(
                F.coalesce(F.col("n_hits"), F.lit(0)).cast("double")
                / F.col("n_toks").cast("double"),
                6,
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("cand_lang").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", F.col("cand_lang").alias("pred_lang"), "score")
    )


_FP_BASE = 257
_FP_MOD = 1_000_000_007
FP_K = 8  # k-gram width
FP_WINDOW = 4  # winnowing window


def _kgram_hash(chars: Column, i: Column) -> Column:
    """Polynomial rolling hash of chars[i .. i+K-1] (1-based), mod 1e9+7.

    Horner evaluation with a mod at each step keeps every intermediate
    below 257·(1e9+7) ≪ 2^63 in both engines.  Takes a pre-split char
    ARRAY, not the string: ``substr(text, i, 1)`` re-scans the UTF-8
    bytes from the start on every access (O(position)), which made the
    whole fingerprint pass O(n²) per document — array ``element_at`` is
    O(1) and 4× faster end-to-end.
    """
    h = F.lit(0).cast("bigint")
    for o in range(FP_K):
        c = F.ascii(F.element_at(chars, i + F.lit(o)))
        h = (h * _FP_BASE + c.cast("bigint")) % _FP_MOD
    return h


def _fingerprint_arrays(documents: DataFrame) -> DataFrame:
    """Shared winnowing pipeline: ``(doc_id, fps)`` with ``fps`` the
    deduped per-doc fingerprint array.  Entirely per-row array
    expressions — NO shuffle; each stage is its own projection column (a
    nested transform(..., slice(hashes, ...)) would re-evaluate the
    whole inner array once per outer element — O(n²·k) per row)."""
    max_pos = F.length("text") - (FP_K - 1)
    return (
        fan_out(documents)
        .where(max_pos >= FP_WINDOW)
        .select("doc_id", F.split("text", "").alias("chars"))
        .select(
            "doc_id",
            F.transform(
                F.sequence(F.lit(1), F.size("chars") - (FP_K - 1)),
                lambda i: _kgram_hash(F.col("chars"), i),
            ).alias("hashes"),
        )
        .select(
            "doc_id",
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.size("hashes") - (FP_WINDOW - 1)),
                    lambda j: F.array_min(F.slice(F.col("hashes"), j, FP_WINDOW)),
                )
            ).alias("fps"),
        )
    )


def doc_fingerprints(documents: DataFrame) -> DataFrame:
    """Winnowing fingerprints (k=8 char-grams, window=4).

    Classic scheme: hash every k-gram, keep the min hash of each
    sliding window of 4 consecutive hashes, dedup.  Output is an
    oracle-friendly digest per doc: ``(doc_id, n_fp, fp_checksum)``.

    An earlier version exploded one row per character position
    (duplicating the full text onto every row) and ran two windows over
    it; the shared array pipeline has no shuffle at all — the final
    digest is a plain projection.  Per-row cost is the same O(n·k)
    arithmetic.
    """
    return _fingerprint_arrays(documents).select(
        "doc_id",
        F.size("fps").cast("bigint").alias("n_fp"),
        F.aggregate("fps", F.lit(0).cast("bigint"), lambda a, x: a + x).alias(
            "fp_checksum"
        ),
    )


def fingerprint_overlap_pairs(
    documents: DataFrame, min_shared: int = 50
) -> DataFrame:
    """Winnowing-fingerprint overlap pairs — the MOSS plagiarism-
    detection method (Schleimer et al. 2003, "Winnowing: Local
    Algorithms for Document Fingerprinting" — public) as a near-dup
    pair generator beside the Jaccard / MinHash / SimHash / embedding /
    span families.

    Pairs sharing ≥ ``min_shared`` fingerprints surface via an
    inverted-index self-join keyed on the fingerprint hash — a
    well-distributed bigint key, the same cached build-then-probe shape
    as the other dedup joins.

    Output: ``(doc_a, doc_b, n_shared)`` with doc_a < doc_b.
    """
    # cache the ARRAY frame, not the exploded one: a Generate (explode)
    # consuming the staged projections lets Catalyst collapse them back
    # into one expression — re-inlining split(text) into every
    # element_at, the O(n²·k) trap the staging exists to avoid (observed
    # as a >100× hang).  The InMemoryRelation is a hard barrier, and the
    # self-join needs the index cached anyway.
    fps = (
        _fingerprint_arrays(documents)
        .transform(tracked_cache)
        .select("doc_id", F.explode("fps").alias("fp"))
    )
    a = fps.alias("a")
    b = fps.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )


def tfidf_top_terms(documents: DataFrame, m: int = 3) -> DataFrame:
    """Top-``m`` TF-IDF terms per document.

    tf = term count / doc token count; idf = ln(N / df) with df = number
    of documents containing the term.  Rank by tfidf desc with token-asc
    tiebreak so results are stable across engines.

    Scale shape: the exploded corpus is shuffled exactly ONCE — into the
    (doc, token) count aggregate.  Doc length and document frequency are
    windows over that (much smaller) aggregate rather than separate
    aggregations of the raw token table, and the corpus total is a
    single-row broadcast.  No collect anywhere.

    Output: ``(doc_id, token, tfidf, rank)``.
    """
    toks = (
        fan_out(documents)
        .select("doc_id", F.explode(_ws_tokens(F.col("text"))).alias("token"))
    )
    tf = toks.groupBy("doc_id", "token").agg(F.count("*").alias("cnt"))
    totals = documents.agg(F.count("*").alias("nd"))
    scored = (
        tf.withColumn("dfc", F.count("*").over(Window.partitionBy("token")))
        .withColumn("dlen", F.sum("cnt").over(Window.partitionBy("doc_id")))
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "tfidf",
            F.round(
                (F.col("cnt").cast("double") / F.col("dlen").cast("double"))
                * F.log(F.col("nd").cast("double") / F.col("dfc").cast("double")),
                6,
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("token").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= m)
        .select("doc_id", "token", "tfidf", "rank")
    )


#: PII patterns kept to the regex subset where Java regex and RE2 agree
#: (no backrefs, no lookaround)
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"),
    ("url", r"https?://[^\s]+"),
    ("phone", r"\+?[0-9][0-9()\s\-]{6,}[0-9]"),
)


def pii_scrub(documents: DataFrame) -> DataFrame:
    """Redact emails, URLs, and phone numbers from ``text`` — the
    standard scrubbing pass before a corpus becomes training data.

    Pure regexp_replace chain (one projection, no shuffle, JVM-side);
    per-doc redaction counts come from counting matches BEFORE
    replacement so the operation is auditable.

    Output: ``(doc_id, clean_text, n_email, n_url, n_phone)``.
    """
    out = fan_out(documents).select("doc_id", F.col("text").alias("clean_text"))
    counts = []
    for name, pat in PII_PATTERNS:
        out = out.withColumn(
            f"n_{name}",
            F.size(F.regexp_extract_all(F.col("clean_text"), F.lit(pat), 0)),
        )
        counts.append(f"n_{name}")
        out = out.withColumn(
            "clean_text",
            F.regexp_replace(F.col("clean_text"), pat, f"<{name.upper()}>"),
        )
    return out.select("doc_id", "clean_text", *counts)
