"""Distributed PCA over an embedding column — the RowMatrix recipe.

Spark's own ``RowMatrix.computePrincipalComponents`` works exactly this
way: the d×d covariance (gram) matrix is aggregated DISTRIBUTED (d²
cells ≪ corpus, one pass), the eigendecomposition of that tiny matrix
runs on the driver, and the resulting components broadcast back for a
distributed projection.  d=64 here ⇒ the driver step is a 64×64
``numpy.linalg.eigh`` — microseconds, independent of corpus size.

The covariance aggregation is also exposed as a catalog query with a
DECIMAL-exact oracle (`embedding_covariance_cells` in plans/catalog.py)
— the distributed half is what needs cross-engine verification; the
eigensolve is deterministic given identical input cells (verified by
invariant tests instead: orthonormality, eigenvalue/variance match).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(28,12)"


def covariance_cells(embeddings: DataFrame) -> DataFrame:
    """Upper-triangle population-covariance cells of the embedding
    columns: ``(i, j, cov)`` for i ≤ j.  One pass: per-row outer-
    product terms are built array-side (nested transform → flatten →
    single explode), summed with DECIMAL exactness, and combined with
    the (equally exact) per-dimension means.  Output cardinality is
    d(d+1)/2 regardless of corpus size."""
    emb = embeddings.select(F.col("embedding"))
    d = F.size("embedding")
    # (i, j) packed into one int key (i*d + j) so the exploded rows are
    # a slim (int, double) pair instead of a 3-field struct — ~2× less
    # explode traffic for the d²/2-per-row expansion
    pairs = F.flatten(
        F.transform(
            F.sequence(F.lit(0), d - 1),
            lambda i: F.transform(
                F.sequence(i, d - 1),
                lambda j: F.struct(
                    (i * d + j).cast("int").alias("k"),
                    (
                        F.element_at("embedding", i + 1).cast("double")
                        * F.element_at("embedding", j + 1).cast("double")
                    ).alias("xy"),
                ),
            ),
        )
    )
    cells = (
        emb.select(F.explode(pairs).alias("p"), d.alias("d"))
        .select("p.k", "p.xy", "d")
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum(F.col("xy").cast(_DEC)).alias("sxy"),
            F.first("d").alias("d"),
        )
        .select(
            (F.col("k") / F.col("d")).cast("int").alias("i"),
            (F.col("k") % F.col("d")).alias("j"),
            "n",
            "sxy",
        )
    )
    grid = embeddings.select(
        F.posexplode("embedding").alias("pos", "x")
    ).select("pos", F.col("x").cast("double").alias("xd"))
    means = grid.groupBy("pos").agg(
        (F.sum(F.col("xd").cast(_DEC)).cast("double") / F.count(F.lit(1))).alias("m")
    )
    mi = means.select(F.col("pos").alias("pi"), F.col("m").alias("mi"))
    mj = means.select(F.col("pos").alias("pj"), F.col("m").alias("mj"))
    return (
        cells.join(F.broadcast(mi), F.col("i") == F.col("pi"))
        .join(F.broadcast(mj), F.col("j") == F.col("pj"))
        .select(
            "i",
            "j",
            # + 0.0 folds a rounded −0.0 to +0.0 (engine-neutral form)
            (
                F.round(
                    F.col("sxy").cast("double") / F.col("n")
                    - F.col("mi") * F.col("mj"),
                    6,
                )
                + F.lit(0.0)
            ).alias("cov"),
        )
    )


def pca_project(embeddings: DataFrame, k: int = 2) -> DataFrame:
    """Project embeddings onto their top-``k`` principal components.

    Distributed covariance (above) → driver ``eigh`` on the d×d matrix
    → components broadcast as array literals → per-row projection with
    ``aggregate`` over zipped arrays (JVM-side, no UDF).  Sign
    convention: each component's largest-|loading| entry is made
    positive, so results are deterministic across eigensolver builds.
    Returns ``(vec_id, pc1..pck)`` plus the explained-variance ratios
    as metadata columns (same value every row; cheap, self-describing).
    """
    import numpy as np

    cells = covariance_cells(embeddings).collect()  # d(d+1)/2 rows — tiny
    d = max(c.j for c in cells) + 1
    cov = np.zeros((d, d))
    for c in cells:
        cov[c.i, c.j] = cov[c.j, c.i] = c.cov
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    comps, evr = [], []
    total = float(vals.sum())
    for idx in order:
        v = vecs[:, idx]
        if abs(v.min()) > abs(v.max()):
            v = -v
        comps.append(v)
        evr.append(float(vals[idx]) / total)

    grid = embeddings.select("vec_id", "embedding")
    out = grid
    for c_i, (v, r) in enumerate(zip(comps, evr), start=1):
        lit_vec = F.array(*[F.lit(float(x)) for x in v])
        dot = F.expr(
            "aggregate(zip_with(embedding, {vec}, (a, b) -> CAST(a AS DOUBLE) * b),"
            " 0D, (acc, x) -> acc + x)".format(vec="comp_vec")
        )
        out = (
            out.withColumn("comp_vec", lit_vec)
            .withColumn(f"pc{c_i}", F.round(dot, 6))
            .withColumn(f"evr{c_i}", F.lit(round(r, 6)))
            .drop("comp_vec")
        )
    return out.drop("embedding")
