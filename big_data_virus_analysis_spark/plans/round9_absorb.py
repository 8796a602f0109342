"""Round-9 absorbing-Markov-chain pack: eventual-conversion
probability by starting state — the fundamental-matrix family
(Kemeny & Snell, "Finite Markov Chains" ch. 3) the catalog did not
yet cover (``markov_two_step_dist`` walks two steps; this solves the
absorption limit, with an exact error bracket instead of a float
linear solve).

* ``markov_absorption_conversion`` — states are event types with
  ``purchase`` absorbing; transitions are consecutive events per user
  (ordered by ts, event_id — the event_transition_matrix convention).
  The absorption probability p = Σ_{k≥0} Qᵏ r is evaluated as the
  TRUNCATED Neumann series after ``ABSORB_SWEEPS`` sweeps of
  p ← r + Q·p in exact integer micro-units — every term is
  ``(cnt·p) div tot`` (multiply-then-floor-divide), so both engines
  walk the identical trajectory.  Beside the lower bound p_micro the
  query emits the still-unabsorbed mass m = Qᵀ·1 (same sweep count,
  same arithmetic): the TRUE absorption probability provably lies in
  [p, p + m] (+ a ≤ sweeps·states micro quantization slack) — the
  truncation error is DATA, not an assumption.

100-TB shape: one events scan → user-partitioned lead window →
25-cell transition hash aggregate; every sweep thereafter is a join
over the ≤5-row state frame (constant work, localCheckpoint'd every
4th sweep so the 32-sweep chain replays nothing while lineage stays
bounded — the round9_iter discipline).

Identity property (tests/test_properties.py): on random absorbing
chains the bracket holds against the EXACT fundamental-matrix
solution computed in fractions.Fraction (p* solved by Gaussian
elimination over rationals; assert p ≤ p* ≤ p + m + slack), and the
quantized sweep matches a pure-Python reimplementation bit-for-bit.

No reference counterpart (sequence-analytics extension alongside
plans/sequences.py); public theory only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.caching import tracked_cache
from ..sources.tables import load_table
from .catalog import QuerySpec

#: Neumann sweeps — residual (unabsorbed mass) is EMITTED, not assumed
ABSORB_SWEEPS = 32
#: micro-units
ABSORB_SCALE = 1_000_000
#: the absorbing (conversion) state
ABSORB_STATE = "purchase"


def _transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(cur, nxt, cnt, tot) over consecutive per-user events."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.unix_micros("ts"), "event_id"
    )
    pairs = (
        ev.select(
            "user_id",
            F.col("event_type").alias("cur"),
            F.lead("event_type").over(w).alias("nxt"),
        )
        .where(F.col("nxt").isNotNull() & (F.col("cur") != ABSORB_STATE))
        .groupBy("cur", "nxt")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    tot = pairs.groupBy("cur").agg(F.sum("cnt").alias("tot"))
    return tracked_cache(pairs.join(tot, "cur"))


def _q_markov_absorption_conversion(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    trans = _transitions(spark, sf_dir)
    # r_micro per state (0 when a state never directly precedes a
    # purchase) and the state list
    states = trans.select("cur").distinct()
    r = trans.where(F.col("nxt") == ABSORB_STATE).select(
        "cur",
        F.expr(
            f"CAST((CAST(cnt AS DECIMAL(38,0)) * {ABSORB_SCALE})"
            " div tot AS BIGINT)"
        ).alias(
            "r"
        ),
    )
    pm = (
        states.join(r, "cur", "left")
        .select(
            "cur",
            F.coalesce(F.col("r"), F.lit(0)).alias("r"),
            F.lit(0).cast("bigint").alias("p"),
            F.lit(ABSORB_SCALE).cast("bigint").alias("m"),
        )
        .localCheckpoint(eager=True)
    )
    q = trans.where(F.col("nxt") != ABSORB_STATE)
    for sweep in range(1, ABSORB_SWEEPS + 1):
        stepped = (
            q.join(
                pm.select(
                    F.col("cur").alias("nxt"),
                    F.col("p").alias("p_nxt"),
                    F.col("m").alias("m_nxt"),
                ),
                "nxt",
            )
            .groupBy("cur")
            .agg(
                F.sum(
                    F.expr(
                        "CAST((CAST(cnt AS DECIMAL(38,0)) * p_nxt)"
                        " div tot AS BIGINT)"
                    )
                ).alias("qp"),
                F.sum(
                    F.expr(
                        "CAST((CAST(cnt AS DECIMAL(38,0)) * m_nxt)"
                        " div tot AS BIGINT)"
                    )
                ).alias("qm"),
            )
        )
        pm = (
            pm.select("cur", "r")
            .join(stepped, "cur", "left")
            .select(
                "cur",
                "r",
                (F.col("r") + F.coalesce(F.col("qp"), F.lit(0))).alias("p"),
                F.coalesce(F.col("qm"), F.lit(0)).alias("m"),
            )
        )
        # checkpoint every 4th sweep (Spark-side cadence only — the
        # trajectory is identical; lineage stays ≤4 sweeps deep while
        # cutting the tiny-frame checkpoint jobs 4x)
        if sweep % 4 == 0 or sweep == ABSORB_SWEEPS:
            pm = pm.localCheckpoint(eager=True)
    return pm.select(
        F.col("cur").alias("state"),
        F.col("p").alias("p_absorb_micro"),
        F.col("m").alias("unabsorbed_micro"),
        F.round(F.col("p").cast("double") / ABSORB_SCALE, 4).alias(
            "p_convert"
        ),
    ).orderBy("state")


def _sql_absorption() -> str:
    parts = [
        f"""
WITH pairs AS (
  SELECT user_id, event_type AS cur,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY epoch_us(ts), event_id) AS nxt
  FROM events
), trans AS MATERIALIZED (
  SELECT cur, nxt, count(*) AS cnt,
         sum(count(*)) OVER (PARTITION BY cur) AS tot
  FROM pairs WHERE nxt IS NOT NULL AND cur <> '{ABSORB_STATE}'
  GROUP BY cur, nxt
), pm0 AS MATERIALIZED (
  SELECT s.cur,
         COALESCE((SELECT CAST((CAST(cnt AS HUGEINT) * {ABSORB_SCALE}) // tot AS BIGINT)
                   FROM trans t WHERE t.cur = s.cur
                     AND t.nxt = '{ABSORB_STATE}'), 0) AS r,
         CAST(0 AS BIGINT) AS p,
         CAST({ABSORB_SCALE} AS BIGINT) AS m
  FROM (SELECT DISTINCT cur FROM trans) s
), q AS MATERIALIZED (
  SELECT cur, nxt, cnt, tot FROM trans WHERE nxt <> '{ABSORB_STATE}'
)"""
    ]
    prev = "pm0"
    for t in range(1, ABSORB_SWEEPS + 1):
        parts.append(
            f""", pm{t} AS MATERIALIZED (
  SELECT base.cur, base.r,
         base.r + COALESCE(st.qp, 0) AS p,
         COALESCE(st.qm, 0) AS m
  FROM (SELECT cur, r FROM {prev}) base
  LEFT JOIN (
    SELECT q.cur,
           sum(CAST((CAST(q.cnt AS HUGEINT) * pv.p) // q.tot AS BIGINT)) AS qp,
           sum(CAST((CAST(q.cnt AS HUGEINT) * pv.m) // q.tot AS BIGINT)) AS qm
    FROM q JOIN {prev} pv ON q.nxt = pv.cur
    GROUP BY q.cur
  ) st ON base.cur = st.cur
)"""
        )
        prev = f"pm{t}"
    parts.append(
        f"""
SELECT cur AS state, p AS p_absorb_micro, m AS unabsorbed_micro,
       round(CAST(p AS DOUBLE) / {ABSORB_SCALE}, 4) AS p_convert
FROM {prev}
ORDER BY state
"""
    )
    return "".join(parts)


SPECS: dict[str, QuerySpec] = {
    "markov_absorption_conversion": QuerySpec(
        _q_markov_absorption_conversion,
        _sql_absorption(),
        "eventual purchase-absorption probability by starting event "
        "state: 32 exact integer micro-unit Neumann sweeps p <- r + Qp "
        "with the unabsorbed mass emitted as the truncation bracket "
        "[p, p + m]",
    ),
}
