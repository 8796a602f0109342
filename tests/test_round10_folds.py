"""Ground-truth tests for the round-10 fold packs
(plans/round10_sched.py, plans/round10_replay.py).

These pin the SPARK results to an independent pure-Python replay of
each algorithm over the same parquet — a third spelling beside the
Spark fold and the DuckDB oracle.  That matters here specifically:
building this pack surfaced a DuckDB 1.0 ``list_reduce`` bug
(repeated subexpressions across struct fields mis-evaluate in long
folds), so engine-vs-engine agreement alone is not sufficient
evidence — both engines must match the replayed ground truth.
"""

from __future__ import annotations

import duckdb

from conftest import SF_DIR

from big_data_virus_analysis_spark.plans.catalog import CATALOG
from big_data_virus_analysis_spark.plans.round10_replay import (
    IVL_SEC_PER_CHAR,
    TB_CAP_MICRO,
    TB_RATE_MICRO,
    TB_TOPK,
)
from big_data_virus_analysis_spark.plans.round10_sched import SCHED_M


def _events(con):
    return con.execute(
        "SELECT user_id, epoch_us(ts), event_id, length(event_type) "
        f"FROM read_parquet('{SF_DIR}/events.parquet') ORDER BY 1, 2, 3"
    ).fetchall()


def test_interval_greedy_matches_pure_python_replay(spark):
    con = duckdb.connect()
    per_user: dict[int, list[tuple[int, int]]] = {}
    for uid, tsu, _eid, ln in _events(con):
        per_user.setdefault(uid, []).append(
            (tsu + ln * IVL_SEC_PER_CHAR * 1_000_000, tsu)
        )
    expect_hist: dict[int, int] = {}
    total = 0
    max_len = 0
    for uid, ivs in per_user.items():
        last, cnt = 0, 0
        for fin, st in sorted(ivs):
            if st >= last:
                last, cnt = fin, cnt + 1
        expect_hist[cnt] = expect_hist.get(cnt, 0) + 1
        total += cnt
        max_len = max(max_len, len(ivs))
    rows = (
        CATALOG["interval_greedy_sessions"].spark(spark, SF_DIR).collect()
    )
    got_hist = {r["n_selected"]: r["n_users"] for r in rows}
    assert got_hist == expect_hist
    assert rows[0]["total_selected"] == total
    assert rows[0]["max_seq_len"] == max_len


def test_token_bucket_matches_pure_python_replay(spark):
    con = duckdb.connect()
    per_user: dict[int, list[tuple[int, int]]] = {}
    for uid, tsu, eid, _ln in _events(con):
        per_user.setdefault(uid, []).append((tsu, eid))
    stats = {}
    for uid, evs in per_user.items():
        ts0, tok, alw, rej = 0, TB_CAP_MICRO, 0, 0
        for tsu, _eid in sorted(evs):
            tok = min(
                TB_CAP_MICRO,
                tok + ((tsu - ts0) * TB_RATE_MICRO) // 1_000_000,
            )
            if tok >= 1_000_000:
                tok, alw = tok - 1_000_000, alw + 1
            else:
                rej += 1
            ts0 = tsu
        stats[uid] = (len(evs), alw, rej)
    top = sorted(stats.items(), key=lambda kv: (-kv[1][2], kv[0]))[
        :TB_TOPK
    ]
    rows = (
        CATALOG["token_bucket_throttle_audit"].spark(spark, SF_DIR).collect()
    )
    got = [
        (r["user_id"], r["n_events"], r["allowed"], r["rejected"])
        for r in rows
    ]
    # rejected counts tie arbitrarily beyond the tie-break — compare
    # the deterministic (rejected desc, user_id asc) ordering exactly
    assert got == [(u, n, a, j) for u, (n, a, j) in top]
    assert rows[0]["total_allowed"] == sum(a for _, a, _j in stats.values())
    assert rows[0]["total_rejected"] == sum(j for _, _a, j in stats.values())
    assert rows[0]["n_throttled_users"] == sum(
        1 for _, _a, j in stats.values() if j > 0
    )


def test_lpt_fold_matches_pure_python_replay(spark):
    con = duckdb.connect()
    rows = con.execute(
        "SELECT CAST(o_orderdate AS DATE) d,"
        " sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) c "
        f"FROM read_parquet('{SF_DIR}/orders.parquet') GROUP BY 1"
    ).fetchall()
    jobs = [c for _d, c in sorted(rows, key=lambda r: (-r[1], r[0]))]
    loads = [0] * SCHED_M
    for j in jobs:
        loads[loads.index(min(loads))] += j
    got = CATALOG["lpt_makespan_daily"].spark(spark, SF_DIR).collect()
    assert [r["load_cents"] for r in got] == loads
    assert got[0]["makespan_cents"] == max(loads)
    assert got[0]["lb_max_cents"] == max(jobs)
    assert got[0]["lb_avg_cents"] == -(-sum(jobs) // SCHED_M)


def test_lis_and_dtw_match_pure_python_replay(spark):
    con = duckdb.connect()
    rows = con.execute(
        "SELECT CAST(o_orderdate AS DATE) d,"
        " sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) c "
        f"FROM read_parquet('{SF_DIR}/orders.parquet') GROUP BY 1 ORDER BY 1"
    ).fetchall()
    v = [c for _d, c in rows]

    def lis(vals, cmp):
        dp = []
        for i, x in enumerate(vals):
            best = 0
            for j in range(i):
                if cmp(vals[j], x) and dp[j] > best:
                    best = dp[j]
            dp.append(1 + best)
        return max(dp)

    got = CATALOG["lis_daily_revenue"].spark(spark, SF_DIR).collect()[0]
    assert got["n_days"] == len(v)
    assert got["lis_len"] == lis(v, lambda a, b: a < b)
    assert got["lds_len"] == lis(v, lambda a, b: a > b)

    per = con.execute(
        "SELECT month(o_orderdate) mo, day(o_orderdate) dom,"
        " sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) c "
        f"FROM read_parquet('{SF_DIR}/orders.parquet')"
        " WHERE month(o_orderdate) IN (1, 2) GROUP BY 1, 2 ORDER BY 1, 2"
    ).fetchall()
    a = [c for mo, _d, c in per if mo == 1]
    b = [c for mo, _d, c in per if mo == 2]

    def dtw(x, y):
        prev = None
        for i in range(1, len(x) + 1):
            row = []
            for j in range(1, len(y) + 1):
                c = abs(x[i - 1] - y[j - 1])
                if i == 1 and j == 1:
                    pass
                elif i == 1:
                    c += row[j - 2]
                elif j == 1:
                    c += prev[0]
                else:
                    c += min(prev[j - 1], row[j - 2], prev[j - 2])
                row.append(c)
            prev = row
        return prev[-1]

    got = (
        CATALOG["dtw_month_shape_distance"].spark(spark, SF_DIR).collect()[0]
    )
    assert (got["len_a"], got["len_b"]) == (len(a), len(b))
    assert got["dtw_ab"] == dtw(a, b)
    assert got["symmetric_ok"] and got["self_zero_ok"]
