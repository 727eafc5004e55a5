"""Sessionization and as-of join — unit semantics + plan-shape coverage.

Both operators claim a specific shuffle budget in their docstrings
(sessions.py: one Exchange reused by the aggregate; joins.py::asof_join:
one Exchange total for |L|+|R| rows). The plan tests pin those claims;
the semantic tests pin the boundary conditions the oracle data may not
exercise (gap exactly == gap_s, inclusive as-of match at equal time,
no-earlier-right nulls).
"""

import datetime
import re

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from ip_filter_spark.operators.joins import asof_join
from ip_filter_spark.operators.sessions import session_stats, sessionize


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def _n_exchanges(plan: str) -> int:
    # formatted mode details each node once as "(N) Exchange"; after an
    # action AQE appends an "Initial Plan" section that repeats every
    # node — count only the final/current plan
    return len(re.findall(r"\(\d+\) Exchange", plan.split("== Initial Plan ==")[0]))


def _ts(s: int) -> datetime.datetime:
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=s)


def _events(spark, rows):
    return spark.createDataFrame(
        [(u, e, _ts(t)) for u, e, t in rows], "user_id string, event_id long, ts timestamp"
    )


def test_sessionize_gap_boundary(spark):
    """gap == gap_s stays in-session (strict > opens a new one); the
    first event of every key always opens session 1."""
    df = _events(
        spark,
        [
            ("a", 1, 0),
            ("a", 2, 100),
            ("a", 3, 1900),   # gap 1800 == gap_s: same session
            ("a", 4, 3701),   # gap 1801 > gap_s: new session
            ("b", 5, 50),     # independent key
        ],
    )
    got = {
        r["event_id"]: r["session_idx"]
        for r in sessionize(df, gap_s=1800).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 2, 5: 1}


def test_sessionize_tie_break_deterministic(spark):
    """Equal timestamps: ordering falls to event_id, and the numbering is
    invariant to input order (gap within an equal-ts run is 0)."""
    rows = [("a", 3, 10), ("a", 1, 10), ("a", 2, 10), ("a", 4, 5000)]
    df = _events(spark, rows)
    df_rev = _events(spark, rows[::-1])
    expect = {1: 1, 2: 1, 3: 1, 4: 2}
    for d in (df, df_rev):
        got = {r["event_id"]: r["session_idx"] for r in sessionize(d, gap_s=1800).collect()}
        assert got == expect


def test_session_stats_values_and_single_exchange(spark):
    df = _events(spark, [("a", 1, 0), ("a", 2, 600), ("a", 3, 9000), ("b", 4, 7)])
    out = session_stats(df, gap_s=1800)
    got = {(r["user_id"], r["session_idx"]): r for r in out.collect()}
    assert got[("a", 1)]["n_events"] == 2
    assert got[("a", 1)]["duration_s"] == 600
    assert got[("a", 2)]["n_events"] == 1
    assert got[("a", 2)]["start_s"] == got[("a", 2)]["end_s"]
    assert got[("b", 1)]["n_events"] == 1
    # the groupBy on (key, session_idx) must reuse the window's
    # hashpartitioning(key) — one Exchange for the whole operator.
    # Explain a fresh (unexecuted) plan: after an action, AQE's explain
    # repeats every node in an Initial Plan section.
    assert _n_exchanges(_plan(session_stats(df, gap_s=1800))) == 1


def _asof_fixture(spark):
    left = _events(spark, [("a", 1, 50), ("a", 2, 100), ("a", 3, 10), ("b", 4, 99), ("c", 5, 70)])
    right = spark.createDataFrame(
        [("a", _ts(20), 200, 1.5), ("a", _ts(100), 300, 2.5), ("b", _ts(100), 400, 3.5)],
        "k string, rts timestamp, val long, price double",
    )
    return left, right


def test_asof_join_semantics(spark):
    left, right = _asof_fixture(spark)
    out = asof_join(left, right, "user_id", "k", "ts", "rts", ["val", "price"])
    out = out.withColumn("lt", F.col("ts").cast("long"))
    got = {
        r["event_id"]: (r["val"], r["price"], None if r["matched_t"] is None else r["lt"] - r["matched_t"])
        for r in out.collect()
    }
    assert len(got) == 5  # left-join: every left row survives
    assert got[1] == (200, 1.5, 30)      # left t=50 matches right t=20
    assert got[2] == (300, 2.5, 0)       # equal time matches (inclusive)
    assert got[3] == (None, None, None)  # before any right row
    assert got[4] == (None, None, None)  # right at 100 > left 99
    assert got[5] == (None, None, None)  # key with no right rows at all


def _intervals(spark, rows):
    return spark.createDataFrame(
        [(k, i, _ts(s), _ts(e)) for k, i, s, e in rows],
        "k string, iid long, start timestamp, stop timestamp",
    )


def test_range_join_semantics(spark):
    from ip_filter_spark.operators.joins import range_join

    left = _events(spark, [("a", 1, 50), ("a", 2, 100), ("a", 3, 9), ("b", 4, 60), ("c", 5, 60)])
    right = _intervals(
        spark,
        [
            ("a", 10, 10, 100),   # spans buckets 1..10 at bucket_s=10
            ("a", 11, 45, 55),    # overlaps event 1 only
            ("b", 12, 60, 60),    # degenerate single-point interval
            ("b", 13, 70, 50),    # end < start: dropped
        ],
    )
    out = range_join(left, right, "user_id", "k", "ts", "start", "stop", bucket_s=10)
    got = sorted((r["event_id"], r["iid"]) for r in out.collect())
    # ev1(t=50): in [10,100] and [45,55]; ev2(t=100): inclusive upper end
    # of [10,100] and matched ONCE though the interval spans 10 buckets;
    # ev3(t=9): before both; ev4(t=60): point interval inclusive both
    # ends; ev5: key with no intervals
    assert got == [(1, 10), (1, 11), (2, 10), (4, 12)]

    out_l = range_join(left, right, "user_id", "k", "ts", "start", "stop", bucket_s=10, how="left")
    got_l = sorted((r["event_id"], r["iid"]) for r in out_l.collect())
    assert got_l == [(1, 10), (1, 11), (2, 10), (3, None), (4, 12), (5, None)]


def test_range_join_no_nested_loop(spark):
    """The bucketed rewrite must plan as an equi-join on (key, bucket) —
    never the BroadcastNestedLoopJoin Catalyst picks for raw range
    predicates."""
    from ip_filter_spark.operators.joins import range_join

    left = _events(spark, [("a", 1, 50)])
    right = _intervals(spark, [("a", 10, 10, 100)])
    plan = _plan(range_join(left, right, "user_id", "k", "ts", "start", "stop", bucket_s=10))
    assert "NestedLoop" not in plan, plan
    assert "Cartesian" not in plan, plan


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_asof_join_random_vs_pandas(spark, seed):
    """Randomized agreement with pandas merge_asof (backward,
    inclusive) — integer epochs exercise the numeric-time path (the
    operator accepts longs as well as timestamps)."""
    rng = np.random.default_rng(seed)
    left = pd.DataFrame(
        {
            "lid": np.arange(300),
            "k": rng.integers(0, 8, 300),
            "t": rng.integers(0, 5000, 300),
        }
    )
    right = (
        pd.DataFrame(
            {
                "k": rng.integers(0, 10, 80),
                "rt": rng.integers(0, 5000, 80),
                "val": rng.integers(0, 10**6, 80),
            }
        )
        .drop_duplicates(["k", "rt"])
        .reset_index(drop=True)
    )
    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            "k", "k", "t", "rt", ["val"],
        )
        .toPandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    want = pd.merge_asof(
        left.sort_values("t", kind="stable"),
        right.sort_values("rt", kind="stable"),
        left_on="t", right_on="rt", by="k", direction="backward",
    ).sort_values("lid").reset_index(drop=True)
    a = {(r.lid, None if pd.isna(r.val) else int(r.val)) for r in got.itertuples()}
    b = {(r.lid, None if pd.isna(r.val) else int(r.val)) for r in want.itertuples()}
    assert a == b


@pytest.mark.parametrize("seed,bucket_s", [(0, 7), (1, 50), (2, 1000)])
def test_range_join_random_vs_pandas(spark, seed, bucket_s):
    """Randomized agreement with a brute-force containment reference,
    across bucket widths smaller than, near, and larger than the
    interval spans."""
    rng = np.random.default_rng(seed)
    left = pd.DataFrame(
        {"lid": np.arange(200), "k": rng.integers(0, 6, 200), "t": rng.integers(0, 2000, 200)}
    )
    start = rng.integers(0, 2000, 60)
    right = pd.DataFrame(
        {"rid": np.arange(60), "k": rng.integers(0, 6, 60), "s": start,
         "e": start + rng.integers(0, 300, 60)}
    )
    from ip_filter_spark.operators.joins import range_join

    out = range_join(
        spark.createDataFrame(left),
        spark.createDataFrame(right.rename(columns={"k": "rk"})),
        "k", "rk", "t", "s", "e", bucket_s=bucket_s,
    )
    got = sorted((r["lid"], r["rid"]) for r in out.collect())
    brute = left.merge(right, on="k")
    brute = brute[(brute.t >= brute.s) & (brute.t <= brute.e)]
    want = sorted(zip(brute.lid, brute.rid))
    assert got == want


def test_asof_join_single_exchange_no_join_node(spark):
    """The union-scan form: exactly one Exchange, and no join operator at
    all (the naive non-equi form would show BroadcastNestedLoopJoin)."""
    left, right = _asof_fixture(spark)
    plan = _plan(asof_join(left, right, "user_id", "k", "ts", "rts", ["val", "price"]))
    assert _n_exchanges(plan) == 1, plan
    assert "Join" not in plan, plan


@pytest.mark.parametrize("name", [
    "session_stats_events", "asof_join_events_orders", "range_join_purchase_windows",
    "rollup_event_counts", "salted_event_type_stats", "session_window_events",
])
def test_new_queries_partitioning_invariant(spark, name):
    """The answer must not depend on parallelism: same rows at 4 and 17
    shuffle partitions (17 is prime — no accidental alignment with the
    4-partition test session)."""
    from ip_filter_spark.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        key = lambda t: tuple(map(repr, t))  # rollup subtotals contain None
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        a = sorted(map(tuple, QUERIES[name](spark, sf).collect()), key=key)
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        b = sorted(map(tuple, QUERIES[name](spark, sf).collect()), key=key)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b


def test_funnel_milestones_semantics(spark):
    """Strictly-after ordering, mid-funnel stalls, and out-of-order
    events — against hand-computed milestones."""
    from datetime import datetime

    from ip_filter_spark.operators.sessions import funnel_milestones

    T = lambda s: datetime(2024, 1, 1, 0, 0, s)
    rows = [
        # u1 completes: view@1, click@3 (click@0 is BEFORE the view — ignored), purchase@5
        (1, T(0), "click"), (1, T(1), "view"), (1, T(3), "click"), (1, T(5), "purchase"),
        # u2 stalls after view: purchase@2 precedes any click
        (2, T(1), "view"), (2, T(2), "purchase"),
        # u3 never views (click+purchase only)
        (3, T(1), "click"), (3, T(2), "purchase"),
        # u4: click at the SAME ts as view must not count (strictly after)
        (4, T(1), "view"), (4, T(1), "click"), (4, T(2), "click"), (4, T(4), "purchase"),
    ]
    ev = spark.createDataFrame(rows, "user_id int, ts timestamp, event_type string")
    got = {r.user_id: (r.t0, r.t1, r.t2) for r in funnel_milestones(ev, ["view", "click", "purchase"]).collect()}
    assert got == {
        1: (T(1), T(3), T(5)),
        2: (T(1), None, None),
        3: (None, None, None),
        4: (T(1), T(2), T(4)),
    }


def test_asof_join_forward_direction(spark):
    """Forward as-of laws: smallest right time >= left time, INCLUSIVE
    equal-time match, nulls when no later right row, bad direction
    raises."""
    import pytest as _pytest

    from ip_filter_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, "k", "2024-01-01 00:00:10"), (2, "k", "2024-01-01 00:00:20"),
         (3, "k", "2024-01-01 00:00:35"), (4, "x", "2024-01-01 00:00:10")],
        "event_id long, k string, ts string",
    )
    right = spark.createDataFrame(
        [("k", "2024-01-01 00:00:20", 100.0), ("k", "2024-01-01 00:00:30", 200.0)],
        "k string, rt string, price double",
    )
    out = {r.event_id: r.price for r in asof_join(
        left, right, "k", "k", "ts", "rt", ["price"], direction="forward"
    ).collect()}
    assert out[1] == 100.0   # next right at 00:20
    assert out[2] == 100.0   # equal time matches (inclusive)
    assert out[3] is None    # nothing at or after 00:35
    assert out[4] is None    # key with no right rows
    with _pytest.raises(ValueError):
        asof_join(left, right, "k", "k", "ts", "rt", ["price"], direction="nearest")
