"""Structured Streaming: incremental sketch build + watermarked windows.
Uses file-source streams over the events table with availableNow triggers
so tests are deterministic and bounded."""

import shutil

import pytest
from pyspark.sql import functions as F

from ip_filter_spark.engine import SketchSpec
from ip_filter_spark.streaming import (
    merged_sketches_from_store,
    running_distinct_by_key,
    stream_sketch_build,
    windowed_event_counts,
)


@pytest.fixture()
def events_stream_dir(spark, sf_dir, tmp_path):
    src = str(tmp_path / "events_src")
    spark.read.parquet(f"{sf_dir}/events.parquet").repartition(4).write.parquet(src)
    return src


def test_stream_sketch_build_matches_batch(spark, sf_dir, events_stream_dir, tmp_path):
    batch = spark.read.parquet(events_stream_dir)
    stream = spark.readStream.schema(batch.schema).option("maxFilesPerTrigger", 2).parquet(events_stream_dir)
    specs = [SketchSpec("hll", {"p": 14}), SketchSpec("bloom", {"fpp": 1e-4, "n": 10000})]
    store = str(tmp_path / "store")
    q = stream_sketch_build(
        stream,
        specs,
        store_dir=store,
        checkpoint_dir=str(tmp_path / "ckpt"),
        key=F.col("user_id").cast("string"),
    )
    q.awaitTermination(300)
    got = merged_sketches_from_store(spark, store, specs)
    exact = batch.select(F.countDistinct("user_id")).first()[0]
    hll = got[specs[0].key()]
    assert abs(hll.estimate() - exact) / exact <= 4 * hll.rel_error_bound()
    # partial store carries batch lineage
    lineage = spark.read.parquet(store)
    assert lineage.select("batch_id").distinct().count() >= 2  # multiple micro-batches


def test_stateful_running_distinct(spark, events_stream_dir, tmp_path):
    """applyInPandasWithState custom operator: per-event-type running HLL
    distinct-user estimates converge to the batch exact counts."""
    batch = spark.read.parquet(events_stream_dir)
    stream = spark.readStream.schema(batch.schema).option("maxFilesPerTrigger", 1).parquet(events_stream_dir)
    out = running_distinct_by_key(stream, "event_type", "user_id")
    q = (
        out.writeStream.format("memory")
        .queryName("running_distinct")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "rd_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = spark.sql(
        "select key, estimate, rows_seen from ("
        " select *, row_number() over (partition by key order by rows_seen desc) rn"
        " from running_distinct) where rn = 1"
    ).collect()
    got = {r.key: r for r in rows}
    exact = {
        r.event_type: (r.n_users, r.n_rows)
        for r in batch.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n_users"), F.count("*").alias("n_rows"))
        .collect()
    }
    assert set(got) == set(exact)
    for key, (n_users, n_rows) in exact.items():
        assert got[key].rows_seen == n_rows  # state accumulated across all micro-batches
        assert abs(got[key].estimate - n_users) / n_users <= 0.1  # p=12 → 1.6% σ


def test_windowed_event_counts_matches_batch(spark, events_stream_dir, tmp_path):
    batch = spark.read.parquet(events_stream_dir)
    stream = spark.readStream.schema(batch.schema).parquet(events_stream_dir)
    out = windowed_event_counts(stream, window="6 hours", watermark="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "wc_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r.window_start, r.event_type): (r.n, r.total_value)
        for r in spark.sql("select * from win_counts").collect()
    }
    want_df = (
        batch.groupBy(F.window("ts", "6 hours").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("ws"), "event_type", "n", "total_value")
    )
    want = {(r.ws, r.event_type): (r.n, r.total_value) for r in want_df.collect()}
    # append-mode emits only windows closed by the watermark; every emitted
    # window must match batch truth, and most windows must have been emitted
    assert got
    for key, val in got.items():
        assert key in want and abs(val[1] - want[key][1]) < 1e-6 and val[0] == want[key][0]
    assert len(got) >= len(want) - 4  # at most the last watermark-open windows withheld


def test_stream_heavy_hitters_matches_batch(spark, events_stream_dir, tmp_path):
    """Streaming MG (micro-batch partials, merge-on-read) must satisfy the
    same deterministic bound as the batch build, and with capacity above
    the key cardinality it must equal the exact streaming GROUP BY."""
    from ip_filter_spark.streaming import merged_heavy_hitters, stream_heavy_hitters

    batch = spark.read.parquet(events_stream_dir)
    stream = spark.readStream.schema(batch.schema).option("maxFilesPerTrigger", 2).parquet(events_stream_dir)
    store = str(tmp_path / "mg_store")
    q = stream_heavy_hitters(
        stream, "event_type", store_dir=store, checkpoint_dir=str(tmp_path / "mg_ckpt"), capacity=64
    )
    q.awaitTermination(300)
    sk = merged_heavy_hitters(spark, store)
    exact = {str(r.event_type): r["count"] for r in batch.groupBy("event_type").count().collect()}
    assert sk.err == 0  # cardinality below capacity → exact
    assert {k: e for k, e, _ in sk.items()} == exact
    # capacity-stressed stream still bounds every estimate
    stream2 = spark.readStream.schema(batch.schema).option("maxFilesPerTrigger", 2).parquet(events_stream_dir)
    store2 = str(tmp_path / "mg_store2")
    q2 = stream_heavy_hitters(
        stream2, "user_id", store_dir=store2, checkpoint_dir=str(tmp_path / "mg_ckpt2"), capacity=8
    )
    q2.awaitTermination(300)
    sk2 = merged_heavy_hitters(spark, store2)
    exact2 = {str(r.user_id): r["count"] for r in batch.groupBy("user_id").count().collect()}
    n = sum(exact2.values())
    assert sk2.n_items == n
    for key, est, upper in sk2.items():
        assert est <= exact2[key] <= upper, (key, est, exact2[key], upper)


def test_compact_store_preserves_merged_state(spark, events_stream_dir, tmp_path):
    """Compacting the partial store must not change the merged answer,
    and appending post-compaction partials must keep merging correctly."""
    from ip_filter_spark.streaming import merged_sketches_from_store
    from ip_filter_spark.streaming.sketch_stream import compact_store, stream_sketch_build

    batch = spark.read.parquet(events_stream_dir)
    stream = spark.readStream.schema(batch.schema).option("maxFilesPerTrigger", 2).parquet(events_stream_dir)
    specs = [SketchSpec("hll", {"p": 14})]
    store = str(tmp_path / "store_c")
    stream_sketch_build(
        stream, specs, store_dir=store, checkpoint_dir=str(tmp_path / "ck_c"),
        key=F.col("user_id").cast("string"),
    ).awaitTermination(300)
    before = merged_sketches_from_store(spark, store, specs)[specs[0].key()]
    n_rows_before = spark.read.parquet(store).count()
    n_after = compact_store(spark, store)
    assert n_after < n_rows_before
    mid = merged_sketches_from_store(spark, store, specs)[specs[0].key()]
    assert mid.to_bytes() == before.to_bytes()
    # a second streaming run (same source, fresh checkpoint) appends more
    # partials on top of the compacted row; the merge still holds
    stream2 = spark.readStream.schema(batch.schema).option("maxFilesPerTrigger", 2).parquet(events_stream_dir)
    stream_sketch_build(
        stream2, specs, store_dir=store, checkpoint_dir=str(tmp_path / "ck_c2"),
        key=F.col("user_id").cast("string"),
    ).awaitTermination(300)
    after = merged_sketches_from_store(spark, store, specs)[specs[0].key()]
    # HLL register max is idempotent under duplicate ingestion (n_items
    # lineage legitimately doubles — it counts ingested rows)
    assert (after.registers == before.registers).all()
    assert after.estimate() == before.estimate()
    assert after.n_items == 2 * before.n_items


def test_stream_session_merges_across_microbatches(spark, tmp_path):
    """A session whose events arrive in DIFFERENT micro-batches must be
    emitted as ONE merged session (the state-store merge path), and a
    session closed in-stream must match the batch operator exactly."""
    import datetime
    import time

    from ip_filter_spark.streaming import stream_session_stats

    t0 = datetime.datetime(2024, 1, 1)

    def rows(*secs):
        return [(1, t0 + datetime.timedelta(seconds=s)) for s in secs]

    src = str(tmp_path / "src")
    # file 1: two events of session A; file 2: one MORE event of session
    # A (within gap) plus session B (far later). maxFilesPerTrigger=1
    # puts them in separate micro-batches.
    spark.createDataFrame(rows(0, 100), "user_id long, ts timestamp").coalesce(1).write.parquet(src)
    time.sleep(1.1)
    spark.createDataFrame(rows(200, 10_000), "user_id long, ts timestamp").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    time.sleep(1.1)
    # sentinel far past everything flushes both sessions
    spark.createDataFrame(rows(10_000_000), "user_id long, ts timestamp").coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_session_stats(
        stream, key="user_id", ts="ts", gap="5 minutes", watermark_delay="0 seconds",
        out_dir=str(tmp_path / "out"), checkpoint_dir=str(tmp_path / "ckpt"),
    )
    assert q.awaitTermination(240), "stream did not finish"
    out = spark.read.parquet(str(tmp_path / "out"))
    got = sorted(
        (r["start"], r["end"], r["n"])
        for r in out.select(
            F.col("session_window.start").cast("long").alias("start"),
            F.col("session_window.end").cast("long").alias("end"),
            F.col("n_events").alias("n"),
        ).collect()
        if r["start"] < 1704067200 + 10_000_000  # drop the sentinel session
    )
    base = 1704067200  # 2024-01-01 UTC
    # session A: events at 0,100,200 -> [0, 200+300); session B: one event
    assert got == [(base, base + 500, 3), (base + 10_000, base + 10_300, 1)]


def test_stream_dedup_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark path: duplicates arriving inside the
    watermark window are caught; state is evictable (the bounded-state
    mode for unbounded streams)."""
    from ip_filter_spark.streaming import stream_exact_dedup

    src = str(tmp_path / "src")
    rows = [(k, f"2024-01-01 00:{m:02d}:00") for m in range(10) for k in ("a", "b")]
    df = spark.createDataFrame(rows, "k string, ts string")
    # duplicate every row in a second file set, same event times
    df.repartition(2).write.parquet(src)
    df.repartition(2).write.mode("append").parquet(src)
    stream = spark.readStream.schema("k string, ts string").option("maxFilesPerTrigger", 1).parquet(src)
    q = stream_exact_dedup(
        stream,
        ["k", "ts"],
        out_dir=str(tmp_path / "out"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        within_watermark=("ts", "2 hours"),
    )
    assert q.awaitTermination(300)
    out = spark.read.parquet(str(tmp_path / "out"))
    # every (k, minute) emitted exactly once despite arriving twice
    assert out.count() == 20
    assert out.groupBy("k", "ts").count().where("count > 1").count() == 0


def test_stream_interval_join_matches_across_micro_batches(spark, tmp_path):
    """A click arriving in a LATER micro-batch than its purchase (and the
    reverse) must still pair: stream-stream join state buffers both
    sides. One file per trigger forces the cross-batch path."""
    import time

    from pyspark.sql import functions as F

    from ip_filter_spark.streaming import stream_interval_join

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    base = 1_700_000_000
    # file 1: purchase by u1 at t0; click by u2 at t0+100 (purchase comes later)
    f1 = spark.createDataFrame(
        [(10, 1, base, "purchase"), (21, 2, base + 100, "click")],
        "event_id long, user_id long, t long, event_type string",
    )
    # file 2: click by u1 at t0+200 (matches file 1's purchase);
    #         purchase by u2 at t0+50 (matches file 1's click)
    f2 = spark.createDataFrame(
        [(22, 1, base + 200, "click"), (11, 2, base + 50, "purchase")],
        "event_id long, user_id long, t long, event_type string",
    )
    src_c, src_p = str(tmp_path / "clicks"), str(tmp_path / "purch")
    for i, f in enumerate([f1, f2]):
        ev = f.withColumn("ts", F.col("t").cast("timestamp"))
        ev.where(F.col("event_type") == "click").select(
            "event_id", "user_id", F.col("ts").alias("c_ts")
        ).coalesce(1).write.mode("append").parquet(src_c)
        ev.where(F.col("event_type") == "purchase").select(
            F.col("event_id").alias("purchase_id"), F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        ).coalesce(1).write.mode("append").parquet(src_p)
        time.sleep(1.1)  # distinct mtimes -> deterministic file order
    cs = (
        spark.readStream.schema("event_id long, user_id long, c_ts timestamp")
        .option("maxFilesPerTrigger", 1).parquet(src_c)
    )
    ps = (
        spark.readStream.schema("purchase_id long, p_user long, p_ts timestamp")
        .option("maxFilesPerTrigger", 1).parquet(src_p)
    )
    q = stream_interval_join(
        cs, ps, left_on="user_id", right_on="p_user", left_ts="c_ts", right_ts="p_ts",
        upper_s=3600, watermark_left="1 hour", watermark_right="1 hour",
        out_dir=str(tmp_path / "out"), checkpoint_dir=str(tmp_path / "ckpt"),
    )
    assert q.awaitTermination(120), "stream join did not finish"
    got = {
        (r.event_id, r.purchase_id)
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    assert got == {(22, 10), (21, 11)}, got


def test_stream_outer_join_emits_nulls_after_watermark(spark, tmp_path):
    """LEFT OUTER stream-stream join: unmatched left rows must emit with
    NULL right columns — but only after the watermark proves no future
    match can arrive. Sentinels (key -1, equal ts, matching each other)
    appended LAST on both sides advance the min-of-sources watermark so
    the closing no-data batch flushes every real unmatched click."""
    import time

    from pyspark.sql import functions as F

    from ip_filter_spark.streaming import stream_interval_join

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    base = 1_700_000_000
    # clicks u0..u4; purchases only for even users, 10 s before the click
    clicks = spark.createDataFrame(
        [(u, u, base + 1000 + u) for u in range(5)],
        "event_id long, user_id long, t long",
    ).select("event_id", "user_id", F.col("t").cast("timestamp").alias("c_ts"))
    purch = spark.createDataFrame(
        [(100 + u, u, base + 990 + u) for u in range(0, 5, 2)],
        "purchase_id long, p_user long, t long",
    ).select("purchase_id", "p_user", F.col("t").cast("timestamp").alias("p_ts"))
    src_c, src_p = str(tmp_path / "clicks"), str(tmp_path / "purch")
    clicks.coalesce(1).write.parquet(src_c)
    purch.coalesce(1).write.parquet(src_p)
    time.sleep(1.1)  # sentinels must sort after the data files by mtime
    sent = base + 100_000
    spark.createDataFrame([(-1, -1, sent)], "event_id long, user_id long, t long").select(
        "event_id", "user_id", F.col("t").cast("timestamp").alias("c_ts")
    ).coalesce(1).write.mode("append").parquet(src_c)
    spark.createDataFrame([(-1, -1, sent)], "purchase_id long, p_user long, t long").select(
        "purchase_id", "p_user", F.col("t").cast("timestamp").alias("p_ts")
    ).coalesce(1).write.mode("append").parquet(src_p)
    cs = (
        spark.readStream.schema("event_id long, user_id long, c_ts timestamp")
        .option("maxFilesPerTrigger", 1).parquet(src_c)
    )
    ps = (
        spark.readStream.schema("purchase_id long, p_user long, p_ts timestamp")
        .option("maxFilesPerTrigger", 1).parquet(src_p)
    )
    q = stream_interval_join(
        cs, ps, left_on="user_id", right_on="p_user", left_ts="c_ts", right_ts="p_ts",
        upper_s=30, watermark_left="60 seconds", watermark_right="60 seconds",
        out_dir=str(tmp_path / "out"), checkpoint_dir=str(tmp_path / "ckpt"),
        how="left_outer",
    )
    assert q.awaitTermination(120), "outer stream join did not finish"
    out = spark.read.parquet(str(tmp_path / "out")).where(F.col("user_id") >= 0)
    got = {(r.event_id, r.purchase_id) for r in out.collect()}
    # even users matched, odd users emitted exactly once with NULL right
    assert got == {(0, 100), (2, 102), (4, 104), (1, None), (3, None)}, got


def test_stream_cdc_snapshot_idempotent_and_pruned(spark, tmp_path):
    """The CDC snapshot store: (a) final snapshot == batch latest-state
    of everything streamed; (b) a FULL REPLAY (fresh checkpoint, same
    source, same store) converges to the identical state — batch-id-keyed
    snapshot dirs make re-execution a rewrite, not a double-apply;
    (c) keep_last prunes superseded snapshots."""
    from ip_filter_spark.operators.cdc import latest_state
    from ip_filter_spark.streaming.cdc_stream import (
        _complete_ids,
        latest_snapshot,
        stream_upsert_snapshot,
    )

    rows = [(k, v, f"s{k}-{v}") for k in range(20) for v in range(5)]
    df = spark.createDataFrame(rows, "k long, ver long, payload string")
    src = str(tmp_path / "src")
    df.repartition(4).write.parquet(src)
    snaps = str(tmp_path / "snaps")

    def run(ckpt):
        stream = (
            spark.readStream.schema(df.schema).option("maxFilesPerTrigger", 1).parquet(src)
        )
        q = stream_upsert_snapshot(
            stream, ["k"], ["ver"], snapshot_root=snaps,
            checkpoint_dir=str(tmp_path / ckpt), keep_last=2,
        )
        assert q.awaitTermination(120)

    run("ckpt1")
    want = sorted(map(tuple, latest_state(df, ["k"], ["ver"]).collect()))
    got1 = sorted(map(tuple, latest_snapshot(spark, snaps).collect()))
    assert got1 == want
    assert len(_complete_ids(snaps)) <= 3  # keep_last=2 (+ the newest)

    run("ckpt2")  # full replay into the same store
    got2 = sorted(map(tuple, latest_snapshot(spark, snaps).collect()))
    assert got2 == want


def test_stream_dgim_matches_batch_and_flags_order(spark, tmp_path):
    """Streaming DGIM: bracket theorem holds on the streamed chain, state
    carries across micro-batches (n_batches > 1), ingestion is counted
    exactly once, and a replay that violates time order flips the
    operator's in_order flag instead of failing silently."""
    import json

    import pandas as pd

    from ip_filter_spark.sketches.dgim import Dgim
    from ip_filter_spark.streaming.dgim_stream import stream_dgim_recent

    K, WINDOW, NOW = 4, 1000, 10_000
    rows = [("a", NOW - 3000 + 7 * i) for i in range(500)] + [
        ("b", NOW - 900 + 2 * i) for i in range(300)
    ]

    def run(order, name):
        src = str(tmp_path / f"src_{name}")
        data = sorted(rows, key=lambda r: r[1], reverse=(order == "desc"))
        third = len(data) // 3
        for i in range(3):
            pdf = pd.DataFrame(data[i * third : (i + 1) * third if i < 2 else len(data)],
                               columns=["key", "ts_us"])
            spark.createDataFrame(pdf).coalesce(1).write.parquet(f"{src}/s{i}")
        stream = (
            spark.readStream.schema("key string, ts_us long")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/s*")
        )
        out = stream_dgim_recent(stream, "key", "ts_us", NOW, WINDOW, k=K)
        sink = str(tmp_path / f"out_{name}")

        q = (
            out.writeStream.foreachBatch(
                lambda b, i: b.write.mode("overwrite").parquet(f"{sink}/b={int(i)}")
            )
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300)
        emitted = spark.read.parquet(sink).toPandas()
        return emitted.sort_values("n_batches").groupby("key").last().reset_index()

    final = run("asc", "ord").set_index("key")
    exact = {"a": sum(1 for k, t in rows if k == "a" and t > NOW - WINDOW),
             "b": sum(1 for k, t in rows if k == "b" and t > NOW - WINDOW)}
    # n_batches counts micro-batches the KEY received rows in: "a" spans
    # all 3 slices; "b"'s timestamps all land in the later two.
    for k, want_batches in (("a", 3), ("b", 2)):
        r = final.loc[k]
        assert bool(r["in_order"]) is True
        assert int(r["n_batches"]) == want_batches
        assert int(r["inserted"]) == sum(1 for kk, _ in rows if kk == k)
        assert abs(2 * exact[k] - int(r["est2x"])) <= int(r["uncertainty"])
        # state bound: replay the same chain serially and check O(k log W) size
        d = Dgim(k=K)
        for _, t in sorted((r2 for r2 in rows if r2[0] == k), key=lambda r2: r2[1]):
            d.insert(t)
        assert len(json.dumps(d.buckets)) < 64 * (K + 1) * 24

    disordered = run("desc", "rev").set_index("key")
    assert not bool(disordered.loc["a"]["in_order"])


def test_stream_collapse_matches_batch_and_flags_order(spark, tmp_path):
    """Streaming consecutive-dup collapse: the union of per-batch kept
    rows equals the batch LAG answer row for row when the replay is
    time-partitioned, state carries the boundary row across micro-batches
    (a duplicate straddling two batches IS suppressed), and a replay that
    violates time order flips in_order instead of failing silently."""
    import pandas as pd

    from ip_filter_spark.streaming.collapse_stream import (
        stream_collapse_consecutive,
    )

    # user 1: a a | a b b  (batch boundary after row 2 — the batch-3 'a'
    # must be suppressed by carried state); user 2: x | x y x
    rows = [
        (1, 100, "a", 10),
        (1, 200, "a", 11),
        (2, 150, "x", 20),
        (1, 300, "a", 12),
        (1, 400, "b", 13),
        (1, 500, "b", 14),
        (2, 250, "x", 21),
        (2, 350, "y", 22),
        (2, 450, "x", 23),
    ]
    cols = ["user_id", "ts_us", "event_type", "event_id"]

    def run(data, name):
        src = str(tmp_path / f"src_{name}")
        half = 3 if name == "ord" else len(data) // 2
        for i, chunk in enumerate((data[:half], data[half:])):
            spark.createDataFrame(pd.DataFrame(chunk, columns=cols)).coalesce(
                1
            ).write.parquet(f"{src}/s{i}")
        stream = (
            spark.readStream.schema(
                "user_id long, ts_us long, event_type string, event_id long"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/s*")
        )
        out = stream_collapse_consecutive(stream)
        sink = str(tmp_path / f"out_{name}")
        q = (
            out.writeStream.foreachBatch(
                lambda b, i: b.write.mode("overwrite").parquet(f"{sink}/b={int(i)}")
            )
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300)
        return spark.read.parquet(sink).toPandas()

    ordered = sorted(rows, key=lambda r: (r[1], r[3]))
    emitted = run(ordered, "ord")
    assert bool(emitted["in_order"].all())
    # batch LAG answer: keep rows where type changed per user
    kept_ids = sorted(emitted["event_id"].tolist())
    assert kept_ids == [10, 13, 20, 22, 23]

    disordered = run(list(reversed(ordered)), "rev")
    assert not bool(disordered["in_order"].all())
