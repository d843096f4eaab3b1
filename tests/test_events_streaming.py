"""Events: windowed aggregation (vs DuckDB), sessionization (vs DuckDB
gaps-and-islands SQL), and the Structured Streaming twin (equivalence
with the batch plan)."""

import pytest
from pyspark.sql import functions as F

from conftest import SF_DIR

from metacat_spark.streaming import events as EV


@pytest.fixture(scope="session")
def events(spark):
    return EV.load_events(spark, SF_DIR)


def test_windowed_counts_vs_duck(events, duck):
    got = sorted((str(r["window_start"]), r["event_type"], r["n_events"],
                  r["total_value"])
                 for r in EV.windowed_counts(events).collect())
    want = sorted((str(w), t, n, v) for w, t, n, v in duck.execute("""
        select date_trunc('hour', ts) as w, event_type,
               count(*) as n, round(sum(value), 3) as v
        from events group by 1, 2""").fetchall())
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[:3] == w[:3] and abs(g[3] - w[3]) < 1e-4
    assert got


def test_sessionize_vs_duck(events, duck):
    got = sorted((r["user_id"], str(r["session_start"]), r["n_events"])
                 for r in EV.sessionize(events, 30).collect())
    # mirror Spark's µs precision (ns → µs truncation) exactly
    want = sorted((u, str(s), n) for u, s, n in duck.execute("""
        with ev as (
          select user_id,
                 make_timestamp(epoch_ns(ts) // 1000) as ts, value
          from events),
        marked as (
          select user_id, ts, value,
                 case when epoch_us(ts) - epoch_us(lag(ts) over
                        (partition by user_id order by ts)) > 1800000000
                      or lag(ts) over (partition by user_id order by ts)
                         is null
                      then 1 else 0 end as is_new
          from ev),
        sess as (
          select user_id, ts, value,
                 sum(is_new) over (partition by user_id order by ts
                   rows between unbounded preceding and current row)
                   as session_seq
          from marked)  -- noqa
        select user_id, min(ts) as session_start, count(*) as n
        from sess group by user_id, session_seq""").fetchall())
    assert got == want and got


def test_sessionize_native_equals_lag(spark, events):
    """session_window sessions ≡ lag/islands sessions (same gap) on
    start/count/value — the native form is what streams."""
    key = lambda r: (r["user_id"], str(r["session_start"]),
                     r["n_events"], r["total_value"])
    got = sorted(key(r) for r in
                 EV.sessionize_native(events, 30).collect())
    want = sorted(key(r) for r in EV.sessionize(events, 30)
                  .select("user_id", "session_start", "n_events",
                          "total_value").collect())
    assert got == want and got


def test_streaming_sessions_equals_batch(spark, events):
    batch = sorted((r["user_id"], str(r["session_start"]), r["n_events"])
                   for r in EV.sessionize_native(events, 30).collect())
    out = EV.streaming_sessions_to_memory(spark, SF_DIR, 30)
    got = sorted((r["user_id"], str(r["session_start"]), r["n_events"])
                 for r in out.collect())
    assert got == batch and got


def test_stateful_running_totals(spark, events):
    """applyInPandasWithState running totals: the final state per
    event type must equal the batch aggregate."""
    out = EV.streaming_running_totals_to_memory(spark, SF_DIR)
    # with availableNow the whole file is one micro-batch: one row per
    # event type holding the complete running totals
    got = {r["event_type"]: (r["n_events"], r["total_value"])
           for r in out.collect()}
    want = {r["event_type"]: (r["n"], r["v"])
            for r in (events.groupBy("event_type")
                      .agg(F.count("*").alias("n"),
                           F.round(F.sum("value"), 3).alias("v"))
                      .collect())}
    assert got == want and got


def test_watermark_drops_late_data(spark, tmp_path):
    """Late-data semantics: with a 1-hour watermark and append output,
    an event arriving in a later micro-batch but timestamped before
    the advanced watermark must NOT reopen its (already emitted)
    window. Two parquet files processed as separate micro-batches via
    maxFilesPerTrigger=1."""
    import time as _t

    src = tmp_path / "late_events"
    src.mkdir()

    def write(name, rows):
        df = spark.createDataFrame(
            [(i, 1, "click", 1.0, "{}", ts) for i, ts in rows],
            "event_id long, user_id long, event_type string, "
            "value double, props string, ts timestamp_ntz")
        df.coalesce(1).write.parquet(str(src / name))

    import datetime as dt
    h = dt.datetime(2024, 1, 1, 10, 0, 0)

    # batch 1: events at 10:00 and 14:00 → watermark advances to 13:00
    write("b1", [(1, h), (2, h + dt.timedelta(hours=4))])
    _t.sleep(1.1)  # ensure later mtime → processed as the next batch
    # batch 2: fresh event; at its end the 10:00 window (< watermark)
    # is emitted and its state EVICTED
    write("b2", [(4, h + dt.timedelta(hours=4, minutes=5))])
    _t.sleep(1.1)
    # batch 3: a LATE event back at 10:30, after eviction → dropped
    # (while state is live, merging late rows is best-effort by design)
    write("b3", [(3, h + dt.timedelta(minutes=30))])

    stream = (spark.readStream
              .schema("event_id long, user_id long, event_type string, "
                      "value double, props string, ts timestamp_ntz")
              .option("maxFilesPerTrigger", "1")
              .parquet(str(src) + "/*"))
    from metacat_spark.streaming.events import windowed_counts
    agg = windowed_counts(
        stream.withColumn("ts_ts", F.col("ts").cast("timestamp")))
    q = (agg.writeStream.format("memory").queryName("late_test")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = [(str(r["window_start"]), r["n_events"])
            for r in spark.table("late_test").collect()]
    # the 10:00 window was emitted exactly once, finalized with ONE
    # event; the late event_id=3 (behind the watermark, state evicted)
    # neither re-opened it nor produced a duplicate emission
    ten = [r for r in rows if r[0] == "2024-01-01 10:00:00"]
    assert ten == [("2024-01-01 10:00:00", 1)]


def test_streaming_equals_batch(spark, events):
    batch = {(str(r["window_start"]), r["event_type"]):
             (r["n_events"], r["total_value"])
             for r in EV.windowed_counts(events).collect()}
    stream_out = EV.streaming_windowed_counts_to_memory(spark, SF_DIR)
    got = {(str(r["window_start"]), r["event_type"]):
           (r["n_events"], r["total_value"])
           for r in stream_out.collect()}
    assert got == batch and got


def test_funnel_greedy_semantics(spark):
    """Hand-built chains: a completing user yields its earliest
    chain; a user whose step-2 falls outside the horizon is absent
    (greedy from earliest step-1 — documented semantics); step order
    must hold (a purchase BEFORE the click doesn't count)."""
    from datetime import datetime
    from metacat_spark.streaming.events import funnel, funnel_counts
    rows = [
        # user 1: completes within horizons
        (1, datetime(2024, 1, 1, 10, 0), "view"),
        (1, datetime(2024, 1, 1, 10, 30), "click"),
        (1, datetime(2024, 1, 1, 10, 45), "purchase"),
        # user 2: click 3h after earliest view -> greedy fails
        (2, datetime(2024, 1, 1, 9, 0), "view"),
        (2, datetime(2024, 1, 1, 12, 0), "click"),
        (2, datetime(2024, 1, 1, 12, 5), "purchase"),
        # user 3: purchase precedes click -> no completion
        (3, datetime(2024, 1, 1, 10, 0), "view"),
        (3, datetime(2024, 1, 1, 10, 5), "purchase"),
        (3, datetime(2024, 1, 1, 10, 30), "click"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string")
    out = {r["user_id"]: (r["t1"], r["t2"], r["t3"])
           for r in funnel(df, ["view", "click", "purchase"],
                           horizon_s=3600, ts_col="ts").collect()}
    assert set(out) == {1}
    assert out[1][0].hour == 10 and out[1][2].minute == 45
    counts = {r["step"]: r["n_users"]
              for r in funnel_counts(df,
                                     ["view", "click", "purchase"],
                                     horizon_s=3600,
                                     ts_col="ts").collect()}
    assert counts == {1: 3, 2: 2, 3: 1}


def test_retention_cohorts_hand_case(spark):
    """Two users, two cohorts: offsets and counts by hand."""
    from datetime import datetime
    from metacat_spark.streaming.events import retention_cohorts
    rows = [
        (1, datetime(2024, 1, 1, 9)),    # Mon wk0
        (1, datetime(2024, 1, 9, 9)),    # wk1
        (1, datetime(2024, 1, 22, 9)),   # wk3
        (2, datetime(2024, 1, 9, 12)),   # cohort wk1
        (2, datetime(2024, 1, 16, 12)),  # wk1+1
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {(str(r["cohort_week"])[:10], r["week_offset"]):
           r["n_users"] for r in retention_cohorts(
               df, ts_col="ts").collect()}
    assert got == {("2024-01-01", 0): 1, ("2024-01-01", 1): 1,
                   ("2024-01-01", 3): 1,
                   ("2024-01-08", 0): 1, ("2024-01-08", 1): 1}


def test_streaming_funnel_equals_batch(spark):
    """The stateful streaming funnel's completion set (availableNow
    over the events file) equals the batch funnel exactly — same
    greedy semantics, incremental form."""
    from pyspark.sql import functions as F
    from metacat_spark.streaming import events as EV
    steps = ["view", "click", "purchase"]
    got = {(r["user_id"], tuple(r["times"])) for r in
           EV.streaming_funnel_to_memory(
               spark, SF_DIR, steps, horizon_s=86400,
               table="ev_funnel_eq").collect()}
    batch = EV.funnel(EV.load_events(spark, SF_DIR), steps,
                      horizon_s=86400)
    want = {(r["user_id"], (r["u1"], r["u2"], r["u3"])) for r in
            batch.select(
                "user_id",
                F.unix_micros(F.col("t1").cast("timestamp")).alias("u1"),
                F.unix_micros(F.col("t2").cast("timestamp")).alias("u2"),
                F.unix_micros(F.col("t3").cast("timestamp")).alias("u3"))
            .collect()}
    assert got and got == want


def test_window_anomalies_flags_spike(spark):
    """A planted 10x spike in an otherwise-steady series gets a high
    z-score; steady windows stay near zero; constant series → null."""
    from datetime import datetime, timedelta
    from metacat_spark.streaming.events import window_anomalies
    rows = []
    base = datetime(2024, 1, 1)
    for h in range(30):
        n = 100 if h != 28 else 1000     # spike at hour 28
        jitter = (h * 7) % 5             # deterministic variance
        for i in range(n + jitter):
            rows.append((base + timedelta(hours=h, minutes=i % 60,
                                          seconds=i % 60), "click"))
        rows.append((base + timedelta(hours=h), "steady"))
    df = (spark.createDataFrame(rows,
                                "ts timestamp, event_type string")
          .withColumn("ts_ts", F.col("ts"))
          .withColumn("value", F.lit(1.0)))
    out = {(r["event_type"], r["window_start"].hour
            + 24 * (r["window_start"].day - 1)): r["z_score"]
           for r in window_anomalies(df).collect()}
    assert out[("click", 28)] > 5
    assert abs(out[("click", 20)]) < 3
    assert out[("steady", 28)] is None   # constant series


def test_funnel_counts_single_pass(spark, events):
    """funnel_counts must run as ONE action whose job count does not
    scale with k (VERDICT r5: the old loop launched a funnel().count()
    job per prefix). Also pins the left-join single-pass counts to the
    per-prefix inner-join funnels on the real fixture."""
    steps = ["view", "click", "purchase"]
    sc = spark.sparkContext
    sc.setJobGroup("fc_baseline", "single funnel job count")
    try:
        EV.funnel(events, steps, horizon_s=86400).count()
    finally:
        sc.setJobGroup(None, None)
    base = len(sc.statusTracker().getJobIdsForGroup("fc_baseline"))
    sc.setJobGroup("fc_single_pass", "funnel_counts job count")
    try:
        rows = EV.funnel_counts(events, steps, horizon_s=86400).collect()
    finally:
        sc.setJobGroup(None, None)
    jobs = len(sc.statusTracker().getJobIdsForGroup("fc_single_pass"))
    # AQE materializes each shuffle stage as its own job, so compare
    # against ONE funnel evaluation: the counts report must cost about
    # one funnel pass (+ the final explode), not k of them (the old
    # loop ran a full funnel().count() per prefix ≈ k·base jobs)
    assert jobs <= base + 2, \
        f"expected a single-pass plan: {jobs} jobs vs {base} for one funnel"
    got = {r["step"]: (r["step_name"], r["n_users"]) for r in rows}
    assert set(got) == {1, 2, 3}
    for k in range(1, 4):
        want = EV.funnel(events, steps[:k], horizon_s=86400).count()
        assert got[k] == (steps[k - 1], want)
    assert got[1][1] >= got[2][1] >= got[3][1]
    assert got[1][1] > 0


def test_streaming_funnel_ooo_equals_batch(spark, tmp_path):
    """The WATERMARKED streaming funnel matches the batch funnel on a
    SHUFFLED-arrival replay — events scattered across micro-batches in
    non-event-time order (VERDICT r5 #5; the plain funnel_stateful
    requires in-order arrival and would mis-count this fixture).

    Replay: the events file is split into 4 parquet parts by
    round-robin over a hash (so each user's events spread across
    parts out of order), fed one file per trigger; a final sentinel
    event far in the future pushes the watermark past every real
    event so the buffered tails flush in the closing no-data batch."""
    import os
    import time
    from pyspark.sql import functions as F

    steps = ["view", "click", "purchase"]
    ev = EV.load_events(spark, SF_DIR)
    src = str(tmp_path / "shuffled")
    os.makedirs(src)
    parts = ev.withColumn(
        "__p", F.pmod(F.xxhash64("event_id"), F.lit(4)))
    max_ts = ev.agg(F.max("ts_ts")).collect()[0][0]
    for i in range(4):
        (parts.where(F.col("__p") == i).drop("__p")
         .coalesce(1).write.mode("overwrite")
         .parquet(f"{src}/p{i}.parquet"))
    # sentinel: not a funnel step, ts far beyond every real event +
    # delay, in its own LAST file (mtime ordering) — watermark driver
    one = ev.limit(1).withColumn(
        "event_type", F.lit("__sentinel__")).withColumn(
        "ts_ts", F.lit(max_ts) + F.expr("INTERVAL 400 DAYS"))
    one.coalesce(1).write.mode("overwrite").parquet(
        f"{src}/zz_sentinel.parquet")
    now = time.time()
    for i, d in enumerate(sorted(os.listdir(src))):
        for f in os.listdir(f"{src}/{d}"):
            os.utime(f"{src}/{d}/{f}", (now + i, now + i))

    schema = ev.schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1")
              .option("recursiveFileLookup", "true")
              .parquet(src))
    out = EV.funnel_stateful_ooo(stream, steps, horizon_s=86400,
                                 delay="30 days")
    q = (out.writeStream.format("memory").queryName("ev_funnel_ooo")
         .outputMode("update").trigger(availableNow=True).start())
    assert q.awaitTermination(180), "streaming funnel (ooo) timed out"
    got = {(r["user_id"], tuple(r["times"])) for r in
           spark.table("ev_funnel_ooo").collect()}
    batch = EV.funnel(ev, steps, horizon_s=86400)
    want = {(r["user_id"], (r["u1"], r["u2"], r["u3"])) for r in
            batch.select(
                "user_id",
                F.unix_micros(F.col("t1").cast("timestamp")).alias("u1"),
                F.unix_micros(F.col("t2").cast("timestamp")).alias("u2"),
                F.unix_micros(F.col("t3").cast("timestamp")).alias("u3"))
            .collect()}
    assert got and got == want


def test_streaming_funnel_ooo_buffer_cap(spark, tmp_path):
    """The OOO funnel's per-user buffer is bounded in COUNT, not just
    event time (VERDICT r6 #2): an adversarial user emitting far more
    pre-watermark step events than max_buffer gets its oldest buffer
    entries dropped (surfaced as n_dropped on the completion row),
    while a normal user below the cap completes exactly as the batch
    funnel says, with n_dropped = 0.

    Construction: every adversarial event is a valid funnel step so
    an uncapped buffer would hold all 10^5 of them within the delay
    window; the *newest* three form the completing a->b->c suffix, so
    a drop-oldest cap still completes — proving the cap dropped
    exactly len(buffer) - max_buffer events rather than breaking the
    state machine."""
    import os
    import time
    from datetime import datetime, timedelta

    steps = ["a", "b", "c"]
    base = datetime(2024, 1, 1)
    n_noise = 100_000
    rows = []
    # adversarial user 1: 10^5 'a' events (all buffer: same step, all
    # pre-watermark), then b and c right after the newest 'a'
    for i in range(n_noise):
        rows.append((f"e{i}", 1, "a", base + timedelta(seconds=i)))
    rows.append(("eb", 1, "b",
                 base + timedelta(seconds=n_noise + 10)))
    rows.append(("ec", 1, "c",
                 base + timedelta(seconds=n_noise + 20)))
    # normal user 2: a clean a->b->c
    rows.append(("n1", 2, "a", base + timedelta(seconds=5)))
    rows.append(("n2", 2, "b", base + timedelta(seconds=6)))
    rows.append(("n3", 2, "c", base + timedelta(seconds=7)))
    ev = spark.createDataFrame(
        rows, "event_id string, user_id long, event_type string, "
              "ts_ts timestamp")

    src = str(tmp_path / "cap")
    os.makedirs(src)
    ev.coalesce(1).write.mode("overwrite").parquet(f"{src}/p0.parquet")
    sentinel = spark.createDataFrame(
        [("zz", 99, "__sentinel__",
          base + timedelta(days=4000))],
        "event_id string, user_id long, event_type string, "
        "ts_ts timestamp")
    sentinel.coalesce(1).write.mode("overwrite").parquet(
        f"{src}/zz_sentinel.parquet")
    now = time.time()
    for i, d in enumerate(sorted(os.listdir(src))):
        for f in os.listdir(f"{src}/{d}"):
            os.utime(f"{src}/{d}/{f}", (now + i, now + i))

    stream = (spark.readStream.schema(ev.schema)
              .option("maxFilesPerTrigger", "1")
              .option("recursiveFileLookup", "true")
              .parquet(src))
    cap = 500
    out = EV.funnel_stateful_ooo(stream, steps, horizon_s=10 ** 9,
                                 delay="365 days", max_buffer=cap)
    q = (out.writeStream.format("memory").queryName("ev_funnel_cap")
         .outputMode("update").trigger(availableNow=True).start())
    assert q.awaitTermination(180), "capped ooo funnel timed out"
    got = {r["user_id"]: r for r in
           spark.table("ev_funnel_cap").collect()}
    assert set(got) == {1, 2}
    # normal user: untouched by the cap, matches the batch funnel
    assert got[2]["n_dropped"] == 0
    batch = EV.funnel(ev, steps, horizon_s=10 ** 9)
    b2 = {r["user_id"]: (r["u1"], r["u2"], r["u3"]) for r in
          batch.select(
              "user_id",
              F.unix_micros(F.col("t1").cast("timestamp")).alias("u1"),
              F.unix_micros(F.col("t2").cast("timestamp")).alias("u2"),
              F.unix_micros(F.col("t3").cast("timestamp")).alias("u3"))
          .collect()}
    assert tuple(got[2]["times"]) == b2[2]
    # adversarial user: buffer exceeded the cap; oldest dropped and
    # counted. Buffer peaked at 10^5 + 2 entries against a cap of 500
    # — every overflow beyond the cap must be accounted
    assert got[1]["n_dropped"] == n_noise + 2 - cap
    # drop-oldest kept the newest cap-2 'a' events + b + c; the
    # greedy machine then starts from the OLDEST surviving 'a'.
    # Expected micros via unix_micros on the same column (tz-safe)
    wanted = ({f"e{n_noise - (cap - 2)}", "eb", "ec"})
    us_map = {r["event_id"]: r["u"] for r in
              ev.where(F.col("event_id").isin(*wanted))
              .select("event_id",
                      F.unix_micros(F.col("ts_ts")).alias("u"))
              .collect()}
    assert list(got[1]["times"]) == [
        us_map[f"e{n_noise - (cap - 2)}"], us_map["eb"], us_map["ec"]]


def test_streaming_funnel_ooo_cap_spares_backfill(spark, tmp_path):
    """The buffer cap must apply to the PERSISTED buffer only: a
    multi-batch backfill delivering far more than max_buffer events
    that the watermark has ALREADY released must advance the state
    machine exactly like the batch funnel — zero drops (review r7:
    the first cut capped before the advance step and dropped
    finalizable events)."""
    import os
    import time
    from datetime import datetime, timedelta

    steps = ["a", "b", "c"]
    base = datetime(2024, 1, 1)
    n_noise = 1200
    # batch 1: only a far-future non-step event — drives the
    # watermark past the entire backfill before it arrives
    wmdrv = spark.createDataFrame(
        [("wm", 99, "__wm__", base + timedelta(days=4000))],
        "event_id string, user_id long, event_type string, "
        "ts_ts timestamp")
    # batch 2: the backfill — >cap step events, ALL pre-watermark
    rows = [(f"e{i}", 1, "a", base + timedelta(seconds=i))
            for i in range(n_noise)]
    rows.append(("eb", 1, "b", base + timedelta(seconds=n_noise + 10)))
    rows.append(("ec", 1, "c", base + timedelta(seconds=n_noise + 20)))
    backfill = spark.createDataFrame(
        rows, "event_id string, user_id long, event_type string, "
              "ts_ts timestamp")

    src = str(tmp_path / "backfill")
    os.makedirs(src)
    wmdrv.coalesce(1).write.mode("overwrite").parquet(
        f"{src}/a_wm.parquet")
    backfill.coalesce(1).write.mode("overwrite").parquet(
        f"{src}/b_fill.parquet")
    now = time.time()
    for i, d in enumerate(sorted(os.listdir(src))):
        for f in os.listdir(f"{src}/{d}"):
            os.utime(f"{src}/{d}/{f}", (now + i, now + i))

    stream = (spark.readStream.schema(backfill.schema)
              .option("maxFilesPerTrigger", "1")
              .option("recursiveFileLookup", "true")
              .parquet(src))
    out = EV.funnel_stateful_ooo(stream, steps, horizon_s=10 ** 9,
                                 delay="10 seconds", max_buffer=500)
    q = (out.writeStream.format("memory").queryName("ev_funnel_bf")
         .outputMode("update").trigger(availableNow=True).start())
    assert q.awaitTermination(180), "backfill funnel timed out"
    got = {r["user_id"]: r for r in
           spark.table("ev_funnel_bf").collect()}
    assert set(got) == {1}
    assert got[1]["n_dropped"] == 0
    want = {r["user_id"]: (r["u1"], r["u2"], r["u3"]) for r in
            EV.funnel(backfill, steps, horizon_s=10 ** 9).select(
                "user_id",
                F.unix_micros(F.col("t1").cast("timestamp")).alias("u1"),
                F.unix_micros(F.col("t2").cast("timestamp")).alias("u2"),
                F.unix_micros(F.col("t3").cast("timestamp")).alias("u3"))
            .collect()}
    assert tuple(got[1]["times"]) == want[1]


def test_funnel_randomized_differential(spark):
    """Randomized differential check of the funnel formula (and the
    single-pass funnel_counts) against a direct Python evaluation of
    the greedy recurrence t_i = min{ts of step_i : t_{i-1} <= ts <=
    t_{i-1} + horizon} over 300 random users — boundary gaps (== the
    horizon exactly), repeated steps, interleaved noise types, and
    equal timestamps all land in the sample. Seeded: deterministic."""
    import random
    from datetime import datetime, timedelta

    rng = random.Random(20260814)
    steps = ["a", "b", "c"]
    types = steps + ["x", "y"]
    horizon = 100
    base = datetime(2024, 1, 1)
    rows, model = [], {}
    for uid in range(300):
        evs = []
        for _ in range(rng.randint(0, 12)):
            # coarse grid → frequent ties and exact-horizon gaps
            ts = rng.randrange(0, 400, 20)
            evs.append((ts, rng.choice(types)))
        model[uid] = evs
        rows += [(uid, base + timedelta(seconds=ts), et)
                 for ts, et in evs]
    df = spark.createDataFrame(
        rows or [(0, base, "x")],
        "user_id long, ts timestamp, event_type string")

    def py_funnel(evs):
        cur = [ts for ts, et in evs if et == steps[0]]
        if not cur:
            return None
        times = [min(cur)]
        for s in steps[1:]:
            nxt = [ts for ts, et in evs
                   if et == s and times[-1] <= ts <= times[-1] + horizon]
            if not nxt:
                return None
            times.append(min(nxt))
        return tuple(times)

    want = {u: t for u, evs in model.items()
            if (t := py_funnel(evs)) is not None}
    got = {r["user_id"]:
           tuple(int((r[f"t{i}"] - base).total_seconds())
                 for i in range(1, 4))
           for r in EV.funnel(df, steps, horizon_s=horizon,
                              ts_col="ts").collect()}
    assert got == want and want     # sample must be non-trivial

    # prefix counts from the same model vs single-pass funnel_counts
    def py_prefix(evs, k):
        cur = [ts for ts, et in evs if et == steps[0]]
        if not cur:
            return False
        t = min(cur)
        for s in steps[1:k]:
            nxt = [ts2 for ts2, et in evs
                   if et == s and t <= ts2 <= t + horizon]
            if not nxt:
                return False
            t = min(nxt)
        return True
    want_counts = {k: sum(py_prefix(evs, k) for evs in model.values())
                   for k in (1, 2, 3)}
    got_counts = {r["step"]: r["n_users"]
                  for r in EV.funnel_counts(df, steps,
                                            horizon_s=horizon,
                                            ts_col="ts").collect()}
    assert got_counts == want_counts


def test_streaming_funnel_repeated_steps(spark, tmp_path):
    """A funnel with a REPEATED step name (view -> click -> view)
    must match the batch funnel through the streaming state machine
    (review r6: the name->index dict collapsed repeats and emitted
    zero completions)."""
    from datetime import datetime
    rows = [
        (1, 1, "view", 1.0, "{}", datetime(2024, 1, 1, 10, 0)),
        (2, 1, "click", 1.0, "{}", datetime(2024, 1, 1, 10, 10)),
        (3, 1, "view", 1.0, "{}", datetime(2024, 1, 1, 10, 20)),
        (4, 2, "view", 1.0, "{}", datetime(2024, 1, 1, 11, 0)),
        (5, 2, "click", 1.0, "{}", datetime(2024, 1, 1, 11, 5)),
    ]
    src = str(tmp_path / "repeat_events")
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, "
              "value double, props string, ts timestamp")
    df.coalesce(1).write.parquet(src)
    steps = ["view", "click", "view"]
    batch = EV.funnel(
        df.withColumn("ts_ts", F.col("ts")), steps, horizon_s=3600)
    want = {r["user_id"] for r in batch.collect()}
    assert want == {1}          # user 2 never re-views
    stream = (spark.readStream.schema(df.schema).parquet(src)
              .withColumn("ts_ts", F.col("ts")))
    out = EV.funnel_stateful(stream, steps, horizon_s=3600)
    q = (out.writeStream.format("memory").queryName("ev_funnel_rep")
         .outputMode("update").trigger(availableNow=True).start())
    assert q.awaitTermination(120)
    got = {r["user_id"] for r in
           spark.table("ev_funnel_rep").collect()}
    assert got == want


def test_declare_stream_ingests_batches_durably(spark, tmp_path):
    """Continuous catalog ingest (streaming/ingest.py): JSON-lines
    declare batches drain through the DML path — validation, PK,
    membership — with one durable commit per applied batch; a
    REDELIVERED batch (same ids again) skips whole via the file-id
    PK instead of corrupting or double-declaring; a batch with a
    validation error fails the query loudly."""
    import json as J

    from metacat_spark.catalog import from_tpch
    from metacat_spark.dml import DML
    from metacat_spark.durable import DurableStore
    from metacat_spark.streaming.ingest import declare_stream

    src = tmp_path / "declares"
    src.mkdir()
    root = str(tmp_path / "cat")

    def batch_file(name, ids):
        with open(src / name, "w") as f:
            for i in ids:
                f.write(J.dumps({
                    "id": f"ing-{i}", "namespace": "dune",
                    "name": f"ing{i}.dat", "size": i,
                    "metadata": {"core.run": i,
                                 "core.runs": [i]}}) + "\n")

    batch_file("b1.jsonl", [1, 2])
    batch_file("b2.jsonl", [3])
    cat1 = from_tpch(spark, SF_DIR)
    store1 = DurableStore(spark, root)
    dml1 = DML(cat1, store=store1)
    dml1.create_dataset("dune", "ingested")
    at_start = store1.manifest["commit"]
    stats = declare_stream(spark, dml1, str(src),
                           dataset=("dune", "ingested"))
    assert stats == {"declared": 3, "skipped_dup": 0, "batches": 2}
    # one durable commit per applied batch
    assert store1.manifest["commit"] == at_start + 2

    # redelivery: the same ids in a NEW file (fresh checkpoint dir
    # simulates a producer retry / a rebuilt source) skip whole
    import shutil
    shutil.rmtree(src / "_ingest_checkpoint")
    stats2 = declare_stream(spark, dml1, str(src),
                            dataset=("dune", "ingested"))
    assert stats2["declared"] == 0
    assert stats2["skipped_dup"] == 3 and stats2["batches"] == 2
    assert store1.manifest["commit"] == at_start + 2  # nothing new

    # restart: ingested files + membership replay from the log
    cat2 = from_tpch(spark, SF_DIR)
    DurableStore(spark, root).attach(cat2)
    member = sorted(r["file_id"] for r in cat2.files_datasets.where(
        F.col("dataset_name") == "ingested").collect())
    assert member == ["ing-1", "ing-2", "ing-3"]

    # a PARTIALLY-duplicate batch fails loudly — skipping it would
    # silently lose its new rows (review r8); the already-declared
    # catalog state is untouched
    shutil.rmtree(src / "_ingest_checkpoint")
    with open(src / "b3.jsonl", "w") as f:
        for i in (2, 7):                       # ing-2 exists, ing-7 new
            f.write(J.dumps({"id": f"ing-{i}", "namespace": "dune",
                             "name": f"ing{i}.dat",
                             "metadata": {"core.run": i,
                                          "core.runs": [i]}}) + "\n")
    with pytest.raises(Exception, match="lreadyExists|already"):
        declare_stream(spark, dml1, str(src))
    assert cat1.files.where(F.col("id") == "ing-7").count() == 0
    (src / "b3.jsonl").unlink()

    # a validation-failing batch fails LOUDLY, not silently
    shutil.rmtree(src / "_ingest_checkpoint")
    with open(src / "b3.jsonl", "w") as f:
        f.write(J.dumps({"id": "ing-9", "namespace": "dune",
                         "name": "x",
                         "metadata": {"core.run": "not-int"}}) + "\n")
    with pytest.raises(Exception, match="alidation"):
        declare_stream(spark, dml1, str(src))


def test_declare_stream_dead_letter_quarantines_and_drains(
        spark, tmp_path):
    """Opt-in dead-letter mode (VERDICT r8 #7): with
    ``dead_letter_dir`` set, a malformed batch and a
    validation-failing batch are MOVED there and recorded in the
    stats while the drain continues and every good batch lands;
    nothing from a quarantined batch reaches the catalog. The
    default (fail-loud) path is pinned by
    test_declare_stream_ingests_batches_durably."""
    import json as J

    from metacat_spark.catalog import from_tpch
    from metacat_spark.dml import DML
    from metacat_spark.durable import DurableStore
    from metacat_spark.streaming.ingest import declare_stream

    src = tmp_path / "declares"
    src.mkdir()
    dl = tmp_path / "dead"

    def write(name, lines):
        with open(src / name, "w") as f:
            f.write("\n".join(lines) + "\n")

    def good(i):
        return J.dumps({"id": f"dl-{i}", "namespace": "dune",
                        "name": f"dl{i}.dat", "size": i,
                        "metadata": {"core.run": i,
                                     "core.runs": [i]}})

    write("g1.jsonl", [good(1), good(2)])
    write("m1.jsonl", ["{this is not json"])
    write("v1.jsonl", [J.dumps({
        "id": "dl-bad", "namespace": "dune", "name": "b",
        "metadata": {"core.run": "not-an-int"}})])
    write("g2.jsonl", [good(3)])

    cat = from_tpch(spark, SF_DIR)
    store = DurableStore(spark, str(tmp_path / "cat"))
    dml = DML(cat, store=store)
    dml.create_dataset("dune", "dl_ds")
    stats = declare_stream(spark, dml, str(src),
                           dataset=("dune", "dl_ds"),
                           dead_letter_dir=str(dl))

    assert stats["declared"] == 3
    assert stats["dead_lettered"] == 2
    # counter reconciliation: batches == applied + dead-lettered,
    # INCLUDING the malformed batch (review r9)
    assert stats["batches"] == 4
    assert "dead_letter_move_failed" not in stats
    assert sorted(stats["dead_letter_files"]) \
        == ["m1.jsonl", "v1.jsonl"]
    assert len(stats["dead_letter_errors"]) == 2
    # quarantined files moved OUT of src and INTO the dead-letter dir
    assert sorted(p.name for p in dl.iterdir()) \
        == ["m1.jsonl", "v1.jsonl"]
    assert not (src / "m1.jsonl").exists()
    assert not (src / "v1.jsonl").exists()
    # good rows landed; nothing from quarantined batches did
    ids = sorted(r["id"] for r in cat.files.where(
        F.col("id").startswith("dl-")).collect())
    assert ids == ["dl-1", "dl-2", "dl-3"]


def test_declare_stream_commit_failure_not_quarantined(
        spark, tmp_path):
    """An APPLIED batch whose durable commit fails must NOT be
    dead-lettered (its rows are in the session and the re-buffered
    ops flush with the next successful mutation) — that is an
    operational failure, so the drain fails loud even in
    dead-letter mode (review r9)."""
    import json as J

    from metacat_spark.catalog import from_tpch
    from metacat_spark.dml import DML
    from metacat_spark.durable import DurableStore
    from metacat_spark.streaming.ingest import declare_stream

    src = tmp_path / "declares"
    src.mkdir()
    dl = tmp_path / "dead"
    with open(src / "b1.jsonl", "w") as f:
        f.write(J.dumps({"id": "cf-1", "namespace": "dune",
                         "name": "cf1.dat",
                         "metadata": {"core.run": 1,
                                      "core.runs": [1]}}) + "\n")
    cat = from_tpch(spark, SF_DIR)
    store = DurableStore(spark, str(tmp_path / "cat"))

    def broken_commit(*a, **k):
        raise OSError("durable store down")

    store.commit = broken_commit
    dml = DML(cat, store=store)
    with pytest.raises(Exception, match="durable store down"):
        declare_stream(spark, dml, str(src),
                       dead_letter_dir=str(dl))
    # the batch file was NOT quarantined and the rows ARE applied
    assert (src / "b1.jsonl").exists()
    assert not dl.exists() or not any(dl.iterdir())
    assert cat.files.where(F.col("id") == "cf-1").count() == 1


def test_attribution_models_tiny(spark):
    """Hand-built attribution scenario pinning all three models:
    user 1 converts at t=100 with touches view@40, click@70,
    view@95 (in-window) and click@1 (outside the 60s lookback);
    user 2 converts at t=200 with ONE touch; user 3 converts with
    no touch at all (earns no credit anywhere)."""
    from datetime import datetime, timedelta

    t0 = datetime(2024, 1, 1)

    def ev(eid, uid, typ, sec):
        return (eid, uid, typ, t0 + timedelta(seconds=sec))

    events = spark.createDataFrame(
        [ev(1, 1, "click", 1),          # outside 60s lookback
         ev(2, 1, "view", 40),
         ev(3, 1, "click", 70),
         ev(4, 1, "view", 95),
         ev(5, 1, "purchase", 100),
         ev(6, 2, "click", 190),
         ev(7, 2, "purchase", 200),
         ev(8, 3, "purchase", 50)],     # no touches
        "event_id long, user_id long, event_type string, "
        "ts_ts timestamp")
    last = {r["touch_type"]: (r["n_conversions"], r["credit"])
            for r in EV.attribution(events, lookback_s=60)
            .collect()}
    # user1's last touch is view@95; user2's is click@190
    assert last == {"view": (1, 1.0), "click": (1, 1.0)}
    first = {r["touch_type"]: (r["n_conversions"], r["credit"])
             for r in EV.attribution(events, model="first",
                                     lookback_s=60).collect()}
    # user1's first in-window touch is view@40
    assert first == {"view": (1, 1.0), "click": (1, 1.0)}
    linear = {r["touch_type"]: (r["n_conversions"], r["credit"])
              for r in EV.attribution(events, model="linear",
                                      lookback_s=60).collect()}
    # user1: 3 touches -> view 2/3, click 1/3; user2: click 1.0
    assert linear["view"] == (1, pytest.approx(0.666667))
    assert linear["click"] == (2, pytest.approx(1.333333))
    # total credit mass == attributed conversions (2 of 3)
    assert sum(c for _n, c in linear.values()) == pytest.approx(2.0)
    pos = {r["touch_type"]: (r["n_conversions"], r["credit"])
           for r in EV.attribution(events, model="position",
                                   lookback_s=60).collect()}
    # user1 (3 touches): first view@40 0.4 + middle click@70 0.2 +
    # last view@95 0.4 -> view 0.8, click 0.2; user2 single touch:
    # click 1.0
    assert pos["view"] == (1, pytest.approx(0.8))
    assert pos["click"] == (2, pytest.approx(1.2))
    assert sum(c for _n, c in pos.values()) == pytest.approx(2.0)
    with pytest.raises(ValueError, match="unknown model"):
        EV.attribution(events, model="u-shaped")


def test_attribution_vs_duck_full_corpus(events, duck):
    """Linear-touch attribution replayed in DuckDB over the full
    fixture (last-touch is the driver entry; this pins the other
    interesting model independently)."""
    got = sorted((r["touch_type"], r["n_conversions"],
                  round(r["credit"], 4))
                 for r in EV.attribution(events, model="linear")
                 .collect())
    want = sorted((t, n, round(c, 4)) for t, n, c in duck.execute("""
        with ev as (
          select event_id, user_id, event_type,
                 make_timestamp(epoch_ns(ts) // 1000) as ts_us
          from events),
        conv as (select user_id cu, event_id conv_id, ts_us conv_ts
                 from ev where event_type = 'purchase'),
        touch as (select user_id tu, event_type touch_type,
                         ts_us touch_ts
                  from ev where event_type <> 'purchase'),
        j as (select conv_id, touch_type,
                     1.0 / count(*) over (partition by conv_id)
                       as credit
              from conv join touch on cu = tu
               and touch_ts < conv_ts
               and touch_ts >= conv_ts - interval 3600 seconds)
        select touch_type, count(distinct conv_id) as n,
               round(sum(credit), 4) as credit
        from j group by 1""").fetchall())
    assert got == want and got


def test_attribution_property_credit_conservation(spark):
    """Property pinning over randomized event tables: for EVERY
    model, per-conversion credit sums to exactly one unit for each
    conversion with >= 1 in-window touch (mass conservation), and a
    Python replay of the window/tie rules reproduces the per-type
    credit to 1e-6. Randomness is seeded and data-driven (no
    hypothesis needed — 5 deterministic seeds x 4 models)."""
    import random
    from datetime import datetime, timedelta

    t0 = datetime(2024, 1, 1)
    for seed in range(5):
        rng = random.Random(seed)
        rows = []
        for eid in range(120):
            rows.append((eid, rng.randrange(6),
                         rng.choice(["view", "click", "signup",
                                     "purchase"]),
                         t0 + timedelta(seconds=rng.randrange(400))))
        events = spark.createDataFrame(
            rows, "event_id long, user_id long, event_type string, "
                  "ts_ts timestamp")
        look = 120
        # Python replay
        convs = [(e, u, t) for e, u, ty, t in rows
                 if ty == "purchase"]
        touches = [(e, u, ty, t) for e, u, ty, t in rows
                   if ty != "purchase"]
        replay = {m: {} for m in ("last", "first", "linear",
                                  "position")}
        attributed = 0
        for ce, cu, ct in convs:
            win = sorted(
                [(t, e, ty) for e, u, ty, t in touches
                 if u == cu and t < ct
                 and t >= ct - timedelta(seconds=look)])
            if not win:
                continue
            attributed += 1
            n = len(win)
            last_ty = max(win)[2]
            first_ty = min(win)[2]
            replay["last"][last_ty] = \
                replay["last"].get(last_ty, 0.0) + 1.0
            replay["first"][first_ty] = \
                replay["first"].get(first_ty, 0.0) + 1.0
            for _t, _e, ty in win:
                replay["linear"][ty] = \
                    replay["linear"].get(ty, 0.0) + 1.0 / n
            for i, (_t, _e, ty) in enumerate(win):
                c = (1.0 if n == 1 else 0.5 if n == 2
                     else 0.4 if i == 0 else 0.4 if i == n - 1
                     else 0.2 / (n - 2))
                replay["position"][ty] = \
                    replay["position"].get(ty, 0.0) + c
        for model in ("last", "first", "linear", "position"):
            got = {r["touch_type"]: r["credit"]
                   for r in EV.attribution(events, model=model,
                                           lookback_s=look)
                   .collect()}
            want = replay[model]
            assert set(got) == {t for t, c in want.items()
                                if c > 0}, (seed, model)
            for ty, c in want.items():
                if c > 0:
                    assert abs(got[ty] - c) < 1e-5, (seed, model, ty)
            assert abs(sum(got.values()) - attributed) < 1e-5, \
                (seed, model)
