"""Event-stream operators: windowed aggregation, sessionization, and
their Structured Streaming twins.

The reference has NO streaming surface (SURVEY.md §2.9) — this is
additive capability. Batch and streaming variants share the same
transformation functions so correctness of the streaming path is
checked by equivalence with the (oracle-verified) batch path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

def _ensure_nanos_conf(spark: SparkSession) -> None:
    """Older Spark rejects TIMESTAMP(NANOS) in the vectorized reader
    unless read as long nanos; 4.1+ ignores this conf and loads the
    column as TIMESTAMP_NTZ directly. Setting it is harmless either
    way; `_ts_ts_col` branches on what actually loaded."""
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # conf removed entirely in some builds


def _ts_ts_col(df: DataFrame):
    """Timestamp expression for the `ts` column regardless of how the
    parquet TIMESTAMP(NANOS) physical type was loaded: long nanos →
    µs timestamp; TIMESTAMP/TIMESTAMP_NTZ → cast to session-tz
    timestamp. Keeps every downstream operator dtype-stable across
    Spark versions (nanosAsLong became a no-op in 4.1)."""
    dtype = df.schema["ts"].dataType
    if isinstance(dtype, T.LongType):
        return F.timestamp_micros(F.expr("ts div 1000"))
    return F.col("ts").cast("timestamp")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events with a proper timestamp column `ts_ts`."""
    _ensure_nanos_conf(spark)
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    return df.withColumn("ts_ts", _ts_ts_col(df))


def load_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    _ensure_nanos_conf(spark)
    # streams need an explicit schema; probe the batch reader's schema
    # so the stream sees ts exactly as batch does (long vs timestamp)
    batch_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # readStream needs a directory source; glob-filter to the one table
    df = (spark.readStream.schema(batch_schema)
          .option("pathGlobFilter", "events.parquet")
          .parquet(sf_dir))
    return df.withColumn("ts_ts", _ts_ts_col(df))


def windowed_counts(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """Tumbling-window count/sum per event type. In streaming mode the
    1-hour watermark bounds state for late data."""
    if events.isStreaming:
        events = events.withWatermark("ts_ts", "1 hour")
    return (events
            .groupBy(F.window("ts_ts", window).alias("w"), "event_type")
            # round(…, 3): window sums reach ~1e5, where double
            # accumulation-order error (~1e-6) would flip a 6-decimal
            # round between engines; 3 decimals is boundary-safe
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 3).alias("total_value"))
            .select(F.col("w.start").alias("window_start"),
                    "event_type", "n_events", "total_value"))


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gaps-and-islands sessionization (batch): a new session starts
    when a user's inter-event gap exceeds the threshold. One shuffle on
    user_id; the per-user window sort is bounded by user activity."""
    w = Window.partitionBy("user_id").orderBy("ts_ts")
    gap = F.col("ts_ts").cast("double") \
        - F.lag(F.col("ts_ts").cast("double")).over(w)
    with_break = events.withColumn(
        "is_new", F.when(gap.isNull() | (gap > gap_minutes * 60), 1)
                   .otherwise(0))
    with_sess = with_break.withColumn(
        "session_seq", F.sum("is_new").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
    return (with_sess.groupBy("user_id", "session_seq")
            .agg(F.min("ts_ts").alias("session_start"),
                 F.max("ts_ts").alias("session_end"),
                 F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 6).alias("total_value")))


def sessionize_native(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization via Spark's native ``session_window``
    — the streaming-capable formulation (stateful session aggregation
    with watermark-driven eviction), whereas ``sessionize``'s
    lag/islands window is batch-only. One shuffle on (session_window,
    user_id); state per OPEN session only.

    Boundary note: ``session_window`` closes a session when the next
    event is >= gap away; the lag formulation uses > gap. Identical
    unless an inter-event gap equals the threshold exactly (measure-
    zero for real timestamps; the equivalence test asserts it holds
    on the fixture)."""
    if events.isStreaming:
        events = events.withWatermark("ts_ts", "1 hour")
    return (events
            .groupBy(F.session_window("ts_ts", f"{gap_minutes} minutes")
                     .alias("w"), "user_id")
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 6).alias("total_value"))
            .select("user_id",
                    F.col("w.start").alias("session_start"),
                    "n_events", "total_value"))


def _drain_events(out: DataFrame, table: str, output_mode: str,
                  what: str, sink_dir: str | None = None,
                  checkpoint_dir: str | None = None) -> DataFrame:
    """Shared drain for the events streaming twins (VERDICT r12 —
    the last memory-only family graduates to production sinks).
    With ``sink_dir`` each micro-batch lands in parquet:
    complete-mode snapshots OVERWRITE the directory (idempotent
    under foreachBatch's at-least-once replays — the sink always
    holds exactly the latest full snapshot), update-mode emissions
    APPEND (the emission history; a replayed batch can re-append —
    dedupe per key downstream if exactly-once matters, the same
    contract as ``drain_to_parquet``). Checkpointed
    (default ``sink_dir + "__checkpoint"``) so restarts resume.
    Without ``sink_dir``: availableNow → memory sink, the test
    rig. Returns the sink read back (or the memory table)."""
    import os

    spark = out.sparkSession
    if sink_dir is not None:
        mode = ("overwrite" if output_mode == "complete"
                else "append")
        ckpt = checkpoint_dir or sink_dir + "__checkpoint"
        # sink-ownership guard (review r13 — the same stale-mix
        # hazard ADVICE r12 closed in _running_topk_stream): a sink
        # holding data without its checkpoint belongs to another
        # lineage — an append-mode rerun would duplicate every row,
        # an overwrite-mode zero-batch run would return it relabeled
        if os.path.isdir(sink_dir) and os.listdir(sink_dir) \
                and not os.path.isdir(ckpt):
            raise ValueError(
                f"{what}: sink_dir {sink_dir!r} already contains "
                f"data but its checkpoint {ckpt!r} does not exist — "
                f"the existing rows belong to another run; pass a "
                f"fresh sink_dir (or the checkpoint that owns this "
                f"one)")
        fired: list = []

        def per_batch(bdf, bid):
            fired.append(int(bid))
            bdf.write.mode(mode).parquet(sink_dir)

        q = (out.writeStream.foreachBatch(per_batch)
             .outputMode(output_mode)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
    else:
        q = (out.writeStream.format("memory").queryName(table)
             .outputMode(output_mode).trigger(availableNow=True)
             .start())
    if not q.awaitTermination(120):
        q.stop()
        raise TimeoutError(
            f"{what} did not finish within 120s — refusing to "
            "return a partially populated "
            + ("sink" if sink_dir is not None else "memory table"))
    if sink_dir is not None:
        if not os.path.isdir(sink_dir) or not os.listdir(sink_dir):
            # a zero-batch stream never fired foreachBatch
            return spark.createDataFrame([], out.schema)
        if not fired:
            raise ValueError(
                f"{what}: the checkpoint {ckpt!r} already marks all "
                f"input processed — this run emitted nothing; the "
                f"sink holds a PREVIOUS run's rows (read them "
                f"directly, or use a fresh sink_dir/checkpoint_dir)")
        return spark.read.parquet(sink_dir)
    return spark.table(table)


def streaming_sessions_to_memory(spark: SparkSession, sf_dir: str,
                                 gap_minutes: int = 30,
                                 table: str = "ev_sessions",
                                 sink_dir: str | None = None,
                                 checkpoint_dir: str | None = None
                                 ) -> DataFrame:
    """Run native sessionization as a Structured Streaming job:
    with ``sink_dir`` the complete-mode snapshot parquet-OVERWRITES
    there per micro-batch (the deploy posture — name kept for
    compatibility); without it, availableNow → memory sink, the
    test rig. Returns the result table either way."""
    stream = load_events_stream(spark, sf_dir)
    agg = sessionize_native(stream, gap_minutes)
    return _drain_events(agg, table, "complete",
                         "streaming sessions", sink_dir,
                         checkpoint_dir)


def session_stats(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    s = sessionize(events, gap_minutes)
    return s.agg(
        F.count("*").alias("n_sessions"),
        F.round(F.avg("n_events"), 6).alias("avg_events_per_session"),
        F.max("n_events").alias("max_events_per_session"))


RUNNING_STATE_SCHEMA = "n long, total double"
RUNNING_OUT_SCHEMA = ("event_type string, n_events long, "
                      "total_value double")


def running_totals_stateful(stream: DataFrame) -> DataFrame:
    """Custom stateful streaming operator via applyInPandasWithState:
    per-event-type running count/sum maintained in state across
    micro-batches — the extension point for operators Spark's built-in
    streaming aggregates can't express."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame({"event_type": [key[0]], "n_events": [n],
                            "total_value": [round(total, 3)]})

    return (stream.groupBy("event_type")
            .applyInPandasWithState(update, RUNNING_OUT_SCHEMA,
                                    RUNNING_STATE_SCHEMA, "update",
                                    GroupStateTimeout.NoTimeout))


def streaming_running_totals_to_memory(spark: SparkSession, sf_dir: str,
                                       table: str = "ev_running",
                                       sink_dir: str | None = None,
                                       checkpoint_dir: str | None = None):
    """Stateful running totals as a streaming job: with ``sink_dir``
    every update-mode emission parquet-APPENDS there (per-type
    running totals over time — the emission history; the LAST row
    per event_type is the final state); without it, memory sink."""
    stream = load_events_stream(spark, sf_dir)
    out = running_totals_stateful(stream)
    return _drain_events(out, table, "update",
                         "streaming running totals", sink_dir,
                         checkpoint_dir)


def streaming_windowed_counts_to_memory(spark: SparkSession, sf_dir: str,
                                        table: str = "ev_window",
                                        sink_dir: str | None = None,
                                        checkpoint_dir: str | None = None
                                        ) -> DataFrame:
    """Run the windowed aggregation as a Structured Streaming job
    (proves the plan is streaming-executable: stateful agg +
    watermark): with ``sink_dir`` the complete-mode snapshot
    parquet-OVERWRITES there per micro-batch; without it,
    availableNow → memory sink. Returns the result table."""
    stream = load_events_stream(spark, sf_dir)
    agg = windowed_counts(stream)
    return _drain_events(agg, table, "complete",
                         "streaming windowed counts", sink_dir,
                         checkpoint_dir)


def funnel(events: DataFrame, steps: list[str],
           horizon_s: int = 3600, ts_col: str = "ts_ts",
           user_col: str = "user_id",
           type_col: str = "event_type") -> DataFrame:
    """Ordered-funnel completion per user (the product-analytics
    staple): t1 = the user's earliest step-1 event; t_i = the
    earliest step-i event at/after t_{i-1} and within ``horizon_s``
    of it. Returns one row per user who completes ALL steps, with
    every step timestamp.

    Greedy-from-earliest matching — the standard funnel
    simplification. An exhaustive matcher (restarting from later
    step-1 events when a greedy chain dies) is sequence matching
    (SQL MATCH_RECOGNIZE) and can complete funnels greedy misses;
    greedy is deterministic, SQL-replayable, and what analytics
    tools ship.

    Scale shape: k−1 joins, every one keyed on user_id — with the
    events table hash-partitioned on user once, all joins and
    groupBys co-locate; each join's build side is only that step's
    event slice. No windows over the full event stream.

    ``ts_col`` defaults to the normalized ``ts_ts`` column that
    ``load_events`` adds — NOT the raw parquet ``ts``, which loads
    as long nanos on nanosAsLong Spark builds and would break the
    interval arithmetic (ADVICE r5)."""
    return _funnel_times(events, steps, horizon_s, ts_col,
                         user_col, type_col, partial=False)


def _funnel_times(events: DataFrame, steps: list[str],
                  horizon_s: int, ts_col: str, user_col: str,
                  type_col: str, partial: bool) -> DataFrame:
    """Greedy funnel step-time chain per user. ``partial=False``
    prunes users at each step (inner joins — one row per FULL
    completer); ``partial=True`` keeps every step-1 user with nulls
    past the deepest step reached (left joins — a null t_{i-1} nulls
    the join condition, so the chain stays null from the first miss
    on; greedy chains are prefix-consistent, so t_i non-null ⇔ the
    user completes the steps[0..i] prefix funnel)."""
    ts = F.col(ts_col)
    how = "left" if partial else "inner"
    cur = (events.where(F.col(type_col) == steps[0])
           .groupBy(user_col).agg(F.min(ts).alias("t1")))
    for i in range(1, len(steps)):
        nxt = (events.where(F.col(type_col) == steps[i])
               .select(F.col(user_col).alias("_nu"),
                       ts.alias("_nts")))
        prev = F.col(f"t{i}")
        keep = [user_col] + [f"t{j}" for j in range(1, i + 1)]
        # plain timestamp comparisons work for TIMESTAMP and
        # TIMESTAMP_NTZ alike (unix_micros rejects NTZ)
        cond = ((F.col(user_col) == F.col("_nu"))
                & (F.col("_nts") >= prev)
                & (F.col("_nts") <= prev + F.expr(
                    f"INTERVAL {int(horizon_s)} SECOND")))
        cur = (cur.join(nxt, cond, how)
               .groupBy(*keep)
               .agg(F.min("_nts").alias(f"t{i + 1}")))
    return cur


def funnel_counts(events: DataFrame, steps: list[str],
                  horizon_s: int = 3600, ts_col: str = "ts_ts",
                  user_col: str = "user_id",
                  type_col: str = "event_type") -> DataFrame:
    """Users surviving each funnel prefix: (step, step_name,
    n_users) — the conversion report over ``funnel``'s semantics
    (step k's count = completers of steps[0..k]).

    SINGLE-PASS (VERDICT r5): ONE left-join funnel evaluation keeps
    every step-1 user with nulls past their deepest step, then one
    global aggregate of k count()s explodes into the report rows —
    the k-sequential-jobs loop this replaces ran O(k²) join work and
    k driver round-trips, a job launch per parameter value."""
    full = _funnel_times(events, steps, horizon_s, ts_col,
                         user_col, type_col, partial=True)
    k = len(steps)
    agg = full.agg(*[F.count(f"t{i}").alias(f"c{i}")
                     for i in range(1, k + 1)])
    names = F.array(*[F.lit(s) for s in steps])
    counts = F.array(*[F.col(f"c{i}") for i in range(1, k + 1)])
    return (agg.select(F.posexplode(counts).alias("_i", "n_users"))
            .select((F.col("_i") + 1).cast("int").alias("step"),
                    F.element_at(names, F.col("_i") + 1)
                    .alias("step_name"),
                    F.col("n_users").cast("long").alias("n_users")))


def retention_cohorts(events: DataFrame, ts_col: str = "ts_ts",
                      user_col: str = "user_id") -> DataFrame:
    """Weekly cohort retention grid: users bucket into the week of
    their FIRST activity; each (cohort_week, week_offset) cell
    counts the cohort members active that many weeks later — the
    second product-analytics staple next to the funnel.

    Shape: one distinct over (user, week), one groupBy(user) min,
    one join on user_id, one final groupBy — all keyed on user or
    on the tiny grid. ISO-Monday week truncation on both engines."""
    p = F.date_trunc("week", F.col(ts_col))
    firsts = (events.groupBy(user_col)
              .agg(F.min(p).alias("cohort_week")))
    acts = (events.select(F.col(user_col), p.alias("period"))
            .distinct())
    j = acts.join(firsts, user_col)
    offset = (F.datediff(F.col("period"), F.col("cohort_week"))
              / 7).cast("int")
    return (j.groupBy(F.col("cohort_week"),
                      offset.alias("week_offset"))
            .agg(F.countDistinct(user_col).alias("n_users")))


def funnel_stateful(stream: DataFrame, steps: list[str],
                    horizon_s: int = 3600) -> DataFrame:
    """STREAMING funnel: a per-user state machine via
    applyInPandasWithState — state = (done, next-step index, step
    times in epoch-µs), advanced event-by-event in timestamp order
    within each micro-batch; one completion row (user_id, times)
    emits the moment the final step lands.

    Equivalence contract (pinned by test): when events arrive in
    event-time order within each user across micro-batches (the
    ordered-file-stream case), the completion set equals the batch
    ``funnel``'s exactly — same greedy-from-earliest semantics, the
    state machine is just its incremental form.  Out-of-order
    arrival needs watermarked buffering in front (the standard
    trade; documented, not implemented).  State per user is O(k)
    longs — millions of concurrent users fit comfortably."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    k = len(steps)
    # membership filter + per-ts tie-break rank; the MACHINE compares
    # steps[idx] == event directly, so a steps list with REPEATED
    # names (view → cart → view) works — a name→index dict collapsed
    # repeats to the last index and never advanced (review r6)
    step_set = set(steps)
    first_pos = {s: steps.index(s) for s in step_set}
    horizon_us = int(horizon_s) * 1_000_000

    def update(key, pdfs, state):
        if state.exists:
            done, idx, times = state.get
            times = list(times)
        else:
            done, idx, times = False, 0, []
        out = []
        for pdf in pdfs:
            if done or not len(pdf):
                continue
            ev = pdf[pdf["event_type"].isin(step_set)].copy()
            if not len(ev):
                continue
            ev["__ord"] = ev["event_type"].map(first_pos)
            ev = ev.sort_values(["ts_ts", "__ord"])
            for ts, et in zip(ev["ts_ts"], ev["event_type"]):
                if done:
                    break
                if et != steps[idx]:
                    continue
                us = int(ts.value // 1000)      # pandas ns → µs
                if idx == 0:
                    times, idx = [us], 1
                elif times[-1] <= us <= times[-1] + horizon_us:
                    times.append(us)
                    idx += 1
                    if idx == k:
                        done = True
                        out.append((int(key[0]), list(times)))
        state.update((done, idx, times))
        if out:
            yield pd.DataFrame(out, columns=["user_id", "times"])

    return (stream.groupBy("user_id")
            .applyInPandasWithState(
                update, "user_id long, times array<long>",
                "done boolean, idx int, times array<long>",
                "update", GroupStateTimeout.NoTimeout))


def funnel_stateful_ooo(stream: DataFrame, steps: list[str],
                        horizon_s: int = 3600,
                        delay: str = "1 hour",
                        max_buffer: int = 10000) -> DataFrame:
    """STREAMING funnel tolerant of OUT-OF-ORDER arrival — the
    watermarked-buffer extension funnel_stateful documents but does
    not implement (VERDICT r5 #5).

    Per user, step events BUFFER in state until the event-time
    watermark (``withWatermark(ts_ts, delay)``) passes them; only
    then does the greedy state machine advance, in event-time order
    — so any disorder within the watermark delay is invisible to the
    funnel semantics and the completion set equals the batch
    ``funnel``'s exactly (pinned by a shuffled-arrival test).
    Eviction: a group with buffered events registers an event-time
    timeout just past the current watermark, so buffered tails flush
    on later (or no-data) micro-batches without new input.

    State per user is O(buffered step events within the delay
    window) — bounded by the watermark in EVENT time, and since r7
    also bounded in COUNT: a user whose PERSISTED buffer (events the
    watermark has not yet released) would exceed ``max_buffer`` has
    its oldest entries dropped, and the drop count is carried in
    state and surfaced as ``n_dropped`` on that user's completion
    row. The cap is applied after each batch's watermark-advance
    step, so already-releasable events are consumed by the state
    machine exactly as the batch funnel would — only the
    still-buffered tail is capped. n_dropped > 0 means the
    completion may differ from the batch funnel's — the
    executor-memory bound an adversarial/pathological user would
    otherwise break at scale. Completions for users within the cap
    are unaffected (pinned batch ≡ stream).

    State-schema note: r7 widened the state tuple with ``n_dropped``
    (5 → 6 fields); a streaming checkpoint written by the pre-r7
    operator cannot be resumed across the upgrade — restart the
    query from a fresh checkpoint (memory/availableNow usage in this
    repo never persists one)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    k = len(steps)
    # buffer the event's FIRST position in steps (canonical per
    # name); advancement compares step NAMES, so repeated step names
    # (view → cart → view) work — see funnel_stateful (review r6)
    step_set = set(steps)
    first_pos = {s: steps.index(s) for s in step_set}
    horizon_us = int(horizon_s) * 1_000_000

    stream = stream.withWatermark("ts_ts", delay)

    def update(key, pdfs, state):
        if state.exists:
            (done, idx, times, buf_ts, buf_step,
             n_dropped) = state.get
            times, buf_ts, buf_step = (list(times), list(buf_ts),
                                       list(buf_step))
        else:
            done, idx, times, buf_ts, buf_step, n_dropped = (
                False, 0, [], [], [], 0)
        for pdf in pdfs:
            if done or not len(pdf):
                continue
            ev = pdf[pdf["event_type"].isin(step_set)]
            for ts, et in zip(ev["ts_ts"], ev["event_type"]):
                buf_ts.append(int(ts.value // 1000))   # ns → µs
                buf_step.append(first_pos[et])
        out = []
        wm_us = state.getCurrentWatermarkMs() * 1000
        if not done and buf_ts:
            order = sorted(range(len(buf_ts)),
                           key=lambda i: (buf_ts[i], buf_step[i]))
            rest_ts, rest_step = [], []
            for i in order:
                us, st = buf_ts[i], buf_step[i]
                # STRICT: events AT the watermark stay buffered —
                # Spark only drops input strictly older than the
                # watermark, so a same-timestamp sibling may still
                # arrive in a later batch; finalizing at equality
                # could consume a step before its same-ts
                # predecessor lands (review r6)
                if us >= wm_us:
                    rest_ts.append(us)
                    rest_step.append(st)
                    continue
                if done or steps[st] != steps[idx]:
                    continue
                if idx == 0:
                    times, idx = [us], 1
                elif times[-1] <= us <= times[-1] + horizon_us:
                    times.append(us)
                    idx += 1
                    if idx == k:
                        done = True
                        out.append((int(key[0]), list(times),
                                    int(n_dropped)))
            if len(rest_ts) > max_buffer:
                # count cap (r7): the watermark bounds PERSISTED
                # state in event time but not in count — an
                # adversarial user emitting many pre-watermark
                # events would grow it without limit inside the
                # delay window. Cap AFTER the advance step so events
                # the watermark already released are never counted
                # as drops (a multi-batch backfill delivering >cap
                # already-finalizable events must advance exactly
                # like the batch funnel — review r7), and only the
                # surviving tail persists. rest_ts is already in
                # (ts, step) order, so drop-oldest is one slice.
                excess = len(rest_ts) - max_buffer
                n_dropped += excess
                rest_ts = rest_ts[excess:]
                rest_step = rest_step[excess:]
            buf_ts, buf_step = rest_ts, rest_step
        if done:
            buf_ts, buf_step = [], []
        state.update((done, idx, times, buf_ts, buf_step, n_dropped))
        if buf_ts and not done:
            # flush the buffered tail when the watermark moves, even
            # with no further input for this user (no-data batches
            # fire event-time timeouts); must be strictly beyond the
            # current watermark
            state.setTimeoutTimestamp(
                max(state.getCurrentWatermarkMs() + 1,
                    min(buf_ts) // 1000))
        if out:
            yield pd.DataFrame(
                out, columns=["user_id", "times", "n_dropped"])

    return (stream.groupBy("user_id")
            .applyInPandasWithState(
                update,
                "user_id long, times array<long>, n_dropped long",
                "done boolean, idx int, times array<long>, "
                "buf_ts array<long>, buf_step array<int>, "
                "n_dropped long",
                "update", GroupStateTimeout.EventTimeTimeout))


def streaming_funnel_to_memory(spark: SparkSession, sf_dir: str,
                               steps: list[str],
                               horizon_s: int = 3600,
                               table: str = "ev_funnel",
                               sink_dir: str | None = None,
                               checkpoint_dir: str | None = None
                               ) -> DataFrame:
    """Streaming funnel completions: with ``sink_dir`` every
    completion row parquet-APPENDS there the micro-batch it lands
    (each user completes at most once, so the append history IS the
    completion set); without it, memory sink."""
    stream = load_events_stream(spark, sf_dir)
    out = funnel_stateful(stream, steps, horizon_s)
    return _drain_events(out, table, "update", "streaming funnel",
                         sink_dir, checkpoint_dir)


def window_anomalies(events: DataFrame, window: str = "1 hour",
                     trailing: int = 24) -> DataFrame:
    """Volume-anomaly scoring per (window, event_type): each
    window's event count z-scored against the TRAILING ``trailing``
    observed windows' mean/stddev for that type — the monitoring
    alarm for traffic spikes/drops and pipeline stalls. Windows with
    fewer than two trailing observations score null.

    One windowed aggregation + one per-type ordered window (ROWS
    framing over observed windows, so calendar gaps don't dilute the
    baseline); the per-type series is tiny — the heavy lifting is
    the same windowed_counts aggregate every dashboard needs
    anyway."""
    from pyspark.sql import Window as W

    counts = windowed_counts(events, window)
    w = (W.partitionBy("event_type").orderBy("window_start")
         .rowsBetween(-trailing, -1))
    mu = F.avg("n_events").over(w)
    sd = F.stddev_samp(F.col("n_events").cast("double")).over(w)
    # a constant trailing series (sd = 0) scores null, not ±inf
    z = F.when(sd > 0, (F.col("n_events") - mu) / sd)
    return counts.select(
        "window_start", "event_type", "n_events",
        F.round(mu, 6).alias("trailing_mean"),
        F.round(sd, 6).alias("trailing_std"),
        F.round(z, 6).alias("z_score"))


def common_paths(events: DataFrame, n: int = 3, k: int = 20,
                 ts_col: str = "ts_ts", user_col: str = "user_id",
                 type_col: str = "event_type",
                 order_col: str = "event_id") -> DataFrame:
    """Top-k most frequent length-``n`` event-type paths — consecutive
    events per user in (ts, event_id) order, joined with ">" — the
    "common user journeys" report. Same posexplode/lead shape as the
    text shingle machinery: one window per user, one
    map-side-combinable groupBy(path), one TakeOrdered — no global
    sort, no per-user collection."""
    from pyspark.sql import Window as W

    w = (W.partitionBy(user_col)
         .orderBy(F.col(ts_col), F.col(order_col)))
    parts = [F.col(type_col)] + [
        F.lead(type_col, i).over(w) for i in range(1, n)]
    path = F.concat_ws(">", *parts)
    last = F.lead(type_col, n - 1).over(w)
    return (events
            .select(path.alias("path"), last.alias("_last"))
            .where(F.col("_last").isNotNull())
            .groupBy("path").agg(F.count("*").alias("n_paths"))
            .orderBy(F.col("n_paths").desc(), "path").limit(k))


def attribution(events: DataFrame, conversion: str = "purchase",
                model: str = "last", lookback_s: int = 3600,
                ts_col: str = "ts_ts", user_col: str = "user_id",
                type_col: str = "event_type",
                id_col: str = "event_id") -> DataFrame:
    """Marketing-attribution credit (the product-analytics
    companion to ``funnel``): every ``conversion`` event looks back
    ``lookback_s`` seconds over the SAME user's preceding
    non-conversion events (its touchpoints) and distributes one
    unit of credit per conversion across touch event types —

    - ``last``     — the most recent touch gets the whole unit (the
      default model everywhere);
    - ``first``    — the earliest touch in the window gets it;
    - ``linear``   — 1/n to each of the conversion's n touches;
    - ``position`` — U-shaped: 40% first, 40% last, the remaining
      20% split evenly over the middle touches (one touch takes
      100%, two split 50/50 — the standard degenerate cases).

    Conversions with no touch inside the window earn no row (the
    "(direct)" bucket of commercial tools — derivable as total
    conversions minus ``sum(n_conversions)`` of the ``last`` model,
    where each attributed conversion appears exactly once).

    Returns (touch_type, n_conversions, credit): distinct
    conversions any of whose credit landed on the type, and the
    credit mass (round-6). Deterministic: first/last pick ties by
    (timestamp, event id); linear is order-free.

    Scale shape: ONE equi-join on user_id with the time-range
    predicate applied at the join (the lookback bounds each
    conversion's candidate set, so a heavy user contributes
    window-bounded work, not their whole history); the rank/count
    windows partition by conversion id — group size = touches per
    conversion, never the stream. No global sort."""
    if model not in ("last", "first", "linear", "position"):
        raise ValueError(f"attribution: unknown model {model!r} — "
                         f"pick last, first, linear or position")
    ts = F.col(ts_col)
    conv = (events.where(F.col(type_col) == conversion)
            .select(F.col(user_col).alias("_cu"),
                    F.col(id_col).alias("_conv_id"),
                    ts.alias("_conv_ts")))
    touch = (events.where(F.col(type_col) != conversion)
             .select(F.col(user_col).alias("_tu"),
                     F.col(type_col).alias("touch_type"),
                     F.col(id_col).alias("_touch_id"),
                     ts.alias("_touch_ts")))
    cond = ((F.col("_cu") == F.col("_tu"))
            & (F.col("_touch_ts") < F.col("_conv_ts"))
            & (F.col("_touch_ts") >= F.col("_conv_ts") - F.expr(
                f"INTERVAL {int(lookback_s)} SECOND")))
    j = conv.join(touch, cond)
    if model == "linear":
        cnt = Window.partitionBy("_conv_id")
        j = j.withColumn("credit", F.lit(1.0)
                         / F.count("*").over(cnt))
    elif model == "position":
        cnt = Window.partitionBy("_conv_id")
        asc = Window.partitionBy("_conv_id").orderBy(
            F.col("_touch_ts").asc(), F.col("_touch_id").asc())
        n = F.count("*").over(cnt)
        rk = F.row_number().over(asc)
        j = j.withColumn(
            "credit",
            F.when(n == 1, 1.0)
            .when(n == 2, 0.5)
            .when(rk == 1, 0.4).when(rk == n, 0.4)
            .otherwise(F.lit(0.2) / (n - 2)))
    else:
        order = ((F.col("_touch_ts").desc(), F.col("_touch_id")
                  .desc()) if model == "last"
                 else (F.col("_touch_ts").asc(), F.col("_touch_id")
                       .asc()))
        w = Window.partitionBy("_conv_id").orderBy(*order)
        j = (j.withColumn("_rk", F.row_number().over(w))
             .where(F.col("_rk") == 1)
             .withColumn("credit", F.lit(1.0)))
    return (j.groupBy("touch_type")
            .agg(F.countDistinct("_conv_id").alias("n_conversions"),
                 F.round(F.sum("credit"), 6).alias("credit")))
