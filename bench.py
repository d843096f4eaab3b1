#!/usr/bin/env python3
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": <total sec>, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Query timings are end-to-end (plan build + execution + collect of the
aggregated/limited result). A warmup query amortizes JVM/codegen
startup so per-query numbers reflect steady-state throughput, which is
what a resident catalog service (the reference is a long-lived web
server) actually delivers.

KNOWN-BENIGN LOG NOISE (root-caused r8, VERDICT r7 #2): runs may
intermittently emit bursts of
``ERROR DAGScheduler: Failed to update accumulator N (Unknown class)
for task 0/1`` — reproduced under the official protocol (r8 run:
rc 0, cold 20.0 s / warm 17.1 s, all values in band) with per-query
markers proving both bursts land exactly inside q8_dedup_minhash_lsh
(cold and warm). Mechanism: q8's plan contains a lazy
``localCheckpoint``; when it materializes, the pre-checkpoint plan
fragment — and its ~70 SQL-UI metric accumulators, which
AccumulatorContext holds only WEAKLY — is discarded while the 2-task
parquet-scan stage's completion events are still in flight on the
DAGScheduler event loop. A natural GC in that window clears the weak
refs, and ``updateAccumulators`` logs one ERROR per cleared metric
and DROPS THE METRIC UPDATE ONLY (DAGScheduler catches per
accumulator; job results are delivered through the independent
JobWaiter path — q8 returned its normal 256 pairs with normal timing
in the same run, and its value-hash is oracle-checked by the
CORRECTNESS gate). "(Unknown class)" in the message is itself the
proof the accumulator was already unreachable — nothing could ever
have read that metric again. Intermittent because it needs a GC
inside a millisecond window; impossible for it to affect data.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from metacat_spark.catalog import from_materialized
from metacat_spark.engine import Engine
from metacat_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _consume(df):
    """Execute EVERY output column, not just a row count: under
    count(*) Catalyst prunes all unreferenced projections, so a
    projection-only operator (text analysis, windowed aggregates'
    value columns) would be timed as a bare scan (review r6 —
    verified: analyze(df).count() optimized to Aggregate[count(1)]
    over an empty Project). Hashing a struct of all columns forces
    the full computation; one long per row reaches the aggregate."""
    cols = [F.col(c) for c in df.columns]
    row = (df.select(F.xxhash64(F.struct(*cols)).alias("__h"))
           # bit_xor: order-independent consumption sink with no
           # ANSI long-overflow hazard (sum of 2^63-range hashes
           # overflows)
           .agg(F.count("__h").alias("n"), F.bit_xor("__h"))
           .collect()[0])
    return row["n"]


def bench_queries(engine: Engine):
    """name -> zero-arg callable returning a row count."""
    docs = engine.cat.raw["documents"]
    embs = engine.cat.raw["embeddings"]

    from metacat_spark.llm import dedup as DD
    from metacat_spark.llm import similarity as SIM
    from metacat_spark.llm import text as TX
    from metacat_spark.streaming import events as EV

    q = {}
    q["q1_bfq_predicate"] = lambda: _consume(engine.query(
        "files from dune:urgent_0 where core.run > 250 and core.x <= 0.5"))
    q["q2_multi_predicate_scan"] = lambda: _consume(engine.query(
        "files where core.runs[any] > 490 or "
        '(beam.status = "on" and core.timestamp > datetime("1996-06-01"))'))
    q["q3_set_algebra"] = lambda: _consume(engine.query(
        "union(files from dune:urgent_0, files from dune:urgent_1) "
        "- files from mc:flag_r where core.good = true"))
    q["q4_provenance"] = lambda: _consume(engine.query(
        "parents(files from test:all where core.run in 10:50)"))
    q["q5_pagination"] = lambda: len(engine.query(
        "files from test:all skip 1000 limit 500").collect())
    # r16 (VERDICT r15 #6): the id-cursor pagination posture — the
    # 100 TB scale path docs/SCALING.md promises (pruned scan +
    # TakeOrderedAndProject, no global sort) — measured as its own
    # bench line: the page q5 answers with skip-1000, fetched by
    # cursor instead (after the 1000th ordered id at sf0.1). ADDED
    # entry; q5's declared skip/limit semantics and timing are
    # untouched.
    q["q5b_pagination_cursor"] = lambda: len(engine.query(
        "files from test:all",
        after_id="f0000002514000928400978",
        page_size=500).collect())
    q["q6_summary_count"] = lambda: len(engine.query(
        "files from test:all", summary="count").collect())
    q["q7_filter_hash"] = lambda: _consume(engine.query(
        "filter hash(4, 1)(files from dune:high_0)"))
    q["q8_dedup_minhash_lsh"] = lambda: _consume(
        DD.minhash_lsh_pairs(docs, n=2, k=32, bands=8, threshold=0.5))
    q["q9_text_analysis"] = lambda: _consume(TX.analyze(docs))
    # headline measures the 100TB scale design (bucketed ANN), not the
    # exact all-pairs baseline; q10b keeps the exact blocked GEMM honest
    q["q10_embed_topk"] = lambda: _consume(SIM.lsh_bucketed_topk(
        embs, k=3, n_tables=8, planes_per_table=4))
    q["q10b_embed_topk_exact"] = lambda: _consume(SIM.topk_gemm(embs, k=3))
    q["q11_events_window"] = lambda: _consume(
        EV.windowed_counts(EV.load_events(engine.spark, SF_DIR)))
    q["q12_events_sessionize"] = lambda: _consume(
        EV.sessionize(EV.load_events(engine.spark, SF_DIR), 30))
    return q


def served_bench(engine, spark) -> dict:
    """Serve-from-stored-artifact sub-metrics (VERDICT r13 #6): the
    repo's production posture is train-once/serve-many, but the
    headline 13 queries all build inline — serving performance was
    only ever measured in one-off probes (docs/SCALING.md). This
    times the three served families — text-index BM25 serve, IVF-PQ
    postings serve, cluster-sample from stored centroids — against
    artifacts built (untimed) into a temp dir, median of 3 passes
    each. NEW json keys under "served"; the headline `value` and
    `queries` are untouched (baseline continuity)."""
    import shutil
    import tempfile

    from metacat_spark.llm import search as SR
    from metacat_spark.llm import similarity as SIM

    docs = engine.cat.raw["documents"]
    embs = engine.cat.raw["embeddings"]
    tmp = tempfile.mkdtemp(prefix="bench_served_")
    try:
        t0 = time.time()
        SR.build_text_index(docs).write.parquet(f"{tmp}/text_idx")
        idx = SIM.build_ivfpq_index(embs, n_lists=16, m=8,
                                    n_codes=16, train_iters=1)
        idx.write.parquet(f"{tmp}/ivfpq_idx")
        SIM.encode_ivfpq(embs, spark.read.parquet(
            f"{tmp}/ivfpq_idx")).write.parquet(f"{tmp}/postings")
        SIM.build_ivf_centroids(embs, n_lists=16, train_iters=1) \
            .write.parquet(f"{tmp}/cents")
        setup = time.time() - t0
        text_idx = spark.read.parquet(f"{tmp}/text_idx")
        ivf_idx = spark.read.parquet(f"{tmp}/ivfpq_idx")
        postings = spark.read.parquet(f"{tmp}/postings")
        cents = spark.read.parquet(f"{tmp}/cents")
        serves = {
            "text_index_serve": lambda: _consume(
                SR.search_text_index(
                    text_idx, ["spark", "window", "merge"], k=10)),
            "ivfpq_serve": lambda: _consume(SIM.ivf_pq_search(
                embs, postings, ivf_idx, k=3, n_probe=4)),
            "cluster_sample_serve": lambda: _consume(
                SIM.cluster_balanced_sample(embs, per_cluster=20,
                                            centroids=cents)),
        }
        out = {"setup_sec": round(setup, 3)}
        # r16 (VERDICT r15 #2): the served phase gets the SAME
        # per-pass steal ceiling + re-gate + re-run protocol as the
        # warm passes — r15's artifact-of-record served numbers ran
        # at 21.62% steal and were unusable for round-over-round
        # comparison. Every attempt stays recorded in served.runs;
        # the published per-serve values are medians over the quiet
        # passes when any exist. served.steal_pct now reports the
        # worst steal among the passes the values were computed FROM
        # (the self-identification the r15 annotation was missing);
        # the whole-phase measure incl. setup is phase_steal_pct.
        steal_ceiling = float(os.environ.get(
            "SPARK_GRAFT_STEAL_CEILING_PCT", "2.0"))
        max_retries = int(os.environ.get(
            "SPARK_GRAFT_MAX_STEAL_RETRIES", "3"))

        def serve_pass(label):
            vals = {}
            s0, t0 = _cpu_ticks()
            i0 = _idle_ticks()
            for name, fn in serves.items():
                pv = []
                for _ in range(3):
                    t = time.time()
                    fn()
                    pv.append(time.time() - t)
                vals[name + "_sec"] = round(sorted(pv)[1], 4)
                print(f"# served {label} {name}: "
                      f"{vals[name + '_sec']:.3f}s (median of 3)",
                      file=sys.stderr)
            s1, t1 = _cpu_ticks()
            i1 = _idle_ticks()
            busy = max(1, (t1 - t0) - (i1 - i0))
            return vals, round(100.0 * (s1 - s0) / busy, 2)

        runs = []
        retries = 0
        vals, st = serve_pass("pass1")
        runs.append({**vals, "steal_pct": st})
        while st > steal_ceiling and retries < max_retries:
            retries += 1
            print(f"# served pass steal {st}% > ceiling "
                  f"{steal_ceiling}% — re-gating on steal and "
                  f"re-running (retry {retries}/{max_retries})",
                  file=sys.stderr)
            _await_low_steal(max_wait_s=120)
            vals, st = serve_pass(f"retry{retries}")
            runs.append({**vals, "steal_pct": st})
        quiet = [r for r in runs if r["steal_pct"] <= steal_ceiling]
        use = quiet or runs
        for name in serves:
            key = name + "_sec"
            v = sorted(r[key] for r in use)
            out[key] = v[len(v) // 2] if len(v) % 2 else round(
                (v[len(v) // 2 - 1] + v[len(v) // 2]) / 2, 4)
        out["steal_pct"] = max(r["steal_pct"] for r in use)
        out["runs"] = runs
        out["steal_retries_used"] = retries
        out["steal_ceiling_pct"] = steal_ceiling
        return out
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _stray_jvms() -> int:
    """JVMs already running before ours spawns — a lingering Spark
    JVM (pytest, a prior bench) contends for the 32 cores and has
    skewed cold numbers by 2-4× (q7 2.8s → 12.5s measured). Recorded
    in the output so a contaminated run is identifiable instead of
    silently mis-read as a regression."""
    import subprocess
    try:
        r = subprocess.run(["pgrep", "-c", "java"],
                           capture_output=True, text=True, timeout=5)
        return int(r.stdout.strip() or 0)
    except Exception:  # noqa: BLE001 — telemetry only
        return -1


def _await_quiet_host(max_wait_s: int = 300,
                      poll_s: int = 10) -> int:
    """Wait for lingering JVMs to exit; ABORT if they don't.  The r5
    official bench was recorded with a stray JVM contending for the
    32 cores (cold total 21.3s vs 17.2-17.5s clean — the exact skew
    the r4 sentinel warned about), so warn-and-proceed is not enough:
    a contaminated run must not be recordable as the official
    artifact.  Set SPARK_GRAFT_ALLOW_STRAY=1 to override (e.g. on a
    shared host where some unrelated JVM legitimately stays up)."""
    stray = _stray_jvms()
    if stray < 0:
        print("# NOTE: stray-JVM probe failed (pgrep unavailable)",
              file=sys.stderr)
        return stray
    deadline = time.time() + max_wait_s
    while stray > 0 and time.time() < deadline:
        print(f"# waiting for {stray} lingering JVM(s) to exit "
              f"({int(deadline - time.time())}s left)...",
              file=sys.stderr)
        time.sleep(poll_s)
        stray = _stray_jvms()
    if stray > 0:
        if os.environ.get("SPARK_GRAFT_ALLOW_STRAY") == "1":
            print(f"# WARNING: {stray} JVM(s) still running — "
                  f"proceeding because SPARK_GRAFT_ALLOW_STRAY=1; "
                  f"cold numbers will be contended", file=sys.stderr)
            return stray
        print(f"# FATAL: {stray} JVM(s) still running after "
              f"{max_wait_s}s — refusing to record a contaminated "
              f"benchmark. Kill them or set SPARK_GRAFT_ALLOW_STRAY=1.",
              file=sys.stderr)
        sys.exit(3)
    return stray


def _await_low_load(threshold: float = 2.0, threshold5: float = 2.5,
                    max_wait_s: int = 900,
                    poll_s: int = 15) -> tuple:
    """Wait (bounded) for a SUSTAINED quiet host — 1-min load below
    ``threshold`` AND 5-min load below ``threshold5`` — before
    starting, so the official artifact is a quiet-host number by
    construction (VERDICT r9 #1 / r10 #1: r10's gate checked only the
    1-min average and passed at [1.96, 3.96, 3.63] — a host that had
    been busy seconds earlier — recording 22.5 s cold vs the
    demonstrated ~16 s quiet band; three rounds straight the number of
    record was a sub-quiet reading). The 5-min term is what makes the
    window sustained: a burst that just ended leaves la5 elevated for
    minutes even when la1 has already decayed.

    Returns ``(contended, recently_loaded)``:

    - ``contended``       — la1 still >= threshold when we proceeded
      (timed out, or forced via SPARK_GRAFT_SKIP_LOAD_WAIT=1).
    - ``recently_loaded`` — la1 quiet but la5 still >= threshold5
      when we proceeded (the r10 technicality, now self-identifying
      in the JSON instead of needing a post-hoc load_avg read).

    Unlike the stray-JVM guard this does not abort: stray JVMs are
    always our own leftovers (killable), but background load may be
    outside the operator's control and a loudly-flagged number still
    has value."""
    def classify():
        la1, la5, _ = os.getloadavg()
        return la1 >= threshold, la1 < threshold and la5 >= threshold5

    if os.environ.get("SPARK_GRAFT_SKIP_LOAD_WAIT") == "1":
        contended, recent = classify()
        if contended or recent:
            la1, la5, _ = os.getloadavg()
            print(f"# WARNING: starting at load [{la1:.2f}, {la5:.2f}] "
                  f"because SPARK_GRAFT_SKIP_LOAD_WAIT=1 — run will be "
                  f"flagged {'contended' if contended else 'recently_loaded'}",
                  file=sys.stderr)
        return contended, recent
    deadline = time.time() + max_wait_s
    while time.time() < deadline:
        la1, la5, _ = os.getloadavg()
        if la1 < threshold and la5 < threshold5:
            return False, False
        print(f"# load_avg [{la1:.2f}, {la5:.2f}] not sustained-quiet "
              f"(need 1-min < {threshold} AND 5-min < {threshold5}) — "
              f"waiting ({int(deadline - time.time())}s left)...",
              file=sys.stderr)
        time.sleep(poll_s)
    contended, recent = classify()
    la1, la5, _ = os.getloadavg()
    print(f"# WARNING: load still [{la1:.2f}, {la5:.2f}] after "
          f"{max_wait_s}s — proceeding, flagging the artifact "
          f"{'contended' if contended else 'recently_loaded' if recent else 'clean'}",
          file=sys.stderr)
    return contended, recent


def _host_snapshot() -> dict:
    """1/5/15-min load average + live pyspark.daemon count — recorded
    at start AND end so a contended run is self-identifying in the
    official artifact instead of needing out-of-band uptime notes
    (VERDICT r8 #2: the documented contention signature is load avg
    > ~2 at start with uniformly slow queries; a clean run on this
    32-cpu host shows < ~1.5)."""
    import subprocess
    try:
        daemons = int(subprocess.run(
            ["pgrep", "-cf", "pyspark.daemon"],
            capture_output=True, text=True).stdout.strip() or 0)
    except Exception:
        daemons = -1
    la1, la5, la15 = os.getloadavg()
    return {"load_avg": [round(la1, 2), round(la5, 2),
                         round(la15, 2)],
            "pyspark_daemons": daemons}


def _steal_probe(burn_s: float = 1.0) -> float:
    """Measured steal share while THIS guest is actually demanding
    CPU: burn one core for ``burn_s`` and return steal / non-idle
    ticks over the window. Idle steal reads ~0 even when a neighbor
    is active (nothing runnable to steal from), so the probe must
    generate demand. One core for one second — cheap enough to not
    disturb the load averages the other gate watches."""
    s0, t0 = _cpu_ticks()
    i0 = _idle_ticks()
    end = time.time() + burn_s
    while time.time() < end:
        pass
    s1, t1 = _cpu_ticks()
    i1 = _idle_ticks()
    busy = max(1, (t1 - t0) - (i1 - i0))
    return (s1 - s0) / busy


def _idle_ticks() -> int:
    try:
        parts = open("/proc/stat").readline().split()[1:]
        return int(parts[3]) + int(parts[4])     # idle + iowait
    except Exception:
        return 0


def _await_low_steal(threshold: float = 0.01, sustained: int = 2,
                     max_wait_s: int = 300,
                     poll_s: int = 15) -> float:
    """Wait (bounded) for a SUSTAINED low-hypervisor-steal window:
    ``sustained`` consecutive probes below ``threshold``. Loadavg
    gates can't see a noisy NEIGHBOR (r12: 11% of ticks stolen under
    load at loadavg 0.04, bench totals swinging 15.8 → 29.6 s in
    direct proportion to steal_pct), and r12's artifact of record
    passed a single 4% probe yet ran at 1.99% steal with warm≈cold —
    hence the tightened ≤1% SUSTAINED gate (VERDICT r12 #1). Returns
    the last probed steal share; like the load gate it proceeds
    loudly rather than aborting — the artifact records per-pass
    ``steal_pct`` either way. The wait is capped well below the load
    gate's (the driver's overall bench budget must absorb both
    waits)."""
    if os.environ.get("SPARK_GRAFT_SKIP_LOAD_WAIT") == "1":
        return -1.0
    deadline = time.time() + max_wait_s
    ok_streak = 0
    share = 1.0
    while True:
        share = _steal_probe()
        if share < threshold:
            ok_streak += 1
            if ok_streak >= sustained:
                return share
            continue                      # probe again back-to-back
        ok_streak = 0
        if time.time() >= deadline:
            print(f"# WARNING: steal probe still {share:.1%} after "
                  f"{max_wait_s}s — proceeding; read the per-pass "
                  f"steal_pct in the artifact", file=sys.stderr)
            return share
        print(f"# steal probe {share:.1%} >= {threshold:.0%} — a "
              f"neighbor VM is eating cycles; waiting "
              f"({int(deadline - time.time())}s left)...",
              file=sys.stderr)
        time.sleep(poll_s)


def _cpu_ticks() -> tuple[int, int]:
    """(steal ticks, total ticks) from /proc/stat — cumulative, so a
    delta around the run yields the run's steal share. On a shared
    hypervisor a noisy neighbor steals cycles WITHOUT raising this
    guest's load average (r12: measured 11% steal at loadavg 0.04,
    bench total swinging 15.8→21.9 s) — loadavg gates can't see it,
    so the artifact must record it."""
    try:
        parts = open("/proc/stat").readline().split()[1:]
        vals = [int(x) for x in parts]
        return (vals[7] if len(vals) > 7 else 0), sum(vals)
    except Exception:
        return 0, 0


def main():
    stray = _await_quiet_host()
    contended, recently_loaded = _await_low_load()
    steal_at_start = _await_low_steal()
    host_start = _host_snapshot()
    host_start["steal_probe"] = round(steal_at_start, 4)
    steal0, total0 = _cpu_ticks()
    # t0 AFTER the stray-JVM wait: up to 300s of polling sleep must
    # not be reported as ingest/warmup cost (review r6)
    t0 = time.time()
    spark = get_spark("metacat_spark_bench")
    # artifact hygiene (VERDICT r11 nit): the known-benign
    # accumulator burst (module docstring — weak-ref GC noise from
    # q8's localCheckpoint, root-caused r8, data-impossible) is the
    # ONLY ERROR this logger emits in bench runs, and it spams a
    # stack trace into the recorded tail. Silence that one logger;
    # real failures still surface as Python exceptions from
    # collect(), which the harness records per query.
    try:
        jvm = spark.sparkContext._jvm
        jvm.org.apache.logging.log4j.core.config.Configurator \
            .setLevel("org.apache.spark.scheduler.DAGScheduler",
                      jvm.org.apache.logging.log4j.Level.FATAL)
    except Exception:
        pass                       # best-effort; noise is cosmetic
    # ingest once into bucketed warehouse tables (counted as setup,
    # like the reference's one-time declare_files load into PostgreSQL)
    engine = Engine(from_materialized(spark, SF_DIR))
    # warmup: touch the files plan once (JVM + codegen warm) and spin
    # up the Arrow python workers (first pandas UDF pays worker fork);
    # compute catalog invariants (file-id uniqueness backing the
    # set-algebra fast path) at startup like a resident service would
    engine.query("files from dune:urgent_0 limit 1").collect()
    engine._file_ids_unique()
    # the UDF output must actually be CONSUMED (summed), and the UDF
    # marked nondeterministic, or Catalyst prunes the ArrowEvalPython
    # stage entirely and no worker ever forks — exactly the count()
    # pruning the consumption sink exists to prevent, biting the
    # warmup itself (review r7: measured 0 live workers after the old
    # warmup; q7 cold was paying a 32-task worker-fork storm, ~2s
    # serialized through the single-threaded pyspark daemon)
    warm = F.pandas_udf(lambda s: s, "long").asNondeterministic()
    par = spark.sparkContext.defaultParallelism
    (engine.cat.files.select("id").repartition(par)
     .select(warm(F.length("id")).alias("v"))
     .agg(F.sum("v")).collect())
    setup_sec = time.time() - t0

    # re-probe steal BEFORE the cold pass (VERDICT r14 #1): ~1 min of
    # ingest/warmup separates the start-of-run gates from the first
    # timed query; a neighbor that woke up mid-setup would otherwise
    # contaminate the cold numbers with no gate in between
    _await_low_steal(max_wait_s=120)

    # per-query error isolation: one failing query must never zero the
    # whole suite's signal — record the error and keep going
    queries = bench_queries(engine)
    timings, errors = {}, {}
    cold_s0, cold_t0 = _cpu_ticks()
    cold_i0 = _idle_ticks()
    for name, fn in queries.items():
        t = time.time()
        try:
            n = fn()
        except Exception as e:  # noqa: BLE001 — isolate, report, continue
            errors[name] = f"{type(e).__name__}: {e}"[:500]
            print(f"# {name}: ERROR {errors[name]}", file=sys.stderr)
            continue
        timings[name] = round(time.time() - t, 4)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)",
              file=sys.stderr)
    # steal measured over the cold pass itself (r15): the cold numbers
    # cannot be re-run (a second run is no longer cold), so a
    # contended cold window must at least be self-identifying in the
    # artifact instead of reading as a code regression
    cold_s1, cold_t1 = _cpu_ticks()
    cold_i1 = _idle_ticks()
    cold_busy = max(1, (cold_t1 - cold_t0) - (cold_i1 - cold_i0))
    cold_steal = round(100.0 * (cold_s1 - cold_s0) / cold_busy, 2)
    print(f"# cold pass steal: {cold_steal}%", file=sys.stderr)

    # warm passes: steady-state (codegen/scan caches warm) — what a
    # resident catalog service delivers per request. Run ≥3 gated
    # passes and record the per-query MEDIAN (VERDICT r12 #1: a
    # single warm pass under transient neighbor pressure became the
    # artifact of record; medians over interleaved passes with
    # per-pass steal make one contended window identifiable and
    # non-fatal). Nudge a JVM GC before each pass: Spark's
    # ContextCleaner releases the prior pass's shuffle
    # files/broadcasts only on GC, and carrying ~13 queries of dead
    # shuffle state measurably skews the heaviest queries (q8
    # drifted 2.5s → 5.3s across runs without this).
    def warm_pass(label):
        spark.sparkContext._jvm.System.gc()
        s0, t0ticks = _cpu_ticks()
        i0 = _idle_ticks()
        w = {}
        for name, fn in queries.items():
            if name in errors:
                continue
            # marker BEFORE the run: any Spark ERROR trace in the
            # log can be attributed to the query that was executing
            print(f"# {label} {name}...", file=sys.stderr)
            t = time.time()
            try:
                fn()
            except Exception as e:  # noqa: BLE001
                errors[name] = f"{label}: {type(e).__name__}: {e}"[:500]
                continue
            w[name] = round(time.time() - t, 4)
            print(f"# {label} {name}: {w[name]:.3f}s",
                  file=sys.stderr)
        s1, t1ticks = _cpu_ticks()
        i1 = _idle_ticks()
        busy = max(1, (t1ticks - t0ticks) - (i1 - i0))
        return w, round(100.0 * (s1 - s0) / busy, 2)

    # Per-pass steal ceiling (VERDICT r14 #1): the r14 artifact of
    # record carried a 25.33%-steal warm pass because the only retry
    # gate was warm>=cold — a contended pass that still beat the cold
    # total sat in the medians. Now any warm pass whose measured
    # steal exceeds the ceiling is re-gated (steal probe) and re-run,
    # bounded by SPARK_GRAFT_MAX_STEAL_RETRIES so a persistently
    # noisy neighbor can't stall the bench; EVERY pass (contended
    # ones included) stays recorded in warm_runs, but the medians are
    # computed over the quiet passes when at least two exist — the
    # artifact is quiet by construction AND self-identifying.
    steal_ceiling = float(os.environ.get(
        "SPARK_GRAFT_STEAL_CEILING_PCT", "2.0"))
    max_retries = int(os.environ.get(
        "SPARK_GRAFT_MAX_STEAL_RETRIES", "3"))
    n_warm = int(os.environ.get("SPARK_GRAFT_WARM_PASSES", "3"))
    passes = []
    retries_used = 0
    for k in range(n_warm):
        w, st = warm_pass(f"warm{k + 1}")
        passes.append((w, st))
        print(f"# warm{k + 1} total: "
              f"{round(sum(w.values()), 3)}s (steal {st}%)",
              file=sys.stderr)
        while st > steal_ceiling and retries_used < max_retries:
            retries_used += 1
            print(f"# warm pass steal {st}% > ceiling "
                  f"{steal_ceiling}% — re-gating on steal and "
                  f"re-running (retry {retries_used}/{max_retries})",
                  file=sys.stderr)
            _await_low_steal(max_wait_s=120)
            w, st = warm_pass(f"warm{k + 1}r{retries_used}")
            passes.append((w, st))
            print(f"# warm{k + 1}r{retries_used} total: "
                  f"{round(sum(w.values()), 3)}s (steal {st}%)",
                  file=sys.stderr)

    total = round(sum(timings.values()), 4)

    def median_of(runs):
        # medians over the quiet passes when >= 2 exist; otherwise
        # over everything (a fully contended set still yields a
        # number — loudly, via the recorded per-pass steal)
        quiet = [(w, s) for w, s in runs if s <= steal_ceiling]
        if len(quiet) >= 2:
            runs = quiet
        med = {}
        for name in queries:
            vals = sorted(w[name] for w, _ in runs if name in w)
            if vals:
                med[name] = vals[len(vals) // 2] if len(vals) % 2 \
                    else round((vals[len(vals) // 2 - 1]
                                + vals[len(vals) // 2]) / 2, 4)
        return med

    warm = median_of(passes)
    # warm<cold sanity (VERDICT r12 #1): warm ≈/> cold is the
    # contention signature (caches can only help). If the median
    # warm total fails it, re-gate on steal and run one more pass,
    # then take medians over all passes — a transient window gets
    # outvoted instead of recorded.
    warm_retried = False
    if warm and timings and sum(warm.values()) >= sum(
            timings[n] for n in warm if n in timings):
        print("# warm total >= cold total — contention signature; "
              "re-gating on steal and adding a warm pass",
              file=sys.stderr)
        warm_retried = True
        _await_low_steal()
        w, st = warm_pass(f"warm{n_warm + 1}")
        passes.append((w, st))
        warm = median_of(passes)
    # served-artifact sub-metrics run LAST so the headline cold and
    # warm numbers are already recorded; an error here must not zero
    # the suite's signal. Since r16 the served phase has the same
    # per-pass steal ceiling + retry gate as the warm passes
    # (VERDICT r15 #2); the whole-phase steal is still recorded here.
    srv_s0, srv_t0 = _cpu_ticks()
    srv_i0 = _idle_ticks()
    try:
        served = served_bench(engine, spark)
    except Exception as e:  # noqa: BLE001 — isolate, report
        served = {"error": f"{type(e).__name__}: {e}"[:300]}
        print(f"# served bench ERROR: {served['error']}",
              file=sys.stderr)
    srv_s1, srv_t1 = _cpu_ticks()
    srv_i1 = _idle_ticks()
    srv_busy = max(1, (srv_t1 - srv_t0) - (srv_i1 - srv_i0))
    # whole-phase steal (setup + every pass incl. contended retries);
    # served.steal_pct itself is set inside served_bench from the
    # passes the published values came from (r16 retry gate)
    served["phase_steal_pct"] = round(
        100.0 * (srv_s1 - srv_s0) / srv_busy, 2)
    served.setdefault("steal_pct", served["phase_steal_pct"])
    out = {
        "metric": "mql_suite_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "setup_sec": round(setup_sec, 3),
        "queries_warm": warm,
        "warm_total_sec": round(sum(warm.values()), 4),
        # per-pass totals + steal: the distribution behind the
        # medians, so the driver sees a contended pass explicitly
        "warm_runs": [{"total_sec": round(sum(w.values()), 4),
                       "steal_pct": st} for w, st in passes],
        "warm_retried": warm_retried,
        # r15 protocol: passes above the ceiling are re-run (bounded)
        # and excluded from the medians when >= 2 quiet passes exist;
        # all passes stay recorded in warm_runs above
        "steal_ceiling_pct": steal_ceiling,
        "steal_retries_used": retries_used,
        "cold_steal_pct": cold_steal,
        "served": served,
        "stray_jvms_at_start": stray,
        "host_start": host_start,
        "host_end": _host_snapshot(),
        # hypervisor steal share over the whole run (setup + all
        # passes): > ~2-3% means a noisy neighbor was eating cycles
        # and the wall-clock numbers are inflated regardless of how
        # clean the load averages look (r12)
        "steal_pct": (lambda s1t: round(
            100.0 * (s1t[0] - steal0) / max(1, s1t[1] - total0), 2))(
            _cpu_ticks()),
    }
    if contended:
        out["contended"] = True
    if recently_loaded:
        out["recently_loaded"] = True
    if errors:
        out["errors"] = errors
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
