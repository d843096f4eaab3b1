#!/usr/bin/env python3
"""Many-fragment serve degradation probe (VERDICT r12 #4 — the
append-only text-index design's one unmeasured axis): at sf0.1, build
the SAME corpus index as 1/16/64/256 parquet-appended fragments (each
fragment a complete build_text_index part over a disjoint doc slice),
then time against each artifact

- single-query serve (search_text_index),
- batched serve of 8 queries (search_text_index_many),
- the integrity gauge (text_index_stats),
- compact_text_index + a serve of the compacted artifact,

to find the compaction crossover that ``text_index_stats``'s
``n_parts``/``compact_recommended`` columns should recommend at.
Serves are verified row-identical across fragment counts (the
append-is-extend algebra) before timings are reported.

Run on a quiet host: python tools/fragment_probe_r13.py [counts...]
Results recorded in docs/SCALING.md §fragments.
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from metacat_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
QUERY = ["spark", "window", "merge"]
BATCH = {f"q{i}": t for i, t in enumerate(
    [["spark", "window", "merge"], ["the", "data"], ["spark"],
     ["merge", "join"], ["window"], ["query", "plan"],
     ["stream", "batch"], ["the"]])}


def main(counts):
    from metacat_spark.llm.search import (build_text_index,
                                          compact_text_index,
                                          search_text_index,
                                          search_text_index_many,
                                          text_index_stats)
    spark = get_spark()
    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id", "text"))
    work = "/tmp/fragment_probe_r13"
    shutil.rmtree(work, ignore_errors=True)
    baseline_rows = None
    out = []
    for n in counts:
        path = f"{work}/idx_{n}"
        t0 = time.time()
        for i in range(n):
            (build_text_index(docs.where(f"doc_id % {n} = {i}"))
             .write.mode("append").parquet(path))
        t_build = time.time() - t0
        stored = spark.read.parquet(path)
        # correctness first: serve must be fragment-count-invariant
        rows = [(r["doc_id"], r["score"], r["rank"]) for r in
                search_text_index(stored, QUERY, k=10).collect()]
        if baseline_rows is None:
            baseline_rows = rows
        assert rows == baseline_rows, f"serve diverged at {n} parts"
        t0 = time.time()
        for _ in range(3):
            search_text_index(stored, QUERY, k=10).collect()
        t_serve = (time.time() - t0) / 3
        t0 = time.time()
        search_text_index_many(stored, BATCH, k=10).collect()
        t_many = time.time() - t0
        t0 = time.time()
        grow = text_index_stats(stored).collect()[0]
        t_gauge = time.time() - t0
        assert grow["n_parts"] == n and grow["consistent"], grow
        cpath = f"{work}/idx_{n}_compacted"
        t0 = time.time()
        compact_text_index(stored).write.parquet(cpath)
        t_compact = time.time() - t0
        crows = [(r["doc_id"], r["score"], r["rank"]) for r in
                 search_text_index(spark.read.parquet(cpath), QUERY,
                                   k=10).collect()]
        assert crows == baseline_rows, f"compact diverged at {n}"
        rec = {"n_parts": n, "build_s": round(t_build, 2),
               "serve_s": round(t_serve, 3),
               "serve_many8_s": round(t_many, 3),
               "gauge_s": round(t_gauge, 3),
               "compact_s": round(t_compact, 2)}
        out.append(rec)
        print(json.dumps(rec), flush=True)
    shutil.rmtree(work, ignore_errors=True)
    return out


if __name__ == "__main__":
    counts = [int(a) for a in sys.argv[1:]] or [1, 16, 64, 256]
    main(counts)
