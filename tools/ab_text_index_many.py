#!/usr/bin/env python3
"""A/B batched text-index serving (VERDICT r11 #6): N sequential
``search_text_index`` serves vs ONE ``search_text_index_many`` plan
over the same stored index, at sf0.1. Also re-asserts row-for-row
parity on the measured corpus before timing.

Run on a quiet host: python tools/ab_text_index_many.py [N]
"""

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from metacat_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = 3

# 16 realistic mixed-length queries over the synthetic corpus
QUERIES = {
    f"q{i}": terms for i, terms in enumerate([
        ["spark", "window", "merge"],
        ["the", "data"],
        ["spark"],
        ["merge", "join", "shuffle"],
        ["window"],
        ["data", "pipeline"],
        ["query", "plan"],
        ["the"],
        ["stream", "batch"],
        ["index", "scan"],
        ["join"],
        ["filter", "predicate", "pushdown"],
        ["sort", "order"],
        ["hash", "partition"],
        ["table", "column"],
        ["spark", "merge"],
    ])
}


def main():
    from metacat_spark.llm.search import (build_text_index,
                                          search_text_index,
                                          search_text_index_many)
    n_q = int(sys.argv[1]) if len(sys.argv) > 1 else len(QUERIES)
    queries = dict(list(QUERIES.items())[:n_q])
    spark = get_spark("ab_text_index_many")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    idx_path = "/tmp/ab_many_idx"
    if not os.path.isdir(idx_path):
        build_text_index(docs).write.mode("overwrite") \
            .parquet(idx_path)
    stored = spark.read.parquet(idx_path)
    stored.count()                                  # warm the scan

    # parity on the measured corpus first — a fast wrong answer is
    # not a result
    many = {}
    for r in search_text_index_many(stored, queries, k=10).collect():
        many.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], r["score"]))
    for qid, terms in queries.items():
        per = [(r["rank"], r["doc_id"], r["score"])
               for r in search_text_index(stored, terms, k=10)
               .collect()]
        assert sorted(many.get(qid, [])) == sorted(per), qid
    print(f"parity ok over {len(queries)} queries")

    def t_sequential():
        t0 = time.monotonic()
        for terms in queries.values():
            search_text_index(stored, terms, k=10).collect()
        return time.monotonic() - t0

    def t_batched():
        t0 = time.monotonic()
        search_text_index_many(stored, queries, k=10).collect()
        return time.monotonic() - t0

    seq, bat = [], []
    for _ in range(REPS):                          # interleaved
        seq.append(t_sequential())
        bat.append(t_batched())
    ms, mb = statistics.median(seq), statistics.median(bat)
    print(f"n_queries={len(queries)} reps={REPS}")
    print(f"sequential serves: median {ms:.2f} s "
          f"({[round(x, 2) for x in seq]})")
    print(f"one batched plan:  median {mb:.2f} s "
          f"({[round(x, 2) for x in bat]})")
    print(f"speedup {ms / mb:.2f}x")


if __name__ == "__main__":
    main()
