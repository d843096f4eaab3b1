#!/usr/bin/env python3
"""16x probe of ``text.sample_order_key`` (VERDICT r13 "What's wrong"
#2): the per-character interpreted HOF fold (split -> F.aggregate
lambda) is the same expression class whose nested form measured
~16 ms/row in the r13 cluster-assignment rewrite.  This probe times
the SINGLE fold at 1x/4x/16x the sf0.1 embeddings id column (2k ids,
replicated) against (a) a plain xxhash64 baseline (pure codegen) and
(b) the numpy replay of the same fold inside one mapInPandas stage —
the candidate remedy if the fold shows.

Run: python tools/skey_probe_r14.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import functions as F

from metacat_spark.llm.text import sample_order_key
from metacat_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def numpy_skey(df, id_col, seed=42):
    import numpy as np
    import pandas as pd

    from metacat_spark.llm.text import POLY_MOD, SAMPLE_MUL

    def run(batches):
        for pdf in batches:
            strs = [f"{v}#{seed}" for v in pdf[id_col].astype(str)]
            n = len(strs)
            if not n:
                continue
            ln = np.array([len(s) for s in strs])
            mx = int(ln.max()) if n else 0
            codes = np.zeros((n, mx), dtype=np.int64)
            for i, s in enumerate(strs):
                codes[i, :len(s)] = [ord(c) for c in s]
            acc = np.zeros(n, dtype=np.int64)
            for j in range(mx):
                upd = (acc * SAMPLE_MUL + codes[:, j]) % POLY_MOD
                acc = np.where(j < ln, upd, acc)
            yield pd.DataFrame({id_col: pdf[id_col], "__k": acc})

    return df.mapInPandas(run, f"{id_col} long, __k long")


def consume(df):
    return df.agg(F.count("__k"), F.bit_xor("__k")).collect()[0]


def main():
    spark = get_spark()
    base = spark.read.parquet(f"{SF_DIR}/embeddings.parquet") \
        .select("vec_id")
    for mult in (1, 4, 16):
        reps = [base.withColumn(
            "vec_id", F.col("vec_id") + F.lit(i * 10_000_000))
            for i in range(mult)]
        df = reps[0]
        for r in reps[1:]:
            df = df.unionByName(r)
        df = df.repartition(32).cache()
        n = df.count()
        # warm each path once at 1x only (codegen compile amortized)
        timings = {}
        for name, mk in (
                ("fold", lambda: df.select(
                    "vec_id", sample_order_key(
                        F.col("vec_id")).alias("__k"))),
                ("xxhash64", lambda: df.select(
                    "vec_id", F.xxhash64(
                        F.col("vec_id").cast("string")).alias("__k"))),
                ("numpy_arrow", lambda: numpy_skey(df, "vec_id"))):
            ts = []
            for _ in range(3):
                t0 = time.time()
                consume(mk())
                ts.append(time.time() - t0)
            timings[name] = sorted(ts)[1]
        df.unpersist()
        per_row = {k: round(v / n * 1e6, 2) for k, v in
                   timings.items()}
        print(f"mult={mult} n={n} median_s="
              f"{ {k: round(v, 3) for k, v in timings.items()} } "
              f"us_per_row={per_row}", flush=True)
    # exactness: numpy replay == fold, row for row
    df = base.limit(500)
    a = {r["vec_id"]: r["__k"] for r in df.select(
        "vec_id", sample_order_key(F.col("vec_id")).alias("__k"))
        .collect()}
    b = {r["vec_id"]: r["__k"] for r in
         numpy_skey(df, "vec_id").collect()}
    assert a == b, "numpy replay diverges from the fold"
    print("numpy replay exact on 500 ids: OK")


if __name__ == "__main__":
    main()
