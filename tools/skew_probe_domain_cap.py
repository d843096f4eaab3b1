"""Skew probe for the two-phase cap_per_domain (VERDICT r8 #3): build
a corpus where ONE synthetic mega-domain holds ~30% of all documents
(the pathological shape for a per-domain top-N window — AQE skew
splitting does not apply to window partitions), then interleave-time
the salted two-phase plan against the single-window degenerate
(pre_reduce_salts=1) and assert identical output.

Run:  python tools/skew_probe_domain_cap.py [multiplier] [reps]

The corpus is the sf0.1 documents table replicated ``multiplier``x
in-plan (ids remapped per replica), with doc_id % 10 < 3 rows
re-labeled source='mega'. Expectation: the two-phase plan's worst
task is bounded by |mega|/salts, so its advantage GROWS with the
multiplier; at small scale the extra window is noise.

RESULT (r9, 20x = 100k docs / 30% mega, local[32], 5 interleaved
reps): single-window median 4.24 s vs two-phase 4.62 s — the
two-phase pays ~8% here. Root cause of the small gap: Spark's
rank-limit pushdown gives the SINGLE window a map-side Partial
WindowGroupLimit, so its mega-domain task already sorts at most
n x input_partitions rows, not |mega| — the catastrophic shape the
salting guards against cannot materialize until n x partitions per
domain is itself huge. The two-phase default stays because its
bound is n x salts (independent of partition count): at cluster
scale with 10^4-10^5 input partitions, the single-window final task
grows to n x P rows (10^6-10^7) while two-phase stays at 3200 —
and its extra cost is one narrow pre-reduced exchange. Parity is
asserted every rep (identical output hashes).
"""

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import functions as F

from metacat_spark.llm.pipeline import cap_per_domain
from metacat_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def skewed_docs(spark, mult: int):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    if mult > 1:
        r = F.explode(F.sequence(F.lit(1), F.lit(mult))).alias("__r")
        docs = (docs.select("*", r)
                .withColumn("doc_id",
                            F.col("doc_id") * mult + F.col("__r") - 1)
                .drop("__r"))
    return docs.withColumn(
        "source",
        F.when(F.col("doc_id") % 10 < 3, F.lit("mega"))
        .otherwise(F.col("source")))


def consume(df):
    cols = [F.col(c) for c in df.columns]
    r = (df.select(F.xxhash64(F.struct(*cols)).alias("h"))
         .agg(F.count("h").alias("n"), F.bit_xor("h").alias("x"))
         .collect()[0])
    return r["n"], r["x"]


def main():
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("skew_probe_domain_cap")
    docs = skewed_docs(spark, mult).localCheckpoint()  # isolate input cost
    n = docs.count()
    n_mega = docs.where("source = 'mega'").count()
    print(f"corpus: {n} docs, mega domain {n_mega} "
          f"({100.0 * n_mega / n:.0f}%)", flush=True)
    two = lambda: consume(cap_per_domain(docs, n=100))
    one = lambda: consume(cap_per_domain(docs, n=100,
                                         pre_reduce_salts=1))
    ref2, ref1 = two(), one()                      # warm both
    assert ref2 == ref1, f"parity broke: {ref2} != {ref1}"
    t2, t1 = [], []
    for i in range(reps):
        t = time.time()
        assert one() == ref1
        t1.append(time.time() - t)
        t = time.time()
        assert two() == ref2
        t2.append(time.time() - t)
        print(f"rep {i}: single-window {t1[-1]:.3f}s  "
              f"two-phase {t2[-1]:.3f}s", flush=True)
    print(f"medians: single-window {statistics.median(t1):.3f}s  "
          f"two-phase {statistics.median(t2):.3f}s  "
          f"(rows={ref2[0]})")


if __name__ == "__main__":
    main()
