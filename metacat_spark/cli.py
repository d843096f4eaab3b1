"""Command-line interface — parity with the reference's `metacat`
CLI query surface (metacat/ui/metacat_query.py:44-169).

    python -m metacat_spark.cli query  "files from dune:urgent_0 ..." \
        [--sf-dir DIR] [-m/--with-metadata] [-s/--summary count|keys] \
        [-N/--namespace NS] [-j/--json] [-x/--explain] [-l/--limit N]

`-x/--explain` prints the MQL AST and the Spark physical plan instead
of running (the reference prints its IRs, metacat_query.py:64-84).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv=None):
    p = argparse.ArgumentParser(prog="metacat_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    q = sub.add_parser("query", help="run an MQL query")
    q.add_argument("mql")
    q.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    q.add_argument("-m", "--with-metadata", action="store_true")
    q.add_argument("-p", "--with-provenance", action="store_true")
    q.add_argument("-s", "--summary", choices=["count", "keys",
                                               "key-values"])
    q.add_argument("-N", "--namespace", default=None)
    q.add_argument("-i", "--include-retired", action="store_true")
    q.add_argument("-j", "--json", action="store_true",
                   help="json-seq output (one object per line)")
    q.add_argument("-x", "--explain", action="store_true")
    q.add_argument("-l", "--limit", type=int, default=None,
                   help="client-side cap on printed rows")

    args = p.parse_args(argv)

    from .catalog import from_tpch
    from .engine import Engine
    from .session import get_spark

    spark = get_spark("metacat_spark_cli")
    engine = Engine(from_tpch(spark, args.sf_dir))

    if args.explain:
        print(engine.explain(args.mql,
                             default_namespace=args.namespace))
        return 0

    df = engine.query(args.mql, with_meta=args.with_metadata,
                      with_provenance=args.with_provenance,
                      summary=args.summary,
                      include_retired=args.include_retired,
                      default_namespace=args.namespace)
    it = df.toLocalIterator()
    count = 0
    for row in it:
        d = row.asDict(recursive=True)
        if isinstance(d.get("metadata"), str):
            try:
                d["metadata"] = json.loads(d["metadata"])
            except ValueError:
                pass
        if args.json:
            print(json.dumps(d, default=str))
        else:
            print("\t".join(str(v) for v in d.values()))
        count += 1
        if args.limit is not None and count >= args.limit:
            break
    print(f"# {count} rows", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
