#!/usr/bin/env python
"""spark-submit entrypoint: batch BM25 top-k retrieval → TREC run.

    spark-submit --py-files dist/flexneuart_spark.zip \\
        scripts/query_job.py --index <index-dir> \\
        --queries <jsonl-or-parquet with query_id,text> \\
        --output <run-dir> --k 100 [--run-id my_run]
"""

from __future__ import annotations

import argparse
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--queries", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--run-id", default="flexneuart_spark")
    ap.add_argument("--tokenizer", choices=["code", "whitespace", "krovetz"], default="code")
    ap.add_argument("--kernel", choices=["maxscore", "bmw", "exhaustive"], default="maxscore",
                    help="top-k scoring kernel (result-identical; maxscore is fastest in numpy)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from flexneuart_spark.io.trec import write_run
    from flexneuart_spark.search.engine import Searcher

    spark = SparkSession.builder.appName("flexneuart_query").getOrCreate()
    if args.queries.endswith(".jsonl") or args.queries.endswith(".json"):
        qdf = spark.read.json(args.queries)
    else:
        qdf = spark.read.parquet(args.queries)
    queries = [(r.query_id, r.text) for r in qdf.select("query_id", "text").collect()]
    s = Searcher(spark, args.index, tokenizer=args.tokenizer)
    run = s.search(queries, k=args.k, kernel=args.kernel)
    write_run(run, args.output, run_id=args.run_id)
    print(f"wrote run for {len(queries)} queries to {args.output}")
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
