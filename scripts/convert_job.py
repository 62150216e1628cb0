#!/usr/bin/env python
"""spark-submit entrypoint: named-dataset conversion → parquet entries
(the Spark-native replacement for the reference's per-collection
``scripts/data_convert/*`` multiprocessing scripts).

    spark-submit --py-files dist/flexneuart_spark.zip \\
        scripts/convert_job.py --format msmarco_docs \\
        --input <raw tsv/.gz> --output <parquet-dir> \\
        [--stopwords stop.txt] [--bert-vocab vocab.txt] \\
        [--min-query-tokens 1] [--max-doc-size 32768]

Formats: msmarco_docs (4-field TSV), msmarco_queries (2-field TSV),
msmarco_v2_docs (JSONL shards), msmarco_v2_passages (JSONL shards →
pass_entries + doc2pass outputs), irds_config (reference-shaped
pipeline JSON over per-part parquet inputs),
tsv_queries_krovetz (2-field TSV, Krovetz stem), cranfield
(``.I``-record file), yahoo_answers (series-of-XML container →
question/answer/qrel/bitext outputs), dpr_passages (3-field TSV),
dpr_queries (DPR JSON array → query/qrel/bitext outputs). Raw inputs
may be .gz/.bz2 and multi-file globs — Spark's text reader
decompresses and fans out natively.
"""

from __future__ import annotations

import argparse
import sys

FORMATS = [
    "msmarco_docs",
    "msmarco_queries",
    "msmarco_v2_docs",
    "msmarco_v2_passages",
    "tsv_queries_krovetz",
    "cranfield",
    "yahoo_answers",
    "dpr_passages",
    "dpr_queries",
    "irds_config",
]


def _read_words(path: str | None) -> list[str]:
    if not path:
        return []
    with open(path, encoding="utf-8") as f:
        words = (w.strip() for w in f)
        return [w.lower() for w in words if w and not w.startswith("#")]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--format", choices=FORMATS, required=True)
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--stopwords", default=None, help="one lowercase stop word per line")
    ap.add_argument("--bert-vocab", default=None, help="WordPiece vocab file; adds text_bert_tok")
    ap.add_argument("--min-query-tokens", type=int, default=0)
    ap.add_argument("--max-doc-size", type=int, default=None)
    ap.add_argument("--part-type", default="dev", help="dpr_queries: query-id prefix")
    ap.add_argument("--passage-ids", default=None, help="dpr_passages: id-subset file, one per line")
    ap.add_argument(
        "--use-precomputed-negatives", action="store_true",
        help="dpr_queries: also emit grade-0 qrels from negative_ctxs",
    )
    ap.add_argument("--config", default=None, help="irds_config: pipeline JSON (reference shape)")
    ap.add_argument(
        "--part-input", default=[], nargs="*", metavar="PART=PARQUET",
        help="irds_config: per-part input parquet paths",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from flexneuart_spark import converters as C
    from flexneuart_spark.config import MAX_DOC_SIZE

    spark = SparkSession.builder.appName(f"flexneuart_convert_{args.format}").getOrCreate()
    stops = _read_words(args.stopwords)
    bert_vocab = None
    if args.bert_vocab:
        from flexneuart_spark.functions.wordpiece import load_vocab

        bert_vocab = load_vocab(args.bert_vocab)

    if args.format == "dpr_queries":
        parsed = C.read_dpr_queries(spark, args.input)
        for sub, df in (
            ("query_entries", C.dpr_queries(parsed, args.part_type, stop_words=stops,
                                            min_query_tok_qty=args.min_query_tokens,
                                            bert_vocab=bert_vocab)),
            ("qrels", C.dpr_qrels(parsed, args.part_type, stop_words=stops,
                                  min_query_tok_qty=args.min_query_tokens,
                                  use_precomputed_negatives=args.use_precomputed_negatives)),
            ("bitext", C.dpr_bitext(parsed, args.part_type, stop_words=stops,
                                    min_query_tok_qty=args.min_query_tokens)),
        ):
            df.write.mode("overwrite").parquet(f"{args.output}/{sub}")
            n = spark.read.parquet(f"{args.output}/{sub}").count()
            print(f"converted {n} dpr_queries {sub} rows to {args.output}/{sub}")
        spark.stop()
        return

    if args.format == "yahoo_answers":
        # four outputs under --output, mirroring the reference worker's
        # question/answer/qrel/bitext files (convert_yahoo_answers.py)
        parsed = C.read_yahoo_answers(spark, args.input)
        n_bad = parsed.where(parsed.parse_error.isNotNull()).count()
        for sub, df in (
            ("question_entries", C.yahoo_answers_questions(parsed, stop_words=stops, bert_vocab=bert_vocab)),
            ("answer_entries", C.yahoo_answers_answers(parsed, stop_words=stops, bert_vocab=bert_vocab)),
            ("qrels", C.yahoo_answers_qrels(parsed)),
            ("bitext", C.yahoo_answers_bitext(parsed, stop_words=stops)),
        ):
            df.write.mode("overwrite").parquet(f"{args.output}/{sub}")
            n = spark.read.parquet(f"{args.output}/{sub}").count()
            print(f"converted {n} yahoo_answers {sub} rows to {args.output}/{sub}")
        if n_bad:
            print(f"WARNING: {n_bad} records failed to parse and were skipped")
        spark.stop()
        return

    if args.format == "irds_config":
        # configurable_convert.py shape: --config names the parts; each
        # part's source rows come from --part-input PART=PARQUET
        from flexneuart_spark.irds import convert_parts

        if not args.config:
            ap.error("--format irds_config requires --config")
        inputs = dict(kv.split("=", 1) for kv in args.part_input)
        written = convert_parts(
            spark, args.config, inputs, args.output, bert_vocab=bert_vocab
        )
        for pname, out_dir in written.items():
            n = spark.read.parquet(out_dir).count()
            print(f"converted {n} irds {pname} rows to {out_dir}")
        spark.stop()
        return

    if args.format == "msmarco_v2_passages":
        # two outputs, mirroring convert_pass.py's --output_main and
        # --output_doc2pass files
        entries = C.msmarco_v2_passages(
            spark.read.text(args.input),
            stop_words=stops,
            max_pass_size=args.max_doc_size or C.MAX_PASS_SIZE,
            bert_vocab=bert_vocab,
        )
        entries.write.mode("overwrite").parquet(f"{args.output}/pass_entries")
        entries = spark.read.parquet(f"{args.output}/pass_entries")
        print(f"converted {entries.count()} msmarco_v2 passage rows to {args.output}/pass_entries")
        C.msmarco_v2_doc2pass(entries).write.mode("overwrite").parquet(f"{args.output}/doc2pass")
        n = spark.read.parquet(f"{args.output}/doc2pass").count()
        print(f"converted {n} msmarco_v2 doc2pass rows to {args.output}/doc2pass")
        spark.stop()
        return

    if args.format == "cranfield":
        out = C.cranfield_docs(
            C.read_cranfield(spark, args.input), stop_words=stops, bert_vocab=bert_vocab
        )
    else:
        lines = spark.read.text(args.input)
        if args.format == "dpr_passages":
            pass_ids = None
            if args.passage_ids:
                with open(args.passage_ids, encoding="utf-8") as f:
                    pass_ids = [line.strip() for line in f if line.strip()]
            out = C.dpr_passages(
                lines, stop_words=stops, passage_ids=pass_ids, bert_vocab=bert_vocab
            )
        elif args.format == "msmarco_docs":
            out = C.msmarco_docs(
                lines,
                stop_words=stops,
                max_doc_size=args.max_doc_size or MAX_DOC_SIZE,
                bert_vocab=bert_vocab,
            )
        elif args.format == "msmarco_v2_docs":
            out = C.msmarco_v2_docs(
                lines,
                stop_words=stops,
                max_doc_size=args.max_doc_size or MAX_DOC_SIZE,
                bert_vocab=bert_vocab,
            )
        elif args.format == "msmarco_queries":
            out = C.msmarco_queries(
                lines,
                stop_words=stops,
                min_query_tok_qty=args.min_query_tokens,
                bert_vocab=bert_vocab,
            )
        else:
            out = C.tsv_queries_krovetz(lines, stop_words=stops, bert_vocab=bert_vocab)

    out.write.mode("overwrite").parquet(args.output)
    n = spark.read.parquet(args.output).count()
    print(f"converted {n} {args.format} entries to {args.output}")
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
