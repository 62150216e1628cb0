"""Config-driven ir-datasets conversion (the reference's
``scripts/data_convert/ir_datasets/configurable_convert.py`` over
``flexneuart/ir_datasets/pipeline.py:82-220`` and its registered
processors: ``copy``, ``rename``, ``concat``, ``krovetz_stemmer``,
``spacy``, ``bert_tokenizer``, ``html_parser``).

The reference config is a list of PARTS; each part names a dataset
split, whether it is queries, the source attributes to extract, and a
pipeline of STAGES. Stage semantics (pipeline.py:126-155, mirrored
exactly):

- each stage starts from an EMPTY output dict — a field not emitted by
  some component of the stage is discarded;
- every component of a stage reads the PREVIOUS stage's fields;
- two components of one stage emitting the same field is an error;
- after the last stage, ``DOCNO`` is set from the ORIGINAL input's
  ``query_id``/``doc_id`` (even when the pipeline dropped it).

Spark restatement: a "field dict" is ``{name: Column}``; every
processor is a pure Column-expression rewrite of that dict, so an
entire part compiles to ONE ``select`` over the input DataFrame — no
per-stage materialization, no shuffle, whole-stage codegen wherever the
underlying expressions are JVM-side. The ``ir_datasets`` iterator
itself is replaced by any Spark reader producing the part's source
attributes (the sandbox ships no ir_datasets package; at 100 TB the
input is a table, not a python iterator).

Documented stand-ins (same as the rest of the engine): ``spacy`` runs
the T1 rule lemmatizer (divergence pinned in
``tests/test_lemma_divergence.py``); ``html_parser`` uses the T7 tag
stripper + a ``<title>`` regexp instead of the vendored Java
"Leo" parser, and skips the reference's HTTP-header charset sniff
(Spark string columns are already decoded).
"""

from __future__ import annotations

import json
from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flexneuart_spark.config import MAX_DOC_SIZE
from flexneuart_spark.converters import DOCID_FIELD
from flexneuart_spark.functions.kstem import krovetz_stem_col
from flexneuart_spark.functions.lemma import lemma_pair_col, load_lemma_dict
from flexneuart_spark.functions.textproc import html_to_text_col
from flexneuart_spark.functions.wordpiece import bert_tok_col, load_vocab

Fields = dict[str, Column]

PROCESSORS: dict[str, Callable[..., Fields]] = {}


def _register(name: str):
    def deco(fn):
        PROCESSORS[name] = fn
        return fn

    return deco


def _stops(args: dict) -> list[str]:
    """``stop_word_file`` (one word per line, '#' comments — the
    reference's read_stop_words) or an inline ``stop_words`` list."""
    if "stop_words" in args:
        return list(args["stop_words"])
    path = args.get("stop_word_file")
    if not path:
        return []
    with open(path, encoding="utf-8") as f:
        words = (w.strip() for w in f)
        return [w for w in words if w and not w.startswith("#")]


@_register("copy")
def _copy(cur: Fields, args: dict, ctx: dict) -> Fields:
    """copy.py: pass the listed fields through unchanged."""
    keep = set(args["input_fields"])
    return {k: v for k, v in cur.items() if k in keep}


@_register("rename")
def _rename(cur: Fields, args: dict, ctx: dict) -> Fields:
    """rename.py: emit ``rename_dict[src]`` for each present src."""
    rd = args["rename_dict"]
    return {rd[k]: v for k, v in cur.items() if k in rd}


@_register("concat")
def _concat(cur: Fields, args: dict, ctx: dict) -> Fields:
    """concat.py: space-join the listed fields in order; a missing or
    null field contributes '' (python ``' '.join`` keeps the blank)."""
    parts = [
        F.coalesce(cur[f], F.lit("")) if f in cur else F.lit("")
        for f in args["input_fields"]
    ]
    return {args["output_field"]: F.concat_ws(" ", *parts)}


@_register("krovetz_stemmer")
def _krovetz(cur: Fields, args: dict, ctx: dict) -> Fields:
    """krovetz_stem_parser.py: each listed field → ``<f>.stems``."""
    stops = _stops(args)
    fields = frozenset(args["input_fields"])
    return {f + ".stems": krovetz_stem_col(cur[f], stops) for f in cur if f in fields}


@_register("spacy")
def _spacy(cur: Fields, args: dict, ctx: dict) -> Fields:
    """spacy.py: each listed field → ``<f>.lemmas`` + ``<f>.tokens``
    (T1 rule-lemmatizer stand-in; model_name accepted and ignored)."""
    stops = _stops(args)
    dictionary = ctx["lemma_dictionary"]
    out: Fields = {}
    for f in cur:
        if f in frozenset(args["input_fields"]):
            pair = lemma_pair_col(cur[f], dictionary, stops)
            out[f + ".lemmas"] = pair["lemmas"]
            out[f + ".tokens"] = pair["tokens"]
    return out


@_register("bert_tokenizer")
def _bert(cur: Fields, args: dict, ctx: dict) -> Fields:
    """bert_tokenizer.py: each listed field → ``<f>.bert_tokens``.
    Vocab: component ``vocab_file`` arg, else the runner's
    ``bert_vocab`` (the reference hard-codes one HF tokenizer)."""
    vocab = load_vocab(args["vocab_file"]) if "vocab_file" in args else ctx.get("bert_vocab")
    if not vocab:
        raise ValueError(
            "bert_tokenizer needs a WordPiece vocab: pass vocab_file in the "
            "component args or bert_vocab= to apply_part/convert_parts"
        )
    fields = frozenset(args["input_fields"])
    return {f + ".bert_tokens": bert_tok_col(cur[f], vocab) for f in cur if f in fields}


@_register("html_parser")
def _html(cur: Fields, args: dict, ctx: dict) -> Fields:
    """html_parser.py: emits ``body`` + ``title`` — HTML content types
    get tag-stripped body text and the <title> text; ``text/plain``
    passes the (truncated) body through with an empty title; anything
    else yields two empty strings. Body is cut at ``max_doc_size`` chars
    BEFORE parsing, like the reference."""
    max_doc = int(args.get("max_doc_size", MAX_DOC_SIZE))
    body = F.substring(F.coalesce(cur["body"], F.lit("")), 1, max_doc)
    ct = cur.get("body_content_type", F.lit("text/html"))
    is_html = ct.isin("text/html", "application/xhtml+xml")
    return {
        "body": F.when(is_html, html_to_text_col(body))
        .when(ct == F.lit("text/plain"), body)
        .otherwise(F.lit("")),
        "title": F.when(
            is_html,
            F.trim(F.regexp_extract(body, r"(?is)<title[^>]*>(.*?)</title\s*>", 1)),
        ).otherwise(F.lit("")),
    }


def apply_part(
    df: DataFrame,
    part: dict,
    bert_vocab: list[str] | None = None,
    lemma_dictionary: frozenset[str] | None = None,
) -> DataFrame:
    """Run one config part over ``df`` (which must carry the part's
    ``src_attributes`` plus ``query_id``/``doc_id``). Returns the entry
    frame: the final stage's fields + ``DOCNO``."""
    is_query = bool(part["is_query"])
    id_col = "query_id" if is_query else "doc_id"
    if id_col not in df.columns:
        raise ValueError(f"input lacks {id_col!r} (part {part.get('part_name')!r})")
    ctx = {
        "bert_vocab": bert_vocab,
        "lemma_dictionary": (
            lemma_dictionary if lemma_dictionary is not None else load_lemma_dict()
        ),
    }
    # pipeline.py:97-99: src_attributes + the id attribute
    cur: Fields = {}
    for name in list(part["src_attributes"]) + [id_col]:
        if name not in df.columns:
            raise ValueError(f"source attribute {name!r} not in input {df.columns}")
        cur[name] = F.col(name)
    for si, stage in enumerate(part.get("pipeline", [])):
        out: Fields = {}
        for ci, comp in enumerate(stage):
            name = comp["name"]
            if name not in PROCESSORS:
                raise ValueError(f"unknown processor {name!r} (known: {sorted(PROCESSORS)})")
            for k, v in PROCESSORS[name](cur, comp.get("args", {}), ctx).items():
                if k in out:
                    raise ValueError(
                        f"Repeating field {k} stage {si + 1} component {ci + 1}"
                    )
                out[k] = v
        cur = out
    # pipeline.py:157-160: DOCNO always comes from the ORIGINAL input
    cur[DOCID_FIELD] = F.col(id_col)
    return df.select([v.alias(k) for k, v in cur.items()])


def convert_parts(
    spark,
    config: list[dict] | str,
    inputs: dict[str, DataFrame | str],
    output_root: str,
    bert_vocab: list[str] | None = None,
) -> dict[str, str]:
    """configurable_convert.py's outer loop: run every config part and
    write each under ``output_root/<part_name>`` (parquet stands in for
    the reference's per-part JSONL/gz files). ``config`` may be a parsed
    list or a JSON file path; ``inputs`` maps part_name (or the part's
    dataset_name) to a DataFrame or a parquet path — the sandbox has no
    ``ir_datasets`` package, so the iterator is any Spark reader.
    Returns {part_name: output_dir}."""
    if isinstance(config, str):
        with open(config, encoding="utf-8") as f:
            config = json.load(f)
    dictionary = load_lemma_dict()
    written: dict[str, str] = {}
    for part in config:
        pname = part["part_name"]
        src = inputs.get(pname, inputs.get(part.get("dataset_name", "")))
        if src is None:
            raise ValueError(f"no input provided for part {pname!r}")
        df = spark.read.parquet(src) if isinstance(src, str) else src
        out_dir = f"{output_root.rstrip('/')}/{pname}"
        apply_part(
            df, part, bert_vocab=bert_vocab, lemma_dictionary=dictionary
        ).write.mode("overwrite").parquet(out_dir)
        written[pname] = out_dir
    return written
