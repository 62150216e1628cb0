"""Experiment-descriptor generators (the reference's
``flexneuart/gen_exper_desc`` + ``scripts/gen_exper_desc/*.py``).

The reference tunes retrieval/rerank knobs by generating a DIRECTORY of
experiment descriptors — one per grid point — each pointing at an
extractor JSON, then running them all through
``scripts/exper/run_experiments.sh``. This module reproduces the three
shipped generators with their exact grids and file layout; the emitted
descriptors run directly through :func:`flexneuart_spark.exper.run_experiment`
(which resolves the same keys the reference harness reads):

- :func:`gen_bm25_tune` — ``gen_bm25_tune_json_desc.py:53-84``:
  b = 0.3+0.1·i (8 values) × k1 = 0.4+0.2·j (7 values), test-only with
  the one-feature model;
- :func:`gen_model1_tune` — ``gen_model1_exper_json_desc.py:39-112``:
  the (probSelfTran, lambda) grid + the low-lambda and minTranProb
  extensions, trainable (Model1 + BM25 fusion);
- :func:`gen_rm3_tune` — ``gen_rm3_exper_json_desc.py:57-89``:
  origWeight ∈ {0.3..0.9} × topDocQty/topTermQty ∈
  {1..10,12,16,24}, test-only with the one-feature model.

Layout (``gen_exper_desc/utils.py:85-130`` ``gen_rerank_descriptors``):
``<out_dir>/<prefix>.json`` — the top-level list of descriptor dicts
(``experSubdir``/``extrTypeFinal``/``testOnly`` + optional ``candProv*``
and ``modelFinal``); ``<out_dir>/<prefix>/<fid>.json`` — one extractor
list per grid point; ``<out_dir>/models/one_feat.model`` — the
single-feature RankLib model test-only descriptors score with
(``scripts/exper/sample_exper_desc/one_feat.model``).
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterable, Iterator

# key names shared with the reference harness (gen_exper_desc/utils.py:23-33)
EXTR_TYPE_FINAL_PARAM = "extrTypeFinal"
EXPER_SUBDIR_PARAM = "experSubdir"
TEST_ONLY_PARAM = "testOnly"
MODEL_FINAL_PARAM = "modelFinal"
CAND_PROV_TYPE_PARAM = "candProv"
CAND_PROV_ADD_CONF_PARAM = "candProvAddConf"
CAND_PROV_URI_PARAM = "candProvURI"
CAND_PROV_QTY_PARAM = "candProvQty"
FEAT_EXPER_SUBDIR = "feat_exper"

MODEL_DST_REL_PATH = "models"
MODEL_DST_NAME = "one_feat.model"

# scripts/exper/sample_exper_desc/one_feat.model — a linear RankLib model
# with a single unit weight (used by every test-only tuning descriptor)
ONE_FEAT_MODEL = """\
## Coordinate Ascent
## Restart = 10
## MaxIteration = 25
## StepBase = 0.05
## StepScale = 2.0
## Tolerance = 0.001
## Regularized = false
## Slack = 0.001
1:1.0
"""


def _fmt(x) -> str:
    """Java's '%g'-style compact float (the reference formats grid values
    with '%g')."""
    return "%g" % x


def gen_rerank_descriptors(
    out_dir: str,
    rel_desc_path: str,
    extr_gen: Iterable[tuple[str, list, bool, str | None]],
    json_desc_name: str,
    json_sub_dir: str,
    *,
    exper_subdir: str = FEAT_EXPER_SUBDIR,
    cand_prov_uri: str | None = None,
    cand_prov_qty: int | None = None,
    cand_prov_add_conf: str | None = None,
) -> str:
    """``gen_exper_desc/utils.py:85-130`` — write one extractor JSON per
    (fid, extr_list, test_only, model_final) tuple plus the top-level
    descriptor list; returns the top-level file path."""
    sub = os.path.join(out_dir, json_sub_dir)
    os.makedirs(sub, exist_ok=True)
    desc_data = []
    for fid, extr_list, test_only, model_final in extr_gen:
        fname = fid + ".json"
        desc = {
            EXPER_SUBDIR_PARAM: os.path.join(exper_subdir, json_sub_dir, fid),
            EXTR_TYPE_FINAL_PARAM: os.path.join(rel_desc_path, json_sub_dir, fname),
            TEST_ONLY_PARAM: int(test_only),
        }
        if cand_prov_uri is not None:
            desc[CAND_PROV_URI_PARAM] = cand_prov_uri
        if cand_prov_qty is not None:
            desc[CAND_PROV_QTY_PARAM] = cand_prov_qty
        if cand_prov_add_conf is not None:
            desc[CAND_PROV_ADD_CONF_PARAM] = cand_prov_add_conf
        if model_final is not None:
            desc[MODEL_FINAL_PARAM] = model_final
        desc_data.append(desc)
        with open(os.path.join(sub, fname), "w", encoding="utf-8") as f:
            json.dump(extr_list, f, indent=2)
    top = os.path.join(out_dir, json_desc_name)
    with open(top, "w", encoding="utf-8") as f:
        json.dump(desc_data, f, indent=2)
    return top


def _write_one_feat_model(out_dir: str, rel_desc_path: str) -> str:
    model_dir = os.path.join(out_dir, MODEL_DST_REL_PATH)
    os.makedirs(model_dir, exist_ok=True)
    with open(os.path.join(model_dir, MODEL_DST_NAME), "w", encoding="utf-8") as f:
        f.write(ONE_FEAT_MODEL)
    return os.path.join(rel_desc_path, MODEL_DST_REL_PATH, MODEL_DST_NAME)


def _bm25_grid(index_field: str, query_field: str, model_rel: str) -> Iterator:
    """gen_bm25_tune_json_desc.py:53-84 — 8×7 (b, k1) grid, test-only."""
    for bi in range(8):
        for k1i in range(7):
            b = 0.3 + 0.1 * bi
            k1 = 0.4 + 0.2 * k1i
            fid = f"bm25tune_k1={_fmt(k1)}_b={_fmt(b)}"
            extr = [
                {
                    "type": "TFIDFSimilarity",
                    "params": {
                        "queryFieldName": query_field,
                        "indexFieldName": index_field,
                        "similType": "bm25",
                        "k1": _fmt(k1),
                        "b": _fmt(b),
                    },
                }
            ]
            yield fid, extr, True, model_rel


def gen_bm25_tune(
    out_dir: str, rel_desc_path: str, index_field: str = "text", query_field: str | None = None, **kw
) -> str:
    query_field = query_field or index_field
    model_rel = _write_one_feat_model(out_dir, rel_desc_path)
    prefix = f"bm25tune_{query_field}_{index_field}"
    return gen_rerank_descriptors(
        out_dir, rel_desc_path, _bm25_grid(index_field, query_field, model_rel),
        f"{prefix}.json", prefix, **kw
    )


def _model1_grid(k1: float, b: float, index_field: str, query_field: str, text_field: str) -> Iterator:
    """gen_model1_exper_json_desc.py:39-112 — the (probSelfTran, lambda)
    grid plus its hand-added extensions; trainable Model1+BM25 fusion."""
    param_arr = [
        (pst, lamb)
        for pst in [0.05, 0.1, 0.15, 0.25, 0.3, 0.35, 0.45, 0.5, 0.55, 0.6, 0.7, 0.75]
        for lamb in [0.05, 0.1, 0.15, 0.25, 0.3, 0.35, 0.45, 0.5]
    ]
    param_arr += [(0.6, 0.05), (0.7, 0.05), (0.8, 0.05), (0.9, 0.05)]
    param_arr += [(0.9, 0.01), (0.9, 0.001), (0.9, 0.0001)]
    for pst, lamb in param_arr:
        fid = f"bm25={text_field}+model1={index_field}+lambda={_fmt(lamb)}+probSelfTran={_fmt(pst)}"
        extr = [
            {
                "type": "Model1Similarity",
                "params": {
                    "queryFieldName": query_field,
                    "indexFieldName": index_field,
                    "gizaIterQty": "5",
                    "probSelfTran": pst,
                    "lambda": lamb,
                    "minModel1Prob": "2.5e-3f",
                },
            },
            {
                "type": "TFIDFSimilarity",
                "params": {"indexFieldName": text_field, "similType": "bm25", "k1": k1, "b": b},
            },
        ]
        yield fid, extr, False, None
    for pst, lamb, min_prob in [
        (0.9, 0.00001, 1e-3),
        (0.9, 0.00001, 1e-4),
        (0.9, 0.00001, 5e-4),
        (0.9, 0.00001, 2.5e-4),
    ]:
        fid = (
            f"bm25={text_field}+model1={index_field}"
            f"+lambda={_fmt(lamb)}+probSelfTran={_fmt(pst)}+minTranProb={_fmt(min_prob)}"
        )
        extr = [
            {
                "type": "Model1Similarity",
                "params": {
                    "queryFieldName": query_field,
                    "indexFieldName": index_field,
                    "gizaIterQty": "5",
                    "probSelfTran": str(pst) + "f",
                    "lambda": lamb,
                    "minModel1Prob": min_prob,
                },
            },
            {
                "type": "TFIDFSimilarity",
                "params": {"indexFieldName": index_field, "similType": "bm25", "k1": k1, "b": b},
            },
        ]
        yield fid, extr, False, None


def gen_model1_tune(
    out_dir: str,
    rel_desc_path: str,
    *,
    k1: float,
    b: float,
    index_field: str = "text_unlemm",
    query_field: str | None = None,
    text_field: str = "text",
    **kw,
) -> str:
    query_field = query_field or index_field
    prefix = f"model1tune_{query_field}_{index_field}"
    return gen_rerank_descriptors(
        out_dir, rel_desc_path,
        _model1_grid(k1, b, index_field, query_field, text_field),
        f"{prefix}.json", prefix, **kw
    )


def _rm3_grid(k1: float, b: float, index_field: str, query_field: str, model_rel: str) -> Iterator:
    """gen_rm3_exper_json_desc.py:57-89 — origWeight × topDocQty ×
    topTermQty grid, test-only."""
    qtys = [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 12, 16, 24]
    for orig_weight in [0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]:
        for top_doc_qty in qtys:
            for top_term_qty in qtys:
                fid = (
                    f"rm3={index_field}+{query_field}_origWeight={orig_weight}"
                    f"_topDocQty={top_doc_qty}_topTermQty={top_term_qty}"
                    f"_k1={_fmt(k1)}_{_fmt(b)}"
                )
                extr = [
                    {
                        "type": "RM3Similarity",
                        "params": {
                            "queryFieldName": query_field,
                            "indexFieldName": index_field,
                            "k1": _fmt(k1),
                            "b": _fmt(b),
                            "origWeight": orig_weight,
                            "topDocQty": top_doc_qty,
                            "topTermQty": top_term_qty,
                        },
                    }
                ]
                yield fid, extr, True, model_rel


def gen_rm3_tune(
    out_dir: str,
    rel_desc_path: str,
    *,
    k1: float,
    b: float,
    index_field: str = "text",
    query_field: str | None = None,
    **kw,
) -> str:
    query_field = query_field or index_field
    model_rel = _write_one_feat_model(out_dir, rel_desc_path)
    prefix = f"rm3tune_{query_field}_{index_field}"
    return gen_rerank_descriptors(
        out_dir, rel_desc_path, _rm3_grid(k1, b, index_field, query_field, model_rel),
        f"{prefix}.json", prefix, **kw
    )
