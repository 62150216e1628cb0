"""RankLib model-file support (SURVEY.md §2.11).

The reference vendors RankLib and evaluates its trained models through
``letor/DataPointWrapper.java`` + ``apps/BaseQueryApp.java:85-119``
(intermediate linear rerank). Full tree ensembles (LambdaMART) are out of
scope here; this module reads the LINEAR model families RankLib saves —
Linear Regression and Coordinate Ascent — whose model body is one line of
``<featureId>:<weight>`` pairs after ``##``-prefixed header comments, e.g.::

    ## Coordinate Ascent
    ## Restart = 5
    1:0.61 2:0.25 3:0.14

and turns them into the weight dict consumed by
``operators/features.py::linear_rerank`` (feature ids are 1-based in
RankLib; a ``0:`` entry, when present in linear-regression models, is the
intercept — constant per candidate, so rank-neutral and reported
separately).
"""

from __future__ import annotations


def parse_ranklib_linear(text: str) -> tuple[dict[int, float], float]:
    """Parse RankLib linear model text → ({feature_id: weight}, intercept).

    Raises ValueError on an empty body or malformed pairs."""
    weights: dict[int, float] = {}
    intercept = 0.0
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        for pair in line.split():
            fid_s, _, w_s = pair.partition(":")
            if not _:
                raise ValueError(f"malformed RankLib weight pair: {pair!r}")
            fid, w = int(fid_s), float(w_s)
            if fid == 0:
                intercept = w
            else:
                weights[fid] = w
    if not weights:
        raise ValueError("no feature weights found (is this a tree-ensemble model?)")
    return weights, intercept


def load_ranklib_linear(path: str) -> tuple[dict[int, float], float]:
    with open(path, encoding="utf-8") as f:
        return parse_ranklib_linear(f.read())


def write_ranklib_linear(
    weights: dict[int, float] | list[float],
    path: str,
    ranker_name: str = "Coordinate Ascent",
    headers: dict[str, object] | None = None,
) -> None:
    """Save a linear model in RankLib's text format (``## <Ranker>``
    headers then one ``fid:weight`` line — the format CoorAscent.java's
    ``model()`` emits and :func:`parse_ranklib_linear` reads). Accepts a
    {feature_id: weight} dict (1-based ids) or a plain weight list
    (mapped to ids 1..m in order)."""
    if isinstance(weights, list):
        weights = {i + 1: w for i, w in enumerate(weights)}
    lines = [f"## {ranker_name}"]
    for key, val in (headers or {}).items():
        lines.append(f"## {key} = {val}")
    lines.append(" ".join(f"{fid}:{weights[fid]}" for fid in sorted(weights)))
    with open(path, "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")


def weights_for_features(model_weights: dict[int, float], feature_names: list[str]) -> dict[str, float]:
    """Map RankLib's 1-based feature ids onto named feature columns in
    config order (the reference fixes the id↔extractor order in the
    composite extractor config). Ids beyond the config length are an
    error — the model was trained on a different feature set."""
    out: dict[str, float] = {}
    for fid, w in model_weights.items():
        if fid < 1 or fid > len(feature_names):
            raise ValueError(
                f"model feature id {fid} out of range for {len(feature_names)} configured features"
            )
        out[feature_names[fid - 1]] = w
    return out


# --- LambdaMART / MART tree ensembles ---------------------------------------
#
# RankLib saves boosted regression-tree models (LambdaMART, MART, and the
# per-bag trees of Random Forests) as an XML <ensemble> after ##-comment
# headers; the reference vendors the format at
# java/lemur-code-r2792-RankLib-trunk/src/ciir/umass/edu/learning/tree/
# (Ensemble.java:45-78 parse, :113-118 eval = Σ weight_i · tree_i(x);
# Split.java:120-131 eval = descend left iff feature value <= threshold,
# leaf emits <output>). This evaluator flattens each tree into parallel
# numpy arrays and walks a whole candidate batch per step — one
# vectorized compare per tree level instead of a per-row Python descent.

import xml.etree.ElementTree as _ET

import numpy as _np


class TreeEnsemble:
    """Flattened RankLib tree ensemble: ``trees`` is a list of
    (weight, nodes) where nodes holds parallel arrays ``feat`` (1-based
    RankLib feature id, -1 for leaves), ``thr``, ``left``, ``right``,
    ``out``; node 0 is the root."""

    def __init__(self, trees):
        self.trees = trees

    @property
    def feature_ids(self) -> list[int]:
        ids = set()
        for _, nd in self.trees:
            ids.update(int(f) for f in nd["feat"] if f >= 1)
        return sorted(ids)

    def eval_matrix(self, X: "_np.ndarray") -> "_np.ndarray":
        """Score a batch: X[:, j] is the value of RankLib feature id j+1.
        Vectorized level-by-level walk (active rows only per step)."""
        n = X.shape[0]
        s = _np.zeros(n, dtype=_np.float64)
        for w, nd in self.trees:
            feat, thr = nd["feat"], nd["thr"]
            left, right, out = nd["left"], nd["right"], nd["out"]
            node = _np.zeros(n, dtype=_np.int64)
            while True:
                f = feat[node]
                active = f >= 0
                if not active.any():
                    break
                idx = _np.flatnonzero(active)
                nf = f[idx]
                fv = X[idx, nf - 1]
                go_left = fv <= thr[node[idx]]
                node[idx] = _np.where(go_left, left[node[idx]], right[node[idx]])
            s += w * out[node]
        return s


def _parse_split(el, nodes: list) -> int:
    """Recursively flatten a <split> element; returns this node's index."""
    my = len(nodes)
    nodes.append([-1, 0.0, -1, -1, 0.0])  # feat, thr, left, right, out
    out_txt = el.findtext("output")
    if out_txt is not None:
        nodes[my][4] = float(out_txt.strip())
        return my
    feat_txt = el.findtext("feature")
    thr_txt = el.findtext("threshold")
    if feat_txt is None or thr_txt is None:
        raise ValueError("malformed RankLib split: no <output> and no <feature>/<threshold>")
    nodes[my][0] = int(feat_txt.strip())
    nodes[my][1] = float(thr_txt.strip())
    kids = {c.get("pos"): c for c in el.findall("split")}
    if set(kids) != {"left", "right"}:
        raise ValueError(f"malformed RankLib split: children {sorted(kids)}")
    nodes[my][2] = _parse_split(kids["left"], nodes)
    nodes[my][3] = _parse_split(kids["right"], nodes)
    return my


def parse_ranklib_ensemble(text: str) -> TreeEnsemble:
    """Parse a RankLib LambdaMART/MART model file (##-comment headers +
    <ensemble> XML) into a :class:`TreeEnsemble`."""
    xml = "\n".join(l for l in text.splitlines() if not l.lstrip().startswith("#"))
    xml = xml.strip()
    if not xml.startswith("<ensemble>"):
        raise ValueError("not a RankLib tree-ensemble model (no <ensemble> body)")
    root = _ET.fromstring(xml)
    trees = []
    for t in root.findall("tree"):
        weight = float(t.get("weight", "1.0"))
        split = t.find("split")
        if split is None:
            raise ValueError("malformed RankLib tree: no root <split>")
        nodes: list = []
        _parse_split(split, nodes)
        arr = _np.array(nodes, dtype=_np.float64)
        nd = {
            "feat": arr[:, 0].astype(_np.int64),
            "thr": arr[:, 1],
            "left": arr[:, 2].astype(_np.int64),
            "right": arr[:, 3].astype(_np.int64),
            "out": arr[:, 4],
        }
        trees.append((weight, nd))
    if not trees:
        raise ValueError("empty RankLib ensemble")
    return TreeEnsemble(trees)


def load_ranklib_ensemble(path: str) -> TreeEnsemble:
    with open(path, encoding="utf-8") as f:
        return parse_ranklib_ensemble(f.read())


def sql_ensemble_score_expr(ensemble: TreeEnsemble, feature_exprs: list[str]) -> str:
    """Generate an ANSI-SQL expression computing this ensemble's score —
    each tree becomes a nested CASE walk (left iff value <= threshold),
    summed with its weight. ``feature_exprs[i]`` is the SQL expression
    for RankLib feature id i+1. The generated-oracle twin of
    ``eval_matrix`` (same shape as kstem's ``sql_stem_ctes``): the two
    sides derive from one parsed model, so they cannot drift."""

    def lit(v: float) -> str:
        # bare decimal literals parse as DECIMAL in DuckDB — force DOUBLE
        # so both sides do IEEE float64 arithmetic
        return f"CAST({float(v)!r} AS DOUBLE)"

    def walk(nd, i: int) -> str:
        f = int(nd["feat"][i])
        if f < 0:
            return lit(nd["out"][i])
        fe = feature_exprs[f - 1]
        thr = lit(nd["thr"][i])
        l = walk(nd, int(nd["left"][i]))
        r = walk(nd, int(nd["right"][i]))
        return f"(CASE WHEN {fe} <= {thr} THEN {l} ELSE {r} END)"

    max_fid = max(ensemble.feature_ids, default=0)
    if max_fid > len(feature_exprs):
        raise ValueError(
            f"model references feature id {max_fid} but only "
            f"{len(feature_exprs)} feature expressions were provided"
        )
    parts = [f"{lit(w)} * {walk(nd, 0)}" for w, nd in ensemble.trees]
    return " + ".join(parts)
