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
