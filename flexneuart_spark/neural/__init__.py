"""Neural re-ranking family (clean-room, Spark-first).

The reference's neural stack (``flexneuart/models/`` — vanilla BERT,
CEDR, ColBERT, bi-encoders; ``flexneuart/ranker/neural.py``) depends on
externally-trained transformer weights and a GPU, neither of which this
engine assumes. What IS reproducible from public knowledge is the part
that actually ranks: the *matching heads* those models put on top of
contextual term vectors. This package implements exactly those heads
over deterministic (md5-hash) or corpus-trained (PPMI + randomized SVD)
term embeddings, numpy-batched through Arrow, with the reference's model
registry / serializer / ranker API shapes:

- ``embeddings``      — term-vector providers (hash + trained)
- ``knrm``            — KNRM RBF kernel pooling (CEDR's classic head,
                        ``flexneuart/models/cedr/cedr_knrm.py:28-49``)
- ``drmm``            — DRMM matching-histogram pooling (CEDR's other
                        classic head, ``models/cedr/cedr_drmm.py:29-48``,
                        ``models/cedr/utils.py:70-97``)
- ``late_interaction``— ColBERT MaxSim (``models/colbert/colbert.py:124``,
                        ``models/base_bert_late_interaction.py``)
- ``biencoder``       — mean-pooled dual encoder
                        (``models/biencoder/sbert.py``)
- ``ranker``          — ``NeuralRanker`` rerank wrapper with
                        ``cand_score_weight`` mixing
                        (``flexneuart/ranker/neural.py:52,107``)

Registry shape mirrors ``flexneuart/models/__init__.py:1-8``
(``Registry`` + ``register`` decorator); serialization mirrors the
key layout of ``flexneuart/models/base.py:26-30`` (``MODEL_NAME`` /
``MODEL_ARGS`` / ``model_weights`` / ``max_query_len`` /
``max_doc_len``) as plain JSON — no torch in this engine.
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable

MODEL_NAME = "model_name"
MODEL_ARGS = "model_args"
MODEL_WEIGHTS = "model_weights"
MAX_QUERY_LEN = "max_query_len"
MAX_DOC_LEN = "max_doc_len"

# Reference defaults: flexneuart/config.py:44-45 analogues (characters).
DEFAULT_MAX_QUERY_LEN = 64
DEFAULT_MAX_DOC_LEN = 8192


model_registry: dict[str, Callable[..., Any]] = {}


def register(name: str):
    """Decorator mirroring ``flexneuart/models/__init__.py`` usage:
    ``@register('knrm')`` adds the model class under that name."""

    def deco(cls):
        model_registry[name] = cls
        cls.model_name = name
        return cls

    return deco


def save_model(model, path: str) -> None:
    """Serialize a model (registry name + ctor args + weights) to JSON.

    Layout mirrors ``ModelSerializer.save_all`` observable content
    (``flexneuart/models/base.py:26-30`` key names); weights are plain
    nested lists (every model here is numpy-backed and small).
    """
    holder = {
        MODEL_NAME: model.model_name,
        MODEL_ARGS: model.model_args(),
        MODEL_WEIGHTS: model.weights(),
        MAX_QUERY_LEN: getattr(model, "max_query_len", DEFAULT_MAX_QUERY_LEN),
        MAX_DOC_LEN: getattr(model, "max_doc_len", DEFAULT_MAX_DOC_LEN),
    }
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(holder, f)
    os.replace(tmp, path)


def load_model(path: str):
    """Counterpart of ``ModelSerializer.load_all``: instantiate the
    registered class from MODEL_ARGS and restore weights."""
    with open(path) as f:
        holder = json.load(f)
    name = holder[MODEL_NAME]
    if name not in model_registry:
        raise ValueError(f"unknown model {name!r} (known: {sorted(model_registry)})")
    model = model_registry[name](**holder[MODEL_ARGS])
    model.set_weights(holder[MODEL_WEIGHTS])
    model.max_query_len = holder.get(MAX_QUERY_LEN, DEFAULT_MAX_QUERY_LEN)
    model.max_doc_len = holder.get(MAX_DOC_LEN, DEFAULT_MAX_DOC_LEN)
    return model


from flexneuart_spark.neural import biencoder, drmm, knrm, late_interaction  # noqa: E402,F401
