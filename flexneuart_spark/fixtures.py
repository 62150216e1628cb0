"""Deterministic synthetic code corpus + query set (FIXTURES.md §1-2).

Schema per BASELINE.json ``input_hint``:
``(repo:string, path:string, commit:string, lang:string, content:string)``.

Seeded numpy; no wall-clock, no external data. Zipfian head tokens
(``def``, ``return``, ``{`` …) create the term skew the index builder's
sharding/salting must handle.

Primary retrieval key: ``doc_id = repo || ':' || path || '@' || commit``
(DOCNO analogue — reference ``flexneuart/config.py:66``).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

LANGS = ["python", "java", "c", "go", "js"]
LANG_EXT = {"python": "py", "java": "java", "c": "c", "go": "go", "js": "js"}
LANG_W = [0.35, 0.25, 0.15, 0.15, 0.10]

_HEAD_TOKENS = [
    "def", "return", "class", "{", "}", "(", ")", "=", "==", "if",
    "else", "for", "while", "import", "from", "self", "int", "void",
    "public", "static", "func", "var", "let", "const", "new", "null",
    "true", "false", "try", "catch", "//", "#", "->", ";", ":",
]


def vocabulary(n_ids: int = 5000) -> list[str]:
    return _HEAD_TOKENS + [f"v{i}" for i in range(n_ids)]


def make_corpus(n_docs: int = 2000, seed: int = 42, n_ids: int = 5000) -> pd.DataFrame:
    """Deterministic corpus; ~1 empty doc per 97 (edge case, cf.
    LuceneIndexer.java:206-214 — empty docs are kept)."""
    rng = np.random.default_rng(seed)
    vocab = np.array(vocabulary(n_ids), dtype=object)
    # Zipf over the vocabulary: p(rank r) ∝ 1/(r+1)
    ranks = np.arange(len(vocab), dtype=np.float64)
    p = 1.0 / (ranks + 1.0)
    p /= p.sum()

    repos = np.array([f"org{i // 50}/repo{i % 50}" for i in range(n_docs)], dtype=object)
    langs = rng.choice(len(LANGS), size=n_docs, p=LANG_W)
    lens = np.clip(np.rint(rng.lognormal(mean=4.0, sigma=1.0, size=n_docs)), 1, 2000).astype(int)
    empty = (np.arange(n_docs) % 97) == 96
    lens[empty] = 0

    rows = []
    for i in range(n_docs):
        lang = LANGS[langs[i]]
        path = f"src/d{i % 13}/f{i}.{LANG_EXT[lang]}"
        repo = repos[i]
        commit = hashlib.sha256(f"commit:{repo}:{path}".encode()).hexdigest()[:40]
        toks = rng.choice(vocab, size=lens[i], p=p) if lens[i] else np.array([], dtype=object)
        # arrange into lines of ~12 tokens (source-code-like)
        parts = [" ".join(toks[j : j + 12]) for j in range(0, len(toks), 12)]
        rows.append((repo, path, commit, lang, "\n".join(parts)))
    return pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])


def make_corpus_skewed(
    n_docs: int = 2000,
    seed: int = 7,
    n_ids: int = 2000,
    boilerplate_frac: float = 0.30,
    boiler_tokens: int = 60,
) -> pd.DataFrame:
    """Stress corpus for the skew guards: Zipf head tokens PLUS a
    boilerplate-dominated head — ``boilerplate_frac`` of the docs open
    with the SAME ~``boiler_tokens``-token license-header block (a
    handful get one token perturbed), followed by a short unique tail.
    That one block floods every bucket key the dedup candidate
    generators group on (shared shingles, MinHash bands, SimHash
    blocks), so the ``max_shingle_df`` / ``max_bucket_size`` caps must
    fire; the index builder additionally sees a term-frequency head far
    above the Zipf tail. Same schema / doc-id scheme as
    :func:`make_corpus`; deterministic."""
    rng = np.random.default_rng(seed)
    vocab = np.array(vocabulary(n_ids), dtype=object)
    ranks = np.arange(len(vocab), dtype=np.float64)
    p = 1.0 / (ranks + 1.0)
    p /= p.sum()

    boiler = list(rng.choice(vocab, size=boiler_tokens, p=p))
    n_boiler = int(n_docs * boilerplate_frac)
    langs = rng.choice(len(LANGS), size=n_docs, p=LANG_W)
    rows = []
    for i in range(n_docs):
        lang = LANGS[langs[i]]
        repo = f"org{(i // 50) % 100}/repo{i % 50}"
        path = f"src/d{i % 13}/f{i}.{LANG_EXT[lang]}"
        commit = hashlib.sha256(f"commit:{repo}:{path}".encode()).hexdigest()[:40]
        if i < n_boiler:
            block = list(boiler)
            if i % 17 == 0:  # sprinkle near-identical variants
                block[int(rng.integers(0, boiler_tokens))] = f"v{int(rng.integers(0, n_ids))}"
            tail = list(rng.choice(vocab, size=int(rng.integers(3, 9)), p=p))
            toks = block + tail
        else:
            toks = list(rng.choice(vocab, size=int(rng.integers(20, 120)), p=p))
        parts = [" ".join(toks[j : j + 12]) for j in range(0, len(toks), 12)]
        rows.append((repo, path, commit, lang, "\n".join(parts)))
    return pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])


def make_queries(n_queries: int = 40, seed: int = 43, n_ids: int = 5000) -> pd.DataFrame:
    """Query set mirroring QuestionFields.jsonl (flexneuart/io/queries.py:13-19):
    1-8 tokens, mix of head/tail terms, ~10% OOV tokens, one empty query
    (cf. LuceneCandidateProvider.java:125-126)."""
    rng = np.random.default_rng(seed)
    vocab = np.array(vocabulary(n_ids), dtype=object)
    ranks = np.arange(len(vocab), dtype=np.float64)
    p = 1.0 / (ranks + 1.0)
    p /= p.sum()
    rows = []
    for i in range(n_queries):
        if i == n_queries - 1:
            rows.append((f"q{i}", ""))
            continue
        qlen = int(rng.integers(1, 9))
        toks = list(rng.choice(vocab, size=qlen, p=p))
        if rng.random() < 0.10:
            toks.append(f"oov{i}")
        rows.append((f"q{i}", " ".join(toks)))
    return pd.DataFrame(rows, columns=["query_id", "text"])


def make_corpus_scaled(
    n_docs: int = 80_000,
    seed: int = 42,
    n_ids: int = 30_000,
    mean_log: float = 6.1,
    sigma: float = 0.85,
    max_len: int = 8_000,
    id_offset: int = 0,
) -> pd.DataFrame:
    """Benchmark corpus with REALISTIC source-file sizes (median ~450
    tokens ≈ a few hundred lines; ``make_corpus``'s lognormal(4,1) median
    of ~55 tokens is right for unit tests but makes per-document fixed
    costs dominate a throughput benchmark). Fully vectorized generation —
    one global token draw + per-doc splits — so corpus synthesis doesn't
    dwarf the measured build at bench scale. Deterministic (seeded numpy,
    no wall clock); same schema/doc-id scheme as :func:`make_corpus`."""
    rng = np.random.default_rng(seed)
    vocab = np.array(vocabulary(n_ids), dtype=object)
    ranks = np.arange(len(vocab), dtype=np.float64)
    p = 1.0 / (ranks + 1.0)
    p /= p.sum()

    lens = np.clip(np.rint(rng.lognormal(mean=mean_log, sigma=sigma, size=n_docs)), 1, max_len).astype(int)
    lens[(np.arange(n_docs) % 97) == 96] = 0  # keep the empty-doc edge case
    total = int(lens.sum())
    # one draw for the whole corpus (alias/cumsearch once), then split
    all_toks = rng.choice(vocab, size=total, p=p)
    bounds = np.cumsum(lens)[:-1]
    docs_toks = np.split(all_toks, bounds)

    langs = rng.choice(len(LANGS), size=n_docs, p=LANG_W)
    rows = []
    for j0 in range(n_docs):
        # id_offset: disjoint doc-id spans for CHUNKED generation of
        # very large bench corpora (scripts/scale_bench.py) — memory
        # stays bounded per chunk while ids/paths never collide
        i = j0 + id_offset
        lang = LANGS[langs[j0]]
        repo = f"org{(i // 50) % 200}/repo{i % 50}"
        path = f"src/d{i % 13}/f{i}.{LANG_EXT[lang]}"
        commit = hashlib.sha256(f"commit:{repo}:{path}".encode()).hexdigest()[:40]
        toks = docs_toks[j0]
        parts = [" ".join(toks[j : j + 12]) for j in range(0, len(toks), 12)]
        rows.append((repo, path, commit, lang, "\n".join(parts)))
    return pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])
