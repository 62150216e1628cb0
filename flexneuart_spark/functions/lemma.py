"""Deterministic English rule lemmatizer for the T1 slot.

Reference semantics: ``flexneuart/text_proc/parse.py:80-167``
(``SpacyTextParser.proc_text`` — lowercase, drop punctuation, remove a
token when the surface form OR its lemma is a stop word, emit the
space-joined lemma string alongside the space-joined surface string).
The reference gets lemmas from spaCy's statistical pipeline; that
dependency is out of scope here, so this module re-derives the lemma
view with the classic dictionary-validated suffix-rule algorithm
(WordNet's *morphy*, Fellbaum 1998, ch. 4): candidates are produced by
an ordered suffix-substitution table plus an irregular-form exception
table, and the first candidate found in a base-form dictionary wins —
a token already in the dictionary is its own lemma, and a token with no
validated candidate is passed through unchanged. Quality scales with
the dictionary the caller supplies; a starter fixture of common English
base forms is committed at ``lemma_base.txt``.

Drift-proofing: the DuckDB oracle SQL is GENERATED from the SAME rule /
exception / dictionary data by :func:`sql_lemma_query` (the
``krovetz_stem`` pattern), so the Spark side and the oracle cannot
disagree silently.

Scale posture: pure map stage — one Arrow-batched pandas UDF, per-batch
token-level memoization, zero shuffle; the dictionary and exception
tables ship once per executor inside the UDF closure (a few KB).
"""

from __future__ import annotations

import os
import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# --------------------------------------------------------------------------
# shared rule spec (drives BOTH the Python engine and the SQL generator)
# --------------------------------------------------------------------------

# (suffix, replacement, min_token_len, undouble) in PRIORITY order; the
# first dictionary-validated candidate wins. ``undouble`` strips the
# doubled final consonant of the stripped base (running → runn → run)
# and yields NO candidate when the base isn't doubled.
RULES: list[tuple[str, str, int, bool]] = [
    ("sses", "ss", 6, False),   # classes → class
    ("ies", "y", 5, False),     # cities → city
    ("ches", "ch", 6, False),   # churches → church
    ("shes", "sh", 6, False),   # dishes → dish
    ("xes", "x", 5, False),     # boxes → box
    ("zes", "z", 5, False),     # quizzes handled by exception; sizes → size via 's'
    ("ves", "fe", 5, False),    # knives → knife
    ("ves", "f", 5, False),     # wolves → wolf
    ("men", "man", 5, False),   # policemen → policeman
    ("s", "", 3, False),        # joins → join (guarded: not -ss/-us/-is)
    ("ing", "", 6, True),       # running → run
    ("ing", "", 5, False),      # joining → join
    ("ing", "e", 5, False),     # merging → merge
    ("ed", "", 5, True),        # stopped → stop
    ("ed", "", 4, False),       # joined → join
    ("ed", "e", 4, False),      # merged → merge
    ("iest", "y", 6, False),    # happiest → happy
    ("ier", "y", 5, False),     # happier → happy
    ("est", "", 5, True),       # biggest → big
    ("est", "", 5, False),      # fastest → fast
    ("est", "e", 5, False),     # largest → large
    ("er", "", 4, True),        # bigger → big
    ("er", "", 4, False),       # faster → fast
    ("er", "e", 4, False),      # larger → large
]

# the bare-"s" rule must not fire on these endings (glass, virus, basis)
S_RULE_EXCLUDED_ENDINGS = ("ss", "us", "is")

# irregular forms (surface → lemma); checked before everything else
EXCEPTIONS: dict[str, str] = {
    # be / have / do
    "am": "be", "is": "be", "are": "be", "was": "be", "were": "be",
    "been": "be", "being": "be",
    "has": "have", "had": "have", "having": "have",
    "does": "do", "did": "do", "done": "do",
    # common irregular verbs (past / participle)
    "went": "go", "gone": "go", "said": "say", "made": "make",
    "took": "take", "taken": "take", "saw": "see", "seen": "see",
    "got": "get", "gotten": "get", "came": "come", "knew": "know",
    "known": "know", "thought": "think", "found": "find", "gave": "give",
    "given": "give", "told": "tell", "became": "become", "felt": "feel",
    "brought": "bring", "began": "begin", "begun": "begin", "kept": "keep",
    "held": "hold", "wrote": "write", "written": "write", "stood": "stand",
    "heard": "hear", "meant": "mean", "met": "meet", "ran": "run",
    "paid": "pay", "sat": "sit", "spoke": "speak", "spoken": "speak",
    "led": "lead", "grew": "grow", "grown": "grow", "lost": "lose",
    "fell": "fall", "fallen": "fall", "sent": "send", "built": "build",
    "understood": "understand", "drew": "draw", "drawn": "draw",
    "broke": "break", "broken": "break", "spent": "spend", "rose": "rise",
    "risen": "rise", "drove": "drive", "driven": "drive", "bought": "buy",
    "wore": "wear", "worn": "wear", "chose": "choose", "chosen": "choose",
    "ate": "eat", "eaten": "eat", "flew": "fly", "flown": "fly",
    "threw": "throw", "thrown": "throw", "caught": "catch", "taught": "teach",
    "sold": "sell", "left": "leave", "won": "win", "sang": "sing",
    "sung": "sing", "swam": "swim", "swum": "swim", "rang": "ring",
    "rung": "ring", "shook": "shake", "shaken": "shake", "hid": "hide",
    "hidden": "hide", "bit": "bite", "bitten": "bite", "froze": "freeze",
    "frozen": "freeze", "beat": "beat", "beaten": "beat", "lit": "light",
    "slept": "sleep", "woke": "wake", "woken": "wake", "sought": "seek",
    "fought": "fight", "laid": "lay", "slid": "slide", "struck": "strike",
    "swore": "swear", "sworn": "swear", "tore": "tear", "torn": "tear",
    # irregular plurals
    "children": "child", "men": "man", "women": "woman", "feet": "foot",
    "teeth": "tooth", "mice": "mouse", "geese": "goose", "people": "person",
    "oxen": "ox", "lives": "life", "wives": "wife", "indices": "index",
    "matrices": "matrix", "vertices": "vertex", "criteria": "criterion",
    "phenomena": "phenomenon", "data": "datum", "analyses": "analysis",
    "bases": "basis", "theses": "thesis", "crises": "crisis",
    # irregular comparatives
    "better": "good", "best": "good", "worse": "bad", "worst": "bad",
    "further": "far", "farther": "far", "less": "little", "least": "little",
    "more": "many", "most": "many",
}

_DICT_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "lemma_base.txt")


def load_lemma_dict(path: str = _DICT_PATH) -> frozenset[str]:
    """Base-form dictionary fixture: one lowercase lemma per line,
    '#' comments and blank lines ignored. Falls back to package
    resources when the module is imported from a ``--py-files`` zip
    (spark-submit executors), where the file path is not openable."""
    if path == _DICT_PATH and not os.path.isfile(path):
        from importlib import resources

        text = (
            resources.files("flexneuart_spark.functions")
            .joinpath("lemma_base.txt")
            .read_text(encoding="utf-8")
        )
    else:
        with open(path, encoding="utf-8") as f:
            text = f.read()
    words = set()
    for line in text.splitlines():
        w = line.strip()
        if w and not w.startswith("#"):
            words.add(w)
    return frozenset(words)


# --------------------------------------------------------------------------
# Python engine
# --------------------------------------------------------------------------

_NORM_DROP = re.compile(r"[^a-z0-9\s]+")
_NORM_WS = re.compile(r"\s+")


def _candidates(tok: str):
    for suffix, repl, min_len, undouble in RULES:
        if len(tok) < min_len or not tok.endswith(suffix):
            continue
        if suffix == "s" and not undouble and tok.endswith(S_RULE_EXCLUDED_ENDINGS):
            continue
        base = tok[: len(tok) - len(suffix)] + repl
        if undouble:
            if len(base) >= 2 and base[-1] == base[-2]:
                base = base[:-1]
            else:
                continue
        if base:
            yield base


def lemma_token(tok: str, dictionary: frozenset[str]) -> str:
    """morphy: exception table, then identity-if-known, then the first
    dictionary-validated suffix-rule candidate, else pass-through."""
    exc = EXCEPTIONS.get(tok)
    if exc is not None:
        return exc
    if tok in dictionary:
        return tok
    for cand in _candidates(tok):
        if cand in dictionary:
            return cand
    return tok


_INFLECT_SUFFIX = {0: "", 1: "s", 2: "ing", 3: "ed"}


def lemmatize_text(
    text: str,
    dictionary: frozenset[str],
    stops: frozenset[str],
    memo: dict,
    inflect: bool = False,
) -> tuple[str, str]:
    """(lemma string, surface string) for one document — the
    ``proc_text`` contract: a token is dropped when the surface form OR
    its lemma is a stop word. ``inflect=True`` first appends a
    position-cycled suffix ('', s, ing, ed) to each token — the
    deterministic morphological stress used by the driver entry, whose
    oracle applies the identical cycle in SQL."""
    s = _NORM_WS.sub(" ", _NORM_DROP.sub(" ", text.lower())).strip()
    if not s:
        return "", ""
    lemmas, surfaces = [], []
    for pos, tok in enumerate(s.split(" ")):
        if inflect:
            tok = tok + _INFLECT_SUFFIX[pos % 4]
        lemma = memo.get(tok)
        if lemma is None:
            lemma = lemma_token(tok, dictionary)
            memo[tok] = lemma
        if tok in stops or lemma in stops:
            continue
        lemmas.append(lemma)
        surfaces.append(tok)
    return " ".join(lemmas), " ".join(surfaces)


_PAIR_SCHEMA = T.StructType(
    [
        T.StructField("lemmas", T.StringType()),
        T.StructField("tokens", T.StringType()),
    ]
)


def lemma_pair_col(
    col: str | Column,
    dictionary: frozenset[str],
    stops: list[str] | None = None,
    inflect: bool = False,
) -> Column:
    """struct(lemmas, tokens) column — the ``proc_text`` tuple. One
    Arrow batch per pandas chunk; token-level memo per batch."""
    stop_set = frozenset(stops or [])

    @F.pandas_udf(_PAIR_SCHEMA)
    def _lemma(texts: pd.Series) -> pd.DataFrame:
        memo: dict = {}
        out = [
            lemmatize_text(t or "", dictionary, stop_set, memo, inflect)
            for t in texts
        ]
        return pd.DataFrame(out, columns=["lemmas", "tokens"])

    return _lemma(F.col(col) if isinstance(col, str) else col)


# --------------------------------------------------------------------------
# generated DuckDB oracle
# --------------------------------------------------------------------------


def _sql_rule_candidate(rule: tuple[str, str, int, bool], tok: str = "tok") -> str:
    suffix, repl, min_len, undouble = rule
    base = f"substr({tok}, 1, length({tok}) - {len(suffix)})"
    if repl:
        base = f"({base} || '{repl}')"
    guard = f"length({tok}) >= {min_len} AND {tok} LIKE '%{suffix}'"
    if suffix == "s" and not undouble:
        for end in S_RULE_EXCLUDED_ENDINGS:
            guard += f" AND {tok} NOT LIKE '%{end}'"
    if undouble:
        doubled = (
            f"substr({base}, length({base}), 1) = "
            f"substr({base}, length({base}) - 1, 1) AND length({base}) >= 2"
        )
        return (
            f"CASE WHEN {guard} AND {doubled} "
            f"THEN substr({base}, 1, length({base}) - 1) END"
        )
    return f"CASE WHEN {guard} THEN {base} END"


def sql_lemma_query(
    dictionary: frozenset[str],
    stops: list[str] | None = None,
    inflect: bool = False,
    docs_table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """Generate the DuckDB twin of :func:`lemma_pair_col` from the SAME
    rule table / exception table / dictionary. Caller-supplied words are
    escaped when emitted as SQL literals (a dictionary entry like
    ``don't`` must not break the generated query)."""

    def q(w: str) -> str:
        return "'" + w.replace("'", "''") + "'"

    dict_vals = ",\n ".join(f"({q(w)})" for w in sorted(dictionary))
    exc_vals = ",\n ".join(
        f"({q(k)}, {q(v)})" for k, v in sorted(EXCEPTIONS.items())
    )
    cand_cols = ",\n         ".join(
        f"{_sql_rule_candidate(r)} AS c{i}" for i, r in enumerate(RULES)
    )
    picks = "\n           ".join(
        f"WHEN c{i} IN (SELECT w FROM dict) THEN c{i}" for i in range(len(RULES))
    )
    stops = stops or []
    stop_filter = ""
    if stops:
        stops_sql = ", ".join(q(w) for w in stops)
        stop_filter = f"WHERE tok NOT IN ({stops_sql}) AND lemma NOT IN ({stops_sql})"
    infl = "tok0"
    if inflect:
        infl = (
            "CASE (pos - 1) % 4 WHEN 1 THEN tok0 || 's' "
            "WHEN 2 THEN tok0 || 'ing' WHEN 3 THEN tok0 || 'ed' ELSE tok0 END"
        )
    return rf"""
WITH dict AS (SELECT w FROM (VALUES
 {dict_vals}
) t(w)),
exc AS (SELECT etok, elemma FROM (VALUES
 {exc_vals}
) t(etok, elemma)),
norm AS (
  SELECT {id_col},
         trim(regexp_replace(regexp_replace(lower({text_col}), '[^a-z0-9\s]+', ' ', 'g'),
                             '\s+', ' ', 'g')) AS s
  FROM {docs_table}
),
toks AS (
  SELECT {id_col},
         unnest(string_split(s, ' ')) AS tok0,
         unnest(range(1, len(string_split(s, ' ')) + 1)) AS pos
  FROM norm WHERE s <> ''
),
infl AS (SELECT {id_col}, pos, {infl} AS tok FROM toks),
cand AS (
  SELECT {id_col}, pos, tok,
         {cand_cols}
  FROM infl
),
lem AS (
  SELECT {id_col}, pos, tok,
         CASE
           WHEN exc.elemma IS NOT NULL THEN exc.elemma
           WHEN tok IN (SELECT w FROM dict) THEN tok
           {picks}
           ELSE tok END AS lemma
  FROM cand LEFT JOIN exc ON cand.tok = exc.etok
),
kept AS (SELECT * FROM lem {stop_filter}),
agg AS (
  SELECT {id_col},
         string_agg(lemma, ' ' ORDER BY pos) AS lemmas,
         string_agg(tok, ' ' ORDER BY pos) AS tokens
  FROM kept GROUP BY 1
)
SELECT n.{id_col}, coalesce(a.lemmas, '') AS lemmas, coalesce(a.tokens, '') AS tokens
FROM norm n LEFT JOIN agg a USING ({id_col})
"""
