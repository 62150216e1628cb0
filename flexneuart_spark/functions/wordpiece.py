"""BERT retokenization (reference T5) as pure-Python WordPiece.

Reference semantics: ``flexneuart/text_proc/parse.py:199-223`` —
``get_retokenized(tokenizer, text) = ' '.join(tokenizer.tokenize(text))``
into a ``*_bert_tok`` field. The reference loads a HuggingFace tokenizer;
this module re-implements the published BERT tokenization algorithm
(Devlin et al. 2019; the original ``bert/tokenization.py``: BasicTokenizer
lowercase → strip accents → punctuation split, then greedy
longest-match-first WordPiece with '##' continuations, [UNK] fallback,
max 100 chars per word) over a COMMITTED vocab fixture, so the result is
deterministic and needs no external model download.

Spark side: one Arrow-batched pandas UDF (the vocab set is closed over and
shipped once per executor, with a per-batch word cache — tokenization is
per distinct word, not per occurrence). No per-row Python at the plan
level; this is the same slow-path discipline as ``functions/kstem.py``.

Oracle side: ``sql_wordpiece_query`` GENERATES a DuckDB query from the
same vocab file — greedy matching as a recursive CTE with a correlated
longest-prefix lookup — so the two sides cannot drift (the
``krovetz_stem`` generated-oracle pattern).

Scale: tokenization is embarrassingly parallel (mapInArrow-equivalent),
vocab is O(30k) strings broadcast once; at 100 TB this is a pure map
stage with zero shuffle.
"""

from __future__ import annotations

import unicodedata
from functools import lru_cache

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

UNK = "[UNK]"
MAX_WORD_CHARS = 100

# ASCII punctuation ranges treated as punctuation by BERT's
# _is_punctuation (33-47, 58-64, 91-96, 123-126) — anything in these
# ranges splits into its own token even when unicodedata says "symbol"
# (e.g. '$', '+', '`').
_ASCII_PUNCT = set(
    [chr(c) for c in range(33, 48)]
    + [chr(c) for c in range(58, 65)]
    + [chr(c) for c in range(91, 97)]
    + [chr(c) for c in range(123, 127)]
)


def _is_punct(ch: str) -> bool:
    return ch in _ASCII_PUNCT or unicodedata.category(ch).startswith("P")


def _is_control(ch: str) -> bool:
    if ch in ("\t", "\n", "\r"):
        return False
    return unicodedata.category(ch) in ("Cc", "Cf")


def basic_tokenize(text: str, lower: bool = True) -> list[str]:
    """BERT BasicTokenizer: clean control chars, whitespace-split,
    lowercase + NFD accent-strip, split punctuation into single-char
    tokens."""
    cleaned = []
    for ch in text:
        cp = ord(ch)
        if cp == 0 or cp == 0xFFFD or _is_control(ch):
            continue
        cleaned.append(" " if ch.isspace() else ch)
    out: list[str] = []
    for tok in "".join(cleaned).split():
        if lower:
            tok = tok.lower()
            tok = "".join(c for c in unicodedata.normalize("NFD", tok)
                          if unicodedata.category(c) != "Mn")
        buf: list[str] = []
        for ch in tok:
            if _is_punct(ch):
                if buf:
                    out.append("".join(buf))
                    buf = []
                out.append(ch)
            else:
                buf.append(ch)
        if buf:
            out.append("".join(buf))
    return out


def load_vocab(path: str) -> list[str]:
    """BERT vocab format: one token per line, '##'-prefixed continuations."""
    with open(path, encoding="utf-8") as f:
        return [line.rstrip("\n") for line in f if line.rstrip("\n")]


class WordPieceTokenizer:
    """Greedy longest-match-first WordPiece over a fixed vocab —
    the published BERT algorithm, no external deps."""

    def __init__(self, vocab: list[str], lower: bool = True):
        self.vocab = set(vocab)
        self.lower = lower
        # longest piece length bounds the prefix probe
        self._max_len = max((len(v) for v in self.vocab), default=1)

    def _wordpiece(self, word: str) -> list[str]:
        if len(word) > MAX_WORD_CHARS:
            return [UNK]
        start, n = 0, len(word)
        pieces: list[str] = []
        while start < n:
            end = n
            cur = None
            while start < end:
                sub = word[start:end]
                if start > 0:
                    sub = "##" + sub
                if sub in self.vocab:
                    cur = sub
                    break
                end -= 1
            if cur is None:
                return [UNK]
            pieces.append(cur)
            start = end
        return pieces

    def tokenize(self, text: str) -> list[str]:
        out: list[str] = []
        for w in basic_tokenize(text, self.lower):
            out.extend(self._wordpiece(w))
        return out

    def retokenize(self, text: str) -> str:
        """Reference ``get_retokenized`` shape: space-joined token string."""
        return " ".join(self.tokenize(text))


def bert_tok_col(text_col: str, vocab: list[str], lower: bool = True) -> Column:
    """Arrow-batched pandas UDF column: space-joined WordPiece tokens of
    ``text_col``. Tokenization is cached per distinct word within the
    executor process (words repeat heavily in any corpus)."""
    vocab_list = list(vocab)

    @F.pandas_udf(StringType())
    def _tok(s: pd.Series) -> pd.Series:
        tk = WordPieceTokenizer(vocab_list, lower)

        @lru_cache(maxsize=1 << 18)
        def word_pieces(w: str) -> str:
            return " ".join(tk._wordpiece(w))

        def one(t):
            if t is None:
                return ""
            return " ".join(word_pieces(w) for w in basic_tokenize(t, lower))

        return s.map(one)

    return _tok(F.col(text_col))


def sql_wordpiece_query(
    vocab: list[str],
    docs_table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """Generate the DuckDB oracle for :func:`bert_tok_col` from the SAME
    vocab: ASCII basic tokenization in SQL (lowercase + punctuation split
    — the corpus is ASCII so accent-stripping is a no-op, asserted by the
    golden pytest), then greedy longest-match-first WordPiece as a
    recursive CTE with a correlated longest-prefix lookup."""
    rows = []
    for tok in vocab:
        is_cont = tok.startswith("##")
        piece = tok[2:] if is_cont else tok
        piece_sql = piece.replace("'", "''")
        tok_sql = tok.replace("'", "''")
        rows.append(f"('{piece_sql}', '{tok_sql}', {'true' if is_cont else 'false'})")
    vocab_values = ",\n ".join(rows)
    # ASCII punct class for the punctuation split (BERT ranges 33-47,
    # 58-64, 91-96, 123-126)
    punct = r"""[!-/:-@\[-`{-~]"""
    return rf"""
WITH RECURSIVE v AS (
  SELECT piece, tok, is_cont FROM (VALUES
 {vocab_values}
  ) t(piece, tok, is_cont)
),
norm AS (
  SELECT {id_col},
         trim(regexp_replace(
           regexp_replace(lower({text_col}), '({punct})', ' \1 ', 'g'),
           '\s+', ' ', 'g')) AS s
  FROM {docs_table}
),
words AS (
  SELECT {id_col},
         unnest(string_split(s, ' ')) AS word,
         unnest(range(1, len(string_split(s, ' ')) + 1)) AS pos
  FROM norm WHERE s <> ''
),
wp AS (
  SELECT {id_col}, pos, word, CAST(1 AS BIGINT) AS cur,
         CAST([] AS VARCHAR[]) AS toks,
         len(word) > {MAX_WORD_CHARS} AS bad
  FROM words
  UNION ALL
  SELECT {id_col}, pos, word,
         CASE WHEN best IS NULL THEN len(word) + 1 ELSE cur + len(best) END,
         CASE WHEN best IS NULL THEN toks ELSE list_append(toks, best_tok) END,
         best IS NULL
  FROM (
    SELECT s.{id_col}, s.pos, s.word, s.cur, s.toks,
           (SELECT v.piece FROM v
             WHERE v.is_cont = (s.cur > 1)
               AND v.piece = substr(s.word, s.cur, len(v.piece))
             ORDER BY len(v.piece) DESC, v.piece LIMIT 1) AS best,
           (SELECT v.tok FROM v
             WHERE v.is_cont = (s.cur > 1)
               AND v.piece = substr(s.word, s.cur, len(v.piece))
             ORDER BY len(v.piece) DESC, v.piece LIMIT 1) AS best_tok
    FROM wp s
    WHERE s.cur <= len(s.word) AND NOT s.bad
  )
),
terminal AS (
  SELECT {id_col}, pos,
         CASE WHEN bad THEN '{UNK}' ELSE array_to_string(toks, ' ') END AS tstr
  FROM wp WHERE bad OR cur > len(word)
),
agg AS (
  SELECT {id_col}, string_agg(tstr, ' ' ORDER BY pos) AS bert_tok
  FROM terminal GROUP BY 1
)
SELECT n.{id_col}, coalesce(a.bert_tok, '') AS bert_tok
FROM norm n LEFT JOIN agg a USING ({id_col})
"""
