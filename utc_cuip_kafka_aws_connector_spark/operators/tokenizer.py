"""Distributed BPE-style tokenization for training-data pipelines.

The real token-count operator behind budget selection / shard
assignment (q97/q98 use a whitespace stand-in): words are split into
characters and a broadcast MERGES table is applied in rank order --
the merge-list application described in the public BPE literature
(Sennrich et al. 2016, arXiv:1508.07909; SentencePiece's merge-list
encoder). Contract, pinned by tests/test_tokenizer.py's differential
suite: merges apply IN RANK ORDER, each pass merging occurrences
LEFT-TO-RIGHT non-overlapping within a word. For a well-formed
learned merge table (each side of a merge is a character or the
product of an earlier merge) this matches the iterative
lowest-rank-first encoder on real text; the rank-order contract is
what the DuckDB oracle can replay exactly (a chain of framed
string REPLACEs -- see q112's oracle), so the gate checks the
kernel value-for-value.

Scale design: the merges table is a few-thousand-entry dict that
ships in the task closure (broadcast-sized); the kernel is one
mapInPandas pass -- Arrow batches in, a per-executor word->count
cache exploiting Zipf (the top few thousand words cover most of the
stream, so the merge loop runs on the cache-miss tail only), zero
shuffle: token counting happens inside the scan stage.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: F401  (parity with sibling operator modules)

# A small well-formed demo merge table (every non-character side is
# the product of an earlier merge). Real deployments pass the learned
# table from tokenizer training.
DEMO_MERGES: list[tuple[str, str]] = [
    ("t", "h"),
    ("th", "e"),
    ("s", "t"),
    ("a", "r"),
    ("e", "r"),
    ("o", "w"),
    ("l", "e"),
    ("ar", "t"),
]

_WS = re.compile(r"\s+")


def bpe_encode_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Encode one word: start from characters, apply each merge in
    rank order, merging occurrences left-to-right non-overlapping.
    The reference implementation the vectorized kernel and the SQL
    oracle are both pinned against."""
    syms = list(word)
    for a, b in merges:
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_token_count(
    df: DataFrame,
    merges: list[tuple[str, str]] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    cache_cap: int = 1_000_000,
) -> DataFrame:
    """(id, n_words, n_tokens) per document under the BPE merge
    table. Words are whitespace-split (``\\s+``, empties dropped) --
    the same tokenizer the corpus-stats operators use -- then each
    word is BPE-encoded and its token count summed.

    One mapInPandas pass over (id, text) only -- column-pruned at the
    scan, no shuffle. The word->count dict is per-task-instance and
    capped at ``cache_cap`` entries so a pathological unique-word
    corpus cannot OOM an executor."""
    merges_t = tuple(merges if merges is not None else DEMO_MERGES)
    schema = f"{id_col} long, n_words long, n_tokens long"

    def run(batches):
        cache: dict[str, int] = {}

        def count_word(w: str) -> int:
            c = cache.get(w)
            if c is None:
                c = len(bpe_encode_word(w, merges_t))
                if len(cache) < cache_cap:
                    cache[w] = c
            return c

        for pdf in batches:
            # fillna BEFORE astype: pandas astype(str) turns None into
            # the literal word "None" (1 word / 4 tokens), where the
            # q112 oracle's LEFT JOIN + coalesce yields (0, 0).
            word_lists = [
                [w for w in _WS.split(t) if w]
                for t in pdf[text_col].fillna("").astype(str)
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "n_words": [len(ws) for ws in word_lists],
                    "n_tokens": [
                        sum(count_word(w) for w in ws) for ws in word_lists
                    ],
                }
            )

    return df.select(id_col, text_col).mapInPandas(run, schema)
