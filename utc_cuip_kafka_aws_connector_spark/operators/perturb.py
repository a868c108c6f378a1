"""Deterministic text perturbation — typo-noise augmentation (the
NL-Augmenter / noise-robustness recipe: models and filters should
survive realistic typos, and dedup/fingerprint pipelines need
eval corpora with KNOWN near-duplicate structure). Two consumers in
this engine: robustness training data (augmented copies of clean
documents), and planted near-dup evaluation sets for the dedup tier
(a perturbed copy at a known edit rate is ground truth MinHash/
SimHash should recover).

Word-level edits, one hash-drawn op per selected word:

- ``swap``: transpose two adjacent characters,
- ``drop``: delete one character,
- ``double``: duplicate one character.

Words shorter than 2 characters are never edited (nothing to
transpose or safely delete). Edit position and op are content-hash
draws per (id, seed, word index) — the hashdraw doctrine: identical
output across partitioning/retries/engines, replicable in pure
Python for the differential test.

Scale shape: one scan-local projection — split to words, transform
with an index-aware lambda (substring surgery per edited word),
re-join. Zero UDFs, shuffles, or joins. Hash cost is one md5 per
WORD (not per character — the reason edits are word-granular), so
the op runs at scan speed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.operators.arrayops import (
    ws_tokens,
)
from utc_cuip_kafka_aws_connector_spark.operators.hashdraw import (
    md5_uniform_key,
)

_OPS = ("swap", "drop", "double")


def perturb_text(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    rate: float = 0.1,
    seed: int = 0,
    out_col: str | None = None,
) -> DataFrame:
    """Rewrites ``text_col`` (or ``out_col``) with approximately
    ``rate`` of its words typo-edited, plus ``n_edits`` counting the
    words actually changed. Whitespace collapses to single spaces on
    re-join (the crops.py statement). NULL ids/texts pass through
    unchanged with 0 edits; ``rate=0`` is the identity on word
    content. The same (id, seed) always produces the same noise —
    augmentation is reproducible, and a planted-near-dup eval set is
    regenerable bit-for-bit."""
    if not (0.0 <= rate <= 1.0):
        raise ValueError(f"rate must be in [0,1], got {rate}")

    i = F.col(id_col)

    def draw(leg: str, k: Column) -> Column:
        return md5_uniform_key(
            F.concat(
                i.cast("string"),
                F.lit(f":{int(seed)}:{leg}:"),
                k.cast("string"),
            )
        )

    def edit(w: Column, k: Column) -> Column:
        n = F.length(w)
        eligible = (draw("apply", k) < F.lit(float(rate))) & (n >= 2)
        op = F.floor(draw("op", k) * 3).cast("int")
        # swap needs p in [1, n-1]; drop/double use p in [1, n]
        p_swap = (F.lit(1) + F.floor(draw("pos", k) * (n - 1))).cast("int")
        p = (F.lit(1) + F.floor(draw("pos", k) * n)).cast("int")
        swapped = F.concat(
            w.substr(F.lit(1), p_swap - 1),
            w.substr(p_swap + 1, F.lit(1)),
            w.substr(p_swap, F.lit(1)),
            w.substr(p_swap + 2, n),
        )
        dropped = F.concat(
            w.substr(F.lit(1), p - 1), w.substr(p + 1, n)
        )
        doubled = F.concat(
            w.substr(F.lit(1), p), w.substr(p, F.lit(1)), w.substr(p + 1, n)
        )
        edited = (
            F.when(op == 0, swapped)
            .when(op == 1, dropped)
            .otherwise(doubled)
        )
        return F.when(eligible, edited).otherwise(w)

    words = ws_tokens(F.col(text_col))
    noised = F.transform(words, lambda w, k: edit(w, k))
    n_edits = F.size(
        F.filter(
            F.zip_with(words, noised, lambda a, b: a != b), lambda x: x
        )
    )
    target = out_col or text_col
    return df.withColumns(
        {
            target: F.when(
                F.col(text_col).isNull() | i.isNull(), F.col(text_col)
            ).otherwise(F.array_join(noised, " ")),
            "n_edits": F.when(
                F.col(text_col).isNull() | i.isNull(), F.lit(0)
            ).otherwise(n_edits).cast("int"),
        }
    )
