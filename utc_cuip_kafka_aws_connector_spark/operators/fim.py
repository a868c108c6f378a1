"""Fill-in-the-middle (FIM) transformation — the code-model
training-data op (Bavarian et al. 2022, "Efficient Training of
Language Models to Fill in the Middle"): split a document at two
random points into (prefix, middle, suffix) and emit the reordered
sequence with sentinel tokens, so a causal LM learns infilling. The
last member of the example-manufacturing tier (packing=LM,
crops=contrastive, prefpairs=DPO, corruption=seq2seq, fim=infilling).

Formats (exactly as emitted — stated rather than claiming byte
parity with any particular training repo, whose sentinel spellings
vary):

- PSM: ``<fim_prefix>P<fim_suffix>S<fim_middle>M``
- SPM (suffix-first reordering): ``<fim_suffix>S<fim_prefix>P<fim_middle>M``

Character-level cuts (the paper's choice — splitting on characters,
not tokens, teaches sub-token boundary infilling). Cut points are
uniform over [0, len] inclusive, so empty prefix/middle/suffix are
all reachable, as in the reference implementations.

Determinism (the sampling.py doctrine): the apply/mode/cut draws are
md5 content-hash arithmetic per (id, seed, leg) — same rows
transform the same way across partitioning, retries, and engines;
the tests replicate the whole construction in pure Python.

Scale shape: one scan-local projection (substr + concat). Zero UDFs,
shuffles, or joins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.operators.hashdraw import (
    md5_uniform,
)


def _draw(id_col: Column, seed: int, leg: str) -> Column:
    return md5_uniform(id_col, f"{int(seed)}:{leg}")


def fim_transform(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    rate: float = 0.5,
    spm_rate: float = 0.5,
    seed: int = 0,
    prefix_tok: str = "<fim_prefix>",
    middle_tok: str = "<fim_middle>",
    suffix_tok: str = "<fim_suffix>",
) -> DataFrame:
    """(id, text, fim_applied): each document is FIM-reordered with
    probability ``rate`` (hash-drawn, not RNG); transformed documents
    pick SPM with probability ``spm_rate``, else PSM. Untransformed
    documents pass through verbatim with ``fim_applied = false`` —
    the standard mixed-objective corpus (the paper trains on a
    FIM/AR mixture, not pure FIM). NULL ids/texts are dropped; empty
    texts pass through untransformed (nothing to reorder)."""
    for name, v in (("rate", rate), ("spm_rate", spm_rate)):
        if not (0.0 <= v <= 1.0):
            raise ValueError(f"{name} must be in [0,1], got {v}")

    i = F.col(id_col)
    text = F.col(text_col)
    n = F.length(text)
    applied = (_draw(i, seed, "apply") < F.lit(float(rate))) & (n > 0)
    spm = _draw(i, seed, "mode") < F.lit(float(spm_rate))

    c1 = F.floor(_draw(i, seed, "cut1") * (n + 1)).cast("int")
    c2 = F.floor(_draw(i, seed, "cut2") * (n + 1)).cast("int")
    lo, hi = F.least(c1, c2), F.greatest(c1, c2)
    prefix = F.substring(text, 1, lo)
    middle = text.substr(lo + 1, hi - lo)
    suffix = text.substr(hi + 1, n - hi)

    psm = F.concat(
        F.lit(prefix_tok), prefix,
        F.lit(suffix_tok), suffix,
        F.lit(middle_tok), middle,
    )
    spm_text = F.concat(
        F.lit(suffix_tok), suffix,
        F.lit(prefix_tok), prefix,
        F.lit(middle_tok), middle,
    )
    out_text = F.when(
        applied, F.when(spm, spm_text).otherwise(psm)
    ).otherwise(text)

    return df.filter(i.isNotNull() & text.isNotNull()).select(
        i.alias(id_col),
        out_text.alias(text_col),
        applied.alias("fim_applied"),
    )
