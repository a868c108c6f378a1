"""Tokenizer vocabulary pruning — the CONSUMER of the utilization
report (tokeval.vocab_utilization measures how much of the vocab a
corpus exercises; this shrinks the vocab to what it actually uses,
the embedding-table/softmax-width savings the report quantifies).
Standard practice when adapting a general tokenizer to a narrow
domain (vocabulary trimming, e.g. Abdaoui et al. 2020's BERT
trimming; the sentencepiece vocab-size sweep).

Correctness invariants, enforced by construction:

- the base ALPHABET always survives (every length-1 token; for
  byte-level models the full 256-symbol alphabet), so any text the
  original spec could encode, the pruned spec can too — worst case
  it falls back to smaller pieces;
- kept tokens are closed under MERGE DECOMPOSITION: if a kept token
  is the product of merge (a, b), both parts are kept (walking the
  merge list in reverse order resolves chained dependencies), so
  every surviving merge's inputs are always producible;
- merges whose product is pruned are dropped — text that used them
  simply encodes as the (kept) parts;
- added/control tokens and the unk token always survive.

The pruned spec changes SEGMENTATIONS, not representable text: a
document whose original encoding only used kept tokens re-encodes
to the identical piece sequence (ids remapped); others split into
more, smaller pieces. Stated plainly: pruning trades sequence
length for table width.

Scale shape: the used-id set comes from one corpus aggregation
(vocab-bounded, the tokeval shuffle shape); everything else is
driver-side closure over the vocab — thousands of entries, not
corpus data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from utc_cuip_kafka_aws_connector_spark.operators.tokenio import (
    TokenizerSpec,
)


def used_token_ids(
    df: DataFrame,
    spec,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> list[int]:
    """Distinct token ids the corpus actually produces under
    ``spec`` — one encode pass + a vocab-bounded distinct (the
    tokeval scale shape). The encode leg is ``tokenio.encode_for_
    spec``'s family dispatch (r19), so WordPiece specs measure
    through the same path as BPE/Unigram ones."""
    from utc_cuip_kafka_aws_connector_spark.operators.tokenio import (
        encode_for_spec as spec_encode,
    )

    enc = spec_encode(
        df.select(F.col(id_col), F.coalesce(F.col(text_col), F.lit("")).alias(text_col)),
        spec,
        id_col=id_col,
        text_col=text_col,
    )
    rows = (
        enc.select(F.explode("token_ids").alias("tid"))
        .distinct()
        .collect()
    )
    return sorted(r.tid for r in rows)


def prune_spec(
    spec, used_ids: list[int] | set[int]
) -> tuple[TokenizerSpec, dict[int, int]]:
    """(pruned spec, old-id -> new-id mapping). BPE specs only
    (Unigram pruning is a different operation — score-mass based —
    and is refused rather than faked). New ids are contiguous in
    original-id order, so relative order (and any rank-based
    downstream convention) survives."""
    if getattr(spec, "model_type", "BPE") != "BPE":
        raise ValueError(
            "prune_spec handles BPE specs only; Unigram pruning is "
            f"score-mass-based, got model_type={spec.model_type!r}"
        )
    used = set(int(u) for u in used_ids)
    by_id = {i: t for t, i in spec.vocab.items()}
    unknown = used - set(by_id)
    if unknown:
        raise ValueError(
            f"used_ids not in the spec vocab: {sorted(unknown)[:5]}..."
            if len(unknown) > 5
            else f"used_ids not in the spec vocab: {sorted(unknown)}"
        )

    kept = {t for t, i in spec.vocab.items() if i in used}
    # the alphabet: every single-symbol token (for byte-level specs
    # that is exactly the 256 byte symbols) — encodability floor
    kept |= {t for t in spec.vocab if len(t) == 1}
    if spec.unk_token is not None:
        kept.add(spec.unk_token)
    kept |= set(getattr(spec, "added_tokens", {}) or {})
    # TemplateProcessing specials (BOS/EOS ids) must survive even
    # when the measured corpus never produced them — dropping one
    # would silently truncate the template
    for i in (
        *getattr(spec, "special_prefix", ()),
        *getattr(spec, "special_suffix", ()),
    ):
        if i in by_id:
            kept.add(by_id[i])

    # closure under merge decomposition, reverse merge order so a
    # chain (a,b)->ab, (ab,c)->abc resolves: keeping abc first pulls
    # in ab, whose own walk then pulls in a and b
    for a, b in reversed(spec.merges):
        if a + b in kept:
            kept.add(a)
            kept.add(b)

    merges = [
        (a, b) for a, b in spec.merges if a + b in kept
    ]  # parts kept by closure
    old_ids = sorted(spec.vocab[t] for t in kept)
    remap = {old: new for new, old in enumerate(old_ids)}
    vocab = {by_id[old]: remap[old] for old in old_ids}
    added = {
        t: remap[i]
        for t, i in (getattr(spec, "added_tokens", {}) or {}).items()
        if i in remap
    }
    pruned = TokenizerSpec(
        merges=merges,
        vocab=vocab,
        unk_token=spec.unk_token,
        byte_level=spec.byte_level,
        add_prefix_space=spec.add_prefix_space,
        use_regex=getattr(spec, "use_regex", True),
        byte_fallback=getattr(spec, "byte_fallback", False),
        added_tokens=added,
        normalizers=list(getattr(spec, "normalizers", ()) or ()),
        split_mode=getattr(spec, "split_mode", "whitespace"),
        special_prefix=[
            remap[i] for i in getattr(spec, "special_prefix", ()) if i in remap
        ],
        special_suffix=[
            remap[i] for i in getattr(spec, "special_suffix", ()) if i in remap
        ],
    )
    return pruned, remap


def prune_wordpiece_spec(spec, used_ids):
    """(pruned WordPieceSpec, old-id -> new-id mapping) — the
    WordPiece twin of ``prune_spec`` (r19). The same re-encoding
    theorem holds for greedy longest-match-first: the pruned vocab is
    a SUBSET, so at every scan position matches can only shrink, and
    the originally chosen (longest) piece is kept because the corpus
    used it — by induction every measured document re-encodes to the
    identical piece sequence, ids remapped; unseen words split into
    smaller kept pieces or unk, exactly the BPE trade.

    Survival floor: every single-character token in BOTH positions
    (word-initial ``c`` and continuation ``##c`` are distinct
    symbols), the unk token, added/control tokens, and the
    TemplateProcessing specials. No merge-closure walk is needed:
    WordPiece vocab entries are free-standing strings, not merge
    products."""
    from utc_cuip_kafka_aws_connector_spark.operators.wordpiece import (
        WordPieceSpec,
    )

    if not isinstance(spec, WordPieceSpec):
        raise ValueError(
            f"prune_wordpiece_spec needs a WordPieceSpec, got "
            f"{type(spec).__name__}"
        )
    used = set(int(u) for u in used_ids)
    by_id = {i: t for t, i in spec.vocab.items()}
    unknown = used - set(by_id)
    if unknown:
        raise ValueError(
            f"used_ids not in the spec vocab: {sorted(unknown)[:5]}..."
            if len(unknown) > 5
            else f"used_ids not in the spec vocab: {sorted(unknown)}"
        )
    prefix = spec.continuing_subword_prefix
    kept = {t for t, i in spec.vocab.items() if i in used}
    kept |= {
        t
        for t in spec.vocab
        if len(t) == 1
        or (t.startswith(prefix) and len(t) == len(prefix) + 1)
    }
    kept.add(spec.unk_token)
    kept |= set(spec.added_tokens)
    for i in (*spec.special_prefix, *spec.special_suffix):
        if i in by_id:
            kept.add(by_id[i])

    old_ids = sorted(spec.vocab[t] for t in kept)
    remap = {old: new for new, old in enumerate(old_ids)}
    vocab = {by_id[old]: remap[old] for old in old_ids}
    pruned = WordPieceSpec(
        vocab=vocab,
        unk_token=spec.unk_token,
        continuing_subword_prefix=prefix,
        max_input_chars_per_word=spec.max_input_chars_per_word,
        clean_text=spec.clean_text,
        handle_chinese_chars=spec.handle_chinese_chars,
        strip_accents=spec.strip_accents,
        lowercase=spec.lowercase,
        added_tokens={
            t: remap[i] for t, i in spec.added_tokens.items() if i in remap
        },
        # per-token special flags survive verbatim (ADVICE r19) —
        # every added token is on the survival floor, so this is a
        # copy, but filter anyway to keep the field an invariant
        # subset of added_tokens
        added_specials=frozenset(
            t
            for t in spec.added_specials
            if spec.added_tokens.get(t) in remap
        ),
        special_prefix=[remap[i] for i in spec.special_prefix if i in remap],
        special_suffix=[remap[i] for i in spec.special_suffix if i in remap],
    )
    return pruned, remap


def prune_to_corpus(
    df: DataFrame,
    spec,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """One-call form: measure the corpus' used ids, prune to them —
    dispatching on the spec family like every r19 tokenizer entry
    point (BPE -> ``prune_spec``; WordPiece ->
    ``prune_wordpiece_spec``; Unigram still refuses inside
    prune_spec: its pruning is score-mass-based, a different
    operation)."""
    from utc_cuip_kafka_aws_connector_spark.operators.wordpiece import (
        WordPieceSpec,
    )

    used = used_token_ids(df, spec, id_col, text_col)
    if isinstance(spec, WordPieceSpec):
        return prune_wordpiece_spec(spec, used)
    return prune_spec(spec, used)
