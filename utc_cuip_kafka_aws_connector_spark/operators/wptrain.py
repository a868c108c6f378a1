"""Distributed WordPiece vocabulary TRAINING — the likelihood-scored
subword learner of the BERT family (Schuster & Nakajima 2012,
"Japanese and Korean Voice Search"; described for BERT in Devlin et
al. 2018 §A and taught as reference pseudocode in the public HF LLM
course's WordPiece chapter).

``operators/wordpiece.py`` APPLIES a WordPiece vocab; this module
LEARNS one from the corpus, completing the tokenizer tier's third
train/encode pair (BPE: bpetrain.py -> tokenizer.py; Unigram:
unigram.py; WordPiece: here -> wordpiece.py). (The reference repo has
no tokenizer at all — run.py's whitespace field split is its closest
analogue; token-aware curation is this engine's §2.D surface.)

Algorithm (the published likelihood variant, restated as the operator
contract): words are produced by the SAME BertNormalizer +
BertPreTokenizer kernel the encoder runs (training/encoding
consistency is exact by construction); each word starts as its
character sequence with every non-initial character carrying the
``##`` continuation prefix. Repeatedly: count every adjacent symbol
pair across the corpus weighted by word frequency AND every symbol's
own weighted frequency, score each pair

    score(a, b) = freq(a b) / (freq(a) * freq(b))

(the likelihood gain of merging under a unigram LM — what
distinguishes WordPiece from BPE's raw-frequency argmax), merge the
best-scoring pair everywhere (merged symbol = a + b with b's ``##``
stripped; the merged symbol inherits a's word-position), and add the
merged token to the vocab — until the vocab reaches ``vocab_size`` or
no pair occurs twice. Ties are broken by (score desc, pair count
desc, lhs asc, rhs asc) — the published pseudocode leaves ties
unspecified; pinning them is what makes training deterministic and
cross-implementation checkable (the bpetrain.py convention).

Id assignment (a free choice the published algorithm does not fix;
pinned here for determinism): special tokens in caller order, then
the alphabet sorted lexicographically, then merged tokens in merge
order — the file round-trips byte-for-byte.

Scale design: ONE corpus-scale pass total — an Arrow-batched
normalize+pretokenize scan (the encoder's own kernel, so no
train/encode drift) feeding a map-side-combined word histogram —
collapses the 100 TB text stream to its Zipf-bounded (word, freq)
vocabulary before any iteration starts, exactly bpetrain.py's
argument. The scoring iterations then run on the driver over that
histogram under an explicit ``max_histogram_rows`` budget
(refuse-loudly, the retention_curve max_groups contract): unlike
BPE's pure-frequency argmax, the likelihood score renormalizes by
BOTH endpoint frequencies every round, so each merge perturbs every
score sharing a symbol — the classic implementations (and the HF
course reference) all train driver-side over the histogram for this
reason. A corpus whose WORD HISTOGRAM exceeds the budget needs the
budget raised explicitly (the histogram grows with vocabulary, not
corpus size — Heaps' law keeps real-text histograms far under it).
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from utc_cuip_kafka_aws_connector_spark.operators.wordpiece import (
    WordPieceSpec,
    normalize_text,
    pretokenize,
)

DEFAULT_SPECIALS = ("[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]")


def word_histogram(
    df: DataFrame,
    text_col: str = "text",
    clean_text: bool = True,
    handle_chinese_chars: bool = True,
    strip_accents: bool | None = None,
    lowercase: bool = True,
) -> DataFrame:
    """(word, freq) over the BertNormalizer+BertPreTokenizer word
    stream — the single corpus-scale shuffle of training. The word
    extraction runs the ENCODER'S normalize/pretokenize kernel in an
    Arrow-batched UDF (vocab-free spec: the normalizer flags are the
    only state), so the trained vocab tokenizes exactly the stream it
    was trained on."""
    norm_spec = WordPieceSpec(
        vocab={},
        clean_text=clean_text,
        handle_chinese_chars=handle_chinese_chars,
        strip_accents=strip_accents,
        lowercase=lowercase,
    )

    @F.pandas_udf(ArrayType(StringType()))
    def words(texts: pd.Series) -> pd.Series:
        return pd.Series(
            [pretokenize(normalize_text(t or "", norm_spec)) for t in texts]
        )

    return (
        df.select(F.explode(words(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _driver_train(
    wf: list[tuple[str, int]],
    n_merges: int,
    prefix: str = "##",
    min_pair_freq: int = 2,
) -> list[str]:
    """The likelihood-scored merge loop over a driver-resident
    (word, freq) histogram: returns merged tokens in merge order.
    Deterministic: ties by (score desc, pair count desc, lhs, rhs).

    Counting is INCREMENTAL (review r19): a merge only changes the
    symbol/pair counts of words containing the merged pair, so those
    words (found through a pair -> word-ids index, the Sennrich
    acceleration bpetrain._driver_train uses) are the only ones
    re-counted — without this, each merge re-scanned the whole
    histogram and a budget-sized corpus took ~10^11 Python ops. The
    re-SCORING each round still scans every live pair: the score's
    denominators change with every merge touching a shared symbol,
    so (unlike Sennrich BPE's count argmax) there is no sound lazy
    heap — but that scan is pair-vocabulary-sized, not corpus-sized,
    and the argmax key (score desc, count desc, lhs, rhs) is total,
    so dict iteration order never leaks into the result."""
    segs: list[list[str]] = []
    freqs: list[int] = []
    for w, f in wf:
        segs.append([w[0]] + [prefix + ch for ch in w[1:]])
        freqs.append(f)

    sym_freq: dict[str, int] = {}
    pair_freq: dict[tuple[str, str], int] = {}
    index: dict[tuple[str, str], set[int]] = {}
    for i, (s, f) in enumerate(zip(segs, freqs)):
        for sym in s:
            sym_freq[sym] = sym_freq.get(sym, 0) + f
        for pair in zip(s, s[1:]):
            pair_freq[pair] = pair_freq.get(pair, 0) + f
            index.setdefault(pair, set()).add(i)

    out: list[str] = []
    for _ in range(n_merges):
        best = None
        for (a, b), pf in pair_freq.items():
            if pf < min_pair_freq:
                continue  # below the trainer's min_frequency knob
            score = pf / (sym_freq[a] * sym_freq[b])
            key = (-score, -pf, a, b)
            if best is None or key < best[0]:
                best = (key, a, b)
        if best is None:
            break
        _, a, b = best
        merged = a + b[len(prefix):]
        out.append(merged)
        for i in index.pop((a, b), ()):
            s, f = segs[i], freqs[i]
            if not any(
                s[j] == a and s[j + 1] == b for j in range(len(s) - 1)
            ):
                continue  # stale index entry: pair already merged away
            for sym in s:
                sym_freq[sym] -= f
            for pair in zip(s, s[1:]):
                pair_freq[pair] -= f
                if pair_freq[pair] <= 0:
                    del pair_freq[pair]
            ns, j = [], 0
            while j < len(s):
                if j + 1 < len(s) and s[j] == a and s[j + 1] == b:
                    ns.append(merged)
                    j += 2
                else:
                    ns.append(s[j])
                    j += 1
            segs[i] = ns
            for sym in ns:
                sym_freq[sym] = sym_freq.get(sym, 0) + f
            for pair in zip(ns, ns[1:]):
                pair_freq[pair] = pair_freq.get(pair, 0) + f
                index.setdefault(pair, set()).add(i)
    return out


def wordpiece_train(
    df: DataFrame,
    vocab_size: int,
    text_col: str = "text",
    special_tokens: tuple[str, ...] = DEFAULT_SPECIALS,
    clean_text: bool = True,
    handle_chinese_chars: bool = True,
    strip_accents: bool | None = None,
    lowercase: bool = True,
    continuing_subword_prefix: str = "##",
    min_pair_freq: int = 2,
    max_histogram_rows: int = 2_000_000,
) -> dict[str, int]:
    """Learn a WordPiece vocab of (at most) ``vocab_size`` entries
    from the corpus: specials, then the sorted character alphabet
    (word-initial and ``##``-continuation forms are distinct
    symbols), then likelihood-scored merges in learn order. Returns
    the token -> id mapping ``wordpiece.spec_encode`` consumes
    (``save_wordpiece_tokenizer`` writes it as a loadable
    tokenizer.json). ``min_pair_freq`` is the standard trainer
    min_frequency knob (a pair below it never merges; the default 2
    stops singleton pairs from minting tokens seen once). Fewer than
    ``vocab_size`` entries come back when the corpus runs out of
    eligible pairs — never padded."""
    if vocab_size < 1:
        raise ValueError(f"vocab_size must be >= 1, got {vocab_size}")
    if len(set(special_tokens)) != len(special_tokens):
        raise ValueError(f"duplicate special tokens: {special_tokens}")
    hist = word_histogram(
        df,
        text_col=text_col,
        clean_text=clean_text,
        handle_chinese_chars=handle_chinese_chars,
        strip_accents=strip_accents,
        lowercase=lowercase,
    )
    rows = hist.limit(max_histogram_rows + 1).collect()
    if len(rows) > max_histogram_rows:
        raise ValueError(
            f"wordpiece_train: word histogram exceeds "
            f"max_histogram_rows={max_histogram_rows} — an unusual "
            "corpus (random strings? binary noise?); raise the budget "
            "deliberately if the vocabulary really is that large"
        )
    # deterministic iteration order regardless of partition layout
    wf = sorted(((r["word"], r["freq"]) for r in rows))

    alphabet: set[str] = set()
    for w, _ in wf:
        alphabet.add(w[0])
        alphabet.update(continuing_subword_prefix + ch for ch in w[1:])
    base = list(special_tokens) + sorted(alphabet)
    if vocab_size < len(base):
        raise ValueError(
            f"vocab_size={vocab_size} cannot hold the "
            f"{len(special_tokens)} specials + {len(alphabet)} alphabet "
            "symbols — a vocab that cannot represent single characters "
            "would unk almost everything"
        )
    merges = _driver_train(
        wf,
        vocab_size - len(base),
        prefix=continuing_subword_prefix,
        min_pair_freq=min_pair_freq,
    )
    vocab: dict[str, int] = {}
    for tok in base + merges:
        if tok not in vocab:  # a merge may collide with a special
            vocab[tok] = len(vocab)
    return vocab


def to_wordpiece_tokenizer_json(
    vocab: dict[str, int],
    unk_token: str = "[UNK]",
    continuing_subword_prefix: str = "##",
    clean_text: bool = True,
    handle_chinese_chars: bool = True,
    strip_accents: bool | None = None,
    lowercase: bool = True,
    special_tokens: tuple[str, ...] = DEFAULT_SPECIALS,
    cls_token: str = "[CLS]",
    sep_token: str = "[SEP]",
    max_input_chars_per_word: int = 100,
    special_flags: dict[str, bool] | None = None,
) -> str:
    """Serialize a trained vocab as a ``tokenizer.json`` that
    ``wordpiece.from_wordpiece_json`` / ``tokenio.load_tokenizer_
    spec`` loads back EXACTLY (the round-trip the tests pin):
    model.type WordPiece + BertNormalizer (the training flags) +
    BertPreTokenizer.

    Every in-vocab member of ``special_tokens`` is ALSO registered
    in the ``added_tokens`` section with default matching flags
    (review r19): without that, the trained specials' ids were
    unreachable — running text containing '[MASK]' would lowercase
    and punctuation-split it to UNKs (the HF trainer registers
    specials as added tokens for exactly this reason). When both
    ``cls_token`` and ``sep_token`` are in the vocab, the standard
    BERT single-sequence TemplateProcessing ([CLS] A [SEP]) is
    emitted too, so the loaded spec's ``add_special_tokens=`` path
    works; pass None for either to omit it.

    ``special_flags`` overrides the per-token ``"special"`` value in
    the added_tokens section (default: every entry True — right for
    the trainer, whose added tokens ARE the trained specials);
    ``wordpiece_spec_json`` passes the loaded file's verbatim flags
    through it so non-special added tokens round-trip unflipped
    (ADVICE r19)."""
    if unk_token not in vocab:
        raise ValueError(f"unk_token {unk_token!r} is not in the vocab")
    doc = {
        "version": "1.0",
        "normalizer": {
            "type": "BertNormalizer",
            "clean_text": clean_text,
            "handle_chinese_chars": handle_chinese_chars,
            "strip_accents": strip_accents,
            "lowercase": lowercase,
        },
        "pre_tokenizer": {"type": "BertPreTokenizer"},
        "model": {
            "type": "WordPiece",
            "unk_token": unk_token,
            "continuing_subword_prefix": continuing_subword_prefix,
            "max_input_chars_per_word": int(max_input_chars_per_word),
            "vocab": dict(sorted(vocab.items(), key=lambda kv: kv[1])),
        },
    }
    added = [
        {
            "id": vocab[t],
            "content": t,
            "single_word": False,
            "lstrip": False,
            "rstrip": False,
            "normalized": False,
            "special": (
                True
                if special_flags is None
                else bool(special_flags.get(t, True))
            ),
        }
        for t in special_tokens
        if t in vocab
    ]
    if added:
        doc["added_tokens"] = sorted(added, key=lambda d: d["id"])
    if (
        cls_token is not None
        and sep_token is not None
        and cls_token in vocab
        and sep_token in vocab
    ):
        doc["post_processor"] = {
            "type": "TemplateProcessing",
            "single": [
                {"SpecialToken": {"id": cls_token, "type_id": 0}},
                {"Sequence": {"id": "A", "type_id": 0}},
                {"SpecialToken": {"id": sep_token, "type_id": 0}},
            ],
        }
    return json.dumps(doc, ensure_ascii=False, indent=1)


def save_wordpiece_tokenizer(
    spark: SparkSession, path: str, vocab: dict[str, int], **kwargs
) -> None:
    from utc_cuip_kafka_aws_connector_spark.operators.tokenio import (
        _fs_write_text,
    )

    _fs_write_text(
        spark, path, to_wordpiece_tokenizer_json(vocab, **kwargs)
    )


def wordpiece_template_refusal(spec: WordPieceSpec) -> str | None:
    """The refusal message ``wordpiece_spec_json`` raises for
    TemplateProcessing shapes ``to_wordpiece_tokenizer_json`` cannot
    express (multi-token prefixes/suffixes, a prefix without a
    suffix), or None when the spec serializes faithfully. One place
    so the CLI's up-front guard and the writer's raise can never
    state different constraints (ADVICE r19: the CLI used to learn
    about an unserializable shape only AFTER the corpus encode
    pass)."""
    if len(spec.special_prefix) > 1 or len(spec.special_suffix) > 1 or (
        bool(spec.special_prefix) != bool(spec.special_suffix)
    ):
        return (
            "wordpiece_spec_json writes the single-sequence "
            "[CLS] A [SEP] template only; this spec's specials are "
            f"prefix={spec.special_prefix} suffix={spec.special_suffix}"
        )
    return None


def wordpiece_spec_json(spec: WordPieceSpec) -> str:
    """Serialize an arbitrary in-memory ``WordPieceSpec`` (a pruned
    one, a hand-built one) as a tokenizer.json that
    ``from_wordpiece_json`` loads back to an EQUAL spec. The
    normalizer always re-emits as an explicit all-flags
    BertNormalizer — semantics-preserving for every loadable input
    (a Lowercase-normalizer file loads as lowercase=True with every
    other flag False; an absent normalizer as all-False — both
    round-trip exactly through the explicit form). Refuses template
    shapes ``to_wordpiece_tokenizer_json`` cannot express (the
    ``wordpiece_template_refusal`` law). Each added token's
    ``special`` flag re-emits verbatim from ``spec.added_specials``
    (ADVICE r19: flipping a loaded non-special added token to
    special drifted HF-interop metadata)."""
    rev = {i: t for t, i in spec.vocab.items()}
    refusal = wordpiece_template_refusal(spec)
    if refusal is not None:
        raise ValueError(refusal)
    cls = rev[spec.special_prefix[0]] if spec.special_prefix else None
    sep = rev[spec.special_suffix[0]] if spec.special_suffix else None
    return to_wordpiece_tokenizer_json(
        spec.vocab,
        unk_token=spec.unk_token,
        continuing_subword_prefix=spec.continuing_subword_prefix,
        clean_text=spec.clean_text,
        handle_chinese_chars=spec.handle_chinese_chars,
        strip_accents=spec.strip_accents,
        lowercase=spec.lowercase,
        special_tokens=tuple(spec.added_tokens),
        cls_token=cls,
        sep_token=sep,
        max_input_chars_per_word=spec.max_input_chars_per_word,
        special_flags={
            t: t in spec.added_specials for t in spec.added_tokens
        },
    )
