"""Text analysis operators for LLM training-data pipelines.

All hot-path computation is built-in ``pyspark.sql.functions``
expressions (JVM-side, whole-stage-codegen'd, no Python UDFs): at
100 TB these run inside the scan stage with zero extra shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language marker-word lists for the n-gram/stopword
# language-ID heuristic. Real pipelines plug in fastText et al.; the
# operator contract (ratio features + argmax) is what matters here.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "die", "und", "das", "ist"],
    "es": ["el", "la", "de", "que", "los"],
    "fr": ["le", "la", "les", "des", "est"],
}

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]


def words(text_col: str | Column) -> Column:
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.split(c, r"\s+")


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / word-count / ratio features (SURVEY §2.B "Text stats").

    avg_word_len and stopword_ratio are integer-ratio divisions --
    bit-deterministic across engines.
    """
    w = words(text_col)
    n_words = F.size(w)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(w, lambda x: F.array_contains(stop_arr, x)))
    n_chars = F.length(text_col)
    n_alpha = F.length(F.regexp_replace(text_col, "[^A-Za-z]", ""))
    return df.withColumns(
        {
            "n_chars_calc": n_chars,
            "n_words": n_words,
            "avg_word_len": (n_alpha.cast("double") / n_words),
            "stopword_ratio": (n_stop.cast("double") / n_words),
            "alpha_ratio": (n_alpha.cast("double") / n_chars),
        }
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality score in [0,1]: penalize very short docs, low
    alpha ratio, and stopword-free word salad (C4/Gopher-style rules)."""
    scored = text_stats(df, text_col)
    len_ok = F.least(F.col("n_words").cast("double") / 50.0, F.lit(1.0))
    return scored.withColumn(
        "quality",
        (len_ok * 0.4 + F.col("alpha_ratio") * 0.3 + F.least(F.col("stopword_ratio") * 4, F.lit(1.0)) * 0.3),
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language ID: per-language marker ratio features +
    argmax prediction. Deterministic, SQL-expressible, one scan."""
    w = words(F.lower(F.col(text_col)))
    n_words = F.size(w)
    out = df
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        hits = F.size(F.filter(w, lambda x: F.array_contains(arr, x)))
        out = out.withColumn(f"score_{lang}", hits.cast("double") / n_words)
    best = None
    for lang in LANG_MARKERS:
        cond = F.lit(True)
        for other in LANG_MARKERS:
            if other != lang:
                cond = cond & (F.col(f"score_{lang}") >= F.col(f"score_{other}"))
        best = F.when(cond, lang) if best is None else best.when(cond, lang)
    return out.withColumn("predicted_lang", best.otherwise("unknown"))


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + a BPE-ish estimate: regex word/number/
    symbol pieces, plus chars/4 as the classic LLM rule-of-thumb."""
    return df.withColumns(
        {
            "ws_tokens": F.size(words(text_col)),
            "bpe_ish_tokens": F.regexp_count(F.col(text_col), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")),
            "approx_tokens_c4": F.ceil(F.length(text_col) / 4).cast("long"),
        }
    )


def tf_idf_top_terms(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3
) -> DataFrame:
    """Top-k most distinctive terms per document by term-frequency /
    document-frequency ratio (doc_id, term, tf, df, rnk).

    Score = tf/df -- a log-free tf-idf variant chosen deliberately:
    tf and df are small integers, and IEEE division of integers is
    correctly rounded in every engine, so the ranking (ordered by
    score desc, term asc) is bit-reproducible for an oracle. A
    production scorer would damp with ln(N/df); libm's ln is not
    correctly rounded across platforms, which only matters here
    because we verify value-exact cross-engine equality.

    Scale: explode -> two hash aggregations (doc-term tf, then term
    df; both partial-aggregate map-side) -> equi-join on term.
    Vocabulary is Zipf-skewed, so the term join is exactly the AQE
    skew-join case; the per-doc top-k window partitions by doc_id
    (well distributed). No Python anywhere.
    """
    from pyspark.sql.window import Window as W

    w = df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("term"),
    ).filter(F.col("term") != "")
    tf = w.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    win = W.partitionBy(id_col).orderBy(
        (F.col("tf").cast("double") / F.col("df")).desc(), F.col("term")
    )
    return (
        tf.join(dfreq, "term")
        .withColumn("rnk", F.row_number().over(win))
        .filter(F.col("rnk") <= k)
        .select(id_col, "term", "tf", "df", "rnk")
    )


# PII patterns kept to the regex subset with identical semantics in
# Java regex (Spark) and RE2 (DuckDB oracle): character classes,
# greedy quantifiers, \b -- no alternation, no backreferences, no
# lookaround (RE2 lacks lookaround; alternation differs between
# leftmost-first and leftmost-longest engines).
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\+?\d[\d() -]{7,}\d"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact emails, phone numbers, and IPv4 addresses from a text
    column -- the scrub step every LLM training pipeline runs before
    tokenization. Adds match counts per category and a ``redacted``
    column with placeholders substituted.

    Redaction order matters and is fixed: emails first (their local
    part may contain digit runs a phone pattern could claim), then
    phones, then IPs (never phone-claimed: dots are not in the phone
    character class).

    Scale: three ``regexp_replace`` + three ``regexp_extract_all``
    expressions, all JVM-side inside the scan stage -- zero shuffles,
    zero Python. At 100 TB this is scan-bound, exactly as cheap as a
    projection can be.
    """
    c = F.col(text_col)
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(c, PII_EMAIL, "[EMAIL]"), PII_PHONE, "[PHONE]"
        ),
        PII_IPV4,
        "[IP]",
    )
    return df.withColumns(
        {
            "n_emails": F.size(F.regexp_extract_all(c, F.lit(PII_EMAIL), F.lit(0))),
            "n_phones": F.size(F.regexp_extract_all(c, F.lit(PII_PHONE), F.lit(0))),
            "n_ips": F.size(F.regexp_extract_all(c, F.lit(PII_IPV4), F.lit(0))),
            "redacted": redacted,
        }
    )


def repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Within-document repetition signals (the Gopher repetition
    rules): fraction of duplicate words and duplicate word-bigrams.
    High values flag boilerplate/spam for removal before training.

    Ratios are integer divisions -- bit-deterministic across engines.

    Scale: pure array expressions (split / slice / zip_with /
    array_distinct) inside the scan stage; no shuffle, no Python.
    The word array is LET-BOUND via transform-over-a-singleton-array:
    referencing a plain column alias from several expressions makes
    Catalyst re-inline the (regex-split) computation into every use
    after projection collapse, but a lambda variable binds the array
    once per row. Measured 1.9x faster at sf0.1 than the naive form.
    """

    def _stats(w: Column) -> Column:
        n = F.size(w)
        bigrams = F.zip_with(
            F.slice(w, F.lit(1), n - 1),
            F.slice(w, F.lit(2), n - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        )
        return F.struct(
            n.alias("n_words"),
            (F.lit(1.0) - F.size(F.array_distinct(w)).cast("double") / n).alias(
                "dup_word_ratio"
            ),
            (
                F.lit(1.0)
                - F.size(F.array_distinct(bigrams)).cast("double") / F.size(bigrams)
            ).alias("dup_bigram_ratio"),
        )

    s = F.transform(F.array(words(text_col)), _stats)[0]
    return df.withColumns(
        {
            "n_words": s["n_words"],
            "dup_word_ratio": s["dup_word_ratio"],
            "dup_bigram_ratio": s["dup_bigram_ratio"],
        }
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 over whitespace/case-normalized text
    (exact-dedup key), plus a 64-bit rolling-style content hash
    (xxhash64 over the normalized word sequence)."""
    norm = F.concat_ws(" ", words(F.lower(F.trim(F.col(text_col)))))
    return df.withColumns(
        {
            "fp_md5": F.md5(norm),
            "fp_hash64": F.xxhash64(norm),
        }
    )


def token_rarity(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Corpus-statistical token rarity per document -- the CCNet-style
    quality signal that an in-document heuristic (quality_score)
    cannot provide: a fluent-looking doc of globally-rare gibberish
    tokens scores low here and nowhere else. Returns per doc:
    n_tokens, min_token_count (corpus frequency of the doc's rarest
    token), mean_token_count (exact integer sum, one IEEE division).

    Scale design: pass 1 computes the vocabulary histogram with a
    map-side-combining groupBy over the exploded token stream (Zipf:
    the result is tiny relative to the corpus). Pass 2 joins tokens
    to counts with the vocab BROADCAST -- the token stream itself is
    never shuffled by token (whose Zipf skew would hot-spot a
    reducer); the only shuffle is the per-doc partial aggregate keyed
    by id. At 100 TB with an open vocabulary, cap the broadcast at
    top-K tokens + a default count for the tail."""
    # words() keeps the empty token a leading/trailing whitespace
    # split produces; filter it so the histogram counts real tokens
    # only (the SQL oracle filters w <> '' identically).
    toks = df.select(
        F.col(id_col), F.explode(words(F.lower(F.col(text_col)))).alias("tok")
    ).filter(F.col("tok") != "")
    vocab = toks.groupBy("tok").agg(F.count("*").alias("cnt"))
    return (
        toks.join(F.broadcast(vocab), "tok")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.min("cnt").alias("min_token_count"),
            (
                F.sum(F.col("cnt").cast("decimal(18,0)")).cast("double")
                / F.count("*")
            ).alias("mean_token_count"),
        )
    )
