"""Conversation (chat/SFT) dataset operators — instruction-tuning
corpora ship as turn lists (OpenAI chat format, ShareGPT, OASST:
``array<struct<role, content>>``), and curating them needs the same
primitives the document tables already have: schema validation,
deterministic flat rendering, per-turn statistics, fingerprint dedup,
and token-budget truncation.

Everything here is pure higher-order-function codegen
(``transform`` / ``filter`` / ``exists`` / ``aggregate`` /
``zip_with`` over the turns array) — zero UDFs, zero explodes on the
hot path, so a conversation never leaves its row and the ops are
embarrassingly parallel scans. Per-turn work is O(n_turns) per row
(the budget truncation's running sum is O(n_turns^2) HOF steps, fine
at real turn counts); nothing shuffles except the dedup's final
per-fingerprint window.

Column contract: ``turns_col`` is ``array<struct<role: string,
content: string>>``; a NULL array is treated as empty.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

#: unit / record separators: cannot collide with visible text the way
#: a printable join token would
_FS = "\x1f"
_RS = "\x1e"

_TEMPLATES = ("chatml", "plain")


def _turns(turns_col: str) -> Column:
    return F.coalesce(
        F.col(turns_col),
        F.expr("CAST(array() AS array<struct<role:string,content:string>>)"),
    )


def conversation_flags(
    df: DataFrame,
    turns_col: str = "turns",
    roles: tuple[str, ...] = ("system", "user", "assistant"),
) -> DataFrame:
    """Adds boolean quality flags per conversation plus ``cv_valid``
    (their conjunction-of-negations):

    - ``cv_empty``: no turns (or NULL array),
    - ``cv_unknown_role``: a role outside ``roles`` (or NULL),
    - ``cv_empty_content``: a NULL or whitespace-only content,
    - ``cv_system_misplaced``: a ``system`` turn after position 1,
    - ``cv_broken_alternation``: two consecutive NON-system turns
      with the same role (the user/assistant ping-pong contract),
    - ``cv_first_not_user``: the first non-system turn is not
      ``user``,
    - ``cv_last_not_assistant``: the final turn is not ``assistant``
      (an SFT example must end with the thing being imitated).

    Structural flags other than ``cv_empty`` are False on empty
    conversations — each defect is counted once, so a data card can
    sum the columns without double-booking. One codegen projection;
    no shuffle."""
    t = _turns(turns_col)
    n = F.size(t)
    empty = n == 0
    role_set = F.array(*[F.lit(r) for r in roles])
    unknown = F.exists(
        t, lambda x: ~F.coalesce(F.array_contains(role_set, x.role), F.lit(False))
    )
    blank = F.exists(
        t, lambda x: F.coalesce(F.trim(x.content), F.lit("")) == ""
    )
    sys_misplaced = F.exists(
        F.slice(t, 2, F.greatest(n - 1, F.lit(0))),
        lambda x: x.role == "system",
    )
    body = F.filter(t, lambda x: x.role != "system")
    nb = F.size(body)
    broken = F.exists(
        F.zip_with(
            F.slice(body, 1, F.greatest(nb - 1, F.lit(0))),
            F.slice(body, 2, F.greatest(nb - 1, F.lit(0))),
            lambda a, b: a.role.eqNullSafe(b.role),
        ),
        lambda x: x,
    )
    first_not_user = (nb > 0) & (
        ~F.try_element_at(body, F.lit(1)).role.eqNullSafe(F.lit("user"))
    )
    last_not_assistant = (n > 0) & (
        ~F.try_element_at(t, F.lit(-1)).role.eqNullSafe(F.lit("assistant"))
    )
    flags = {
        "cv_empty": empty,
        "cv_unknown_role": ~empty & unknown,
        "cv_empty_content": ~empty & blank,
        "cv_system_misplaced": ~empty & sys_misplaced,
        "cv_broken_alternation": ~empty & broken,
        "cv_first_not_user": ~empty & first_not_user,
        "cv_last_not_assistant": ~empty & last_not_assistant,
    }
    out = df
    for name, col in flags.items():
        out = out.withColumn(name, col)
    return out.withColumn(
        "cv_valid",
        ~flags["cv_empty"]
        & ~flags["cv_unknown_role"]
        & ~flags["cv_empty_content"]
        & ~flags["cv_system_misplaced"]
        & ~flags["cv_broken_alternation"]
        & ~flags["cv_first_not_user"]
        & ~flags["cv_last_not_assistant"],
    )


def render_chat(
    df: DataFrame,
    turns_col: str = "turns",
    template: str = "chatml",
    out_col: str = "text",
) -> DataFrame:
    """Deterministic flat-text rendering of the turn list — the
    string the tokenizer tier (bpetrain/bytelevel/encode) consumes.

    ``chatml``: ``<|im_start|>role\\ncontent<|im_end|>\\n`` per turn;
    ``plain``: ``role: content`` joined by blank lines. NULL content
    renders as the empty string (the validator flags it; rendering
    must not throw). Empty conversations render as ``""``."""
    if template not in _TEMPLATES:
        raise ValueError(
            f"template must be one of {_TEMPLATES}, got {template!r}"
        )
    t = _turns(turns_col)
    content = lambda x: F.coalesce(x.content, F.lit(""))  # noqa: E731
    role = lambda x: F.coalesce(x.role, F.lit(""))  # noqa: E731
    if template == "chatml":
        rendered = F.array_join(
            F.transform(
                t,
                lambda x: F.concat(
                    F.lit("<|im_start|>"),
                    role(x),
                    F.lit("\n"),
                    content(x),
                    F.lit("<|im_end|>\n"),
                ),
            ),
            "",
        )
    else:
        rendered = F.array_join(
            F.transform(
                t, lambda x: F.concat(role(x), F.lit(": "), content(x))
            ),
            "\n\n",
        )
    return df.withColumn(out_col, rendered)


def conversation_stats(
    df: DataFrame, turns_col: str = "turns"
) -> DataFrame:
    """Adds per-conversation size columns: ``n_turns``, per-role turn
    counts (``n_system``/``n_user``/``n_assistant``), ``total_chars``,
    ``assistant_chars`` (the imitation-target payload — the column
    length filters should gate on), and ``ws_tokens`` (whitespace
    token count over all contents, the packing/budget estimator used
    across the curation tier). One codegen projection."""
    t = _turns(turns_col)

    def role_count(r: str) -> Column:
        return F.size(F.filter(t, lambda x: x.role.eqNullSafe(F.lit(r))))

    def chars(arr: Column) -> Column:
        return F.aggregate(
            F.transform(
                arr, lambda x: F.length(F.coalesce(x.content, F.lit("")))
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    tokens = F.aggregate(
        F.transform(t, lambda x: _ws_tokens(x.content)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return (
        df.withColumn("n_turns", F.size(t))
        .withColumn("n_system", role_count("system"))
        .withColumn("n_user", role_count("user"))
        .withColumn("n_assistant", role_count("assistant"))
        .withColumn("total_chars", chars(t))
        .withColumn(
            "assistant_chars",
            chars(F.filter(t, lambda x: x.role.eqNullSafe(F.lit("assistant")))),
        )
        .withColumn("ws_tokens", tokens)
    )


def _ws_tokens(content: Column) -> Column:
    """Whitespace token count of one content string; 0 for NULL or
    whitespace-only (the shared arrayops.ws_tokens convention)."""
    from utc_cuip_kafka_aws_connector_spark.operators.arrayops import (
        ws_tokens,
    )

    return F.size(ws_tokens(content)).cast("long")


def _norm(content: Column) -> Column:
    return F.regexp_replace(
        F.lower(F.trim(F.coalesce(content, F.lit("")))), r"\s+", " "
    )


def conversation_fingerprint(
    df: DataFrame,
    turns_col: str = "turns",
    out_col: str = "conv_fp",
    last_user_col: str | None = None,
) -> DataFrame:
    """Adds a 64-bit fingerprint of the normalized (role, content)
    SEQUENCE — lowercase, trimmed, whitespace-collapsed contents,
    joined with non-printable separators so reordered or re-split
    turns hash differently but cosmetic whitespace does not. When
    ``last_user_col`` is given, also fingerprints the final user
    turn's normalized content alone (prompt-level dedup: the same
    question answered twice should collide there, NULL when no user
    turn). Same xxhash64 family as the document dedup tier."""
    t = _turns(turns_col)
    seq = F.array_join(
        F.transform(
            t,
            lambda x: F.concat(
                F.coalesce(x.role, F.lit("")), F.lit(_FS), _norm(x.content)
            ),
        ),
        _RS,
    )
    out = df.withColumn(out_col, F.xxhash64(seq))
    if last_user_col is not None:
        users = F.filter(t, lambda x: x.role.eqNullSafe(F.lit("user")))
        out = out.withColumn(
            last_user_col,
            F.when(
                F.size(users) > 0,
                F.xxhash64(_norm(F.try_element_at(users, F.lit(-1)).content)),
            ),
        )
    return out


def dedup_conversations(
    df: DataFrame,
    id_col: str,
    turns_col: str = "turns",
    fp_col: str = "conv_fp",
) -> DataFrame:
    """One row per conversation fingerprint — smallest ``id_col``
    wins (deterministic, the q40 exact-dedup convention). One hash
    shuffle on the fingerprint; the fingerprint column stays on the
    output for lineage."""
    w = W.partitionBy(fp_col).orderBy(F.col(id_col).asc())
    return (
        conversation_fingerprint(df, turns_col, out_col=fp_col)
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .drop("__rk")
    )


def truncate_to_budget(
    df: DataFrame,
    max_tokens: int,
    turns_col: str = "turns",
    out_col: str | None = None,
) -> DataFrame:
    """Keeps the longest PREFIX of turns whose cumulative whitespace
    token count fits ``max_tokens`` (never splits inside a turn — a
    half-truncated assistant answer is worse training data than a
    shorter conversation). Because per-turn counts are non-negative
    the cumulative sum is monotone, so the index filter yields
    exactly a prefix. A first turn larger than the budget yields an
    empty conversation (flagged by the validator downstream, never
    silently clipped mid-turn). In place unless ``out_col`` names a
    separate output column."""
    if max_tokens < 0:
        raise ValueError(f"max_tokens must be >= 0, got {max_tokens}")
    t = _turns(turns_col)
    counts = F.transform(t, lambda x: _ws_tokens(x.content))

    def cum_through(i: Column) -> Column:
        return F.aggregate(
            F.slice(counts, 1, i + 1),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    kept = F.filter(t, lambda _, i: cum_through(i) <= max_tokens)
    return df.withColumn(out_col or turns_col, kept)
