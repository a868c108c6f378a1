"""Shared JVM array-expression kernels.

One home for the sliding-window gram builder every n-gram surface in
the repo uses (ngramlm counts, setjoin shingles, dsir/decontam hashed
grams, langid char grams), in the shape that does NOT trip Spark's
higher-order-function re-evaluation trap:

A ``transform(sequence(...), lambda i: f(slice(arr, i, n)))`` lambda
re-evaluates every CAPTURED subexpression per element — Catalyst does
no common-subexpression elimination inside HOF lambdas — so when
``arr`` is itself a tokenize/normalize chain (split + regexp + filter
+ transform), that chain runs once per gram POSITION: O(len) extra
evaluations per row, measured 10-20x wall-clock on real documents
(langid at sf0.1 went 74 s -> 7.5 s when fixed, r14). The safe shape
is ``arrays_zip`` of n shifted slices: ``arr`` is evaluated n+1 times
per ROW (once per slice + size), and the lambda touches only its own
zipped element.

(The other safe idiom, used by operators/text.py's repetition stats:
wrap the expensive array in a single-element array so the lambda's
ELEMENT is the whole thing — right when one lambda needs the full
array, while this module's shape is right for per-window output.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def sliding_grams(arr: Column, n: int, sep: str = " ") -> Column:
    """All length-``n`` windows of ``arr`` joined with ``sep``, in
    order. Arrays shorter than ``n`` yield ``[]`` (callers wanting a
    truncated-tail convention wrap with their own ``when``).
    ``n == 1`` is the identity on string arrays.

    Elements are assumed non-null (every caller builds ``arr`` from
    split/filter chains that cannot produce null elements);
    ``concat_ws`` would silently skip a null where ``concat`` would
    propagate it."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if n == 1:
        return arr
    width = F.greatest(F.size(arr) - F.lit(n - 1), F.lit(0))
    shifted = F.arrays_zip(*[F.slice(arr, k, width) for k in range(1, n + 1)])
    return F.transform(
        shifted,
        lambda s: F.concat_ws(sep, *[s[str(k)] for k in range(n)]),
    )


def ws_tokens(col: Column) -> Column:
    """Whitespace tokenization as the repo's ONE convention:
    ``\\s+``-split of the null-coalesced string with empty elements
    filtered, so empty/NULL text yields ``[]`` (a bare split would
    yield ``[""]``). Shared by the r16 example-manufacturing tier
    (crops/corruption/perturb), diversity, tokeval, and the
    conversation stats — one place to change what "a word" means."""
    return F.filter(
        F.split(F.coalesce(col, F.lit("")), r"\s+"),
        lambda w: w != "",
    )
