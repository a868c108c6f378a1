"""URL hygiene and per-domain caps: the provenance-based curation
steps of a crawl pipeline.

Web pipelines dedup and diversify by URL before they ever read the
text: tracking-parameter noise makes one page look like many
(breaking URL-level dedup), and without a per-domain cap a handful
of mega-sites dominate the corpus (the diversity rationale of the
public web-corpus builds — C4 keeps one page per URL, FineWeb caps
and balances by domain). All JVM expressions on Spark's built-in
``try_parse_url``:

- ``normalize_url`` — lowercase scheme/host, strip default ports and
  fragments, drop tracking parameters (utm_*, gclid, fbclid,
  ref/source tags), SORT the surviving query parameters (param order
  is not identity), drop a trailing "/" on bare paths. Two URLs of
  the same resource normalize to the same string — the key for
  exact URL dedup.
- ``registered_domain`` — the site identity for capping, resolved
  against the Public Suffix List (publicsuffix.org) rules: longest
  matching rule wins, ``*.`` wildcards consume one extra label,
  ``!`` exceptions override (the published algorithm). The bundled
  ``data/public_suffix_list.dat`` is the COMPLETE upstream file
  (ICANN + private sections, ~9.5k rules, as shipped by the Debian
  ``publicsuffix`` package), so unlisted-registry hosts
  (``foo.gov.bd``-style) resolve correctly by default; pass
  ``psl=PublicSuffixList.from_file(...)`` or an inline rule list to
  substitute a custom table. Two execution modes: small rule tables
  compile to pure JVM expressions (label-array slices + isin sets,
  whole-stage codegen); large tables — including the bundled
  default — switch to an Arrow-vectorized pandas UDF whose compiled
  rule sets ship once per executor (a ~9.5k-term when-chain would
  blow the JVM 64KB method limit out of codegen, so expr mode
  refuses tables over its budget).
- ``per_domain_cap`` — at most N documents per registered domain,
  chosen by a caller-supplied preference order with a deterministic
  id tie-break. The rank <= N filter compiles to WindowGroupLimit
  (plan-pinned): Spark keeps a map-side partial top-N per domain, so
  a mega-domain never funnels its millions of rows through one task
  just to discard all but N.
"""

from __future__ import annotations

import os
from typing import Iterable

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

_TRACKING_PREFIXES = ("utm_",)
_TRACKING_EXACT = ("gclid", "fbclid", "mc_cid", "mc_eid", "ref", "ref_src")

_BUNDLED_PSL = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "data",
    "public_suffix_list.dat",
)

# Above this many rules the codegen expression (one isin per rule
# depth) stops being reasonable and registered_domain switches to the
# Arrow-vectorized UDF path (mode="auto").
_EXPR_MODE_MAX_RULES = 800


class PublicSuffixList:
    """Parsed Public Suffix List rules (publicsuffix.org/list/).

    File format: UTF-8 lines; ``//`` comments and blank lines are
    skipped; a leading ``!`` marks an exception rule; a leading
    ``*.`` marks a wildcard rule. Matching (the published algorithm):
    a rule matches when its labels are a suffix of the host's labels
    (``*`` matches exactly one label); if any exception rule matches
    it prevails (its public suffix is the rule minus its leftmost
    label); otherwise the longest matching rule prevails; if no rule
    matches, the implicit default rule ``*`` does (public suffix =
    the last label). The registered (registrable) domain is the
    public suffix plus one more label."""

    def __init__(self, rules: Iterable[str]):
        exact: dict[int, set[str]] = {}
        wildcard: dict[int, set[str]] = {}
        exception: dict[int, set[str]] = {}
        for raw in rules:
            line = raw.strip()
            if not line or line.startswith("//"):
                continue
            line = line.split()[0].lower()  # spec: ignore trailing text
            if line.startswith("!"):
                body = line[1:]
                exception.setdefault(body.count(".") + 1, set()).add(body)
            elif line.startswith("*."):
                body = line[2:]
                wildcard.setdefault(body.count(".") + 1, set()).add(body)
            else:
                exact.setdefault(line.count(".") + 1, set()).add(line)
        self.exact = {d: frozenset(s) for d, s in exact.items()}
        self.wildcard = {d: frozenset(s) for d, s in wildcard.items()}
        self.exception = {d: frozenset(s) for d, s in exception.items()}
        self.n_rules = sum(
            len(s)
            for m in (self.exact, self.wildcard, self.exception)
            for s in m.values()
        )

    @classmethod
    def from_file(cls, path: str) -> "PublicSuffixList":
        with open(path, encoding="utf-8") as fh:
            return cls(fh)

    @classmethod
    def bundled(cls) -> "PublicSuffixList":
        return cls.from_file(_BUNDLED_PSL)

    def suffix_label_count(self, labels: list[str]) -> int:
        """Number of labels in the prevailing public suffix of a host
        split into ``labels`` (lowercase)."""
        n = len(labels)
        # Deepest exception wins when several match (possible only in
        # a custom table; upstream never overlaps exceptions) -- the
        # expr chain applies exceptions ascending with overwrite, so
        # descending-first-match here keeps the two modes bit-equal.
        for d in sorted(self.exception, reverse=True):
            if d <= n and ".".join(labels[n - d :]) in self.exception[d]:
                return d - 1
        best = 1  # implicit default rule "*"
        for d, rules in self.exact.items():
            if d > best and d <= n and ".".join(labels[n - d :]) in rules:
                best = d
        for d, rules in self.wildcard.items():
            if d + 1 > best and d < n and ".".join(labels[n - d :]) in rules:
                best = d + 1
        return best

    def registered_domain_of(self, host: str | None) -> str | None:
        """Driver/Python-side twin of the Column function (the UDF
        path maps this). Host that IS a public suffix falls back to
        itself -- capping needs a non-null identity (documented)."""
        if host is None:
            return None
        labels = host.lower().strip().split(".")
        k = self.suffix_label_count(labels)
        if len(labels) > k:
            return ".".join(labels[-(k + 1) :])
        return ".".join(labels)


_bundled_cache: PublicSuffixList | None = None


def _bundled() -> PublicSuffixList:
    global _bundled_cache
    if _bundled_cache is None:
        _bundled_cache = PublicSuffixList.bundled()
    return _bundled_cache


def _is_tracking(p: Column) -> Column:
    name = F.split(p, "=").getItem(0)
    cond = F.lit(False)
    for pre in _TRACKING_PREFIXES:
        cond = cond | name.startswith(pre)
    for exact in _TRACKING_EXACT:
        cond = cond | (name == F.lit(exact))
    return cond


def normalize_url(col: Column | str) -> Column:
    """The canonical form of a URL (see module docstring). Null-safe:
    null stays null; a URL try_parse_url cannot handle yields a
    lowercased-trimmed fallback rather than null (conservative — a
    weird URL still gets a stable key)."""
    c = F.col(col) if isinstance(col, str) else col
    raw = F.trim(c)
    scheme = F.lower(F.regexp_extract(raw, r"^([A-Za-z][A-Za-z0-9+.-]*):", 1))
    host = F.lower(F.try_parse_url(raw, F.lit("HOST")))
    host = F.regexp_replace(host, r":(80|443)$", "")
    path = F.coalesce(F.try_parse_url(raw, F.lit("PATH")), F.lit(""))
    path = F.when(path == "/", F.lit("")).otherwise(path)
    query = F.try_parse_url(raw, F.lit("QUERY"))
    kept = F.array_sort(
        F.filter(
            F.split(F.coalesce(query, F.lit("")), "&"),
            lambda p: (p != F.lit("")) & ~_is_tracking(p),
        )
    )
    qs = F.when(
        F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))
    ).otherwise(F.lit(""))
    normalized = F.concat(scheme, F.lit("://"), host, path, qs)
    return F.when(c.isNull(), F.lit(None)).otherwise(
        F.when(host.isNotNull() & (scheme != ""), normalized).otherwise(
            F.lower(raw)
        )
    )


def _registered_domain_expr(host: Column, psl: PublicSuffixList) -> Column:
    """Pure-JVM PSL resolution: compute the prevailing suffix label
    count as a when-chain over rule depths (ascending, so a deeper
    match overwrites a shallower one == longest-rule-wins), apply
    exceptions last (they beat everything), then slice the label
    array. Whole-stage-codegen-able; sized for rule tables up to
    ``_EXPR_MODE_MAX_RULES``."""
    labels = F.split(host, r"\.")
    n = F.size(labels)

    def last_d(d: int) -> Column:
        # slice() raises on start <= 0 and `&` conditions evaluate
        # both sides, so clamp for hosts shorter than the rule: the
        # clamped string then has fewer dots than any depth-d rule
        # and can never match, which the (n >= d) guard asserts too.
        return F.concat_ws(
            ".", F.slice(labels, F.greatest(n - F.lit(d - 1), F.lit(1)), d)
        )

    slen = F.lit(1)  # implicit default rule "*"
    for d in sorted(psl.exact):
        if d > 1:  # depth-1 exact rules coincide with the default
            slen = F.when(
                (n >= d) & last_d(d).isin(*sorted(psl.exact[d])), F.lit(d)
            ).otherwise(slen)
    for d in sorted(psl.wildcard):
        # Longest-rule-wins ACROSS rule kinds: a depth-d wildcard
        # yields a suffix of d+1 labels and must not downgrade an
        # already-matched deeper exact rule (spec: the longest
        # matching rule prevails; the Python twin suffix_label_count
        # takes the max the same way). Guarding slen < d+1 keeps the
        # two execution modes bit-identical on overlapping tables
        # like {c.d, a.b.c.d, *.c.d} for host x.a.b.c.d.
        slen = F.when(
            (n > d)
            & (slen < F.lit(d + 1))
            & last_d(d).isin(*sorted(psl.wildcard[d])),
            F.lit(d + 1),
        ).otherwise(slen)
    for d in sorted(psl.exception):
        slen = F.when(
            (n >= d) & last_d(d).isin(*sorted(psl.exception[d])), F.lit(d - 1)
        ).otherwise(slen)
    return F.when(
        n > slen, F.concat_ws(".", F.slice(labels, n - slen, slen + 1))
    ).otherwise(host)


def registered_domain(
    col: Column | str,
    psl: PublicSuffixList | None = None,
    mode: str = "auto",
) -> Column:
    """Site identity from a URL or bare host: the PSL registrable
    domain (public suffix + one label). A host that IS a public
    suffix maps to itself rather than null — capping and split keys
    need a total identity. ``mode``: "expr" (JVM when-chain),
    "udf" (Arrow-vectorized, for the full ~9k-rule PSL), or "auto"
    (expr while the table fits ``_EXPR_MODE_MAX_RULES``)."""
    c = F.col(col) if isinstance(col, str) else col
    psl = psl or _bundled()
    host = F.lower(F.coalesce(F.try_parse_url(F.trim(c), F.lit("HOST")), F.trim(c)))
    if mode == "auto":
        mode = "expr" if psl.n_rules <= _EXPR_MODE_MAX_RULES else "udf"
    if mode == "expr":
        if psl.n_rules > _EXPR_MODE_MAX_RULES:
            # A ~9.5k-term when-chain blows the JVM's 64KB method
            # limit and falls out of codegen into interpreted
            # evaluation -- strictly worse than the Arrow UDF at any
            # scale. Refuse rather than quietly build it.
            raise ValueError(
                f"expr mode is sized for <= {_EXPR_MODE_MAX_RULES} rules "
                f"(got {psl.n_rules}); use mode='udf' (or 'auto') for "
                "large tables like the bundled complete PSL"
            )
        return _registered_domain_expr(host, psl)
    if mode != "udf":
        raise ValueError(f"mode must be auto|expr|udf, got {mode!r}")

    @F.pandas_udf("string")
    def _reg(hosts: pd.Series) -> pd.Series:
        # psl rides the task closure: compiled frozensets serialize
        # once per executor, probes are O(#label-depths) dict lookups
        return hosts.map(psl.registered_domain_of)

    return _reg(host)


def per_domain_cap(
    df: DataFrame,
    url_col: str = "url",
    max_per_domain: int = 1000,
    order_col: str | None = None,
    id_col: str = "doc_id",
    psl: PublicSuffixList | None = None,
) -> DataFrame:
    """At most ``max_per_domain`` rows per registered domain,
    preferring high ``order_col`` (e.g. a quality score; ``None`` =
    hash order, an unbiased sample) with a deterministic ``id_col``
    tie-break. Adds a ``domain`` column; the rank filter compiles to
    WindowGroupLimit so mega-domains prune map-side."""
    if max_per_domain < 1:
        raise ValueError(f"max_per_domain must be >= 1, got {max_per_domain}")
    keyed = df.withColumn("domain", registered_domain(url_col, psl=psl))
    order = (
        [F.desc(order_col), F.asc(id_col)]
        if order_col
        else [F.asc(F.xxhash64(F.col(id_col))), F.asc(id_col)]
    )
    rank = F.row_number().over(W.partitionBy("domain").orderBy(*order))
    return (
        keyed.withColumn("_rn", rank)
        .filter(F.col("_rn") <= max_per_domain)
        .drop("_rn")
    )
