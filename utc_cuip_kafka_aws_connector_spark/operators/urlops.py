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
- ``registered_domain`` — the site identity for capping: last two
  host labels, three under the common two-level public suffixes
  (co.uk-style, the short built-in list; a full public-suffix table
  is a data file, not an algorithm change — documented limitation).
- ``per_domain_cap`` — at most N documents per registered domain,
  chosen by a caller-supplied preference order with a deterministic
  id tie-break. The rank <= N filter compiles to WindowGroupLimit
  (plan-pinned): Spark keeps a map-side partial top-N per domain, so
  a mega-domain never funnels its millions of rows through one task
  just to discard all but N.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

_TRACKING_PREFIXES = ("utm_",)
_TRACKING_EXACT = ("gclid", "fbclid", "mc_cid", "mc_eid", "ref", "ref_src")

# common two-level public suffixes (the high-traffic subset; a full
# PSL is a lookup-table swap)
_TWO_LEVEL = (
    "co.uk", "ac.uk", "gov.uk", "org.uk", "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au", "co.nz", "com.br", "com.cn",
    "com.mx", "co.in", "co.kr", "com.tr", "com.sg", "co.za",
)


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


def registered_domain(col: Column | str) -> Column:
    """Site identity from the host: last 2 labels, or last 3 when the
    last 2 form a known two-level public suffix."""
    c = F.col(col) if isinstance(col, str) else col
    host = F.lower(F.coalesce(F.try_parse_url(F.trim(c), F.lit("HOST")), F.trim(c)))
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(
        ".", F.element_at(labels, -2), F.element_at(labels, -1)
    )
    take3 = last2.isin(*_TWO_LEVEL) & (n >= 3)
    return F.when(
        n <= 2, host
    ).otherwise(
        F.when(
            take3,
            F.concat_ws(
                ".",
                F.element_at(labels, -3),
                F.element_at(labels, -2),
                F.element_at(labels, -1),
            ),
        ).otherwise(last2)
    )


def per_domain_cap(
    df: DataFrame,
    url_col: str = "url",
    max_per_domain: int = 1000,
    order_col: str | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """At most ``max_per_domain`` rows per registered domain,
    preferring high ``order_col`` (e.g. a quality score; ``None`` =
    hash order, an unbiased sample) with a deterministic ``id_col``
    tie-break. Adds a ``domain`` column; the rank filter compiles to
    WindowGroupLimit so mega-domains prune map-side."""
    if max_per_domain < 1:
        raise ValueError(f"max_per_domain must be >= 1, got {max_per_domain}")
    keyed = df.withColumn("domain", registered_domain(url_col))
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
