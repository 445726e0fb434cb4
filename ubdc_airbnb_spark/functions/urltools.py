"""URL canonicalization (north-star: URL-level dedup, the first and
cheapest dedup pass of every web-crawl curation pipeline).

Crawls see the same page under many spellings: mixed-case hosts,
tracking parameters (utm_*, fbclid, gclid, ...), fragments, unstable
query-parameter order, trailing slashes. Canonicalizing before the
content-level passes (exact digest, MinHash) removes the bulk of
duplicates for the cost of a narrow projection — zero shuffle, zero UDF:
everything below is regexp/array expressions that mean the same thing in
Spark and DuckDB, so the oracle replays the canonical form
character-for-character.

Canonical form: lowercase scheme+host, fragment dropped, tracking
params dropped, remaining params sorted by name, trailing slash
stripped from the path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: tracking parameters stripped during canonicalization (prefix match
#: for utm_*; exact match otherwise) — shared with the oracle SQL
TRACKING_PREFIXES = ("utm_",)
TRACKING_PARAMS = ("fbclid", "gclid", "msclkid", "ref", "mc_cid", "mc_eid")


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def url_scheme_host(col: Column | str) -> Column:
    """``scheme://host`` lowercased (host compare is case-insensitive)."""
    return F.lower(F.regexp_extract(_c(col), r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1))


def url_path(col: Column | str) -> Column:
    """Path with any trailing slash stripped (empty path stays empty)."""
    p = F.regexp_extract(_c(col), r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    return F.regexp_replace(p, r"/$", "")


def _is_tracking(p: Column) -> Column:
    name = F.split(p, "=")[0]
    cond = F.lit(False)
    for pref in TRACKING_PREFIXES:
        cond = cond | name.startswith(pref)
    for exact in TRACKING_PARAMS:
        cond = cond | (name == exact)
    return cond


def url_sorted_params(col: Column | str) -> Column:
    """Query parameters minus tracking params, sorted by full ``k=v``
    text (deterministic, engine-identical ordering); '' when none."""
    q = F.regexp_extract(_c(col), r"\?([^#]*)", 1)
    parts = F.filter(
        F.split(q, "&"),
        lambda p: (p != "") & ~_is_tracking(p),
    )
    return F.array_join(F.array_sort(parts), "&")


def canonical_url(col: Column | str) -> Column:
    """The full canonical form (see module docstring)."""
    params = url_sorted_params(col)
    return F.concat(
        url_scheme_host(col),
        url_path(col),
        F.when(params == "", F.lit("")).otherwise(F.concat(F.lit("?"), params)),
    )
