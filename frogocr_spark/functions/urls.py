"""URL canonicalization for web-corpus curation.

A web-scale training pipeline dedups fetch candidates and training
documents at the URL level BEFORE any content pass: the same page
arrives as ``http``/``https``, with/without ``www.``, with default
ports, trailing slashes, fragments, and tracking parameters
(``utm_*``, ``ref``, ``fbclid``, ``gclid``).  :func:`canonical_url`
collapses those variants to one canonical form; :func:`url_domain`
extracts the host for per-domain caps and stats.

Everything is a pure column expression over Spark's built-in
``parse_url`` (JVM-side, whole-stage codegen) + array ops — the 100 TB
corpus side is never shuffled for canonicalization.  The reference has
no URL surface (its inputs are SMB paths — Source/Core/SambaClient.cpp);
this module is part of the training-data-pipeline extension the brief
asks for.

Canonical form:

- scheme lowercased
- host lowercased, leading ``www.`` stripped; only the scheme's
  DEFAULT port is dropped (``http:80`` / ``https:443``) — a
  non-default port is a different origin serving different content
  and must survive canonicalization (URL-level dedup would otherwise
  merge distinct documents)
- path: trailing slashes stripped (root collapses to empty)
- query: parameters split on ``&``, tracking params dropped, the rest
  sorted (order-insensitive compare), rejoined; empty → no ``?``
- fragment dropped
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tracking parameters dropped from the canonical query string
TRACKING_PARAM_RE = r"^(utm_[^=]*|ref|fbclid|gclid)="


def url_domain(url: Column) -> Column:
    """Lowercased host with any leading ``www.`` stripped (the
    per-domain grouping key for caps/stats)."""
    host = F.lower(F.parse_url(url, F.lit("HOST")))
    return F.regexp_replace(host, r"^www\.", "")


def canonical_url(url: Column) -> Column:
    """Canonical form of ``url`` (module doc); null stays null."""
    scheme = F.lower(F.parse_url(url, F.lit("PROTOCOL")))
    auth = F.lower(F.parse_url(url, F.lit("AUTHORITY")))
    port = F.regexp_extract(auth, r":(\d+)$", 1)
    bare_host = F.regexp_replace(F.regexp_replace(auth, r":\d+$", ""),
                                 r"^www\.", "")
    default_port = ((scheme == "http") & (port == "80")) | \
                   ((scheme == "https") & (port == "443"))
    host = F.concat(
        bare_host,
        F.when((port != "") & ~default_port,
               F.concat(F.lit(":"), port)).otherwise(F.lit("")))
    path = F.regexp_replace(F.parse_url(url, F.lit("PATH")), r"/+$", "")
    q = F.parse_url(url, F.lit("QUERY"))
    params = F.array_sort(F.filter(
        F.split(F.coalesce(q, F.lit("")), "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE)))
    query = F.when(F.size(params) > 0,
                   F.concat(F.lit("?"), F.array_join(params, "&"))
                   ).otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), host, path, query)
