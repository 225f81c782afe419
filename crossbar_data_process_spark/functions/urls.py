"""URL canonicalization — the key-normalization step of URL-level dedup
and source bucketing in web-corpus curation (Dolma/RefinedWeb dedup by
canonical URL before any content pass). Pure JVM regexp Column
expressions: scan-side, zero extra passes, no Python.

Canonical form: lowercase scheme+host, default ports dropped, fragment
dropped, tracking query parameters (utm_*, gclid, fbclid, ref) dropped
(other parameters KEPT, sorted is deliberately NOT done — parameter order
is semantic for some sites and a stable input yields a stable key
anyway), trailing slash trimmed, scheme defaulted to https so http/https
duplicates of the same page collide.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Anchored to a query-string delimiter so parameter names that merely
# CONTAIN a tracking name (href=, xref=) and path segments like
# /ref=sr_1 never match (an unanchored form collided distinct pages —
# URL-keyed dedup would silently delete distinct documents). The
# delimiter is captured and kept; separator debris ("?&", "&&") is
# collapsed afterwards.
_TRACKING = r"(?i)([?&])(?:utm_[a-z0-9_]+|gclid|fbclid|ref)=[^&#]*"


def canonicalize_url(col: Column | str) -> Column:
    """Canonical dedup key for a URL column (see module docstring).
    NULL-safe; whitespace-trimmed; non-URL junk passes through lowercased
    (still a stable key)."""
    c = F.trim(F.col(col) if isinstance(col, str) else col)
    c = F.regexp_replace(c, r"^(?i)(https?)://", "https://")
    # scheme://HOST is case-insensitive; path/query are not — lowercase
    # only the scheme+authority part
    scheme_host = F.lower(F.regexp_extract(c, r"^(https://[^/?#]*)", 1))
    rest = F.regexp_replace(c, r"^https://[^/?#]*", "")
    c = F.when(scheme_host == "", F.lower(c)).otherwise(
        F.concat(scheme_host, rest)
    )
    c = F.regexp_replace(c, r"^(https://[^/?#]*):(?:80|443)(?=[/?#]|$)", "$1")
    c = F.regexp_replace(c, r"#.*$", "")                       # fragment
    c = F.regexp_replace(c, _TRACKING, "$1")                   # tracking params
    c = F.regexp_replace(c, r"&{2,}", "&")                     # a&&b → a&b
    c = F.regexp_replace(c, r"\?&", "?")                       # ?&k → ?k
    c = F.regexp_replace(c, r"[?&]$", "")                      # dangling ? / &
    c = F.regexp_replace(c, r"/+(?=\?|$)", "")                 # trailing slash
    return c


def url_host(col: Column | str) -> Column:
    """Lowercased registrable host (www. stripped) — the source-bucketing
    key for per-domain caps and mixes. NULL for values with no host."""
    c = F.trim(F.col(col) if isinstance(col, str) else col)
    h = F.lower(F.regexp_extract(c, r"^(?i)https?://([^/?#:]+)", 1))
    h = F.regexp_replace(h, r"^www\.", "")
    return F.when(h == "", F.lit(None).cast("string")).otherwise(h)
