"""URL canonicalization for crawl processing.

Re-crawls and mirrors record the same page under cosmetically different
URLs; canonicalizing BEFORE url-keyed dedup/diff/bucketing is the standard
first normalization pass on a web corpus. All steps are codegen
regexp/string expressions (no UDF), and every pattern avoids lookarounds so
the DuckDB oracle (RE2) replays them verbatim:

1. lowercase scheme + host (path/query case is preserved — it is
   significant on most servers);
2. strip the fragment (`#...` never reaches the server);
3. strip default ports (`:80` for http, `:443` for https);
4. drop tracking query params (utm_*, gclid, fbclid), then a now-empty
   query string entirely;
5. collapse duplicate slashes in the PATH only (query preserved);
6. strip one trailing slash from a non-root path.

Deliberately NOT done: query-param reordering (changes semantics on some
endpoints and needs a full parse) and percent-decoding (lossy). Both are
documented trade-offs, not omissions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_TRACKING = r"(utm_[a-z]+|gclid|fbclid)=[^&#]*"
_BIG = 2_000_000_000


def canonicalize_url_col(col: Column) -> Column:
    u = F.coalesce(col, F.lit(""))
    # 1. lowercase the scheme://host[:port] prefix only
    head = F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1)
    u = F.concat(F.lower(head), F.substring(u, F.length(head) + 1, _BIG))
    # 2. fragment
    u = F.regexp_replace(u, r"#.*$", "")
    # 3. default ports
    u = F.regexp_replace(u, r"^(http://[^/:?#]+):80([/?]|$)", r"$1$2")
    u = F.regexp_replace(u, r"^(https://[^/:?#]+):443([/?]|$)", r"$1$2")
    # 4. tracking params in any position, then a dangling '?' or '&'
    u = F.regexp_replace(u, r"\?" + _TRACKING + r"&", "?")
    u = F.regexp_replace(u, r"&" + _TRACKING, "")
    u = F.regexp_replace(u, r"\?" + _TRACKING + r"$", "")
    u = F.regexp_replace(u, r"\?$", "")
    # 5. duplicate slashes in the path only: split off scheme and query
    #    first (a '//' inside ?next=http://... must survive)
    pre = F.regexp_extract(u, r"^([^?]*)", 1)
    query = F.substring(u, F.length(pre) + 1, _BIG)
    scheme = F.regexp_extract(pre, r"^([a-z][a-z0-9+.-]*://)", 1)
    path_part = F.substring(pre, F.length(scheme) + 1, _BIG)
    u = F.concat(scheme, F.regexp_replace(path_part, r"//+", "/"), query)
    # 6. one trailing slash on a non-root path (with or without a query)
    u = F.regexp_replace(
        u, r"^([a-z][a-z0-9+.-]*://[^/?#]+(/[^?#]*[^/?#])?)/(\?|$)", r"$1$3"
    )
    return u
