"""Web/url operators for crawl-scale pipelines.

The reference's scan surface is keyed by URL (CDX ``url`` patterns,
collapse=urlkey dedup — /root/reference/src/common_crawl_index.cpp); a
training-data pipeline consuming those scans needs the next step: URL
CANONICALIZATION, so that the same page fetched under trivially-different
URLs (scheme/host case, default ports, tracking parameters, fragment,
trailing slash, parameter order) deduplicates to one key — the same
normalization family CDX servers apply server-side as "urlkey"/SURT.

Everything is built from JVM-side expressions (``parse_url`` + array
functions) — no Python in the hot path; at 100 TB this is a map-only
column derivation that whole-stage codegen fuses into the scan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Query parameters that never identify content (tracking/click IDs).
TRACKING_PARAMS = ("utm_", "fbclid", "gclid", "msclkid", "mc_eid", "igshid")


def _upper_pct_escapes(c: Column) -> Column:
    """Uppercase the hex digits of every %-escape (RFC 3986 §6.2.2.1:
    ``%2f`` ≡ ``%2F``; the canonical form is uppercase). Non-hex material
    after a ``%`` (malformed escapes) passes through untouched. Pure array
    expressions: split on '%', fix the first two chars of every tail."""
    parts = F.split(c, "%", -1)
    head = F.element_at(parts, 1)
    tails = F.slice(parts, 2, F.greatest(F.size(parts) - 1, F.lit(0)))
    fixed = F.transform(
        tails,
        lambda x: F.when(
            x.rlike("^[0-9a-fA-F]{2}"),
            F.concat(F.upper(F.substring(x, 1, 2)), F.substring(x, 3, 1 << 30)),
        ).otherwise(x),
    )
    return F.concat(
        head,
        F.aggregate(fixed, F.lit(""), lambda acc, x: F.concat(acc, F.lit("%"), x)),
    )


def canonicalize_url(url: Column) -> Column:
    """Normalize a URL column to a canonical dedup key:

    - scheme and host lowercased (path case is PRESERVED — it is
      significant per RFC 3986);
    - userinfo (``user:pass@``) dropped — the host alone identifies the
      origin for dedup purposes (same as CDX urlkey/SURT);
    - default ports dropped (``:443`` for https, ``:80`` for http),
      non-default ports kept;
    - fragment dropped;
    - %-escape hex uppercased in path and query (``%2f`` → ``%2F``,
      RFC 3986 §6.2.2.1); a MALFORMED escape (``%`` not followed by two
      hex digits) makes try_parse_url reject the whole URL → NULL, so
      the defensive pass-through in ``_upper_pct_escapes`` never sees one
      from this entry point;
    - in the QUERY only, ``+`` rewritten to ``%20`` (the
      x-www-form-urlencoded space, so ``?q=a+b`` ≡ ``?q=a%20b``);
    - tracking parameters removed (``TRACKING_PARAMS`` prefixes);
    - remaining query parameters sorted byte-lexicographically (duplicate
      keys PRESERVED as a sorted multiset), and the ``?`` dropped
      entirely when none survive;
    - empty path becomes ``/``; a trailing slash is stripped from
      non-root paths.

    NOT attempted: IDN→punycode conversion (needs the IDNA mapping
    tables — a deployment that ingests internationalized hosts should
    pre-encode them; ``xn--`` hosts pass through lowercased), and
    %-DEcoding of unreserved characters (``%41`` vs ``A`` stay distinct —
    decoding safely requires charset knowledge the URL doesn't carry).

    Returns NULL for NULL input; a string without a parseable host
    canonicalizes to NULL (parse_url semantics), which callers should
    treat as "not a URL".
    """
    scheme = F.lower(F.try_parse_url(url, F.lit("PROTOCOL")))
    host = F.lower(F.try_parse_url(url, F.lit("HOST")))
    authority = F.try_parse_url(url, F.lit("AUTHORITY"))
    port = F.regexp_extract(authority, r":(\d+)$", 1)
    is_default = ((scheme == "https") & (port == "443")) | (
        (scheme == "http") & (port == "80")
    )
    hostport = F.when((port == "") | is_default, host).otherwise(
        F.concat(host, F.lit(":"), port)
    )

    path = F.coalesce(F.try_parse_url(url, F.lit("PATH")), F.lit(""))
    path = _upper_pct_escapes(path)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    path = F.when(path == "/", path).otherwise(F.regexp_replace(path, "/$", ""))

    def _kept(p: Column) -> Column:
        drop = (p == "") | p.startswith("utm_")
        for t in TRACKING_PARAMS[1:]:
            drop = drop | p.startswith(t + "=") | (p == t)
        return ~drop

    def _fix_param(p: Column) -> Column:
        # '+' is the form-encoded space in queries; rewrite BEFORE sorting
        # so equivalent params sort identically, then uppercase %-escapes
        return _upper_pct_escapes(F.replace(p, F.lit("+"), F.lit("%20")))

    params = F.array_sort(
        F.transform(
            F.filter(
                F.split(F.coalesce(F.try_parse_url(url, F.lit("QUERY")), F.lit("")), "&"),
                _kept,
            ),
            _fix_param,
        )
    )
    query = F.array_join(params, "&")

    return F.when(
        host.isNull() | (host == ""), F.lit(None).cast("string")
    ).otherwise(
        F.concat(
            scheme,
            F.lit("://"),
            hostport,
            path,
            F.when(query == "", F.lit("")).otherwise(F.concat(F.lit("?"), query)),
        )
    )


def url_host(url: Column) -> Column:
    """Lowercased host — the grouping key for per-domain caps (p24) and
    domain-level corpus stats."""
    return F.lower(F.try_parse_url(url, F.lit("HOST")))


# Well-known multi-part second-level labels (public-suffix-LITE): when the
# second-to-last host label is one of these, the registrable domain spans
# THREE labels (bbc.co.uk, u-tokyo.ac.jp), not two. A real deployment swaps
# in the full Mozilla Public Suffix List; the fixed set keeps the operator a
# pure JVM expression with no sidecar data file.
MULTI_PART_SLDS = ("co", "com", "ac", "gov", "edu", "org", "net")


def registrable_domain(host: Column) -> Column:
    """Registrable ("eTLD+1"-style) domain of a lowercased host: the last
    two labels, or the last three when the second-to-last label is a known
    multi-part second-level (``MULTI_PART_SLDS`` — co.uk, ac.jp, ...).
    Hosts with fewer labels than that pass through whole; NULL/blank input
    → NULL. This is the grouping key for domain-level corpus statistics
    (p71) — subdomains (www./cdn./a.b.) collapse to one domain, which is
    what per-domain caps and spam scoring need. Map-only JVM expressions:
    split + slice + array_join, fused by whole-stage codegen.

    Trailing dots are stripped before splitting (ADVICE r8: a FQDN
    spelling 'example.com.' would otherwise split to ['example','com','']
    — 'com' matches MULTI_PART_SLDS and the kept empty label yields
    'example.com.', a distinct domain key from 'example.com')."""
    h = F.regexp_replace(F.lower(F.trim(host)), r"\.+$", "")
    labels = F.split(h, r"\.")
    n = F.size(labels)
    second = F.element_at(labels, -2)
    take = F.when(
        (n >= 3) & second.isin(*MULTI_PART_SLDS), F.lit(3)
    ).otherwise(F.lit(2))
    take = F.least(take, n)
    return F.when(h.isNull() | (h == ""), F.lit(None).cast("string")).otherwise(
        F.array_join(F.slice(labels, n - take + 1, take), ".")
    )
