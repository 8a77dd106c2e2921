"""Spark DSv2 Python filter → CDX query-parameter translation.

Mirrors the reference's pushdown_complex_filter catalogues
(/root/reference src/common_crawl_index.cpp:889-1460 for Common Crawl,
src/internet_archive.cpp:806-1318 for Wayback; filter syntax:
CC  "=status:N" / "!status:N" / "~status:(a|b)" / "~url:re" / "!~url:re",
IA  "statuscode:N" / "!statuscode:N" / "statuscode:(a|b)" / "urlkey:re").

Python DataSource filters cover equality, ranges, IN, prefix/suffix/contains,
NOT, IS [NOT] NULL — LIKE with interior wildcards and regexes never reach
``pushFilters`` and are covered by explicit reader options instead (the
reference's named-parameter escape hatch, SURVEY §4.1).

Translation POLICY: every filter is also returned to Spark as residual
("keep the filter in the plan" — the reference does this for CC timestamp
ranges, src/common_crawl_index.cpp:1333,1384). The remote params only tighten
the fetch; Spark re-applies the exact predicate, so partially-absorbing
translations (timestamp truncation, domain wildcards) can never produce wrong
results.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime

from pyspark.sql.datasource import (
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    LessThan,
    LessThanOrEqual,
    Not,
    StringContains,
    StringEndsWith,
    StringStartsWith,
)

from duckdb_cloudflare_spark.util.text import to_cdx_timestamp


def _attr(f) -> str | None:
    a = getattr(f, "attribute", None)
    if a and len(a) == 1:
        return a[0]
    return None


def _ts_str(v) -> str:
    if isinstance(v, datetime):
        return to_cdx_timestamp(v.strftime("%Y%m%d%H%M%S"))
    return to_cdx_timestamp(str(v))


@dataclass
class CdxQuerySpec:
    """Accumulated remote-query parameters from pushed filters."""

    url_pattern: str = ""
    match_type: str = "exact"  # wayback only
    crawl_ids: list[str] = field(default_factory=list)  # cc only
    cdx_filters: list[str] = field(default_factory=list)
    from_ts: str = ""
    to_ts: str = ""


def translate_cc_filter(f: Filter, spec: CdxQuerySpec) -> bool:
    """Apply one filter to the CC spec. Returns True if it contributed
    (it is still returned to Spark as residual regardless)."""
    col = _attr(f)
    if isinstance(f, Not):
        inner = f.child
        icol = _attr(inner)
        if isinstance(inner, EqualTo):
            if icol == "statuscode":
                spec.cdx_filters.append(f"!status:{inner.value}")
                return True
            if icol == "mimetype":
                spec.cdx_filters.append(f"!mime:{inner.value}")
                return True
        return False
    if isinstance(f, EqualTo):
        if col == "url":
            spec.url_pattern = str(f.value)
            return True
        if col == "crawl_id":
            spec.crawl_ids = [str(f.value)]
            return True
        if col == "statuscode":
            spec.cdx_filters.append(f"=status:{f.value}")
            return True
        if col == "mimetype":
            spec.cdx_filters.append(f"=mime:{f.value}")
            return True
        return False
    if isinstance(f, In):
        vals = [str(v) for v in f.value]
        if col == "crawl_id":
            spec.crawl_ids = vals
            return True
        if col == "statuscode":
            spec.cdx_filters.append("~status:(" + "|".join(vals) + ")")
            return True
        if col == "mimetype":
            spec.cdx_filters.append("~mime:(" + "|".join(vals) + ")")
            return True
        return False
    if col == "url":
        if isinstance(f, StringStartsWith):
            spec.url_pattern = f"{f.value}*"
            return True
        if isinstance(f, StringEndsWith):
            spec.url_pattern = f"*{f.value}"
            return True
        if isinstance(f, StringContains):
            spec.url_pattern = f"*{f.value}*"
            return True
    if col == "timestamp":
        if isinstance(f, (GreaterThan, GreaterThanOrEqual)):
            spec.from_ts = _ts_str(f.value)
            return True
        if isinstance(f, (LessThan, LessThanOrEqual)):
            spec.to_ts = _ts_str(f.value)
            return True
    return False


def translate_wayback_filter(f: Filter, spec: CdxQuerySpec) -> bool:
    """Apply one filter to the Wayback spec (filter=col:regex catalogue)."""
    col = _attr(f)
    if isinstance(f, Not):
        inner = f.child
        icol = _attr(inner)
        if isinstance(inner, EqualTo) and icol in ("statuscode", "mimetype"):
            spec.cdx_filters.append(f"!{icol}:{inner.value}")
            return True
        if icol == "urlkey":
            rx = _string_filter_regex(inner)
            if rx:
                spec.cdx_filters.append(f"!urlkey:{rx}")
                return True
        return False
    if isinstance(f, EqualTo):
        if col == "url":
            spec.url_pattern = str(f.value)
            spec.match_type = "exact"
            return True
        if col in ("statuscode", "mimetype"):
            spec.cdx_filters.append(f"{col}:{f.value}")
            return True
        if col == "year":
            spec.from_ts = str(f.value)
            spec.to_ts = str(f.value)
            return True
        if col == "urlkey":
            spec.cdx_filters.append(f"urlkey:^{f.value}$")
            return True
        return False
    if isinstance(f, In) and col in ("statuscode", "mimetype"):
        spec.cdx_filters.append(f"{col}:(" + "|".join(str(v) for v in f.value) + ")")
        return True
    if col == "url":
        if isinstance(f, StringStartsWith):
            spec.url_pattern = f"{f.value}*"
            return True
        if isinstance(f, StringEndsWith):
            # '%.example.com' → url=*.example.com (domain-suffix form,
            # internet_archive_pushdown.test:462-505)
            spec.url_pattern = f"*{f.value}"
            return True
        if isinstance(f, StringContains):
            spec.url_pattern = f"*{f.value}*"
            return True
    if col == "urlkey":
        rx = _string_filter_regex(f)
        if rx:
            spec.cdx_filters.append(f"urlkey:{rx}")
            return True
    if col == "timestamp":
        if isinstance(f, (GreaterThan, GreaterThanOrEqual)):
            spec.from_ts = _ts_str(f.value)
            return True
        if isinstance(f, (LessThan, LessThanOrEqual)):
            spec.to_ts = _ts_str(f.value)
            return True
    if col == "year":
        # year > 2020 → from=2021; year < 2024 → to=2023
        # (src/internet_archive.cpp:1274-1311)
        if isinstance(f, GreaterThan):
            spec.from_ts = str(int(f.value) + 1)
            return True
        if isinstance(f, GreaterThanOrEqual):
            spec.from_ts = str(int(f.value))
            return True
        if isinstance(f, LessThan):
            spec.to_ts = str(int(f.value) - 1)
            return True
        if isinstance(f, LessThanOrEqual):
            spec.to_ts = str(int(f.value))
            return True
    return False


def _string_filter_regex(f: Filter) -> str | None:
    """prefix/suffix/contains → the regex LikeToRegex would produce for the
    equivalent LIKE pattern (src/internet_archive.cpp:849-1005)."""
    if isinstance(f, StringStartsWith):
        return f"^{f.value}.*"
    if isinstance(f, StringEndsWith):
        return f".*{f.value}$"
    if isinstance(f, StringContains):
        return f".*{f.value}.*"
    return None
