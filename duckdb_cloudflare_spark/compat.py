"""DuckDB-dialect compatibility for ``spark.sql``.

The reference is a DuckDB extension, so its users write DuckDB SQL. Spark
4.x already accepts much of that surface natively (``GROUP BY ALL``,
``SELECT * EXCEPT (...)``, lateral column aliases); ``duck_sql`` closes the
remaining everyday gaps with source-level rewrites:

- ``SELECT * EXCLUDE (...)`` → ``SELECT * EXCEPT (...)`` (synonyms).
- DuckDB function spellings → Spark builtins (``arg_max``→``max_by``,
  ``list``→``collect_list``, ... — only drop-in-compatible mappings).
- Direct file queries — ``FROM 'x.parquet'`` / ``read_parquet('x')`` /
  ``read_csv('x')`` → Spark's ``FROM parquet.`x``` syntax.
- ``UNION [ALL|DISTINCT] BY NAME`` — Spark SQL has no name-aligned union
  syntax; top-level occurrences split the statement and route through
  ``DataFrame.unionByName(allowMissingColumns=True)`` (missing columns
  NULL-filled, non-ALL deduplicates — DuckDB's semantics exactly); each
  branch still gets the full dialect rewrite. A trailing ORDER BY/LIMIT
  is rejected loudly (wrap the union in a subquery).
- Federated-scan LIMIT/TopN pushdown (``rewrite_scan_limit``): the
  reference's optimizer-extension behavior, recovered at the SQL layer —
  a LIMIT sitting directly above a bare ``common_crawl_index`` /
  ``wayback_machine`` / ``d1_scan`` call becomes the reader's fetch-cap
  option (+ ``fast_latest`` for wayback's newest-first TopN), with the
  LIMIT kept in the plan for exactness.
- top-level ``QUALIFY <pred>`` → the predicate is evaluated as a projected
  boolean over the original query's output and filtered in a wrapper:

      SELECT * EXCEPT (__qualify)
      FROM (SELECT __q.*, (<pred>) AS __qualify FROM (<query>) AS __q) AS __qq
      WHERE __qualify  [ORDER BY / LIMIT tail]

  This supports both DuckDB idioms — predicates over select-list aliases
  (``QUALIFY rn <= 3``) and inline window predicates (``QUALIFY
  row_number() OVER (...) = 1``) — because either way the predicate only
  needs the inner query's OUTPUT columns. Predicates referencing base-table
  columns that the select list drops are not rewritable this way and raise
  in analysis (select the column or move the predicate inline).

Rewrites skip string literals, quoted identifiers, and comments, and only
fire at parenthesis depth 0 (a QUALIFY inside a subquery is rewritten when
that subquery text is itself passed through ``duck_sql`` — nested QUALIFY
in one statement is rejected to avoid silent misparses).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

_TAIL_KEYWORDS = ("ORDER", "LIMIT", "OFFSET", "WINDOW")


def _scan_top_level(sql: str):
    """Yield (index, char, depth) for chars outside strings/quotes/comments."""
    i, n, depth = 0, len(sql), 0
    while i < n:
        c = sql[i]
        if c == "'" or c == '"':
            q = c
            i += 1
            while i < n:
                if sql[i] == q:
                    if i + 1 < n and sql[i + 1] == q:  # doubled quote
                        i += 2
                        continue
                    break
                i += 1
        elif c == "-" and sql[i : i + 2] == "--":
            while i < n and sql[i] != "\n":
                i += 1
        elif c == "/" and sql[i : i + 2] == "/*":
            end = sql.find("*/", i + 2)
            i = n if end == -1 else end + 1
        else:
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            yield i, c, depth
        i += 1


def _find_keyword(sql: str, word: str, start: int = 0) -> int:
    """Index of a top-level, word-boundary keyword occurrence, or -1."""
    wl = len(word)
    upper = sql.upper()
    for i, c, depth in _scan_top_level(sql):
        if depth != 0 or i < start:
            continue
        if upper[i : i + wl] == word:
            before_ok = i == 0 or not (upper[i - 1].isalnum() or upper[i - 1] == "_")
            j = i + wl
            after_ok = j >= len(sql) or not (upper[j].isalnum() or upper[j] == "_")
            if before_ok and after_ok:
                return i
    return -1


def rewrite_exclude(sql: str) -> str:
    """``* EXCLUDE (...)`` / ``t.* EXCLUDE (...)`` → Spark's ``EXCEPT``.
    Valid at any depth (subqueries included); matches inside string
    literals / quoted identifiers / comments are left alone."""
    real = {i for i, _, _ in _scan_top_level(sql)}
    out = []
    prev_end = 0
    for m in re.finditer(r"(\*\s+)EXCLUDE(\s*\()", sql, flags=re.IGNORECASE):
        kw_start = m.start(1) + len(m.group(1))
        if kw_start not in real:
            continue
        out.append(sql[prev_end:kw_start])
        out.append("EXCEPT")
        prev_end = kw_start + len("EXCLUDE")
    out.append(sql[prev_end:])
    return "".join(out)


def rewrite_replace(sql: str) -> str:
    """``* REPLACE (expr AS col, ...)`` → ``* EXCEPT (col, ...), expr AS col, ...``.

    DuckDB's star-REPLACE substitutes columns in place; Spark has no REPLACE,
    but ``* EXCEPT`` + re-projecting the replacement expressions is
    semantically identical up to COLUMN ORDER (replaced columns move to the
    end of the star expansion). Order-insensitive consumers (and the
    driver's column-name-sorted hashing) see identical results; order-
    sensitive callers should list columns explicitly.

    Works at any depth; occurrences inside string literals / comments are
    left alone.
    """
    while True:
        real = {i for i, _, _ in _scan_top_level(sql)}
        m = None
        for cand in re.finditer(r"\*\s+(REPLACE)\s*(\()", sql, flags=re.IGNORECASE):
            if cand.start(1) in real:
                m = cand
                break
        if m is None:
            return sql
        open_idx = m.start(2)
        close = _match_paren(sql, open_idx)
        inner = sql[open_idx + 1 : close]
        # split the replacement list on top-level commas
        items: list[str] = []
        depth = 0
        start = 0
        offset = open_idx + 1
        real_inner = {i for i, _, _ in _scan_top_level(sql)}
        for i in range(len(inner)):
            gi = offset + i
            if gi not in real_inner:
                continue
            c = inner[i]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            elif c == "," and depth == 0:
                items.append(inner[start:i])
                start = i + 1
        items.append(inner[start:])
        names = []
        fixed_items = []
        for item in items:
            item = item.strip()
            am = re.search(r"\bAS\s+([A-Za-z_]\w*|\"[^\"]+\"|`[^`]+`)\s*$", item, re.IGNORECASE)
            if not am:
                raise ValueError(
                    "duck_sql: REPLACE list items must be 'expr AS name', got: "
                    + item
                )
            raw = am.group(1)
            if raw[0] in '"`':
                # DuckDB double-quoted identifiers are string literals to
                # Spark's default parser: normalize the alias to backticks in
                # BOTH the EXCEPT list and the re-projected item so quoted
                # names (spaces, keywords) survive the rewrite.
                bare = raw[1:-1].replace('""', '"') if raw[0] == '"' else raw[1:-1]
                quoted = "`" + bare.replace("`", "``") + "`"
                item = item[: am.start(1)] + quoted
                names.append(quoted)
            else:
                names.append(raw)
            fixed_items.append(item)
        replacement = (
            "EXCEPT (" + ", ".join(names) + "), " + ", ".join(fixed_items)
        )
        sql = sql[: m.start(1)] + replacement + sql[close + 1 :]


def _match_paren(sql: str, open_idx: int) -> int:
    """Index of the ``)`` matching ``sql[open_idx] == '('`` (quote-aware)."""
    target = None
    for i, c, depth in _scan_top_level(sql):
        if i == open_idx:
            target = depth  # depth AFTER the open paren
        elif target is not None and c == ")" and depth == target - 1:
            return i
    raise ValueError("duck_sql: unbalanced parentheses in WINDOW clause")


_WINDOW_ITEM = re.compile(r"\s*([A-Za-z_]\w*)\s+AS\s*\(", re.IGNORECASE)


def _parse_named_windows(sql: str, w_pos: int) -> dict[str, str]:
    """Parse ``WINDOW w AS (...), w2 AS (...)`` starting at the keyword
    position into ``{lowercased name: "(spec)"}``."""
    out: dict[str, str] = {}
    i = w_pos + len("WINDOW")
    while True:
        m = _WINDOW_ITEM.match(sql, i)
        if not m:
            if not out:
                raise ValueError("duck_sql: could not parse WINDOW clause")
            break
        open_idx = m.end() - 1
        close = _match_paren(sql, open_idx)
        out[m.group(1).lower()] = sql[open_idx : close + 1]
        i = close + 1
        sep = re.match(r"\s*,", sql[i:])
        if not sep:
            break
        i += sep.end()
    return out


_OVER_NAME = re.compile(r"\bOVER\s+([A-Za-z_]\w*)", re.IGNORECASE)


def rewrite_qualify(sql: str) -> str:
    """Rewrite one top-level QUALIFY clause (see module docstring)."""
    q = _find_keyword(sql, "QUALIFY")
    if q == -1:
        return sql
    if _find_keyword(sql, "QUALIFY", start=q + 7) != -1:
        raise ValueError("duck_sql: multiple top-level QUALIFY clauses in one statement")
    # predicate runs until the first top-level tail keyword (ORDER/LIMIT/...)
    tail_at = len(sql)
    for kw in _TAIL_KEYWORDS:
        k = _find_keyword(sql, kw, start=q + 7)
        if k != -1:
            tail_at = min(tail_at, k)
    before = sql[:q].rstrip().rstrip(";")
    pred = sql[q + 7 : tail_at].strip().rstrip(";")
    tail = sql[tail_at:].strip().rstrip(";")
    if not pred:
        raise ValueError("duck_sql: QUALIFY with empty predicate")

    # A named-WINDOW clause (SELECT ... WINDOW w AS (...) QUALIFY ... OVER w)
    # stays inside the wrapped subquery while the predicate is hoisted out of
    # its scope — inline the definition into the predicate (ADVICE r2).
    if _OVER_NAME.search(pred):
        w = _find_keyword(sql, "WINDOW")
        named = _parse_named_windows(sql, w) if (w != -1 and w < q) else {}

        def _inline(m: re.Match) -> str:
            name = m.group(1).lower()
            spec = named.get(name)
            if spec is None:
                raise ValueError(
                    f"duck_sql: QUALIFY references named window '{m.group(1)}' "
                    "but no top-level WINDOW clause precedes QUALIFY "
                    "(standard clause order is ... WINDOW ... QUALIFY ...)"
                )
            head = re.match(r"\(\s*([A-Za-z_]\w*)", spec)
            if head and head.group(1).lower() in named:
                raise ValueError(
                    "duck_sql: QUALIFY over a named window that itself "
                    f"references another named window ('{m.group(1)}') is "
                    "unsupported — expand the base window inline"
                )
            return "OVER " + spec

        pred = _OVER_NAME.sub(_inline, pred)

    return (
        f"SELECT * EXCEPT (__qualify) FROM "
        f"(SELECT __q.*, ({pred}) AS __qualify FROM ({before}) AS __q) AS __qq "
        f"WHERE __qualify" + (f" {tail}" if tail else "")
    )


_DISTINCT_ON = re.compile(r"\bDISTINCT\s+ON\s*(\()", re.IGNORECASE)


def rewrite_distinct_on(sql: str) -> str:
    """``SELECT DISTINCT ON (k, ...) <list> FROM ... [ORDER BY ...]`` →
    the row_number-window form (the q21 shape) Spark can run:

        SELECT <list> FROM (
            SELECT *, row_number() OVER (
                PARTITION BY k, ... ORDER BY <order-by, or the ON exprs>
            ) AS __din_rn
            FROM ...            -- original FROM/WHERE body, minus the tail
        ) AS __din WHERE __din_rn = 1  [ORDER BY ...] [LIMIT/OFFSET ...]

    DuckDB keeps the FIRST row per distinct ON-value under the query's
    ORDER BY (src/internet_archive.cpp:1484-1893 pushes the same plan into
    CDX ``collapse=``; ``read_wayback(distinct_on=...)`` is that path —
    this rewrite is the engine-side fallback for plain tables). Without an
    ORDER BY the kept row is arbitrary in DuckDB; here the window orders
    by the ON expressions, which is equally arbitrary within a group —
    callers wanting determinism must supply ORDER BY (q21's contract).

    Loud-over-wrong contract (the shim's standing rule): GROUP BY /
    HAVING / set-ops combined with DISTINCT ON, multiple top-level
    DISTINCT ONs, or ON expressions naming select-list ALIASES (the
    window runs over base columns) raise — in analysis or here — rather
    than mis-running."""
    m = None
    depth_at = {i: d for i, _, d in _scan_top_level(sql)}
    for cand in _DISTINCT_ON.finditer(sql):
        d = depth_at.get(cand.start())
        if d is None:  # inside a string literal or comment — not SQL
            continue
        if d != 0:
            # A DISTINCT ON inside a CTE / subquery: rewriting it as if
            # top-level would move the dedup relative to outer WHERE /
            # ORDER BY and silently change results vs DuckDB. Loud over
            # wrong (ADVICE r9 medium).
            raise ValueError(
                "duck_sql: DISTINCT ON inside a subquery/CTE is not "
                "supported by this rewrite — lift the dedup to the top "
                "level or express it as an explicit row_number() window"
            )
        if m is not None:
            raise ValueError(
                "duck_sql: multiple top-level DISTINCT ON clauses in one "
                "statement"
            )
        m = cand
    if m is None:
        return sql
    open_idx = m.start(1)
    close = _match_paren(sql, open_idx)
    on_exprs = sql[open_idx + 1 : close].strip()
    if not on_exprs:
        raise ValueError("duck_sql: DISTINCT ON with empty expression list")
    # the SELECT this DISTINCT belongs to is the nearest preceding SELECT
    sel = sql.upper().rfind("SELECT", 0, m.start())
    if sel == -1:
        raise ValueError("duck_sql: DISTINCT ON outside a SELECT")
    prefix = sql[:sel]  # WITH clause, if any
    from_at = _find_keyword(sql, "FROM", start=close + 1)
    if from_at == -1:
        raise ValueError("duck_sql: DISTINCT ON without a FROM clause")
    select_list = sql[close + 1 : from_at].strip()
    for kw in ("GROUP", "HAVING", "UNION", "INTERSECT", "EXCEPT", "QUALIFY"):
        if _find_keyword(sql, kw, start=from_at) != -1:
            raise ValueError(
                f"duck_sql: DISTINCT ON combined with {kw} is not supported "
                "by this rewrite — dedup with a window over an explicit "
                "subquery instead"
            )
    # split the tail: body = FROM..WHERE.., tail starts at ORDER/LIMIT/OFFSET
    tail_at = len(sql)
    for kw in ("ORDER", "LIMIT", "OFFSET"):
        k = _find_keyword(sql, kw, start=from_at)
        if k != -1:
            tail_at = min(tail_at, k)
    body = sql[from_at:tail_at].strip().rstrip(";")
    tail = sql[tail_at:].strip().rstrip(";")
    inner_order = on_exprs
    om = re.match(r"ORDER\s+BY\s+(.*)$", tail, re.IGNORECASE | re.DOTALL)
    if om:
        rest = om.group(1)
        cut = len(rest)
        for kw in ("LIMIT", "OFFSET"):
            k = _find_keyword(rest, kw)
            if k != -1:
                cut = min(cut, k)
        inner_order = rest[:cut].strip()
    outer_list = (
        "* EXCEPT (__din_rn)" if select_list == "*" else select_list
    )
    return (
        f"{prefix}SELECT {outer_list} FROM "
        f"(SELECT *, row_number() OVER (PARTITION BY {on_exprs} "
        f"ORDER BY {inner_order}) AS __din_rn {body}) AS __din "
        f"WHERE __din_rn = 1" + (f" {tail}" if tail else "")
    )


# DuckDB function spellings whose Spark builtin is a drop-in (same argument
# order and semantics for the common arities). Deliberately NOT mapped:
# string_split (DuckDB splits on a LITERAL separator, Spark split() treats it
# as a regex — a silent-wrong rewrite). strftime is handled separately by
# ``rewrite_strftime`` (literal formats translated code-by-code, anything
# untranslatable raises). Unmapped spellings raise naturally in Spark
# analysis instead of mis-running.
_FUNCTION_ALIASES = {
    "arg_max": "max_by",
    "arg_min": "min_by",
    # NB: the AGGREGATES list(x) / array_agg(x) are NOT simple renames —
    # DuckDB keeps NULL elements ([1, NULL, 3]) where Spark's collect_list
    # DROPS them (verified on both). They get a NULL-preserving expression
    # rewrite in rewrite_list_exprs instead.
    "list_value": "array",
    "list_pack": "array",  # DuckDB alias of list_value
    "array_length": "size",
    "len": "length",
    "regexp_matches": "rlike",  # both are partial-match
    # array_sort, NOT sort_array: DuckDB's default list_sort order is ASC
    # NULLS LAST ([3,1,NULL] → [1,3,NULL], verified) — Spark's sort_array
    # puts NULLs FIRST, Spark's array_sort puts them LAST. The previous
    # sort_array mapping was silently wrong on NULL elements.
    "list_sort": "array_sort",
    "array_to_string": "array_join",
    "list_distinct": "array_distinct",
    "list_min": "array_min",  # both skip NULL elements
    "list_max": "array_max",
    "list_append": "array_append",  # both (list, element)
    "list_reverse": "reverse",
    "array_reverse": "reverse",  # DuckDB alias of list_reverse
    "list_filter": "filter",  # both (list, lambda); `x ->` lambda syntax shared
    "list_transform": "transform",
    "string_split_regex": "split",  # both regex; both keep trailing empties
    "str_split_regex": "split",  # DuckDB alias of string_split_regex
    "regexp_split_to_array": "split",  # DuckDB alias of string_split_regex
    "strpos": "instr",  # both 1-based, 0 when absent
    "strlen": "length",  # DuckDB alias
    "prefix": "startswith",  # DuckDB aliases of starts_with/ends_with
    "suffix": "endswith",
    "epoch_ms": "unix_millis",  # both BIGINT milliseconds (verified)
    "starts_with": "startswith",  # both NULL-propagating (verified)
    "ends_with": "endswith",  # both NULL-propagating (verified)
    # verified drop-in: absent → 0, NULL list/value → NULL on BOTH engines
    "list_position": "array_position",
    "list_indexof": "array_position",  # DuckDB alias of list_position
    # NOT mapped (need expression rewrites, not renames — raising beats
    # mis-running): list_unique (= size(array_distinct(x))), list_slice /
    # array_slice (1-based inclusive vs Spark's slice(start, length)),
    # list_contains / list_has / array_has / array_contains (Spark
    # array_contains returns NULL when the array holds a NULL and the value
    # is absent — DuckDB returns false; all four spellings handled in
    # rewrite_list_exprs via array_position), list_first / list_last
    # (→ try_element_at, also in rewrite_list_exprs), list_has_any
    # (NULL elements never match in DuckDB but DO in Spark array_intersect
    # and produce NULL in arrays_overlap — rewritten in rewrite_list_exprs
    # via a NULL-stripped intersect), list_prepend (DuckDB is (element,
    # list) AND treats a NULL list as empty — list_prepend(1, NULL) → [1],
    # verified — where Spark array_prepend propagates NULL; not cleanly
    # rewritable without double-evaluating arguments, so it raises),
    # epoch (DuckDB DOUBLE with fractional seconds — Spark unix_timestamp
    # truncates to BIGINT seconds).
    #
    # KNOWN UNFIXABLE DIVERGENCE (documented, not rewritten): concat() —
    # DuckDB SKIPS NULL arguments ('a'+NULL+'b' → 'ab'), Spark propagates
    # NULL. A static rewrite to concat_ws('', …) would reproduce the NULL
    # behavior but silently BREAK DuckDB's list-concatenation use of the
    # same function (types are unknowable at rewrite time). Migrating SQL
    # that relies on NULL-skipping concat should use concat_ws explicitly;
    # the || operator agrees between engines (NULL-propagating) and is safe.
    # Same class: list_cat / list_concat / array_concat also skip NULL
    # arguments in DuckDB (list_cat(NULL, [1]) → [1], verified) while
    # Spark's concat propagates — likewise unmapped, same reason.
}

_FUNC_CALL = re.compile(r"\b([A-Za-z_]\w*)\s*\(", re.IGNORECASE)


def rewrite_function_names(sql: str) -> str:
    """Map DuckDB function spellings to the equivalent Spark builtins.
    Only identifier-immediately-followed-by-``(`` sites are touched (any
    depth; string literals / quoted identifiers / comments skipped)."""
    real = {i for i, _, _ in _scan_top_level(sql)}
    out, prev = [], 0
    for m in _FUNC_CALL.finditer(sql):
        target = _FUNCTION_ALIASES.get(m.group(1).lower())
        if target is None or m.start(1) not in real:
            continue
        out.append(sql[prev : m.start(1)])
        out.append(target)
        prev = m.end(1)
    out.append(sql[prev:])
    return "".join(out)


# DuckDB queries files directly: FROM 'x.parquet' / read_parquet('x') /
# parquet_scan('x') / read_csv[_auto] / read_json[_auto]. Spark's spelling is
# FROM parquet.`x` (format-qualified backtick path).
_FROM_LITERAL = re.compile(r"\b(FROM|JOIN)\s+'([^']+)'", re.IGNORECASE)
_READ_FUNC = re.compile(
    r"\b(read_parquet|parquet_scan|read_csv_auto|read_csv|read_json_auto|read_json)"
    r"\s*\(\s*'([^']+)'\s*\)",
    re.IGNORECASE,
)
_EXT_FORMAT = {".parquet": "parquet", ".csv": "csv", ".json": "json",
               ".jsonl": "json", ".ndjson": "json", ".orc": "orc"}


def rewrite_file_tables(sql: str) -> str:
    """``FROM 'x.parquet'`` / ``read_parquet('x')`` → ``FROM parquet.`x```
    (DuckDB direct-file queries → Spark's format-qualified path syntax).
    Glob patterns pass through unchanged — both engines expand them."""
    real = {i for i, _, _ in _scan_top_level(sql)}

    def _fmt_for(path: str) -> str | None:
        for ext, fmt in _EXT_FORMAT.items():
            if path.lower().rstrip("*").endswith(ext):
                return fmt
        return None

    out, prev = [], 0
    spans: list[tuple[int, int, str]] = []
    for m in _FROM_LITERAL.finditer(sql):
        if m.start(1) not in real:
            continue
        fmt = _fmt_for(m.group(2))
        if fmt:
            spans.append((m.start(), m.end(), f"{m.group(1)} {fmt}.`{m.group(2)}`"))
    for m in _READ_FUNC.finditer(sql):
        if m.start(1) not in real:
            continue
        fn = m.group(1).lower()
        fmt = "parquet" if "parquet" in fn else ("csv" if "csv" in fn else "json")
        spans.append((m.start(), m.end(), f"{fmt}.`{m.group(2)}`"))
    for start, end, repl in sorted(spans):
        out.append(sql[prev:start])
        out.append(repl)
        prev = end
    out.append(sql[prev:])
    return "".join(out)


# DuckDB list functions whose Spark equivalent is an EXPRESSION, not a
# rename: these need argument-aware rewriting (balanced parens, quoted
# strings respected). Handled here rather than left to raise:
#   list_unique(x)        → size(array_distinct(x))   (count of distincts)
#   list_slice(l, a, b)   → slice(l, a, (b) - (a) + 1)   (array_slice alias too)
#   list_contains(l, v)   → (array_position(l, v) > 0)
#     (Spark array_contains is three-valued: NULL when the array holds a
#     NULL and the value is absent, where DuckDB returns false — verified
#     on both. array_position has NO three-valued case: absent → 0 even
#     with NULL elements, NULL list/value → NULL, so `> 0` reproduces
#     DuckDB on all four NULL corners with each argument evaluated once.
#     list_has / array_has / array_contains itself are DuckDB aliases of
#     list_contains, so ALL FOUR spellings are rewritten — a bare Spark
#     array_contains would silently run with Spark's NULL semantics.)
#   list_has_any(a, b)    → (size(array_intersect(filter(a, x -> x IS NOT
#                             NULL), b)) > 0)   (see inline comment)
#   list_first(l) / list_last(l) → try_element_at(l, 1 / -1)
#     (empty or NULL list → NULL on both engines; Spark 4's ANSI-mode
#     element_at would raise on empty, hence the try_ form.)
# list_slice caveat: both are 1-based and end-inclusive for POSITIVE
# indices, which the rewrite preserves exactly; DuckDB's negative-index /
# NULL-bound forms do not map onto Spark's (start, length) signature and
# will produce Spark's semantics instead.
_LIST_EXPR = re.compile(
    r"\b(list_unique|list_slice|array_slice|list_contains|list_has|array_has"
    r"|array_contains|list_has_any|list_first|list_last|date_add"
    r"|array_pop_back|array_pop_front|to_base|list|array_agg"
    r"|date_diff|datediff)\s*\(",
    re.IGNORECASE,
)


def _call_args(sql: str, open_idx: int) -> tuple[int, list[str]]:
    """Given the index of a call's ``(``, return (index of its ``)``,
    top-level-comma-split argument texts). Nested parens and single/double
    quoted strings (with doubled-quote escapes) are respected."""
    i, n, depth = open_idx, len(sql), 0
    args: list[str] = []
    start = open_idx + 1
    while i < n:
        c = sql[i]
        if c == "'" or c == '"':
            q = c
            i += 1
            while i < n:
                if sql[i] == q:
                    if i + 1 < n and sql[i + 1] == q:
                        i += 2
                        continue
                    break
                i += 1
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                args.append(sql[start:i])
                return i, args
        elif c == "," and depth == 1:
            args.append(sql[start:i])
            start = i + 1
        i += 1
    raise ValueError("unbalanced parentheses in SQL function call")


# C strftime codes → Java DateTimeFormatter patterns, for the subset with
# an exact equivalent. Codes outside this map make the rewrite RAISE —
# a clear bind-time error beats silently wrong timestamps.
_STRFTIME_MAP = {
    "%Y": "yyyy", "%y": "yy", "%m": "MM", "%d": "dd", "%H": "HH",
    "%I": "hh", "%M": "mm", "%S": "ss", "%f": "SSSSSS", "%p": "a",
    "%j": "DDD", "%a": "EEE", "%A": "EEEE", "%b": "MMM", "%B": "MMMM",
    "%%": "%",
}
_STRFTIME_CALL = re.compile(r"\bstrftime\s*\(", re.IGNORECASE)


def _translate_strftime_format(fmt: str) -> str:
    out, i = [], 0
    while i < len(fmt):
        if fmt[i] == "%":
            code = fmt[i : i + 2]
            if code not in _STRFTIME_MAP:
                raise ValueError(
                    f"strftime code {code!r} has no exact Java-pattern "
                    "equivalent; use date_format with a Spark pattern"
                )
            out.append(_STRFTIME_MAP[code])
            i += 2
        else:
            # literal text: quote alphabetic runs so Java doesn't interpret
            j = i
            while j < len(fmt) and fmt[j] != "%":
                j += 1
            lit = fmt[i:j]
            out.append(f"'{lit}'" if any(c.isalpha() for c in lit) else lit)
            i = j
    return "".join(out)


def rewrite_strftime(sql: str) -> str:
    """``strftime(expr, '%Y-%m-%d')`` → ``date_format(expr, 'yyyy-MM-dd')``
    for literal formats whose codes all have exact Java equivalents
    (untranslatable codes raise at rewrite time). Non-literal format
    arguments pass through untouched and fail Spark analysis naturally."""
    for _ in range(200):
        real = {i for i, _, _ in _scan_top_level(sql)}
        hit = None
        for m in _STRFTIME_CALL.finditer(sql):
            if m.start() not in real:
                continue
            close, args = _call_args(sql, m.end() - 1)
            if len(args) != 2:
                continue
            fmt_arg = args[1].strip()
            if not (fmt_arg.startswith("'") and fmt_arg.endswith("'")):
                continue  # non-literal format: leave for Spark to reject
            hit = (m, close, args, fmt_arg)
            break
        if hit is None:
            return sql
        m, close, args, fmt_arg = hit
        fmt = fmt_arg[1:-1].replace("''", "'")
        java = _translate_strftime_format(fmt).replace("'", "''")
        sql = (
            sql[: m.start()]
            + f"date_format({args[0].strip()}, '{java}')"
            + sql[close + 1 :]
        )
    raise ValueError("rewrite_strftime did not converge")


def rewrite_list_exprs(sql: str) -> str:
    """Expand the expression-level rewrites above into their Spark
    equivalents. Outermost-first with a fixpoint loop, so nested
    occurrences inside rewritten arguments are picked up on the next pass;
    ``skip`` holds call sites deliberately left alone (e.g. integer-days
    ``date_add``) so the loop still terminates."""
    skip: set[int] = set()
    for _ in range(200):  # bound: more list_* calls than this is not real SQL
        real = {i for i, _, _ in _scan_top_level(sql)}
        m = next(
            (
                m
                for m in _LIST_EXPR.finditer(sql)
                if m.start(1) in real and m.start(1) not in skip
            ),
            None,
        )
        if m is None:
            return sql
        open_idx = m.end() - 1  # the regex requires the "(" at match end
        close, args = _call_args(sql, open_idx)
        end = close + 1  # branches may extend this (consumed FILTER/OVER)
        fn = m.group(1).lower()
        if fn == "list_unique":
            if len(args) != 1:
                raise ValueError("list_unique takes exactly 1 argument")
            repl = f"size(array_distinct({args[0].strip()}))"
        elif fn in ("list_slice", "array_slice"):
            if len(args) != 3:
                raise ValueError(f"{fn} takes exactly 3 arguments")
            lst, a, b = (x.strip() for x in args)
            repl = f"slice({lst}, {a}, ({b}) - ({a}) + 1)"
        elif fn in ("list_contains", "list_has", "array_has", "array_contains"):
            if len(args) != 2:
                raise ValueError(f"{fn} takes exactly 2 arguments")
            lst, v = (x.strip() for x in args)
            repl = f"(array_position({lst}, {v}) > 0)"
        elif fn == "list_has_any":
            if len(args) != 2:
                raise ValueError("list_has_any takes exactly 2 arguments")
            a_, b_ = (x.strip() for x in args)
            # DuckDB: NULL elements never match (SQL equality), NULL side →
            # NULL. Spark array_intersect matches NULLs and arrays_overlap
            # is three-valued; stripping one side's NULLs before intersect
            # reproduces DuckDB exactly (a NULL in a could only match a
            # NULL in b, which never matches). size(NULL) → NULL keeps the
            # NULL-side corners; each argument is evaluated once.
            repl = (
                f"(size(array_intersect(filter({a_}, x -> x IS NOT NULL), "
                f"{b_})) > 0)"
            )
        elif fn == "date_add":
            # DuckDB date_add(DATE, INTERVAL …) returns TIMESTAMP (midnight)
            # where Spark's date_add takes (date, int-days) and rejects an
            # interval. Rewrite ONLY when the second argument is a visible
            # INTERVAL literal — both engines clamp month-ends identically
            # (2024-01-31 + 1 MONTH = 2024-02-29, verified). The integer-
            # days form is already drop-in (both return DATE): left alone.
            if len(args) != 2:
                raise ValueError("date_add takes exactly 2 arguments")
            a_, b_ = (x.strip() for x in args)
            if not re.match(r"INTERVAL\b", b_, re.IGNORECASE):
                # word boundary required: a COLUMN named interval_days is
                # the integer-days form, not an interval literal
                skip.add(m.start(1))
                continue
            repl = f"CAST(({a_}) + ({b_}) AS TIMESTAMP)"
        elif fn in ("array_pop_back", "array_pop_front"):
            # NULL list → NULL and empty → empty on both engines (slice
            # with greatest(size-1, 0) handles empty; the list expression
            # is textually duplicated — nondeterministic arguments would
            # evaluate more than once).
            if len(args) != 1:
                raise ValueError(f"{fn} takes exactly 1 argument")
            lst = args[0].strip()
            start = 1 if fn == "array_pop_back" else 2
            repl = f"slice({lst}, {start}, greatest(size({lst}) - 1, 0))"
        elif fn == "to_base":
            # DuckDB to_base(n, radix) == Spark conv(n, 10, radix) (both
            # uppercase, verified). The 3-arg min-length form has no Spark
            # equivalent and raises.
            if len(args) != 2:
                raise ValueError(
                    "to_base: only the 2-argument form maps to Spark conv"
                )
            a_, b_ = (x.strip() for x in args)
            # DuckDB raises on negative input where Spark conv returns the
            # 64-bit two's-complement string — guard with raise_error so
            # the divergence is loud, not silently wrong.
            # CAVEAT (ADVICE r5, same class as array_pop_back above): the
            # argument text is duplicated into the CASE guard, so a
            # NONDETERMINISTIC argument (rand()-derived) evaluates twice
            # and the guard may test a different sample than conv converts.
            # Acceptable: to_base over a random expression has no stable
            # cross-engine answer anyway; deterministic args are unaffected.
            repl = (
                f"CASE WHEN ({a_}) < 0 THEN "
                f"raise_error('to_base: number must be greater than or "
                f"equal to 0') ELSE conv({a_}, 10, {b_}) END"
            )
        elif fn in ("list", "array_agg"):
            # DuckDB's list()/array_agg() KEEP NULL elements; Spark's
            # collect_list drops them (verified: [1,NULL,3] vs [1,3]).
            # NULL-preserving form: collect a non-null struct wrapper, then
            # unwrap — struct(NULL AS v) is itself non-null, so nothing is
            # dropped. Aggregation ORDER is unspecified in Spark either way
            # (same caveat the plain rename had). DISTINCT / ORDER BY
            # modifiers have no faithful Spark equivalent (collect_set also
            # drops NULLs) → raise rather than mis-run.
            if len(args) != 1:
                raise ValueError(f"{fn} takes exactly 1 argument")
            arg = args[0].strip()
            if re.match(r"DISTINCT\b", arg, re.IGNORECASE) or re.search(
                r"\bORDER\s+BY\b", arg, re.IGNORECASE
            ):
                raise ValueError(
                    f"{fn}: DISTINCT/ORDER BY modifiers have no NULL-faithful "
                    "Spark equivalent (collect_set drops NULLs); rewrite the "
                    "query explicitly"
                )
            # Trailing FILTER (WHERE ...) and OVER (...) / OVER name clauses
            # belong to the AGGREGATE, so they must ride INSIDE the
            # transform() wrapper (outside, Spark rejects transform as a
            # window function — the clause would attach to the wrong call).
            tail = ""
            mf = re.match(r"\s*FILTER\s*\(", sql[end:], re.IGNORECASE)
            if mf:
                fclose, _ = _call_args(sql, end + mf.end() - 1)
                tail += " " + sql[end + mf.start() : fclose + 1].strip()
                end = fclose + 1
            mo = re.match(r"\s*OVER\s*", sql[end:], re.IGNORECASE)
            if mo:
                after = end + mo.end()
                if after < len(sql) and sql[after] == "(":
                    oclose, _ = _call_args(sql, after)
                    tail += " " + sql[end + mo.start() : oclose + 1].strip()
                    end = oclose + 1
                else:
                    mw = re.match(r"[A-Za-z_]\w*", sql[after:])
                    if mw:
                        tail += " OVER " + mw.group(0)
                        end = after + mw.end()
            repl = f"transform(collect_list(struct(({arg}) AS v)){tail}, s -> s.v)"
        elif fn in ("date_diff", "datediff"):
            # DuckDB 3-arity date_diff(part, start, end) counts PART
            # boundary crossings. Spark's 2-arity datediff(end, start)
            # counts DAY boundary crossings identically (verified incl.
            # timestamps: 23:59→00:01 = 1 on both) — so only the 'day'
            # part maps exactly; month/year parts count boundaries in
            # DuckDB but Spark's months_between is fractional → raise.
            # The 2-arity spelling is already Spark's own: left alone.
            if len(args) == 2:
                skip.add(m.start(1))
                continue
            if len(args) != 3:
                raise ValueError(f"{fn} takes 2 or 3 arguments")
            part, a_, b_ = (x.strip() for x in args)
            if part.strip("'\"").lower() not in ("day", "days", "d"):
                raise ValueError(
                    f"{fn}: only the 'day' part maps exactly to Spark "
                    "datediff (other parts count boundary crossings in "
                    "DuckDB with no Spark drop-in); rewrite explicitly"
                )
            repl = f"datediff(({b_}), ({a_}))"
        else:  # list_first / list_last
            if len(args) != 1:
                raise ValueError(f"{fn} takes exactly 1 argument")
            idx = 1 if fn == "list_first" else -1
            repl = f"try_element_at({args[0].strip()}, {idx})"
        # indices in ``skip`` shift when text BEFORE them is edited:
        # offset-adjust entries past the edit point instead of clearing,
        # so skipped sites are never re-scanned and the fixpoint bound
        # stays linear in the number of rewritable call sites.
        delta = len(repl) - (end - m.start(1))
        sql = sql[: m.start(1)] + repl + sql[end:]
        skip = {i + delta if i > m.start(1) else i for i in skip}
    raise ValueError("rewrite_list_exprs did not converge (too many call sites)")


# --- same-name, DIFFERENT-semantics hazards (the silent-wrong class) -----
# Verified empirically (see tests): DuckDB log(x) is LOG BASE 10, Spark
# log(x) is ln; DuckDB regexp_replace defaults to FIRST match (needs 'g'
# for all), Spark replaces all; DuckDB subscripts are 1-based, Spark's are
# 0-based. Each gets an explicit rewrite (or a loud error) below.

_LOG_CALL = re.compile(r"\blog\s*\(", re.IGNORECASE)


def rewrite_log10(sql: str) -> str:
    """One-argument ``log(x)`` → ``log10(x)`` (DuckDB's base; Spark's
    1-arity log is ln — silently wrong by a factor). Two-argument
    ``log(base, x)`` agrees between engines and passes through."""
    real = {i for i, _, _ in _scan_top_level(sql)}
    spans: list[tuple[int, int]] = []
    for m in _LOG_CALL.finditer(sql):
        if m.start() not in real:
            continue
        _, args = _call_args(sql, m.end() - 1)
        if len(args) == 1:
            spans.append((m.start(), m.start() + 3))
    for start, end in sorted(spans, reverse=True):
        sql = sql[:start] + "log10" + sql[end:]
    return sql


_REGEXP_REPLACE_CALL = re.compile(r"\bregexp_replace\s*\(", re.IGNORECASE)


def rewrite_regexp_replace(sql: str) -> str:
    """DuckDB's ``regexp_replace`` defaults to replacing the FIRST match;
    Spark always replaces ALL. 4-arity with a literal ``'g'`` flag (the
    replace-all spelling) maps exactly: drop the flag. 3-arity (first-only)
    and non-'g' flags have no Spark builtin equivalent — raise with a
    clear message instead of silently replacing everything."""
    real = {i for i, _, _ in _scan_top_level(sql)}
    edits: list[tuple[int, int, str]] = []
    for m in _REGEXP_REPLACE_CALL.finditer(sql):
        if m.start() not in real:
            continue
        close, args = _call_args(sql, m.end() - 1)
        if len(args) == 3:
            raise ValueError(
                "regexp_replace(s, re, rep) replaces only the FIRST match in "
                "DuckDB but ALL matches in Spark; add the 'g' flag if you "
                "meant replace-all, or rewrite the first-only case explicitly"
            )
        if len(args) == 4:
            flag = args[3].strip()
            if flag == "'g'":
                # drop the flag: Spark's 3-arity IS replace-all
                edits.append((m.end() - 1, close, "(" + ",".join(args[:3]) + ")"))
            else:
                raise ValueError(
                    f"regexp_replace flag {flag} has no Spark equivalent "
                    "(only 'g' maps); embed (?i) etc. in the pattern instead"
                )
    for start, end, repl in sorted(edits, reverse=True):
        sql = sql[:start] + repl + sql[end + 1 :]
    return sql


# Identifier (possibly dotted) followed by an INTEGER-literal subscript.
# DuckDB is 1-based, Spark 0-based — element_at() is 1-based in Spark and
# key-based on maps in both, so it reproduces DuckDB's reading for both
# container kinds. String subscripts (map['k']) agree already and pass
# through; subscripts on non-identifier targets (e.g. list literals, which
# Spark cannot parse anyway) are left alone.
_INT_SUBSCRIPT = re.compile(r"\b([A-Za-z_][A-Za-z0-9_.]*)\s*\[\s*(\d+)\s*\]")


def rewrite_int_subscripts(sql: str) -> str:
    real = {i for i, _, _ in _scan_top_level(sql)}
    out, prev = [], 0
    for m in _INT_SUBSCRIPT.finditer(sql):
        if m.start(1) not in real:
            continue
        out.append(sql[prev : m.start()])
        out.append(f"element_at({m.group(1)}, {m.group(2)})")
        prev = m.end()
    out.append(sql[prev:])
    return "".join(out)


_REGEXP_EXTRACT_CALL = re.compile(r"\bregexp_extract\s*\(", re.IGNORECASE)


def rewrite_regexp_extract(sql: str) -> str:
    """Two-argument ``regexp_extract(s, re)`` → ``regexp_extract(s, re, 0)``.

    The name exists in BOTH engines but the default group index differs:
    DuckDB returns the WHOLE match (group 0), Spark returns capture group 1
    — the worst kind of dialect gap, silently wrong output rather than an
    error. Pinning the explicit 0 reproduces DuckDB's semantics; 3-argument
    calls already agree and pass through."""
    out_spans: list[tuple[int, str]] = []
    real = {i for i, _, _ in _scan_top_level(sql)}
    for m in _REGEXP_EXTRACT_CALL.finditer(sql):
        if m.start() not in real:
            continue
        close, args = _call_args(sql, m.end() - 1)
        if len(args) == 2:
            out_spans.append((close, ", 0"))
    for pos, ins in sorted(out_spans, reverse=True):
        sql = sql[:pos] + ins + sql[pos:]
    return sql


def rewrite_named_args(sql: str) -> str:
    """DuckDB's named-argument token ``:=`` → Spark's ``=>`` (the reference's
    table-function calls: ``common_crawl_index(url := '...', ...)``). ``:=``
    is not valid Spark SQL anywhere, so every real-code occurrence is a
    named argument; strings/quoted identifiers/comments are skipped."""
    real = {i for i, _, _ in _scan_top_level(sql)}
    out = list(sql)
    for i in range(len(sql) - 1):
        if sql[i] == ":" and sql[i + 1] == "=" and i in real:
            out[i] = "="
            out[i + 1] = ">"
    return "".join(out)


_UNSUPPORTED_JOINS = re.compile(
    r"\b(ASOF|POSITIONAL)\s+(?:LEFT\s+|RIGHT\s+|FULL\s+|INNER\s+)?JOIN\b",
    re.IGNORECASE,
)


_USING_SAMPLE = re.compile(
    r"\bUSING\s+SAMPLE\s+(?P<n>\d+(?:\.\d+)?)\s*"
    r"(?P<unit>%|PERCENT\b|ROWS\b)?"
    r"(?:\s*\(\s*(?P<method>[A-Za-z_]+)\s*"
    r"(?:,\s*(?P<seed>\d+)\s*)?\))?",
    re.IGNORECASE,
)
_USING_SAMPLE_METHOD = re.compile(
    r"\bUSING\s+SAMPLE\s+[A-Za-z_]+\s*\(", re.IGNORECASE
)


def rewrite_using_sample(sql: str) -> str:
    """DuckDB's ``USING SAMPLE`` clause → Spark's ``TABLESAMPLE``:
    ``USING SAMPLE 10%``/``10 PERCENT`` → ``TABLESAMPLE (10 PERCENT)``
    (both engines' percentage sampling is per-row bernoulli-style);
    ``USING SAMPLE 50 [ROWS]`` → ``TABLESAMPLE (50 ROWS)`` (DuckDB's
    bare number means rows). Both clauses sit in the same position
    (after the table reference), so the rewrite is positional-safe.

    Seeded bernoulli (the r13 verdict investigation, POSITIVE result):
    ``USING SAMPLE n% (bernoulli, seed)`` → ``TABLESAMPLE (n PERCENT)
    REPEATABLE (seed)``. Both sides are per-row Bernoulli(n/100) coin
    flips driven by a seeded PRNG, so the SEMANTICS carry faithfully:
    within-engine runs with the same seed over the same data return the
    same rows (Spark folds the partition index into the per-partition
    stream, so determinism holds for a fixed partitioning — repartition
    and the sample changes, exactly like DuckDB's own vector-order
    dependence), and the kept fraction concentrates at n%. The ROWS the
    two engines keep necessarily differ (different PRNG streams behind
    the same contract), so seeded samples are BOUNDS-pinned in pytest
    (determinism + fraction), never hash-graded — the same policy as
    unseeded sampling.

    ``reservoir``/``system`` methods keep the loud error: reservoir is
    an exact-k-rows ORDER-dependent algorithm and system is block-level
    sampling — neither matches Spark's per-row Bernoulli contract."""
    real = {i for i, _, _ in _scan_top_level(sql)}
    out, prev = [], 0
    for m in _USING_SAMPLE.finditer(sql):
        if m.start() not in real:
            continue
        n, unit = m.group("n"), (m.group("unit") or "").upper()
        method = (m.group("method") or "").lower()
        seed = m.group("seed")
        if method and method != "bernoulli":
            raise ValueError(
                f"USING SAMPLE ({method}, ...) has no faithful Spark "
                "TABLESAMPLE twin (reservoir = exact-k order-dependent, "
                "system = block-level); supported: USING SAMPLE n% "
                "[(bernoulli, seed)] / n PERCENT / n [ROWS]"
            )
        if method == "bernoulli" and unit not in ("%", "PERCENT"):
            raise ValueError(
                "USING SAMPLE (bernoulli, seed) needs a percentage "
                "(n% / n PERCENT); row-count bernoulli is not a "
                "DuckDB/Spark shared form"
            )
        if unit in ("%", "PERCENT"):
            repl = f"TABLESAMPLE ({n} PERCENT)"
            if seed is not None:
                repl += f" REPEATABLE ({seed})"
        else:
            repl = f"TABLESAMPLE ({int(float(n))} ROWS)"
        out.append(sql[prev : m.start()])
        out.append(repl)
        prev = m.end()
    out.append(sql[prev:])
    sql = "".join(out)
    m = _USING_SAMPLE_METHOD.search(sql)
    real = {i for i, _, _ in _scan_top_level(sql)}
    if m and m.start() in real:
        raise ValueError(
            "USING SAMPLE method forms (reservoir(n)/system(n)) "
            "have no Spark TABLESAMPLE twin; supported: USING SAMPLE n% "
            "[(bernoulli, seed)] / n PERCENT / n [ROWS]"
        )
    return sql


_SIMILAR_TO = re.compile(r"\b(?P<neg>NOT\s+)?SIMILAR\s+TO\b", re.IGNORECASE)
_STRING_LIT = re.compile(r"\s*'(?P<pat>(?:[^']|'')*)'")


def rewrite_similar_to(sql: str, escaped_literals: bool = False) -> str:
    """DuckDB's ``x SIMILAR TO 'pat'`` / ``x NOT SIMILAR TO 'pat'`` →
    Spark ``x [NOT] RLIKE '^(?:pat)$'``.

    DuckDB's SIMILAR TO is a FULL-STRING regular-expression match
    (regexp_full_match): the pattern is a plain regex, implicitly
    anchored at both ends, and ``%``/``_`` are NOT wildcards — verified
    empirically ('abc' SIMILAR TO 'a.c' → true, SIMILAR TO '%b%' →
    false, SIMILAR TO 'a_c' → false, 'xabcx' SIMILAR TO 'abc' → false).
    Spark's RLIKE is a substring search, so the rewrite anchors with a
    non-capturing group (alternations keep full-match scope). NULL
    propagation matches on both engines (NULL input → NULL → filtered).

    The reference translates SIMILAR TO patterns into anchored Java
    regexes for the CDX server filter at a DIFFERENT layer — the scan
    pushdown (src/internet_archive.cpp:704-721 SqlRegexToJavaRegex,
    src/common_crawl_index.cpp:1160-1197); that path also maps %/_/*
    into regex wildcards because it receives LIKE-shaped patterns too.
    This rewrite is the SQL-dialect half: plain DuckDB semantics over
    any column, already covered on the scan path by ``url_regex=``.

    Only string-LITERAL patterns rewrite (the overwhelmingly common
    form); a non-literal right-hand side raises a loud bind-time error
    with the manual recipe instead of Spark's cryptic parse failure.

    Backslash fidelity: DuckDB's standard single-quoted literals do NOT
    process backslash escapes (the regex receives ``\\d`` verbatim), but
    Spark's default parser (spark.sql.parser.escapedStringLiterals=
    false) DOES — an emitted ``'[a-z]+\\d+'`` would reach RLIKE as
    ``[a-z]+d+`` and silently mis-match (verified empirically, r15).
    ``escaped_literals`` mirrors the session's parser conf: when False
    (Spark default) every backslash in the pattern is doubled so the
    regex engine sees exactly what DuckDB's would; when True (the
    session pinned escapedStringLiterals=true, i.e. DuckDB literal
    semantics) the pattern passes through verbatim. ``duck_sql`` reads
    the conf and threads it here."""
    real = {i for i, _, _ in _scan_top_level(sql)}
    ms = [m for m in _SIMILAR_TO.finditer(sql) if m.start() in real]
    for m in reversed(ms):
        lit = _STRING_LIT.match(sql, m.end())
        if not lit:
            raise ValueError(
                "SIMILAR TO with a non-literal pattern has no textual "
                "Spark rewrite; use rlike(col, concat('^(?:', pat_expr, "
                "')$')) for DuckDB's full-string-match semantics"
            )
        neg = "NOT " if m.group("neg") else ""
        pat = lit.group("pat")
        if not escaped_literals:
            pat = pat.replace("\\", "\\\\")
        repl = f"{neg}RLIKE '^(?:{pat})$'"
        sql = sql[: m.start()] + repl + sql[lit.end():]
    return sql


_EXCL_CURRENT = re.compile(r"\s*EXCLUDE\s+CURRENT\s+ROW\s*$", re.IGNORECASE)
_EXCL_OTHER = re.compile(r"\bEXCLUDE\s+(TIES|GROUP)\b", re.IGNORECASE)
_EXCL_NOOP = re.compile(r"\s*EXCLUDE\s+NO\s+OTHERS\s*$", re.IGNORECASE)
_EXCL_AGG = re.compile(r"\b(?P<agg>sum|count|avg|min|max)\s*\(", re.IGNORECASE)
_ROWS_FRAME = re.compile(
    r"\bROWS\s+(?:BETWEEN\s+"
    r"(?P<lo>UNBOUNDED\s+PRECEDING|\d+\s+PRECEDING|CURRENT\s+ROW)\s+AND\s+"
    r"(?P<hi>UNBOUNDED\s+FOLLOWING|\d+\s+FOLLOWING|CURRENT\s+ROW)"
    r"|(?P<sh>UNBOUNDED\s+PRECEDING|\d+\s+PRECEDING|CURRENT\s+ROW))\s*$",
    re.IGNORECASE,
)
_FRAME_INCL = re.compile(
    r"\b(?:ROWS|RANGE)\s+(?:BETWEEN\s+"
    r"(?:UNBOUNDED\s+PRECEDING|\d+\s+PRECEDING|CURRENT\s+ROW)\s+AND\s+"
    r"(?:UNBOUNDED\s+FOLLOWING|\d+\s+FOLLOWING|CURRENT\s+ROW)"
    r"|(?:UNBOUNDED\s+PRECEDING|\d+\s+PRECEDING|CURRENT\s+ROW))\s*$",
    re.IGNORECASE,
)


def _strip_exclude_no_others(sql: str) -> str:
    """``EXCLUDE NO OTHERS`` is the explicit spelling of the default
    frame behavior for EVERY window function (not just the aggregates
    the EXCLUDE rewrite handles) — drop it from any window spec, so
    e.g. ``min(x) OVER (... EXCLUDE NO OTHERS)`` works as the no-op it
    is instead of hitting Spark's parser."""
    real = {i for i, _, _ in _scan_top_level(sql)}
    for m in reversed(list(_OVER_PAREN.finditer(sql))):
        if m.start() not in real:
            continue
        open_over = m.end() - 1
        try:
            over_close, _ = _call_args(sql, open_over)
        except ValueError:
            continue
        spec = sql[open_over + 1: over_close]
        nm = _EXCL_NOOP.search(spec)
        if nm:
            sql = sql[: open_over + 1] + spec[: nm.start()] + sql[over_close:]
    return sql


def _split_frame_minmax(agg: str, arg: str, base_spec: str) -> str:
    """``min``/``max`` under ``EXCLUDE CURRENT ROW`` on an explicit ROWS
    frame, via the split-frame recipe: the frame minus the current row
    is exactly ``[lo, 1 PRECEDING] ⊎ [1 FOLLOWING, hi]`` (positional
    bounds, so this is ONLY valid for ROWS mode — RANGE/GROUPS bounds
    are value-based and do not split at the current row's position).

        min(x) OVER (ROWS lo..hi EXCLUDE CURRENT ROW)
          → least(min(x) OVER (ROWS lo..1 PRECEDING),
                  min(x) OVER (ROWS 1 FOLLOWING..hi))

    Two window aggregates over the SAME partition/sort (one shuffle, no
    self-join — the q70 pattern). Spark's least/greatest skip NULLs
    (empty side → NULL → the other side wins; both empty → NULL), which
    is exactly DuckDB's min/max over the excluded frame. A frame bound
    already excluding the neighbouring side (lo = CURRENT ROW, or
    hi = CURRENT ROW) drops that branch structurally; the degenerate
    ``ROWS CURRENT ROW EXCLUDE CURRENT ROW`` (always-empty frame)
    constant-folds to NULL of the argument's type."""
    fm = _ROWS_FRAME.search(base_spec)
    prefix = base_spec[: fm.start()].strip()
    lo = (fm.group("lo") or fm.group("sh")).upper()
    hi = (fm.group("hi") or "CURRENT ROW").upper()

    def _n(bound: str) -> int:
        m = re.match(r"(\d+)", bound)
        return int(m.group(1)) if m else -1

    branches = []
    if "UNBOUNDED" in lo:
        branches.append(
            f"{agg}({arg}) OVER ({prefix} ROWS BETWEEN UNBOUNDED "
            f"PRECEDING AND 1 PRECEDING)"
        )
    elif "PRECEDING" in lo and _n(lo) >= 1:
        branches.append(
            f"{agg}({arg}) OVER ({prefix} ROWS BETWEEN {_n(lo)} "
            f"PRECEDING AND 1 PRECEDING)"
        )
    if "UNBOUNDED" in hi:
        branches.append(
            f"{agg}({arg}) OVER ({prefix} ROWS BETWEEN 1 FOLLOWING "
            f"AND UNBOUNDED FOLLOWING)"
        )
    elif "FOLLOWING" in hi and _n(hi) >= 1:
        branches.append(
            f"{agg}({arg}) OVER ({prefix} ROWS BETWEEN 1 FOLLOWING "
            f"AND {_n(hi)} FOLLOWING)"
        )
    comb = "least" if agg == "min" else "greatest"
    if len(branches) == 2:
        return f"{comb}({branches[0]}, {branches[1]})"
    if len(branches) == 1:
        return f"({branches[0]})"
    # always-empty frame: NULL, typed by the (never-evaluated) aggregate
    return (
        f"(CASE WHEN 1=0 THEN {agg}({arg}) OVER ({prefix} ROWS BETWEEN "
        f"CURRENT ROW AND CURRENT ROW) END)"
    )


def _rewrite_exclude_peers(
    out: str,
    sql: str,
    m,
    args: list[str],
    open_over: int,
    over_close: int,
    spec: str,
    em2,
) -> str:
    """EXCLUDE TIES / EXCLUDE GROUP for RANGE-mode (and default) frames:
    the current row's PEER GROUP is exactly the window
    ``RANGE BETWEEN CURRENT ROW AND CURRENT ROW`` over the same
    partition/order, and a RANGE frame whose bounds span the current row
    CONTAINS the whole peer group (peers share its order key), so

        EXCLUDE GROUP: agg(frame) ⊖ agg(peer group)
        EXCLUDE TIES:  agg(frame) ⊖ agg(peer group) ⊕ current row

    — two window aggregates over the SAME sort order (one shuffle, no
    self-join), with the n_other=0 → NULL empty-frame guard. ROWS-mode
    frames raise loudly: peers can lie OUTSIDE a ROWS frame, making the
    subtraction wrong (DuckDB's EXCLUDE there removes only the peers
    inside the frame — not expressible as frame arithmetic). A missing
    ORDER BY also raises (every partition row is then a peer; DuckDB
    returns NULL/empty for GROUP — say so rather than emulate a
    degenerate form)."""
    kind = em2.group("kind").upper()
    agg = m.group("agg").lower()
    if agg in ("min", "max"):
        raise ValueError(
            f"EXCLUDE {kind} with {agg}() has no frame-arithmetic "
            "rewrite (min/max are not subtractable); supported: "
            "sum/count/avg under EXCLUDE TIES/GROUP on RANGE frames, "
            "min/max only under EXCLUDE CURRENT ROW on ROWS frames"
        )
    arg = ", ".join(args).strip()
    base_spec = spec[: em2.start()].strip()
    fm = re.search(r"\b(ROWS|RANGE)\b", base_spec, re.IGNORECASE)
    mode = fm.group(1).upper() if fm else None
    if mode == "ROWS":
        raise ValueError(
            f"EXCLUDE {kind} over a ROWS frame has no faithful frame-"
            "arithmetic rewrite (peers of the current row can lie "
            "OUTSIDE a ROWS frame); use a RANGE frame, or restructure "
            "with a peer-group aggregate join"
        )
    if not re.search(r"\bORDER\s+BY\b", base_spec, re.IGNORECASE):
        raise ValueError(
            f"EXCLUDE {kind} without ORDER BY makes every partition row "
            "a peer (a degenerate frame); add an ORDER BY"
        )
    if mode == "RANGE" and not _FRAME_INCL.search(base_spec):
        raise ValueError(
            f"EXCLUDE {kind} rewrite supports RANGE frames that CONTAIN "
            f"the current row; this frame does not provably: {base_spec!r}"
        )
    if re.search(r"\bOVER\b|\brandom\s*\(|\buuid\s*\(", arg, re.IGNORECASE):
        raise ValueError(
            f"EXCLUDE {kind} rewrite substitutes the aggregate argument "
            f"textually; nested windows or volatile expressions are not "
            f"supported (got {arg!r})"
        )
    prefix = (base_spec[: fm.start()].strip() if fm else base_spec)
    w = f"({base_spec})"
    pw = f"({prefix} RANGE BETWEEN CURRENT ROW AND CURRENT ROW)"
    keep_cur = kind == "TIES"
    if agg == "count" and arg == "*":
        repl = f"(count(*) OVER {w} - count(*) OVER {pw}"
        repl += " + 1)" if keep_cur else ")"
    else:
        n_other = (
            f"(count({arg}) OVER {w} - count({arg}) OVER {pw}"
            + (
                f" + (CASE WHEN ({arg}) IS NULL THEN 0 ELSE 1 END))"
                if keep_cur
                else ")"
            )
        )
        s_excl = (
            f"sum({arg}) OVER {w} - COALESCE(sum({arg}) OVER {pw}, 0)"
            + (f" + COALESCE({arg}, 0)" if keep_cur else "")
        )
        if agg == "count":
            repl = n_other
        elif agg == "sum":
            repl = (
                f"(CASE WHEN {n_other} = 0 THEN NULL ELSE {s_excl} END)"
            )
        else:  # avg
            repl = (
                f"(CASE WHEN {n_other} = 0 THEN NULL ELSE "
                f"CAST({s_excl} AS DOUBLE) / {n_other} END)"
            )
    return out[: m.start()] + repl + out[over_close + 1:]


def rewrite_window_exclude(sql: str) -> str:
    """SQL:2011 window ``EXCLUDE CURRENT ROW`` (DuckDB implements the
    full EXCLUDE clause; Spark implements none of it) → frame arithmetic
    for the three decomposable aggregates:

        sum(e)   OVER (w EXCLUDE CURRENT ROW)
          → CASE WHEN n_other = 0 THEN NULL
                 ELSE sum(e) OVER (w) - COALESCE(e, 0) END
        count(e) OVER (w EXCLUDE CURRENT ROW) → n_other
        count(*) OVER (w EXCLUDE CURRENT ROW) → count(*) OVER (w) - 1
        avg(e)   OVER (w EXCLUDE CURRENT ROW)
          → CAST(sum_excl AS DOUBLE) / n_other   (NULL when n_other = 0)
        with n_other = count(e) OVER (w)
                       - CASE WHEN (e) IS NULL THEN 0 ELSE 1 END

    Exact because EXCLUDE CURRENT ROW removes ONLY the current row (its
    RANGE/ROWS peers stay). EXCLUDE TIES / EXCLUDE GROUP rewrite too,
    for RANGE-mode and default frames, via a second window aggregate
    over the peer group (see _rewrite_exclude_peers; ROWS frames raise —
    peers can lie outside a ROWS frame). The
    empty-after-exclusion case returns NULL, matching
    both engines' empty-frame sum/avg. Only frames that contain the
    current row qualify (default frame; BETWEEN bounds spanning it; the
    n-PRECEDING shorthand) — anything else raises rather than silently
    subtracting from a frame that never held the row. ``EXCLUDE NO
    OTHERS`` (the no-op spelling) is simply dropped. The aggregate
    argument is substituted textually (three references), so volatile
    expressions (random()) are rejected loudly. avg emits DOUBLE (both
    engines' avg over ints; decimal avg callers should cast
    explicitly). min/max rewrite too, for EXCLUDE CURRENT ROW on
    explicit ROWS frames, via the split-frame recipe (see
    _split_frame_minmax); any OTHER surviving EXCLUDE — unsupported
    aggregate, non-aggregate window function, or unqualifying frame —
    raises a loud bind-time error after the rewrite pass instead of
    falling through to Spark's cryptic parse failure."""
    sql = _strip_exclude_no_others(sql)
    real = {i for i, _, _ in _scan_top_level(sql)}
    out = sql
    # scan aggregate calls from the end so replacements keep indices valid
    for m in reversed(list(_EXCL_AGG.finditer(sql))):
        if m.start() not in real:
            continue
        try:
            close, args = _call_args(sql, m.end() - 1)
        except ValueError:
            continue
        om = re.match(r"\s*OVER\s*\(", sql[close + 1:], re.IGNORECASE)
        if not om:
            continue
        open_over = close + 1 + om.end() - 1
        try:
            over_close, _ = _call_args(sql, open_over)
        except ValueError:
            continue
        spec = sql[open_over + 1: over_close]
        if re.search(r"\bGROUPS\b", spec, re.IGNORECASE):
            continue  # GROUPS machinery owns that path (incl. its rejects)
        em = _EXCL_CURRENT.search(spec)
        if not em:
            em2 = re.search(
                r"\s*EXCLUDE\s+(?P<kind>TIES|GROUP)\s*$", spec, re.IGNORECASE
            )
            if em2:
                out = _rewrite_exclude_peers(
                    out, sql, m, args, open_over, over_close,
                    spec, em2,
                )
                continue
            if _EXCL_OTHER.search(spec):
                raise ValueError(
                    "unsupported EXCLUDE placement — EXCLUDE must be the "
                    "last clause of the window specification"
                )
            continue
        agg = m.group("agg").lower()
        arg = ", ".join(args).strip()
        base_spec = spec[: em.start()].strip()
        if base_spec and not (
            _FRAME_INCL.search(base_spec)
            or not re.search(r"\b(ROWS|RANGE)\b", base_spec, re.IGNORECASE)
        ):
            raise ValueError(
                "EXCLUDE CURRENT ROW rewrite supports frames that "
                "CONTAIN the current row (default frame, BETWEEN bounds "
                "spanning it, or the n-PRECEDING shorthand); this frame "
                f"does not provably contain it: {base_spec!r}"
            )
        if re.search(r"\bOVER\b|\brandom\s*\(|\buuid\s*\(", arg, re.IGNORECASE):
            raise ValueError(
                "EXCLUDE CURRENT ROW rewrite substitutes the aggregate "
                "argument textually; nested windows or volatile "
                f"expressions are not supported (got {arg!r})"
            )
        if agg in ("min", "max"):
            if not _ROWS_FRAME.search(base_spec):
                raise ValueError(
                    f"EXCLUDE CURRENT ROW with {agg}() rewrites only "
                    "for explicit ROWS frames (the split-frame recipe "
                    "is positional; min/max are not subtractable from "
                    "RANGE/default frames) — use a ROWS frame, or a "
                    "peer-group aggregate join"
                )
            repl = _split_frame_minmax(agg, arg, base_spec)
            out = out[: m.start()] + repl + out[over_close + 1:]
            continue
        w = f"({base_spec})" if base_spec else "()"
        if agg == "count" and arg == "*":
            repl = f"(count(*) OVER {w} - 1)"
        else:
            n_other = (
                f"(count({arg}) OVER {w} - "
                f"(CASE WHEN ({arg}) IS NULL THEN 0 ELSE 1 END))"
            )
            if agg == "count":
                repl = n_other
            elif agg == "sum":
                repl = (
                    f"(CASE WHEN {n_other} = 0 THEN NULL ELSE "
                    f"sum({arg}) OVER {w} - COALESCE({arg}, 0) END)"
                )
            else:  # avg
                repl = (
                    f"(CASE WHEN {n_other} = 0 THEN NULL ELSE "
                    f"CAST(sum({arg}) OVER {w} - COALESCE({arg}, 0) "
                    f"AS DOUBLE) / {n_other} END)"
                )
        out = out[: m.start()] + repl + out[over_close + 1:]
    # loud-bind-time-error policy: any EXCLUDE that survived the rewrite
    # pass (unsupported aggregate, non-aggregate window function, or an
    # unqualifying frame that slipped the per-aggregate checks) raises
    # here with the supported matrix, instead of reaching Spark's parser.
    # GROUPS-frame specs are exempt: rewrite_groups_frames owns them
    # (including their own EXCLUDE rejects) downstream of this pass.
    real_post = {i for i, _, _ in _scan_top_level(out)}
    for pm in _OVER_PAREN.finditer(out):
        if pm.start() not in real_post:
            continue
        p_open = pm.end() - 1
        try:
            p_close, _ = _call_args(out, p_open)
        except ValueError:
            continue
        p_spec = out[p_open + 1: p_close]
        if re.search(r"\bGROUPS\b", p_spec, re.IGNORECASE):
            continue
        ex = re.search(r"\bEXCLUDE\b", p_spec, re.IGNORECASE)
        if ex and (p_open + 1 + ex.start()) in real_post:
            raise ValueError(
                "unsupported window EXCLUDE: rewrites exist for "
                "sum/count/avg EXCLUDE CURRENT ROW (frames containing "
                "the current row), sum/count/avg EXCLUDE TIES/GROUP on "
                "RANGE frames, and min/max EXCLUDE CURRENT ROW on ROWS "
                "frames; EXCLUDE NO OTHERS is dropped for every window "
                f"function. Offending window spec: {p_spec.strip()!r}"
            )
    return out


_GROUPS_FRAME = re.compile(r"\bGROUPS\s+BETWEEN\b|\bGROUPS\s+\d+\s+PRECEDING\b"
                           r"|\bGROUPS\s+CURRENT\s+ROW\b|\bGROUPS\s+UNBOUNDED\b",
                           re.IGNORECASE)


_OVER_PAREN = re.compile(r"\bOVER\s*\(", re.IGNORECASE)
_GROUPS_BOUND = (
    r"UNBOUNDED\s+PRECEDING|UNBOUNDED\s+FOLLOWING|CURRENT\s+ROW|"
    r"\d+\s+PRECEDING|\d+\s+FOLLOWING"
)
_GROUPS_SPEC = re.compile(
    r"GROUPS\s+(?:BETWEEN\s+(?P<lo>" + _GROUPS_BOUND + r")\s+AND\s+(?P<hi>"
    + _GROUPS_BOUND
    + r")|(?P<solo>UNBOUNDED\s+PRECEDING|CURRENT\s+ROW|\d+\s+PRECEDING))\s*$",
    re.IGNORECASE,
)
_WINSPEC = re.compile(
    r"^\s*(?:PARTITION\s+BY\s+(?P<part>.+?)\s+)?ORDER\s+BY\s+(?P<ord>.+?)"
    r"\s*(?P<frame>\bGROUPS\b.*)$",
    re.IGNORECASE | re.DOTALL,
)


def rewrite_groups_frames(sql: str) -> str | None:
    """Auto-rewrite SIMPLE bounded GROUPS window frames — the exact
    dense_rank+RANGE recipe the loud rejection prints, applied
    mechanically: a GROUPS frame counts PEER GROUPS of the window's own
    ordering, and dense_rank() over that ordering numbers the peer
    groups 1..G consecutively, so

        f(x) OVER (PARTITION BY p ORDER BY o GROUPS BETWEEN a AND b)
      ≡ f(x) OVER (PARTITION BY p ORDER BY rk RANGE BETWEEN a AND b)
        ... FROM (SELECT *, dense_rank() OVER (PARTITION BY p
                                               ORDER BY o) AS rk ...)

    (DESC / NULLS FIRST orderings are encoded IN the rank, so the RANGE
    always runs ascending over rk; the shorthand ``GROUPS n PRECEDING``
    means BETWEEN n PRECEDING AND CURRENT ROW, as in the standard).
    Cross-engine byte-equality is pinned in tests — DuckDB runs native
    GROUPS, Spark runs this rewrite.

    Returns None (→ the existing loud rejection) for shapes where the
    textual recipe is NOT faithful: EXCLUDE clauses, frames without
    ORDER BY, DISTINCT selects, statements with top-level GROUP BY /
    HAVING / set ops / QUALIFY / WINDOW clauses (the injected subquery
    would change evaluation order), and GROUPS inside subqueries (the
    rank column would be out of scope)."""
    if not re.search(r"\bGROUPS\b", sql, re.IGNORECASE):
        return None
    stripped = sql.strip()
    while stripped.endswith(";"):
        stripped = stripped[:-1].rstrip()
    m0 = re.match(r"\s*SELECT\s+", stripped, re.IGNORECASE)
    if not m0:
        return None
    frm = _find_keyword(stripped, "FROM")
    if frm == -1:
        return None
    sel = stripped[m0.end():frm]
    if re.match(r"\s*DISTINCT\b", sel, re.IGNORECASE):
        return None
    tail = stripped[frm + len("FROM"):]
    for kw in ("GROUP", "HAVING", "UNION", "INTERSECT", "EXCEPT",
               "QUALIFY", "WINDOW"):
        if _find_keyword(tail, kw) != -1:
            return None
    cut = len(tail)
    for kw in ("ORDER", "LIMIT", "OFFSET"):
        i = _find_keyword(tail, kw)
        if i != -1:
            cut = min(cut, i)
    body, trailing = tail[:cut].strip(), tail[cut:].strip()
    if not body:
        return None

    # distinguish expression parens (CAST(...), f(...), arithmetic) from
    # SUBQUERY parens: a window may sit at any expression depth — the
    # injected rank column stays in scope — but inside a nested SELECT
    # the rank would be out of scope, so those bail to the loud error
    real_positions = {}
    sq_open = 0
    sq_stack: list[bool] = []
    for i, c, _d in _scan_top_level(sel):
        if c == "(":
            is_sq = re.match(r"\s*SELECT\b", sel[i + 1:], re.IGNORECASE)
            sq_stack.append(bool(is_sq))
            sq_open += bool(is_sq)
        elif c == ")" and sq_stack:
            sq_open -= sq_stack.pop()
        real_positions[i] = sq_open
    ranks: dict[tuple[str, str], tuple[str, str, str]] = {}
    spans: list[tuple[int, int, str]] = []
    for m in _OVER_PAREN.finditer(sel):
        if m.start() not in real_positions:
            continue
        open_idx = m.end() - 1
        try:
            close, _ = _call_args(sel, open_idx)
        except ValueError:
            return None
        spec = sel[open_idx + 1: close]
        if not re.search(r"\bGROUPS\b", spec, re.IGNORECASE):
            continue
        if real_positions[m.start()] != 0:
            return None  # GROUPS inside a subquery — rank out of scope
        wm = _WINSPEC.match(spec)
        if not wm:
            return None
        fm = _GROUPS_SPEC.match(wm.group("frame"))
        if not fm:
            return None  # EXCLUDE / exotic bounds — keep the loud error
        part = (wm.group("part") or "").strip()
        order = wm.group("ord").strip()
        key = (
            re.sub(r"\s+", " ", part).lower(),
            re.sub(r"\s+", " ", order).lower(),
        )
        if key not in ranks:
            ranks[key] = (f"__grp_rk_{len(ranks)}", part, order)
        name = ranks[key][0]
        if fm.group("solo") is not None:
            lo, hi = fm.group("solo"), "CURRENT ROW"
        else:
            lo, hi = fm.group("lo"), fm.group("hi")
        pb = f"PARTITION BY {part} " if part else ""
        spans.append((
            m.start(), close + 1,
            f"OVER ({pb}ORDER BY {name} RANGE BETWEEN {lo} AND {hi})",
        ))
    if not spans:
        return None
    new_sel = sel
    for s, e, repl in reversed(spans):
        new_sel = new_sel[:s] + repl + new_sel[e:]
    rk_defs = ", ".join(
        f"dense_rank() OVER ({('PARTITION BY ' + p + ' ') if p else ''}"
        f"ORDER BY {o}) AS {nm}"
        for nm, p, o in ranks.values()
    )
    out = (
        f"SELECT {new_sel.strip()} FROM "
        f"(SELECT *, {rk_defs} FROM {body}) __grp_src"
    )
    if trailing:
        out += f" {trailing}"
    return out


def _reject_groups_frames(sql: str) -> None:
    """DuckDB supports SQL:2011 GROUPS window frames; Spark only ROWS and
    RANGE. The SIMPLE bounded forms are auto-rewritten first
    (rewrite_groups_frames — the dense_rank+RANGE recipe); whatever
    reaches here (EXCLUDE clauses, GROUPS in subqueries, set-op /
    GROUP BY statements) has no faithful textual rewrite. Raise a clear
    bind-time error with the manual recipe instead of Spark's parse
    error."""
    real = {i for i, _, _ in _scan_top_level(sql)}
    for m in _GROUPS_FRAME.finditer(sql):
        if m.start() in real:
            raise ValueError(
                "GROUPS window frames are DuckDB/SQL:2011 syntax Spark "
                "does not implement; rewrite as a dense_rank() pre-pass "
                "over the window ordering, then a RANGE frame on that "
                "rank (exact GROUPS semantics, one extra window column)"
            )


_ASOF_KEYWORD = re.compile(r"\bASOF\s+(?P<left>LEFT\s+)?JOIN\b", re.IGNORECASE)
_ASOF_LTABLE = re.compile(
    # the FROM/JOIN/comma guard keeps an alias-less table from parsing
    # as lt=FROM la=<table> (re.search is leftmost-first)
    r"\b(?P<lt>(?!(?:FROM|JOIN|WHERE|AND|ON)\b)[A-Za-z_][\w.]*)"
    r"(?:\s+(?:AS\s+)?(?P<la>[A-Za-z_]\w*))?\s*$",
    re.IGNORECASE,
)
_ASOF_RTABLE = re.compile(
    r"\s*(?P<rt>[A-Za-z_][\w.]*)"
    r"(?:\s+(?:AS\s+)?(?P<ra>(?!ON\b|USING\b)[A-Za-z_]\w*))?"
    r"\s+(?:ON\s+(?P<on>(?:(?!\b(?:WHERE|GROUP|ORDER|LIMIT|HAVING|QUALIFY|"
    r"WINDOW|UNION|INTERSECT|EXCEPT|JOIN|ASOF|POSITIONAL)\b)[^();])+)"
    r"|USING\s*\((?P<using>[^)]*)\))",
    re.IGNORECASE,
)
_ASOF_COND = re.compile(
    r"^\s*(?P<a>[A-Za-z_]\w*)\s*\.\s*(?P<ac>[A-Za-z_]\w*)\s*"
    r"(?P<op>>=|<=|=|<|>)\s*"
    r"(?P<b>[A-Za-z_]\w*)\s*\.\s*(?P<bc>[A-Za-z_]\w*)\s*$"
)
_ASOF_RECIPE = (
    "the ASOF JOIN rewrite handles the simple form "
    "'lhs [AS l] ASOF [LEFT] JOIN rhs [AS r] ON l.k = r.k [AND ...] "
    "AND l.t >= r.t' over resolvable tables/views with "
    "alias-qualified column conditions; for anything richer, compose "
    "it as a union + last-carry-forward window (the q49 pattern in "
    "queries/windows.py — exact ASOF semantics, one shuffle)"
)
_ASOF_N = [0]


def _asof_flip(op: str) -> str:
    return {">=": "<=", "<=": ">=", ">": "<", "<": ">", "=": "="}[op]


def _rewrite_one_asof(spark, sql: str, m) -> str:
    """Rewrite ONE simple-form ASOF JOIN (at keyword match ``m``) into
    the q49 union + last-carry-forward window, as a derived table. See
    rewrite_asof_join for the contract."""
    lm = _ASOF_LTABLE.search(sql[: m.start()])
    if not lm:
        raise ValueError(
            "ASOF JOIN left side is not a plain table reference; "
            + _ASOF_RECIPE
        )
    head = sql[: lm.start()]
    prev = re.search(r"([A-Za-z_]\w*|,)\s*$", head)
    if not (prev and prev.group(1).upper() in ("FROM", ",")):
        raise ValueError(
            "ASOF JOIN rewrite requires the left table directly after "
            "FROM (chained joins are not the simple form); " + _ASOF_RECIPE
        )
    rm = _ASOF_RTABLE.match(sql, m.end())
    if not rm:
        raise ValueError(
            "could not parse the ASOF JOIN right side / ON clause; "
            + _ASOF_RECIPE
        )
    if re.search(r"\bSELECT\s+\*", sql, re.IGNORECASE):
        raise ValueError(
            "bare SELECT * over an ASOF JOIN is not supported by the "
            "rewrite (its derived table exposes struct aliases plus "
            "unambiguous flat columns, not DuckDB's exact * order); "
            "list the columns, or use l.*, r.*"
        )
    lt, la = lm.group("lt"), lm.group("la") or lm.group("lt").split(".")[-1]
    rt, ra = rm.group("rt"), rm.group("ra") or rm.group("rt").split(".")[-1]
    if la.lower() == ra.lower():
        raise ValueError(
            f"ASOF JOIN sides share the alias {la!r}; alias them apart"
        )

    def _schema(name):
        try:
            return spark.table(name).schema
        except Exception as e:  # noqa: BLE001 — surface the recipe
            raise ValueError(
                f"ASOF JOIN rewrite needs a resolvable table/view for "
                f"{name!r} (register a temp view first): {e}"
            ) from None

    ls, rs = _schema(lt), _schema(rt)
    lcols = [f.name for f in ls.fields]
    rcols = [f.name for f in rs.fields]
    ltype, rtype = ls.simpleString(), rs.simpleString()

    eqs: list[tuple[str, str]] = []
    ineq = None
    using_set: set[str] = set()
    if rm.group("using") is not None:
        # DuckDB's ASOF USING form (verified empirically): equality on
        # every column but the LAST, which carries the implicit
        # ``l.t >= r.t`` backward-inclusive inequality; bare references
        # to USING names resolve to the LEFT side's values.
        cols = [c.strip() for c in rm.group("using").split(",")]
        if not cols or not all(
            re.fullmatch(r"[A-Za-z_]\w*", c or "") for c in cols
        ):
            raise ValueError(
                "ASOF JOIN USING needs a comma-separated list of plain "
                "column names; " + _ASOF_RECIPE
            )
        for c in cols:
            if c not in lcols or c not in rcols:
                raise ValueError(
                    f"ASOF JOIN USING column {c!r} must exist on both "
                    f"sides ({lt!r}, {rt!r})"
                )
        using_set = set(cols)
        eqs = [(c, c) for c in cols[:-1]]
        ineq = (cols[-1], cols[-1], ">=")
        conds = []
    else:
        conds = re.split(r"\bAND\b", rm.group("on"), flags=re.IGNORECASE)
    alias_map = {la.lower(): "l", ra.lower(): "r"}
    for cond in conds:
        cm = _ASOF_COND.match(cond)
        if not cm:
            raise ValueError(
                f"unsupported ASOF JOIN condition {cond.strip()!r} "
                "(needs alias-qualified 'a.col OP b.col'); " + _ASOF_RECIPE
            )
        a_side = alias_map.get(cm.group("a").lower())
        b_side = alias_map.get(cm.group("b").lower())
        if a_side == "l" and b_side == "r":
            lc, rc, op = cm.group("ac"), cm.group("bc"), cm.group("op")
        elif a_side == "r" and b_side == "l":
            lc, rc, op = cm.group("bc"), cm.group("ac"), _asof_flip(
                cm.group("op")
            )
        else:
            raise ValueError(
                f"ASOF JOIN condition {cond.strip()!r} must compare the "
                "two join sides; " + _ASOF_RECIPE
            )
        if op == "=":
            eqs.append((lc, rc))
        elif ineq is not None:
            raise ValueError(
                "ASOF JOIN needs exactly ONE inequality condition "
                "(got several); " + _ASOF_RECIPE
            )
        else:
            ineq = (lc, rc, op)
    if ineq is None:
        raise ValueError(
            "ASOF JOIN needs an inequality condition on the ordering "
            "column; " + _ASOF_RECIPE
        )
    lt_t, rt_t, op = ineq
    tdir = "ASC" if op in (">=", ">") else "DESC"
    sdir = "ASC" if op in (">=", "<=") else "DESC"

    _ASOF_N[0] += 1
    n = _ASOF_N[0]
    l_struct = ", ".join(f"'{c}', {la}.{c}" for c in lcols)
    r_struct = ", ".join(f"'{c}', {ra}.{c}" for c in rcols)
    k_l = "".join(f", {la}.{c} AS __k{i}" for i, (c, _) in enumerate(eqs))
    k_r = "".join(f", {ra}.{c} AS __k{i}" for i, (_, c) in enumerate(eqs))
    r_notnull = " AND ".join(
        [f"{ra}.{c} IS NOT NULL" for _, c in eqs] + [f"{ra}.{rt_t} IS NOT NULL"]
    )
    part = (
        "PARTITION BY " + ", ".join(f"__k{i}" for i in range(len(eqs))) + " "
        if eqs
        else ""
    )
    union = (
        f"SELECT named_struct({l_struct}) AS __l{k_l}, {la}.{lt_t} AS __t, "
        f"1 AS __side, CAST(NULL AS {rtype}) AS __r FROM {lt} AS {la} "
        f"UNION ALL "
        f"SELECT CAST(NULL AS {ltype}){k_r}, {ra}.{rt_t}, 0, "
        f"named_struct({r_struct}) FROM {rt} AS {ra} WHERE {r_notnull}"
    )
    mid = (
        f"SELECT __l, __side, last(__r, true) OVER ({part}ORDER BY "
        f"__t {tdir}, __side {sdir} ROWS BETWEEN UNBOUNDED PRECEDING AND "
        f"CURRENT ROW) AS __m FROM ({union}) __asof_u{n}"
    )
    matched = (
        f"SELECT __l, CASE WHEN __l.{lt_t} IS NULL THEN "
        f"CAST(NULL AS {rtype}) ELSE __m END AS __match "
        f"FROM ({mid}) __asof_m{n} WHERE __side = 1"
    )
    amb = set(lcols) & set(rcols)
    # USING names are deliberately flat FROM THE LEFT side (DuckDB's
    # coalescing rule for the bare reference); other ambiguous names
    # stay struct-qualified-only, as on DuckDB
    flat = [
        f"__l.{c} AS {c}" for c in lcols if c not in amb or c in using_set
    ] + [f"__match.{c} AS {c}" for c in rcols if c not in amb]
    inner_filter = "" if m.group("left") else " WHERE __match IS NOT NULL"
    final = (
        "SELECT "
        + ", ".join(flat + [f"__l AS {la}", f"__match AS {ra}"])
        + f" FROM ({matched}) __asof_f{n}{inner_filter}"
    )
    return sql[: lm.start()] + f"({final}) __asof_{n} " + sql[rm.end():]


def rewrite_asof_join(spark, sql: str) -> str:
    """DuckDB ``ASOF [LEFT] JOIN`` (simple form) → the q49 union +
    last-carry-forward-window composition, emitted as a derived table.

    The simple form is ``lhs [AS l] ASOF [LEFT] JOIN rhs [AS r] ON
    <alias-qualified equalities> AND <ONE alias-qualified inequality>``
    with both sides resolvable tables/views (their schemas type the
    NULL half of each union branch). Semantics per DuckDB
    (src/reference docs): for each left row, the matching right row is
    the one with the LARGEST r.t satisfying ``l.t >= r.t`` (or ``>``
    strict; symmetric SMALLEST for ``<=``/``<``), within the equality
    group; inner drops unmatched left rows, LEFT keeps them with NULL
    right columns. NULL equality keys and NULL ordering values never
    match, as in a real join (right-side NULLs are filtered before the
    union; left-side NULLs are guarded after the carry).

    The derived table exposes BOTH side aliases as STRUCT columns (so
    ``l.x`` / ``r.y`` and ``l.*`` / ``r.*`` resolve exactly as DuckDB
    qualifies them) plus flat columns for every UNambiguous name (so
    unqualified references work; ambiguous names require qualification,
    as on DuckDB). Bare ``SELECT *`` is rejected loudly — its flat
    expansion order is not reproducible through the struct form.

    Scale shape (why this beats a range-join translation): ONE shuffle
    on the equality keys, one window pass — no range-condition join
    explosion, no broadcast-nested-loop; with NO equality key the
    window is a single global sort, which is DuckDB's shape for that
    query too. Ties among right rows equal on (keys, t) are unspecified
    on BOTH engines (DuckDB docs call the pick arbitrary) — dedupe the
    right side (the q49 groupBy-max idiom) for deterministic output.
    POSITIONAL JOIN stays rejected: it pairs rows by physical scan
    order, which a distributed engine cannot reproduce deterministically
    (Spark has no stable global row order without an explicit key)."""
    while True:
        real = {i for i, _, _ in _scan_top_level(sql)}
        target = None
        for m in _ASOF_KEYWORD.finditer(sql):
            if m.start() not in real:
                continue
            prev = re.search(r"([A-Za-z_]\w*|,)\s*$", sql[: m.start()])
            if prev and prev.group(1).upper() in ("FROM", "JOIN", ","):
                continue  # a table literally named "asof" in table position
            target = m
            break
        if target is None:
            return sql
        sql = _rewrite_one_asof(spark, sql, target)


def _reject_unsupported_joins(sql: str) -> None:
    """DuckDB's ASOF JOIN / POSITIONAL JOIN have no Spark SQL spelling and
    no safe TEXTUAL rewrite (an asof rewrite needs a per-left-row identity
    to rank on, which arbitrary SQL doesn't expose). Raise a clear
    bind-time error with the supported path instead of letting Spark's
    parser produce a cryptic failure."""
    real = {i for i, _, _ in _scan_top_level(sql)}
    for m in _UNSUPPORTED_JOINS.finditer(sql):
        if m.start() not in real:
            continue
        # In DuckDB's syntax the keyword FOLLOWS a table reference
        # (FROM t1 ASOF JOIN t2). If the immediately preceding token is
        # FROM/JOIN/',', then "asof"/"positional" is itself a table
        # name or alias in table position (FROM asof JOIN x) — legal SQL
        # on both engines, not the join operator. (A table reference
        # cannot directly follow ON, so ON needs no entry here.)
        prev = re.search(r"([A-Za-z_]\w*|,)\s*$", sql[: m.start()])
        if prev and prev.group(1).upper() in ("FROM", "JOIN", ","):
            continue
        kind = m.group(1).upper()
        hint = (
            "compose it as a union + last-carry-forward window (the q49 "
            "pattern in queries/windows.py — exact ASOF semantics, one "
            "shuffle)"
            if kind == "ASOF"
            else "zip by row_number() over an explicit ordering on each side"
        )
        raise ValueError(
            f"{kind} JOIN is DuckDB-specific syntax with no Spark SQL "
            f"equivalent; {hint}"
        )


_UNPIVOT_STMT = re.compile(
    r"^\s*UNPIVOT\s+(?P<tbl>[A-Za-z_][\w.]*)"
    r"\s+ON\s+(?P<cols>.+?)"
    r"\s+INTO\s+NAME\s+(?P<name>[A-Za-z_]\w*)"
    r"\s+VALUE\s+(?P<val>.+?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)

_IDENT = re.compile(r"^[A-Za-z_]\w*$")


def rewrite_unpivot_statement(sql: str) -> str | None:
    """DuckDB's UNPIVOT *statement* form

        UNPIVOT tbl ON c1, c2, ... INTO NAME n VALUE v

    → the SQL-standard relational form both engines parse natively
    (Spark since 3.4):

        SELECT * FROM tbl UNPIVOT (v FOR n IN (c1, c2, ...))

    Returns None when the statement is not the UNPIVOT form (the common
    case — callers fall through to the normal rewrite chain). The
    standard form itself needs NO rewrite: Spark's parser accepts it,
    with the same EXCLUDE-NULLS default as DuckDB, so duck_sql passes it
    straight through. Only the simple statement shape is rewritten;
    DuckDB-only elaborations (``ON COLUMNS(* EXCLUDE ...)``, per-column
    aliases, multi-column ``VALUE v1, v2``) raise a loud bind-time
    ValueError pointing at the standard form instead of dying in Spark's
    parser."""
    if not re.match(r"^\s*UNPIVOT\b", sql, re.IGNORECASE):
        return None
    m = _UNPIVOT_STMT.match(sql)
    if not m:
        raise ValueError(
            "unsupported UNPIVOT statement shape; supported: "
            "UNPIVOT <table> ON <col>[, <col>...] INTO NAME <name> "
            "VALUE <value> — or use the SQL-standard form "
            "SELECT ... FROM t UNPIVOT (v FOR n IN (c1, c2, ...)), "
            "which runs unrewritten on both engines"
        )
    cols = [c.strip() for c in m.group("cols").split(",")]
    bad = [c for c in cols if not _IDENT.match(c)]
    if bad or re.match(r"(?i)^\s*COLUMNS\s*\(", m.group("cols")):
        raise ValueError(
            f"UNPIVOT ON supports plain column identifiers only "
            f"(got {bad or [m.group('cols').strip()]}); COLUMNS(...) "
            "expressions and per-column aliases have no Spark twin — "
            "list the columns explicitly"
        )
    val = m.group("val").strip()
    if not _IDENT.match(val):
        raise ValueError(
            "UNPIVOT INTO ... VALUE supports exactly one value column "
            f"(got {val!r}); multi-column unpivot has no Spark twin — "
            "run one UNPIVOT per value column and join on the NAME column"
        )
    return (
        f"SELECT * FROM {m.group('tbl')} UNPIVOT "
        f"({val} FOR {m.group('name')} IN ({', '.join(cols)}))"
    )


_PIVOT_STMT = re.compile(
    r"^\s*PIVOT\s+(?P<tbl>[A-Za-z_][\w.]*)"
    r"\s+ON\s+(?P<col>[A-Za-z_]\w*)"
    r"(?:\s+IN\s*\((?P<vals>[^()]*)\))?"
    r"\s+USING\s+(?P<agg>[A-Za-z_]\w*\s*\([^()]*\))"
    r"(?:\s+GROUP\s+BY\s+(?P<grp>[^()]+?))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)

_PIVOT_AUTODETECT_CAP = 10_000


def _pivot_alias(raw: str) -> str:
    """DuckDB names a pivoted column after the VALUE itself (quotes
    stripped); Spark needs an explicit alias to reproduce that."""
    v = raw.strip()
    if len(v) >= 2 and v[0] == v[-1] and v[0] in ("'", '"'):
        q = v[0]
        v = v[1:-1].replace(q + q, q)  # un-double escaped quotes: '' → '
    return v.replace("`", "")


def rewrite_pivot_statement(spark: SparkSession | None, sql: str) -> str | None:
    """DuckDB's PIVOT *statement* form

        PIVOT tbl ON col [IN (v1, v2, ...)] USING agg(x) [GROUP BY g, ...]

    → the SQL-standard relational form Spark parses natively:

        SELECT * FROM tbl PIVOT (agg(x) FOR col IN (v1 AS `v1`, ...))

    Returns None when the statement is not the PIVOT form. Semantics
    parity: with no GROUP BY, BOTH engines group by every remaining
    column; with GROUP BY, the input is pre-projected to exactly the
    group columns + pivot column + the aggregate's argument (so Spark's
    implicit all-remaining-columns rule sees only the DuckDB group
    list); pivoted columns are named after the bare value on both
    engines (the alias list). Without an IN list, DuckDB enumerates the
    distinct values of the pivot column at bind time by scanning — this
    rewrite does EXACTLY that (one driver-side DISTINCT, sorted, capped
    at 10k values, NULL excluded), which is the reference semantics,
    not a shortcut; pass IN (...) to avoid the scan. Multi-column ON,
    multiple USING aggregates, and USING aliases raise loud bind-time
    errors pointing at the supported shape."""
    if not re.match(r"^\s*PIVOT\b", sql, re.IGNORECASE):
        return None
    m = _PIVOT_STMT.match(sql)
    if not m:
        raise ValueError(
            "unsupported PIVOT statement shape; supported: "
            "PIVOT <table> ON <col> [IN (v1, v2, ...)] USING <agg>(<arg>) "
            "[GROUP BY <cols>] — one pivot column, one unaliased "
            "aggregate; or use the SQL-standard form SELECT ... FROM t "
            "PIVOT (agg(x) FOR col IN (...))"
        )
    tbl, col, agg = m.group("tbl"), m.group("col"), m.group("agg").strip()
    if m.group("vals") is not None:
        vals = [v.strip() for v in m.group("vals").split(",") if v.strip()]
        if not vals:
            raise ValueError("PIVOT ... IN () needs at least one value")
    else:
        if spark is None:
            raise ValueError(
                "PIVOT without an IN list needs a SparkSession to "
                "enumerate distinct pivot values (the DuckDB bind-time "
                "scan); pass IN (...) explicitly"
            )
        rows = (
            spark.sql(
                f"SELECT DISTINCT {col} FROM {tbl} WHERE {col} IS NOT NULL "
                f"ORDER BY {col} LIMIT {_PIVOT_AUTODETECT_CAP + 1}"
            ).collect()
        )
        if len(rows) > _PIVOT_AUTODETECT_CAP:
            raise ValueError(
                f"PIVOT auto-detect found more than {_PIVOT_AUTODETECT_CAP} "
                f"distinct values in {col}; pass IN (...) explicitly"
            )
        vals = []
        for r in rows:
            v = r[0]
            # escape embedded quotes by doubling (O'Brien → 'O''Brien');
            # non-literal-friendly types (dates, decimals, binary) would
            # interpolate wrong — refuse loudly rather than emit bad SQL
            if isinstance(v, str):
                vals.append("'" + v.replace("'", "''") + "'")
            elif isinstance(v, bool) or isinstance(v, (int, float)):
                vals.append(str(v))
            else:
                raise ValueError(
                    f"PIVOT auto-detect supports str/int/float/bool pivot "
                    f"values only (got {type(v).__name__} in {col}); pass "
                    f"IN (...) with explicit literals"
                )
    in_list = ", ".join(f"{v} AS `{_pivot_alias(v)}`" for v in vals)
    src = tbl
    if m.group("grp"):
        grp = [g.strip() for g in m.group("grp").split(",")]
        bad = [g for g in grp if not _IDENT.match(g)]
        if bad:
            raise ValueError(
                f"PIVOT GROUP BY supports plain column identifiers only "
                f"(got {bad})"
            )
        arg = agg[agg.index("(") + 1 : agg.rindex(")")].strip()
        keep = list(dict.fromkeys(grp + [col]))
        if arg not in ("", "*") and _IDENT.match(arg) and arg not in keep:
            keep.append(arg)
        elif arg not in ("", "*") and not _IDENT.match(arg):
            raise ValueError(
                "PIVOT with GROUP BY supports a single plain-column "
                f"aggregate argument (got {arg!r}) — pre-project the "
                "expression in a view, or use the SQL-standard form"
            )
        src = f"(SELECT {', '.join(keep)} FROM {tbl})"
    out = f"SELECT * FROM {src} PIVOT ({agg} FOR {col} IN ({in_list}))"
    # DuckDB fills empty (group, value) cells of a count aggregate with 0;
    # Spark's PIVOT yields NULL (verified empirically on both engines).
    # The pivoted column aliases are known, so wrap in an outer SELECT
    # that coalesces each one — star-EXCEPT keeps the group columns (and
    # their order) without needing the table schema at rewrite time.
    if re.match(r"count\s*\(", agg, re.IGNORECASE):
        aliases = [f"`{_pivot_alias(v)}`" for v in vals]
        coal = ", ".join(f"COALESCE({a}, 0) AS {a}" for a in aliases)
        out = (
            f"SELECT * EXCEPT ({', '.join(aliases)}), {coal} FROM ({out})"
        )
    return out


# table function → the reader option its LIMIT pushdown sets (the CDX
# scans use max_results with per-crawl division; d1_scan re-serializes a
# literal LIMIT into the remote SQL — src/d1_scan.cpp:325-393)
_SCAN_LIMIT_FNS = {
    "common_crawl_index": "max_results",
    "wayback_machine": "max_results",
    "d1_scan": "limit",
}


def rewrite_scan_limit(sql: str) -> str:
    """The reference's LIMIT pushdown for federated scans, duck_sql half
    (src/common_crawl_index.cpp:1474-1526 deletes a LIMIT sitting directly
    on the scan and sets the CDX ``&limit=``; same for the IA path): when
    the statement is exactly

        SELECT <plain columns or *> FROM common_crawl_index(...) [alias]
        LIMIT n

    — no WHERE / DISTINCT / GROUP BY / ORDER BY / OFFSET / joins / set
    ops, i.e. the LIMIT sits directly above the scan, the reference's own
    pushdown condition — inject ``max_results => n`` into the call so the
    CDX fetch is capped server-side (divided per crawl with ceiling
    division — the reference's limit-division semantics, which accepts
    under-fill when one crawl has fewer matches). The textual LIMIT stays
    in the statement: as in ``read_common_crawl(limit=...)``, the option
    caps the fetch and Spark still enforces the exact ``n``. An explicit
    ``max_results`` argument always wins (never overridden).

    Select lists with ANY parenthesized expression are left alone: an
    aggregate without GROUP BY (``SELECT count(*) ...``) collapses to one
    row, and capping its scan would change the answer — the plain-columns
    restriction makes that class unreachable instead of enumerating
    aggregate names. A bare DataFrame ``.load().limit(n)`` still cannot
    reach the scan (no PySpark DataSource limit hook — the documented
    structural residual; use the wrapper/option path)."""
    stripped = sql.strip()
    while stripped.endswith(";"):
        stripped = stripped[:-1].rstrip()
    up = stripped.upper()
    if not up.startswith("SELECT") or "LIMIT" not in up:
        return sql
    frm = _find_keyword(stripped, "FROM")
    if frm == -1:
        return sql
    sel_list = stripped[len("SELECT"):frm]
    if "(" in sel_list or re.match(r"\s*DISTINCT\b", sel_list, re.IGNORECASE):
        return sql
    m = re.match(
        r"\s*(" + "|".join(_SCAN_LIMIT_FNS) + r")\s*\(",
        stripped[frm + len("FROM"):],
        re.IGNORECASE,
    )
    if not m:
        return sql
    open_idx = frm + len("FROM") + m.end() - 1
    try:
        close, args = _call_args(stripped, open_idx)
    except ValueError:
        return sql
    fn = m.group(1).lower()
    opt = _SCAN_LIMIT_FNS[fn]
    if any(
        re.match(
            rf"\s*({opt}|fast_latest)\s*(=>|:=)", a, re.IGNORECASE
        )
        for a in args
    ):
        return sql
    tail = stripped[close + 1:]
    sep = "" if all(not a.strip() for a in args) else ", "
    tm = re.fullmatch(
        r"\s*(?:(?:AS\s+)?[A-Za-z_]\w*\s+)?LIMIT\s+(\d+)\s*",
        tail,
        re.IGNORECASE,
    )
    if tm:
        n = int(tm.group(1))
        return stripped[:close] + f"{sep}{opt} => {n}" + stripped[close:]
    # wayback TopN: ORDER BY timestamp DESC LIMIT n → the reference's
    # fastLatest (negative CDX limit, src/internet_archive.cpp:1415-1475);
    # the sort + limit STAY in the plan (reference parity: the server's
    # newest-first ordering is requested, the plan still proves the TopN)
    if fn == "wayback_machine":
        tn = re.fullmatch(
            r"\s*(?:(?:AS\s+)?[A-Za-z_]\w*\s+)?ORDER\s+BY\s+timestamp\s+DESC"
            r"\s+LIMIT\s+(\d+)\s*",
            tail,
            re.IGNORECASE,
        )
        if tn:
            n = int(tn.group(1))
            return (
                stripped[:close]
                + f"{sep}fast_latest => true, max_results => {n}"
                + stripped[close:]
            )
    return sql




_UNION_BY_NAME = re.compile(
    r"\bUNION(\s+ALL|\s+DISTINCT)?\s+BY\s+NAME\b", re.IGNORECASE
)


def _split_union_by_name(sql: str) -> tuple[list[str], list[bool]] | None:
    """Split ``sql`` on TOP-LEVEL ``UNION [ALL|DISTINCT] BY NAME`` operators.
    Returns (branches, is_all_flags) — flags[i] describes the operator
    between branch i and i+1 — or None when the statement has none.

    A ``UNION BY NAME`` nested inside a subquery/CTE (regex hit outside
    strings/comments but at paren depth > 0) cannot be handled by this
    top-level split and would otherwise fall through to ``spark.sql`` and
    die with an opaque Spark parse error — raise the shim's loud
    ValueError instead (ADVICE r12)."""
    positions = []
    # locate candidate UNION keywords at depth 0 outside strings/comments
    depth_at = {i: d for i, c, d in _scan_top_level(sql)}
    for m in _UNION_BY_NAME.finditer(sql):
        if depth_at.get(m.start()) == 0:
            positions.append(m)
    if not positions:
        if any(depth_at.get(m.start(), -1) > 0 for m in _UNION_BY_NAME.finditer(sql)):
            raise ValueError(
                "UNION BY NAME inside a subquery/CTE is not supported by "
                "the dialect shim (top-level only); hoist the BY NAME "
                "union to the top level, or materialize the subquery with "
                "duck_sql(...).createOrReplaceTempView(...) and reference "
                "the view instead"
            )
        return None
    branches, flags, prev = [], [], 0
    for m in positions:
        branches.append(sql[prev : m.start()].strip())
        # only ALL keeps duplicates; bare/DISTINCT BY NAME dedups like UNION
        flags.append((m.group(1) or "").strip().upper() == "ALL")
        prev = m.end()
    branches.append(sql[prev:].strip())
    return branches, flags


def union_by_name_df(spark: SparkSession, sql: str) -> DataFrame | None:
    """DuckDB's ``UNION [ALL] BY NAME`` (align columns by NAME, missing
    columns become NULL — the schema-evolution union), which Spark SQL has
    no syntax for. Each top-level branch is evaluated through ``duck_sql``
    recursively and the results combine with
    ``DataFrame.unionByName(allowMissingColumns=True)`` — exactly DuckDB's
    semantics. Set operators are LEFT-ASSOCIATIVE, so each non-ALL
    operator deduplicates the accumulated result at ITS position in the
    fold (``a UNION BY NAME b UNION ALL BY NAME c`` dedups (a,b) then
    appends all of c's rows, duplicates intact — verified against DuckDB
    in TestUnionByName's mixed-chain case; a single trailing distinct
    would wrongly collapse c, the r12 ADVICE bug).
    Returns None when the statement contains no top-level UNION BY NAME.

    Restrictions (loud, not silent): a trailing ORDER BY / LIMIT after the
    last branch would need its own parse-out and is rejected — wrap the
    whole union in a subquery and apply the tail outside (the same guidance
    DuckDB's own docs give for set-operation tails)."""
    parts = _split_union_by_name(sql)
    if parts is None:
        return None
    branches, flags = parts
    last = branches[-1]
    for kw in ("ORDER", "LIMIT", "OFFSET"):
        pos = _find_keyword(last, kw)
        # an ORDER/LIMIT inside the final branch's own subquery parens is
        # fine (depth > 0 never matches _find_keyword); top-level is the
        # ambiguous case SQL grammars attach to the whole set op
        if pos != -1:
            raise ValueError(
                "UNION BY NAME with a trailing ORDER BY/LIMIT/OFFSET is "
                "ambiguous at the source level; wrap the union in a "
                "subquery and apply the tail outside"
            )
    out = duck_sql(spark, branches[0])
    for branch, is_all in zip(branches[1:], flags):
        out = out.unionByName(duck_sql(spark, branch), allowMissingColumns=True)
        if not is_all:
            # left-associative: dedup applies to the fold-so-far, before
            # later ALL branches append their duplicates
            out = out.distinct()
    return out


def duck_sql(spark: SparkSession, sql: str) -> DataFrame:
    """``spark.sql`` accepting the DuckDB dialect idioms above."""
    ubn = union_by_name_df(spark, sql)
    if ubn is not None:
        return ubn
    summ = rewrite_summarize_statement(spark, sql)
    if summ is not None:
        return summ
    sql = rewrite_asof_join(spark, sql)
    _reject_unsupported_joins(sql)
    sql = rewrite_window_exclude(sql)
    grp = rewrite_groups_frames(sql)
    if grp is not None:
        sql = grp
    _reject_groups_frames(sql)
    unp = rewrite_unpivot_statement(sql)
    if unp is not None:
        sql = unp
    piv = rewrite_pivot_statement(spark, sql)
    if piv is not None:
        sql = piv
    sql = rewrite_named_args(sql)
    sql = rewrite_similar_to(
        sql,
        escaped_literals=(
            spark.conf.get(
                "spark.sql.parser.escapedStringLiterals", "false"
            ).lower()
            == "true"
        ),
    )
    sql = rewrite_using_sample(sql)
    sql = rewrite_scan_limit(sql)
    sql = rewrite_distinct_on(sql)
    sql = rewrite_file_tables(sql)
    sql = rewrite_list_exprs(sql)
    sql = rewrite_strftime(sql)
    sql = rewrite_regexp_extract(sql)
    sql = rewrite_regexp_replace(sql)
    sql = rewrite_log10(sql)
    sql = rewrite_int_subscripts(sql)
    sql = rewrite_function_names(sql)
    sql = rewrite_replace(sql)
    return spark.sql(rewrite_qualify(rewrite_exclude(sql)))


_DUCK_TYPE_NAMES = {
    "bigint": "BIGINT", "int": "INTEGER", "smallint": "SMALLINT",
    "tinyint": "TINYINT", "double": "DOUBLE", "float": "FLOAT",
    "string": "VARCHAR", "boolean": "BOOLEAN", "date": "DATE",
    "timestamp": "TIMESTAMP", "timestamp_ntz": "TIMESTAMP",
    "binary": "BLOB",
}

_SUMMARIZE_STMT = re.compile(
    r"^\s*SUMMARIZE\s+([A-Za-z_][\w.]*)\s*;?\s*$", re.IGNORECASE
)


def _duck_type_name(t: str) -> str:
    """Spark simpleString -> DuckDB type spelling (FLOAT[] for arrays)."""
    if t.startswith("array<") and t.endswith(">"):
        return _duck_type_name(t[6:-1]) + "[]"
    return _DUCK_TYPE_NAMES.get(t, t.upper())


def summarize_table(df: DataFrame) -> DataFrame:
    """DuckDB's ``SUMMARIZE`` statement for Spark DataFrames: one row per
    column with DuckDB's exact column set — (column_name, column_type,
    min, max, approx_unique, avg, std, q25, q50, q75, count,
    null_percentage) — computed in ONE aggregation pass over the table
    (all columns' stats partial-aggregate together; the per-column rows
    are carved out of the single 1-row fold, so the corpus is scanned
    once and nothing but that fold moves).

    Documented strictness upgrades vs DuckDB's native SUMMARIZE (which
    is approximate by design): ``approx_unique`` holds the EXACT
    distinct count; q25/q50/q75 are EXACT interpolated quantiles
    (percentile ↔ quantile_cont, the q62 cross-engine pairing); numeric
    stats are rounded to 6 dp before VARCHAR formatting so both
    engines' shortest-roundtrip printers agree. For INTEGRAL columns,
    avg/std derive from exact decimal sums through a fixed expression
    tree (order-free — the embedding_norm_qa convention); for
    fractional AND DECIMAL columns (TPC-H's core numeric type — e.g.
    l_quantity) they are engine aggregates over the double cast,
    rounded 6 dp (last-
    ulp summation-order noise buried by the rounding, not eliminated —
    don't hash-grade double columns). Unorderable types (arrays, maps,
    structs) report NULL min/max and no numeric stats, like DuckDB."""
    from pyspark.sql import functions as F

    num_int = ("bigint", "int", "smallint", "tinyint")
    num_frac = ("double", "float")
    aggs = [F.count(F.lit(1)).alias("__n")]
    fields = df.schema.fields
    for i, f in enumerate(fields):
        t = f.dataType.simpleString()
        c = F.col(f.name)
        # DECIMAL (TPC-H's core numeric type) rides the fractional branch:
        # engine avg/std over the double cast, rounded 6 dp — the same
        # last-ulp-buried-not-eliminated policy as double columns (DuckDB's
        # native SUMMARIZE is approximate by design; don't hash-grade)
        is_dec = t.startswith("decimal")
        orderable = not (
            t.startswith("array") or t.startswith("map") or t.startswith("struct")
        )
        countable = not (t.startswith("map"))
        if orderable:
            aggs += [
                F.min(c).cast("string").alias(f"mn_{i}"),
                F.max(c).cast("string").alias(f"mx_{i}"),
            ]
        if countable:
            aggs += [
                F.count_distinct(c).alias(f"uq_{i}"),
                F.count(c).alias(f"nn_{i}"),
            ]
        if t in num_int:
            d = c.cast("decimal(38,0)")
            aggs += [F.sum(d).alias(f"s_{i}"), F.sum(d * d).alias(f"ss_{i}")]
        elif t in num_frac or is_dec:
            aggs += [
                F.round(F.avg(c.cast("double")), 6).alias(f"avg_{i}"),
                F.round(F.stddev_samp(c.cast("double")), 6).alias(f"std_{i}"),
            ]
        if t in num_int + num_frac or is_dec:
            aggs += [
                F.round(F.percentile(c.cast("double"), 0.25), 6).alias(f"q25_{i}"),
                F.round(F.percentile(c.cast("double"), 0.50), 6).alias(f"q50_{i}"),
                F.round(F.percentile(c.cast("double"), 0.75), 6).alias(f"q75_{i}"),
            ]
    one = df.agg(*aggs)
    null_s = F.lit(None).cast("string")
    structs = []
    for i, f in enumerate(fields):
        t = f.dataType.simpleString()
        is_dec = t.startswith("decimal")
        orderable = not (
            t.startswith("array") or t.startswith("map") or t.startswith("struct")
        )
        countable = not (t.startswith("map"))
        nn = F.col(f"nn_{i}")
        if t in num_int:
            mean = F.col(f"s_{i}").cast("double") / nn.cast("double")
            var = F.greatest(
                (
                    F.col(f"ss_{i}").cast("double") / nn.cast("double")
                    - mean * mean
                )
                * (nn.cast("double") / (nn - 1).cast("double")),
                F.lit(0.0),
            )
            avg_c = F.round(mean, 6).cast("string")
            std_c = F.when(nn > 1, F.round(F.sqrt(var), 6)).cast("string")
        elif t in num_frac or is_dec:
            avg_c = F.col(f"avg_{i}").cast("string")
            std_c = F.col(f"std_{i}").cast("string")
        else:
            avg_c = null_s
            std_c = null_s
        qs = (
            [F.col(f"q{q}_{i}").cast("string") for q in (25, 50, 75)]
            if t in num_int + num_frac or is_dec
            else [null_s, null_s, null_s]
        )
        structs.append(
            F.struct(
                F.lit(f.name).alias("column_name"),
                F.lit(_duck_type_name(t)).alias("column_type"),
                (F.col(f"mn_{i}") if orderable else null_s).alias("min"),
                (F.col(f"mx_{i}") if orderable else null_s).alias("max"),
                (
                    F.col(f"uq_{i}")
                    if countable
                    else F.lit(None).cast("long")
                ).alias("approx_unique"),
                avg_c.alias("avg"),
                std_c.alias("std"),
                qs[0].alias("q25"),
                qs[1].alias("q50"),
                qs[2].alias("q75"),
                F.col("__n").alias("count"),
                F.round(
                    F.lit(100.0)
                    * (
                        F.col("__n") - (nn if countable else F.col("__n"))
                    ).cast("double")
                    / F.col("__n").cast("double"),
                    2,
                ).alias("null_percentage"),
            )
        )
    # ONE row per column carved from the SINGLE 1-row fold via an
    # explode of per-column structs — a unionByName of per-column
    # selects would re-run the aggregate subtree once per column (no
    # ReuseExchange in this build): C scans instead of one.
    return one.select(F.explode(F.array(*structs)).alias("r")).select("r.*")


def rewrite_summarize_statement(
    spark: SparkSession, sql: str
) -> DataFrame | None:
    """DuckDB's ``SUMMARIZE <table>`` statement → ``summarize_table`` over
    the registered table/view. Only the bare-table form is supported;
    ``SUMMARIZE SELECT ...`` raises with guidance (register a temp view
    first)."""
    if not re.match(r"^\s*SUMMARIZE\b", sql, re.IGNORECASE):
        return None
    m = _SUMMARIZE_STMT.match(sql)
    if not m:
        raise ValueError(
            "only 'SUMMARIZE <table>' is supported; for SUMMARIZE over a "
            "query, register it as a temp view first "
            "(df.createOrReplaceTempView) and summarize that"
        )
    return summarize_table(spark.table(m.group(1)))
