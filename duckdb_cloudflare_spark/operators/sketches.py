"""Deterministic sketch operators with EXACT cross-engine oracles: Bloom
membership, Count-Min frequency, HyperLogLog distinct counting, and
weighted priority sampling.

Why this family exists: the engine-native approximates (q31's
approx_count_distinct, the LSH families) can never be hash-compared
against another engine — their sketches hash differently by construction
(recorded evidence at relational.py:878-885). These operators make the
SKETCH ITSELF deterministic (md5-derived hashes, integer-exact
accumulators), so a SQL oracle reproduces every bit: the approximation
error is still real and bounded by the usual guarantees, but the VALUE is
engine-independent. That turns "trust the sketch" into "hash-check the
sketch" — the same md5-for-oracle trade p19/p43/p48/p57/p73 make.

Scale shapes (all pinned): Bloom — the filter is a distinct-position set
built with one partial-agg pass and BROADCAST to the probe side (that
compactness is the point of a Bloom filter at 100 TB); Count-Min — one
token explode → one (row, col)-keyed partial-agg shuffle into d×w
cells; HLL — one explode → bucket-keyed max-rho partial agg (m rows)
→ 1-row estimate; priority sample — distributed top-k (TakeOrdered),
no full sort.

References (public): Bloom '70; Cormode & Muthukrishnan '05 (CM sketch);
Flajolet et al. '07 (HyperLogLog); Efraimidis & Spirakis '06 (weighted
reservoir via priority keys).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def _md5_int60(c: Column, seed: str = "") -> Column:
    """First 15 hex digits of md5(seed || value) as a 60-bit non-negative
    int — both-engine-exact (the p73 construction)."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(seed), c.cast("string"))), 1, 15), 16, 10
    ).cast("long")


# ---------------------------------------------------------------------------
# Bloom filter (p77)
# ---------------------------------------------------------------------------


def bloom_positions(c: Column, num_hashes: int = 3, num_bits: int = 1 << 18) -> Column:
    """The ``num_hashes`` bit positions of a value — an array<bigint>."""
    return F.array(
        *[_md5_int60(c, f"bloom{i}:") % num_bits for i in range(num_hashes)]
    )


def bloom_probe(
    items: DataFrame,
    members: DataFrame,
    item_col: str,
    member_col: str,
    id_col: str,
    num_hashes: int = 3,
    num_bits: int = 1 << 18,
) -> DataFrame:
    """Membership probe of ``items[item_col]`` against a Bloom filter built
    from ``members[member_col]``: returns (id_col, flagged) where flagged
    means ALL ``num_hashes`` positions are set — possibly-member semantics
    with deterministic false positives (same md5 positions on any engine).

    The filter is the DISTINCT set of set-bit positions (≤ num_bits rows,
    usually far fewer) — built with one partial-agg pass over the member
    set and BROADCAST to the probe side, so the corpus-scale probe is a
    map-side join + per-item match count: the classic use (drop
    benchmark-contaminated docs at ingest) never shuffles the corpus."""
    pos = (
        members.select(
            F.explode(bloom_positions(F.col(member_col), num_hashes, num_bits)).alias(
                "p"
            )
        )
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    probe = items.select(
        F.col(id_col),
        F.explode(bloom_positions(F.col(item_col), num_hashes, num_bits)).alias("p"),
    )
    return (
        probe.join(broadcast(pos), "p", "left")
        .groupBy(id_col)
        .agg((F.sum(F.coalesce(F.col("_hit"), F.lit(0))) == num_hashes).alias("flagged"))
    )


# ---------------------------------------------------------------------------
# Count-Min sketch (p78)
# ---------------------------------------------------------------------------


def countmin_estimates(
    tokens: DataFrame,
    token_col: str = "tok",
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Count-Min frequency estimates for every distinct token of a token-
    instance frame: returns (tok, est) with
    ``est = min_j cells[j][hash_j(tok) % width]``. Estimates are exact
    integers (cell sums are longs), so they hash-compare across engines;
    overestimation from collisions is the usual CM guarantee
    (ε = e/width with probability 1 − e^-depth), and is itself
    deterministic here.

    Shape: ONE explode of each instance into ``depth`` (j, col) cells →
    one partial-agg shuffle into ≤ depth×width cell rows → the distinct
    tokens (vocab-sized) join the BROADCAST cell table per row."""
    cells_of = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                (_md5_int60(F.col(token_col), f"cm{j}:") % width).alias("col"),
            )
            for j in range(depth)
        ]
    )
    inst = tokens.select(F.col(token_col), F.explode(cells_of).alias("c"))
    cells = (
        inst.select(F.col("c.j").alias("j"), F.col("c.col").alias("col"))
        .groupBy("j", "col")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    vocab_cells = (
        tokens.select(token_col)
        .distinct()
        .select(F.col(token_col), F.explode(cells_of).alias("c"))
        .select(token_col, F.col("c.j").alias("j"), F.col("c.col").alias("col"))
    )
    return (
        vocab_cells.join(broadcast(cells), ["j", "col"])
        .groupBy(token_col)
        .agg(F.min("n").alias("est"))
    )


# ---------------------------------------------------------------------------
# HyperLogLog (p79)
# ---------------------------------------------------------------------------

# HLL bias-correction constant for m ≥ 128 (Flajolet et al. '07, Fig. 3).
def _hll_alpha(m: int) -> float:
    return 0.7213 / (1.0 + 1.079 / m)


def hll_bucket_rho(c: Column, log2m: int = 10) -> tuple[Column, Column]:
    """(bucket, ρ) columns of a value under the deterministic 60-bit md5
    hash — shared by the batch estimator below and the streaming
    accumulator (streaming/documents.py::hll_stream), so both fold the
    IDENTICAL registers."""
    rest_bits = 60 - log2m
    h = _md5_int60(c, "hll:")
    bucket = F.shiftright(h, rest_bits)
    rest = h.bitwiseAND(F.lit((1 << rest_bits) - 1))
    rho = F.when(rest == 0, F.lit(rest_bits + 1)).otherwise(
        F.lit(rest_bits) - F.length(F.bin(rest)) + 1
    )
    return bucket, rho


def hll_finalize(registers, log2m: int = 10) -> float:
    """Python-side estimate from a full register array (len m, entries
    0 = empty or M_j) — the stream-side twin of the batch expression
    column-for-column: exact integer S* fold, ONE float division, the
    same linear-counting branch. Keeping the arithmetic shape identical
    is what makes stream estimates equal batch estimates bit-for-bit
    (pinned in test_streaming_pack.py)."""
    import math

    m = 1 << log2m
    rest_bits = 60 - log2m
    used = sum(1 for r in registers if r > 0)
    s_star = sum(1 << (rest_bits + 1 - r) for r in registers if r > 0)
    denom = s_star / float(1 << (rest_bits + 1)) + (m - used)
    raw = _hll_alpha(m) * m * m / denom
    zeros = m - used
    if raw <= 2.5 * m and zeros > 0:
        est = float(m) * math.log(float(m) / zeros)
    else:
        est = raw
    return round(est, 4)


def hll_estimate(
    values: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    log2m: int = 10,
) -> DataFrame:
    """Deterministic HyperLogLog distinct-count estimate (per group):
    md5-derived 60-bit hash → top ``log2m`` bits pick the bucket, the
    remaining 50 bits give ρ (leading-zero rank). The register sum
    Σ 2^−M_j is accumulated as an EXACT 64-bit integer
    (Σ 2^(51−M_j), M_j ≤ 51, then ONE float division) so the estimate is
    bit-identical on any engine — no order-dependent float summation
    anywhere. Small-range (linear counting) correction applied as in the
    paper; the large-range correction is unreachable at 60-bit hashes.

    NULL values are excluded up front (a NULL hashes to a NULL bucket/ρ
    pair, which the register fold would silently drop via count(M) while a
    count(*)-style oracle would count — r11 advice; filtering makes the
    "NULL is not a distinct value" convention explicit, matching DuckDB's
    count(DISTINCT) which likewise ignores NULLs).

    Returns group_cols + (hll_estimate double, n_buckets_used int).
    Shape: one partial-agg shuffle to m rows per group, then a 1-row
    (per-group) fold — the 100 TB distinct-count shape."""
    values = values.filter(F.col(value_col).isNotNull())
    bucket, rho = hll_bucket_rho(F.col(value_col), log2m)
    gcols = list(group_cols or [])
    regs = (
        values.select(*gcols, bucket.alias("b"), rho.alias("rho"))
        .groupBy(*gcols, "b")
        .agg(F.max("rho").alias("M"))
    )
    return hll_fold_registers(regs, gcols, log2m)


def hll_fold_registers(
    regs: DataFrame,
    group_cols: list[str],
    log2m: int = 10,
    m_col: str = "M",
) -> DataFrame:
    """Fold an HLL register TABLE (``group_cols`` + one row per non-empty
    bucket carrying its max-ρ value in ``m_col``) into estimates — the
    register-level half of ``hll_estimate``, split out (r11) so operators
    that MERGE register tables before estimating (sliding/overlapping
    windows: q59's trailing-7-day union is a per-bucket max over the 7
    per-day register rows) reuse the exact same integer-exact fold. Same
    arithmetic shape as ``hll_finalize`` — exact 64-bit S* sum, ONE float
    division, identical linear-counting branch — so estimates stay
    bit-identical across batch, merged-window, and streaming paths.

    Returns group_cols + (hll_estimate double, n_buckets_used int)."""
    gcols = list(group_cols)
    s_star, used = hll_register_agg_exprs(m_col, log2m)
    agg = regs.groupBy(*gcols).agg(
        s_star.alias("s_star"),
        used.alias("used"),
    )
    return agg.select(
        *gcols,
        hll_estimate_expr(F.col("s_star"), F.col("used"), log2m).alias(
            "hll_estimate"
        ),
        F.col("used").cast("int").alias("n_buckets_used"),
    )


def hll_register_agg_exprs(
    m_col: str = "M", log2m: int = 10
) -> tuple[Column, Column]:
    """(S*, used) aggregate expressions folding a register column — split
    out (r11) so an operator folding SEVERAL register columns in ONE
    aggregation (q59 fuses the 1-day and 7-day windows into a single
    shuffle) composes them instead of paying one groupBy per estimate.
    NULL entries in ``m_col`` (a bucket empty for this window variant)
    count as empty registers — excluded from both S* and ``used``, which
    is exactly what hll_estimate's absent-row convention does."""
    rest_bits = 60 - log2m  # 50 for log2m=10
    # exact integer register fold: S* = Σ 2^(rest_bits+1-M) ≤ m·2^rest_bits
    # (SQL expr: the Python F.shiftleft only takes a literal shift amount)
    s_star = F.sum(
        F.expr(f"shiftleft(CAST(1 AS BIGINT), {rest_bits + 1} - {m_col})")
    )
    used = F.count(F.col(m_col))
    return s_star, used


def hll_estimate_expr(
    s_star: Column, used: Column, log2m: int = 10
) -> Column:
    """Estimate from folded (S*, used) — the paper's E with the exact
    arithmetic shape of ``hll_finalize`` (one float division, identical
    linear-counting branch, 4-dp round) so every caller — hll_estimate,
    the register-merge operators, the streaming twin — emits the same
    bits for the same registers. NULL S* (a group whose every register
    column was empty) yields NULL, not 0."""
    m = 1 << log2m
    rest_bits = 60 - log2m
    # Σ 2^-M over ALL m registers = s_star/2^(rest_bits+1) + (m - used)·1
    denom = (
        s_star.cast("double") / F.lit(float(1 << (rest_bits + 1)))
        + (F.lit(m) - used).cast("double")
    )
    raw = F.lit(_hll_alpha(m) * m * m) / denom
    zeros = F.lit(m) - used
    # linear-counting small-range correction (E ≤ 2.5m and empty buckets)
    lc = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double"))
    return F.round(F.when((raw <= 2.5 * m) & (zeros > 0), lc).otherwise(raw), 4)


# ---------------------------------------------------------------------------
# Weighted priority sample (p80)
# ---------------------------------------------------------------------------


def priority_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    seed: str = "ps:",
) -> DataFrame:
    """Efraimidis–Spirakis weighted sample-without-replacement: every row
    gets priority key ln(u)/w with u = deterministic md5-uniform in (0, 1]
    and w its weight; the k LARGEST keys are the sample. Inclusion
    probability ∝ weight, deterministic given the seed — the reproducible
    "sample 10k docs weighted by length" primitive. Zero/negative weights
    are excluded (undefined priority).

    Shape: map-side key derivation + distributed top-k (TakeOrdered) —
    no global sort, no shuffle of the corpus."""
    u = (_md5_int60(F.col(id_col), seed) + 1).cast("double") / float(1 << 60)
    key = F.log(u) / F.col(weight_col).cast("double")
    return (
        # NULL ids hash to a NULL key: exclude them up front — engines
        # disagree on NULL placement under DESC (Spark last, DuckDB first),
        # so a NULL key must never reach the top-k ordering
        df.filter(F.col(weight_col) > 0)
        .filter(F.col(id_col).isNotNull())
        .select(F.col(id_col), F.col(weight_col), key.alias("_key"))
        .orderBy(F.col("_key").desc(), F.col(id_col))  # order on the UNROUNDED key
        .limit(k)
        .select(id_col, weight_col, F.round("_key", 6).alias("priority"))
    )
