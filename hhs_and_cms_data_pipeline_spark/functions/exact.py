"""Exact-numeric aggregation helpers.

Floating-point SUM/AVG are order-dependent; Spark's partial/final hash
aggregation over 32 shuffle partitions will not, in general, reproduce the
bit pattern of a single-threaded DuckDB SUM over the same doubles. The driver
compares results by value-hash (BASELINE.md), so every aggregate over a DOUBLE
column is routed through DECIMAL(38,6):

    double --cast--> decimal(38,6)  (deterministic: binary doubles are never
                                     exact midpoints at 1e-6, so no tie-break
                                     divergence between engines)
    SUM(decimal)                    (exact integer arithmetic, associative and
                                     commutative -> partition order irrelevant)
    --cast--> string --> double     (decimal->double directly is NOT identical
                                     across engines: Spark converts via
                                     BigDecimal correctly rounded, DuckDB
                                     scales the raw int128 by a double power
                                     of ten — off-by-one-ulp divergence.
                                     Decimal->string is exact on both, and
                                     string->double parse is correctly
                                     rounded on both -> identical bits.)

This also makes the results *reproducible across cluster sizes*, which
matters more than the oracle: a 1000-executor run and a local[32] run give
identical answers.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(38,6)"


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dsum(c: Column | str, alias: str | None = None, *, scale: int = 6) -> Column:
    """Exact decimal-routed SUM. ``scale`` picks the quantization (6 for
    money-grade doubles; similarity math uses 18/24 for embedding
    components and squared distances — one definition for every copy)."""
    out = F.sum(_col(c).cast(f"decimal(38,{scale})")).cast("string").cast("double")
    return out.alias(alias) if alias else out


def dsum_over(c: Column | str, window, *, scale: int = 6) -> Column:
    """Windowed variant of :func:`dsum` (the ``.over`` must attach to the
    aggregate before the cast chain, so plain dsum can't be windowed)."""
    return (
        F.sum(_col(c).cast(f"decimal(38,{scale})"))
        .over(window)
        .cast("string")
        .cast("double")
    )


def davg(c: Column | str, alias: str | None = None, *, scale: int = 6) -> Column:
    # avg = exact decimal sum / count, divided in DOUBLE on both engines.
    col = _col(c)
    out = (
        F.sum(col.cast(f"decimal(38,{scale})")).cast("string").cast("double")
        / F.count(F.when(col.isNotNull(), 1)).cast("double")
    )
    return out.alias(alias) if alias else out


def sql_dsum(expr: str, *, scale: int = 6) -> str:
    """Oracle-side rendering of :func:`dsum` for a DuckDB SQL expression.

    The VARCHAR hop matters on scales > ~15: DuckDB's direct
    double->DECIMAL cast computes in double and can land one ulp off
    Spark's shortest-repr parse; double->VARCHAR->DECIMAL is exact and
    identical on both engines."""
    return (
        f"CAST(CAST(SUM(CAST(CAST(({expr}) AS VARCHAR)"
        f" AS DECIMAL(38,{scale}))) AS VARCHAR) AS DOUBLE)"
    )


def sql_davg(expr: str, *, scale: int = 6) -> str:
    return (
        f"{sql_dsum(expr, scale=scale)}"
        f" / CAST(COUNT({expr}) AS DOUBLE)"
    )


def ratio_pct(num: Column, den: Column, alias: str | None = None) -> Column:
    """SURVEY A4: ratio-of-sums with div-by-zero guard.

    Reference: ``SUM(occ)*100.0 / NULLIF(SUM(avail),0)``
    (weekly-report.py:313-316,391-393).
    """
    out = num * F.lit(100.0) / F.nullif(den, F.lit(0.0))
    return out.alias(alias) if alias else out


def sql_ratio_pct(num: str, den: str) -> str:
    return f"({num}) * 100.0 / NULLIF(({den}), 0.0)"


def round1(c: Column, alias: str | None = None) -> Column:
    """SURVEY F9: ROUND(CAST(x AS NUMERIC), 1) (weekly-report.py:311-318).

    Rounding happens in DECIMAL space: double->decimal(38,1) cast is
    round-half-up on both engines and doubles are never exact .05 midpoints,
    so results are bit-identical.
    """
    out = _col(c).cast("decimal(38,1)").cast("string").cast("double")
    return out.alias(alias) if alias else out


def sql_round1(expr: str) -> str:
    return f"CAST(CAST(CAST(({expr}) AS DECIMAL(38,1)) AS VARCHAR) AS DOUBLE)"


def floordiv(c: Column, b: int) -> Column:
    """Exact FLOOR division of a possibly-negative integer column by a
    positive integer constant, bit-identical in Spark and DuckDB (pair of
    :func:`sql_floordiv`). Both engines' integer division truncates toward
    zero, so subtract the positive remainder first: the quotient of the
    exact multiple is the floor on either side of zero. The one double
    division is of an exact multiple — exact while |c| < 2^53 (epoch
    microseconds reach that in year 2255). Replaces floor(double-division)
    — which can misbucket within an ulp of a boundary — and date_diff
    oracles, whose boundary-crossing count diverges from floor for
    sub-unit timestamps BEFORE the reference (caught by the adversarial
    differential gate)."""
    pmod = ((c % b) + b) % b
    return ((c - pmod) / b).cast("long")


def sql_floordiv(expr: str, b: int) -> str:
    """Oracle-side rendering of :func:`floordiv`."""
    return f"CAST((({expr}) - (((({expr}) % {b}) + {b}) % {b})) // {b} AS BIGINT)"
