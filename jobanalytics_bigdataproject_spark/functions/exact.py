"""Cross-engine-deterministic money aggregates.

Floating-point SUM/AVG depend on summation order, which differs between
Spark partitions and the DuckDB oracle (and between cluster sizes!). When
the true value lands near a ROUND boundary the 2-dp results diverge
(observed: avg 267029.2249999… vs 267029.2250001…).

Fix: aggregate fixed-point *cents* as exact int64 — integer addition is
associative, so any partitioning/summation order gives the identical sum —
then do one double division at the end. This also makes BENCH numbers
reproducible run-to-run at 100 TB, where partial-aggregate order is
nondeterministic. Cent-sums fit int64 up to ~9e16 dollars; beyond that use
decimal(38,2) (Spark) / hugeint (DuckDB).

Each helper documents the DuckDB oracle expression it matches.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cents(c: Column | str) -> Column:
    """ROUND(x*100) as int64. Oracle: ``CAST(ROUND(x*100) AS BIGINT)``."""
    col = F.col(c) if isinstance(c, str) else c
    return F.round(col * 100).cast("long")


def money_sum(c: Column | str, dp: int = 2) -> Column:
    """Exact SUM rounded to dp.
    Oracle: ``ROUND(SUM(CAST(ROUND(x*100) AS BIGINT))/100.0, dp)``."""
    return F.round(F.sum(cents(c)) / F.lit(100.0), dp)


def money_avg(c: Column | str, dp: int = 2) -> Column:
    """Exact AVG: integer cent-sum, one double division, then round at
    *integer-cent* precision before dividing by 100.

    Rounding order matters: Spark ROUND is decimal-string-based (HALF_UP on
    the double's shortest repr) while DuckDB rounds the binary value — at a
    non-representable boundary like 267029.225 they disagree (.23 vs .22).
    Every half-boundary at integer precision (x.5) IS exactly representable,
    so rounding cents-first is engine-agnostic, and the final /100 +
    round(dp) never sits on a boundary again.
    Oracle: ``ROUND(ROUND(SUM(CAST(ROUND(x*100) AS BIGINT))*1.0/COUNT(x))/100.0, dp)``."""
    col = F.col(c) if isinstance(c, str) else c
    return F.round(F.round(F.sum(cents(col)) / F.count(col)) / F.lit(100.0), dp)


def exact_div(num: Column, den: Column, dp: int = 4) -> Column:
    """Cross-engine-deterministic rounded division: ``ROUND(10^dp·n/d)/10^dp``.

    ``ROUND(n/d, dp)`` directly is unsafe: a rational like 1/160 = 0.00625
    is NOT binary-representable, Spark's decimal-string ROUND says .0063
    while DuckDB's binary ROUND can say .0062. Scaling first makes every
    half-boundary an exact ``k.5`` double (correctly-rounded division of an
    exact rational), which both engines round identically; the final
    division by 10^dp is exact-by-construction on both.
    Oracle: ``ROUND(POW(10,dp)*n/NULLIF(d,0))/POW(10,dp)`` (spelled with
    literals, e.g. ``ROUND(10000.0*n/NULLIF(d,0))/10000.0``)."""
    scale = float(10**dp)
    return F.round(F.lit(scale) * num / F.nullif(den, F.lit(0))) / F.lit(scale)


def money_median(c: Column | str, dp: int = 2) -> Column:
    """Exact interpolated median over cents, rounded cents-first (see
    money_avg — an even row count lands on x.5 cents, which is exactly
    representable, so both engines round it identically).
    Oracle: ``ROUND(ROUND(MEDIAN(CAST(ROUND(x*100) AS BIGINT)))/100.0, dp)``."""
    return F.round(F.round(F.median(cents(c))) / F.lit(100.0), dp)
