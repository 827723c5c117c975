"""Time/date scalar functions.

Reference semantics reproduced (SURVEY.md §2.8):
- F6 ``convert_time`` — utils/TimeFormatTransformation.scala:10-18:
  re-format a timestamp string between patterns/timezones.
- F7 ``ist_epoch_millis`` — service/GeoTagOptimizedService.scala:58-62:
  parse ``yyyy-MM-dd HH:mm:ssZ`` fixed-offset strings → epoch millis.
- F8 ``format_duration`` — batch/FuturePastEvents.scala:21-29:
  millis → "D days H hours M minutes S seconds".
- P6 future/past classification — FuturePastEvents.scala:21-34:
  Δ = device_time − received_at; future if > 0 s, past if < −24 h.

All expression-only; fixed-offset parsing uses explicit patterns so
results never depend on the session timezone (SURVEY.md §7.3.5).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

WIRE_TS_PATTERN = "yyyy-MM-dd HH:mm:ssZ"  # e.g. "2016-04-04 14:14:49+0530"


# ---------------------------------------------------------------------
# Engine-wide epoch contract over loader-normalized `timestamp` columns
# (sources/tables.py::_normalize_timestamps). Every plan that needs
# epoch arithmetic goes through these two helpers so the next parquet
# dtype drift is a one-file fix — round 3 was zeroed by exactly this
# class of drift spread across five modules.
# ---------------------------------------------------------------------
def ts_seconds(ts: Column | str) -> Column:
    """Epoch as FRACTIONAL seconds (double) — the seconds contract.

    ``cast(double)`` keeps µs fractions and matches DuckDB's
    ``epoch(ts)`` bit-for-bit (both are the correctly-rounded µs/1e6);
    ``unix_timestamp`` would TRUNCATE to whole seconds and can flip
    boundary comparisons against the oracle.
    """
    c = F.col(ts) if isinstance(ts, str) else ts
    return c.cast("double")


def ts_millis(ts: Column | str, clock_div: int = 1) -> Column:
    """Epoch milliseconds (bigint) — the ms contract (truncating µs→ms,
    = DuckDB ``epoch_ns(ts) // 1000 // 1000``).

    ``clock_div`` applies integer clock compression (see
    plans/kernels.py::_PING_CLOCK_DIV) bit-exactly: floor(m / d) over
    doubles is exact here because epoch-ms m < 2^53 is exactly
    representable and any non-integral quotient sits ≥ 1/d from the
    nearest integer — far outside double rounding error — while exact
    multiples divide without error.
    """
    c = F.unix_millis(F.col(ts) if isinstance(ts, str) else ts)
    if clock_div != 1:
        c = F.floor(c / F.lit(clock_div))
    return c


def parse_wire_ts(col: Column, pattern: str = WIRE_TS_PATTERN) -> Column:
    """Parse the reference's fixed-offset wire timestamp string."""
    return F.to_timestamp(col, pattern)


def ist_epoch_millis(col: Column) -> Column:
    """Wire string → epoch millis (reference F7)."""
    return (F.unix_timestamp(parse_wire_ts(col)) * 1000).cast("long")


def convert_time(col: Column, in_fmt: str, out_fmt: str) -> Column:
    """Timestamp-string reformat (reference F6)."""
    return F.date_format(F.to_timestamp(col, in_fmt), out_fmt)


def date_string(ts: Column) -> Column:
    """The reference's derived "yyyy-MM-dd" partition column
    (utils/DateUtils.scala:5-6)."""
    return F.date_format(ts, "yyyy-MM-dd")


def format_duration(millis: Column) -> Column:
    """Millis → 'D days H hours M minutes S seconds' (reference F8)."""
    total_s = (millis / 1000).cast("long")
    days = (total_s / 86400).cast("long")
    hours = ((total_s % 86400) / 3600).cast("long")
    minutes = ((total_s % 3600) / 60).cast("long")
    seconds = total_s % 60
    return F.format_string("%d days %d hours %d minutes %d seconds",
                           days, hours, minutes, seconds)


def future_past_flag(device_ts: Column, received_ts: Column) -> Column:
    """'FUTURE' if device time ahead of receipt, 'PAST' if more than
    24 h behind, else NULL (reference P6 audit)."""
    diff_s = F.unix_timestamp(device_ts) - F.unix_timestamp(received_ts)
    return (
        F.when(diff_s > 0, "FUTURE")
        .when(diff_s < -86400, "PAST")
        .otherwise(F.lit(None).cast("string"))
    )
