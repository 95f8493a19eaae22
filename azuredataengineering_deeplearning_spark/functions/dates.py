"""Date/time expression helpers (SURVEY §2.8 F8-F17, F10-F11).

Int date keys use the reference's conventions: ``yyyyMMdd`` int
(``apply_scd2.py:34-35``), sentinel ``20991231`` = open-ended
(``apply_scd2.py:42``), ``0`` = not-yet-occurred, ``-9999`` = missing
(``dim_date_generator.py:142-206``). Fiscal calendar starts in July
(``dim_date_generator.py:95-102``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DATE_KEY_OPEN_END = 20991231
DATE_KEY_NOT_OCCURRED = 0
DATE_KEY_MISSING = -9999


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def date_key(col: Column | str) -> Column:
    """F8: yyyyMMdd int key (``apply_scd2.py:34-35``)."""
    return F.date_format(_c(col), "yyyyMMdd").cast("int")


def date_key_or_sentinel(col: Column | str, sentinel: int = DATE_KEY_MISSING) -> Column:
    """F8 with null → sentinel (``dim_date_generator.py:142-206``)."""
    return F.coalesce(date_key(col), F.lit(sentinel))


def month_end(col: Column | str) -> Column:
    """F9: snap to month end (``stats_forecast_predict.py:212``
    ``pd.offsets.MonthEnd(0)``)."""
    return F.last_day(_c(col))


def month_start(col: Column | str) -> Column:
    """F9: truncate to month (``to_period('M')``)."""
    return F.trunc(_c(col), "month")


def duration_hours(start: Column | str, end: Column | str) -> Column:
    """F11: float hours between timestamps (``generate_data.py:190``
    ``total_seconds()/3600``)."""
    return (
        F.unix_timestamp(_c(end)).cast("double")
        - F.unix_timestamp(_c(start)).cast("double")
    ) / 3600.0


def iso_weekday(col: Column | str) -> Column:
    """F12: ISO day-of-week, Monday=1..Sunday=7 (``dim_date_generator.py:74-94``).
    Spark's ``weekday`` is Monday=0."""
    return F.weekday(_c(col)) + F.lit(1)


def is_weekend(col: Column | str) -> Column:
    """F17: Saturday/Sunday flag (``dim_date_generator.py:91-94``)."""
    return (F.weekday(_c(col)) >= 5).cast("int")


def fiscal_year(col: Column | str, start_month: int = 7) -> Column:
    """F13: fiscal year with July start (``dim_date_generator.py:95-102``) —
    July..December belong to the *next* FY."""
    return F.year(_c(col)) + F.when(F.month(_c(col)) >= start_month, 1).otherwise(0)


def fiscal_quarter(col: Column | str, start_month: int = 7) -> Column:
    """F13: fiscal quarter 1-4 for a July-start FY (Q-JUN periods)."""
    shifted = (F.month(_c(col)) - start_month + 12) % 12
    return (shifted / 3).cast("int") + 1


def fiscal_quarter_label(col: Column | str, start_month: int = 7) -> Column:
    """F13: ``'Q%qFY%y'`` label (``dim_date_generator.py:101``)."""
    return F.format_string(
        "Q%dFY%02d",
        fiscal_quarter(col, start_month),
        fiscal_year(col, start_month) % 100,
    )


def work_week_label(col: Column | str) -> Column:
    """F14: ``{yy}ww{w}.{d}`` label (``dim_date_generator.py:56-66``):
    2-digit year, ISO week, ISO weekday."""
    c = _c(col)
    return F.format_string(
        "%02dww%d.%d", F.year(c) % 100, F.weekofyear(c), iso_weekday(c)
    )


def outlook_week(col: Column | str) -> Column:
    """F15: Outlook-style week number (``dim_date_generator.py:104-117``):
    weeks anchored on Monday, week 1 = the week containing Jan 1, counted
    from the Monday on or before Jan 1."""
    c = _c(col)
    jan1 = F.trunc(c, "year")
    base_monday = F.date_sub(jan1, F.weekday(jan1))
    return (F.datediff(c, base_monday) / 7).cast("int") + 1
