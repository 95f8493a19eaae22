"""Spark Python DataSource connectors (S16/S17 as a *real* source).

The reference ingests paginated REST feeds with a driver-side aiohttp
loop (``devops_batch_download_all.py:79-170``: WIQL pages, time-window
slicing) and polls Azure Monitor metrics windows
(``metrics_query.py:14-40``, ``synapse_sql_pool_dynamic_scaler.py:14-49``).
The engine's first-cut adapters (`connectors.RestPaginatedSource`) kept
that control flow on the driver; this module re-expresses the same
surface as a Spark 4 Python DataSource so the fetch itself distributes:

- each **time-window slice is an input partition** — executors fetch
  windows in parallel (the reference fans out with 64 async tasks on one
  machine; here the cluster is the fan-out);
- **pagination happens inside the partition** (cursor loop per window,
  mirroring the 200-revision page loop);
- **predicate pushdown prunes windows**: a `event_ts >=/<=` filter
  drops non-overlapping window partitions before any fetch happens
  (filters are re-applied by Spark afterwards, so pruning only has to
  be conservative);
- the **streaming variant** exposes the feed as an offset-tracked
  `readStream` source — micro-batches advance window-by-window with
  exactly-once bookkeeping from the checkpoint, replacing the
  poll-and-append scripts.

Network SDKs are not available (or wanted) here: the fetch function is
injected as an importable ``module:function`` string (resolved on the
executor), and the default is :func:`synthetic_feed`, a deterministic
arithmetic feed the DuckDB oracle reproduces exactly — the offline
stand-in pattern used across `sources.connectors`.
"""

from __future__ import annotations

import importlib
import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)

DEFAULT_SCHEMA = "event_ts bigint, entity string, value double, page int"

# synthetic feed shape (SQL-reproducible: see catalog/extras2 oracle)
ROWS_PER_WINDOW = 120
PAGE_SIZE = 50
N_ENTITIES = 7


def synthetic_feed(
    window_start: int, window_end: int, cursor: str | None
) -> tuple[list[tuple], str | None]:
    """Deterministic paginated feed: ``(rows, next_cursor)`` per call.

    Pure arithmetic in (window_start, row index) so a SQL oracle can
    reproduce it bit-for-bit; paginated to exercise the cursor loop."""
    first = int(cursor) if cursor else 0
    span = window_end - window_start
    rows = [
        (
            window_start + (i * span) // ROWS_PER_WINDOW,
            f"e{i % N_ENTITIES}",
            ((window_start + i * 17) % 1000) / 10.0,
            i // PAGE_SIZE,
        )
        for i in range(first, min(first + PAGE_SIZE, ROWS_PER_WINDOW))
    ]
    nxt = first + PAGE_SIZE
    return rows, (str(nxt) if nxt < ROWS_PER_WINDOW else None)


# Captured at import time ON THE DRIVER and pickled by value with this
# module: lets executor workers import the engine package even when the
# driver process runs from an unrelated CWD (local mode / shared FS; on
# a real cluster ship the package as a wheel instead).
_PKG_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def _resolve_fetcher(spec: str):
    """``module:function`` → callable, resolved executor-side (the spec
    travels as a plain option string, never a pickled closure)."""
    mod, _, fn = spec.partition(":")
    if not fn:
        raise ValueError(f"fetcher must be 'module:function', got {spec!r}")
    try:
        return getattr(importlib.import_module(mod), fn)
    except ModuleNotFoundError:
        import sys

        if _PKG_ROOT not in sys.path and os.path.isdir(_PKG_ROOT):
            sys.path.insert(0, _PKG_ROOT)
            return getattr(importlib.import_module(mod), fn)
        raise


def _windows(options) -> list[tuple[int, int]]:
    start = int(options["start"])
    end = int(options["end"])
    slice_s = int(options.get("slice", "3600"))
    if slice_s <= 0 or end < start:
        raise ValueError("need end >= start and slice > 0")
    return [(ws, min(ws + slice_s, end)) for ws in range(start, end, slice_s)]


class _Window(InputPartition):
    def __init__(self, ws: int, we: int):
        self.ws, self.we = ws, we


def _read_window(part: _Window, fetcher_spec: str) -> Iterator[tuple]:
    fetch = _resolve_fetcher(fetcher_spec)
    cursor, pages = None, 0
    while True:
        rows, cursor = fetch(part.ws, part.we, cursor)
        yield from rows
        pages += 1
        if cursor is None or pages > 100_000:
            return


class RestWindowedReader(DataSourceReader):
    def __init__(self, options):
        self.options = options
        self.fetcher = options.get("fetcher", f"{__name__}:synthetic_feed")
        self._lo: int | None = None  # keep window iff we > lo
        self._hi: int | None = None  # keep window iff ws < hi (exclusive)

    def pushFilters(self, filters: list[Filter]):
        """Window pruning on event_ts bounds. Every filter is returned
        as unhandled — Spark re-applies them exactly; the bounds only
        have to be conservative for pruning to be correct."""
        for f in filters:
            if getattr(f, "attribute", None) != ("event_ts",):
                continue
            if isinstance(f, (GreaterThan, GreaterThanOrEqual)):
                # window [ws, we) holds ts >(=) v only if we > v
                self._lo = f.value if self._lo is None else max(self._lo, f.value)
            elif isinstance(f, LessThan):
                # ts < v possible only if ws < v
                v = f.value
                self._hi = v if self._hi is None else min(self._hi, v)
            elif isinstance(f, LessThanOrEqual):
                # ts <= v possible only if ws <= v, i.e. ws < v+1
                v = f.value + 1
                self._hi = v if self._hi is None else min(self._hi, v)
        return filters

    def partitions(self) -> Sequence[InputPartition]:
        out = []
        for ws, we in _windows(self.options):
            # synthetic/REST feeds stamp event_ts inside [ws, we)
            if self._lo is not None and we <= self._lo:
                continue
            if self._hi is not None and ws >= self._hi:
                continue
            out.append(_Window(ws, we))
        return out

    def read(self, partition: _Window) -> Iterator[tuple]:
        return _read_window(partition, self.fetcher)


class RestWindowedStreamReader(DataSourceStreamReader):
    """Offset = next unread window start. The checkpoint owns the
    offsets — ``partitions(start, end)`` consumes exactly the committed
    range, so a restarted query resumes at the precise window boundary
    (exactly-once into an idempotent/transactional sink).

    ``latestOffset`` reports everything currently available (``end``
    for this bounded feed; a live feed would report the last *closed*
    window behind the wall clock). Rate limiting deliberately does NOT
    live in ``latestOffset`` internal state: after a restart the JVM's
    committed offset is ahead of a rebuilt reader's memory, and a
    stateful limiter would hand Spark a backwards offset — replaying
    windows. Parallelism is still per-window: each window in the batch
    is its own input partition."""

    def __init__(self, options):
        self.options = options
        self.fetcher = options.get("fetcher", f"{__name__}:synthetic_feed")
        self.start = int(options["start"])
        self.end = int(options["end"])
        self.slice_s = int(options.get("slice", "3600"))

    def initialOffset(self) -> dict:
        return {"ws": self.start}

    def latestOffset(self) -> dict:
        return {"ws": self.end}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        lo, hi = int(start["ws"]), int(end["ws"])
        return [
            _Window(ws, min(ws + self.slice_s, hi))
            for ws in range(lo, hi, self.slice_s)
        ]

    def commit(self, end: dict) -> None:
        pass

    def read(self, partition: _Window) -> Iterator[tuple]:
        return _read_window(partition, self.fetcher)


class RestWindowedDataSource(DataSource):
    """``spark.read.format("rest_windowed")`` / ``spark.readStream``.

    Options: ``start``/``end`` (epoch seconds), ``slice`` (window
    seconds, default 3600), ``fetcher`` (``module:function`` returning
    ``(rows, next_cursor)``), ``schema_ddl`` (row schema override)."""

    @classmethod
    def name(cls) -> str:
        return "rest_windowed"

    def schema(self) -> str:
        return self.options.get("schema_ddl", DEFAULT_SCHEMA)

    def reader(self, schema) -> RestWindowedReader:
        return RestWindowedReader(self.options)

    def streamReader(self, schema) -> RestWindowedStreamReader:
        return RestWindowedStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration of the engine's Python data sources.
    Also enables Python-source filter pushdown (off by default in 4.1;
    without it a reader implementing ``pushFilters`` is rejected).

    The DataSource class is marked pickle-by-value: the create-source
    worker unpickles it OUTSIDE this package's import path (its
    sys.path is the driver process CWD, not wherever the engine is
    installed), so by-reference pickling breaks the moment the driver
    runs from another directory."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        import sys

        from pyspark import cloudpickle

        cloudpickle.register_pickle_by_value(sys.modules[__name__])
    except Exception:
        pass  # older cloudpickle: fall back to by-reference pickling
    spark.dataSource.register(RestWindowedDataSource)
