"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference sessionizes in *batch* (``MachineLearning/Ray/recsys/
generate_data.py:120-144``) and restarts the whole job when late files
arrive. The streaming-native form keeps per-key state (last event time +
running session counter) across micro-batches, so session ids continue
seamlessly as new files land — no reprocessing of history.

Scale notes: state is one tiny tuple per key (two int64s), partitioned
by the grouping key — state size is O(distinct keys), never O(rows).
Arrow moves each group's micro-batch slice to Python in one block, not
per-row. For pure windowed aggregation prefer ``streaming.windows``
(JVM-side, no Python); this operator exists for semantics Spark's
built-in ``session_window`` can't express — here, the *batch-identical*
1-based dense session numbering per key, so a streaming backfill and the
batch ``operators.windows.sessionize`` produce byte-identical tables.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructType


def sessionize_stream(
    df: DataFrame,
    keys: Sequence[str],
    order_by: str,
    gap: int,
    out: str = "session_id",
) -> DataFrame:
    """Streaming twin of ``operators.windows.sessionize`` (W5).

    ``order_by`` must be a monotonically-arriving numeric event-time
    column (int64 ns, like the batch op). Within a micro-batch the
    group's rows are sorted; across micro-batches the carried state
    ``(last_ts, current_session)`` continues the numbering. Emits every
    input row exactly once (update mode) with its assigned session id.
    """
    out_schema = StructType(list(df.schema.fields)).add(out, LongType())
    state_schema = StructType().add("last_ts", LongType()).add("sid", LongType())
    key_cols = list(keys)

    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            last_ts, sid = state.get
        else:
            last_ts, sid = None, 0
        for pdf in pdfs:
            pdf = pdf.sort_values(order_by, kind="mergesort")
            ids = []
            for ts in pdf[order_by]:
                ts = int(ts)
                if last_ts is None or ts - last_ts > gap:
                    sid += 1
                ids.append(sid)
                last_ts = ts
            pdf[out] = pd.Series(ids, index=pdf.index, dtype="int64")
            yield pdf
        state.update((last_ts, sid))

    return df.groupBy(*key_cols).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def ewma_bands_stream(
    df: DataFrame,
    keys: Sequence[str],
    order_by: str,
    value_col: str,
    alpha: float = 0.3,
    k: float = 3.0,
    min_points: int = 5,
    out_prefix: str = "",
) -> DataFrame:
    """Streaming twin of ``operators.timeseries.ewma_bands`` — the
    online metric monitor: per-key state carries the exponentially
    weighted mean and variance (standard EWMA/EWMV recursions,
    infinite-history form; the batch op's truncated window is the
    offline approximation of the same band), and every arriving point
    is judged against the band BUILT FROM STATE BEFORE IT — an anomaly
    never widens the band that should catch it... until it is absorbed
    on the next update, which is the standard EWMA trade-off.

    State per key: (n, ewma, ewmv) — three scalars, O(distinct keys)
    total. Points before ``min_points`` observations are never flagged
    (the band is still warming up). Emits every row once (update mode)
    with ewma/sigma/is_anomaly columns appended."""
    from pyspark.sql.types import BooleanType, DoubleType

    p = out_prefix
    out_schema = (
        StructType(list(df.schema.fields))
        .add(f"{p}ewma", DoubleType())
        .add(f"{p}sigma", DoubleType())
        .add(f"{p}is_anomaly", BooleanType())
    )
    state_schema = (
        StructType()
        .add("n", LongType())
        .add("ewma", DoubleType())
        .add("ewmv", DoubleType())
    )

    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import math

        if state.exists:
            n, ewma, ewmv = state.get
        else:
            n, ewma, ewmv = 0, None, 0.0
        for pdf in pdfs:
            pdf = pdf.sort_values(order_by, kind="mergesort")
            means, sigmas, flags = [], [], []
            for x in pdf[value_col].astype(float):
                sigma = math.sqrt(ewmv) if n >= 2 else None
                flags.append(
                    bool(
                        n >= min_points
                        and sigma is not None
                        and sigma > 0
                        and abs(x - ewma) > k * sigma
                    )
                )
                sigmas.append(sigma)
                if ewma is None:
                    ewma = x
                else:
                    delta = x - ewma
                    ewma = ewma + alpha * delta
                    ewmv = (1.0 - alpha) * (ewmv + alpha * delta * delta)
                n += 1
                means.append(ewma)
            pdf[f"{p}ewma"] = pd.Series(means, index=pdf.index, dtype="float64")
            pdf[f"{p}sigma"] = pd.Series(sigmas, index=pdf.index, dtype="float64")
            pdf[f"{p}is_anomaly"] = pd.Series(flags, index=pdf.index, dtype="bool")
            yield pdf
        state.update((n, float(ewma) if ewma is not None else 0.0, float(ewmv)))

    return df.groupBy(*list(keys)).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def funnel_stream(
    df: DataFrame,
    user_col: str,
    order_by: str,
    steps: Sequence[tuple[str, str]],
    event_col: str = "event_type",
) -> DataFrame:
    """Streaming twin of ``operators.windows.funnel_progress``: per-user
    state carries the first-completion time of each step
    (``t_<step>``, monotone nulls), updated as events arrive. ``steps``
    maps step name → event value. Emits ONE row per user per
    micro-batch in which the user's chain advanced (update mode) with
    the current chain + ``furthest_step``.

    Semantics note: events are applied in event-time order *within*
    each micro-batch, but an event arriving in a later batch cannot
    complete a step retroactively before state that already advanced —
    on in-order streams this matches the batch funnel exactly (tested);
    under heavy disorder run the batch op on the landed table instead.
    State: k int64 timestamps per user."""
    from pyspark.sql.types import LongType as _Long, StructType as _Struct

    names = [n for n, _ in steps]
    targets = {n: v for n, v in steps}
    out_schema = _Struct().add(user_col, df.schema[user_col].dataType)
    state_schema = _Struct()
    for n in names:
        out_schema = out_schema.add(f"t_{n}", _Long())
        state_schema = state_schema.add(f"t_{n}", _Long())
    out_schema = out_schema.add("furthest_step", _Long())

    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        times = list(state.get) if state.exists else [None] * len(names)
        advanced = False
        for pdf in pdfs:
            pdf = pdf.sort_values(order_by, kind="mergesort")
            for ts, ev in zip(pdf[order_by], pdf[event_col]):
                ts = int(ts)
                for i, n in enumerate(names):
                    if times[i] is not None:
                        continue
                    prev_ok = i == 0 or (
                        times[i - 1] is not None and ts >= times[i - 1]
                    )
                    if ev == targets[n] and prev_ok:
                        times[i] = ts
                        advanced = True
                    break  # only the first incomplete step can fire
        if advanced:
            state.update(tuple(times))
            done = sum(1 for t in times if t is not None)
            yield pd.DataFrame(
                [[key[0], *times, done]],
                columns=[user_col, *[f"t_{n}" for n in names], "furthest_step"],
            )

    return df.groupBy(user_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
