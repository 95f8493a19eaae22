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
