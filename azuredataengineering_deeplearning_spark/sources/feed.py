"""S19 — streaming training feed with a shuffle buffer.

The reference streams parquet shards through HuggingFace
``load_dataset(..., streaming=True).with_format('numpy')`` and a
``shuffle(seed=44, buffer_size=5000)`` reservoir
(``MachineLearning/ML/ffnn_hf_stream.py:20-27``): train a model on data
that never fully fits in memory, with local (buffered) shuffling rather
than a global sort.

Spark-first translation: the DataFrame IS the streaming dataset —
``toLocalIterator`` pulls ONE partition at a time to the driver (never
the whole frame), and a seeded buffer shuffle reorders rows exactly like
HF's: fill a ``buffer_size`` reservoir, then for every new row emit a
random reservoir slot and replace it. Batches come out as numpy column
dicts (``with_format('numpy')``).

Scale shape: upstream transformations (filter, project, tokenize) run
distributed before the iterator; the driver holds at most one partition
plus the shuffle buffer. For multi-worker training, shard FIRST
(``u_hash_fold``-style deterministic fold split) and give each worker
its own shard's iterator — same as HF's ``split_dataset_by_node``.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import numpy as np
from pyspark.sql import DataFrame


def stream_numpy_batches(
    df: DataFrame,
    batch_size: int = 256,
    shuffle_buffer: int = 0,
    seed: int = 44,
    columns: Sequence[str] | None = None,
) -> Iterator[dict[str, np.ndarray]]:
    """Yield ``{col: np.ndarray}`` batches from a DataFrame, streaming
    one partition at a time with an optional seeded shuffle buffer.

    ``shuffle_buffer=0`` preserves partition order (HF without
    ``.shuffle``); ``>0`` reproduces HF's buffered shuffle: deterministic
    for a given (plan, seed) since partitions arrive in order."""
    if columns:
        df = df.select(*columns)
    names = df.columns
    rng = np.random.default_rng(seed)
    buf: list = []

    def to_batches(rows: list) -> Iterator[dict[str, np.ndarray]]:
        for i in range(0, len(rows), batch_size):
            chunk = rows[i : i + batch_size]
            yield {
                n: np.array([r[j] for r in chunk])
                for j, n in enumerate(names)
            }

    pending: list = []

    def drain_full_batches() -> Iterator[dict[str, np.ndarray]]:
        while len(pending) >= batch_size:
            chunk, del_ = pending[:batch_size], pending[batch_size:]
            pending[:] = del_
            yield {
                n: np.array([r[j] for r in chunk]) for j, n in enumerate(names)
            }

    for row in df.toLocalIterator(prefetchPartitions=True):
        t = tuple(row)
        if shuffle_buffer <= 0:
            pending.append(t)
        elif len(buf) < shuffle_buffer:
            buf.append(t)
        else:
            slot = rng.integers(shuffle_buffer)
            pending.append(buf[slot])
            buf[slot] = t
        yield from drain_full_batches()
    if shuffle_buffer > 0 and buf:
        # drain the reservoir in random order (HF does the same at end)
        order = rng.permutation(len(buf))
        pending.extend(buf[i] for i in order)
    yield from drain_full_batches()
    if pending:
        yield from to_batches(pending)
