"""Custom stateful streaming operator: cross-batch exact deduplication.

``stream_dedup`` keeps one piece of state per distinct content hash (seen
flag + representative id + copy count) with ``applyInPandasWithState`` and
emits a row only when the hash is first seen — the streaming form of
``functions.dedup.exact_dedup_groups``.  Spark's native
``dropDuplicates`` on a stream can suppress duplicate ROWS, but it cannot
return the representative row's metadata or maintain a running copy
count; this operator does both.

Scale notes (100 TB): state is partitioned by the 64-hex content hash —
the same 32-byte key the batch dedup shuffles — so the state store grows
one tiny row per DISTINCT document and is hash-balanced across
executors.  Late/duplicate arrivals touch exactly one state partition.
A production deployment would add a state TTL (GroupStateTimeout) for
bounded retention; kept NoTimeout here because dedup state is by nature
append-only.
"""
from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (LongType, StringType, StructField, StructType)

OUTPUT_SCHEMA = StructType([
    StructField("text_sha", StringType(), False),
    StructField("keep_id", LongType(), False),
    StructField("n_new_copies", LongType(), False),
    StructField("first_seen", LongType(), False),  # 1 on the emitting batch
])

STATE_SCHEMA = StructType([
    StructField("keep_id", LongType()),
    StructField("n_copies", LongType()),
])


def _dedup_fn(key, pdf_iter, state: GroupState):
    """One state row per content hash: (keep_id, total copies)."""
    batch_count = 0
    batch_min_id = None
    for pdf in pdf_iter:
        if len(pdf) == 0:
            continue
        batch_count += len(pdf)
        m = int(pdf["doc_id"].min())
        batch_min_id = m if batch_min_id is None else min(batch_min_id, m)
    if batch_count == 0:
        return
    if state.exists:
        keep_id, n_copies = state.get
        state.update((int(keep_id), int(n_copies) + batch_count))
        yield pd.DataFrame({"text_sha": [key[0]],
                            "keep_id": [int(keep_id)],
                            "n_new_copies": [batch_count],
                            "first_seen": [0]})
    else:
        state.update((batch_min_id, batch_count))
        yield pd.DataFrame({"text_sha": [key[0]],
                            "keep_id": [batch_min_id],
                            "n_new_copies": [batch_count],
                            "first_seen": [1]})


def stream_dedup(stream_df: DataFrame, col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Streaming exact dedup: one update row per (batch, content hash);
    ``first_seen=1`` marks the batch where the content first appeared."""
    hashed = stream_df.select(
        F.sha2(F.col(col), 256).alias("text_sha"),
        F.col(id_col).alias("doc_id"))
    return (hashed.groupBy("text_sha")
            .applyInPandasWithState(_dedup_fn, OUTPUT_SCHEMA, STATE_SCHEMA,
                                    "update", GroupStateTimeout.NoTimeout))
