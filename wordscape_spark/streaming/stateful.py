"""Custom stateful streaming operators (applyInPandasWithState).

``dropDuplicates`` covers plain first-wins dedup; these operators implement
state machines the built-ins can't express:

* ``stateful_first_k`` — keep the first k documents per key across
  micro-batches (bounded-cardinality dedup: e.g. cap near-duplicate LSH
  buckets at k representatives instead of dropping all-but-one);
* ``stateful_source_stats`` — per-source running counters (docs seen,
  ok-rate, cumulative quality) emitted as a changelog row per micro-batch —
  the reference monitor's per-worker counters (annotate_run.py:65-156) as
  durable stream state instead of in-process dicts.

Both keep per-key state tiny (a counter / three floats), so state-store
growth is bounded by key cardinality, not stream length.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FIRST_K_OUTPUT = StructType(
    [
        StructField("key", StringType()),
        StructField("doc_id", StringType()),
        StructField("rank_in_key", LongType()),
    ]
)

_FIRST_K_STATE = StructType([StructField("n_seen", LongType())])


def stateful_first_k(
    stream: DataFrame, key_col: str, k: int, id_col: str = "doc_id"
) -> DataFrame:
    """First k rows per key across the whole stream (state = one counter).

    Input must carry (key_col, id_col); emits (key, doc_id, rank_in_key)
    for accepted rows only.  Unlike ``dropDuplicates`` this keeps k > 1
    representatives, and unlike a windowed rank it works incrementally
    across micro-batches with O(1) state per key.
    """

    def first_k(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (n_seen,) = state.get if state.exists else (0,)
        out_ids: list[Any] = []
        ranks: list[int] = []
        for pdf in pdfs:
            for doc_id in pdf[id_col]:
                n_seen += 1
                if n_seen <= k:
                    out_ids.append(doc_id)
                    ranks.append(n_seen)
        state.update((n_seen,))
        if out_ids:
            yield pd.DataFrame(
                {
                    "key": [key[0]] * len(out_ids),
                    "doc_id": out_ids,
                    "rank_in_key": ranks,
                }
            )

    return (
        stream.select(key_col, id_col)
        .groupBy(key_col)
        .applyInPandasWithState(
            first_k,
            outputStructType=FIRST_K_OUTPUT,
            stateStructType=_FIRST_K_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


SOURCE_STATS_OUTPUT = StructType(
    [
        StructField("source", StringType()),
        StructField("docs_total", LongType()),
        StructField("ok_total", LongType()),
        StructField("quality_sum", DoubleType()),
        StructField("mean_quality", DoubleType()),
    ]
)

_STATS_STATE = StructType(
    [
        StructField("docs_total", LongType()),
        StructField("ok_total", LongType()),
        StructField("quality_sum", DoubleType()),
    ]
)


def stateful_source_stats(
    extracted: DataFrame, source_col: str = "source"
) -> DataFrame:
    """Running per-source counters over the extraction stream: one changelog
    row per (source, micro-batch) with cumulative totals — restartable via
    the stream checkpoint (state store), where the reference's monitor
    counters lived in process memory and died with the worker."""

    def stats(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        docs, ok, qsum = state.get if state.exists else (0, 0, 0.0)
        for pdf in pdfs:
            docs += len(pdf)
            ok += int(pdf["ok"].sum())
            qsum += float(pdf["quality"].fillna(0.0).sum())
        state.update((docs, ok, qsum))
        yield pd.DataFrame(
            {
                "source": [key[0]],
                "docs_total": [docs],
                "ok_total": [ok],
                "quality_sum": [qsum],
                "mean_quality": [qsum / docs if docs else 0.0],
            }
        )

    return (
        extracted.select(source_col, "ok", "quality")
        .groupBy(source_col)
        .applyInPandasWithState(
            stats,
            outputStructType=SOURCE_STATS_OUTPUT,
            stateStructType=_STATS_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
