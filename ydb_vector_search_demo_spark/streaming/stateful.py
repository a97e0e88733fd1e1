"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference has no streaming surface (SURVEY.md §2.5); this is the
north-star "custom stateful operator" seam: arbitrary per-key state
maintained across micro-batches, Arrow-batched. The demo operator keeps
a running per-user event count — the state pattern (read → fold new
batch → update → emit) is exactly what a production enrichment /
anomaly / CDC-merge operator would use.

Scale notes: state lives in the state store partitioned by the group
key (one shuffle); each micro-batch touches only keys present in the
batch. Skewed keys are the hazard — a hot user funnels its whole batch
slice through one task. The events fixture is uniform; production would
salt or pre-aggregate upstream.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Iterator

import pandas as pd
from pyspark.sql import DataFrame

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql.streaming.state import GroupState

OUTPUT_SCHEMA = "user_id BIGINT, n_events BIGINT"
STATE_SCHEMA = "n BIGINT"


def _update_counts(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: "GroupState"
) -> Iterator[pd.DataFrame]:
    n = state.get[0] if state.exists else 0
    for pdf in pdfs:
        n += len(pdf)
    state.update((n,))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n]})


def running_user_counts(stream: DataFrame) -> DataFrame:
    """Per-user running event counts with explicit keyed state."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from ydb_vector_search_demo_spark.shipping import ensure_package_on_workers

    ensure_package_on_workers()
    return stream.groupBy("user_id").applyInPandasWithState(
        _update_counts,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


TOPK_OUTPUT_SCHEMA = "id BIGINT, score DOUBLE"
TOPK_STATE_SCHEMA = "ids ARRAY<BIGINT>, scores ARRAY<DOUBLE>"


def running_topk(
    scored: DataFrame, k: int = 5, id_col: str = "id", score_col: str = "score"
) -> DataFrame:
    """Streaming top-k (lowest ``score_col`` wins, id tie-break) with
    state BOUNDED at k candidates — the O(k) alternative to the
    complete-mode ``slice(array_sort(collect_list(...)))`` top-k, whose
    state is the whole scored corpus. Each micro-batch folds its rows
    into the k-candidate state and emits the current top-k; the last
    update is the answer. One global group: top-k is a total order, so
    the merge point is inherently single-key — the heavy part (scoring)
    stays fully parallel upstream, and only ≤ batch-local candidates
    reach the stateful task. At real scale insert a per-partition
    pre-top-k before the global fold (same two-level shape as the batch
    KNN operator)."""
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    from ydb_vector_search_demo_spark.shipping import ensure_package_on_workers

    ensure_package_on_workers()

    def _update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: "GroupState"
    ) -> Iterator[pd.DataFrame]:
        ids: list[int]
        scores: list[float]
        if state.exists:
            ids, scores = list(state.get[0]), list(state.get[1])
        else:
            ids, scores = [], []
        for pdf in pdfs:
            ids.extend(int(x) for x in pdf["id"])
            scores.extend(float(x) for x in pdf["score"])
        order = sorted(range(len(ids)), key=lambda i: (scores[i], ids[i]))[:k]
        ids = [ids[i] for i in order]
        scores = [scores[i] for i in order]
        state.update((ids, scores))
        yield pd.DataFrame({"id": ids, "score": scores})

    keyed = scored.select(
        F.lit(0).alias("_g"),
        F.col(id_col).cast("bigint").alias("id"),
        F.col(score_col).cast("double").alias("score"),
    )
    return (
        keyed.groupBy("_g")
        .applyInPandasWithState(
            _update,
            outputStructType=TOPK_OUTPUT_SCHEMA,
            stateStructType=TOPK_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
