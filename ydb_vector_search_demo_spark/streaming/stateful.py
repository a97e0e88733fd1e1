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
