"""Per-key streaming top-k via Spark 4's ``transformWithStateInPandas``,
with an ``applyInPandasWithState`` fallback.

``transformWithStateInPandas`` (SPARK-49564, the arbitrary-state v2 API) is
the sanctioned Spark 4 replacement for ``applyInPandasWithState``: typed
state handles (ValueState/ListState/MapState), timers, and a driver-side
``StatefulProcessor`` lifecycle. Its Python runtime speaks protobuf to the
JVM state server — and ``google.protobuf`` is not installed in this
sandbox, so the real path is import-gated exactly like XGBoost/SHAP
(ml/models.py): the semantics are identical through the
``applyInPandasWithState`` fallback, and the gating pytest flips to the
real path the moment protobuf exists.

The operator itself: maintain each user's top-k event values and non-null
count across micro-batches. Top-k state is a bounded ``array<double>`` —
the multiset of the k largest values is batch-order-independent, which is
what makes the streaming result oracle-checkable against a batch window
rank.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .stream import read_events_stream, run_update_mode, take_latest_per_key

K = 3

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_seen", T.LongType()),
        T.StructField("top", T.ArrayType(T.DoubleType())),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_seen", T.LongType()),
        T.StructField("top1", T.DoubleType()),
        T.StructField("top2", T.DoubleType()),
        T.StructField("top3", T.DoubleType()),
    ]
)


def transform_with_state_available() -> bool:
    """True when the transformWithStateInPandas runtime can actually start:
    its driver worker imports protobuf-generated message classes."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def _merge_topk(
    n: int, top: list[float], values: pd.Series
) -> tuple[int, list[float]]:
    vals = values.dropna()
    n += int(vals.size)
    top = sorted(list(top) + vals.tolist(), reverse=True)[:K]
    return n, top


def _emit_row(key, n: int, top: list[float]) -> pd.DataFrame:
    pad = list(top) + [None] * (K - len(top))
    return pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_seen": [n],
            "top1": [pad[0]],
            "top2": [pad[1]],
            "top3": [pad[2]],
        }
    )


def _update_topk(key, pdfs: Iterator, state: GroupState) -> Iterator:
    """applyInPandasWithState fallback: state is a (n_seen, top[]) row."""
    if state.exists:
        n, top = state.get
        top = list(top or [])
    else:
        n, top = 0, []
    for pdf in pdfs:
        n, top = _merge_topk(n, top, pdf["value"])
    state.update((n, top))
    yield _emit_row(key, n, top)


def _make_topk_processor():
    """Build the transformWithStateInPandas StatefulProcessor (real path).

    Deferred to a factory so importing this module never touches the TWS
    runtime on protobuf-less environments.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class TopKProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("topk", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues) -> Iterator:
            if self._state.exists():
                n, top = self._state.get()
                top = list(top or [])
            else:
                n, top = 0, []
            for pdf in rows:
                n, top = _merge_topk(n, top, pdf["value"])
            self._state.update((n, top))
            yield _emit_row(key, n, top)

        def close(self) -> None:
            pass

    return TopKProcessor()


def streaming_user_topk(
    spark: SparkSession,
    sf_dir: str,
    timeout_sec: int = 120,
    use_transform_with_state: bool | None = None,
) -> DataFrame:
    """Run the per-user top-k stateful operator over the events stream
    (AvailableNow → memory sink, update mode) and return the final state.

    ``use_transform_with_state=None`` auto-selects: the real Spark 4
    ``transformWithStateInPandas`` path when its protobuf runtime is
    importable, the ``applyInPandasWithState`` fallback otherwise. Both
    paths share the merge function (`_merge_topk`), so semantics are
    identical by construction.
    """
    from .stream import (
        derived_state_partitions,
        events_input_bytes,
        scoped_shuffle_partitions,
    )

    if use_transform_with_state is None:
        use_transform_with_state = transform_with_state_available()
    parts = derived_state_partitions(spark, events_input_bytes(sf_dir))
    with scoped_shuffle_partitions(spark, parts):
        stream = read_events_stream(spark, sf_dir).select("user_id", "value")
        if use_transform_with_state:
            out = stream.groupBy("user_id").transformWithStateInPandas(
                _make_topk_processor(),
                outputStructType=OUTPUT_SCHEMA,
                outputMode="Update",
                timeMode="None",
            )
        else:
            out = stream.groupBy("user_id").applyInPandasWithState(
                _update_topk,
                outputStructType=OUTPUT_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout,
            )
        # update mode appends one row per key per batch; n_seen is strictly
        # monotonic, so the max-n_seen row IS each key's final state.
        t = run_update_mode(spark, out, timeout_sec, "topk")
        return take_latest_per_key(t, "user_id", "n_seen").select(
            "user_id", "n_seen", "top1", "top2", "top3"
        )
