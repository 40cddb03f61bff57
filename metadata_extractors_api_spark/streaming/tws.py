"""Stateful streaming via the Spark 4 StatefulProcessor API
(transformWithStateInPandas) — the successor to applyInPandasWithState
with TYPED, COMPOSITE state: named ValueState / ListState / MapState
variables, per-variable TTL, and event/processing-time timers, backed
by the RocksDB state store.

The operator here maintains a per-user profile that composes two state
variables — a ValueState (event count + running max) and a MapState
(per-event-type counts, from which the distinct-type count derives) —
the shape applyInPandasWithState can only emulate by packing
everything into one struct.

Environment gate: the TWS Python worker protocol serializes state
through google.protobuf, which this container does not ship (and
installs are off-limits). The processor and wiring below are the real
TWS path and run wherever protobuf is present (any standard Spark 4
cluster image); without it, the SAME semantics run through
applyInPandasWithState so the query stays executable and
oracle-checked everywhere. The active path is chosen by one import
probe at module load — never silently at query time.

Like every streaming query in this package, the stream drains with
trigger=availableNow into a memory sink; the update-mode sink keeps
one row per key per micro-batch and all three profile counters are
monotone, so the final state is the per-key max (see
streaming/windows.py docstring for the contract).
"""

from __future__ import annotations

import contextlib

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

from metadata_extractors_api_spark.registry import register
from metadata_extractors_api_spark.streaming.windows import (
    _events_stream,
    _run_to_table,
)

try:  # pragma: no cover - present on real cluster images
    from google.protobuf import descriptor  # noqa: F401

    HAS_TWS_DEPS = True
except ImportError:
    HAS_TWS_DEPS = False

_OUT_SCHEMA = "user_id bigint, n_events bigint, n_types bigint, max_value double"

_ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


@contextlib.contextmanager
def _rocksdb_conf(spark: SparkSession):
    """transformWithState requires the RocksDB state store; scope the
    provider to the drain and restore the session's previous value."""
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, _ROCKSDB_PROVIDER)
    try:
        yield
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


class UserProfileProcessor(StatefulProcessor):
    """Per-user profile with composite typed state.

    State:
      - counts (ValueState "n bigint, vmax double"): total events and
        running max value.
      - per_type (MapState string -> bigint): events per event_type;
        its key count is the distinct-type counter.

    Emits the updated profile row for the keys touched in each
    micro-batch (update output mode)."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.counts = handle.getValueState("counts", "n bigint, vmax double")
        self.per_type = handle.getMapState("per_type", "t string", "c bigint")

    def handleInputRows(self, key, rows, timerValues):
        cur = self.counts.get()
        n, vmax = cur if cur is not None else (0, float("-inf"))
        n_types = 0
        for pdf in rows:
            n += len(pdf)
            if len(pdf):
                vmax = max(vmax, float(pdf["value"].max()))
            for t, c in pdf.groupby("event_type").size().items():
                k = (t,)
                prev = (
                    self.per_type.getValue(k)[0]
                    if self.per_type.containsKey(k)
                    else 0
                )
                self.per_type.updateValue(k, (prev + int(c),))
        self.counts.update((n, vmax))
        n_types = sum(1 for _ in self.per_type.keys())
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "n_types": [n_types],
                "max_value": [vmax],
            }
        )

    def close(self) -> None:
        pass


def _profile_update(key, pdfs, state):
    """applyInPandasWithState fallback with identical semantics: the
    composite state packed into one struct (n, vmax, seen-type list)."""
    if state.exists:
        n, vmax, types = state.get
        types = list(types)
    else:
        n, vmax, types = 0, float("-inf"), []
    seen = set(types)
    for pdf in pdfs:
        n += len(pdf)
        if len(pdf):
            vmax = max(vmax, float(pdf["value"].max()))
        seen.update(pdf["event_type"].tolist())
    state.update((n, vmax, sorted(seen)))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "n_types": [len(seen)],
            "max_value": [vmax],
        }
    )


@register(
    "stream_profile_tws",
    oracle="""
    SELECT user_id, COUNT(*) AS n_events,
           COUNT(DISTINCT event_type) AS n_types,
           MAX(value) AS max_value
    FROM events GROUP BY user_id
    """,
)
def stream_profile_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite-typed-state streaming profile: per-user event count,
    distinct-event-type count, and running max, maintained across
    micro-batches in named state variables (ValueState + MapState)
    via transformWithStateInPandas — falling back to the identical
    applyInPandasWithState formulation where the TWS protobuf protocol
    dependency is unavailable (see module docstring; the fixture
    container is such an environment). Every counter is monotone and
    order-insensitive, so the drained final state is deterministic and
    hash-checked against the batch GROUP BY oracle either way."""
    ev = _events_stream(spark, sf_dir).select("user_id", "event_type", "value")
    if HAS_TWS_DEPS:  # pragma: no cover - exercised on cluster images
        with _rocksdb_conf(spark):
            out = ev.groupBy("user_id").transformWithStateInPandas(
                UserProfileProcessor(),
                outputStructType=_OUT_SCHEMA,
                outputMode="Update",
                timeMode="None",
            )
            updates = _run_to_table(out, spark, "update")
    else:
        out = ev.groupBy("user_id").applyInPandasWithState(
            _profile_update,
            outputStructType=_OUT_SCHEMA,
            stateStructType="n bigint, vmax double, types array<string>",
            outputMode="update",
            timeoutConf="NoTimeout",
        )
        updates = _run_to_table(out, spark, "update")
    return updates.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max("n_types").alias("n_types"),
        F.max("max_value").alias("max_value"),
    )
