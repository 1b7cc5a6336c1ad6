"""Custom stateful streaming: running per-key aggregates via
``applyInPandasWithState``.

The reference's consumers hold cross-batch state in shared structs —
running VWAP inputs (src/tests/integration_test.rs:240-256) and
latency min/max/total folds (:334-357) survive across ring drains.
Structured Streaming's built-in windowed aggregates cover the windowed
forms; this operator is the UNWINDOWED running form: state keyed by
symbol, updated every micro-batch, emitted as a changelog.

Built-ins can't express "emit the running total after each batch" in
update mode with custom merge logic — this is the documented
``applyInPandasWithState`` case (GroupState keyed by the grouping
columns, Arrow-batched updates).

Scale: state is per-key O(1) (four scalars), partitioned by key across
executors like any stateful op; a timeout (GroupStateTimeout) would
evict idle keys on unbounded key spaces — not set here because the
market-symbol space is finite.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING, Any

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

RUNNING_VWAP_SCHEMA = T.StructType(
    [
        T.StructField("key", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("sum_pq_fx", T.LongType()),  # fixed-point 1e6
        T.StructField("sum_q", T.LongType()),
        T.StructField("vwap", T.DoubleType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("sum_pq_fx", T.LongType()),
        T.StructField("sum_q", T.LongType()),
    ]
)

_FX = 1_000_000  # price*qty accumulated as floor(pq * 1e6) — exact int merge


def running_vwap_stateful(
    stream: DataFrame,
    key_col: str = "symbol_id",
    price_col: str = "price",
    qty_col: str = "quantity",
) -> DataFrame:
    """Changelog of running (cumulative) VWAP per key, one row per key
    per micro-batch that touched it.

    The accumulator is integer fixed-point, so merge order across
    batches/partitions cannot change the result — the same determinism
    rule as the batch queries (queries/helpers.py).
    """

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator["pd.DataFrame"],
        state: GroupState,
    ) -> Iterator["pd.DataFrame"]:
        import math

        import pandas as pd

        n, sum_pq_fx, sum_q = state.get if state.exists else (0, 0, 0)
        for pdf in pdfs:
            prices = pdf[price_col].astype("float64")
            qtys = pdf[qty_col].astype("int64")
            n += len(pdf)
            # per-row floor keeps the accumulator exactly mergeable
            sum_pq_fx += int(
                sum(math.floor(p * q * _FX) for p, q in zip(prices, qtys))
            )
            sum_q += int(qtys.sum())
        state.update((n, sum_pq_fx, sum_q))
        vwap = (sum_pq_fx / _FX) / sum_q if sum_q else float("nan")
        yield pd.DataFrame(
            {
                "key": pd.Series([key[0]], dtype="int64"),
                "n": pd.Series([n], dtype="int64"),
                "sum_pq_fx": pd.Series([sum_pq_fx], dtype="int64"),
                "sum_q": pd.Series([sum_q], dtype="int64"),
                "vwap": pd.Series([vwap], dtype="float64"),
            }
        )

    return (
        stream.select(key_col, price_col, qty_col)
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=RUNNING_VWAP_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# --- transformWithStateInPandas (Spark 4 stateful API) ---------------

RUNNING_MINMAX_SCHEMA = T.StructType(
    [
        T.StructField("key", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("min_v", T.DoubleType()),
        T.StructField("max_v", T.DoubleType()),
    ]
)

_MINMAX_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("min_v", T.DoubleType()),
        T.StructField("max_v", T.DoubleType()),
    ]
)


def transform_with_state_available() -> bool:
    """True when ``transformWithStateInPandas`` can actually run: its
    driver<->state-server protocol is protobuf-based and the pyspark
    wheel does not bundle the python ``google.protobuf`` package."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def running_minmax_stateful(
    stream: DataFrame,
    key_col: str = "symbol_id",
    value_col: str = "value",
) -> DataFrame:
    """Running per-key min/max/count changelog.

    Backend selection: ``transformWithStateInPandas`` — the Spark 4
    arbitrary-state API (typed ValueState, timers, state TTL)
    superseding ``applyInPandasWithState`` — when its protobuf runtime
    dependency is importable; otherwise an ``applyInPandasWithState``
    twin with the identical accumulator, output schema, and update-mode
    changelog contract. Both paths produce the same rows for the same
    micro-batch sequence, so the operator's contract (and its test) is
    backend-independent.

    Mirrors the reference's lock-free running-max consumer and
    min/max/count latency fold (reference
    src/tests/integration_test.rs:80-93, :334-357): state is per-key
    O(1) scalars merged with min/max — order-insensitive, so replayed
    or reordered micro-batches converge to the same result.
    """
    if not transform_with_state_available():
        return _running_minmax_applyinpandas(stream, key_col, value_col)
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningMinMax(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._acc = handle.getValueState("acc", _MINMAX_STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            prev = self._acc.get() if self._acc.exists() else None
            n, mn, mx = prev if prev is not None else (0, None, None)
            for pdf in rows:
                vals = pdf[value_col].astype("float64")
                if len(vals) == 0:
                    continue
                n += len(vals)
                bmin, bmax = float(vals.min()), float(vals.max())
                mn = bmin if mn is None else min(mn, bmin)
                mx = bmax if mx is None else max(mx, bmax)
            self._acc.update((n, mn, mx))
            yield pd.DataFrame(
                {
                    "key": pd.Series([key[0]], dtype="int64"),
                    "n": pd.Series([n], dtype="int64"),
                    "min_v": pd.Series([mn], dtype="float64"),
                    "max_v": pd.Series([mx], dtype="float64"),
                }
            )

        def close(self) -> None:
            pass

    spark = stream.sparkSession
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    return (
        stream.select(key_col, value_col)
        .groupBy(key_col)
        .transformWithStateInPandas(
            RunningMinMax(),
            outputStructType=RUNNING_MINMAX_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


def _running_minmax_applyinpandas(
    stream: DataFrame,
    key_col: str = "symbol_id",
    value_col: str = "value",
) -> DataFrame:
    """``applyInPandasWithState`` twin of :func:`running_minmax_stateful`
    — same accumulator, same output schema, same update-mode changelog.
    Used automatically when the transformWithState protobuf runtime is
    absent (see :func:`transform_with_state_available`)."""

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator["pd.DataFrame"],
        state: GroupState,
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        n, mn, mx = state.get if state.exists else (0, None, None)
        for pdf in pdfs:
            vals = pdf[value_col].astype("float64")
            if len(vals) == 0:
                continue
            n += len(vals)
            bmin, bmax = float(vals.min()), float(vals.max())
            mn = bmin if mn is None else min(mn, bmin)
            mx = bmax if mx is None else max(mx, bmax)
        state.update((n, mn, mx))
        yield pd.DataFrame(
            {
                "key": pd.Series([key[0]], dtype="int64"),
                "n": pd.Series([n], dtype="int64"),
                "min_v": pd.Series([mn], dtype="float64"),
                "max_v": pd.Series([mx], dtype="float64"),
            }
        )

    return (
        stream.select(key_col, value_col)
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=RUNNING_MINMAX_SCHEMA,
            stateStructType=_MINMAX_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
