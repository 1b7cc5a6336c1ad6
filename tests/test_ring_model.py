"""Model-based fuzz of the Table ring buffer (reference §2.1 E1-E6).

Hypothesis drives arbitrary op sequences against both the Table and a
plain bounded-FIFO reference model (a deque plus the overflow policy),
checking every return value, the probes, the latency-stats counters'
successful-op-only accounting (reference
src/tests/integration_test.rs:180-182, 234-237), and the final drain
order. The multithreaded MPMC soak lives in test_api.py; this pins the
sequential semantics those threads interleave.
"""

from __future__ import annotations

from collections import deque

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import types as T

from open_rust_timeseries_db_spark.api import Table

_SCHEMA = T.StructType([T.StructField("v", T.LongType(), True)])

_op = st.one_of(
    st.tuples(st.just("write"), st.integers(min_value=-3, max_value=3)),
    st.tuples(st.just("read")),
    st.tuples(st.just("probe")),
)


@settings(max_examples=80, deadline=None)
@given(
    cap=st.integers(min_value=1, max_value=6),
    overflow=st.sampled_from(["reject-new", "drop-oldest"]),
    ops=st.lists(_op, max_size=120),
)
def test_ring_matches_bounded_fifo_model(spark, cap, overflow, ops):
    t = Table(spark, "fuzz", _SCHEMA, capacity=cap, overflow=overflow)
    model: deque = deque()
    n_ok_writes = n_ok_reads = 0
    for op in ops:
        if op[0] == "write":
            rec = {"v": op[1]}
            got = t.write_record(rec)
            if len(model) >= cap:
                if overflow == "reject-new":
                    assert got is False
                else:
                    model.popleft()
                    model.append(op[1])
                    assert got is True
                    n_ok_writes += 1
            else:
                model.append(op[1])
                assert got is True
                n_ok_writes += 1
        elif op[0] == "read":
            got = t.read_one_record()
            if model:
                assert got == {"v": model.popleft()}
                n_ok_reads += 1
            else:
                assert got is None
        else:
            assert t.record_count() == len(model)
            assert t.is_empty() == (len(model) == 0)
            assert t.is_full() == (len(model) >= cap)
            assert t.capacity() == cap
    stats = t.get_stats()
    assert stats["n_writes"] == n_ok_writes
    assert stats["n_reads"] == n_ok_reads
    # Drain: strict FIFO to empty.
    while model:
        assert t.read_one_record() == {"v": model.popleft()}
    assert t.read_one_record() is None
    assert t.is_empty()


@settings(max_examples=40, deadline=None)
@given(
    rec=st.dictionaries(
        st.sampled_from(["v", "w", "x"]), st.integers() | st.none(), max_size=3
    )
)
def test_ring_schema_validation_total(spark, rec):
    # Any record that isn't exactly {"v": int|None} raises KeyError
    # (shape) — the strict-schema DDL the reference declares but never
    # enforces; well-shaped records always land.
    t = Table(spark, "fuzz2", _SCHEMA, capacity=4)
    if set(rec) != {"v"}:
        with pytest.raises(KeyError):
            t.write_record(rec)
    else:
        assert t.write_record(rec) is True
