"""The bench stdout contract: ONE JSON line the recording driver can
parse from its 2000-char stdout tail window.

Rounds 1-7 all recorded ``"parsed": null`` because the full per-query
map was ~6k chars; the fix is short stable query ids on stdout with the
id -> name mapping in the BENCH_LOCAL.json tee. This locks the line
length and the shape down against the real registry (which is the thing
that grows).
"""

from __future__ import annotations

import json

from bench import compact_stdout_line
from open_rust_timeseries_db_spark.queries import all_queries


def _fake_timings() -> dict[str, float]:
    # Worst realistic values: three-digit seconds everywhere.
    return {name: 123.4567 for name in all_queries()}


def test_compact_line_fits_driver_window() -> None:
    timings = _fake_timings()
    line, id_names = compact_stdout_line(
        timings,
        cold_total=999.99,
        cache_build_total=99.99,
        sf=0.1,
        total=sum(timings.values()),
    )
    assert len(line) <= 1900
    parsed = json.loads(line)
    assert parsed["metric"] == "total_query_wall_seconds"
    assert parsed["unit"] == "sec"
    assert parsed["sf"] == 0.1
    assert len(parsed["queries"]) == len(timings)
    # Every short id maps back to a registered query name, bijectively.
    assert sorted(id_names.values()) == sorted(timings)
    assert set(parsed["queries"]) == set(id_names)


def test_query_ids_frozen_in_committed_map() -> None:
    # Every registered query's id comes verbatim from the committed
    # append-only map — ids may never shift when queries are added
    # (round 12: positional ids manufactured 33 phantom regressions in
    # the driver's round-over-round comparison).
    import pathlib

    frozen = json.loads(
        (pathlib.Path(__file__).parent.parent / "bench_query_ids.json")
        .read_text()
    )
    timings = _fake_timings()
    assert set(timings) <= set(frozen), (
        "new query names must be appended to bench_query_ids.json "
        f"(missing: {sorted(set(timings) - set(frozen))})"
    )
    _, id_names = compact_stdout_line(timings, 0.0, 0.0, 0.01, 0.0)
    assert id_names == {frozen[n]: n for n in timings}


def test_new_names_append_without_renumbering() -> None:
    from bench import query_id_map

    timings = _fake_timings()
    base = query_id_map(timings)
    grown = dict(timings)
    grown["q_zzz_hypothetical_future"] = 1.0
    grown["q_aaa_hypothetical_future"] = 1.0
    regrown = query_id_map(grown)
    # Existing names keep their exact ids...
    assert all(regrown[n] == base[n] for n in timings)
    # ...and additions land past the frozen maximum, in sorted order.
    max_id = max(int(q[1:]) for q in base.values())
    assert regrown["q_aaa_hypothetical_future"] == f"q{max_id + 1}"
    assert regrown["q_zzz_hypothetical_future"] == f"q{max_id + 2}"


def test_headroom_for_registry_growth() -> None:
    # The line must keep fitting as queries are added: synthesize 130
    # names at the registry's current average length and re-check.
    names = [f"q_some_future_query_name_{i:03d}" for i in range(130)]
    timings = {n: 12.34 for n in names}
    line, _ = compact_stdout_line(timings, 500.0, 50.0, 0.1, 400.0)
    assert len(line) <= 1900
