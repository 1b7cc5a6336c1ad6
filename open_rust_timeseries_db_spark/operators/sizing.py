"""Catalyst size-estimate helper shared by size-gated strategies.

"Don't know means don't gate": strategy cutovers (e.g. the as-of
join's broadcast probe, operators/asof.py) must never act on a bogus
estimate — Catalyst defaults unsized leaves to
``spark.sql.defaultSizeInBytes`` (Long.MaxValue stock) and join
estimates MULTIPLY child sizes, so a bogus leaf inflates every plan
above it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def estimated_size_bytes(df: DataFrame) -> int:
    """Catalyst's estimated output size of the optimized plan, in bytes.

    Returns -1 when the estimate is unavailable OR not credible: leaves
    Catalyst cannot size (LogicalRDD, some in-memory relations) default
    to ``spark.sql.defaultSizeInBytes`` (Long.MaxValue out of the box),
    and join estimates MULTIPLY child sizes — so a bogus leaf inflates
    every plan above it. Gating on such a value would spuriously refuse
    small inputs on a public API; "don't know" must mean "don't gate",
    not "raise". Non-positive estimates, estimates past the 1 PiB
    sanity cap (which covers stock Long.MaxValue and its
    projection-scaled derivatives), and exact hits on
    defaultSizeInBytes (an unsized leaf echoing a lowered default) are
    treated as unknown; everything else — including large real
    estimates under a lowered default — keeps gating.
    """
    try:
        sess = df.sparkSession
        stats = df._jdf.queryExecution().optimizedPlan().stats()
        est = int(str(stats.sizeInBytes()))
        try:
            default = int(sess.conf.get("spark.sql.defaultSizeInBytes"))
        except Exception:
            default = 9223372036854775807  # Long.MaxValue, the stock default
        # Equality with defaultSizeInBytes is NOT enough: Catalyst
        # SCALES a leaf's estimate by the projection's column-width
        # ratio, so a bogus Long.MaxValue leaf seen through a narrow
        # select lands just below it (measured: a 3-column LogicalRDD
        # projected to 1 column estimated 3.35e18 "bytes" for 100
        # rows). Anything past 1 PiB cannot be a real single-frame
        # estimate (a 100 TB table is 1e14) and is treated as unknown.
        #
        # But the >= comparison is only a bogosity signal when default
        # is the STOCK Long.MaxValue: a deployment that lowers
        # defaultSizeInBytes (a common broadcast-tuning knob) below a
        # caller's gate budget would otherwise turn every
        # genuinely-large real estimate into "unknown" and silently
        # skip the gate. With a lowered default, only an EXACT hit (an
        # unsized leaf reporting the default verbatim) reads as
        # unknown; everything else is a real estimate and keeps gating.
        sanity_max = 1 << 50
        if est <= 0 or est > sanity_max or est == default:
            return -1
        return est
    except Exception:
        return -1
