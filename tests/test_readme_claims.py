"""README perf claims are GENERATED from ORACLE_BENCH.json, not
hand-written — this lockstep test fails on any drift (the round-8
verdict caught prose claiming ZERO over-gate rows while the committed
artifact had two). Pure-Python: no Spark session."""

from __future__ import annotations

import importlib.util
import json
import re
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def _load_mod():
    spec = importlib.util.spec_from_file_location(
        "readme_perf_claims", ROOT / "scripts" / "readme_perf_claims.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_readme_gate_claim_matches_committed_artifact():
    mod = _load_mod()
    bench = json.loads((ROOT / "ORACLE_BENCH.json").read_text())
    expected = mod.compute_block(bench)
    readme = (ROOT / "README.md").read_text()
    m = re.search(
        re.escape(mod.BEGIN) + r"\n(.*?)\n" + re.escape(mod.END),
        readme,
        re.S,
    )
    assert m, "README.md lost its ORACLE_GATE_CLAIM block"
    assert m.group(1) == expected, (
        "README's committed-roll perf block drifted from "
        "ORACLE_BENCH.json — rerun scripts/readme_perf_claims.py"
    )


def test_readme_has_no_handwritten_zero_claim():
    """The specific round-8 drift shape: a hand-written 'committed
    pairing: ZERO/none over the gate' assertion outside the generated
    block."""
    readme = (ROOT / "README.md").read_text()
    assert "committed pairing: ZERO" not in readme
