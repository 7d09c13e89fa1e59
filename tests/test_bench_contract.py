"""bench.py is the driver's per-round feedback loop — these pin its
contract WITHOUT running Spark: the frozen headline set must stay a
subset of the live registry (a renamed/removed entry would silently
shrink the judged headline sum), and the compact stdout line must stay
within the driver's ~2000-char capture (overflow made BENCH record
"parsed": null in round 3).
"""

from __future__ import annotations

import importlib.util
import json
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(ROOT, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_headline_set_is_subset_of_registry():
    import sys

    sys.path.insert(0, ROOT)
    import __spark_entry__ as e

    bench = _load_bench()
    registry = set(e.queries())
    missing = [q for q in bench.HEADLINE if q not in registry]
    assert not missing, f"headline queries missing from the registry: {missing}"


def test_compact_line_fits_driver_capture():
    """Worst-case compact line: every headline query at a 3-digit
    seconds value (999.9999) — still under the 1900-char guard bench.py
    itself asserts before printing."""
    bench = _load_bench()
    compact = {
        "metric": "headline_query_wall_time",
        "value": 9999.9999,
        "unit": "sec",
        "sf": 0.1,
        "total_all_queries": 99999.9999,
        "n_queries": 999,
        "queries": {q: 999.999 for q in bench.HEADLINE},
    }
    line = json.dumps(compact, separators=(",", ":"))
    assert len(line) < 1900, len(line)
