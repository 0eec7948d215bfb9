"""Build/serve phase attribution for the bench (round 9, VERDICT r8 next
#4): the incremental/index queries construct their full persisted
store/index per invocation BY DESIGN (the oracle checks the composed
artifact), which made them the bench's standing worst-5 with a disclaimer
re-explained every round. The stores expose the boundary — init/fold is
BUILD, probe/report is SERVE — so the queries mark their build section
with `with build_phase():` and bench.py splits each sample's wall time
into {build_sec, serve_sec} in BENCH_DETAIL.json.

Zero overhead outside the bench: `active` is None unless bench.py sets it,
and the context manager then only reads the clock twice. Never affects
results — timing only.
"""

from __future__ import annotations

import time
from contextlib import contextmanager

# bench.py points this at a per-sample dict; queries accumulate into it
active: dict | None = None


@contextmanager
def build_phase():
    """Mark the store/index CONSTRUCTION section of a query (init, folds,
    appends). Everything outside is the serving path."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        global active
        if active is not None:
            active["build_sec"] = (
                active.get("build_sec", 0.0) + time.perf_counter() - t0
            )
