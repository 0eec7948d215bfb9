"""Overlap independent Spark actions from driver threads (optimization
guide §2.6).

The lifecycle queries (GDPR forget/readmit audits, curation funnels) and
the store folds issue many driver actions whose jobs are mutually
independent — different stores, different output directories. Run
sequentially, each job's straggler tail leaves most of local[32] (or a
cluster) idle while the next independent job waits on the driver. Spark's
scheduler happily runs several jobs at once inside one application; the
actions are only sequential because the driver calls them sequentially.
Submitting independent actions from a small thread pool lets the next
job's tasks back-fill executors freed by the current job's tail — the
guide's §2.6 pattern, FIFO scheduling giving exactly the back-fill
behaviour wanted.

Correctness: every thunk here operates on its OWN store directory (or
reads immutable inputs), so there is no cross-thread mutable state; Spark
job submission is thread-safe; exceptions propagate to the caller via
Future.result() — a failed leg fails the query exactly as the sequential
form did. Job-description labels are per-thread (thread-local JVM
properties), so per-phase attribution in the UI survives.
"""

from __future__ import annotations

from collections.abc import Callable
from concurrent.futures import ThreadPoolExecutor


def run_parallel(*thunks: Callable[[], object], max_workers: int | None = None):
    """Run the thunks concurrently; return their results in order.

    Any exception re-raises in the caller (first by submission order) —
    identical failure semantics to running the thunks sequentially,
    except later thunks may have started. The stores' folds are
    crash-replayable by design (append-first + ledger), so a failed
    parallel leg leaves the same replayable state a failed sequential
    leg would.
    """
    if len(thunks) == 1:
        return [thunks[0]()]
    with ThreadPoolExecutor(
        max_workers=max_workers or min(len(thunks), 8)
    ) as pool:
        futures = [pool.submit(t) for t in thunks]
        # gather in submission order; .result() re-raises the leg's error
        return [f.result() for f in futures]
