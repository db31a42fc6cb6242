"""Per-process scratch root — run-ID-keyed staging isolation.

Every staging/checkpoint path in the engine (staged expectations,
stream sources, roundtrip twins, bucketed tables, reference-data
extraction) lives under ONE run-scoped directory,
``.scratch/run-<pid>-<token>``. Two concurrent sessions (a pytest
suite racing a parity sweep, two suites side by side) therefore can
NEVER collide on staged bytes: the r8 closing record attributed two
6-failure pytest runs and one non-reproducible q_stream_session parity
blip to exactly this race class on the previously-shared tree
(VERDICT r8 item 1).

Cost model: isolation trades cross-PROCESS staging reuse for safety.
Within a process nothing changes — the manifest/_SUCCESS gates still
dedupe staged writes across queries and bench repeats; only a fresh
process re-stages, which it already had to do whenever the source
manifest moved. Staged artifacts are orders of magnitude smaller than
the inputs by design, so the re-stage cost is bounded.

Lifecycle: the run directory is removed at interpreter exit (atexit);
directories orphaned by crashed runs are pruned at import once they
age past ``_STALE_S``. Intentionally-shared trees (the degenerate-sweep
catalogs under ``.scratch/degcat``, the 10x sweep's ``sfsweep``) stay
OUTSIDE the run root: they are single-writer tool artifacts, not
session staging, and live in top-level dirs the pruner never touches
(it only considers ``run-*`` entries).
"""

from __future__ import annotations

import atexit
import os
import shutil
import time
import uuid

#: The shared base every run root nests under (gitignored).
SCRATCH_BASE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch"
)

#: This process's run token: pid for liveness-debuggability, a random
#: suffix so a recycled pid can never collide with a leftover dir.
RUN_ID = f"run-{os.getpid()}-{uuid.uuid4().hex[:6]}"

#: The run-scoped scratch root all engine staging keys under.
SCRATCH = os.path.join(SCRATCH_BASE, RUN_ID)

#: Orphaned run dirs older than this are pruned at import. Generously
#: above any real session length so a live concurrent run is never hit.
_STALE_S = 24 * 3600


def _cleanup() -> None:
    shutil.rmtree(SCRATCH, ignore_errors=True)


atexit.register(_cleanup)


def _prune_stale() -> None:
    try:
        entries = os.listdir(SCRATCH_BASE)
    except OSError:
        return
    now = time.time()
    for n in entries:
        if not n.startswith("run-"):
            continue
        p = os.path.join(SCRATCH_BASE, n)
        try:
            if now - os.path.getmtime(p) > _STALE_S:
                shutil.rmtree(p, ignore_errors=True)
        except OSError:
            continue


_prune_stale()
