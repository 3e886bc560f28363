"""Process-scoped scratch directories for queries that materialize
intermediate PHYSICAL state (the centroid-partitioned IVF layout,
streaming admission sources/checkpoints, CSV malformed-mode
fixtures).

Why not a per-query ``finally: shutil.rmtree``: these query functions
return LAZY DataFrames — the driver/parity harness materializes them
after the function has returned, so the backing files must outlive
the function call. The only safe teardown point a library can own is
interpreter exit, after the SparkSession's last job. Every scratch
dir therefore lives under ONE per-process root registered with
``atexit`` (r5 advice: gate/bench/parity runs were leaking a parquet
tree + checkpoint per run into /tmp via bare ``tempfile.gettempdir()``
paths that nothing ever removed).

Crash leftovers: a SIGKILLed process skips atexit, but because every
root carries the ``wilayah_scratch_`` prefix, stale roots are
identifiable and any later run could sweep them; we deliberately do
NOT auto-sweep other processes' roots here — a concurrently running
gate and bench must not delete each other's live scratch.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
import uuid

_ROOT: str | None = None


def scratch_dir(prefix: str, create: bool = True) -> str:
    """Allocate a unique directory under the process's scratch root
    (created on first use, removed wholesale at interpreter exit).

    ``create=False`` returns the path without making the directory —
    for consumers like ``DataFrame.write`` and streaming checkpoints
    that insist on creating their own target.
    """
    global _ROOT
    if _ROOT is None:
        _ROOT = tempfile.mkdtemp(prefix="wilayah_scratch_")
        atexit.register(shutil.rmtree, _ROOT, ignore_errors=True)
    d = os.path.join(_ROOT, f"{prefix}_{uuid.uuid4().hex[:8]}")
    if create:
        os.makedirs(d)
    return d
