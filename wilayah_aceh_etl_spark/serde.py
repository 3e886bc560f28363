"""Executor-side serialization helper.

Python workers don't inherit the driver's sys.path, so any module
whose functions are captured inside a UDF closure must be pickled BY
VALUE (cloudpickle ships the code with the task) rather than by
reference (worker would try to import the package and fail when the
repo isn't on its PYTHONPATH — e.g. the verify driver launching from
another cwd). Call this once at the bottom of every module that
defines UDF-visible functions.
"""

from __future__ import annotations

import sys


def pickle_module_by_value(module_name: str) -> None:
    try:
        from pyspark import cloudpickle

        cloudpickle.register_pickle_by_value(sys.modules[module_name])
    except Exception:
        # best-effort: falls back to by-reference pickling (works
        # whenever the package IS importable on workers)
        pass
