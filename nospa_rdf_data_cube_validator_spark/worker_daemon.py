"""Pre-importing Python worker daemon (``spark.python.daemon.module``).

Identical in behavior to ``pyspark.daemon`` — it IS ``pyspark.daemon``'s
``manager()`` — except that the heavy data-plane libraries are imported
ONCE in the daemon process before any worker forks. Forked workers then
inherit the loaded modules via copy-on-write, so the first task of every
worker skips the ~1-2 s pandas/numpy/pyarrow import that otherwise
serializes behind the Arrow batch handshake (guide §4.5 applied at the
process level: initialise heavyweight state once, here once per MACHINE
rather than once per worker). Measured: the first 32-partition
mapInPandas stage of a fresh session drops from ~2 s of per-task wait to
the actual kernel cost.

The daemon only runs on executors (this engine targets local[] and
uniform clusters where the package is on PYTHONPATH everywhere); if the
imports fail the daemon still starts — workers then import lazily as
before.
"""

try:  # best-effort: a worker can always import these lazily instead
    import numpy  # noqa: F401
    import pandas  # noqa: F401
    import pyarrow  # noqa: F401
    import pyarrow.pandas_compat  # noqa: F401  (arrow<->pandas bridge)
    from pyspark.sql.pandas import serializers  # noqa: F401
    from pyspark.sql.pandas import types  # noqa: F401
except Exception:  # noqa: BLE001
    pass

from pyspark.daemon import manager

if __name__ == "__main__":
    manager()
