"""PySpark worker daemon with warm imports.

Use via ``spark.python.daemon.module=lucene_solr_spark.warm_daemon``.

The stock daemon imports only pyspark; every forked worker then pays
the pandas/pyarrow/numpy import (~1-2 s CPU) on its first Arrow UDF.
When the worker pool churns (idle timeouts, one-off stages, pool
rebuilds between jobs), that cold import repeats per fork and — at
high core counts — the fork+import storm serializes in the kernel
(measured: sys-time-dominated stalls with idle CPUs). Importing the
heavy modules HERE, before the daemon starts forking, lets every
worker inherit them copy-on-write: a fork costs pages, not imports.
"""

import os

import numpy  # noqa: F401
import pandas  # noqa: F401
import pyarrow  # noqa: F401

if os.environ.get("LSS_THP_DISABLE", "1") == "1":
    # Default-ON opt-out of transparent hugepages for this process
    # tree (PR_SET_THP_DISABLE, inherited across fork; set
    # LSS_THP_DISABLE=0 to keep THP). Rationale: Python workers
    # allocate multi-MB SHORT-LIVED numpy/Arrow temporaries per task —
    # they never amortize a hugepage's TLB win, but every fresh large
    # mmap can stall on khugepaged compaction (this host: ~0.75 s
    # intermittent stalls under madvise+defer policy, see util/env.py;
    # adjacent A/B at 400k docs x 32 workers: +14% build throughput
    # with THP off). Per-process flag only — no system state touched.
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        PR_SET_THP_DISABLE = 41
        libc.prctl(PR_SET_THP_DISABLE, 1, 0, 0, 0)
    except Exception:  # pragma: no cover - non-linux/glibc
        pass

try:  # the engine's own worker-side imports, if resolvable
    from lucene_solr_spark.index import codec  # noqa: F401
    from lucene_solr_spark.util import smallfloat  # noqa: F401
except Exception:  # pragma: no cover - py-files layout may differ
    pass

from pyspark.daemon import manager

if __name__ == "__main__":
    manager()
