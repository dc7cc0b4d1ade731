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

import numpy  # noqa: F401
import pandas  # noqa: F401
import pyarrow  # noqa: F401

try:  # the engine's own worker-side imports, if resolvable
    from lucene_solr_spark.index import codec  # noqa: F401
    from lucene_solr_spark.util import smallfloat  # noqa: F401
except Exception:  # pragma: no cover - py-files layout may differ
    pass

from pyspark.daemon import manager

if __name__ == "__main__":
    manager()
