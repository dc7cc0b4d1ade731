"""Process-environment tuning for the Arrow/numpy hot path.

DEPRECATED DEFAULT (round-2 finding): retaining every freed page
(``MALLOC_TRIM_THRESHOLD_=-1``) interacts badly with THP — long-lived
workers accumulate huge dirty arenas that khugepaged keeps
collapsing/splitting, and repeated builds in one JVM degrade
monotonically (42 s → 155 s by build 3 at 8 cores). The effective fix
for worker-churn cost is the warm daemon
(``spark.python.daemon.module=lucene_solr_spark.warm_daemon``), which
makes forked workers inherit pandas/pyarrow/numpy copy-on-write; no
benchmark or test path calls :func:`configure_allocator` anymore. The
knobs remain for hosts where page-fault latency (not THP churn)
dominates — measure before enabling.
"""

from __future__ import annotations

import os

ALLOCATOR_ENV = {
    # never give pages back to the OS on free()
    "MALLOC_TRIM_THRESHOLD_": "-1",
    # serve large allocations from the retained arena, not fresh mmaps
    "MALLOC_MMAP_THRESHOLD_": str(1 << 30),
}


def configure_allocator() -> None:
    for k, v in ALLOCATOR_ENV.items():
        os.environ.setdefault(k, v)


def spark_executor_env_conf() -> dict[str, str]:
    """The same knobs as --conf entries for cluster deployments."""
    return {f"spark.executorEnv.{k}": v for k, v in ALLOCATOR_ENV.items()}
