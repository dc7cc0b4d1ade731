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


_malloc_retained = False


def retain_malloc() -> None:
    """Runtime (ctypes mallopt) version of ALLOCATOR_ENV, scoped to the
    calling worker process; idempotent.

    This host intermittently stalls ~0.75 s on FRESH large mmaps (THP
    madvise policy + khugepaged compaction; measured: 2/30 fresh 6 MB
    numpy allocations stall, zero major faults). Large-array UDFs that
    allocate per task (the batched-search collector) call this once so
    glibc serves big allocations from the retained brk arena instead
    of a fresh mmap per temporary. Deliberately NOT enabled for the
    index-build workers: retention across repeated builds was the
    round-1 monotonic-degradation cause (see module docstring)."""
    global _malloc_retained
    if _malloc_retained:
        return
    _malloc_retained = True
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        M_TRIM_THRESHOLD, M_MMAP_THRESHOLD = -1, -3
        libc.mallopt(M_TRIM_THRESHOLD, ctypes.c_int(1 << 30))
        libc.mallopt(M_MMAP_THRESHOLD, ctypes.c_int(1 << 30))
    except Exception:  # pragma: no cover - non-glibc platforms
        pass
    try:
        # route Arrow batch buffers through the SAME retained glibc
        # arena — pyarrow's default jemalloc pool mmaps fresh regions
        # per batch and pays the identical stall
        import pyarrow as pa

        pa.set_memory_pool(pa.system_memory_pool())
    except Exception:  # pragma: no cover
        pass
