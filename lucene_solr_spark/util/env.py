"""Process-environment tuning for the Arrow/numpy hot path.

On memory-overcommitted hosts (VMs with lazy page backing), a minor
page fault can cost hundreds of microseconds, and glibc's default
malloc returns every >128 KB allocation to the OS on free — so each
large numpy temporary in a long-lived Python worker faults fresh pages
forever. Keeping freed pages in the process arena makes every build
task after the first run on warm memory.

Call :func:`configure_allocator` BEFORE creating the SparkSession: in
local mode the JVM inherits the driver's environment and the
pyspark.daemon (hence every Python worker) inherits it from the JVM.
On a real cluster, ship the same variables via
``spark.executorEnv.MALLOC_*``.
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
