"""Per-process BLAS thread limiter for executor-side numpy kernels.

Each Spark task slot runs its own Python worker, and numpy's bundled
OpenBLAS defaults to one thread PER CORE per process — on a 32-slot
executor that is up to 32×32 BLAS threads fighting for 32 cores.
Measured on the c=10⁴ IVF assignment pass (1.28 M rows × 10⁴ centroids,
local[32]): **184 s with default BLAS threading vs 89 s with one BLAS
thread per worker** (2.1×), and even a SINGLE process runs these
skinny (batch×64 @ 64×c) matmuls faster single-threaded (3.5 s → 2.2 s
— the fork/join overhead exceeds the work per stripe).

``limit_blas_threads()`` is called at the top of every Arrow kernel
body, so it runs once per WORKER process and never touches the driver
— driver-side training math (ivf_build_centroids' Lloyd/mini-batch
passes) keeps multithreaded BLAS, where it helps. Runtime control uses
OpenBLAS's own ``openblas_set_num_threads`` via ctypes on whatever
BLAS numpy actually loaded (found through /proc/self/maps — the env
vars would have to be set before the worker imports numpy, which the
harness can't guarantee). Best-effort: non-Linux or a non-OpenBLAS
build silently keeps its defaults.

Deployment override: ``SPARK_GRAFT_BLAS_THREADS`` (0 = leave BLAS
alone; N = limit to N). The default 1 is the standard prescription for
task-parallel numpy under Spark: parallelism comes from task slots,
not from nested BLAS threading.
"""

from __future__ import annotations

import os

_applied = False


def limit_blas_threads(n: int | None = None) -> None:
    global _applied
    if _applied:
        return
    _applied = True
    if n is None:
        try:
            n = int(os.environ.get("SPARK_GRAFT_BLAS_THREADS", "1"))
        except ValueError:
            n = 1
    if n <= 0:
        return  # explicit opt-out: leave BLAS threading alone
    try:
        import ctypes

        with open("/proc/self/maps") as f:
            libs = sorted(
                {
                    line.split()[-1]
                    for line in f
                    if "openblas" in line.lower() and line.split()[-1].startswith("/")
                }
            )
        for path in libs:
            try:
                lib = ctypes.CDLL(path)
            except OSError:
                continue
            for sym in ("openblas_set_num_threads64_", "openblas_set_num_threads"):
                fn = getattr(lib, sym, None)
                if fn is not None:
                    fn(n)
                    break
    except Exception:  # noqa: BLE001 — best-effort on exotic platforms
        pass


_arena_applied = False


def retain_malloc_arena(
    mmap_threshold: int = 1 << 29, trim_threshold: int = 1 << 29
) -> None:
    """Keep an Arrow kernel's large transient buffers in the worker's
    malloc arena across tasks. glibc serves allocations over ~32 MB
    with a private mmap and munmaps them on free, so a REUSED python
    worker re-faults its whole working set on every task — and on
    hypervisor-backed hosts that demand-fault newly-mapped pages
    slowly (measured ~100 MB/s first-touch on this sandbox vs arena
    reuse at memory speed, a reproducible ~10× first-pass tax on the
    pigeonhole kernel) the allocation pattern, not the arithmetic,
    dominates the task. Raising M_MMAP_THRESHOLD keeps big buffers in
    the sbrk heap and M_TRIM_THRESHOLD stops free() returning them,
    so the pages stay mapped for the worker's next task. The retained
    arena is bounded by the kernel's own peak working set (every
    kernel here documents one); per-worker, not cumulative.

    Called once per worker process alongside ``limit_blas_threads`` at
    the top of each Arrow kernel body; never on the driver. Deployment
    override: ``SPARK_GRAFT_MALLOC_RETAIN=0`` leaves malloc alone.
    Best-effort: non-glibc platforms silently keep their defaults.
    """
    global _arena_applied
    if _arena_applied:
        return
    _arena_applied = True
    if os.environ.get("SPARK_GRAFT_MALLOC_RETAIN", "1") == "0":
        return
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6")
        libc.mallopt(-3, int(mmap_threshold))  # M_MMAP_THRESHOLD
        libc.mallopt(-1, int(trim_threshold))  # M_TRIM_THRESHOLD
    except Exception:  # noqa: BLE001 — best-effort on exotic platforms
        pass
