"""Scalar / batch functions: text normalization, HTML extraction, sketches."""

_arrow_limited = False


def limit_arrow_threads(n: int = 1) -> None:
    """Cap pyarrow's global thread pools inside a worker process.

    PyArrow sizes its compute/IO pools from hardware_concurrency, ignoring
    Ray's per-task ``num_cpus`` — so every worker would silently fan
    kernels across the whole node, oversubscribing it and corrupting any
    scaling measurement (an "8-CPU" run borrows all 32 cores). Hot-path
    UDFs call this once per process.
    """
    global _arrow_limited
    if not _arrow_limited:
        import pyarrow as pa

        pa.set_cpu_count(n)
        pa.set_io_thread_count(max(1, n))
        _arrow_limited = True
