"""Process RSS measurement (reference: get_current_rss_kb,
hnsw_service/main.cpp:10-16, parsed from /proc/self/statm)."""

import os


def current_rss_kb() -> int:
    try:
        with open("/proc/self/statm") as f:
            parts = f.read().split()
        rss_pages = int(parts[1])
        return rss_pages * os.sysconf("SC_PAGE_SIZE") // 1024
    except (OSError, IndexError, ValueError):
        return 0


def apply_mem_cap(mem_cap_mb: int) -> bool:
    """RLIMIT_AS self-cap — reference parity with hnsw_service/main.cpp:19-22
    (the native frontends already do this, query_main.cpp:406-410): with a
    hard address-space ceiling, the service's memory claims are falsifiable —
    exceeding the cap kills the process instead of silently paging. Returns
    True when the cap was applied; <= 0 disables (the default for the TPU
    engine, whose runtime maps large device buffers into the address
    space)."""
    if mem_cap_mb <= 0:
        return False
    try:
        import resource

        cap = mem_cap_mb << 20
        resource.setrlimit(resource.RLIMIT_AS, (cap, cap))
        return True
    except (ImportError, ValueError, OSError):
        return False


def release_host_memory() -> None:
    """gc + glibc malloc_trim: freed Python/NumPy buffers otherwise stay in
    the allocator's arena and keep RSS at its transient peak — which made
    the optimized (storage-separated) query service *look* heavier than the
    baseline despite holding less. The reference's RSS methodology
    (bin/experiment.py:237-290) measures exactly this."""
    import ctypes
    import gc

    gc.collect()
    try:
        ctypes.CDLL("libc.so.6").malloc_trim(0)
    except Exception:
        pass
