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
