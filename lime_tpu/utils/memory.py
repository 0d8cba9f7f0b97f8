"""Memory accounting: host RSS + device HBM stats.

Replacement for the reference's malloc_count interposition
(external/malloc_count/, linked into OMP=0 builds for the papers' memory
measurements): report current/peak host resident set and per-device HBM
in-use/peak, without link-time tricks.
"""

from __future__ import annotations

import resource
from typing import Dict


def host_memory_stats() -> Dict[str, int]:
    """Current and peak host RSS in bytes."""
    peak_kb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    current = 0
    try:
        with open("/proc/self/statm") as f:
            current = int(f.read().split()[1]) * resource.getpagesize()
    except OSError:
        pass
    return {"rss_bytes": current, "peak_rss_bytes": peak_kb * 1024}


def memory_report() -> str:
    """Human-readable one-shot memory report (host + devices)."""
    from .timing import device_memory_stats

    h = host_memory_stats()
    lines = [f"host rss={h['rss_bytes'] / 1e9:.2f}GB "
             f"peak={h['peak_rss_bytes'] / 1e9:.2f}GB"]
    for dev, s in device_memory_stats().items():
        lines.append(f"{dev} hbm={s['bytes_in_use'] / 1e9:.2f}GB "
                     f"peak={s['peak_bytes_in_use'] / 1e9:.2f}GB")
    return "\n".join(lines)
