"""Source-stamped scratch caching for driver-checkable fixtures.

Several checks materialize a derived dataset under /tmp scratch once per
sf_dir (format round trips, partitioned layouts, planted streaming
sources). A bare done-marker goes stale when the source fixture is
REGENERATED in place (observed mid-round: events.ts changed parquet type
and every cached copy silently diverged from the oracle tables). The fix:
the marker records the source file's size+mtime; a mismatch invalidates
and rebuilds.
"""

from __future__ import annotations

import os

__all__ = ["source_stamp", "marker_current", "write_marker"]


def source_stamp(*source_files: str) -> str:
    # st_mtime_ns: a regeneration within the same wall-clock second (same
    # byte size) must still produce a distinct stamp — whole-second mtime
    # truncation was exactly the landmine this module exists to guard.
    parts = []
    for p in source_files:
        st = os.stat(p)
        parts.append(f"{os.path.basename(p)}:{st.st_size}:{st.st_mtime_ns}")
    return "|".join(parts)


def marker_current(marker_path: str, stamp: str) -> bool:
    if not os.path.exists(marker_path):
        return False
    with open(marker_path) as f:
        return f.read().strip() == stamp


def write_marker(marker_path: str, stamp: str) -> None:
    with open(marker_path, "w") as f:
        f.write(stamp)
