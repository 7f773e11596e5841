"""Shared path utilities for the bulk (in-process) I/O operators.

Two concerns every bulk operator shares:

* **Content addressing.** Shard files and chunk ids are named from
  their input path so a retried/resumed task deterministically
  overwrites its own output. The address must be collision-resistant
  at the design scale (100k+ input files): a 32-bit hash reaches ~50%
  birthday-collision probability at ~77k names, and a collision means
  one task's atomic rename silently replaces a *different* file's
  shard. ``path_tag`` therefore uses the first 64 bits of
  SHA-256 — collision probability ~2.7e-10 at 1M names, and unlike a
  seeded fast hash it is stable across Python versions/processes.

* **URI normalization.** Spark's ``inputFiles()`` returns Hadoop-style
  ``file:`` URIs in either the ``file:///abs`` or ``file:/abs`` form
  depending on the code path; pyarrow/os want plain paths.
  ``local_path`` handles both forms (a single 7-char strip would
  mangle ``file:/abs`` into garbage).
"""

from __future__ import annotations

import hashlib

__all__ = ["path_tag", "local_path"]


def path_tag(name: str) -> str:
    """64-bit hex content address for a path or name-list string."""
    return hashlib.sha256(name.encode()).hexdigest()[:16]


def local_path(p: str) -> str:
    """Strip a ``file:``-scheme prefix, tolerating both URI forms."""
    if p.startswith("file://"):
        return p[7:]
    if p.startswith("file:"):
        return p[5:]
    return p
