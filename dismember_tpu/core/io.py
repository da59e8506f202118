"""Path abstraction for local and remote storage.

The reference routes all file IO through the Hadoop FileSystem API so every
path may be ``hdfs://`` (scalann utils/File.scala:12-57).  The TPU-native
equivalent is GCS (plus any fsspec-registered scheme): pass ``gs://...`` or
another URL anywhere a path is accepted and it resolves through fsspec when
installed; plain paths use the local filesystem with no extra dependency.
"""

from __future__ import annotations

import os
from typing import IO


def is_remote(path: str) -> bool:
    return "://" in path and not path.startswith("file://")


def open_file(path: str, mode: str = "rb") -> IO:
    """Open a local or remote path (fsspec for URL schemes)."""
    if is_remote(path):
        try:
            import fsspec
        except ImportError as e:  # pragma: no cover - env without fsspec
            raise ImportError(
                f"remote path {path!r} requires fsspec (install gcsfs for gs://)"
            ) from e
        return fsspec.open(path, mode).open()
    if "w" in mode or "a" in mode:
        parent = os.path.dirname(os.path.abspath(path))
        if parent:
            os.makedirs(parent, exist_ok=True)
    return open(path, mode)


def read_bytes(path: str) -> bytes:
    with open_file(path, "rb") as f:
        return f.read()


def write_bytes(path: str, data: bytes) -> None:
    with open_file(path, "wb") as f:
        f.write(data)


def exists(path: str) -> bool:
    if is_remote(path):
        try:
            import fsspec

            fs, p = fsspec.core.url_to_fs(path)
            return fs.exists(p)
        except ImportError:
            return False
    return os.path.exists(path)
