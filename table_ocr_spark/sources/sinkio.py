"""Pluggable filesystem openers for the member-file sinks (WET/WAT/CDX).

The deterministic gzip-member sinks stream records through file
handles inside Arrow ``mapInPandas`` kernels. In this sandbox those
handles come from POSIX ``open()``; on an object-store cluster the
same kernels must write through HDFS/S3/GCS instead. This module is
the documented ``_open_sink`` swap point made real (reference
behavior: the interchange writers in SURVEY.md §2.7; the reference
itself only ever writes local JSON, ``ui/utils.py:187-350``).

Design:

- ``SinkOpener`` is the tiny contract the sinks consume: binary
  ``open_write`` / ``open_read``, ``makedirs``, ``exists``. Nothing
  else — record grammar, bucketing, sorting and gzip framing stay in
  the sinks and are opener-independent, which is what makes the
  byte-determinism contract portable.
- ``PosixOpener`` is the zero-dependency default (builtin ``open``).
- ``ArrowFSOpener`` adapts ANY ``pyarrow.fs.FileSystem`` —
  ``HadoopFileSystem``, ``S3FileSystem``, ``GcsFileSystem``,
  ``LocalFileSystem``, or the in-memory ``_MockFileSystem`` the tests
  route through. It takes a zero-arg FACTORY, not an instance: Arrow
  filesystems do not pickle, but a factory closure does, so the
  opener ships into executor kernels and each Python worker
  materializes its filesystem lazily exactly once.

Scale note: openers only change WHERE bytes land. The one-exchange
bucketing, per-file single-writer ownership and pinned-mtime gzip
members — the properties that make the sinks idempotent under
re-run — are unchanged, so a resumed job on S3 re-writes a file
byte-identically instead of versioning a near-duplicate.
"""

from __future__ import annotations

import os
from typing import Callable, Optional


class SinkOpener:
    """Contract consumed by the member-file sinks. Subclass and
    override all four methods; instances must be picklable (they ride
    into ``mapInPandas`` kernels)."""

    def open_write(self, path: str):  # -> binary file-like
        raise NotImplementedError

    def open_read(self, path: str):  # -> binary file-like
        raise NotImplementedError

    def makedirs(self, path: str) -> None:
        raise NotImplementedError

    def exists(self, path: str) -> bool:
        raise NotImplementedError


class PosixOpener(SinkOpener):
    """Builtin ``open()`` on a shared mount — the sandbox default."""

    def open_write(self, path: str):
        return open(path, "wb")

    def open_read(self, path: str):
        return open(path, "rb")

    def makedirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def exists(self, path: str) -> bool:
        return os.path.exists(path)


class ArrowFSOpener(SinkOpener):
    """Adapter over ``pyarrow.fs.FileSystem`` via a picklable factory.

    ``compression=None`` is passed explicitly on both stream
    directions: pyarrow's default ``"detect"`` would transparently
    re-gzip ``.gz`` paths, double-compressing the already-framed
    member records and breaking byte-determinism.

    Example (real cluster)::

        opener = ArrowFSOpener(lambda: pyarrow.fs.HadoopFileSystem(
            host="namenode", port=8020))
        write_wet(df, "/warehouse/wet", n_files=512, opener=opener)
    """

    def __init__(self, fs_factory: Callable[[], object]):
        self._fs_factory = fs_factory
        self._fs = None  # materialized per-process, never pickled

    def __getstate__(self):
        return {"_fs_factory": self._fs_factory}

    def __setstate__(self, state):
        self._fs_factory = state["_fs_factory"]
        self._fs = None

    @property
    def fs(self):
        if self._fs is None:
            self._fs = self._fs_factory()
        return self._fs

    def open_write(self, path: str):
        return self.fs.open_output_stream(path, compression=None)

    def open_read(self, path: str):
        return self.fs.open_input_stream(path, compression=None)

    def makedirs(self, path: str) -> None:
        self.fs.create_dir(path, recursive=True)

    def exists(self, path: str) -> bool:
        import pyarrow.fs as pafs

        return self.fs.get_file_info(path).type != pafs.FileType.NotFound


def resolve_opener(opener: Optional[SinkOpener]) -> SinkOpener:
    """``None`` → the POSIX default (keeps every existing call site
    and test byte-identical)."""
    return opener if opener is not None else PosixOpener()
