"""Byte-range data sources.

TPU-native replacement for the reference's transport layer (PostStream.hx:18-196):
the browser XHR byte-range POST protocol (``s=<start>&e=<end>`` headers,
PostStream.LoadPart, PostStream.hx:140-159) maps here to range reads against
local files or object storage.  Data is delivered in bounded chunks so the
demux layer exercises the same incremental/resumable paths a network stream
would (the reference's 250 ms progress-timer chunking, PostStream.hx:42-67).
"""

from __future__ import annotations

import io
import os
from typing import Iterator, Optional


class ByteSource:
    """Abstract random-access byte source with range streaming."""

    def size(self) -> int:
        raise NotImplementedError

    def read_range(self, start: int, end: Optional[int] = None) -> bytes:
        """Read [start, end] inclusive, like PostStream.LoadPart's s/e protocol
        (PostStream.hx:140-159). ``end=None`` reads to EOF."""
        raise NotImplementedError

    def stream_range(
        self, start: int, end: Optional[int] = None, chunk_size: int = 1 << 16
    ) -> Iterator[bytes]:
        """Yield the range in chunks (models XHR progress events,
        PostStream.hx:60-67)."""
        data = self.read_range(start, end)
        for i in range(0, len(data), chunk_size):
            yield data[i : i + chunk_size]


class FileSource(ByteSource):
    """Local-file source; the moral equivalent of GCS range reads."""

    def __init__(self, path: str | os.PathLike):
        self._path = os.fspath(path)
        self._size = os.path.getsize(self._path)

    def size(self) -> int:
        return self._size

    def read_range(self, start: int, end: Optional[int] = None) -> bytes:
        last = self._size - 1 if end is None else min(end, self._size - 1)
        if start > last:
            return b""
        with open(self._path, "rb") as f:
            f.seek(start)
            return f.read(last - start + 1)


class MemorySource(ByteSource):
    """In-memory source for tests and fixtures."""

    def __init__(self, data: bytes):
        self._data = bytes(data)

    def size(self) -> int:
        return len(self._data)

    def read_range(self, start: int, end: Optional[int] = None) -> bytes:
        last = len(self._data) - 1 if end is None else min(end, len(self._data) - 1)
        if start > last:
            return b""
        return self._data[start : last + 1]


def open_source(path_or_url: str) -> ByteSource:
    """Source factory. http(s) URLs would map to HTTP Range requests — gated
    off here (zero-egress environment); file paths map to FileSource."""
    if path_or_url.startswith(("http://", "https://")):
        raise NotImplementedError(
            "HTTP range source requires network egress; use a file path "
            "(GCS/HTTP mounting is the deployment-side equivalent of "
            "PostStream.LoadPart)"
        )
    return FileSource(path_or_url)
