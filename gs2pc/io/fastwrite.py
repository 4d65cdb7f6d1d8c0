"""Direct-IO file writer for large sequential outputs.

On the VM-style hosts TPU slices live on, buffered page-cache writes are
dirty-throttled to a fraction of the device's real speed (measured here:
~50 MB/s buffered vs ~800 MB/s with O_DIRECT for the same 270 MB PLY
payload).  ``open_fast_writer`` returns an O_DIRECT writer with an
aligned staging buffer when the OS/filesystem supports it, and a plain
buffered file otherwise — output bytes are identical either way.

Used by the PLY writers (gs2pc/io/ply.py), whose disk time was the
largest serial slice of the conversion's output phase (reference role:
save_xyz_to_ply, gauss_dataloader.py:118-202).
"""

from __future__ import annotations

import mmap
import os


class _DirectWriter:
    """Sequential writer over an O_DIRECT fd.

    Data is staged in a page-aligned mmap buffer and flushed in
    buffer-sized aligned writes; the final sub-block tail is written
    after clearing O_DIRECT (a plain write at an aligned offset), so any
    byte length round-trips exactly.
    """

    _ALIGN = 4096
    _BUF = 8 << 20  # 8 MB staging: large enough to amortise syscalls

    def __init__(self, path: str):
        # May raise OSError (fs without O_DIRECT) or AttributeError
        # (platforms without the flag) — the factory falls back.
        self._fd = os.open(
            path, os.O_WRONLY | os.O_CREAT | os.O_TRUNC | os.O_DIRECT, 0o644
        )
        try:
            self._staging = mmap.mmap(-1, self._BUF)
        except Exception:
            os.close(self._fd)
            raise
        self._view = memoryview(self._staging)
        self._fill = 0
        self._closed = False

    def _write_all(self, view) -> None:
        """os.write until every byte lands; short writes (disk full,
        interrupt mid-block) would otherwise silently corrupt the PLY."""
        off = 0
        n = len(view)
        while off < n:
            wrote = os.write(self._fd, view[off:])
            if wrote <= 0:
                raise OSError(f"short write: {off}/{n} bytes")
            off += wrote

    def write(self, data) -> int:
        data = memoryview(data).cast("B")
        n = len(data)
        off = 0
        while off < n:
            take = min(n - off, self._BUF - self._fill)
            self._view[self._fill:self._fill + take] = data[off:off + take]
            self._fill += take
            off += take
            if self._fill == self._BUF:
                self._write_all(self._view)
                self._fill = 0
        return n

    def close(self) -> None:
        if self._closed:
            return
        self._closed = True
        try:
            aligned = self._fill - (self._fill % self._ALIGN)
            if aligned:
                self._write_all(self._view[:aligned])
            rem = self._fill - aligned
            if rem:
                import fcntl

                fl = fcntl.fcntl(self._fd, fcntl.F_GETFL)
                fcntl.fcntl(self._fd, fcntl.F_SETFL, fl & ~os.O_DIRECT)
                self._write_all(self._view[aligned:self._fill])
        finally:
            self._view.release()
            self._staging.close()
            os.close(self._fd)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def open_fast_writer(path: str):
    """O_DIRECT writer when available, buffered file otherwise."""
    if not hasattr(os, "O_DIRECT"):
        return open(path, "wb")
    try:
        return _DirectWriter(path)
    except OSError:
        return open(path, "wb")
