"""Store filesystem abstraction — the interface the blockstore's commit
layer speaks, with NO rename/move anywhere in it.

Reference parity: fastparquet abstracts its filesystem behind
``open_with`` / ``mkdirs`` hooks (writer.py:1192-1197) so any fsspec
filesystem can host a dataset.  This module is the same seam for the
blockstore's maintenance protocol, designed one step further for object
stores: directory rename is not in the interface at all, because S3/GCS/
ABFS have no atomic (or even cheap) rename — the commit point is a
single-object ``put_atomic`` of a small pointer file, which every object
store gives you natively as PUT.

The engine's DATA files (parquet part files under ``blocks/``,
``lineage/``, ``manifests/``) are written by Spark through its own
pluggable Hadoop FileSystem/committer layer — that side is already
portable (S3A + magic committer, GCS connector, …).  This interface
covers everything the commit protocol does OUTSIDE a Spark job: listing,
the pointer-file commit, and file/directory deletes.

Implementations:
- ``LocalFS`` (default): POSIX; ``put_atomic`` is write-tmp + os.replace
  (atomic on one filesystem).
- ``FsspecFS``: adapter over any fsspec filesystem when the optional
  package is present (s3fs, gcsfs, adlfs); ``put_atomic`` maps to the
  store's native atomic PUT (``pipe_file``).
- Custom: subclass ``StoreFS`` and ``register_fs(prefix, fs)``.

All deletes are idempotent (missing path is success): crash-recovery GC
may retry any step.
"""

from __future__ import annotations

import os


def _strip_uri(path: str) -> str:
    """file:// URIs (Spark's input_file_name) -> local paths."""
    if path.startswith("file://"):
        return path[7:]
    return path


class StoreFS:
    """Commit-protocol filesystem interface.  See module docstring for the
    contract; note the deliberate absence of rename/move."""

    def ls(self, dirpath: str) -> list[str]:
        """Full paths of FILES directly under ``dirpath`` (no recursion,
        no directories).  Missing directory -> empty list."""
        raise NotImplementedError

    def ls_dirs(self, dirpath: str) -> list[str]:
        """Full paths of DIRECTORIES directly under ``dirpath``."""
        raise NotImplementedError

    def exists(self, path: str) -> bool:
        raise NotImplementedError

    def read_bytes(self, path: str) -> bytes:
        raise NotImplementedError

    def put_atomic(self, path: str, data: bytes) -> None:
        """All-or-nothing create/replace of one small object.  Readers
        never observe a partial write.  This is the ONLY primitive the
        commit point uses."""
        raise NotImplementedError

    def delete(self, path: str) -> None:
        """Delete one file; missing file is success."""
        raise NotImplementedError

    def delete_dir(self, path: str) -> None:
        """Recursively delete a directory; missing is success."""
        raise NotImplementedError


class LocalFS(StoreFS):
    """POSIX implementation (the test substrate).  put_atomic keeps the
    atomic-replace property via a same-directory temp file + os.replace —
    a single-FILE rename, which object-store adapters replace with a
    native PUT (the protocol never renames a directory anywhere)."""

    def ls(self, dirpath: str) -> list[str]:
        d = _strip_uri(dirpath)
        try:
            with os.scandir(d) as it:
                return [e.path for e in it if e.is_file()]
        except FileNotFoundError:
            return []

    def ls_dirs(self, dirpath: str) -> list[str]:
        d = _strip_uri(dirpath)
        try:
            with os.scandir(d) as it:
                return [e.path for e in it if e.is_dir()]
        except FileNotFoundError:
            return []

    def exists(self, path: str) -> bool:
        return os.path.exists(_strip_uri(path))

    def read_bytes(self, path: str) -> bytes:
        with open(_strip_uri(path), "rb") as f:
            return f.read()

    def put_atomic(self, path: str, data: bytes) -> None:
        p = _strip_uri(path)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        tmp = f"{p}.tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, p)

    def delete(self, path: str) -> None:
        try:
            os.remove(_strip_uri(path))
        except FileNotFoundError:
            pass

    def delete_dir(self, path: str) -> None:
        import shutil

        shutil.rmtree(_strip_uri(path), ignore_errors=True)


class FsspecFS(StoreFS):
    """Adapter over an fsspec filesystem instance (s3fs/gcsfs/adlfs/...).
    Import-gated: constructing it raises if fsspec is absent from the
    environment (it is absent from this container — the adapter is the
    production seam, LocalFS the tested one)."""

    def __init__(self, fs=None, protocol: str | None = None, **kw):
        if fs is None:
            import fsspec  # noqa: F401 — optional dependency

            fs = fsspec.filesystem(protocol or "file", **kw)
        self._fs = fs

    def ls(self, dirpath: str) -> list[str]:
        try:
            infos = self._fs.ls(dirpath, detail=True)
        except FileNotFoundError:
            return []
        return [i["name"] for i in infos if i.get("type") == "file"]

    def ls_dirs(self, dirpath: str) -> list[str]:
        try:
            infos = self._fs.ls(dirpath, detail=True)
        except FileNotFoundError:
            return []
        return [i["name"] for i in infos if i.get("type") == "directory"]

    def exists(self, path: str) -> bool:
        return self._fs.exists(path)

    def read_bytes(self, path: str) -> bytes:
        return self._fs.cat_file(path)

    def put_atomic(self, path: str, data: bytes) -> None:
        # object-store PUT is atomic per object; pipe_file is one PUT
        self._fs.pipe_file(path, data)

    def delete(self, path: str) -> None:
        try:
            self._fs.rm_file(path)
        except FileNotFoundError:
            pass

    def delete_dir(self, path: str) -> None:
        try:
            self._fs.rm(path, recursive=True)
        except FileNotFoundError:
            pass


_LOCAL = LocalFS()
_REGISTRY: list[tuple[str, StoreFS]] = []


def register_fs(prefix: str, fs: StoreFS) -> None:
    """Route store paths under ``prefix`` to ``fs`` (longest prefix wins).
    Re-registering a prefix replaces the previous mapping."""
    _REGISTRY[:] = [(p, f) for p, f in _REGISTRY if p != prefix]
    _REGISTRY.append((prefix, fs))
    _REGISTRY.sort(key=lambda t: -len(t[0]))


def unregister_fs(prefix: str) -> None:
    _REGISTRY[:] = [(p, f) for p, f in _REGISTRY if p != prefix]


def get_fs(path: str) -> StoreFS:
    p = _strip_uri(path)
    for prefix, fs in _REGISTRY:
        if p.startswith(prefix):
            return fs
    return _LOCAL
