"""Storage abstraction for the lakehouse *metadata* protocol.

The snapshot log's whole correctness story rests on three storage
primitives (snapshot.py's module doc promises they map to an object
store; this module is that seam):

* ``write_text_if_absent`` — create-if-not-exists. POSIX: ``open(...,
  O_EXCL)``. Object store: conditional PUT (``If-None-Match: *``) or a
  catalog CAS. This is the commit CAS — two racing committers cannot
  both win a version file.
* ``write_text`` — atomic overwrite-publish. POSIX: temp + ``os.replace``.
  Object store: a plain PUT (single-key PUTs are atomic). Used only for
  the advisory version hint, which readers treat as a cache over the
  authoritative version-file listing.
* ``list`` — recursive listing under a prefix. POSIX: ``os.walk``.
  Object store: LIST with prefix. Used by hint recovery, ``vacuum`` and
  ``expire_snapshots``.

Data files are written by Spark itself (``df.write.parquet``) against
whatever filesystem the session's Hadoop conf resolves for the table
root — that path is already storage-agnostic on a real cluster (s3a://,
hdfs://, ...). The seam here covers everything the *driver* does with
small metadata objects: snapshot documents, the version hint, manifest
files, lineage spills, and maintenance listings/deletes.

The reference is S3-native (``panorama_datalake.py:215-258`` boto3 PUT
loops; ``:169-213`` Athena partition registration); ``InMemoryFileIO``
is the sandbox's stand-in for that store — a dict of blobs with
conditional-PUT semantics — so the commit/CAS/vacuum protocol is tested
against object-store semantics without a live bucket.
"""

from __future__ import annotations

import os
import threading


class FileIO:
    """Interface; see LocalFileIO for the contract each method keeps."""

    def read_text(self, path: str) -> str:
        raise NotImplementedError

    def read_bytes(self, path: str) -> bytes:
        raise NotImplementedError

    def write_text_if_absent(self, path: str, text: str) -> None:
        """Create-if-not-exists; raises FileExistsError if present (CAS)."""
        raise NotImplementedError

    def write_text(self, path: str, text: str) -> None:
        """Atomic overwrite-publish (readers see old or new, never torn)."""
        raise NotImplementedError

    def write_bytes(self, path: str, data: bytes) -> None:
        """Plain immutable-object write (callers use unique names)."""
        raise NotImplementedError

    def list(self, prefix: str) -> list[str]:
        """All file/object paths under ``prefix`` (recursive); empty list
        if the prefix does not exist."""
        raise NotImplementedError

    def list_dir(self, prefix: str) -> list[str]:
        """Immediate child *names* under ``prefix`` (one path segment —
        a directory listing for POSIX, distinct first components of the
        key space for an object store)."""
        raise NotImplementedError

    def exists(self, path: str) -> bool:
        raise NotImplementedError

    def delete(self, path: str) -> None:
        raise NotImplementedError

    def delete_prefix(self, prefix: str) -> None:
        """Remove everything under ``prefix`` (DROP TABLE)."""
        raise NotImplementedError


class LocalFileIO(FileIO):
    """POSIX implementation — byte-identical to the pre-seam behavior:
    O_EXCL for the commit CAS, fsync before publish, temp+rename for the
    hint."""

    def read_text(self, path: str) -> str:
        with open(path) as fh:
            return fh.read()

    def read_bytes(self, path: str) -> bytes:
        with open(path, "rb") as fh:
            return fh.read()

    def write_text_if_absent(self, path: str, text: str) -> None:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        fd = os.open(path, os.O_WRONLY | os.O_CREAT | os.O_EXCL)  # raises FileExistsError
        with os.fdopen(fd, "w") as fh:
            fh.write(text)
            fh.flush()
            os.fsync(fh.fileno())

    def write_text(self, path: str, text: str) -> None:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + f".tmp.{os.getpid()}"
        with open(tmp, "w") as fh:
            fh.write(text)
        os.replace(tmp, path)

    def write_bytes(self, path: str, data: bytes) -> None:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "wb") as fh:
            fh.write(data)

    def list(self, prefix: str) -> list[str]:
        out: list[str] = []
        for dirpath, _dirs, files in os.walk(prefix):
            out.extend(os.path.join(dirpath, n) for n in files)
        return out

    def list_dir(self, prefix: str) -> list[str]:
        return sorted(os.listdir(prefix)) if os.path.isdir(prefix) else []

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def delete(self, path: str) -> None:
        os.remove(path)

    def delete_prefix(self, prefix: str) -> None:
        import shutil

        shutil.rmtree(prefix, ignore_errors=True)


class InMemoryFileIO(FileIO):
    """Fake object store: flat blob map keyed by path, with
    conditional-PUT create semantics. ``write_text_if_absent`` is the
    S3 ``If-None-Match: *`` PUT / catalog CAS; ``list`` is a prefix
    LIST. Thread-safe so commit-race tests can drive it concurrently.
    """

    def __init__(self) -> None:
        self._blobs: dict[str, bytes] = {}
        self._lock = threading.Lock()

    def read_text(self, path: str) -> str:
        return self.read_bytes(path).decode()

    def read_bytes(self, path: str) -> bytes:
        with self._lock:
            if path not in self._blobs:
                raise FileNotFoundError(path)
            return self._blobs[path]

    def write_text_if_absent(self, path: str, text: str) -> None:
        with self._lock:
            if path in self._blobs:
                raise FileExistsError(path)
            self._blobs[path] = text.encode()

    def write_text(self, path: str, text: str) -> None:
        with self._lock:
            self._blobs[path] = text.encode()

    def write_bytes(self, path: str, data: bytes) -> None:
        with self._lock:
            self._blobs[path] = data

    def list(self, prefix: str) -> list[str]:
        p = prefix.rstrip("/") + "/"
        with self._lock:
            return sorted(k for k in self._blobs if k.startswith(p))

    def list_dir(self, prefix: str) -> list[str]:
        p = prefix.rstrip("/") + "/"
        with self._lock:
            return sorted({k[len(p):].split("/", 1)[0] for k in self._blobs if k.startswith(p)})

    def exists(self, path: str) -> bool:
        with self._lock:
            return path in self._blobs

    def delete(self, path: str) -> None:
        with self._lock:
            if path not in self._blobs:
                raise FileNotFoundError(path)
            del self._blobs[path]

    def delete_prefix(self, prefix: str) -> None:
        p = prefix.rstrip("/") + "/"
        with self._lock:
            for k in [k for k in self._blobs if k.startswith(p)]:
                del self._blobs[k]
