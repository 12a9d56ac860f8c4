"""Filesystem helpers shared by the streaming state machinery and the
batch-side table maintenance (compaction swaps, drops).

Every helper routes URI-scheme paths (``hdfs://``, ``s3a://``,
``file://``) through the Hadoop FileSystem API resolved from the
session's configuration — the same resolution Spark's own
readers/writers use — and takes an ``os``/``shutil`` fast path for bare
local paths: the listings run several times per micro-batch and a py4j
round-trip per call is measurable at local bench scale, while the
semantics (child names, recursive delete, existence, rename) are the
same. This is what lets one state/compaction design work unchanged from
a laptop's /tmp to a 100 TB cluster's object store.

One caveat for object stores: S3A "rename" is copy+delete, not atomic —
the callers that swap directories (:func:`fs_rename` users) pair it
with ``_SUCCESS``-gated selection rules so every crash window is still
read-exactly-once; a production deployment may prefer a transactional
table format for the OUTPUT tables.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["fs_exists", "fs_listdir", "fs_rmtree", "fs_du", "fs_rename"]


def _is_uri(path: str) -> bool:
    return "://" in path


def _fs_api(ss: SparkSession, path: str):
    """(FileSystem, Path) for a URI-scheme path, resolved through the
    session's Hadoop configuration."""
    jvm = ss._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(ss._jsc.hadoopConfiguration()), jpath


def fs_exists(ss: SparkSession, path: str) -> bool:
    """Existence on any scheme; bare local paths skip the JVM."""
    if not _is_uri(path):
        return os.path.exists(path)
    fs, jp = _fs_api(ss, path)
    return fs.exists(jp)


def fs_listdir(ss: SparkSession, path: str) -> list[str]:
    """Child BASENAMES of a directory on any scheme ([] when the
    directory doesn't exist — callers treat missing state as empty)."""
    if not _is_uri(path):
        return os.listdir(path) if os.path.exists(path) else []
    fs, jp = _fs_api(ss, path)
    if not fs.exists(jp):
        return []
    return [st.getPath().getName() for st in fs.listStatus(jp)]


def fs_rmtree(ss: SparkSession, path: str) -> None:
    """Recursive delete on any scheme; missing paths are a no-op (the
    compaction sweeps call this on leftovers that may already be gone)."""
    if not _is_uri(path):
        import shutil

        shutil.rmtree(path, ignore_errors=True)
        return
    fs, jp = _fs_api(ss, path)
    fs.delete(jp, True)


def fs_du(ss: SparkSession, path: str) -> int:
    """Total bytes under a path (0 when missing) — the size probe behind
    broadcast-vs-shuffle decisions and file-count targets."""
    if not _is_uri(path):
        if not os.path.exists(path):
            return 0
        total = 0
        for root, _dirs, files in os.walk(path):
            for f in files:
                # skip local checksum files (.part-*.crc): Hadoop's
                # LocalFileSystem hides them too, keeping the two code
                # paths' byte counts identical
                if not f.startswith("."):
                    total += os.path.getsize(os.path.join(root, f))
        return total
    fs, jp = _fs_api(ss, path)
    if not fs.exists(jp):
        return 0
    return fs.getContentSummary(jp).getLength()


def fs_rename(ss: SparkSession, src: str, dst: str) -> None:
    """Move a directory on any scheme (the out-of-place-then-swap step
    of the batch compactions). Raises when the rename is refused —
    a silent False from Hadoop's rename would leave the swap half-done."""
    if not _is_uri(src) and not _is_uri(dst):
        import shutil

        shutil.move(src, dst)
        return
    fs, jsrc = _fs_api(ss, src)
    jdst = ss._jvm.org.apache.hadoop.fs.Path(dst)
    if not fs.rename(jsrc, jdst):
        raise IOError(f"rename {src!r} -> {dst!r} refused by the filesystem")
