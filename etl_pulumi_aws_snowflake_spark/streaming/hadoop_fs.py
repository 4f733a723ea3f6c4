"""Hadoop-FileSystem implementation of the snapshot protocol's seam.

:mod:`.snapshot` reaches storage only through a small seam — five core
calls (``read_text`` / ``write_text`` / ``rename`` / ``listdir`` /
``rmtree``) plus ``mkdirs``/``create_exclusive`` for the commit-log
pointer store (:class:`.snapshot.LocalFilesystem`).  This module provides
the cluster-side implementation over the Hadoop FileSystem API (the
same JVM classes Spark's own Parquet IO uses, reached through the
session's py4j gateway), so pointing a snapshot root at ``hdfs://...``
or ``s3a://...`` is configuration::

    fs = HadoopFilesystem(spark, "hdfs://namenode:8020/")
    snapshot_commit(df, "hdfs://namenode:8020/tables/customers", fs=fs)

``rename`` uses ``FileContext.rename(src, dst, Options.Rename.OVERWRITE)``
— the atomic-replace primitive the protocol's pointer swap requires.
That atomicity holds on HDFS (and on ``file://`` for local testing);
**S3A renames are copy+delete and NOT atomic** — on S3, wrap this fs in
:class:`..snapshot.CommitLogPointer`, which replaces the pointer swap
with a ``create_exclusive`` commit-log entry (honestly conditional via
S3 conditional PUT, ``fs.s3a.create.conditional.enabled``, Hadoop
3.4.1+ — the Delta ``_delta_log`` approach) so the missing-pointer
window never exists.  The data files themselves are immutable version
dirs either way, so no reader ever sees partial DATA — the rename race
is confined to the tiny pointer object, and the commit-log store
removes even that.

Driver-side METADATA only crosses this seam (pointer text, manifest
JSON, dir listings — bytes to kilobytes per commit); the bulk data path
stays Spark's native parquet reader/writer, which already speaks every
Hadoop filesystem.  Reference parity: the reference delegates this
transactionality to Snowflake's stage→table load
(``modules/snowflake.py:158-167``); here it is owned engine-side on
whatever filesystem the cluster runs.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


class HadoopFilesystem:
    """Snapshot-protocol filesystem over ``org.apache.hadoop.fs``.

    ``base_uri`` selects the filesystem (``file:///``, ``hdfs://nn/``,
    ``s3a://bucket/``); paths passed to the seam calls must be
    resolvable by that filesystem (plain paths or full URIs on the
    same scheme).
    """

    def __init__(self, spark: SparkSession, base_uri: str) -> None:
        jvm = spark._jvm
        self._jvm = jvm
        hconf = spark._jsc.hadoopConfiguration()
        juri = jvm.java.net.URI(base_uri)
        self._fs = jvm.org.apache.hadoop.fs.FileSystem.get(juri, hconf)
        self._fc = jvm.org.apache.hadoop.fs.FileContext.getFileContext(
            juri, hconf
        )
        self._Path = jvm.org.apache.hadoop.fs.Path
        rename_cls = jvm.org.apache.hadoop.fs.Options.Rename
        gw = spark.sparkContext._gateway
        self._overwrite = gw.new_array(rename_cls, 1)
        self._overwrite[0] = rename_cls.OVERWRITE

    def _p(self, path: str):
        return self._Path(path)

    def read_text(self, path: str) -> str:
        p = self._p(path)
        if not self._fs.exists(p):
            raise FileNotFoundError(path)
        stream = self._fs.open(p)
        try:
            sink = self._jvm.java.io.ByteArrayOutputStream()
            self._jvm.org.apache.hadoop.io.IOUtils.copyBytes(
                stream, sink, 4096, False
            )
            return bytes(sink.toByteArray()).decode("utf-8")
        finally:
            stream.close()

    def write_text(self, path: str, text: str) -> None:
        out = self._fs.create(self._p(path), True)
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()

    def rename(self, src: str, dst: str) -> None:
        """Atomic replace (``Options.Rename.OVERWRITE``) — see module
        docstring for the S3A caveat."""
        self._fc.rename(self._p(src), self._p(dst), self._overwrite)

    def listdir(self, path: str) -> list[str]:
        p = self._p(path)
        if not self._fs.exists(p):
            raise FileNotFoundError(path)
        return [st.getPath().getName() for st in self._fs.listStatus(p)]

    def rmtree(self, path: str) -> None:
        """Removes a dir tree or a single file; missing is OK
        (``FileSystem.delete`` returns false rather than raising)."""
        self._fs.delete(self._p(path), True)

    def mkdirs(self, path: str) -> None:
        self._fs.mkdirs(self._p(path))

    #: Java exception classes that mean "another writer already holds
    #: this path" — the CAS-loss signal create_exclusive must map to
    #: FileExistsError.  Matched by class name (walking the cause
    #: chain), not by message substring: HDFS raises
    #: o.a.h.fs.FileAlreadyExistsException, but an S3A conditional PUT
    #: (If-None-Match, HADOOP-19256) loses with an HTTP 412 surfaced as
    #: RemoteFileChangedException, whose message says nothing about
    #: "exists" — substring matching would re-raise it raw and a losing
    #: writer would get an opaque error instead of SnapshotConflictError.
    _CAS_LOSS_CLASSES = (
        "org.apache.hadoop.fs.FileAlreadyExistsException",
        "java.nio.file.FileAlreadyExistsException",
        "org.apache.hadoop.fs.s3a.RemoteFileChangedException",
    )

    def _is_cas_loss(self, exc: Exception) -> bool:
        java_exc = getattr(exc, "java_exception", None)
        while java_exc is not None:
            try:
                name = java_exc.getClass().getName()
            except Exception:
                break
            if name in self._CAS_LOSS_CLASSES:
                return True
            java_exc = java_exc.getCause()
        # fallback for non-py4j wrappers (e.g. the pytest fakes)
        return "AlreadyExists" in str(exc) or "already exists" in str(exc)

    def create_exclusive(self, path: str, text: str) -> None:
        """Create-if-absent: ``FileSystem.create(path, overwrite=false)``
        — an atomic claim on HDFS; on S3A it is honestly conditional
        only with ``fs.s3a.create.conditional.enabled`` (Hadoop 3.4.1+,
        If-None-Match PUT), which :class:`..snapshot.CommitLogPointer`
        requires there."""
        try:
            out = self._fs.create(self._p(path), False)
        except Exception as exc:  # py4j wraps the Java exception
            if self._is_cas_loss(exc):
                raise FileExistsError(path) from None
            raise
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()
