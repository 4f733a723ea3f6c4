"""Atomic Parquet snapshot versions: a minimal manifest so a MERGE
rewrite never tears a concurrent read.

Layout under one snapshot root::

    root/
      _CURRENT        <- text file naming the live version dir
      v-00001/        <- immutable Parquet version
      v-00002/

Writers publish a NEW version dir, then atomically swap the
``_CURRENT`` pointer (``os.replace`` — POSIX rename atomicity; on an
object store the same pattern is an atomic single-key PUT, which is how
Delta's ``_last_checkpoint`` and Iceberg's ``version-hint.text`` do
it).  Readers resolve the pointer once and scan an immutable dir, so a
read concurrent with a rewrite sees entirely-old or entirely-new rows,
never a half-written table — the transactionality the reference
delegates to Snowflake (reference ``modules/snowflake.py:158-167``),
owned engine-side here.

Pruning keeps the previous version alongside the live one: a reader
that resolved ``_CURRENT`` just before a swap may still be scanning it.

Path manipulation uses the local filesystem API (the test/driver
environment); a cluster port swaps ``open``/``os.replace`` for the
Hadoop FileSystem equivalents with ``rename`` — the protocol is
unchanged.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

_POINTER = "_CURRENT"


def _current_version(root: str) -> str | None:
    try:
        with open(os.path.join(root, _POINTER)) as f:
            v = f.read().strip()
        return v or None
    except FileNotFoundError:
        return None


def snapshot_read(spark: SparkSession, root: str) -> DataFrame:
    """Load the live snapshot version (or the bare root for a seed
    table written by a plain ``df.write.parquet(root)``)."""
    v = _current_version(root)
    return spark.read.parquet(os.path.join(root, v) if v else root)


def snapshot_commit(df: DataFrame, root: str, keep: int = 2) -> str:
    """Publish ``df`` as the next snapshot version and atomically swap
    the pointer; returns the new version name.  Idempotent under
    foreachBatch replay: a crash between the version write and the
    pointer swap leaves ``_CURRENT`` on the old version, and the rerun
    overwrites the orphaned dir before swapping."""
    v = _current_version(root)
    n = int(v.rsplit("-", 1)[1]) if v else 0
    new = f"v-{n + 1:05d}"
    df.write.mode("overwrite").parquet(os.path.join(root, new))
    tmp = os.path.join(root, f".{_POINTER}.{new}.tmp")
    with open(tmp, "w") as f:
        f.write(new)
    os.replace(tmp, os.path.join(root, _POINTER))
    # Numeric sort — lexicographic would order "v-100000" before
    # "v-99999" once the zero-padding overflows, pruning the live dir.
    versions = sorted(
        (d for d in os.listdir(root) if d.startswith("v-")),
        key=lambda d: int(d.rsplit("-", 1)[1]),
    )
    for old in versions[:-keep]:
        shutil.rmtree(os.path.join(root, old), ignore_errors=True)
    return new
