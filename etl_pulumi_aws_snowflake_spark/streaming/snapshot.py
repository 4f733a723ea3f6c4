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

**Partitioned versions (partition-pruned MERGE).**  A version written
by :func:`snapshot_commit_partitioned` lays its rows out Hive-style
under ``v-NNNNN/data/_p=<value>/`` and records a ``_MANIFEST.json``
mapping every live partition VALUE to the version dir that physically
holds it.  The partition column is DUPLICATED into the data files (the
``_p`` dir key is a write-time copy): a manifest read is then one
``spark.read.parquet(dir, dir, ...)`` over the selected dirs — a
single scan relation whose plan size does not grow with partition
count, with exact column values (no dir-name type inference), which is
what survives 10⁴+ partitions.  A pruned commit writes ONLY the
changed partitions' data and carries every untouched partition forward
as a manifest pointer to the older version — reference, not copy,
exactly how Iceberg/Delta MERGE touches only matching data files.  At
100 TB this turns a per-CDC-batch full-table rewrite into Σ|changed
partitions|.  GC then keeps, besides the last ``keep`` version dirs,
any older version still referenced by a kept manifest (the
expire-snapshots rule).  Pointers always name the version that
physically holds the data (carried-forward entries copy the previous
manifest's pointer), so references never chain.

Path manipulation uses the local filesystem API (the test/driver
environment); a cluster port swaps ``open``/``os.replace`` for the
Hadoop FileSystem equivalents with ``rename`` — the protocol is
unchanged.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_POINTER = "_CURRENT"
_MANIFEST = "_MANIFEST.json"
#: Internal dir-key column for partitioned versions; the real partition
#: column stays IN the data files (see module docstring).
_PDIR = "_p"


def _current_version(root: str) -> str | None:
    try:
        with open(os.path.join(root, _POINTER)) as f:
            v = f.read().strip()
        return v or None
    except FileNotFoundError:
        return None


def _read_manifest(root: str, version: str) -> dict | None:
    try:
        with open(os.path.join(root, version, _MANIFEST)) as f:
            return json.load(f)
    except FileNotFoundError:
        return None


def _partition_dir(root: str, version: str, value: str) -> str:
    return os.path.join(root, version, "data", f"{_PDIR}={value}")


def snapshot_read(
    spark: SparkSession, root: str, partition_values: list | None = None
) -> DataFrame:
    """Load the live snapshot version (or the bare root for a seed
    table written by a plain ``df.write.parquet(root)``).

    ``partition_values`` restricts a PARTITIONED snapshot to those
    partition values — physical pruning by construction (only the named
    manifest entries' dirs are opened, wherever their version lives),
    the read side of partition-pruned MERGE.  On an unpartitioned
    snapshot it degrades to a post-scan filter."""
    v = _current_version(root)
    man = _read_manifest(root, v) if v is not None else None
    if man is None:
        if partition_values is not None:
            raise ValueError(
                "partition_values pruning requires a partitioned snapshot "
                "(snapshot_commit_partitioned); this root's live version "
                "has no manifest"
            )
        return spark.read.parquet(os.path.join(root, v) if v else root)
    columns = man["columns"]
    entries: dict[str, str] = man["entries"]
    if partition_values is not None:
        wanted = {str(x) for x in partition_values}
        entries = {k: ver for k, ver in entries.items() if k in wanted}
    paths = [_partition_dir(root, ver, val) for val, ver in entries.items()]
    if not paths:
        schema = T.StructType.fromJson(json.loads(man["schema"]))
        return spark.createDataFrame([], schema).select(*columns)
    # One scan relation over the selected dirs (wherever their version
    # lives); the partition column is read from the data files, so no
    # dir-name type inference and no per-partition plan nodes.
    return spark.read.parquet(*paths).select(*columns)


def _next_version(root: str) -> str:
    v = _current_version(root)
    n = int(v.rsplit("-", 1)[1]) if v else 0
    return f"v-{n + 1:05d}"


def _swap_pointer(root: str, new: str) -> None:
    tmp = os.path.join(root, f".{_POINTER}.{new}.tmp")
    with open(tmp, "w") as f:
        f.write(new)
    os.replace(tmp, os.path.join(root, _POINTER))


def _gc(root: str, keep: int) -> None:
    """Remove version dirs beyond the last ``keep``, EXCEPT any still
    referenced by a kept version's manifest (a carried-forward
    partition's data lives in the version that last rewrote it — the
    expire-snapshots rule)."""
    # Numeric sort — lexicographic would order "v-100000" before
    # "v-99999" once the zero-padding overflows, pruning the live dir.
    versions = sorted(
        (d for d in os.listdir(root) if d.startswith("v-")),
        key=lambda d: int(d.rsplit("-", 1)[1]),
    )
    kept = set(versions[-keep:])
    referenced: set[str] = set()
    for ver in kept:
        man = _read_manifest(root, ver)
        if man:
            referenced.update(man["entries"].values())
    for old in versions[:-keep]:
        if old not in referenced:
            shutil.rmtree(os.path.join(root, old), ignore_errors=True)


def snapshot_commit(df: DataFrame, root: str, keep: int = 2) -> str:
    """Publish ``df`` as the next snapshot version and atomically swap
    the pointer; returns the new version name.  Idempotent under
    foreachBatch replay: a crash between the version write and the
    pointer swap leaves ``_CURRENT`` on the old version, and the rerun
    overwrites the orphaned dir before swapping."""
    new = _next_version(root)
    df.write.mode("overwrite").parquet(os.path.join(root, new))
    _swap_pointer(root, new)
    _gc(root, keep)
    return new


def snapshot_commit_partitioned(
    df: DataFrame,
    root: str,
    partition_col: str,
    changed_values: list | None = None,
    keep: int = 2,
) -> str:
    """Publish ``df`` as a PARTITIONED snapshot version.

    ``changed_values=None`` — full rewrite: every partition of ``df``
    lands in this version (also the upgrade path from an unpartitioned
    snapshot).  With ``changed_values``, ``df`` must hold exactly the
    post-merge rows of those partitions; only they are written, and
    every other live partition is carried forward BY REFERENCE (its
    manifest pointer is copied from the previous version — zero data
    movement).  A changed partition that ends up empty (every row
    deleted) is dropped from the manifest.

    Partition values must be Hive-dir-safe and non-null (ints or simple
    strings — the standard partition-column contract)."""
    if _PDIR in df.columns:
        raise ValueError(f"column name {_PDIR!r} is reserved by the snapshot layout")
    new = _next_version(root)
    ddir = os.path.join(root, new, "data")
    # Partition by a COPY of the column: the dir key gives the layout,
    # while the real column stays in the data files so reads never
    # depend on dir-name parsing (exact values, single scan relation).
    df.withColumn(_PDIR, F.col(partition_col)).write.mode("overwrite").partitionBy(
        _PDIR
    ).parquet(ddir)
    written = {
        d.split("=", 1)[1] for d in os.listdir(ddir) if d.startswith(f"{_PDIR}=")
    }

    entries: dict[str, str] = {}
    if changed_values is not None:
        prev = _current_version(root)
        prev_man = _read_manifest(root, prev) if prev else None
        if prev_man is None:
            raise ValueError(
                "changed_values requires the previous version to be "
                "partitioned (snapshot_commit_partitioned with full rewrite "
                "first)"
            )
        entries.update(prev_man["entries"])
        for val in changed_values:
            entries.pop(str(val), None)
    entries.update({val: new for val in written})

    manifest = {
        "partition_col": partition_col,
        "partition_type": dict(df.dtypes)[partition_col],
        "columns": df.columns,
        "schema": df.schema.json(),
        "entries": entries,
    }
    tmp = os.path.join(root, new, f".{_MANIFEST}.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(root, new, _MANIFEST))
    _swap_pointer(root, new)
    _gc(root, keep)
    return new
