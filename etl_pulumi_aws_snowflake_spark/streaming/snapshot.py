"""Atomic Parquet snapshot versions: a minimal manifest so a MERGE
rewrite never tears a concurrent read.

Layout under one snapshot root::

    root/
      _CURRENT        <- text file naming the live version dir
      v-00001/        <- immutable Parquet version
      v-00002/

Writers publish a NEW version dir, then atomically swap the
``_CURRENT`` pointer (rename atomicity; on an object store the same
pattern is an atomic single-key PUT, which is how Delta's
``_last_checkpoint`` and Iceberg's ``version-hint.text`` do it).
Readers resolve the pointer once and scan an immutable dir, so a
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

**Partition-value contract — ENFORCED.**  Manifest keys are the
partition values' string forms and must round-trip through a Hive dir
name unchanged.  A value Spark's ``escapePathName`` would rewrite
(``:``, ``/``, ``%``, …), an empty string, or a NULL
(``__HIVE_DEFAULT_PARTITION__``) would make the dir key diverge from
``str(value)`` — the changed partition's old manifest entry would not
be popped while a new escaped-key entry is added, yielding duplicate
rows on later reads.  :func:`snapshot_commit_partitioned` therefore
REJECTS such values (checked driver-side for ``changed_values``, and
against the written dir keys for the data itself, with the unpublished
version dir cleaned up) instead of committing corruption.

**Filesystem seam.**  All pointer/manifest path manipulation goes
through a small injectable filesystem object (:class:`LocalFilesystem`
by default) exposing exactly the five calls the protocol needs —
``read_text`` / ``write_text`` / ``rename`` (atomic) / ``listdir`` /
``rmtree``.  A cluster deployment passes an implementation backed by
the Hadoop FileSystem API (``open``/``create``/``rename``/
``listStatus``/``delete(recursive=True)``) or an object store's
single-key PUT for ``rename`` — configuration, not surgery.  Spark's
own Parquet IO already speaks Hadoop filesystems natively and needs no
seam.
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

#: Characters Spark/Hive partition paths escape (the set
#: ``ExternalCatalogUtils.charToEscape`` marks in the public Spark
#: source: ASCII control chars plus ``" # % ' * / : = ? \\ { [ ] ^``
#: and DEL).  A partition value containing any of these cannot be used
#: as a manifest key — its dir name would not equal ``str(value)``.
_HIVE_UNSAFE = frozenset('"#%\'*/:=?\\{[]^\x7f') | frozenset(
    chr(c) for c in range(0x20)
)
_HIVE_NULL_DIR = "__HIVE_DEFAULT_PARTITION__"


class LocalFilesystem:
    """Default (local-disk) implementation of the snapshot protocol's
    filesystem seam.  ``rename`` MUST be atomic-replace — it is the
    protocol's only commit primitive (pointer swap, manifest publish).

    Hadoop/S3 port: ``read_text``→``FileSystem.open``, ``write_text``→
    ``create``, ``rename``→``FileSystem.rename`` (HDFS) or a single-key
    PUT (object stores — last-writer-wins on one key is atomic),
    ``listdir``→``listStatus``, ``rmtree``→``delete(path, recursive)``.
    """

    def read_text(self, path: str) -> str:
        """Return the file's text; raise ``FileNotFoundError`` if absent."""
        with open(path) as f:
            return f.read()

    def write_text(self, path: str, text: str) -> None:
        with open(path, "w") as f:
            f.write(text)

    def rename(self, src: str, dst: str) -> None:
        """Atomic replace: after return, readers see dst's new content
        entirely, never a partial write."""
        os.replace(src, dst)

    def listdir(self, path: str) -> list[str]:
        return os.listdir(path)

    def rmtree(self, path: str) -> None:
        shutil.rmtree(path, ignore_errors=True)


DEFAULT_FS = LocalFilesystem()


def _validate_partition_value(val, what: str) -> str:
    """str(val) if it survives a Hive dir round-trip; raise otherwise
    (nulls, empties, and escape-needing characters corrupt the manifest
    key mapping — see module docstring)."""
    if val is None:
        raise ValueError(
            f"partitioned snapshot {what} contains NULL: NULL partition "
            f"values map to the {_HIVE_NULL_DIR} dir and cannot serve as "
            "manifest keys — filter or fill the partition column first"
        )
    s = str(val)
    if s == "" or s == _HIVE_NULL_DIR or any(ch in _HIVE_UNSAFE for ch in s):
        raise ValueError(
            f"partitioned snapshot {what} value {s!r} does not survive a "
            "Hive partition-dir round-trip (empty, reserved, or contains "
            "a character Spark's escapePathName rewrites); use a dir-safe "
            "partition column (ints or simple strings)"
        )
    return s


def _current_version(root: str, fs: LocalFilesystem = DEFAULT_FS) -> str | None:
    try:
        v = fs.read_text(os.path.join(root, _POINTER)).strip()
        return v or None
    except FileNotFoundError:
        return None


def _read_manifest(
    root: str, version: str, fs: LocalFilesystem = DEFAULT_FS
) -> dict | None:
    try:
        return json.loads(fs.read_text(os.path.join(root, version, _MANIFEST)))
    except FileNotFoundError:
        return None


def _partition_dir(root: str, version: str, value: str) -> str:
    return os.path.join(root, version, "data", f"{_PDIR}={value}")


def _vnum(d: str) -> int:
    return int(d.rsplit("-", 1)[1])


def snapshot_versions(
    root: str, fs: LocalFilesystem | None = None
) -> list[str]:
    """FULLY-READABLE retained versions, oldest→newest — the time-travel
    horizon, not full history (commits GC beyond ``keep``).

    Two classes of on-disk ``v-*`` dirs are deliberately NOT listed:

    - dirs numerically ABOVE the live pointer: an in-progress commit's
      half-written output, or a crash orphan from a commit that died
      before its pointer swap (listing either would offer a torn read
      of never-committed data — version numbers only become readable
      at the swap);
    - committed dirs whose manifest references a dir GC has dropped:
      GC keeps a version alive as a DATA holder whenever a kept
      manifest points into it, but that survivor's OWN manifest may
      name even-older dirs that nothing kept needed — it is no longer
      readable *as a version* and time travel to it must refuse, not
      PATH_NOT_FOUND mid-scan."""
    fs = fs or DEFAULT_FS
    cur = _current_version(root, fs)
    if cur is None:
        return []
    on_disk = {d for d in fs.listdir(root) if d.startswith("v-")}
    out = []
    for d in sorted(on_disk, key=_vnum):
        if _vnum(d) > _vnum(cur):
            continue
        man = _read_manifest(root, d, fs)
        if man is not None and not all(
            ver in on_disk for ver in man["entries"].values()
        ):
            continue
        out.append(d)
    return out


def snapshot_read(
    spark: SparkSession,
    root: str,
    partition_values: list | None = None,
    fs: LocalFilesystem | None = None,
    version: str | None = None,
) -> DataFrame:
    """Load the live snapshot version (or the bare root for a seed
    table written by a plain ``df.write.parquet(root)``).

    ``partition_values`` restricts a PARTITIONED snapshot to those
    partition values — physical pruning by construction (only the named
    manifest entries' dirs are opened, wherever their version lives),
    the read side of partition-pruned MERGE.  On an UNPARTITIONED
    snapshot (no manifest) passing ``partition_values`` raises
    ``ValueError`` — pruning needs the manifest's value→dir mapping;
    there is no silent post-scan-filter fallback.

    ``version`` time-travels to a version in the readable horizon
    (:func:`snapshot_versions`; raises ``ValueError`` otherwise — GC'd,
    never committed, partially unreferenced, or an in-progress/orphaned
    dir).  Version dirs are immutable and a partitioned version's
    manifest pins each partition to the version that physically holds
    it, so an old read is exactly what a reader saw when that version
    was live — including carried-forward partitions whose data lives in
    an even older dir (GC keeps referenced dirs alive, the
    expire-snapshots rule)."""
    fs = fs or DEFAULT_FS
    if version is not None:
        # Targeted readability check — one listdir + (at most) the
        # requested version's own manifest, NOT snapshot_versions'
        # per-version manifest sweep: through a remote fs seam each
        # manifest read is a round-trip.
        cur = _current_version(root, fs)
        on_disk = {d for d in fs.listdir(root) if d.startswith("v-")}
        man = None
        ok = cur is not None and version in on_disk and _vnum(version) <= _vnum(cur)
        if ok:
            man = _read_manifest(root, version, fs)
            ok = man is None or all(
                ver in on_disk for ver in man["entries"].values()
            )
        if not ok:
            raise ValueError(
                f"snapshot version {version!r} is not in the readable "
                f"time-travel horizon of {root} "
                f"(readable: {snapshot_versions(root, fs)}); it was GC'd "
                "(fully or via a dropped reference), never committed, or "
                "is an in-progress/orphaned dir — raise `keep` on "
                "commits to widen the horizon"
            )
        v = version
    else:
        v = _current_version(root, fs)
        man = _read_manifest(root, v, fs) if v is not None else None
    if man is None:
        if partition_values is not None:
            which = (
                f"requested version {version!r}"
                if version is not None
                else "this root's live version"
            )
            raise ValueError(
                "partition_values pruning requires a partitioned snapshot "
                f"(snapshot_commit_partitioned); {which} has no manifest"
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


def _next_version(root: str, fs: LocalFilesystem = DEFAULT_FS) -> str:
    v = _current_version(root, fs)
    return f"v-{(_vnum(v) if v else 0) + 1:05d}"


def _swap_pointer(root: str, new: str, fs: LocalFilesystem = DEFAULT_FS) -> None:
    tmp = os.path.join(root, f".{_POINTER}.{new}.tmp")
    fs.write_text(tmp, new)
    fs.rename(tmp, os.path.join(root, _POINTER))


def _gc(root: str, keep: int, fs: LocalFilesystem = DEFAULT_FS) -> None:
    """Remove version dirs beyond the last ``keep``, EXCEPT any still
    referenced by a kept version's manifest (a carried-forward
    partition's data lives in the version that last rewrote it — the
    expire-snapshots rule)."""
    # Raw on-disk listing, NOT snapshot_versions: GC must also see
    # reference-only data holders and crash orphans (which the readable
    # horizon deliberately excludes).  Numeric sort — lexicographic
    # would order "v-100000" before "v-99999" once the zero-padding
    # overflows, pruning the live dir.
    versions = sorted(
        (d for d in fs.listdir(root) if d.startswith("v-")), key=_vnum
    )
    kept = set(versions[-keep:])
    referenced: set[str] = set()
    for ver in kept:
        man = _read_manifest(root, ver, fs)
        if man:
            referenced.update(man["entries"].values())
    for old in versions[:-keep]:
        if old not in referenced:
            fs.rmtree(os.path.join(root, old))


def snapshot_commit(
    df: DataFrame, root: str, keep: int = 2, fs: LocalFilesystem | None = None
) -> str:
    """Publish ``df`` as the next snapshot version and atomically swap
    the pointer; returns the new version name.  Idempotent under
    foreachBatch replay: a crash between the version write and the
    pointer swap leaves ``_CURRENT`` on the old version, and the rerun
    overwrites the orphaned dir before swapping."""
    fs = fs or DEFAULT_FS
    new = _next_version(root, fs)
    df.write.mode("overwrite").parquet(os.path.join(root, new))
    _swap_pointer(root, new, fs)
    _gc(root, keep, fs)
    return new


def snapshot_commit_partitioned(
    df: DataFrame,
    root: str,
    partition_col: str,
    changed_values: list | None = None,
    keep: int = 2,
    fs: LocalFilesystem | None = None,
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

    Partition values must be Hive-dir-safe and non-null — VALIDATED,
    not assumed: unsafe ``changed_values`` raise before any write, and
    unsafe values in the DATA are detected from the written dir keys,
    the unpublished version dir is removed, and the commit raises with
    the live pointer untouched (see module docstring)."""
    fs = fs or DEFAULT_FS
    if _PDIR in df.columns:
        raise ValueError(f"column name {_PDIR!r} is reserved by the snapshot layout")
    if changed_values is not None:
        for val in changed_values:
            _validate_partition_value(val, "changed_values")
    new = _next_version(root, fs)
    ddir = os.path.join(root, new, "data")
    # Partition by a COPY of the column: the dir key gives the layout,
    # while the real column stays in the data files so reads never
    # depend on dir-name parsing (exact values, single scan relation).
    df.withColumn(_PDIR, F.col(partition_col)).write.mode("overwrite").partitionBy(
        _PDIR
    ).parquet(ddir)
    written = {
        d.split("=", 1)[1] for d in fs.listdir(ddir) if d.startswith(f"{_PDIR}=")
    }
    try:
        for key in written:
            # An escaped dir key ('%XX') or the null dir never equals
            # str(value) — the manifest mapping would corrupt.
            _validate_partition_value(key, f"column {partition_col!r}")
    except ValueError:
        # Nothing was published: the pointer still names the old
        # version.  Drop the orphaned dir so GC bookkeeping stays clean.
        fs.rmtree(os.path.join(root, new))
        raise

    entries: dict[str, str] = {}
    if changed_values is not None:
        prev = _current_version(root, fs)
        prev_man = _read_manifest(root, prev, fs) if prev else None
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
    fs.write_text(tmp, json.dumps(manifest))
    fs.rename(tmp, os.path.join(root, new, _MANIFEST))
    _swap_pointer(root, new, fs)
    _gc(root, keep, fs)
    return new
