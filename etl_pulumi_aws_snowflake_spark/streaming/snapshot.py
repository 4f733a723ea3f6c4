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

**Zone maps (data skipping).**  A partitioned commit harvests each
written partition's per-column min/max from the parquet FOOTERS it
just wrote (no data re-scan) into the manifest, carried forward with
the entries.  ``snapshot_read(skip_by={col: (lo, hi)})`` then drops
partitions that provably cannot hold matching rows — predicate-driven
physical pruning on columns that are NOT the partition key, the
Iceberg/Delta file-skipping idea at manifest granularity.  Stats are
strictly optional metadata: wherever they are missing or unusable the
read keeps the partition, so skipping can never change a query's
result, only its cost.

**Compaction (bounding the reference spread).**  Pruned commits make
fragmentation structural: a partition last rewritten in ``v-K`` keeps
``v-K`` on disk for as long as any kept manifest references it, so a
workload that touches a different partition each batch accretes one
pinned version dir per batch — GC can never drop them, and the live
table's data spreads across O(#batches) dirs.  :func:`snapshot_compact`
is the maintenance counterpart (Iceberg ``rewrite_data_files`` / Delta
``OPTIMIZE``): it rewrites every partition whose data lives OUTSIDE the
live version into a fresh version (optionally coalescing each to one
file), carrying already-live partitions forward by reference.  The
post-compaction manifest references at most two dirs ({new, old-live}),
so once pre-compaction versions rotate out of the ``keep`` window GC
reclaims everything older — the reference spread is bounded by the
compaction cadence instead of the batch count.
:func:`snapshot_fragmentation` reports the spread so a maintenance job
can decide when to run it.

**Concurrent writers — detected, not locked.**  The protocol is
single-writer by design (one CDC stream owns a snapshot root, exactly
like a Delta/Iceberg table has one committer per stream).  An
ACCIDENTAL second writer is a lost update: both read the same live
version, both derive ``v-N+1``, the second pointer swap silently
discards the first commit.  Commits therefore run optimistically
against an ``expected_current`` token (the version the caller's merge
actually READ; defaults to the live version at commit start), checked
TWICE: once before any data is written — a writer that starts its
publish after another already swapped fails cleanly with nothing
written — and once again immediately before the pointer swap, so a
swap that happened DURING the data write also surfaces.  Both raise
:class:`SnapshotConflictError`; re-read and retry the merge —
:func:`snapshot_commit_partitioned_retry` automates exactly that
(Iceberg's commit-retry rule): a racer that rewrote DISJOINT
partitions rebases and recommits the same rows; an overlapping racer
triggers ``remerge`` re-derivation or a loud error.  What
this cannot fix: two writers whose DATA WRITES overlap in wall-clock
time target the same version dir and corrupt it before either check
fires (a true claim/CAS needs the store's participation — exclusive
create, DynamoDB conditional put, or a catalog commit, the
Delta/Iceberg approach — and an exclusive claim here would deadlock
the documented crash-replay path).  The contract is therefore still
SINGLE WRITER per snapshot root; the checks exist to make accidental
violations loud and bounded instead of silent.

**Filesystem seam.**  All pointer/manifest path manipulation goes
through a small injectable filesystem object (:class:`LocalFilesystem`
by default) whose core is five calls — ``read_text`` / ``write_text``
/ ``rename`` (atomic) / ``listdir`` / ``rmtree``.  A cluster
deployment passes an implementation backed by the Hadoop FileSystem
API (``open``/``create``/``rename``/``listStatus``/
``delete(recursive=True)``) or an object store's single-key PUT for
``rename`` — configuration, not surgery.  Spark's own Parquet IO
already speaks Hadoop filesystems natively and needs no seam.

**Pointer-store sub-seam.**  HOW the ``_CURRENT`` decision is stored
is itself injectable: an fs exposing ``pointer_read`` /
``pointer_publish`` / ``pointer_forget`` owns the pointer format; a
bare five-call fs gets the default single-key rename protocol.  Two
stores ship: :class:`RenamePointerMixin` (the default — one key,
atomic-rename swap) and :class:`CommitLogPointer` (an append-only
``_commits/`` log committed via ``create_exclusive`` — the store for
S3-like filesystems whose rename is copy+delete, closing both the
missing-pointer window and the check-to-swap CAS race; see its
docstring).  The store is part of a root's on-disk format: pick one
per root.
"""

from __future__ import annotations

import json
import os
import shutil
import threading

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

#: Sentinel: "capture the live version at commit start" (``None`` is a
#: meaningful expected value — an empty root).
_CAPTURE = object()


class SnapshotConflictError(RuntimeError):
    """Another writer published a version between this commit's read
    point and its pointer swap; the commit was abandoned (live pointer
    untouched, unpublished dir removed).  Re-read and retry."""


#: Per-root in-process commit locks.  Two same-process writers whose
#: commits derive from the same expected version compute the same
#: ``v-next`` dir; both writing it CONCURRENTLY lets one
#: ``mode("overwrite")`` clobber the other's in-flight ``_temporary``
#: files — an opaque FS error (and possible torn data) instead of the
#: designed :class:`SnapshotConflictError` (surfaced r19 by the
#: mor compact-vs-merge race test once empty sidecar frames stopped
#: paying Python-worker latency).  Serializing the write+swap window
#: per root turns that race back into the orderly conflict.  Commits
#: to DIFFERENT roots — the §2.6 concurrent member commits — never
#: contend.  Cross-PROCESS writers remain out of contract (the
#: single-writer rule); this lock is for the in-process overlap the
#: layer itself creates.
_COMMIT_LOCKS: dict[str, object] = {}
_COMMIT_LOCKS_GUARD = threading.Lock()


def _commit_lock(root: str):
    with _COMMIT_LOCKS_GUARD:
        lock = _COMMIT_LOCKS.get(root)
        if lock is None:
            lock = threading.Lock()
            _COMMIT_LOCKS[root] = lock
        return lock


def _rename_pointer_read(root: str, fs) -> str | None:
    try:
        v = fs.read_text(os.path.join(root, _POINTER)).strip()
        return v or None
    except FileNotFoundError:
        return None


def _rename_pointer_publish(root: str, version: str, fs) -> None:
    tmp = os.path.join(root, f".{_POINTER}.{version}.tmp")
    fs.write_text(tmp, version)
    fs.rename(tmp, os.path.join(root, _POINTER))


def _pointer_read(root: str, fs) -> str | None:
    """Pointer-store dispatch: an fs exposing ``pointer_read`` owns the
    pointer format (:class:`CommitLogPointer`); a bare five-primitive
    fs gets the default rename protocol expressed in those primitives —
    existing seam implementations keep working unchanged."""
    if hasattr(fs, "pointer_read"):
        return fs.pointer_read(root)
    return _rename_pointer_read(root, fs)


def _pointer_publish(root: str, version: str, fs) -> None:
    if hasattr(fs, "pointer_publish"):
        fs.pointer_publish(root, version)
    else:
        _rename_pointer_publish(root, version, fs)


def _pointer_forget(root: str, version: str, fs) -> None:
    if hasattr(fs, "pointer_forget"):
        fs.pointer_forget(root, version)
    # rename protocol: single shared key, nothing per-version to drop


class RenamePointerMixin:
    """Default pointer store: the live version is the text of one
    ``_CURRENT`` key, committed by ``write tmp + atomic rename``.

    Correct wherever ``rename`` is atomic-replace (POSIX, HDFS, or an
    object store where the "rename" is a single-key PUT).  On a store
    whose rename is COPY+DELETE (S3A), the swap has a missing-pointer
    window — use :class:`CommitLogPointer` there instead; the pointer
    store is part of the root's on-disk FORMAT, so pick one per root
    and keep it (readers and writers must agree where the pointer
    lives)."""

    def pointer_read(self, root: str) -> str | None:
        """Live version name, or ``None`` for an empty root."""
        return _rename_pointer_read(root, self)

    def pointer_publish(self, root: str, version: str) -> None:
        """Atomically make ``version`` the live pointer."""
        return _rename_pointer_publish(root, version, self)

    def pointer_forget(self, root: str, version: str) -> None:
        """GC hook — a single-key store has nothing per-version to
        drop."""


class LocalFilesystem(RenamePointerMixin):
    """Default (local-disk) implementation of the snapshot protocol's
    filesystem seam: seven storage primitives plus the pointer-store
    sub-protocol (``pointer_read`` / ``pointer_publish`` /
    ``pointer_forget`` — rename-based here, see
    :class:`RenamePointerMixin`; wrap with :class:`CommitLogPointer`
    for stores without atomic rename).

    Hadoop/S3 port: ``read_text``→``FileSystem.open``, ``write_text``→
    ``create``, ``rename``→``FileSystem.rename`` (HDFS) or a single-key
    PUT (object stores — last-writer-wins on one key is atomic),
    ``listdir``→``listStatus``, ``rmtree``→``delete(path, recursive)``,
    ``mkdirs``→``mkdirs``, ``create_exclusive``→``create(path,
    overwrite=false)`` (atomic claim on HDFS; conditional If-None-Match
    PUT on S3 via ``fs.s3a.create.conditional.enabled``).
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
        """Remove a directory tree OR a single file; missing is OK."""
        if os.path.isdir(path):
            shutil.rmtree(path, ignore_errors=True)
        else:
            try:
                os.remove(path)
            except FileNotFoundError:
                pass

    def mkdirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def create_exclusive(self, path: str, text: str) -> None:
        """Create-if-absent, atomically: exactly one of N concurrent
        callers succeeds; the rest raise ``FileExistsError``.  The CAS
        primitive :class:`CommitLogPointer` builds on."""
        with open(path, "x") as f:
            f.write(text)


#: Commit-log dir name for :class:`CommitLogPointer` roots.
_COMMITS = "_commits"


class CommitLogPointer:
    """Pointer store for filesystems WITHOUT atomic rename (S3-like):
    wraps any seam filesystem, delegates the storage primitives, and
    replaces the ``_CURRENT`` swap with an append-only commit log —
    committing version N = ``create_exclusive`` of ``_commits/v-NNNNN``,
    and the live version = the highest log entry.

    This is the Delta ``_delta_log`` / Iceberg catalog-commit idea in
    its minimal form, and it fixes BOTH rename problems at once:

    - **atomicity** — a log entry either exists or does not; there is
      no copy+delete window where a reader finds no pointer at all
      (the documented S3A ``RenamePointerMixin`` race);
    - **true CAS** — two writers racing to commit the same next
      version hit ``create_exclusive`` on the same key and exactly one
      wins; the loser gets :class:`SnapshotConflictError` even if both
      passed the optimistic pre-checks (the residual check-to-swap
      window of the rename store is closed).  What it still cannot fix:
      both writers already wrote the same DATA dir before either
      published — the module-docstring single-writer contract stands.

    Requires ``create_exclusive`` to be honestly conditional on the
    backing store (HDFS ``create(overwrite=false)``; S3 conditional PUT
    via ``fs.s3a.create.conditional.enabled``, Hadoop 3.4.1+; GCS
    ``x-goog-if-generation-match: 0``).  The store choice is part of
    the root's FORMAT — a root written through this class has no
    ``_CURRENT`` key and must always be read through it.  The log stays
    bounded: GC forgets entries for version dirs it removes, so live
    entries track retained versions, not total commit count."""

    def __init__(self, fs=None) -> None:
        self._fs = fs or LocalFilesystem()

    # storage primitives — straight delegation
    def read_text(self, path: str) -> str:
        return self._fs.read_text(path)

    def write_text(self, path: str, text: str) -> None:
        self._fs.write_text(path, text)

    def rename(self, src: str, dst: str) -> None:
        self._fs.rename(src, dst)

    def listdir(self, path: str) -> list[str]:
        return self._fs.listdir(path)

    def rmtree(self, path: str) -> None:
        self._fs.rmtree(path)

    def mkdirs(self, path: str) -> None:
        self._fs.mkdirs(path)

    def create_exclusive(self, path: str, text: str) -> None:
        self._fs.create_exclusive(path, text)

    # pointer store — the commit log
    def pointer_read(self, root: str) -> str | None:
        try:
            names = self._fs.listdir(os.path.join(root, _COMMITS))
        except FileNotFoundError:
            return None
        versions = [n for n in names if n.startswith("v-")]
        return max(versions, key=_vnum) if versions else None

    def pointer_publish(self, root: str, version: str) -> None:
        self._fs.mkdirs(os.path.join(root, _COMMITS))
        try:
            self._fs.create_exclusive(
                os.path.join(root, _COMMITS, version), version
            )
        except FileExistsError:
            raise SnapshotConflictError(
                f"snapshot root {root}: version {version} was already "
                "committed by another writer (commit-log CAS) — re-read "
                "the snapshot and retry the merge"
            ) from None

    def pointer_forget(self, root: str, version: str) -> None:
        self._fs.rmtree(os.path.join(root, _COMMITS, version))


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
    return _pointer_read(root, fs)


def _read_manifest(
    root: str, version: str, fs: LocalFilesystem = DEFAULT_FS
) -> dict | None:
    try:
        return json.loads(fs.read_text(os.path.join(root, version, _MANIFEST)))
    except FileNotFoundError:
        return None


def _partition_dir(root: str, version: str, value: str) -> str:
    return os.path.join(root, version, "data", f"{_PDIR}={value}")


#: Footer-stats collection is driver-side metadata work (one footer
#: read per written file).  A pruned MERGE writes a handful of
#: partitions and stays far under this; a full rewrite of a 10^4+
#: partition table would serialize 10^4+ footer opens on the driver,
#: so above the cap the commit publishes WITHOUT stats (reads stay
#: conservative — skipping is an optimization, never a dependency).
#: A cluster port lifts this by collecting stats in the writer tasks.
STATS_MAX_FILES = 4096

#: Manifest marker naming the NaN discipline the FLOAT bounds in
#: ``stats`` obey.  :func:`_collect_partition_stats` only emits a float
#: bound when parquet-mr's NaN-poisoning let it PROVE the partition is
#: NaN-free for that column; this string records that proof in the
#: manifest.  ``snapshot_read``'s ``skip_by`` trusts float bounds ONLY
#: under this exact contract — bounds from any other source (a foreign
#: writer, a cluster port collecting stats its own way, a hand-edited
#: manifest) are ignored for floats, because a source that silently
#: omits NaN from finite bounds (parquet-cpp/pyarrow behavior) would
#: let skip_by prune NaN rows that Spark's NaN-greatest filter
#: semantics actually match (Iceberg's nan_value_counts problem).
#: Integer and string bounds carry no NaN hazard and are trusted
#: regardless.  Bump the suffix if the discipline ever changes — old
#: manifests then conservatively stop float-pruning instead of lying.
STATS_CONTRACT = "parquet-mr-nan-poisoned-v1"


def _strip_float_bounds(stats: dict) -> dict:
    """Drop float-typed bounds from a carried-forward stats dict whose
    source contract is unknown — absence widens reads, never narrows
    them (see :data:`STATS_CONTRACT`)."""
    return {
        key: {
            col: b
            for col, b in cols.items()
            if not (isinstance(b[0], float) or isinstance(b[1], float))
        }
        for key, cols in stats.items()
    }


def _collect_partition_stats(ddir: str, written: set[str]) -> dict | None:
    """Per-partition column min/max harvested from the just-written
    parquet FOOTERS (row-group statistics) — zero data re-scan, the
    Iceberg manifest-stats approach.  Returns
    ``{partition_key: {col: [min, max]}}``; a column appears only if
    every file and row group of the partition carries usable stats of
    a JSON-stable scalar type (int/float/str — bools, timestamps,
    decimals, binary and nested types are skipped, readers treat the
    absence conservatively).

    **Float-stats NaN contract (writer assumption, load-bearing).**
    The in-loop NaN check below only works because these files are
    written by Spark (parquet-mr), which POISONS a NaN-bearing row
    group's min/max with NaN — detectable, so the bound is dropped.  A
    stats source that instead silently OMITS NaN from finite bounds
    (parquet-cpp/pyarrow writers, or a cluster port collecting stats in
    the writer tasks) would report e.g. ``[1.0, 5.0]`` for a partition
    that also holds NaN rows, and since Spark's filters order NaN above
    every number, ``skip_by={col: (6.0, None)}`` would prune rows the
    real filter matches — Iceberg's ``nan_value_counts`` problem.  Any
    replacement stats source MUST either supply a per-partition NaN row
    count (bound unusable when > 0) or drop float-column stats
    entirely — and it must NOT stamp :data:`STATS_CONTRACT` into the
    manifest unless it reproduces this poisoning proof: ``skip_by``
    refuses to float-prune under any other ``stats_contract`` value
    (enforced read-side, tested in ``test_snapshot_skipping.py``).
    Returns ``None`` when the footers are not
    locally readable (e.g. an object-store root reached only through a
    remote filesystem seam): commits then publish without stats and
    every read keeps every partition — skipping is an optimization,
    never a correctness dependency.  A cluster port collects the same
    numbers from the writer tasks or the store's footer API."""
    try:
        import pyarrow.parquet as pq

        stats: dict[str, dict] = {}
        budget = STATS_MAX_FILES
        for key in written:
            pdir = os.path.join(ddir, f"{_PDIR}={key}")
            files = sorted(
                f for f in os.listdir(pdir) if f.endswith(".parquet")
            )
            budget -= len(files)
            if budget < 0:
                return None  # over the driver-side metadata cap
            part_cols: dict[str, list] | None = None
            for f in files:
                md = pq.ParquetFile(os.path.join(pdir, f)).metadata
                fcols: dict[str, list | None] = {}
                for rg in range(md.num_row_groups):
                    g = md.row_group(rg)
                    for ci in range(g.num_columns):
                        c = g.column(ci)
                        name = c.path_in_schema
                        st = c.statistics
                        bound = None
                        if st is not None and st.has_min_max:
                            mn, mx = st.min, st.max
                            if (
                                type(mn) in (int, float, str)
                                and type(mn) is type(mx)
                                # NaN poisons the bound: parquet writes
                                # e.g. (1.0, NaN) for a NaN-bearing
                                # group, Python min/max would silently
                                # drop the NaN depending on file order,
                                # and Spark's filter treats NaN as
                                # larger than every number — a pruned
                                # partition could hold matching rows
                                # (Iceberg's nan_value_counts problem).
                                # No stats → conservatively kept.
                                and not (
                                    type(mn) is float
                                    and (mn != mn or mx != mx)
                                )
                            ):
                                bound = [mn, mx]
                        if name not in fcols:
                            fcols[name] = bound
                        elif bound is None:
                            fcols[name] = None
                        elif fcols[name] is not None:
                            fcols[name] = [
                                min(fcols[name][0], bound[0]),
                                max(fcols[name][1], bound[1]),
                            ]
                good = {n: b for n, b in fcols.items() if b is not None}
                if part_cols is None:
                    part_cols = good
                else:
                    part_cols = {
                        n: [
                            min(part_cols[n][0], b[0]),
                            max(part_cols[n][1], b[1]),
                        ]
                        for n, b in good.items()
                        if n in part_cols
                    }
            stats[key] = part_cols or {}
        return stats
    except Exception:
        return None


def _vnum(d: str) -> int:
    return int(d.rsplit("-", 1)[1])


def _version_readable(
    root: str,
    version: str,
    cur: str | None,
    on_disk: set[str],
    fs: LocalFilesystem,
) -> tuple[bool, dict | None]:
    """The ONE readability predicate behind both the horizon listing
    (:func:`snapshot_versions`) and :func:`snapshot_read`'s targeted
    time-travel check — they promise each other's answers, so the rule
    must have a single source of truth.  Readable = committed (at or
    below the live pointer, dir present) AND, for a partitioned
    version, every referenced data-holder dir still on disk.  Returns
    ``(ok, manifest)`` so the targeted caller pays no second manifest
    read."""
    if cur is None or version not in on_disk or _vnum(version) > _vnum(cur):
        return False, None
    man = _read_manifest(root, version, fs)
    ok = man is None or all(ver in on_disk for ver in man["entries"].values())
    return ok, man


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
    return [
        d
        for d in sorted(on_disk, key=_vnum)
        if _version_readable(root, d, cur, on_disk, fs)[0]
    ]


def snapshot_read(
    spark: SparkSession,
    root: str,
    partition_values: list | None = None,
    fs: LocalFilesystem | None = None,
    version: str | None = None,
    skip_by: dict | None = None,
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

    ``skip_by`` is zone-map data skipping for NON-partition-column
    predicates: ``{col: (lo, hi)}`` (either bound may be ``None`` for
    open) drops every partition whose manifest min/max for ``col``
    provably cannot intersect ``[lo, hi]`` — the Iceberg/Delta
    file-skipping move at partition granularity, with zero data IO
    spent deciding.  It is a PRUNING HINT, not a filter: kept
    partitions are returned whole, so the caller still applies the
    real predicate (exactly as an engine applies the query filter
    after file skipping); the contract is only that no row matching
    the bounds is dropped.  Conservative everywhere information is
    missing: partitions without stats for ``col``, type-mismatched
    bounds, and unpartitioned snapshots all pass through unpruned.

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
        # manifest read is a round-trip.  Same predicate object as the
        # horizon listing, so the two can never drift.
        cur = _current_version(root, fs)
        on_disk = {d for d in fs.listdir(root) if d.startswith("v-")}
        ok, man = _version_readable(root, version, cur, on_disk, fs)
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
    if skip_by:
        stats: dict[str, dict] = man.get("stats") or {}
        # Float bounds are only usable under the NaN-poisoning proof
        # (STATS_CONTRACT): a stats source that omits NaN from finite
        # bounds would let us prune rows Spark's NaN-greatest filter
        # semantics match.  int/str bounds carry no NaN hazard.
        floats_ok = man.get("stats_contract") == STATS_CONTRACT

        def _may_match(pval: str) -> bool:
            bounds = stats.get(pval) or {}
            for col, (lo, hi) in skip_by.items():
                b = bounds.get(col)
                if b is None:
                    continue  # no evidence — keep
                if not floats_ok and (
                    isinstance(b[0], float) or isinstance(b[1], float)
                ):
                    continue  # unproven NaN discipline — keep
                try:
                    if (lo is not None and b[1] < lo) or (
                        hi is not None and b[0] > hi
                    ):
                        return False
                except TypeError:
                    continue  # bound/stat type mismatch — keep
            return True

        entries = {k: ver for k, ver in entries.items() if _may_match(k)}
    paths = [_partition_dir(root, ver, val) for val, ver in entries.items()]
    schema = T.StructType.fromJson(json.loads(man["schema"]))
    if not paths:
        from ..functions.localrel import local_frame

        return local_frame(spark, [], schema).select(*columns)
    # One scan relation over the selected dirs (wherever their version
    # lives); the partition column is read from the data files, so no
    # dir-name type inference and no per-partition plan nodes.  The
    # scan is pinned to the MANIFEST schema: after additive schema
    # evolution (merge_upsert allow_new_columns), carried-forward
    # partitions' files predate the new column and null-fill it here —
    # the Delta mergeSchema read behavior — instead of failing the
    # select or inferring from whichever file is listed first.
    return spark.read.schema(schema).parquet(*paths).select(*columns)


def _next_version_after(prev: str | None) -> str:
    return f"v-{(_vnum(prev) if prev else 0) + 1:05d}"


def _check_unchanged(
    root: str,
    expected: str | None,
    fs: LocalFilesystem,
    new: str | None = None,
) -> None:
    """Optimistic-concurrency check: the live version must still be the
    one this commit derived from.  Called once BEFORE the data write
    (``new=None`` — nothing to clean, the commit aborts with zero
    footprint) and once before the pointer swap (``new`` set — the
    loser's unpublished dir is removed, UNLESS the conflicting writer
    published that very dir name, in which case deleting it would
    destroy the live version; the error then reports the overlap as
    corrupting, see module docstring)."""
    cur = _current_version(root, fs)
    if cur == expected:
        return
    # Only ever sweep a dir strictly ABOVE the live pointer: a dir at
    # or below it is published — the winner may have claimed our very
    # version number (cur == new), or advanced past it (cur > new, in
    # which case `new` may even be the data holder kept manifests
    # reference).  Deleting either destroys committed data.
    overlapped = (
        new is not None and cur is not None and _vnum(new) <= _vnum(cur)
    )
    if new is not None and not overlapped:
        fs.rmtree(os.path.join(root, new))
    raise SnapshotConflictError(
        f"snapshot root {root}: live version moved {expected!r} -> "
        f"{cur!r} during this commit — another writer published first; "
        "re-read the snapshot and retry the merge (the protocol is "
        "optimistic single-writer: conflicts surface at publish time, "
        "see module docstring)"
        + (
            f". WARNING: the concurrent writer published {cur!r} at or "
            f"past this commit's target dir {new!r}, which was left in "
            "place (it is at or below the live pointer — deleting it "
            "could destroy committed data); if both writers wrote "
            f"{new!r} it may hold interleaved output and must be "
            "recommitted from a trusted source"
            if overlapped
            else ""
        )
    )


def _swap_pointer(root: str, new: str, fs: LocalFilesystem = DEFAULT_FS) -> None:
    _pointer_publish(root, new, fs)


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
            # Keep the pointer store's per-version state (commit-log
            # entry) in step with the dirs: live log size tracks
            # RETAINED versions, not total commit count.
            _pointer_forget(root, old, fs)


#: Member-pin file inside an index-root version dir.
_INDEX_JSON = "_INDEX.json"


def commit_concurrently(jobs: dict, max_workers: int = 3) -> dict[str, str]:
    """Run the independent MEMBER commits of one index build as
    concurrent driver threads — {member: thunk} → {member: version}.

    Actions are only sequential because the driver calls them
    sequentially (optimization guide §2.6): each member writes its own
    snapshot root (no shared pointer, no ordering constraint until the
    caller's ``index_publish`` pins the finished set), so submitting
    them together lets the small members' jobs back-fill executor
    slots freed by the big member's straggler tail instead of
    serializing N write jobs end to end.  2-3 in flight is enough to
    fill the tail without fighting for executors.  Any failed member
    raises here, BEFORE a publish could pin a half-built version set.
    Shared upstream subtrees must be persisted by the caller (every
    build does), so concurrent materialization dedupes through the
    block manager's per-block locks instead of recomputing per member."""
    from concurrent.futures import ThreadPoolExecutor

    names = list(jobs)
    if len(names) == 1:
        return {names[0]: jobs[names[0]]()}
    with ThreadPoolExecutor(max_workers=min(max_workers, len(names))) as pool:
        futures = {name: pool.submit(jobs[name]) for name in names}
        return {name: futures[name].result() for name in names}


def index_publish(
    root: str,
    members: dict[str, str],
    keep: int = 2,
    fs: LocalFilesystem | None = None,
    expected_current=_CAPTURE,
) -> str:
    """Atomically publish a MULTI-SNAPSHOT index version (VERDICT r11
    #7): one root-level pointer naming the exact ``{member name →
    snapshot version}`` set a serve must read TOGETHER — e.g. an IVF
    index's ``{"seeds": ..., "corpus": ...}`` or a BM25 index's
    ``{"postings": ..., "meta": ...}``.  Member snapshots stay ordinary
    versioned snapshots under ``<root>/<member>``; this promotes the
    pointer one level so the PAIR swap is the atom, closing the
    documented torn window between two member commits (a search
    between them used to score new candidates against old stats).

    Same protocol as :func:`snapshot_commit` minus the data write: the
    new index version dir holds one tiny JSON pin-file, optimistic
    conflict checks bracket it, the pointer swap is the publish, and
    GC trims old pin dirs (no manifests, so nothing is
    carried-forward).  Through a :class:`CommitLogPointer` fs the swap
    is a true CAS — two writers racing to publish the same next index
    version lose deterministically.  Returns the index version name.

    Readers: :func:`index_current` resolves the pinned set once, then
    every member read passes ``version=`` to :func:`snapshot_read` —
    one consistent index no matter what publishes mid-serve.  Member
    GC keeps ``keep`` versions per member and every maintenance op
    republishes, so the pinned set is never more than one member
    commit behind the member pointers."""
    fs = fs or DEFAULT_FS
    expected = (
        _current_version(root, fs) if expected_current is _CAPTURE
        else expected_current
    )
    _check_unchanged(root, expected, fs)
    new = _next_version_after(expected)
    fs.mkdirs(os.path.join(root, new))
    fs.write_text(
        os.path.join(root, new, _INDEX_JSON),
        json.dumps(dict(members), sort_keys=True),
    )
    _check_unchanged(root, expected, fs, new=new)
    _swap_pointer(root, new, fs)
    _gc(root, keep, fs)
    return new


def index_publish_retry(
    root: str,
    updates: dict[str, str],
    expected_current,
    max_retries: int = 3,
    keep: int = 2,
    fs: LocalFilesystem | None = None,
) -> str:
    """Optimistic rebase-and-retry for index-pin publishes — the
    index-family half of :func:`snapshot_commit_partitioned_retry`
    (VERDICT r14 gap #3 named index appends as the commutative case):
    a maintenance op that committed member snapshots wants to publish
    ``updates`` ({member → the version it left live}) against the pin
    it derived from (``expected_current``, REQUIRED — the version the
    op's reads were pinned to; ``None`` for a first publish).

    On a racing publish, diff the base pin against the live pin over
    ``updates``'s members: racers that moved only OTHER members (an
    IVF corpus append racing a BM25 postings append under one root, a
    stats advance racing a deletes fold) are commutative — rebase by
    carrying the racer's member versions forward and re-pinning.  A
    racer that moved one of OUR members means this op's member commit
    itself raced (its own snapshot CAS decides who won) — re-raise
    naming the members; and an unreadable base pin (GC'd dir) is
    conservatively overlapping."""
    fs = fs or DEFAULT_FS

    def pin_of(version):
        if version is None:
            return {}
        try:
            return json.loads(
                fs.read_text(os.path.join(root, version, _INDEX_JSON))
            )
        except FileNotFoundError:
            return None

    token = expected_current
    base = pin_of(token)
    for attempt in range(max_retries + 1):
        if base is None:
            raise SnapshotConflictError(
                f"index root {root}: the base pin {token!r} is gone "
                "(GC'd by concurrent publishes) — cannot prove the "
                "racers were member-disjoint; re-derive and republish"
            )
        try:
            return index_publish(
                root, {**base, **updates}, keep=keep, fs=fs,
                expected_current=token,
            )
        except SnapshotConflictError:
            if attempt == max_retries:
                raise
            live = _current_version(root, fs)
            live_pin = pin_of(live)
            if live_pin is None:
                base = None
                continue  # surfaces the conservative error above
            touched = [
                m for m in updates if base.get(m) != live_pin.get(m)
            ]
            if touched:
                raise SnapshotConflictError(
                    f"index root {root}: concurrent publishes moved "
                    f"members {touched} this publish also updates — "
                    "not rebase-safe (the member snapshots themselves "
                    "raced); re-run the maintenance op"
                ) from None
            token, base = live, live_pin
    raise AssertionError("unreachable")


def index_republish(
    root: str, member_names, fs: LocalFilesystem | None = None
) -> str:
    """Publish the index pointer at each named member's CURRENT live
    version — the maintenance-op epilogue (build/append/delete commit
    their members, then pin the set they left live).  Also the crash
    healer: re-running a maintenance op that died between its member
    commits and its publish re-pins the now-consistent live set."""
    fs = fs or DEFAULT_FS
    members = {}
    for name in member_names:
        v = _current_version(os.path.join(root, name), fs)
        if v is None:
            raise ValueError(
                f"index root {root}: member {name!r} has no live "
                "snapshot to pin — build the index before publishing"
            )
        members[name] = v
    return index_publish(root, members, fs=fs)


def index_compact(
    spark: SparkSession,
    root: str,
    members: dict | None = None,
    fs: LocalFilesystem | None = None,
    **compact_kwargs,
) -> dict[str, str | None]:
    """Maintenance for a PUBLISHED index: :func:`snapshot_compact` each
    named member (``members`` maps member name → True for partitioned
    members to compact, False to skip — e.g. a 1-row ``meta`` has
    nothing to compact; default = compact every member named by the
    live pin that HAS a manifest), then republish the pin at the
    post-compaction member versions.

    This is the lifecycle step that keeps the atomic pin and the
    member GC horizon aligned: without the republish, repeated member
    compaction/GC would eventually reclaim the version the pin still
    names, and pinned serves would start raising time-travel errors —
    compaction through THIS entry point can never strand the pin.
    Returns {member: new version or None when that member's compaction
    was a no-op}."""
    fs = fs or DEFAULT_FS
    pin = index_current(root, fs=fs)
    if pin is None:
        raise ValueError(
            f"index root {root} has no published index version — "
            "index_compact maintains the pin; for bare snapshots use "
            "snapshot_compact directly"
        )
    if members is None:
        members = {
            name: _read_manifest(
                os.path.join(root, name),
                _current_version(os.path.join(root, name), fs),
                fs,
            )
            is not None
            for name in pin
        }
    out: dict[str, str | None] = {}
    for name, do in members.items():
        if not do:
            out[name] = None
            continue
        out[name] = snapshot_compact(
            spark, os.path.join(root, name), fs=fs, **compact_kwargs
        )
    index_republish(root, tuple(pin), fs=fs)
    return out


def index_current(
    root: str, fs: LocalFilesystem | None = None
) -> dict[str, str] | None:
    """The live pinned ``{member → snapshot version}`` set of an index
    root, or ``None`` for a root WITHOUT an index pointer (pre-pointer
    builds; serves fall back to each member's own live pointer — the
    old, individually-atomic behavior).

    A missing pin FILE under a resolved pointer is NOT a fallback
    case: swallowing it would silently degrade a pinned serve to
    unpinned member reads mid-rebuild — reopening the torn window the
    pin exists to close (review r12).  The only legitimate way to hit
    it is the read racing a concurrent publish whose GC removed the
    just-resolved version's dir; re-resolving the pointer recovers
    (it has necessarily moved).  A STABLE pointer with no pin file is
    a corrupt root and raises."""
    fs = fs or DEFAULT_FS
    for _ in range(5):
        v = _current_version(root, fs)
        if v is None:
            return None
        try:
            return json.loads(fs.read_text(os.path.join(root, v, _INDEX_JSON)))
        except FileNotFoundError:
            if _current_version(root, fs) == v:
                raise ValueError(
                    f"index root {root}: live version {v} has no "
                    f"{_INDEX_JSON} — the root is corrupt (a publish "
                    "crashed after the pointer swap?); refusing to "
                    "silently fall back to unpinned member reads"
                ) from None
            # pointer moved between resolve and read (concurrent
            # publish + GC) — re-resolve
    raise SnapshotConflictError(
        f"index root {root}: pointer kept moving across 5 pin reads — "
        "a publish storm; retry the serve"
    )


def snapshot_commit(
    df: DataFrame,
    root: str,
    keep: int = 2,
    fs: LocalFilesystem | None = None,
    expected_current=_CAPTURE,
) -> str:
    """Publish ``df`` as the next snapshot version and atomically swap
    the pointer; returns the new version name.  Idempotent under
    foreachBatch replay: a crash between the version write and the
    pointer swap leaves ``_CURRENT`` on the old version, and the rerun
    overwrites the orphaned dir before swapping.

    ``expected_current`` is the optimistic-concurrency token: the
    version this commit's input was derived from (pass the version your
    merge READ; defaults to the live version at commit start).  The
    live pointer is checked against it before the data write and again
    before the swap; a mismatch raises :class:`SnapshotConflictError`
    instead of silently overwriting another writer's publication
    (module docstring)."""
    fs = fs or DEFAULT_FS
    with _commit_lock(root):
        expected = (
            _current_version(root, fs) if expected_current is _CAPTURE
            else expected_current
        )
        _check_unchanged(root, expected, fs)
        new = _next_version_after(expected)
        df.write.mode("overwrite").parquet(os.path.join(root, new))
        _check_unchanged(root, expected, fs, new=new)
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
    expected_current=_CAPTURE,
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
    the live pointer untouched (see module docstring).

    ``expected_current`` — optimistic-concurrency token, as in
    :func:`snapshot_commit`.  It is ALSO the version whose manifest
    supplies the carry-forward entries, so the references and the
    conflict check cannot disagree about which history this commit
    extends."""
    fs = fs or DEFAULT_FS
    if _PDIR in df.columns:
        raise ValueError(f"column name {_PDIR!r} is reserved by the snapshot layout")
    if changed_values is not None:
        for val in changed_values:
            _validate_partition_value(val, "changed_values")
    with _commit_lock(root):
        expected = (
            _current_version(root, fs) if expected_current is _CAPTURE
            else expected_current
        )
        _check_unchanged(root, expected, fs)
        new = _next_version_after(expected)
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
        stats: dict[str, dict] = {}
        if changed_values is not None:
            prev_man = _read_manifest(root, expected, fs) if expected else None
            if prev_man is None:
                # Same cleanup as the unsafe-data path: nothing published.
                fs.rmtree(os.path.join(root, new))
                raise ValueError(
                    "changed_values requires the previous version to be "
                    "partitioned (snapshot_commit_partitioned with full rewrite "
                    "first)"
                )
            entries.update(prev_man["entries"])
            carried = prev_man.get("stats") or {}
            if prev_man.get("stats_contract") != STATS_CONTRACT:
                # Carried bounds from a manifest that can't vouch for the
                # NaN discipline: keep the NaN-immune int/str bounds, drop
                # the float ones (see STATS_CONTRACT).
                carried = _strip_float_bounds(carried)
            stats.update(carried)
            for val in changed_values:
                entries.pop(str(val), None)
                stats.pop(str(val), None)
        entries.update({val: new for val in written})
        # A rewritten partition must NEVER keep carried-forward bounds: the
        # entries code above tolerates written keys outside changed_values,
        # and if footer collection below declines (cap / remote root) the
        # carried stats would describe the OLD data — a later skip_by could
        # prune rows the rewrite just added.  No stats beats stale stats.
        for k in written:
            stats.pop(k, None)
        written_stats = _collect_partition_stats(ddir, written)
        if written_stats is not None:
            stats.update(written_stats)

        manifest = {
            "partition_col": partition_col,
            "partition_type": dict(df.dtypes)[partition_col],
            "columns": df.columns,
            "schema": df.schema.json(),
            "entries": entries,
            # Zone maps: {partition_key: {col: [min, max]}} — carried
            # forward with the entries; absent/partial stats only widen
            # reads, never narrow them (see _collect_partition_stats).
            "stats": {k: v for k, v in stats.items() if k in entries},
            # Every float bound above is footer-harvested under parquet-mr
            # NaN poisoning (foreign-contract carries were stripped) — the
            # proof skip_by needs before float-pruning (STATS_CONTRACT).
            "stats_contract": STATS_CONTRACT,
        }
        tmp = os.path.join(root, new, f".{_MANIFEST}.tmp")
        fs.write_text(tmp, json.dumps(manifest))
        fs.rename(tmp, os.path.join(root, new, _MANIFEST))
        _check_unchanged(root, expected, fs, new=new)
        _swap_pointer(root, new, fs)
        _gc(root, keep, fs)
        return new


def _partitions_touched_between(
    root: str,
    base: str | None,
    live: str | None,
    changed_values: list,
    fs: LocalFilesystem,
) -> list | None:
    """Which of ``changed_values`` did the commits between ``base`` and
    ``live`` rewrite?  Compares the two manifests' entry pointers for
    those partitions.  Returns ``None`` when the question cannot be
    answered conservatively (a manifest is missing — unpartitioned
    version, GC'd base, foreign layout — or the schema moved): callers
    must then treat EVERYTHING as touched."""
    if base is None or live is None:
        return None
    base_man = _read_manifest(root, base, fs)
    live_man = _read_manifest(root, live, fs)
    if base_man is None or live_man is None:
        return None
    if base_man.get("columns") != live_man.get("columns") or base_man.get(
        "partition_col"
    ) != live_man.get("partition_col"):
        return None  # schema/layout moved under us — not rebase-safe
    be, le = base_man["entries"], live_man["entries"]
    return [
        v for v in changed_values if be.get(str(v)) != le.get(str(v))
    ]


def snapshot_commit_partitioned_retry(
    df: DataFrame,
    root: str,
    partition_col: str,
    changed_values: list,
    expected_current,
    remerge=None,
    max_retries: int = 3,
    keep: int = 2,
    fs: LocalFilesystem | None = None,
) -> str:
    """Optimistic rebase-and-retry around
    :func:`snapshot_commit_partitioned` — the missing half of the
    concurrency story (VERDICT r14 gap #3): conflicts were DETECTED
    (:class:`SnapshotConflictError`) but every loser had to be
    hand-rerun.  This is the Iceberg commit-retry rule (core's
    ``SnapshotProducer``: re-validate against the refreshed base, then
    re-apply): a racing commit only invalidates ours if the histories
    actually overlap.

    On conflict, re-read the live manifest and compare the entry
    pointers of OUR ``changed_values`` partitions between the base we
    derived from and the new live version:

    * **Disjoint** (the interloper rewrote other partitions — the
      commutative case: concurrent CDC merges of different partitions,
      parallel backfills): our post-merge rows are still exactly the
      post-merge state of those partitions, so REBASE — retry the same
      ``df`` against the new token.  Carry-forward references come
      from the new base, so the interloper's work is preserved.
    * **Overlapping**: our derivation is stale.  With a ``remerge``
      callable (``remerge(live_version) -> DataFrame`` — re-derive the
      changed partitions' post-merge rows against the refreshed
      snapshot), retry with its result; without one, re-raise naming
      the overlapping partitions — silently recommitting stale rows
      would be the exact lost update the CAS token exists to prevent.
    * **Unanswerable** (base GC'd, unpartitioned or foreign manifest,
      schema moved): conservatively treated as overlapping.

    ``expected_current`` is REQUIRED (no ``_CAPTURE`` default): a
    retry wrapper that captures its own token could silently absorb a
    conflict that predates the caller's read — the caller must pass
    the version its merge actually read.  At most ``max_retries``
    additional commit attempts; contention beyond that re-raises the
    last conflict."""
    fs = fs or DEFAULT_FS
    if changed_values is None:
        raise ValueError(
            "commit-retry requires changed_values: a full rewrite "
            "overlaps every concurrent commit by definition — there is "
            "no rebase-safe case, re-run the rewrite instead"
        )
    token = expected_current
    for attempt in range(max_retries + 1):
        try:
            return snapshot_commit_partitioned(
                df,
                root,
                partition_col,
                changed_values=changed_values,
                keep=keep,
                fs=fs,
                expected_current=token,
            )
        except SnapshotConflictError:
            if attempt == max_retries:
                raise
            live = _current_version(root, fs)
            touched = _partitions_touched_between(
                root, token, live, changed_values, fs
            )
            if touched == []:
                token = live  # disjoint — plain rebase, df still valid
                continue
            if remerge is None:
                raise SnapshotConflictError(
                    f"snapshot root {root}: concurrent commits touched "
                    f"partitions {touched if touched else changed_values}"
                    " this commit also changes (or the base manifest is "
                    "gone/unpartitioned) — not rebase-safe; pass "
                    "remerge= to re-derive against the refreshed "
                    "snapshot, or re-run the merge"
                ) from None
            df = remerge(live)
            token = live
    raise AssertionError("unreachable")  # loop always returns or raises


def snapshot_fragmentation(
    root: str, fs: LocalFilesystem | None = None
) -> dict:
    """Reference-spread report for the live version — the metric a
    maintenance job watches to decide when :func:`snapshot_compact` is
    due.  Keys: ``partitioned``; ``versions_referenced`` (distinct
    version dirs the live manifest points into — 1 means fully
    compacted); ``partitions_carried`` (live partitions whose data
    lives outside the live version — what compaction would rewrite);
    ``on_disk_dirs`` (total ``v-*`` dirs, incl. retained history)."""
    fs = fs or DEFAULT_FS
    cur = _current_version(root, fs)
    try:
        on_disk = sum(1 for d in fs.listdir(root) if d.startswith("v-"))
    except FileNotFoundError:
        on_disk = 0
    man = _read_manifest(root, cur, fs) if cur else None
    if man is None:
        return {
            "partitioned": False,
            "versions_referenced": 1 if cur else 0,
            "partitions_carried": 0,
            "on_disk_dirs": on_disk,
        }
    entries: dict[str, str] = man["entries"]
    return {
        "partitioned": True,
        "versions_referenced": len(set(entries.values())),
        "partitions_carried": sum(1 for v in entries.values() if v != cur),
        "on_disk_dirs": on_disk,
    }


def snapshot_compact(
    spark: SparkSession,
    root: str,
    partition_values: list | None = None,
    keep: int = 2,
    fs: LocalFilesystem | None = None,
    one_file_per_partition: bool = True,
    max_versions_referenced: int = 2,
    cluster_by: list[str] | None = None,
) -> str | None:
    """Rewrite fragmented partitions of a PARTITIONED snapshot into a
    fresh version (Iceberg ``rewrite_data_files`` / Delta ``OPTIMIZE``)
    — the maintenance op that bounds the pruned-MERGE reference spread
    (module docstring).

    Default scope: every partition whose data lives OUTSIDE the live
    version (``partition_values`` narrows it — e.g. compact only cold
    partitions, or spread the rewrite over several maintenance
    windows).  Partitions already resident in the live version carry
    forward by reference, so the new manifest points into at most
    {new, previous-live}; once pre-compaction versions rotate out of
    ``keep``, GC reclaims every older dir.  Returns the new version
    name, or ``None`` (and publishes NOTHING) when there is nothing
    worth doing — an idempotent no-op, safe on a schedule.

    "Worth doing" (default scope) means the live manifest references
    MORE than ``max_versions_referenced`` version dirs.  Post-compaction
    state always references ≤ 2 ({new, previous-live}), so with the
    default threshold a scheduled compactor converges: it runs when
    merges have spread the table past the bound and then no-ops until
    they do again.  Without the threshold every run would re-rewrite
    the previously-carried half of a QUIET table forever (each compact
    makes the old live version's residents the next run's "fragmented"
    set — an alternating full-table rewrite disguised as maintenance).
    An explicit ``partition_values`` scope bypasses the threshold: the
    caller asked for those partitions specifically (e.g. to consolidate
    one partition's small files), and the no-op condition is just
    "none of them is carried".

    ``one_file_per_partition`` additionally hash-partitions the rewrite
    by the partition column, so each rewritten partition lands as a
    single file — the small-files consolidation half of OPTIMIZE.
    Leave it False when compacting partitions too large for one task
    (the write then inherits the plan's parallelism).

    ``cluster_by`` sorts each rewritten partition's rows by the given
    columns before writing — linear (1-D) clustering, the ``OPTIMIZE
    ZORDER BY`` idea in the form that covers the dominant
    single-range-scan case.  Sorted files give parquet MONOTONE
    row-group min/max on the cluster column, so Spark's native
    row-group pruning (filter pushdown) skips most of a file on a
    range predicate — sub-partition skipping that composes with the
    manifest zone maps above it (partition level) with zero extra
    metadata.  Content is provably order-insensitive (snapshot reads
    have no row-order contract, and the driver hash canonicalizes), so
    clustering is free to apply on any maintenance pass; rows move at
    most within their partition's rewrite task.  For genuinely
    multi-column locality, interleave the dimensions into one column
    via ``functions.layout.cluster_key`` — it encodes the measured
    which-curve decision rule (SCALE.md: Hilbert for box probes,
    Morton for leading-dimension bands or read-time-cheap keys)::

        from etl_pulumi_aws_snowflake_spark.functions.layout import cluster_key
        snapshot_compact(spark, root, cluster_by=[
            cluster_key([("user_id", 0, 10_000), ("event_id", 0, 1_000_000)])
        ])

    Content is untouched: a read after compaction returns exactly the
    rows it returned before (the driver-hashed ``cdc_merge_compact_e2e``
    entry and the tests pin this), and carried-forward partitions keep
    their bytes.  At 100 TB the cost is Σ|fragmented partitions| — the
    same unit of work as the pruned MERGE that created the
    fragmentation, amortized over however many batches ran between
    compactions."""
    fs = fs or DEFAULT_FS
    live = _current_version(root, fs)
    if live is None:
        raise ValueError(f"no snapshot committed at {root}")
    man = _read_manifest(root, live, fs)
    if man is None:
        raise ValueError(
            "snapshot_compact applies to partitioned snapshots; this root's "
            "live version has no manifest (commit with "
            "snapshot_commit_partitioned first)"
        )
    fragmented = [v for v, ver in man["entries"].items() if ver != live]
    if partition_values is not None:
        wanted = {str(x) for x in partition_values}
        fragmented = [v for v in fragmented if v in wanted]
    elif len(set(man["entries"].values())) <= max_versions_referenced:
        return None  # within bound — see "worth doing" above
    if not fragmented:
        return None
    pcol = man["partition_col"]
    # Pin the read to the manifest `fragmented` was derived from (same
    # discipline as merge_upsert_pruned): read, changed_values, and the
    # commit's expected_current token all describe one version.
    df = snapshot_read(
        spark, root, partition_values=fragmented, fs=fs, version=live
    )
    if one_file_per_partition:
        df = df.repartition(F.col(pcol))
    if cluster_by:
        # Sort by (partition col, cluster cols): a task may hold rows
        # of several partitions; leading with pcol keeps each
        # partition's slice contiguous and cluster-sorted, so every
        # written file is monotone in the cluster columns.
        df = df.sortWithinPartitions(pcol, *cluster_by)
    return snapshot_commit_partitioned(
        df,
        root,
        pcol,
        changed_values=fragmented,
        keep=keep,
        fs=fs,
        expected_current=live,
    )
