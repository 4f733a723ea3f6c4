"""Driver-checkable stateful-streaming queries (SURVEY.md §2.9).

Stateful dedup across arrivals and the stream-stream interval join
previously had only pytest stream==batch evidence ("pass-local" in
VERDICT r03).  Each entry here runs a TRUE StreamingQuery —
``Trigger.AvailableNow`` over deterministically derived files, exactly
the pattern proven by ``pipeline_stream_e2e`` — inside the registry
callable, then returns the materialized sink so the driver hash-compares
the streaming result against the batch-twin SQL oracle.

Determinism under arbitrary microbatching:

- **dedup**: the same event file arrives twice (two files, and
  ``maxFilesPerTrigger=1`` forces two microbatches so the dedup state
  genuinely crosses a batch boundary).  Duplicate rows are identical,
  so whichever occurrence survives, the output set is exactly the
  distinct input — batch-order-independent.
- **interval join**: a stream-stream INNER join's match set is a pure
  function of the two input sets (watermarks bound state, they don't
  filter an AvailableNow run whose data all arrives before the final
  watermark advance) — so the emitted set equals the batch join however
  the files are batched.

The remaining §2.9 rows — watermark late-data discard and checkpoint
replay idempotence — are semantics about the INTERACTION of multiple
runs/arrival orders, which a single finite driver query cannot express;
they stay pytest-verified (``tests/test_streaming.py``,
``tests/test_pipeline.py``).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from .. import schemas
from ._util import t
from .pipeline_e2e import _workdir
from .registry import query

_EVENT_COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]

#: State-store instances per stateful stream = shuffle partitions at
#: stream start; bounded e2e runs need few (see _run_to_parquet).
_MAX_STATE_PARTITIONS = 32


def _run_to_parquet(stream_df, outdir: str, ckpt: str) -> None:
    """Drive a streaming DataFrame to a parquet dir via foreachBatch +
    AvailableNow (the reference's process-what-landed-then-stop
    semantics, ``modules/snowflake.py:158-178``).

    Stateful operators allocate one state-store instance per shuffle
    partition at stream START, so a driver session's batch-oriented
    partition count (e.g. 200) would mean 200 state stores for a
    bounded 10k-row run — pure task overhead.  Cap it for the stream's
    lifetime and restore the caller's setting after (result sets here
    are partition-count-independent; on a real cluster a continuous job
    sizes this to input rate × state retention instead).

    SINGLE-SHOT, FRESH-CHECKPOINT ONLY: the foreachBatch append has no
    epoch idempotence, so restarting a crashed run against the same
    checkpoint could replay the last uncommitted batch and double-append.
    Safe here because every caller builds ``outdir``/``ckpt`` under a
    freshly-reset workdir (``_workdir`` rmtree's it); a restartable
    production sink writes epoch-keyed subdirs (overwrite mode on
    ``outdir/epoch=N``) instead — see ``streaming/cdc.py`` for the
    idempotent-merge form."""
    spark = stream_df.sparkSession
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(min(int(prev), _MAX_STATE_PARTITIONS))
    )
    try:

        def sink(batch_df, _epoch_id: int) -> None:
            batch_df.write.mode("append").parquet(outdir)

        q = (
            stream_df.writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


_DEDUP_ORACLE = """
    SELECT event_id, ts, user_id, event_type, value, props
    FROM events
"""


@query("stream_stateful_dedup_e2e", oracle=_DEDUP_ORACLE)
def stream_stateful_dedup_e2e(spark, sf_dir):
    """Cross-microbatch stateful dedup under the driver hash: the full
    events table lands twice (two files → two microbatches via
    ``maxFilesPerTrigger=1``), streams through the watermarked
    ``dropDuplicates`` state store, and the sink must contain each
    event exactly once — i.e. equal the plain ``events`` table."""
    from ..streaming.windows import dedup_stream

    work = _workdir(sf_dir, "stateful_dedup")
    landing = os.path.join(work, "arrivals")
    events = t(spark, sf_dir, "events").select(*_EVENT_COLS)
    # The oracle is plain SELECT * FROM events, which equals the
    # deduped stream ONLY while event_id is unique in the fixture —
    # pin that assumption so a future FIXTURES change fails loudly
    # here instead of silently weakening the entry (VERDICT r04 nit).
    n, nd = events.agg(
        F.count("event_id"), F.count_distinct("event_id")
    ).first()
    assert n == nd, (
        f"stream_stateful_dedup_e2e oracle assumes unique event_id; "
        f"fixture has {n} rows / {nd} distinct ids — update the oracle "
        "to SELECT DISTINCT-by-id semantics before trusting this entry"
    )
    events.coalesce(1).write.parquet(landing)
    events.coalesce(1).write.mode("append").parquet(landing)

    stream = (
        spark.readStream.schema(schemas.EVENTS)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
    )
    outdir = os.path.join(work, "out")
    _run_to_parquet(
        dedup_stream(stream, ["event_id"]), outdir, os.path.join(work, "ckpt")
    )
    return spark.read.parquet(outdir).select(*_EVENT_COLS)


_SSJOIN_ORACLE = """
    SELECT l.user_id,
           l.event_id AS l_event_id,
           r.event_id AS r_event_id,
           l.ts AS l_ts,
           r.ts AS r_ts
    FROM events l
    JOIN events r
      ON l.user_id = r.user_id
     AND l.event_type = 'signup'
     AND r.event_type = 'purchase'
     AND r.ts >= l.ts
     AND r.ts <= l.ts + INTERVAL 30 MINUTE
"""


@query("stream_interval_join_e2e", oracle=_SSJOIN_ORACLE)
def stream_interval_join_e2e(spark, sf_dir):
    """Stream-stream interval join under the driver hash: signups and
    purchases arrive on two independent file streams, both sides buffer
    in the state store, and purchases within 30 minutes of a same-user
    signup are emitted — compared against the identical batch interval
    join in SQL."""
    from ..streaming.joins import interval_join

    work = _workdir(sf_dir, "ssjoin")
    events = t(spark, sf_dir, "events").select(*_EVENT_COLS)
    sdir = os.path.join(work, "signups")
    pdir = os.path.join(work, "purchases")
    events.filter(F.col("event_type") == "signup").write.parquet(sdir)
    events.filter(F.col("event_type") == "purchase").write.parquet(pdir)

    ls = spark.readStream.schema(schemas.EVENTS).parquet(sdir)
    rs = spark.readStream.schema(schemas.EVENTS).parquet(pdir)
    outdir = os.path.join(work, "out")
    _run_to_parquet(
        interval_join(ls, rs, "user_id"), outdir, os.path.join(work, "ckpt")
    )
    return spark.read.parquet(outdir).select(
        "user_id", "l_event_id", "r_event_id", "l_ts", "r_ts"
    )
