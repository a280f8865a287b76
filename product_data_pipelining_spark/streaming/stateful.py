"""Custom stateful streaming operators (applyInPandasWithState).

The reference has no streaming surface (SURVEY.md §2.10); these are the
north-star extensions a continuously-ingesting corpus pipeline needs:
arbitrary per-key state that Spark's built-in windowed aggregations
can't express (e.g. emit a session the moment it *closes*, carry
open-session state across micro-batches), and streaming dedup with
bounded state.

Scale design: state lives in the state store keyed by user — shuffles
once per micro-batch on the grouping key, state size O(open sessions),
Arrow-batched transfer both ways. The UDF is defined as a closure so it
pickles by value (executors may not have the repo on PYTHONPATH).
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Iterable

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

if TYPE_CHECKING:
    import pandas as pd

SESSION_GAP_SECONDS = 1800


def stateful_sessionize(events_stream: DataFrame, gap_s: int = SESSION_GAP_SECONDS) -> DataFrame:
    """Gap sessionization with explicit per-user state, emitted on close.

    Unlike ``F.session_window`` (which emits only when the watermark
    passes), this emits a session row the moment an event arrives more
    than ``gap_s`` after the previous one — the open session rides in
    the state store between micro-batches. Input needs
    (user_id, ts timestamp, value double).
    """
    out_schema = (
        "user_id long, session_start timestamp, session_end timestamp, "
        "n_events long, total_value double"
    )
    # open-session accumulator: epoch-us bounds + count + sum
    state_schema = "start_us long, end_us long, n long, total double"

    def emit_closed(  # closure: pickled by value, no repo import on workers
        key: tuple,
        pdfs: Iterable["pd.DataFrame"],
        state: GroupState,
    ) -> Iterable["pd.DataFrame"]:
        import pandas as pd

        gap_us = gap_s * 1_000_000
        (user_id,) = key
        if state.exists:
            start_us, end_us, n, total = state.get
        else:
            start_us = end_us = -1
            n, total = 0, 0.0
        rows = []
        ev = pd.concat(list(pdfs)).sort_values("ts")
        for ts, value in zip(ev["ts"], ev["value"]):
            ts_us = int(ts.value // 1_000)  # pandas Timestamp is ns
            if n and ts_us - end_us > gap_us:
                rows.append((user_id, start_us, end_us, n, total))
                n, total = 0, 0.0
            if n == 0:
                start_us = ts_us
            end_us = max(end_us, ts_us) if n else ts_us
            n += 1
            total += float(value)
        state.update((start_us, end_us, n, total))
        out = pd.DataFrame(
            rows,
            columns=["user_id", "session_start", "session_end", "n_events", "total_value"],
        )
        if len(out):
            out["session_start"] = pd.to_datetime(out["session_start"], unit="us")
            out["session_end"] = pd.to_datetime(out["session_end"], unit="us")
            out["total_value"] = out["total_value"].round(2)
        yield out

    return events_stream.groupBy("user_id").applyInPandasWithState(
        emit_closed,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_dedup(events_stream: DataFrame, keys: list[str], ts_col: str = "ts",
                    watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup with bounded state.

    ``dropDuplicatesWithinWatermark`` keeps each key only as long as the
    watermark requires — state is O(keys per watermark window), not
    O(all keys ever), which is what makes exact dedup viable on an
    unbounded stream.
    """
    return events_stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        keys
    )


def foreach_batch_upsert(
    stream_df, target_path: str, keys: list[str], order_col: str,
    target: "object | None" = None,
):
    """Streaming upsert sink: foreachBatch + last-writer-wins merge.

    The streaming twin of the reference's ``INSERT OR REPLACE`` load
    path (``main_pipeline.py:326-352``): each micro-batch is merged
    into the target keyed on ``keys``, newest ``order_col`` winning.
    foreachBatch gives the batch DataFrame API inside a stream — the
    standard way to run a MERGE against a store with no native
    streaming sink.

    The merge itself goes through the :class:`operators.upsert
    .UpsertTarget` seam: by default a ``ParquetUpsertTarget`` at
    ``target_path`` (crash-safe stage-and-swap full rewrite — correct
    anywhere, right-sized for marts and tests); pass
    ``target=DeltaUpsertTarget(spark, path)`` on a Delta-enabled
    cluster to get a transactional MERGE INTO whose cost scales with
    the batch instead of the target — the 100 TB path. Any merge
    error PROPAGATES so foreachBatch fails and the checkpoint retries
    the batch; swallowing it would silently drop data.

    Returns the StreamingQuery; callers own awaitTermination.
    """

    def _merge(batch_df, batch_id: int) -> None:
        from ..operators.upsert import ParquetUpsertTarget

        tgt = target
        if tgt is None:
            tgt = ParquetUpsertTarget(batch_df.sparkSession, target_path)
        tgt.merge(batch_df, keys, order_col)

    return (
        stream_df.writeStream.foreachBatch(_merge)
        .trigger(availableNow=True)
        .option("checkpointLocation", target_path + "_ckpt")
        .start()
    )
