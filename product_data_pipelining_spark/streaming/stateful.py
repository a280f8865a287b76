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
    stream_df, target_path: str, keys: list[str], order_col: str
):
    """Streaming upsert sink: foreachBatch + last-writer-wins merge.

    The streaming twin of the reference's ``INSERT OR REPLACE`` load
    path (``main_pipeline.py:326-352``): each micro-batch is merged
    into the parquet target keyed on ``keys``, newest ``order_col``
    winning. foreachBatch gives the batch DataFrame API (joins, window
    dedup, arbitrary writers) inside a stream — the standard way to run
    a MERGE against a store with no native streaming sink. The target
    rewrite is full-file here; on a real lake the same callback body
    becomes a Delta/Iceberg MERGE INTO, keyed identically.

    Returns the StreamingQuery; callers own awaitTermination.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    from pyspark.sql.types import MapType

    SRC = "__pdp_src__"
    RN = "__pdp_rn__"

    def _merge(batch_df, batch_id: int) -> None:
        spark = batch_df.sparkSession
        # All existence / delete / rename operations go through the
        # Hadoop FS API, so the swap protocol below works on any
        # supported scheme (file://, s3a://, ...), not just the local
        # filesystem. A transient read failure (permissions blip,
        # eventual consistency, corrupt footer) must PROPAGATE so
        # foreachBatch fails and the checkpoint retries the batch;
        # swallowing it would silently replace the whole target with
        # one micro-batch.
        jvm = spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(target_path)
        stage_path = target_path + "_next"
        hstage = jvm.org.apache.hadoop.fs.Path(stage_path)
        fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
        # Crash recovery: a death between delete(target) and
        # rename(stage, target) leaves a COMPLETE merged result in the
        # stage dir and no target. Promote it before merging, so the
        # replayed batch merges against the preserved history instead
        # of treating itself as the first batch (which would overwrite
        # the stage dir and silently lose everything before this
        # batch). A *partial* stage dir is unreachable in this state:
        # the stage write only runs while the target still exists.
        if not fs.exists(hpath) and fs.exists(hstage):
            fs.rename(hstage, hpath)
        for c in (SRC, RN):
            if c in batch_df.columns:
                raise ValueError(
                    f"foreach_batch_upsert: input must not contain "
                    f"reserved column {c!r}"
                )
        batch_df = batch_df.withColumn(SRC, F.lit(1))
        if fs.exists(hpath):
            existing = spark.read.parquet(target_path).withColumn(
                SRC, F.lit(0)
            )
            combined = existing.unionByName(batch_df)
        else:
            combined = batch_df
        # Tiebreak beyond order_col: the incoming batch beats the
        # stored row (SRC desc — a replayed batch re-applies
        # idempotently), then every remaining *orderable* column, so
        # the kept row is a pure function of the data, not of task
        # scheduling. Map columns are excluded (Spark cannot sort
        # them); ties that differ only in a map column fall back to
        # the SRC ordering, which is still deterministic per replay.
        fields = {f.name: f.dataType for f in combined.schema.fields}
        rest = [
            c
            for c in combined.columns
            if c not in (*keys, order_col, SRC)
            and not isinstance(fields[c], MapType)
        ]
        w = Window.partitionBy(*keys).orderBy(
            F.col(order_col).desc(),
            F.col(SRC).desc(),
            *[F.col(c).desc() for c in rest],
        )
        deduped = (
            combined.withColumn(RN, F.row_number().over(w))
            .filter(F.col(RN) == 1)
            .drop(RN, SRC)
        )
        # Stage-and-swap: write the merged result beside the target,
        # then delete + rename through the same FS handle. The target
        # is never the write destination, so a mid-write failure
        # leaves it intact; the only vulnerable window (between delete
        # and rename) is covered by the promotion above. On a real
        # lake this whole body becomes a Delta/Iceberg MERGE INTO and
        # the swap disappears.
        deduped.write.mode("overwrite").parquet(stage_path)
        fs.delete(hpath, True)
        if not fs.rename(hstage, hpath):
            raise IOError(
                f"foreach_batch_upsert: rename {stage_path} -> "
                f"{target_path} failed; stage dir preserved for the "
                "checkpoint retry's promotion path"
            )

    return (
        stream_df.writeStream.foreachBatch(_merge)
        .trigger(availableNow=True)
        .option("checkpointLocation", target_path + "_ckpt")
        .start()
    )
