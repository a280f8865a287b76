#!/usr/bin/env python3
"""A/B: JVM split/filter featurization vs mapInArrow + pyarrow.compute.

Closes the round-12 "Not yet optimized" item 2 with a measurement. The
text family's per-row hot path (tx02/tx03/tx11 share it) is
``size(filter(split(text,' '), ...))`` + vocab-membership counts — all
JVM whole-stage-codegen. Guide §4.2 hypothesizes an Arrow-native batch
path (``mapInArrow`` handing whole record batches to
``pyarrow.compute``) can beat JVM expression chains on bulk string
work. The repo's guardrail (zero Python-eval nodes in registered text
plans) encodes the r2–r3 finding that the Python boundary LOST; this
experiment re-tests with Arrow batches and vectorized kernels instead
of the r2-era row path.

Method: same process, alternating arms, N reps each, noop sink,
statistics.median reported. Which arm leads alternates with the rep
index (even reps JVM-first, odd reps Arrow-first) so neither arm
systematically inherits the other's cache/GC shadow — the r12 run used
a fixed JVM-first order, which the round-12 ADVICE flagged as a mild
bias; both arms project only (doc_id, text) before
the featurization and compute IDENTICAL outputs (word_count,
stopword_count, 4 language-marker scores), verified row-equal before
timing. md5 fingerprinting is excluded from both arms (it stays JVM
either way — pyarrow has no md5 kernel).

Usage: python scripts/exp_text_arrow.py [--dir /tmp/sf10] [--reps 5]
Prints a JSON line; exits nonzero on any output mismatch.
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402
import pyarrow as pa  # noqa: E402
import pyarrow.compute as pc  # noqa: E402

from _provenance import provenance  # noqa: E402

from product_data_pipelining_spark.io import load_table  # noqa: E402
from product_data_pipelining_spark.session import get_spark  # noqa: E402
from product_data_pipelining_spark.operators.textops import (  # noqa: E402
    LANG_MARKERS,
    STOPWORDS,
    marker_score,
    tokens,
)

OUT_SCHEMA = (
    "doc_id BIGINT, word_count BIGINT, stopword_count BIGINT, "
    "s_en BIGINT, s_de BIGINT, s_fr BIGINT, s_es BIGINT"
)


def jvm_arm(docs):
    from pyspark.sql import functions as F

    toks = tokens()
    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("word_count"),
        marker_score(toks, STOPWORDS).cast("long").alias("stopword_count"),
        *[
            marker_score(toks, LANG_MARKERS[lang]).cast("long").alias(f"s_{lang}")
            for lang in ("en", "de", "fr", "es")
        ],
    )


def arrow_arm(docs):
    # closure (pickled by value — workers lack the repo on PYTHONPATH)
    stop_set = pa.array(list(STOPWORDS))
    marker_sets = {k: pa.array(list(v)) for k, v in LANG_MARKERS.items()}

    def featurize(batches):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        for batch in batches:
            text = batch.column("text")
            toks = pc.split_pattern(text, " ")
            arr = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
            offsets = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            flat = arr.values
            lo, hi = offsets[:-1], offsets[1:]

            def seg_count(mask_arr):
                m = mask_arr.to_numpy(zero_copy_only=False).astype(np.int64)
                cs = np.concatenate(([0], np.cumsum(m)))
                return cs[hi] - cs[lo]

            nonempty = pc.not_equal(flat, "")
            cols = {
                "doc_id": batch.column("doc_id"),
                "word_count": pa.array(seg_count(nonempty)),
                "stopword_count": pa.array(
                    seg_count(pc.is_in(flat, value_set=stop_set))
                ),
            }
            for lang, vs in marker_sets.items():
                cols[f"s_{lang}"] = pa.array(
                    seg_count(pc.is_in(flat, value_set=vs))
                )
            yield pa.RecordBatch.from_pydict(cols)

    return docs.mapInArrow(featurize, OUT_SCHEMA)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/sf10")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    spark = get_spark()
    docs = load_table(spark, args.dir, "documents").select("doc_id", "text")

    a, b = jvm_arm(docs), arrow_arm(docs)

    # equality gate before timing
    pa_rows = sorted(map(tuple, a.collect()))
    pb_rows = sorted(map(tuple, b.collect()))
    if pa_rows != pb_rows:
        print(json.dumps({"metric": "exp_text_arrow", "error": "MISMATCH"}))
        raise SystemExit(1)

    for df in (a, b):  # warm
        noop(df)

    t = {"jvm": [], "arrow": []}
    arms = (("jvm", a), ("arrow", b))
    for rep in range(args.reps):
        # alternate the leading arm per rep (see module docstring)
        order = arms if rep % 2 == 0 else arms[::-1]
        for name, df in order:
            spark.sparkContext.setJobDescription(f"exp_text_arrow:{name}")
            t0 = time.monotonic()
            noop(df)
            t[name].append(round(time.monotonic() - t0, 3))
    spark.sparkContext.setJobDescription(None)

    med = {k: round(statistics.median(v), 3) for k, v in t.items()}
    print(
        json.dumps(
            {
                "metric": "exp_text_arrow",
                "dir": args.dir,
                "rows": docs.count(),
                "reps": args.reps,
                "samples": t,
                "median_sec": med,
                "arrow_over_jvm": round(med["arrow"] / med["jvm"], 3),
                "outputs_equal": True,
                "provenance": provenance(),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
