"""End-to-end curation funnel: the composed training-data pipeline.

Every stage here exists as a standalone operator (tx02 quality gates,
dd02/dd04 near-dup, dd07 decontamination, smp01 hash split); this module
pins the COMPOSITION — one query that takes the raw document pool to a
training-ready kept set with first-failing-stage attribution per
document, the shape a real curation run reports to its owners.

Stage order (first failure wins, later stages only see survivors):

1. ``quality``       — token-count floor (tx02's gate family)
2. ``duplicate``     — near-duplicate loser (exact n-gram Jaccard,
                       dd02 semantics; the larger doc_id of a pair drops)
3. ``contaminated``  — shares >= 2 shingles with the benchmark slice
                       (dd07 semantics, benchmark = doc_id % 97 == 0)
4. ``holdout``       — md5-of-key eval split (smp01 semantics)
5. ``kept``          — survives everything: the training set

Scale note: the registered pipe01 uses the EXACT shingle-join pair
stage (dd02) because the funnel's oracle must be SQL-expressible
end-to-end; ``curation_funnel(..., pair_stage="lsh")`` swaps in dd04's
banded MinHash-LSH pair generator (same (doc_a, doc_b) interface,
bucketed instead of quadratic in shared-shingle groups) — the
executable 100 TB path, pinned frame-equal to the exact mode on the
gate fixtures by ``tests/test_plans.py``. Everything else is already
the scale shape: shingle equi-joins, size-aware benchmark-set and
flag-set join hints, hash-split projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import broadcast_or_shuffle_hash, load_table, parallelize_scan
from ..registry import register
from .dedup import (
    _CONTAM_MIN_SHARED,
    _SQL_SHINGLES,
    _SQL_TOKS,
    JACCARD_THRESHOLD,
    LSH_MAX_BUCKET,
    minhash_lsh_pairs,
    shingles,
)
from .textops import tokens

PIPE_WC_MIN = 15  # quality gate: drops the short tail (~5% here)
PIPE_HOLDOUT_NIBBLE = "f"  # md5 first hex char -> ~1/16 eval holdout

# --- pipe01's two oracle forms -------------------------------------------
#
# `oracle` (the registered single statement, used by the driver gate and
# every local sweep) expresses the exact pair stage as one self-join +
# aggregation — readable, and fine at the gate SFs.
#
# `oracle_stage` (used ONLY by scripts/scale_probe.py's out-of-process
# staging) sequences the SAME pair aggregation in doc_a % N chunks via
# TEMP TABLE inserts, because at sf10 the fixtures' 31-word vocab makes
# every 3-gram shingle hot (27k distinct shingles x ~700 docs each ->
# 6.5B joined pair rows, ~2B distinct pairs) and DuckDB cannot bound a
# single statement's memory: one hash aggregation over the full pair
# space outspilled the probe box's disk; a UNION ALL of chunks schedules
# its independent child pipelines CONCURRENTLY (measured: 4 parallel
# chunks spilled 63 GB where one chunk spills nothing); and a recursive
# CTE gets decorrelated back into a flat plan with the same footprint.
# Statements are the only reliable sequencing boundary, so the chunks
# live across statements. Values are identical (the chunk key is the
# GROUP BY key's first column); `tests/test_plans.py::
# test_pipe01_staged_oracle_matches_plain` pins the two forms equal on
# the gate fixtures. Spark needs no such split — its map-side partial
# aggregation collapses pair multiplicity before the exchange and its
# hash aggregation spills.
_PIPE_ORACLE_CHUNKS = 16

# a pair can only reach JACCARD_THRESHOLD if it shares at least
# t/(1+t) * (na+nb) shingles; na+nb >= 2*min(nsh) over the corpus, so
# a COUNT floor of 2*min_nsh*t/(1+t) (evaluated as a scalar subquery)
# prunes the shared=1..k tail — the overwhelming bulk of hot-shingle
# pairs — without changing any surviving value.
_PIPE_SHARED_FLOOR = (
    f"COUNT(*) * ({1 + JACCARD_THRESHOLD}) >= "
    f"{2 * JACCARD_THRESHOLD} * (SELECT MIN(nsh) FROM pipe01_sizes)"
)

_PIPE_BASE_CTES = f"""
    WITH wcd AS (
      SELECT doc_id, lang, source, {_SQL_TOKS} AS t,
             CAST(len({_SQL_TOKS}) AS BIGINT) AS wc
      FROM documents WHERE doc_id % 97 <> 0
    ),
    sh AS (
      SELECT doc_id, {_SQL_SHINGLES} AS shingles
      FROM wcd WHERE wc >= {PIPE_WC_MIN}
    )"""

# the funnel's tail (benchmark shingles, contamination, stage CASE) —
# shared verbatim by both oracle forms, parameterized on where `dupes`
# comes from
_PIPE_TAIL = f"""
    bsh AS (
      SELECT DISTINCT unnest({_SQL_SHINGLES}) AS s
      FROM (SELECT {_SQL_TOKS} AS t FROM documents WHERE doc_id % 97 = 0)
    ),
    ex AS (
      SELECT doc_id, unnest(shingles) AS s FROM sh
    ),
    contam AS (
      SELECT ex.doc_id FROM ex JOIN bsh ON ex.s = bsh.s
      WHERE ex.doc_id NOT IN (SELECT doc_id FROM dupes)
      GROUP BY ex.doc_id
      HAVING COUNT(*) >= {_CONTAM_MIN_SHARED}
    )
    SELECT w.doc_id, w.lang, w.source, w.wc,
           CASE
             WHEN w.wc < {PIPE_WC_MIN} THEN 'quality'
             WHEN w.doc_id IN (SELECT doc_id FROM dupes) THEN 'duplicate'
             WHEN w.doc_id IN (SELECT doc_id FROM contam)
               THEN 'contaminated'
             WHEN substr(md5(CAST(w.doc_id AS VARCHAR)), 1, 1)
                  = '{PIPE_HOLDOUT_NIBBLE}' THEN 'holdout'
             ELSE 'kept'
           END AS stage
    FROM wcd w
    """

_PIPE_ORACLE_PLAIN = (
    _PIPE_BASE_CTES
    + f""",
    exn AS (
      SELECT doc_id, unnest(shingles) AS s, len(shingles) AS nsh FROM sh
    ),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             count(*) AS shared,
             any_value(a.nsh) AS na, any_value(b.nsh) AS nb
      FROM exn a JOIN exn b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ),
    dupes AS (
      SELECT DISTINCT doc_b AS doc_id FROM pairs
      WHERE shared * 1.0 / (na + nb - shared) >= {JACCARD_THRESHOLD}
    ),
"""
    + _PIPE_TAIL
)

_PIPE_ORACLE_STAGE = (
    # bounded prep: quality-gated shingle lists, sizes, exploded grams
    f"""CREATE OR REPLACE TEMP TABLE pipe01_sh AS {_PIPE_BASE_CTES}
        SELECT doc_id, shingles FROM sh""",
    """CREATE OR REPLACE TEMP TABLE pipe01_sizes AS
       SELECT doc_id, len(shingles) AS nsh FROM pipe01_sh""",
    """CREATE OR REPLACE TEMP TABLE pipe01_exi AS
       SELECT doc_id, unnest(shingles) AS s FROM pipe01_sh""",
    "CREATE OR REPLACE TEMP TABLE pipe01_dup (doc_id BIGINT)",
    # one statement per doc_a chunk: peak memory = one chunk's pair agg
    *(
        f"""INSERT INTO pipe01_dup
            SELECT DISTINCT p.doc_b
            FROM (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     count(*) AS shared
              FROM pipe01_exi a JOIN pipe01_exi b
                ON a.s = b.s AND a.doc_id < b.doc_id
              WHERE a.doc_id % {_PIPE_ORACLE_CHUNKS} = {k}
              GROUP BY a.doc_id, b.doc_id
              HAVING {_PIPE_SHARED_FLOOR}
            ) p
            JOIN pipe01_sizes sa ON sa.doc_id = p.doc_a
            JOIN pipe01_sizes sb ON sb.doc_id = p.doc_b
            WHERE p.shared * 1.0 / (sa.nsh + sb.nsh - p.shared)
                  >= {JACCARD_THRESHOLD}"""
        for k in range(_PIPE_ORACLE_CHUNKS)
    ),
    # final: the shared funnel tail over the pre-sequenced dup set
    _PIPE_BASE_CTES
    + """,
    dupes AS (SELECT DISTINCT doc_id FROM pipe01_dup),
"""
    + _PIPE_TAIL,
)


@register(
    "pipe01_curation_funnel",
    oracle=_PIPE_ORACLE_PLAIN,
    oracle_stage=_PIPE_ORACLE_STAGE,
)
def pipe01_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-compat funnel: exact pair stage (see curation_funnel).

    The exact pair stage is the funnel's ground-truth baseline (sim01's
    role in the ANN ladder): every pair, no recall question — and
    quadratic in shared-shingle group sizes, so its corpus-scale cost
    is a full pair-multiset exchange (~2B distinct pairs / ~50 GB+ of
    shuffle at sf10 on the fixtures' 31-word vocab — fine on a
    cluster's distributed scratch, beyond a single box's disk, in
    EITHER engine: DuckDB's oracle needs the sequenced chunk staging
    above). Value-verified at sf0.001-0.1 (driver gate + sweep) and
    sf1 (scale probe); ``pipe02_curation_funnel_lsh`` is the
    at-scale-benchmarked production path.
    """
    return curation_funnel(spark, sf_dir, pair_stage="exact")


# pipe02's oracle: the SAME funnel with dd04's banded MinHash-LSH pair
# stage (md5 band keys — reproducible in DuckDB; max_bucket=None is the
# oracle-compat cap mode, dd04's convention). The only oracle difference
# from pipe01 is where `dupes` comes from: banded candidates verified by
# exact Jaccard instead of the full exact pair multiset.
def _pipe02_oracle() -> str:
    from .dedup import _SLICE_LEN, _SLICE_OFFSETS, NUM_BANDS

    mins = ",\n             ".join(
        f"min(substr(md5(s), {o}, {_SLICE_LEN})) AS h{j}"
        for j, o in enumerate(_SLICE_OFFSETS)
    )
    band_case = " ".join(
        f"WHEN {b} THEN md5(h{2 * b} || h{2 * b + 1})"
        for b in range(NUM_BANDS)
    )
    band_ids = ", ".join(map(str, range(NUM_BANDS)))
    return (
        _PIPE_BASE_CTES
        + f""",
    shx AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
    sig AS (
      SELECT doc_id,
             {mins}
      FROM shx GROUP BY doc_id
    ),
    bands AS (
      SELECT doc_id, b, CASE b {band_case} END AS band_key
      FROM sig CROSS JOIN (SELECT unnest([{band_ids}]) AS b)
    ),
    cand AS (
      SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
      FROM bands x JOIN bands y
        ON x.b = y.b AND x.band_key = y.band_key AND x.doc_id < y.doc_id
    ),
    exn AS (
      SELECT doc_id, unnest(shingles) AS s, len(shingles) AS nsh FROM sh
    ),
    verified AS (
      SELECT c.doc_a, c.doc_b, count(*) AS shared,
             any_value(a.nsh) AS na, any_value(b.nsh) AS nb
      FROM cand c
      JOIN exn a ON a.doc_id = c.doc_a
      JOIN exn b ON b.doc_id = c.doc_b AND b.s = a.s
      GROUP BY c.doc_a, c.doc_b
    ),
    dupes AS (
      SELECT DISTINCT doc_b AS doc_id FROM verified
      WHERE shared * 1.0 / (na + nb - shared) >= {JACCARD_THRESHOLD}
    ),
"""
        + _PIPE_TAIL
    )


@register("pipe02_curation_funnel_lsh", oracle=_pipe02_oracle())
def pipe02_curation_funnel_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production curation funnel: banded MinHash-LSH pair stage.

    The funnel users actually run at 100 TB: candidate pairs come from
    dd04's banded LSH buckets (cost scales with bucket occupancy, not
    corpus size — no corpus-scale pair exchange exists in the plan),
    verified by exact Jaccard before any document is dropped. Band
    keys are md5 (DuckDB-reproducible) with the oracle-compat uncapped
    bucket mode, so the whole funnel value-checks against SQL at every
    probe SF — including sf10, where pipe01's exact pair stage exceeds
    single-box scratch in both engines. Candidate recall is
    1-(1-j^r)^b with b=4 bands of r=2 rows: ≈ 1.0 at j >= 0.9, but
    only ≈ 0.68 AT the enforced ``JACCARD_THRESHOLD`` = 0.5 itself —
    borderline duplicates right at the bar can be missed, which is
    the LSH trade pipe01's exact stage does not make (the fixtures'
    dups sit at j >= 0.9, which is why the two modes pin frame-equal
    there; that equality is fixture-scoped, not a general claim).
    Pairs that do qualify carry exact Jaccard either way; tighten
    bands/rows if the corpus needs recall at j ≈ 0.5.
    """
    return curation_funnel(
        spark,
        sf_dir,
        pair_stage="lsh",
        lsh_hash_mode="md5",
        lsh_max_bucket=None,
    )


def curation_funnel(
    spark: SparkSession,
    sf_dir: str,
    pair_stage: str = "exact",
    lsh_hash_mode: str = "xxhash64",
    lsh_max_bucket: int | None = LSH_MAX_BUCKET,
) -> DataFrame:
    """Raw pool -> training set, with per-document drop attribution.

    One row per input document, ``stage`` naming the first gate it
    failed (or ``kept``). Composes the tested building blocks in their
    production order; because every stage is deterministic (token
    arithmetic, exact Jaccard rationals, md5 membership), the whole
    funnel carries a value oracle end-to-end.

    ``pair_stage``: ``"exact"`` (oracle-compat, dd02's shingle
    self-join — quadratic within shared-shingle groups) or ``"lsh"``
    (dd04's banded MinHash-LSH generator with the ``LSH_MAX_BUCKET``
    hot-bucket cap — the 100 TB path; candidate recall 1-(1-j^2)^4:
    ≈ 1.0 at j >= 0.9 where the fixtures' duplicates sit — hence the
    frame-equality pin on the gate fixtures — but ≈ 0.68 at the 0.5
    threshold boundary itself; the pin is fixture-scoped evidence,
    not general exact-vs-LSH frame equality).

    Plan shape: one scan of documents feeds the width/shingle
    projections; the pair stage is the only corpus-scale shuffle (a
    shingle self-equi-join, or LSH band buckets). The benchmark shingle
    set and the duplicate/contaminated flag sets join back through
    size-aware hints (``io.broadcast_or_shuffle_hash``): the dup set is
    one key per near-duplicate document — O(corpus) on a duplicate-heavy
    web crawl, NOT guaranteed small — so it broadcasts only while its
    base relation's stats stay under the session threshold and otherwise
    degrades to a bounded hash (or spillable sort-merge) join. No
    window, no driver collection.
    """
    if pair_stage not in ("exact", "lsh"):
        raise ValueError(f"pair_stage must be 'exact' or 'lsh': {pair_stage}")
    docs, wcd, sh, ex = _funnel_prelude(spark, sf_dir)
    if pair_stage == "exact":
        # _exact_pairs renames EVERY column on the right side of the
        # self-join so the equi-predicate can't resolve trivially-true
        # against shared names (round-5 sim07 lesson)
        pairs = _exact_pairs(ex)
    else:  # banded MinHash-LSH over the SAME quality-gated shingle frame
        pairs = minhash_lsh_pairs(
            spark,
            sf_dir,
            hash_mode=lsh_hash_mode,
            max_bucket=lsh_max_bucket,
            sh_arr=sh,
        )
    return _funnel_from_pairs(spark, docs, wcd, ex, pairs)


def _funnel_prelude(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """The shared pre-pair-stage frames: docs, wcd, sh, ex."""
    docs = parallelize_scan(
        load_table(spark, sf_dir, "documents"), force=True
    )
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    wcd = corpus.select(
        "doc_id",
        "lang",
        "source",
        tokens().alias("t"),
        F.size(tokens()).cast("long").alias("wc"),
    )
    # projection barrier: shingle arrays are expensive — materialize the
    # column once per row instead of letting CollapseProject inline the
    # expression into each downstream consumer (shingle_arrays' trick)
    sh = (
        wcd.filter(F.col("wc") >= PIPE_WC_MIN)
        .select("doc_id", shingles(F.col("t")).alias("sh"))
        .repartition("doc_id")
    )
    ex = sh.select(
        "doc_id", F.explode("sh").alias("s"), F.size("sh").alias("nsh")
    )
    return docs, wcd, sh, ex


def _exact_pairs(ex: DataFrame, a_pred=None) -> DataFrame:
    """dd02's exact shingle self-join pair stage, optionally restricted
    on the a-side (the chunk predicate — exact because (doc_a, doc_b)
    aggregation groups never cross doc_a chunks). ``a_pred`` references
    ``doc_id`` and is applied to ``ex`` BEFORE the doc_a-aliasing
    select, so it resolves against a column the frame actually exposes
    (filtering after the rename only worked via the analyzer's implicit
    missing-reference re-add on Filter — r10 ADVICE)."""
    a_src = ex if a_pred is None else ex.filter(a_pred)
    a = a_src.select(
        F.col("doc_id").alias("doc_a"),
        "s",
        F.col("nsh").alias("na"),
    )
    b = ex.select(
        F.col("doc_id").alias("doc_b"),
        F.col("s").alias("s_b"),
        F.col("nsh").alias("nb"),
    )
    return (
        a.join(
            b,
            (F.col("s") == F.col("s_b"))
            & (F.col("doc_a") < F.col("doc_b")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(
            F.count(F.lit(1)).alias("shared"),
            F.any_value(F.col("na")).alias("na"),
            F.any_value(F.col("nb")).alias("nb"),
        )
        .filter(
            F.col("shared")
            * 1.0
            / (F.col("na") + F.col("nb") - F.col("shared"))
            >= JACCARD_THRESHOLD
        )
    )


# auto-sizing granularity for pipe01_chunked: the doc_a space splits
# into this many fixed residue SUBCHUNKS; measured scratch from the
# first two jobs fits peak(g) ~= B + g*V (B = the constant b-side
# shingle exchange, V = one subchunk's share of the pair-aggregation
# spill) and the remaining residues run in groups of g sized to the
# budget. 48 is fine enough that one subchunk always fits any sane
# budget yet coarse enough that the two calibration jobs stay cheap.
_PIPE_SUBCHUNKS = 48
# target fraction of the scratch budget for a chunk-group's projected
# peak: headroom for the linear model's error and for the qualifying-
# pair parquet accumulating under the same budget
_PIPE_BUDGET_SAFETY = 0.5
# per-job footprint CAP (GB) below the budget target: the r11 sf10
# series measured wall-clock to be pair-aggregation-bound, not
# scan-bound — budget-maxed groups (20 GB target) completed in 904 s
# (25.3 GB peak) unbucketed / 939 s (27.0 GB) bucketed because a
# spilling hash aggregate's merge I/O grows superlinearly with group
# size, while ~5 GB jobs over the bucketed shingle table ran 709 s
# (vs the r10 fixed-16 mode's 749.5 s at 7.5 GB). The budget remains
# the hard ceiling; this cap keeps each job at the measured
# spill-optimal scale when the budget would allow far coarser groups.
_PIPE_JOB_SCRATCH_TARGET_GB = 5.0


def _du_bytes(paths: list[str]) -> int:
    import os

    total = 0
    for root in paths:
        if not os.path.isdir(root):
            continue
        for dirpath, _dirs, files in os.walk(
            root, onerror=lambda e: None
        ):
            for fn in files:
                try:
                    total += os.path.getsize(os.path.join(dirpath, fn))
                except OSError:
                    pass
    return total


def _spark_scratch_dirs(spark: SparkSession) -> list[str]:
    """The live executors' shuffle/spill directories (local mode)."""
    try:
        jdirs = (
            spark.sparkContext._jvm.org.apache.spark.SparkEnv.get()
            .blockManager().diskBlockManager().localDirs()
        )
        return [d.getAbsolutePath() for d in jdirs]
    except Exception:  # internals moved — auto-sizing degrades gracefully
        return []


def _await_scratch_drain(
    watch: list[str], timeout_sec: float = 10.0
) -> int:
    """Poll ``watch`` until the footprint stabilizes (two consecutive
    samples equal) or ``timeout_sec`` passes; return the settled bytes.

    The prior job's shuffle files are reclaimed ASYNCHRONOUSLY by the
    ContextCleaner: sampling the next job's start footprint while they
    are mid-delete inflates ``start`` and the deletions then deflate
    the observed peak growth, under-estimating V and over-sizing g
    (ADVICE r11). Waiting for a stable baseline makes the two
    calibration points measure only their own job's growth."""
    import time

    prev = _du_bytes(watch)
    deadline = time.monotonic() + timeout_sec
    while time.monotonic() < deadline:
        time.sleep(0.5)
        cur = _du_bytes(watch)
        if cur == prev:
            return cur
        prev = cur
    return prev


def _run_job_with_peak(run, watch: list[str]) -> int:
    """Execute ``run()`` while sampling ``watch`` dirs; return the peak
    GROWTH in bytes over the job's own starting footprint (so a prior
    job's not-yet-reclaimed shuffle files don't count twice). The
    footprint is sampled only after it stabilizes — see
    :func:`_await_scratch_drain`."""
    import threading
    import time

    start = _await_scratch_drain(watch)
    state = {"done": False, "peak": start}

    def sample():
        while not state["done"]:
            state["peak"] = max(state["peak"], _du_bytes(watch))
            time.sleep(0.25)

    t = threading.Thread(target=sample, daemon=True)
    t.start()
    try:
        run()
    finally:
        state["done"] = True
        t.join(timeout=5)
    return max(0, state["peak"] - start)


def pipe01_chunked(
    spark: SparkSession,
    sf_dir: str,
    chunks: int | None = None,
    scratch_dir: str | None = None,
    scratch_budget_gb: float = 40.0,
) -> DataFrame:
    """Sequenced exact funnel: the Spark mirror of the DuckDB staging
    oracle's doc_a-chunk INSERTs (``oracle_stage`` above).

    pipe01's single-plan exact pair stage materializes the full pair
    multiset into ONE shuffle — measured 40.2 GB of scratch at sf10
    before the exclusion probe's disk watchdog killed it
    (PIPE01_SF10_EXCLUSION.json), while DuckDB completes the same
    funnel only by sequencing 16 chunk statements. Spark's equivalent
    sequencing boundary is the JOB: a lazy UNION of chunk plans would
    execute every chunk concurrently in one job (DuckDB's measured
    UNION-ALL failure mode — 4 parallel chunks spilled 63 GB where one
    spills nothing), so each ``doc_a % chunks`` slice runs as its own
    ACTION writing only its QUALIFYING pairs (post-Jaccard, a few rows
    per chunk) to scratch parquet; dropping the chunk frame lets the
    ContextCleaner reclaim its shuffle files before the next slice
    starts, holding peak scratch to ~1/chunks of the single-plan form.
    The chunk key is the aggregation key's first column, so values are
    identical (tests/test_plans.py pins frame-equality with pipe01 at
    the gate fixtures); the funnel tail then runs once over the unioned
    pair file. This is the single-box posture only — on a cluster the
    one-shot exchange IS the right plan (distributed scratch), which is
    why the registered pipe01 keeps it.

    Chunk sizing (r11 — auto by default): 16 chunks was the DuckDB
    staging oracle's number, and r10 measured Spark's peak at 7.5 GB
    against a 40 GB budget — ~5x headroom paid for with a full
    (tokenize → shingle → explode → exchange) b-side re-derivation per
    chunk. The auto mode removes both inefficiencies: (1) the exploded
    shingle table is written ONCE as a bucketed table on the join key
    ``s`` (``io.write_bucketed``; one file per bucket so sort-merge
    reuses the sortBy order), after which every chunk job joins
    bucket-aligned splits with zero s-exchange; (2) the doc_a space
    splits into ``_PIPE_SUBCHUNKS`` fixed residues, the first two jobs
    (1 then 2 subchunks) run under a scratch-sampling thread over the
    executors' local dirs, the two peaks fit peak(g) ~= B + g*V (B =
    constant residual, V = one subchunk's share of the pair-aggregation
    spill — the term that scaled 7.5 -> 40.7 GB between 16 chunks and
    the single plan), and the remaining residues run in contiguous
    groups of g sized so B + g*V stays under min(``scratch_budget_gb``
    x ``_PIPE_BUDGET_SAFETY``, ``_PIPE_JOB_SCRATCH_TARGET_GB``). The
    cap exists because the r10 verdict's "coarser chunks should
    roughly halve the wall-clock" hypothesis was MEASURED FALSE at
    sf10: the funnel is pair-aggregation-bound, a spilling hash
    aggregate's merge I/O grows superlinearly with group size, and
    budget-maxed 20 GB-target groups ran 904 s (unbucketed) / 939 s
    (bucketed) where 5 GB-target groups over the bucketed table ran
    709 s (the r10 fixed-16 mode: 749.5 s) — the full series is in
    PIPE01_SF10_EXCLUSION.json. An explicit
    ``chunks`` keeps the fixed ``doc_id % chunks`` behavior (tests pin
    frame-equality of both modes against plain pipe01).

    Measured (r10, PIPE01_SF10_EXCLUSION.json, 40 GB budget): the
    single-plan form is killed at 40.7 GB scratch 311 s in; the fixed
    16-chunk mode COMPLETED the exact sf10 funnel in 749.5 s at 7.5 GB
    peak; DuckDB's sequenced staging completes in 122.8 s zero-spill —
    the fastest single-box exact path. The chunked trade is wall-clock
    for bounded scratch; the r11 auto-sizing spends the measured
    headroom to buy back most of the difference (see the regenerated
    artifact).
    """
    import gc
    import tempfile

    docs, wcd, sh, ex = _funnel_prelude(spark, sf_dir)
    scratch = scratch_dir or tempfile.mkdtemp(prefix="pipe01_chunks_")

    def write_residues(
        src: DataFrame, lo: int, hi: int, mod: int, first: bool
    ) -> None:
        """One sequenced JOB: qualifying pairs for doc_id % mod in
        [lo, hi) — the predicate hits ``src`` before the doc_a rename."""
        pred = F.pmod(F.col("doc_id"), F.lit(mod))
        part = _exact_pairs(
            src,
            a_pred=(
                (pred >= lo) & (pred < hi) if hi - lo > 1 else pred == lo
            ),
        ).select("doc_a", "doc_b")
        part.write.mode("overwrite" if first else "append").parquet(scratch)
        del part
        gc.collect()  # release the chunk's shuffle for cleanup

    if chunks is not None:
        for i in range(chunks):
            write_residues(ex, i, i + 1, chunks, first=(i == 0))
        pairs = spark.read.parquet(scratch)
        return _funnel_from_pairs(spark, docs, wcd, ex, pairs)

    # Auto mode (r11): bucket-materialize the exploded shingle table
    # ONCE on the join key, then run budget-sized residue groups
    # against it. The fixed-chunk form re-derives (tokenize → shingle
    # → explode) and re-EXCHANGES the full b-side in every job — the
    # measured constant term (~5 GB shuffle + a full corpus scan per
    # job, 16x over at sf10). Writing ex bucketed on ``s`` pays that
    # shuffle exactly once; every chunk job then joins bucket-aligned
    # splits with ZERO s-exchange (a-side residue filter is just a
    # read-time predicate) and pays only its own pair-aggregation
    # exchange — the term the scratch budget actually bounds. The
    # bucket directory is dropped after the pair stage; the funnel
    # tail keeps the lazy ``ex`` (contamination scan, one pass).
    import hashlib

    from ..io import write_bucketed

    sub = _PIPE_SUBCHUNKS
    db = "pipe01_bkt_" + hashlib.md5(scratch.encode()).hexdigest()[:8]
    tbl = f"{db}.ex_b"
    # SIBLING of the pairs directory, never nested inside it — the
    # pairs-parquet read below lists scratch recursively and must not
    # see bucket files (dropped before that read runs, which would
    # leave a stale listing). scratch_dir is public API: a quote in
    # the caller's path would otherwise break out of the single-quoted
    # LOCATION literal (ADVICE r11).
    if "'" in scratch or "\\" in scratch:
        raise ValueError(
            f"scratch_dir must not contain quotes/backslashes: {scratch!r}"
        )
    spark.sql(
        f"CREATE DATABASE IF NOT EXISTS {db} "
        f"LOCATION '{scratch.rstrip('/')}_bkt_db'"
    )
    try:
        nb = max(8, spark.sparkContext.defaultParallelism)
        # repartition on the bucket key first: the writer then emits
        # one file per bucket, letting sort-merge reuse the sortBy order
        write_bucketed(
            ex.repartition(nb, F.col("s")), tbl, ("s",), nb, sort_by=("s",)
        )
        exb = spark.table(tbl)
        watch = _spark_scratch_dirs(spark)
        budget = (
            min(
                scratch_budget_gb * _PIPE_BUDGET_SAFETY,
                _PIPE_JOB_SCRATCH_TARGET_GB,
            )
            * 1024**3
        )
        # calibration: 1 subchunk, then 2 — two points pin the constant
        # term B (residual) and the per-subchunk spill V
        s1 = _run_job_with_peak(
            lambda: write_residues(exb, 0, 1, sub, first=True), watch
        )
        s2 = _run_job_with_peak(
            lambda: write_residues(exb, 1, 3, sub, first=False), watch
        )
        v = s2 - s1
        # "both jobs' growth was well under the budget" is the only
        # evidence that justifies one giant remaining job; a large s1
        # with v <= 0 is a DEGENERATE calibration (e.g. job 1's shuffle
        # files were reclaimed mid-job-2, deflating s2), not proof of
        # tiny data — the giant job would approximate the single-plan
        # shape measured killed at 40.7 GB (ADVICE r11, medium).
        tiny = max(s1, s2) < 0.05 * budget
        if not watch:
            # scratch dirs unreachable (internals moved): fall back to
            # the oracle's fixed granularity rather than one giant job
            g = max(1, sub // _PIPE_ORACLE_CHUNKS)
        elif v <= 0:
            # no measurable growth AND both absolute peaks near zero:
            # everything left fits in one job. Otherwise the
            # calibration is degenerate — take the conservative fixed
            # granularity, same as the unreachable-scratch branch.
            g = sub - 3 if tiny else max(1, sub // _PIPE_ORACLE_CHUNKS)
        else:
            b = max(s1 - v, 0)
            g = max(1, int((budget - b) // v))
        nxt = 3
        while nxt < sub:
            hi = min(nxt + g, sub)
            write_residues(exb, nxt, hi, sub, first=False)
            nxt = hi
    finally:
        # the pair parquet at the scratch ROOT is already materialized
        # (every chunk job was an eager write), so the bucket files can
        # go before the lazy funnel tail is returned
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        spark.sql(f"DROP DATABASE IF EXISTS {db}")
    pairs = spark.read.parquet(scratch)
    return _funnel_from_pairs(spark, docs, wcd, ex, pairs)


def _funnel_from_pairs(
    spark: SparkSession,
    docs: DataFrame,
    wcd: DataFrame,
    ex: DataFrame,
    pairs: DataFrame,
) -> DataFrame:
    """The funnel tail: everything after the pair stage."""
    dupes = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    bsh = (
        docs.filter(F.col("doc_id") % 97 == 0)
        .select(F.explode(shingles(tokens())).alias("s"))
        .distinct()
    )
    # size-aware hints throughout (never a hard F.broadcast): the
    # benchmark shingle set is bounded by the benchmark slice's text
    # bytes (base: the pruned text projection), but dup_flag/con_flag
    # are one key per flagged DOCUMENT — on a duplicate-heavy corpus
    # that is O(corpus), so their honest base is the corpus key column
    # and past the threshold the joins run as bounded hash / AQE plans.
    doc_keys = docs.select("doc_id")
    contam = (
        ex.join(dupes, "doc_id", "left_anti")
        .join(broadcast_or_shuffle_hash(bsh, docs.select("text")), "s")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("shared_shingles"))
        .filter(F.col("shared_shingles") >= _CONTAM_MIN_SHARED)
        .select("doc_id")
    )
    dup_flag = broadcast_or_shuffle_hash(
        dupes.withColumn("is_dup", F.lit(True)), doc_keys
    )
    con_flag = broadcast_or_shuffle_hash(
        contam.withColumn("is_con", F.lit(True)), doc_keys
    )
    stage = (
        F.when(F.col("wc") < PIPE_WC_MIN, "quality")
        .when(F.col("is_dup"), "duplicate")
        .when(F.col("is_con"), "contaminated")
        .when(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
            == PIPE_HOLDOUT_NIBBLE,
            "holdout",
        )
        .otherwise("kept")
    )
    return (
        wcd.join(dup_flag, "doc_id", "left")
        .join(con_flag, "doc_id", "left")
        .select("doc_id", "lang", "source", "wc", stage.alias("stage"))
    )
