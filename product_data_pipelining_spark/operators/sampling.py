"""Deterministic sampling and dataset splitting.

Training-data pipelines need samples that are *stable across runs,
partitionings, and engines* — ``df.sample()`` (seeded per-partition RNG)
changes membership whenever the scan splits differently, which is every
time the cluster size changes. The operators here hash a stable key
(md5 over the stringified id — identical hex in Spark and DuckDB) and
bucket on the digest, so membership is a pure function of the row: the
same document lands in the same split on a laptop and on a
1000-executor cluster. This is the shard-stable analog of the
reference's deterministic first-seen ingest rules
(``portfolio_app/scripts/main_pipeline.py:184,206-209``).

Map-side only: no shuffle — the hash, bucket, and filter all ride the
scan, and any downstream aggregate sees a pre-filtered stream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register


def hash_bucket(key: Column) -> Column:
    """First hex nibble (0-f) of md5 over the stringified key: 16
    equal-probability, engine-portable buckets.

    md5 is deliberate here: split membership must be reproducible on
    *any* engine (the DuckDB oracles, a different executor image, a
    one-off pandas audit), and the cost is one digest per row over a
    short id — noise next to the scan. For Spark-only pipelines that
    bucket billions of rows per run, ``hash_bucket_xxh`` is the
    JVM-intrinsic fast path (same stability guarantees, not
    reproducible outside Spark)."""
    return F.substring(F.md5(key.cast("string")), 1, 1)


def hash_bucket_xxh(key: Column, n_buckets: int = 16) -> Column:
    """Spark-native bucket id in [0, n_buckets): ``pmod(xxhash64(key))``.

    Same determinism contract as ``hash_bucket`` — membership is a pure
    function of the key, independent of partitioning and cluster size —
    but hashed with the codegen'd xxhash64 intrinsic instead of an md5
    hex digest, so it stays cheap when the split keys are long strings
    or composite. Not portable off Spark; use the md5 twin wherever a
    second engine must reproduce the split."""
    return F.pmod(F.xxhash64(key), F.lit(n_buckets))


def _sql_bucket(expr: str) -> str:
    return f"substr(md5(CAST({expr} AS VARCHAR)), 1, 1)"


@register(
    "smp01_hash_split",
    oracle=f"""
    SELECT doc_id,
           CASE WHEN {_sql_bucket("doc_id")} <= 'b' THEN 'train'
                WHEN {_sql_bucket("doc_id")} <= 'd' THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
)
def smp01_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split (12/2/2 of 16 hash buckets).

    Membership depends only on doc_id — re-running at any scale or
    partitioning reproduces the split exactly, and a doc can never leak
    between train and test across pipeline versions. Pure projection:
    zero shuffles, pushed alongside the scan.
    """
    docs = load_table(spark, sf_dir, "documents")
    b = hash_bucket(F.col("doc_id"))
    return docs.select(
        "doc_id",
        F.when(b <= "b", "train")
        .when(b <= "d", "val")
        .otherwise("test")
        .alias("split"),
    )


@register(
    "smp02_stratified_downsample",
    oracle=f"""
    SELECT event_id, event_type, user_id
    FROM events
    WHERE {_sql_bucket("event_id")} <
          CASE event_type WHEN 'click' THEN '4'
                          WHEN 'view' THEN '1'
                          ELSE 'g' END
    """,
)
def smp02_stratified_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic downsampling: per-class keep rates.

    The majority classes are thinned (views to 1/16, clicks to 4/16)
    while rare event types are kept whole ('g' sorts above every hex
    nibble) — the classic class-rebalancing pass before training.
    Same stability guarantee as smp01: the kept set is a function of
    event_id alone. Map-side filter, no shuffle; at 100 TB the filter
    runs inside the scan stage and the dropped rows never leave the
    reader.
    """
    ev = load_table(spark, sf_dir, "events")
    b = hash_bucket(F.col("event_id"))
    rate = (
        F.when(F.col("event_type") == "click", F.lit("4"))
        .when(F.col("event_type") == "view", F.lit("1"))
        .otherwise(F.lit("g"))
    )
    return ev.filter(b < rate).select("event_id", "event_type", "user_id")


@register(
    "smp03_priority_sample_topk",
    oracle="""
    SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS priority
    FROM documents
    ORDER BY priority, doc_id
    LIMIT 100
    """,
)
def smp03_priority_sample_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic uniform sample without replacement via hash top-k.

    Priority sampling: give every row an md5-of-key priority and keep
    the k smallest — a uniform k-sample that is reproducible across
    runs, engines, and cluster sizes (no ``rand()``). Spark executes
    the sort+limit as TakeOrderedAndProject: each partition keeps only
    its local top-k, and one tiny merge of k·partitions rows finishes —
    no global sort of the corpus ever happens, so the same plan holds
    on 100 TB.
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            F.md5(F.col("doc_id").cast("string")).alias("priority"),
        )
        .orderBy("priority", "doc_id")
        .limit(100)
    )


_PACK_BUCKETS = 16
_PACK_BUDGET = 2_000  # tokens per shard


@register(
    "smp04_token_budget_pack",
    oracle=f"""
    WITH tokc AS (
      SELECT doc_id, doc_id % {_PACK_BUCKETS} AS bucket,
             len(list_filter(string_split(text, ' '), x -> x <> ''))
               AS n_tokens
      FROM documents
    )
    SELECT doc_id, bucket, n_tokens,
           bucket * 100000 + CAST(FLOOR(
             (SUM(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1)
             / {_PACK_BUDGET}) AS BIGINT) AS shard_id
    FROM tokc
    """,
)
def smp04_token_budget_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard packing: assign documents to training shards under a token budget.

    Greedy first-fit packing made distributed: documents are spread
    over ``_PACK_BUCKETS`` independent lanes (deterministic key mod),
    each lane packs by running token cumsum — a ROWS window per lane,
    so lanes fill in parallel and no lane's state exceeds one running
    long. Shard ids are globally unique by construction
    (``lane * 100000 + seq``). Pure integer arithmetic end-to-end →
    exact parity with the oracle. At 100 TB the lane count scales with
    the cluster, and per-lane order (here ``doc_id``) is any stable
    key; the window never sees more than one lane's documents.
    """
    from ..operators.textops import tokens

    docs = load_table(spark, sf_dir, "documents")
    tokc = docs.select(
        "doc_id",
        (F.col("doc_id") % _PACK_BUCKETS).alias("bucket"),
        F.size(tokens()).cast("bigint").alias("n_tokens"),
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    shard = F.col("bucket") * 100_000 + F.floor(
        (F.sum("n_tokens").over(w) - 1) / _PACK_BUDGET
    ).cast("bigint")
    return tokc.select(
        "doc_id", "bucket", "n_tokens", shard.alias("shard_id")
    )


_QUOTA_PER_SOURCE = 50


@register(
    "smp05_per_source_quota",
    oracle=f"""
    SELECT source, doc_id, pick
    FROM (
      SELECT source, doc_id,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS pick
      FROM documents
    ) WHERE pick <= {_QUOTA_PER_SOURCE}
    """,
)
def smp05_per_source_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain quotas: keep at most N uniformly-chosen docs per source.

    The crawl-curation cap on over-represented domains, composed from
    two already-proven pieces: md5-of-key priorities (smp03's
    reproducible uniform choice — no ``rand()``) ranked per source with
    the WindowGroupLimit top-k (a18's plan — each task holds at most N
    rows per source on either side of the single exchange). Changing
    the quota or the partition count never changes *which* documents
    survive, only how fast.
    """
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.select(
            "source", "doc_id", F.row_number().over(w).alias("pick")
        )
        .filter(F.col("pick") <= _QUOTA_PER_SOURCE)
    )


# temperature-flattening exponent for domain mixing (alpha < 1 boosts
# under-represented sources, the multilingual-corpus rebalancing trick)
_TEMP_ALPHA = 0.5
# overall keep budget as a fraction of the corpus
_TEMP_BUDGET = 0.5
# 2^32 as a double: md5's first 8 hex chars map to [0, 2^32)
_HEX8_SPAN = 4294967296.0


@register(
    "smp06_temperature_resample",
    oracle=f"""
    WITH counts AS (
      SELECT source, COUNT(*) AS n_i FROM documents GROUP BY source
    ), weights AS (
      SELECT source, n_i,
             POW(CAST(n_i AS DOUBLE) / SUM(n_i) OVER (), {_TEMP_ALPHA})
               AS w_i,
             SUM(n_i) OVER () AS n_total
      FROM counts
    ), rates AS (
      SELECT source, n_i,
             LEAST(1.0,
                   (w_i / SUM(w_i) OVER ()) * n_total * {_TEMP_BUDGET} / n_i)
               AS keep_rate
      FROM weights
    )
    SELECT d.doc_id, d.source, r.keep_rate
    FROM documents d JOIN rates r USING (source)
    WHERE substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) <
          lpad(lower(to_hex(CAST(LEAST(floor(r.keep_rate * {_HEX8_SPAN}),
                                       {int(_HEX8_SPAN) - 1}) AS BIGINT))),
               8, '0')
    """,
)
def smp06_temperature_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based domain rebalancing: keep-rate ∝ share^(α-1).

    The corpus-mixing pass LLM pipelines run before training: raw crawl
    shares are flattened with temperature α (α=1 keeps natural
    proportions, α→0 approaches uniform-per-domain), here α=0.5 under a
    50% global budget. Each source's keep rate is min(1, target_share ·
    budget / natural_share); membership is decided by comparing the
    first 8 md5 hex chars of the doc id — a uniform, engine-portable
    [0, 2^32) draw — against the rate's hex threshold, so the kept set
    is a pure function of (doc_id, corpus composition): stable across
    partitionings, cluster sizes, and engines.

    Scale shape: the per-source histogram is one tiny aggregate
    (source-cardinality rows; the window sums run on that aggregate,
    not the corpus), broadcast back for a map-side filter — the
    documents table is scanned once and never shuffled.
    """
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    everything = Window.partitionBy()
    counts = docs.groupBy("source").agg(F.count("*").alias("n_i"))
    weights = counts.select(
        "source",
        "n_i",
        F.pow(
            F.col("n_i").cast("double") / F.sum("n_i").over(everything),
            F.lit(_TEMP_ALPHA),
        ).alias("w_i"),
        F.sum("n_i").over(everything).alias("n_total"),
    )
    rates = weights.select(
        "source",
        F.least(
            F.lit(1.0),
            (F.col("w_i") / F.sum("w_i").over(everything))
            * F.col("n_total")
            * F.lit(_TEMP_BUDGET)
            / F.col("n_i"),
        ).alias("keep_rate"),
    )
    threshold = F.lpad(
        F.lower(
            F.hex(
                F.least(
                    F.floor(F.col("keep_rate") * F.lit(_HEX8_SPAN)),
                    F.lit(int(_HEX8_SPAN) - 1),
                ).cast("long")
            )
        ),
        8,
        "0",
    )
    return (
        docs.join(F.broadcast(rates), "source")
        .filter(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8)
            < threshold
        )
        .select("doc_id", "source", "keep_rate")
    )


_SHUFFLE_EPOCH = 42  # seed: a new epoch value yields a fresh permutation


@register(
    "smp07_shuffle_order",
    oracle=f"""
    SELECT doc_id,
           md5('{_SHUFFLE_EPOCH}:' || CAST(doc_id AS VARCHAR)) AS shuffle_key
    FROM documents
    ORDER BY shuffle_key
    """,
)
def smp07_shuffle_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training-order shuffle: sort by seeded hash.

    Training wants each epoch to visit documents in a pseudo-random
    order that is nevertheless REPRODUCIBLE (resume a crashed run,
    re-derive the exact batch a loss spike came from) and
    cluster-size-independent. ``df.orderBy(rand(seed))`` fails both:
    Spark's rand is seeded per-partition, so the permutation changes
    whenever the scan splits differently. Here the sort key is
    ``md5(epoch ':' doc_id)`` — a pure function of the row, so the
    permutation is a stable property of the data + epoch number, and
    bumping the epoch constant reshuffles everything.

    At 100 TB this is Spark's distributed sort: a range-partitioned
    exchange (sampled split points, no single-reducer bottleneck) with
    each output shard internally ordered — exactly the layout a
    sharded training loader wants (read shards round-robin; global
    order is shard-concatenation order). No window functions, no
    driver involvement; the hash rides the scan.
    """
    docs = load_table(spark, sf_dir, "documents")
    key = F.md5(
        F.concat(
            F.lit(f"{_SHUFFLE_EPOCH}:"), F.col("doc_id").cast("string")
        )
    )
    return docs.select("doc_id", key.alias("shuffle_key")).orderBy(
        "shuffle_key"
    )


# ---------------------------------------------------------------------------
# smp08: deterministic WEIGHTED sampling without replacement
# (Efraimidis & Spirakis 2006, "Weighted random sampling with a
# reservoir" — the exponential-clocks formulation). smp03 is the
# uniform case; here longer documents (weight = n_chars) are
# proportionally more likely to survive, the standard length-weighted
# selection for token-budgeted training mixes.

SMP08_K = 100
_HEX_W = 12  # 48 bits of md5 -> u in (0,1), portable across engines


@register(
    "smp08_weighted_sample",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id, source, n_chars,
             CAST(FLOOR(
               -ln((CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                             1, {_HEX_W}) AS BIGINT)
                         AS DOUBLE) + 1.0) / {float(16 ** _HEX_W) + 1.0})
               / CAST(n_chars AS DOUBLE) * 1e9 + 0.5) AS BIGINT) AS priority
      FROM documents
    )
    SELECT doc_id, source, n_chars, priority
    FROM keyed
    ORDER BY priority, doc_id
    LIMIT {SMP08_K}
    """,
)
def smp08_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sample without replacement via deterministic hash clocks.

    Efraimidis-Spirakis exponential-clocks: every row draws a uniform
    u from 48 bits of md5(doc_id) and races with clock -ln(u)/weight;
    the SMP08_K smallest clocks win, so inclusion probability scales
    with weight (n_chars — length-weighted selection) while membership
    stays a pure function of the row: same sample on any engine,
    partitioning, or cluster size. Clocks land on a 1e-9 integer grid
    (FLOOR(x*1e9+0.5) as BIGINT on both engines) so the cross-engine
    float comparison at the cut boundary is exact; residual grid ties
    break on doc_id identically on both sides.

    Scale shape: the clock is map-side arithmetic riding the scan, and
    the sort+limit executes as TakeOrderedAndProject — each partition
    keeps a local top-k and one k-by-partitions merge finishes. No
    global sort, no shuffle of the corpus, same plan at 100 TB.
    """
    docs = load_table(spark, sf_dir, "documents")
    u = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, _HEX_W),
            16,
            10,
        ).cast("double")
        + F.lit(1.0)
    ) / F.lit(float(16**_HEX_W) + 1.0)
    clock = -F.log(u) / F.col("n_chars").cast("double")
    priority = F.floor(clock * F.lit(1e9) + F.lit(0.5)).cast("long")
    return (
        docs.select("doc_id", "source", "n_chars", priority.alias("priority"))
        .orderBy("priority", "doc_id")
        .limit(SMP08_K)
    )


# Target language mixture for the epoch planner: what the training run
# WANTS each language's token share to be, independent of what the crawl
# happened to collect. Weights sum to 1; langs absent from the corpus
# contribute nothing, corpus langs absent here get weight 0 (excluded
# from the plan output — nothing is scheduled for them).
SMP09_TARGET_WEIGHTS: dict[str, float] = {
    "en": 0.30,
    "zh": 0.25,
    "de": 0.15,
    "fr": 0.15,
    "es": 0.15,
}
SMP09_BUDGET_MULT = 1.0  # total training tokens = 1.0x the corpus total


@register(
    "smp09_mixture_epoch_plan",
    oracle=f"""
    WITH src AS (
      SELECT lang, source,
             CAST(SUM(len(list_filter(string_split(text, ' '),
                                      x -> x <> ''))) AS BIGINT) AS src_tokens
      FROM documents GROUP BY lang, source
    ),
    lng AS (
      SELECT lang, CAST(SUM(src_tokens) AS BIGINT) AS lang_tokens,
             SUM(SUM(src_tokens)) OVER () AS corpus_tokens
      FROM src GROUP BY lang
    ),
    plan AS (
      SELECT lang, lang_tokens,
             CASE {' '.join(f"WHEN lang = '{k}' THEN {v}" for k, v in SMP09_TARGET_WEIGHTS.items())}
                  ELSE 0.0 END AS target_weight,
             CAST(corpus_tokens AS DOUBLE) * {SMP09_BUDGET_MULT}
               * CASE {' '.join(f"WHEN lang = '{k}' THEN {v}" for k, v in SMP09_TARGET_WEIGHTS.items())}
                      ELSE 0.0 END / lang_tokens AS epochs_raw
      FROM lng
    )
    SELECT s.lang, s.source, s.src_tokens, p.lang_tokens, p.target_weight,
           ROUND(p.epochs_raw, 4) AS epochs,
           CAST(FLOOR(p.epochs_raw) AS BIGINT) AS whole_epochs,
           ROUND(p.epochs_raw - FLOOR(p.epochs_raw), 4) AS partial_keep_rate,
           ROUND(p.epochs_raw * s.src_tokens, 2) AS src_target_tokens
    FROM src s JOIN plan p USING (lang)
    WHERE p.target_weight > 0
    """,
)
def smp09_mixture_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture epoch planner: per-source token schedule with
    oversampling.

    The budgeting pass a training run does BEFORE any sampling executes
    (the LLaMA-style "data mixture" table): given target language
    weights and a total token budget (here 1.0x the corpus), compute
    each language's required epochs = target_tokens / available_tokens.
    epochs < 1 means downsample (keep partial_keep_rate of one pass —
    smp06's rate filter executes it); epochs > 1 means the domain is
    SCARCE and must repeat: whole_epochs full passes plus a
    partial_keep_rate-sampled final pass (smp07's epoch shuffle provides
    the distinct per-pass orders). Per-source targets allocate the
    language budget proportionally, preserving the within-language
    source mix. On this fixture en runs at ~0.7 epochs while zh needs
    ~1.6 — both planner branches are exercised.

    All inputs to the ratios are exact BIGINT token sums, so the
    doubles agree bit-for-bit across engines; outputs land on fixed
    rounding grids.

    Scale shape: one corpus scan into a map-side-combined
    (lang, source) aggregate (|langs|x|sources| rows); everything after
    — the per-lang re-agg, the corpus-total window, the plan join —
    runs on that tiny table. Nothing corpus-sized ever shuffles, same
    plan at 100 TB.
    """
    from pyspark.sql import Window

    from ..functions.rounding import duck_round
    from .textops import tokens

    docs = load_table(spark, sf_dir, "documents")
    src = docs.groupBy("lang", "source").agg(
        F.sum(F.size(tokens())).alias("src_tokens")
    )
    everything = Window.partitionBy()
    lng = (
        src.groupBy("lang")
        .agg(F.sum("src_tokens").alias("lang_tokens"))
        .withColumn(
            "corpus_tokens", F.sum("lang_tokens").over(everything)
        )
    )
    weight = F.lit(0.0)
    for k, v in SMP09_TARGET_WEIGHTS.items():
        weight = F.when(F.col("lang") == k, F.lit(v)).otherwise(weight)
    plan = lng.select(
        "lang",
        "lang_tokens",
        weight.alias("target_weight"),
        (
            F.col("corpus_tokens").cast("double")
            * F.lit(SMP09_BUDGET_MULT)
            * weight
            / F.col("lang_tokens")
        ).alias("epochs_raw"),
    )
    return (
        src.join(F.broadcast(plan), "lang")
        .filter(F.col("target_weight") > 0)
        .select(
            "lang",
            "source",
            "src_tokens",
            "lang_tokens",
            "target_weight",
            duck_round(F.col("epochs_raw"), 4).alias("epochs"),
            F.floor("epochs_raw").cast("long").alias("whole_epochs"),
            duck_round(
                F.col("epochs_raw") - F.floor("epochs_raw"), 4
            ).alias("partial_keep_rate"),
            duck_round(
                F.col("epochs_raw") * F.col("src_tokens"), 2
            ).alias("src_target_tokens"),
        )
    )
