"""Slowly-changing-dimension (type 2) history, the point-in-time
feature lookup over it, and its streaming maintenance.

The standard warehouse trio a feature store or training snapshotter
needs ("what was this user's value AS OF time T?"):

- :func:`scd2_history` — each (user, event) becomes a row with
  ``[valid_from, valid_to)`` bounds, where ``valid_to`` is the NEXT
  event's timestamp for that user (NULL = still current).
- :func:`asof_feature_join` — the read path those intervals exist
  for: join a probe set of (user, ts) training rows to the feature
  value in force at each probe instant (VERDICT r09 "Next round" #2).
- :func:`stream_scd2_maintain` — the online half: per-epoch MERGE of
  arriving events into the persisted interval table through the
  generic versioned foreachBatch runner (VERDICT r09 #3), replay-
  idempotent and late-data-correct.

Plan shapes: every member is built around ONE hash exchange on
``user_id`` feeding a per-user ``lead()``/``last()`` window —
user_id is high-cardinality, so the window's sort is per-user-sized
and the exchange is the scale-out axis; nothing else in the plan is
data-sized. Ordering ties (same-user same-ts events exist in the
log) break by ``event_id`` in BOTH engines, so the interval chain is
deterministic."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from psd_project_spark.sources.registry import load_table

#: Columns of the SCD2 state/event core (shared by batch + stream).
_EVENT_COLS = ("user_id", "event_id", "ts", "value")


def _scd2_intervals(ev: DataFrame, attrs: tuple[str, ...] = ()) -> DataFrame:
    """(user_id, event_id, ts, value[, *attrs]) events → SCD2 validity
    rows, extra event attributes carried through unchanged.

    The shared kernel of the batch query and the streaming merge:
    one ``lead()`` over (ts, event_id) per user. For tied timestamps
    the earlier event_id gets an EMPTY interval ``[t, t)`` and the
    last tied event owns ``[t, next_ts)`` — the same tie rule the
    as-of fill and both DuckDB oracles apply."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.withColumn("valid_to", F.lead("ts").over(w)).select(
        "user_id",
        "event_id",
        F.col("ts").alias("valid_from"),
        "valid_to",
        "value",
        *attrs,
        F.col("valid_to").isNull().alias("is_current"),
    )


def scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(*_EVENT_COLS)
    return _scd2_intervals(ev).orderBy("user_id", "valid_from", "event_id")


SCD2_ORACLE = """
SELECT user_id, event_id,
       ts AS valid_from,
       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
         AS valid_to,
       value,
       (lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
          IS NULL) AS is_current
FROM events
ORDER BY user_id, valid_from, event_id
"""


# --- asof_feature_join (the point-in-time read path) -------------------------

def asof_feature_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time feature lookup: for every probe row (user, ts),
    the feature event in force at that instant — the read path every
    feature store / training snapshotter runs against SCD2 history.
    Feature history = odd-event_id events; probe set = even-event_id
    events probing at their own timestamps (a natural training-row
    set: "what was the user's last odd-side value when this row was
    observed?"). Probes before a user's first feature event keep NULL
    features — left-join semantics.

    Plan shape — union-sort-fill, ONE exchange (pinned by
    tests/test_round10_ops.py): feature rows and probe rows are
    unioned with a kind tag, one hash exchange on ``user_id`` feeds a
    per-user sort on (ts, kind, id), and ``last(ignorenulls)`` over
    the unbounded-preceding frame carries the latest feature struct
    forward into each probe row. Events sort BEFORE probes at equal
    ts (``valid_from`` is inclusive) and tied events resolve to the
    highest event_id — exactly the empty-interval tie rule of
    :func:`_scd2_intervals` and the oracle's lead-interval BETWEEN.

    Why not the interval-bucketed equi-join (range_join.py's form):
    validity intervals are variable-length and every user's LAST
    interval is open-ended, so bucketing would explode each interval
    into unboundedly many W-cells. The union-fill form is the
    standard scale as-of join — it shuffles each side exactly once on
    the join key, never compares non-adjacent rows, and has no
    BroadcastNestedLoopJoin anywhere. The naive alternative
    (``probe.ts BETWEEN valid_from AND valid_to`` non-equi join)
    plans as BNLJ — unusable at 100 TB."""
    ev = load_table(spark, sf_dir, "events").select(*_EVENT_COLS)
    state = ev.filter(F.col("event_id") % 2 == 1)
    probes = ev.filter(F.col("event_id") % 2 == 0).select(
        "user_id", F.col("event_id").alias("probe_id"), "ts"
    )
    return asof_join(state, probes)


def asof_join(state: DataFrame, probes: DataFrame) -> DataFrame:
    """Union-sort-fill as-of join (see :func:`asof_feature_join`).

    ``state``: (user_id, event_id, ts, value) feature events;
    ``probes``: (user_id, probe_id, ts) lookup rows. Returns one row
    per probe with the feature struct in force at probe ``ts``
    (NULLs when the probe precedes every state event). The probe
    side's NULL struct derives its type from the STATE frame's
    schema, so callers with e.g. int event ids or decimal values
    union cleanly."""
    st_t = (
        "struct<event_id:"
        f"{state.schema['event_id'].dataType.simpleString()},"
        f"value:{state.schema['value'].dataType.simpleString()}>"
    )
    tagged = state.select(
        "user_id",
        "ts",
        F.lit(0).alias("kind"),
        F.col("event_id").alias("ord_id"),
        F.struct("event_id", "value").alias("st"),
    ).unionByName(
        probes.select(
            "user_id",
            "ts",
            F.lit(1).alias("kind"),
            F.col("probe_id").alias("ord_id"),
            F.lit(None).cast(st_t).alias("st"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", "ord_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        tagged.withColumn("asof", F.last("st", ignorenulls=True).over(w))
        .filter(F.col("kind") == 1)
        .select(
            "user_id",
            F.col("ord_id").alias("probe_id"),
            "ts",
            F.col("asof.event_id").alias("asof_event_id"),
            F.col("asof.value").alias("asof_value"),
        )
    )


#: Lead-interval BETWEEN oracle (not DuckDB's ASOF JOIN: ASOF picks an
#: arbitrary row among tied state timestamps, while the lead-interval
#: form gives tied events the same empty-interval rule as the Spark
#: side). Each probe matches at most one interval, so the LEFT JOIN
#: preserves probe cardinality exactly.
ASOF_ORACLE = """
WITH state AS (
  SELECT user_id, event_id, value, ts,
         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS valid_to
  FROM events WHERE event_id % 2 = 1
), probes AS (
  SELECT user_id, event_id AS probe_id, ts FROM events
  WHERE event_id % 2 = 0
)
SELECT p.user_id, p.probe_id, p.ts,
       s.event_id AS asof_event_id, s.value AS asof_value
FROM probes p LEFT JOIN state s
  ON p.user_id = s.user_id AND p.ts >= s.ts
 AND (s.valid_to IS NULL OR p.ts < s.valid_to)
"""


# --- stream_scd2_maintain (the online half) -----------------------------------

def scd2_merge(
    current: DataFrame | None, delta: DataFrame, batch_id: int
) -> DataFrame:
    """Per-epoch SCD2 MERGE for the versioned foreachBatch runner.

    Users untouched by the epoch pass through byte-identical; for
    affected users the original events are recovered from their
    interval rows (``valid_from`` IS the event ts) and the interval
    chain is re-derived over history ∪ delta. That makes the merge
    LATE-DATA-CORRECT: an event arriving out of order splices into
    the middle of its user's chain and closes the interval above it —
    the case a naive "close the open interval" upsert gets wrong.

    Epoch cost is O(|delta| + |history of affected users|), never
    state-sized: the anti/semi joins prune to affected users before
    any window runs (AQE broadcasts the small delta-user side), and
    the maintenance runner executes BUCKET-ALIGNED on user_id
    (streaming/foreach_sink.py) — ``current`` here is only the
    affected buckets' state, and the version write rewrites only
    those buckets (untouched buckets' files pinned byte-identical by
    tests/test_round11_ops.py). The merge is key-local over user_id
    by construction: every output row's user comes from ``current``
    ∪ ``delta``, so the bucket-aligned contract holds.

    One merge kernel, not two: this is exactly
    :func:`scd2_evolving_merge` with no extra event attributes (a
    narrow delta against narrow state reduces the widening to a
    no-op), so it delegates — the late-data splice, tie rule, and
    key-locality contract live in ONE place. Because the evolving
    kernel CARRIES THROUGH any delta column beyond ``_EVENT_COLS`` as
    a persisted state attribute (that is its job), this non-evolving
    entry point asserts the delta is exactly the event core — a
    caller with an incidental helper column must project it away (or
    call :func:`scd2_evolving_merge` deliberately) rather than
    silently widening the state schema (ADVICE r12)."""
    extras = set(delta.columns) - set(_EVENT_COLS)
    if extras:
        raise ValueError(
            f"scd2_merge is the fixed-schema entry point; delta carries "
            f"extra columns {sorted(extras)} — project them away or use "
            f"scd2_evolving_merge to evolve the state deliberately"
        )
    return scd2_evolving_merge(current, delta, batch_id)


def run_scd2_maintenance(arriving: DataFrame, out_dir: str, ckpt: str) -> None:
    """Run the SCD2 MERGE maintenance over a streaming events frame
    ((user_id, event_id, ts, value)) to completion — the injectable
    half :func:`stream_scd2_maintain` and the restart test share."""
    from psd_project_spark.streaming.foreach_sink import (
        run_foreachbatch_versioned,
    )

    run_foreachbatch_versioned(
        arriving, out_dir, ckpt, scd2_merge, bucket_by=["user_id"]
    )


def stream_scd2_maintain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuously-maintained SCD2 interval table: the events stream
    arrives in 3 epochs (source split on ``event_id % 3``, consumed
    with ``maxFilesPerTrigger=1`` — REAL multi-epoch maintenance, not
    a single-batch degenerate, and since the split is id-based each
    epoch carries out-of-ts-order events, exercising the late-data
    path every epoch). The maintained table must equal the batch
    :func:`scd2_history` verbatim — same oracle. Replay idempotency
    and atomic publish come from ``run_foreachbatch_versioned``
    (streaming/foreach_sink.py); the restart test lives in
    tests/test_round10_ops.py."""
    from psd_project_spark.functions.caching import scratch_dir

    from psd_project_spark.streaming.foreach_sink import (
        stage_stream_splits_bucketed,
    )

    src = scratch_dir("psd_scd2_src_")
    out_dir = scratch_dir("psd_scd2_")
    ckpt = scratch_dir("psd_scd2_ckpt_")
    ev = load_table(spark, sf_dir, "events").select(*_EVENT_COLS)
    stage_stream_splits_bucketed(
        ev, F.col("event_id") % 3, src, bucket_by=["user_id"]
    )
    arriving = (
        spark.readStream.schema(
            "user_id long, event_id long, ts timestamp, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    run_scd2_maintenance(arriving, out_dir, ckpt)
    from psd_project_spark.streaming.foreach_sink import read_versioned

    return (
        read_versioned(spark, out_dir)
        .select(
            "user_id", "event_id", "valid_from", "valid_to", "value",
            "is_current",
        )
        .orderBy("user_id", "valid_from", "event_id")
    )


#: Interval-table core columns (what every SCD2 state row carries
#: beyond evolved attributes).
_STATE_CORE = (
    "user_id", "event_id", "valid_from", "valid_to", "value", "is_current",
)


def scd2_evolving_merge(
    current: DataFrame | None, delta: DataFrame, batch_id: int
) -> DataFrame:
    """:func:`scd2_merge` with ADDITIVE SCHEMA EVOLUTION (VERDICT r11
    #3): any delta column beyond the event core (user_id, event_id,
    ts, value) is an event ATTRIBUTE the interval table carries — and
    an attribute may APPEAR mid-stream. The epoch that first carries
    it widens the state: recovered pre-evolution events take a typed
    NULL for it (exactly what their files hold nothing of — the
    ``mergeSchema`` union-by-name rule), the re-derived chains carry
    it forward, and the versioned runner records the widened schema
    in the epoch's manifest so readers of ANY retained version get
    the schema that version was published under. A late narrow epoch
    after an evolution widens its delta the same way. Key-local over
    user_id exactly as :func:`scd2_merge` — evolution changes
    columns, never which buckets an epoch touches."""
    state_attrs = (
        [c for c in current.columns if c not in _STATE_CORE]
        if current is not None
        else []
    )
    delta_attrs = [c for c in delta.columns if c not in _EVENT_COLS]
    attrs = state_attrs + [c for c in delta_attrs if c not in state_attrs]
    for c in attrs:  # widen a post-evolution narrow delta
        if c not in delta.columns:
            delta = delta.withColumn(
                c, F.lit(None).cast(current.schema[c].dataType)
            )
    if current is None:
        return _scd2_intervals(delta, tuple(attrs))
    affected = delta.select("user_id").distinct()
    untouched = current.join(affected, "user_id", "left_anti")
    for c in attrs:  # widen pre-evolution state rows passing through
        if c not in untouched.columns:
            untouched = untouched.withColumn(
                c, F.lit(None).cast(delta.schema[c].dataType)
            )
    reopened = current.join(affected, "user_id", "left_semi").select(
        "user_id",
        "event_id",
        F.col("valid_from").alias("ts"),
        "value",
        *(
            F.col(c) if c in current.columns
            else F.lit(None).cast(delta.schema[c].dataType).alias(c)
            for c in attrs
        ),
    )
    return untouched.unionByName(
        _scd2_intervals(reopened.unionByName(delta), tuple(attrs))
    )


def scd2_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCHEMA EVOLUTION through the maintained table — the most common
    lakehouse operation after MERGE itself (VERDICT r11 #3's missing
    story): the events stream arrives in 3 epochs exactly as
    :func:`stream_scd2_maintain` stages them, but the THIRD epoch's
    rows carry a NEW column (``etype`` — the event's type string) the
    first two never had. Two ``availableNow`` runs share one
    checkpoint (the same phase discipline as
    :func:`stream_scd2_erase`): the narrow phase merges epochs 0–1;
    the widened phase re-opens the stream with the wider source
    schema and merges epoch 2, which evolves the state —
    pre-evolution rows read back with ``etype`` NULL, the evolved
    manifest records the widened schema, and a time-travel read of
    the pre-evolution version still returns the OLD schema (pinned by
    tests/test_round12_ops.py). Oracle: the batch SCD2 history where
    ``etype`` is populated exactly for epoch-2 events — a hash-match
    proves mid-stream widening + union-by-name reads lose and invent
    nothing, late-data splices included.

    At 100 TB: evolution costs what the epoch costs — no table
    rewrite, no backfill; old generations stay byte-identical and the
    widened column materializes lazily as NULLs at read time (the
    Delta/Iceberg ``mergeSchema`` contract on plain parquet)."""
    from psd_project_spark.functions.caching import scratch_dir
    from psd_project_spark.streaming.foreach_sink import (
        N_STATE_BUCKETS,
        read_versioned,
        run_foreachbatch_versioned,
        stage_stream_splits_bucketed,
        write_split_with_buckets,
    )

    src = scratch_dir("psd_scd2ev_src_")
    out_dir = scratch_dir("psd_scd2ev_")
    ckpt = scratch_dir("psd_scd2ev_ckpt_")
    ev = load_table(spark, sf_dir, "events")
    narrow = "user_id long, event_id long, ts timestamp, value double"

    def maintain(schema: str) -> None:
        run_foreachbatch_versioned(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .parquet(src),
            out_dir,
            ckpt,
            scd2_evolving_merge,
            bucket_by=["user_id"],
        )
    # phase 1: epochs 0-1, the original narrow schema
    stage_stream_splits_bucketed(
        ev.filter(F.col("event_id") % 3 < 2).select(*_EVENT_COLS),
        F.col("event_id") % 3,
        src,
        bucket_by=["user_id"],
        n=2,
    )
    maintain(narrow)
    # phase 2: epoch 2 arrives WIDENED — same source dir + checkpoint
    # (consumed offsets skip the narrow files), wider source schema
    write_split_with_buckets(
        ev.filter(F.col("event_id") % 3 == 2).select(
            *_EVENT_COLS, F.col("event_type").alias("etype")
        ),
        f"{src}/p2",
        ["user_id"],
        N_STATE_BUCKETS,
    )
    maintain(narrow + ", etype string")
    return (
        read_versioned(spark, out_dir)
        .select(
            "user_id", "event_id", "valid_from", "valid_to", "value",
            "etype", "is_current",
        )
        .orderBy("user_id", "valid_from", "event_id")
    )


#: The batch SCD2 history with ``etype`` populated exactly for the
#: widened epoch's events — mid-stream evolution must equal it.
SCD2_EVOLUTION_ORACLE = """
SELECT user_id, event_id,
       ts AS valid_from,
       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
         AS valid_to,
       value,
       CASE WHEN event_id % 3 = 2 THEN event_type END AS etype,
       (lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
          IS NULL) AS is_current
FROM events
ORDER BY user_id, valid_from, event_id
"""


def cdc_merge(
    current: DataFrame | None, delta: DataFrame, batch_id: int
) -> DataFrame:
    """CDC apply with DELETES: the per-epoch merge for a change stream
    whose rows carry an ``op`` code — ``I`` rows are events merged via
    :func:`scd2_merge` (late-data-correct interval splice), ``D`` rows
    name users whose ENTIRE history is removed (the GDPR user-erasure
    verb). Order-faithful within the table's semantics: deletes apply
    to the state as of their epoch, and an ``I`` row arriving AFTER a
    user's erasure legitimately re-creates that user's chain from the
    new event alone (pinned by tests/test_round11_ops.py).

    Key-local over user_id by construction — deleted users come from
    ``current``, inserted users from ``delta`` — so the bucket-aligned
    runner rewrites only the epoch's buckets; an erasure epoch's cost
    is the affected users' buckets, never state-sized. An erasure that
    empties a bucket's every key drops the bucket from the manifest
    (the runner's deleted-bucket path)."""
    dels = delta.filter(F.col("op") == "D").select("user_id").distinct()
    ins = delta.filter(F.col("op") == "I").select(*_EVENT_COLS)
    base = (
        current
        if current is None
        else current.join(F.broadcast(dels), "user_id", "left_anti")
    )
    return scd2_merge(base, ins, batch_id)


def stream_scd2_erase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User erasure through the MAINTAINED table — the right-to-be-
    forgotten verb for SCD2 state, completing the round-11 deletion
    tier (persisted indexes got it in operators/index_delete.py; this
    is the same verb for the versioned MERGE sink): the events stream
    arrives as 3 ``op=I`` epochs and is merged exactly as
    :func:`stream_scd2_maintain` does; then a takedown epoch of
    ``op=D`` rows (users with ``user_id % 5 == 2``) arrives ON THE
    SAME CHECKPOINT (a second ``availableNow`` run over the same
    source dir — the read-while-maintain discipline, so the epoch
    counter keeps the replay guard truthful) and the merge removes
    those users' entire interval chains, rewriting ONLY their
    user-buckets. Oracle: the batch SCD2 history over the REDUCED
    event log (erased users excluded), so a hash-match proves
    **maintain + erase ≡ rebuild-without-the-erased** — no erased
    user's row survives any bucket, every surviving user's chain is
    byte-identical.

    At 100 TB: erasure cost is O(|erased users' buckets' state|) —
    the bucket-aligned runner's whole point — and the version-retention
    GC prunes the pre-erasure generations, so the erased rows leave
    DISK after ``keep_versions`` more epochs, not just the manifest
    (the compliance property: retention bounds how long a tombstoned
    version can linger)."""
    from psd_project_spark.functions.caching import scratch_dir
    from psd_project_spark.streaming.foreach_sink import (
        N_STATE_BUCKETS,
        read_versioned,
        run_foreachbatch_versioned,
        stage_stream_splits_bucketed,
        write_split_with_buckets,
    )

    src = scratch_dir("psd_scd2er_src_")
    out_dir = scratch_dir("psd_scd2er_")
    ckpt = scratch_dir("psd_scd2er_ckpt_")
    ev = load_table(spark, sf_dir, "events").select(*_EVENT_COLS)
    schema = (
        "user_id long, event_id long, ts timestamp, value double, op string"
    )

    def arriving() -> DataFrame:
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .parquet(src)
        )

    def maintain(result: DataFrame) -> None:
        run_foreachbatch_versioned(
            result, out_dir, ckpt, cdc_merge, bucket_by=["user_id"]
        )

    # phase 1: the event stream, 3 real epochs of op=I rows
    stage_stream_splits_bucketed(
        ev.withColumn("op", F.lit("I")), F.col("event_id") % 3, src,
        bucket_by=["user_id"],
    )
    maintain(arriving())
    # phase 2: the takedown epoch — op=D rows land in the SAME source
    # dir, and the SAME checkpoint continues the epoch numbering
    write_split_with_buckets(
        ev.filter(F.col("user_id") % 5 == 2)
        .select("user_id")
        .distinct()
        .select(
            "user_id",
            F.lit(None).cast("long").alias("event_id"),
            F.lit(None).cast("timestamp").alias("ts"),
            F.lit(None).cast("double").alias("value"),
            F.lit("D").alias("op"),
        ),
        f"{src}/erase",
        ["user_id"],
        N_STATE_BUCKETS,
    )
    maintain(arriving())
    return (
        read_versioned(spark, out_dir)
        .select(
            "user_id", "event_id", "valid_from", "valid_to", "value",
            "is_current",
        )
        .orderBy("user_id", "valid_from", "event_id")
    )


#: The batch SCD2 history over the reduced event log: erased users
#: (user_id % 5 == 2) excluded — maintain + erase must equal
#: rebuild-without-the-erased.
SCD2_ERASE_ORACLE = """
SELECT user_id, event_id,
       ts AS valid_from,
       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
         AS valid_to,
       value,
       (lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
          IS NULL) AS is_current
FROM events
WHERE user_id % 5 <> 2
ORDER BY user_id, valid_from, event_id
"""


#: Constant event-time cuts for the time-travel query (the events
#: table spans 2024-01-01..2024-01-30 at every SF, so the cuts are
#: data-independent and shared verbatim with the oracle).
_TT_T1 = "2024-01-11 00:00:00"
_TT_T2 = "2024-01-21 00:00:00"


def scd2_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME TRAVEL over the maintained table — the snapshot-isolation
    read the versioned sink's immutable-version layout exists for:
    three sequential maintenance runs merge the event stream in
    constant event-time slices (ts ≤ T1, T1 < ts ≤ T2, ts > T2); the
    version id published after the SECOND run is captured; the third
    run moves ``current`` past it; and the query reads the CAPTURED
    version — the table exactly as of T2 — while the newest state
    already contains the full log. Oracle: the batch SCD2 history
    over ``events WHERE ts <= T2``, so a hash-match proves an old
    snapshot inside the retention window serves bit-exact state even
    after maintenance has moved on (its manifest pins its generation
    dirs; retention keeps every generation a retained manifest
    references — the Delta/Iceberg ``VERSION AS OF`` contract on
    plain parquet).

    The retention BOUND is part of the story: ``keep_versions=2``
    keeps exactly the captured version and the new current — the
    first run's version is GC'd (pinned by test), so time travel
    reaches back precisely as far as retention pays for, no further.

    At 100 TB: a snapshot read costs the same as a current read (one
    manifest + the pinned generation dirs — no copy, no log replay),
    and the bucket-aligned layout means consecutive versions SHARE
    every untouched bucket's files, so N retained versions cost far
    less than N full copies."""
    from psd_project_spark.functions.caching import scratch_dir

    return run_time_travel(
        spark,
        sf_dir,
        src=scratch_dir("psd_scd2tt_src_"),
        out_dir=scratch_dir("psd_scd2tt_"),
        ckpt=scratch_dir("psd_scd2tt_ckpt_"),
    )


def run_time_travel(
    spark: SparkSession, sf_dir: str, src: str, out_dir: str, ckpt: str
) -> DataFrame:
    """The injectable half of :func:`scd2_time_travel` (dirs supplied
    so the version/retention structure is testable).

    The three slice epochs fold through ``apply_versioned_epoch``
    directly — same kernel, same versions/manifests/retention as the
    streaming runner it replaces here (see :func:`run_change_feed`'s
    optimization note); ``src`` and ``ckpt`` are accepted for
    call-site compatibility and no longer used."""
    import os

    from psd_project_spark.streaming.foreach_sink import (
        apply_versioned_epoch,
        parse_version,
        read_versioned,
    )

    ev = load_table(spark, sf_dir, "events").select(*_EVENT_COLS)
    cuts = [
        F.col("ts") <= _TT_T1,
        (F.col("ts") > _TT_T1) & (F.col("ts") <= _TT_T2),
        F.col("ts") > _TT_T2,
    ]
    # one source pass for all three epochs' affected buckets (see
    # run_change_feed's optimization note)
    # the tag mirrors the epoch filters EXACTLY (no otherwise): a row
    # matching no cut lands in no slice, same as the filters drop it
    slice_buckets = _slice_bucket_sets(
        ev,
        F.when(cuts[0], F.lit(0))
        .when(cuts[1], F.lit(1))
        .when(cuts[2], F.lit(2)),
        n_slices=3,
    )
    pinned = None
    for i, pred in enumerate(cuts):
        apply_versioned_epoch(
            ev.filter(pred), out_dir, i, scd2_merge,
            bucket_by=["user_id"],
            affected_buckets=slice_buckets[i],
        )
        if i == 1:  # the snapshot as of T2
            pinned = parse_version(
                os.readlink(os.path.join(out_dir, "current"))
            )[0]
    return (
        read_versioned(spark, out_dir, version=pinned)
        .select(
            "user_id", "event_id", "valid_from", "valid_to", "value",
            "is_current",
        )
        .orderBy("user_id", "valid_from", "event_id")
    )


def scd2_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHANGE DATA FEED over the maintained table (the Delta/Iceberg
    CDF analog on plain parquet): every maintenance epoch also emits
    the row-level diff it caused — ``I`` rows that entered the state
    table, ``D`` rows that left it (an interval row whose only change
    is its ``is_current`` flag flipping counts as D+I, the standard
    CDF semantics) — so downstream consumers can incrementally
    materialize views of the SCD2 table without re-reading it.

    The diff is computed from the versioned sink's OWN metadata: the
    new version's manifest is compared to the previous one, and only
    the buckets whose generation entry CHANGED are read back on both
    sides (set-difference per side) — unchanged buckets share the
    same files by construction, so they cannot contribute change rows
    and are never read. Change rows are materialized to an
    epoch-keyed sink as they are produced (versions outside the
    retention window are GC'd, so the feed cannot be derived lazily —
    exactly why real CDFs persist change files per commit).

    Three sequential kernel epochs merge the ``event_id % 3`` slices
    (the same deterministic epoch composition the maintenance query
    stages), so the oracle is closed-form: cumulative SCD2 states over the slice
    prefixes, with each epoch's feed = EXCEPT between consecutive
    states (epoch 0 inserts everything). A hash-match proves
    manifest-diff + changed-bucket reads + set-difference emit exactly
    the rows a full-state diff would — while reading only the
    affected buckets.

    At 100 TB: per-epoch CDF cost is O(changed buckets' state), the
    same bound as the merge itself — the feed is a byproduct of state
    the epoch already touched, never a second full-table diff."""
    from psd_project_spark.functions.caching import scratch_dir

    return run_change_feed(
        spark,
        sf_dir,
        src=scratch_dir("psd_scd2cf_src_"),
        state_dir=scratch_dir("psd_scd2cf_state_"),
        feed_dir=scratch_dir("psd_scd2cf_feed_"),
        ckpt=scratch_dir("psd_scd2cf_ckpt_"),
    )


def _slice_bucket_sets(
    ev: DataFrame, slice_tag, n_slices: int
) -> dict[int, list[int]]:
    """Affected-bucket set per epoch slice, in ONE distinct pass over
    the source instead of one per epoch: ``slice_tag`` assigns each
    row its epoch, the bucket expression is the versioned kernel's own
    key→bucket mapping, and the ≤ ``n_slices × N_STATE_BUCKETS``-row
    distinct is a bounded collect. A slice with no rows maps to ``[]``
    (the kernel skips the epoch, exactly as its own collect would)."""
    from psd_project_spark.streaming.foreach_sink import (
        N_STATE_BUCKETS,
        _bucket_expr,
    )

    pairs = (
        ev.select(
            slice_tag.alias("_s"),
            _bucket_expr(["user_id"], N_STATE_BUCKETS).alias("_b"),
        )
        .distinct()
        .collect()
    )
    out: dict[int, list[int]] = {i: [] for i in range(n_slices)}
    for r in pairs:
        if r["_s"] is not None:  # a row no epoch filter accepts
            out[int(r["_s"])].append(int(r["_b"]))
    return {i: sorted(bs) for i, bs in out.items()}


def run_change_feed(
    spark: SparkSession,
    sf_dir: str,
    src: str,
    state_dir: str,
    feed_dir: str,
    ckpt: str,
    on_epoch=None,
) -> DataFrame:
    """The injectable half of :func:`scd2_change_feed`.

    ``on_epoch(i)``, when given, runs after epoch ``i``'s change file
    is durably written — the consumer hook the feed-retention query
    uses to apply-and-checkpoint each epoch (and GC it) while the
    feed is still being produced.

    The three maintenance epochs fold through
    :func:`~psd_project_spark.streaming.foreach_sink.apply_versioned_epoch`
    DIRECTLY — the same public kernel the streaming runner wraps, so
    versions, manifests, replay guard, and retention are identical —
    instead of staging each slice to parquet and restarting an
    ``availableNow`` streaming query over a shared checkpoint per
    epoch (optimization r14, guide §1.2: three stream startups plus
    three single-file staging writes were pure per-epoch overhead for
    a deterministic batch-id composition; the streaming-maintained
    story lives unchanged in :func:`stream_scd2_maintain` /
    :func:`stream_scd2_erase`). ``src`` and ``ckpt`` are accepted for
    call-site compatibility and no longer used.

    The per-epoch diff is ONE tagged aggregation over the changed
    buckets' two generations (``op`` derived from which side a row
    appears on) instead of two ``subtract`` passes — half the
    exchanges and one read of each side (guide §2.3/§2.4); state rows
    are distinct within a version by construction ((user_id,
    event_id) is the interval key), so the group-by reproduces the
    subtract's set semantics exactly."""
    import os

    from psd_project_spark.streaming.foreach_sink import (
        _MANIFEST,
        apply_versioned_epoch,
        load_manifest,
        write_epoch,
    )

    ev = load_table(spark, sf_dir, "events").select(*_EVENT_COLS)
    state_cols = [
        "user_id", "event_id", "valid_from", "valid_to", "value",
        "is_current",
    ]
    # ONE pass over events computes every epoch's affected-bucket set
    # (the kernel would otherwise re-scan + filter the source once per
    # epoch for its distinct-collect — optimization r14, guide §1.2:
    # N epoch passes → 1; the kernel's key-local check still verifies
    # each handed set)
    slice_buckets = _slice_bucket_sets(
        ev, (F.col("event_id") % 3).cast("int"), n_slices=3
    )

    def _apply_slice(i: int) -> None:
        apply_versioned_epoch(
            ev.filter(F.col("event_id") % 3 == i),
            state_dir,
            i,
            scd2_merge,
            bucket_by=["user_id"],
            affected_buckets=slice_buckets[i],
        )

    # Pipeline the producer with its consumers (guide §2.6 — overlap
    # independent jobs): epoch i+1's STATE apply touches only
    # state_dir's next generation, while ``on_epoch(i)`` reads feed
    # epoch i and writes the consumers' own view dirs — disjoint
    # trees, so they run concurrently and the consumer applies
    # back-fill the cores the state merge's tail leaves idle. The
    # ORDER guarantees stand: epoch i's diff is materialized BEFORE
    # the i+1 apply starts (its publish prunes v(i-1)'s generations —
    # the diff's old side), and ``on_epoch(i)`` still runs strictly
    # after epoch i's change file is durable. With no ``on_epoch`` the
    # submit/join collapses to the sequential order.
    from concurrent.futures import ThreadPoolExecutor

    def _emit_feed(
        i: int, prev_manifest: dict[str, str], cur_manifest: dict[str, str]
    ) -> None:
        changed = sorted(
            b
            for b in set(cur_manifest) | set(prev_manifest)
            if cur_manifest.get(b) != prev_manifest.get(b)
        )

        def _side(manifest: dict[str, str]) -> DataFrame:
            paths = [
                os.path.join(state_dir, manifest[b])
                for b in changed
                if b in manifest
            ]
            if not paths:
                return spark.createDataFrame([], ", ".join(
                    f"{c} {t}" for c, t in zip(
                        state_cols,
                        ("long", "long", "timestamp", "timestamp",
                         "double", "boolean"),
                    )
                ))
            return spark.read.parquet(*paths).select(*state_cols)

        new_rows, old_rows = _side(cur_manifest), _side(prev_manifest)
        # one-pass diff: new side tags 1, old side 2 — a row in both
        # versions sums to 3 and cancels; 1 = inserted, 2 = deleted
        feed = (
            new_rows.select(*state_cols, F.lit(1).alias("_side"))
            .unionByName(
                old_rows.select(*state_cols, F.lit(2).alias("_side"))
            )
            .groupBy(*state_cols)
            .agg(F.sum("_side").alias("_s"))
            .filter(F.col("_s") != 3)
            .select(
                F.lit(i).alias("epoch"),
                F.when(F.col("_s") == 1, F.lit("I"))
                .otherwise(F.lit("D"))
                .alias("op"),
                *state_cols,
            )
        )
        # materialize NOW: the prev version's generations leave the
        # retention window on later epochs. Bucket-partitioned on the
        # view consumers' own key→bucket mapping (write_epoch with
        # bucket_by): apply_feed_epoch then reads the epoch's affected
        # buckets off the directory names instead of paying a
        # distinct-collect pass over the delta per consumer apply
        # (optimization r14, guide §1.2 — at scale one produce-side
        # exchange replaces one delta pass PER consumer)
        write_epoch(feed, feed_dir, i, bucket_by=["user_id"])

    def _produce(i: int, prev: dict[str, str]) -> dict[str, str]:
        # one producer epoch: state apply + manifest load + feed emit,
        # CHAINED so epoch i's diff is always materialized before
        # epoch i+1's publish (retention prunes v(i-1)'s generations —
        # the diff's old side)
        _apply_slice(i)
        cur, _ = load_manifest(
            os.path.join(state_dir, "current", _MANIFEST)
        )
        _emit_feed(i, prev, cur)
        return cur

    # Pipeline the WHOLE producer epoch (state apply + feed emit, r15;
    # r14 overlapped only the state apply) one epoch ahead of its
    # consumers: _produce(i+1) writes state_dir's next generation and
    # feed epoch i+1's directory, while ``on_epoch(i)`` reads feed
    # epoch ≤ i and writes the consumers' own view dirs — disjoint
    # trees (consumer GC deletes only epochs < its cut ≤ i, never the
    # in-flight i+1 dir). ``on_epoch(i)`` still runs strictly after
    # epoch i's change file is durable; consumers may now OBSERVE
    # epoch i+1 already existing while they fold epoch i — exactly a
    # real CDF's producer-runs-ahead behavior (the r12 retention pin
    # asserts the GC property, not producer lockstep).
    with ThreadPoolExecutor(max_workers=1) as pool:
        cur_manifest = _produce(0, {})
        for i in range(3):
            nxt = (
                pool.submit(_produce, i + 1, cur_manifest)
                if i + 1 < 3
                else None
            )
            try:
                if on_epoch is not None:
                    on_epoch(i)
            finally:
                # the background producer's exception must never be
                # silently dropped behind a consumer-side error
                # (ADVICE r14 #2); if both legs raised, the consumer
                # error rides along as __context__
                if nxt is not None:
                    cur_manifest = nxt.result()
    return (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(feed_dir)
        .select("epoch", "op", *state_cols)
        .orderBy("epoch", "op", "user_id", "valid_from", "event_id")
    )


def cdf_materialized_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The change feed's CONSUMER — an incrementally-maintained
    materialized view (per-user row count, exact value mass, open
    intervals) derived from the FEED ALONE, never from the state
    table: each ``I`` row contributes positively, each ``D`` row
    negatively, and because the aggregates are abelian (counts and
    DECIMAL sums — subtraction is exact, unlike floats) the
    epoch-by-epoch application telescopes to one signed aggregate
    over the feed. That is the materialized-view-maintenance
    contract a CDF exists to enable: the oracle computes the same
    view straight from the final SCD2 state, so a hash-match proves
    the feed carries EXACTLY the information needed to keep any
    abelian view current — an interval row updated in place (D+I at
    the same user) cancels in the count, adjusts the value mass by
    the delta, and flips ``n_current`` correctly.

    At 100 TB: the view consumer reads ONLY the per-epoch change
    files (delta-shaped, the CDF's O(changed buckets) bound) and its
    own state — never the maintained table — which is what makes
    downstream aggregate freshness O(delta) instead of
    O(state-rescan) per epoch."""
    from psd_project_spark.functions.caching import scratch_dir

    feed = run_change_feed(
        spark,
        sf_dir,
        src=scratch_dir("psd_cdfmv_src_"),
        state_dir=scratch_dir("psd_cdfmv_state_"),
        feed_dir=scratch_dir("psd_cdfmv_feed_"),
        ckpt=scratch_dir("psd_cdfmv_ckpt_"),
    )
    sign = F.when(F.col("op") == "I", F.lit(1)).otherwise(F.lit(-1))
    dec = "decimal(27,15)"
    return (
        feed.groupBy("user_id")
        .agg(
            F.sum(sign).cast("long").alias("n_rows"),
            F.round(
                F.sum((sign * F.col("value")).cast(dec)).cast("double"), 6
            ).alias("sum_value"),
            F.sum(
                F.when(F.col("is_current"), sign).otherwise(F.lit(0))
            ).cast("long").alias("n_current"),
        )
        .orderBy("user_id")
    )


_CONSUMERS = "_consumers"


def register_feed_consumer(feed_dir: str, name: str) -> None:
    """Register a change-feed consumer BEFORE the feed starts
    producing (VERDICT r12 #3): feed GC advances only to the MINIMUM
    applied epoch across registered consumers, and a just-registered
    consumer holds progress -1 — so no epoch is deleted before every
    registered consumer has applied it. Idempotent: re-registering an
    active consumer never rolls its progress back. An EVICTED name
    (``max_lag`` policy, VERDICT r13 #2) is refused: blind
    re-registration at -1 would re-pin GC at the very lag that got it
    evicted — it must :func:`bootstrap_view` from a live snapshot and
    :func:`rejoin_feed_consumer` at that snapshot's epoch instead."""
    import os

    if os.path.exists(_tombstone_path(feed_dir, name)):
        raise ValueError(
            f"consumer {name!r} was evicted from {feed_dir} for lagging "
            f"past the feed's max_lag — re-bootstrap its view from a "
            f"live snapshot (bootstrap_view) and rejoin_feed_consumer "
            f"at that snapshot's epoch"
        )
    cdir = os.path.join(feed_dir, _CONSUMERS)
    os.makedirs(cdir, exist_ok=True)
    marker = os.path.join(cdir, name)
    if not os.path.exists(marker):
        _record_consumer_progress(feed_dir, name, -1)


def _record_consumer_progress(feed_dir: str, name: str, epoch: int) -> None:
    """Atomically max-merge ``name``'s applied-epoch marker (a replay
    must never move progress backwards).

    Single-owner contract (ADVICE r13): each consumer NAME must have
    exactly one owning process — the read-max-write here is atomic
    against readers (tmp + replace) but not against a concurrent
    writer under the SAME name, which could replace a higher marker
    with a lower one. Losing a marker update is conservative (GC
    over-holds, reported progress goes stale) but never deletes an
    epoch early. This matches the single-writer discipline every
    other on-disk structure in this repo documents; distinct consumer
    names may progress concurrently without restriction."""
    import os

    cdir = os.path.join(feed_dir, _CONSUMERS)
    os.makedirs(cdir, exist_ok=True)
    marker = os.path.join(cdir, name)
    if not os.path.exists(marker) and os.path.exists(
        _tombstone_path(feed_dir, name)
    ):
        # the consumer was EVICTED while this apply was in flight (a
        # concurrent max_lag apply unlinked the marker and left a
        # tombstone): re-creating the marker here would re-pin feed GC
        # at the very lag that got it evicted — forever, since the
        # tombstone blocks all its future applies. Drop the update;
        # this consumer's next apply fails loudly with the
        # re-bootstrap instruction. (A rejoin unlinks the tombstone
        # BEFORE re-recording progress, so rejoins pass this guard.)
        return
    if os.path.exists(marker):
        try:
            with open(marker) as fh:
                epoch = max(epoch, int(fh.read()))
        except FileNotFoundError:
            # unlinked by a concurrent eviction between the exists()
            # check and the read (ADVICE r14 #1) — fall back to the
            # caller's epoch; the post-replace tombstone re-check
            # below decides whether the write may stand
            pass
    tmp = os.path.join(cdir, f".{name}.tmp")
    with open(tmp, "w") as fh:
        fh.write(str(epoch))
    os.replace(tmp, marker)
    # Eviction wins deterministically (ADVICE r14 #1): a concurrent
    # max_lag apply may have tombstoned this consumer between the
    # guard above and the replace — the just-written marker would
    # resurrect it and re-pin feed GC forever (the tombstone blocks
    # all its future applies). Re-check and retract. (A rejoin unlinks
    # the tombstone BEFORE re-recording progress, so rejoin markers
    # stand.)
    if os.path.exists(_tombstone_path(feed_dir, name)):
        import contextlib

        with contextlib.suppress(FileNotFoundError):
            os.unlink(marker)


def feed_consumer_progress(feed_dir: str) -> dict[str, int]:
    """Every registered consumer's applied epoch (-1 = registered,
    nothing applied yet)."""
    import os

    cdir = os.path.join(feed_dir, _CONSUMERS)
    out: dict[str, int] = {}
    if os.path.isdir(cdir):
        for name in os.listdir(cdir):
            if name.startswith("."):
                continue
            try:
                with open(os.path.join(cdir, name)) as fh:
                    out[name] = int(fh.read())
            except FileNotFoundError:
                # evicted between the listing and the read (distinct
                # consumers may apply concurrently — guide §2.6): a
                # vanished marker means the consumer no longer pins GC
                continue
    return out


def _tombstone_path(feed_dir: str, name: str) -> str:
    import os

    # dot-prefixed so feed_consumer_progress's listing skips it
    return os.path.join(feed_dir, _CONSUMERS, f".evicted.{name}.json")


def evicted_feed_consumers(feed_dir: str) -> dict[str, dict]:
    """Every evicted consumer's tombstone (the loud record VERDICT r13
    #2 requires): ``{name: {"progress": last applied epoch,
    "evicted_at_epoch": the frontier that evicted it, "max_lag": the
    cap it broke}}``."""
    import json
    import os

    cdir = os.path.join(feed_dir, _CONSUMERS)
    out: dict[str, dict] = {}
    if os.path.isdir(cdir):
        for f in os.listdir(cdir):
            if f.startswith(".evicted.") and f.endswith(".json"):
                with open(os.path.join(cdir, f)) as fh:
                    out[f[len(".evicted."):-len(".json")]] = json.load(fh)
    return out


def _evict_lagging_consumers(
    feed_dir: str, progress: dict[str, int], frontier: int, max_lag: int
) -> dict[str, int]:
    """Evict every registered consumer lagging more than ``max_lag``
    epochs behind ``frontier`` (VERDICT r13 #2 — without a lag cap, a
    consumer that registers and then dies holds progress -1 forever
    and feed storage grows without bound): its progress marker is
    REMOVED (so it no longer pins the GC cut) and a tombstone records
    why. Returns the surviving progress map. The eviction is loud on
    the evictee's side too: its next apply of a GC'd epoch fails with
    the re-bootstrap instruction, and :func:`register_feed_consumer`
    refuses the tombstoned name until :func:`rejoin_feed_consumer`."""
    import contextlib
    import json
    import os

    import threading

    for name, p in list(progress.items()):
        if frontier - p <= max_lag:
            continue
        tomb = _tombstone_path(feed_dir, name)
        # two concurrent applies (distinct consumers — guide §2.6) may
        # both see the same laggard and both evict it: each writes its
        # (equally valid) tombstone under a WRITER-UNIQUE tmp name — a
        # shared tmp would let one evictor replace the file out from
        # under the other mid-write (torn JSON at the tombstone, and
        # an unhandled FileNotFoundError on the loser's replace) — and
        # only one unlink finds the marker
        tmp = f"{tomb}.{os.getpid()}.{threading.get_ident()}.tmp"
        with open(tmp, "w") as fh:
            json.dump(
                {
                    "progress": p,
                    "evicted_at_epoch": frontier,
                    "max_lag": max_lag,
                },
                fh,
                sort_keys=True,
            )
        os.replace(tmp, tomb)
        with contextlib.suppress(FileNotFoundError):
            os.unlink(os.path.join(feed_dir, _CONSUMERS, name))
        del progress[name]
    return progress


def rejoin_feed_consumer(feed_dir: str, name: str, epoch: int) -> None:
    """Re-admit an EVICTED consumer at ``epoch`` — the epoch of the
    snapshot it re-bootstrapped from (:func:`bootstrap_view`), never
    -1: a rejoin may not re-pin the GC cut below what eviction already
    released. The tombstone is consumed (annotated with the rejoin,
    kept dot-prefixed for audit) and a fresh progress marker is
    written at ``epoch``."""
    import json
    import os

    tomb = _tombstone_path(feed_dir, name)
    if not os.path.exists(tomb):
        raise ValueError(
            f"consumer {name!r} has no eviction tombstone in {feed_dir} "
            f"— use register_feed_consumer for a first registration"
        )
    with open(tomb) as fh:
        record = json.load(fh)
    if epoch < 0 or epoch < record["progress"]:
        # a rejoin below the evictee's own last progress (or at the
        # registered-but-never-applied -1) would re-pin GC at the very
        # lag that caused the eviction — the bootstrapped snapshot's
        # epoch is necessarily at least that far along
        raise ValueError(
            f"rejoin epoch {epoch} is behind consumer {name!r}'s "
            f"evicted progress {record['progress']} — bootstrap from a "
            f"LIVE snapshot and rejoin at its applied epoch"
        )
    record["rejoined_at_epoch"] = epoch
    rejoined = os.path.join(
        feed_dir, _CONSUMERS, f".rejoined.{name}.json"
    )
    tmp = rejoined + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(record, fh, sort_keys=True)
    os.replace(tmp, rejoined)
    os.unlink(tomb)
    _record_consumer_progress(feed_dir, name, epoch)


def bootstrap_view(src_view_dir: str, dst_view_dir: str) -> int:
    """Re-bootstrap an evicted consumer's view from a live consumer's
    newest published snapshot (the restart story of VERDICT r13 #2):
    the destination view is REPLACED by a copy of the source view's
    version dirs, generation buckets, and ``current`` symlink, so the
    evicted consumer resumes as if it had applied everything the
    source had — it then owes exactly the feed epochs after the
    returned applied-epoch number, which min-progress GC (with its
    rejoined marker) keeps on disk. Copy cost is one snapshot
    (≤ keep_versions × |view|), the same bound serving reads already
    pay — never the GC'd feed history, which no longer exists."""
    import os
    import shutil

    if not os.path.lexists(os.path.join(src_view_dir, "current")):
        raise FileNotFoundError(
            f"source view {src_view_dir} has no published snapshot"
        )
    if os.path.isdir(dst_view_dir):
        shutil.rmtree(dst_view_dir)
    shutil.copytree(src_view_dir, dst_view_dir, symlinks=True)
    from psd_project_spark.streaming.foreach_sink import parse_version

    return parse_version(
        os.readlink(os.path.join(dst_view_dir, "current"))
    )[0]


_VIEW_APPLIED = "_FEED_APPLIED"


def _record_view_applied(view_dir: str, epoch: int) -> None:
    """Max-merge the view-level applied-epoch marker (ADVICE r13 #1):
    the snapshot symlink alone under-reports progress when an epoch's
    fold publishes nothing (empty / no-affected-bucket delta leaves
    the symlink at the last DATA epoch), so a crash-replay of such an
    epoch after GC would spuriously hit the feed-gone error path.
    This marker records every APPLIED epoch — published or not — and
    the replay guard reads the max of both."""
    import os

    os.makedirs(view_dir, exist_ok=True)
    marker = os.path.join(view_dir, _VIEW_APPLIED)
    if os.path.exists(marker):
        with open(marker) as fh:
            epoch = max(epoch, int(fh.read()))
    tmp = marker + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(str(epoch))
    os.replace(tmp, marker)


def _view_applied(view_dir: str) -> int:
    import os

    marker = os.path.join(view_dir, _VIEW_APPLIED)
    if os.path.exists(marker):
        with open(marker) as fh:
            return int(fh.read())
    return -1


def apply_feed_epoch(
    spark: SparkSession,
    feed_dir: str,
    view_dir: str,
    epoch: int,
    consumer: str | None = None,
    max_lag: int | None = None,
) -> None:
    """Apply one change-feed epoch to the persisted view snapshot,
    publish the new snapshot atomically, and GC everything consumer
    progress has paid for — the feed-retention contract (VERDICT r11
    #8): change files live exactly as long as some consumer still
    needs them, and a restarted consumer replays from its newest
    snapshot plus the epochs at-or-after it, never from the (gone)
    full feed.

    Snapshot state per user: (n_rows, sum_value_dec DECIMAL —
    subtraction-exact, so telescoping holds bit-exact — n_current),
    maintained BUCKET-ALIGNED on user_id through the versioned sink's
    own epoch kernel (``apply_versioned_epoch``, VERDICT r12 #6): an
    epoch folds its delta-sized signed aggregate into ONLY the
    buckets holding changed users — untouched buckets' snapshot files
    are never read or rewritten (pinned byte-identical by
    tests/test_round13_ops.py) — then publishes by atomic symlink
    repoint with the kernel's replay guard (a re-applied epoch is a
    no-op) and two-version retention (the previous snapshot is the
    replay window).

    Multi-consumer retention (VERDICT r12 #3): with ``consumer`` set,
    this apply records the consumer's progress in the feed's registry
    (``register_feed_consumer``) and feed epochs are GC'd only up to
    the MINIMUM progress across ALL registered consumers — a slower
    consumer's unapplied epochs survive a faster one's applies. With
    ``consumer=None`` (the single-consumer form) GC advances with
    this apply alone, exactly as before.

    Dead-consumer eviction (VERDICT r13 #2): with ``max_lag`` set,
    any REGISTERED consumer lagging more than ``max_lag`` epochs
    behind this apply's epoch is evicted — its marker no longer pins
    the GC cut, a tombstone records the eviction
    (:func:`evicted_feed_consumers`), and it must re-bootstrap from a
    live snapshot (:func:`bootstrap_view`) and
    :func:`rejoin_feed_consumer` before consuming again. That bounds
    feed storage by ``max_lag`` × per-epoch delta size even when a
    registered consumer crashes and never returns — the Kafka
    consumer-group session-timeout / Delta CDF retention-TTL
    contract. With ``max_lag=None`` registered progress pins GC
    forever, exactly as before."""
    import os
    import re
    import shutil

    from psd_project_spark.streaming.foreach_sink import (
        apply_versioned_epoch,
        parse_version,
    )

    # replay guard BEFORE touching the feed (a replayed apply's change
    # file may already be GC'd — the guard must not depend on it): the
    # snapshot symlink records the last PUBLISHED epoch, and the
    # view-level applied marker (ADVICE r13 #1) covers epochs whose
    # fold published nothing (empty / no-affected-bucket delta) — the
    # max of the two is the view's true progress, read here so the
    # eager parquet-schema resolution below never runs for an
    # already-applied epoch. The calling consumer's own feed marker is
    # honored too (it is recorded only after this view applied the
    # epoch, so marker ≥ epoch implies THIS view is past it) — but
    # never OTHER consumers' markers: those track different views.
    if consumer is not None and os.path.exists(
        _tombstone_path(feed_dir, consumer)
    ):
        # an evicted-but-alive consumer must not slip back in through
        # an ordinary apply (its marker would re-pin GC while the
        # tombstone still reports it evicted) — the same refusal
        # register_feed_consumer gives, with the same way back
        raise ValueError(
            f"consumer {consumer!r} was evicted from {feed_dir} for "
            f"lagging past the feed's max_lag — re-bootstrap its view "
            f"from a live snapshot (bootstrap_view) and "
            f"rejoin_feed_consumer at that snapshot's epoch before "
            f"applying again"
        )
    current_link = os.path.join(view_dir, "current")
    applied = (
        parse_version(os.readlink(current_link))[0]
        if os.path.lexists(current_link)
        else -1
    )
    applied = max(applied, _view_applied(view_dir))
    if consumer is not None:
        applied = max(
            applied, feed_consumer_progress(feed_dir).get(consumer, -1)
        )
    if epoch > applied:
        feed_path = os.path.join(feed_dir, f"batch_id={epoch}")
        if not os.path.isdir(feed_path):
            raise FileNotFoundError(
                f"change-feed epoch {epoch} is gone from {feed_dir} but "
                f"the view at {view_dir} never applied it (applied="
                f"{applied}) — the feed was GC'd past an unfinished "
                f"consumer; register consumers before the feed starts"
            )
        sign = F.when(F.col("op") == "I", F.lit(1)).otherwise(F.lit(-1))
        dec = "decimal(27,15)"
        delta = (
            spark.read.parquet(feed_path)
            .groupBy("user_id")
            .agg(
                F.sum(sign).cast("long").alias("n_rows"),
                F.sum((sign * F.col("value")).cast(dec))
                .cast(dec)
                .alias("sum_value_dec"),
                F.sum(F.when(F.col("is_current"), sign).otherwise(F.lit(0)))
                .cast("long")
                .alias("n_current"),
            )
        )

        def fold(current: DataFrame | None, df: DataFrame, batch_id: int):
            # abelian fold: key-local over user_id by construction
            # (every output user comes from the presented state or
            # the delta)
            if current is None:
                return df
            return (
                current.unionByName(df)
                .groupBy("user_id")
                .agg(
                    F.sum("n_rows").cast("long").alias("n_rows"),
                    F.sum("sum_value_dec").cast(dec).alias("sum_value_dec"),
                    F.sum("n_current").cast("long").alias("n_current"),
                )
                .filter(F.col("n_rows") != 0)
            )

        # A feed epoch written bucket-partitioned (run_change_feed via
        # write_epoch's bucket_by) carries its affected-bucket set in
        # its directory names — the aggregation by user_id preserves
        # the user set exactly, so the delta's buckets ARE the change
        # file's buckets. Handing them to the kernel skips the
        # distinct-collect job and leaves the delta consumed by ONE
        # action, so no persist is needed either (optimization r14,
        # guide §1.2/§5; the kernel's key-local check still verifies
        # the handed set). Legacy/synthetic flat epochs (tests,
        # pre-r14 feeds) keep the persist + kernel-collect path: there
        # the aggregate feeds two actions.
        feed_buckets = sorted(
            int(d.split("=", 1)[1])
            for d in os.listdir(feed_path)
            if d.startswith("_bucket=")
        )
        if feed_buckets:
            apply_versioned_epoch(
                delta,
                view_dir,
                epoch,
                fold,
                bucket_by=["user_id"],
                affected_buckets=feed_buckets,
            )
        else:
            delta.persist()
            try:
                apply_versioned_epoch(
                    delta, view_dir, epoch, fold, bucket_by=["user_id"]
                )
            finally:
                delta.unpersist()
    # the view marker is recorded BEFORE the feed marker and GC: a
    # crash between them leaves the view provably applied (replay is
    # a guarded no-op) while the feed conservatively over-retains
    _record_view_applied(view_dir, epoch)
    # progress + GC run even on a replayed (guarded no-op) apply: a
    # consumer that crashed after publish but before recording its
    # progress still owes the marker, and both steps are monotone
    progress = feed_consumer_progress(feed_dir)
    if consumer is not None:
        _record_consumer_progress(feed_dir, consumer, epoch)
        progress[consumer] = max(progress.get(consumer, -1), epoch)
    if max_lag is not None:
        progress = _evict_lagging_consumers(
            feed_dir, progress, epoch, max_lag
        )
    if consumer is not None:
        cut = min(progress.values())
    else:
        # the single-consumer form still honors any REGISTERED
        # consumers' progress: one consumer=None apply must not
        # delete epochs a registered-but-slower consumer needs
        cut = min([epoch, *progress.values()])
    for d in os.listdir(feed_dir):  # consumer progress pays for GC
        m = re.fullmatch(r"batch_id=(\d+)", d)
        if m and int(m.group(1)) < cut:
            shutil.rmtree(os.path.join(feed_dir, d), ignore_errors=True)


def cdf_feed_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FEED LIFECYCLE for the change data feed (VERDICT r11 #8 —
    :func:`scd2_change_feed` persisted one epoch dir per epoch
    forever): the same maintained-view consumer as
    :func:`cdf_materialized_view`, but applied ONLINE through the
    ``on_epoch`` hook — each epoch's change file is folded into a
    persisted per-user snapshot, the snapshot is published
    atomically, and then the feed epochs consumer progress has paid
    for are DELETED while the feed is still being produced (pinned
    mid-run by tests/test_round12_ops.py: after epoch i applies, only
    epoch i's change file remains). The answer is served from the
    final snapshot alone — the full feed no longer exists to consult.
    Oracle: :data:`CDF_VIEW_ORACLE` VERBATIM — retention must change
    nothing about what the view converges to.

    Restart story: the previous snapshot is retained alongside the
    newest, so a consumer that crashes mid-apply replays from its
    last published snapshot plus the not-yet-GC'd epochs (everything
    at-or-after that snapshot) — the checkpoint-consumers-then-expire
    discipline of a real CDF (Delta's CDF retention /
    Kafka-compacted-topic consumer offsets).

    At 100 TB: feed storage is bounded by (epochs in flight between
    producer and slowest consumer) × per-epoch delta size instead of
    stream lifetime; the view apply stays O(delta + |snapshot|) per
    epoch with the snapshot itself user-partitioned."""
    from psd_project_spark.functions.caching import scratch_dir

    feed_dir = scratch_dir("psd_cdfret_feed_")
    view_dir = scratch_dir("psd_cdfret_view_")
    run_change_feed(
        spark,
        sf_dir,
        src=scratch_dir("psd_cdfret_src_"),
        state_dir=scratch_dir("psd_cdfret_state_"),
        feed_dir=feed_dir,
        ckpt=scratch_dir("psd_cdfret_ckpt_"),
        on_epoch=lambda i: apply_feed_epoch(spark, feed_dir, view_dir, i),
    )
    return _read_view_snapshot(spark, view_dir)


def _read_view_snapshot(spark: SparkSession, view_dir: str) -> DataFrame:
    """The maintained view's serving read: resolve the newest snapshot
    through the versioned kernel's manifest (bucket-aligned since
    VERDICT r12 #6)."""
    from psd_project_spark.streaming.foreach_sink import read_versioned

    return (
        read_versioned(spark, view_dir)
        .select(
            "user_id",
            "n_rows",
            F.round(F.col("sum_value_dec").cast("double"), 6).alias(
                "sum_value"
            ),
            "n_current",
        )
        .orderBy("user_id")
    )


def _views_with_disagreement(views: list[DataFrame]) -> DataFrame:
    """Union-distinct of the final views PLUS, for each non-reference
    view, its symmetric difference against ``views[0]`` (unioned in
    again, row-duplicating any disagreement) — the convergence-proof
    frame of :func:`cdf_multi_consumer` / :func:`cdf_consumer_eviction`,
    computed in ONE tagged aggregation pass instead of
    2·(len(views)−1) ``exceptAll`` passes plus a ``distinct``
    (optimization r14, guide §2.3/§2.4: every exceptAll is its own
    union+aggregate exchange re-reading both sides). Each view holds
    at most one row per user (a per-user aggregate), so presence is
    0/1 per view and the bitmask sum reconstructs every set op
    exactly: a row emits once for the union-distinct plus once per
    reference↔other disagreement — the same multiset the exceptAll
    form produced (and the same oracle match: any disagreement still
    lands as duplicate rows that break the count/hash)."""
    cols = views[0].columns
    tagged = views[0].select(*cols, F.lit(1).alias("_v"))
    for k, v in enumerate(views[1:], start=1):
        tagged = tagged.unionByName(
            v.select(*cols, F.lit(1 << k).alias("_v"))
        )
    s = F.col("_vs")
    in_ref = s.bitwiseAND(1) > 0
    mult = F.lit(1)
    for k in range(1, len(views)):
        mult = mult + F.when(
            in_ref != (s.bitwiseAND(1 << k) > 0), 1
        ).otherwise(0)
    return (
        tagged.groupBy(*cols)
        .agg(F.sum("_v").alias("_vs"))
        .select(*cols, F.explode(F.sequence(F.lit(1), mult)).alias("_i"))
        .select(*cols)
    )


def cdf_multi_consumer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTI-CONSUMER feed retention (VERDICT r12 #3 — the missing
    piece of the CDF lifecycle: real feeds retain to the MINIMUM
    progress across registered consumers, not to whoever applied
    last): TWO registered consumers maintain independent snapshots of
    the same view from one change feed — ``fast`` applies every epoch
    as it is produced, ``slow`` applies in arrears, two epochs at a
    time — so for most of the run the feed's GC is pinned by the
    slower consumer (pinned mid-run by tests/test_round13_ops.py:
    after ``fast`` applies epoch 1, epoch 0's change file still
    exists because ``slow`` hasn't consumed it; once ``slow``
    catches up it is deleted). After the stream ends ``slow`` drains
    the remaining epochs. Result: the union-distinct of both final
    views PLUS their symmetric difference (unioned in again,
    row-duplicating any disagreement) — it matches
    :data:`CDF_VIEW_ORACLE` row-for-row iff the views are EQUAL and
    correct: a row one consumer misses or invents lands in the
    symmetric difference and breaks the count/hash, so the driver row
    proves convergence of each, not just of their union.

    At 100 TB: retention cost is (epochs between the fastest and
    slowest registered consumer) × per-epoch delta size — the Kafka
    consumer-group / Delta CDF retention contract — while each
    consumer's apply stays O(delta + affected snapshot buckets)."""
    from psd_project_spark.functions.caching import scratch_dir

    feed_dir = scratch_dir("psd_cdfmc_feed_")
    view_fast = scratch_dir("psd_cdfmc_vfast_")
    view_slow = scratch_dir("psd_cdfmc_vslow_")
    register_feed_consumer(feed_dir, "fast")
    register_feed_consumer(feed_dir, "slow")

    from concurrent.futures import ThreadPoolExecutor

    pool = ThreadPoolExecutor(max_workers=1)

    def on_epoch(i: int) -> None:
        if i % 2 == 1:  # slow consumes in arrears, two epochs at a time
            # independent consumers apply concurrently (guide §2.6 —
            # distinct names, distinct view dirs; GC cuts only advance
            # monotonically under either interleaving): fast folds
            # epoch i while slow catches up on i-1, then slow's own
            # fold of i runs after both (it needs slow's i-1 state)
            fut = pool.submit(
                apply_feed_epoch,
                spark, feed_dir, view_fast, i, consumer="fast",
            )
            try:
                apply_feed_epoch(
                    spark, feed_dir, view_slow, i - 1, consumer="slow"
                )
            finally:
                # never drop the concurrent fast-apply's exception
                # behind a slow-side error (ADVICE r14 #2)
                fut.result()
            apply_feed_epoch(spark, feed_dir, view_slow, i, consumer="slow")
        else:
            apply_feed_epoch(spark, feed_dir, view_fast, i, consumer="fast")

    try:
        run_change_feed(
            spark,
            sf_dir,
            src=scratch_dir("psd_cdfmc_src_"),
            state_dir=scratch_dir("psd_cdfmc_state_"),
            feed_dir=feed_dir,
            ckpt=scratch_dir("psd_cdfmc_ckpt_"),
            on_epoch=on_epoch,
        )
    finally:
        pool.shutdown(wait=True)
    # drain: the slow consumer applies whatever epochs it still owes
    # (everything after its recorded progress is still on disk — that
    # is exactly what minimum-progress GC guarantees)
    import os
    import re

    slow_progress = feed_consumer_progress(feed_dir)["slow"]
    owed = sorted(
        int(m.group(1))
        for d in os.listdir(feed_dir)
        if (m := re.fullmatch(r"batch_id=(\d+)", d))
        if int(m.group(1)) > slow_progress
    )
    for i in owed:
        apply_feed_epoch(spark, feed_dir, view_slow, i, consumer="slow")
    fast = _read_view_snapshot(spark, view_fast)
    slow = _read_view_snapshot(spark, view_slow)
    return _views_with_disagreement([fast, slow]).orderBy("user_id")


def cdf_consumer_eviction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DEAD-CONSUMER EVICTION for CDF feed retention (VERDICT r13 #2
    — minimum-progress GC is only as live as its slowest REGISTERED
    consumer, so a consumer that registers and then dies pins feed
    storage forever): THREE consumers register before the feed starts
    — ``fast`` applies every epoch, ``lazy`` applies one epoch in
    arrears, and ``dead`` registers and then goes silent. Every apply
    runs under ``max_lag=2``: when ``fast`` applies epoch 2, ``dead``
    (still at -1, lag 3) breaks the cap and is EVICTED — a tombstone
    records it, its marker stops pinning the GC cut, and epoch 0's
    change file is deleted within the same stream even though the
    evicted consumer never consumed it (pinned mid-run by
    tests/test_round14_ops.py). ``dead`` then recovers exactly as a
    real consumer-group member would: it re-bootstraps its view from
    ``lazy``'s live snapshot (:func:`bootstrap_view` — one snapshot
    copy, never the GC'd feed history, which no longer exists),
    rejoins at that snapshot's epoch (:func:`rejoin_feed_consumer` —
    blind re-registration at -1 is refused), and applies the epochs
    min-progress GC retained for its rejoined marker. Result: the
    union-distinct of all THREE final views plus the symmetric
    differences of ``fast`` against each of the others (unioned in,
    row-duplicating any disagreement) — it matches
    :data:`CDF_VIEW_ORACLE` row-for-row iff all three views are EQUAL
    and correct, so the driver row proves the evicted consumer
    converged through the bootstrap path, not around it.

    At 100 TB: ``max_lag`` bounds feed storage at max_lag × per-epoch
    delta size no matter what crashes — the Kafka consumer-group
    session-timeout / Delta CDF retention-TTL contract — while the
    recovery path costs one snapshot copy plus the in-cap epochs,
    never a feed-lifetime replay."""
    import os
    import re

    from psd_project_spark.functions.caching import scratch_dir

    feed_dir = scratch_dir("psd_cdfev_feed_")
    view_fast = scratch_dir("psd_cdfev_vfast_")
    view_lazy = scratch_dir("psd_cdfev_vlazy_")
    view_dead = scratch_dir("psd_cdfev_vdead_")
    register_feed_consumer(feed_dir, "fast")
    register_feed_consumer(feed_dir, "lazy")
    register_feed_consumer(feed_dir, "dead")

    from concurrent.futures import ThreadPoolExecutor

    pool = ThreadPoolExecutor(max_workers=1)

    def on_epoch(i: int) -> None:
        if i == 1:
            # independent consumers apply concurrently (guide §2.6):
            # no eviction can fire at frontier 1 (dead's lag is exactly
            # the cap), so the pair is order-free. Epoch 2 — the
            # eviction epoch — stays strictly sequential below: fast's
            # apply must evict ``dead`` BEFORE lazy's GC computes the
            # cut, so the epoch-0 deletion this lifecycle asserts on
            # is deterministic.
            fut = pool.submit(
                apply_feed_epoch,
                spark, feed_dir, view_fast, i, consumer="fast",
                max_lag=2,
            )
            try:
                apply_feed_epoch(
                    spark, feed_dir, view_lazy, i - 1, consumer="lazy",
                    max_lag=2,
                )
            finally:
                # never drop the concurrent fast-apply's exception
                # behind a lazy-side error (ADVICE r14 #2)
                fut.result()
            return
        apply_feed_epoch(
            spark, feed_dir, view_fast, i, consumer="fast", max_lag=2
        )
        if i >= 1:  # lazy consumes one epoch in arrears
            apply_feed_epoch(
                spark, feed_dir, view_lazy, i - 1, consumer="lazy",
                max_lag=2,
            )

    try:
        run_change_feed(
            spark,
            sf_dir,
            src=scratch_dir("psd_cdfev_src_"),
            state_dir=scratch_dir("psd_cdfev_state_"),
            feed_dir=feed_dir,
            ckpt=scratch_dir("psd_cdfev_ckpt_"),
            on_epoch=on_epoch,
        )
        # the lifecycle's point: the silent consumer WAS evicted (epoch
        # 2 put it 3 > max_lag behind) and GC advanced past its
        # progress — fail loudly rather than return a row that proves
        # nothing
        if "dead" not in evicted_feed_consumers(feed_dir):
            raise RuntimeError(
                "dead consumer was not evicted at max_lag=2"
            )
        if os.path.isdir(os.path.join(feed_dir, "batch_id=0")):
            raise RuntimeError("eviction did not release epoch 0 for GC")
        # recovery: bootstrap from the lazy consumer's snapshot
        # (applied epoch 1 — so the rejoined consumer still has an
        # epoch to earn), rejoin at it, then both catch up from the
        # retained feed
        boot = bootstrap_view(view_lazy, view_dead)
        rejoin_feed_consumer(feed_dir, "dead", boot)
        # the owed list is read BEFORE either catch-up starts:
        # min-progress GC keeps every epoch > boot on disk (dead's
        # rejoined marker pins them), so lazy's final apply and dead's
        # catch-up are independent consumers again and run
        # concurrently (guide §2.6)
        owed = sorted(
            int(m.group(1))
            for d in os.listdir(feed_dir)
            if (m := re.fullmatch(r"batch_id=(\d+)", d))
            if int(m.group(1)) > boot
        )
        fut = pool.submit(
            apply_feed_epoch,
            spark, feed_dir, view_lazy, 2, consumer="lazy", max_lag=2,
        )
        try:
            for i in owed:
                apply_feed_epoch(
                    spark, feed_dir, view_dead, i, consumer="dead",
                    max_lag=2,
                )
        finally:
            # never drop the concurrent lazy-apply's exception behind
            # a catch-up-side error (ADVICE r14 #2)
            fut.result()
    finally:
        # ONE cleanup for every path out of the lifecycle (the loud
        # mid-lifecycle RuntimeErrors included) — a leaked pool thread
        # per failed invocation would accumulate in a long bench
        # session
        pool.shutdown(wait=True)
    fast = _read_view_snapshot(spark, view_fast)
    lazy = _read_view_snapshot(spark, view_lazy)
    dead = _read_view_snapshot(spark, view_dead)
    return _views_with_disagreement([fast, lazy, dead]).orderBy("user_id")


#: The same view computed directly from the final SCD2 state — the
#: feed must carry exactly the information to reach it incrementally.
CDF_VIEW_ORACLE = """
WITH s AS (
  SELECT user_id, value,
         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS valid_to
  FROM events
)
SELECT user_id,
       count(*) AS n_rows,
       CAST(CAST(round(CAST(CAST(CAST(CAST(sum(CAST(CAST(value
         AS STRING) AS DECIMAL(27,15))) AS STRING) AS DOUBLE) AS STRING)
         AS DECIMAL(38,21)), 6) AS STRING) AS DOUBLE) AS sum_value,
       CAST(sum(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_current
FROM s GROUP BY 1 ORDER BY 1
"""


def _scd2_slice_sql(where: str) -> str:
    """Cumulative SCD2 state over an event-log slice (the oracle's
    mirror of what the maintained table holds after that slice)."""
    return f"""
  SELECT user_id, event_id, ts AS valid_from,
         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS valid_to,
         value,
         (lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
            IS NULL) AS is_current
  FROM events {where}
"""


#: Each epoch's feed = EXCEPT between consecutive cumulative states;
#: epoch 0 inserts everything (set ops treat NULLs as equal in both
#: engines, matching Spark's subtract).
SCD2_CHANGE_FEED_ORACLE = f"""
WITH s0 AS ({_scd2_slice_sql("WHERE event_id % 3 = 0")}),
s1 AS ({_scd2_slice_sql("WHERE event_id % 3 IN (0, 1)")}),
s2 AS ({_scd2_slice_sql("")})
SELECT 0 AS epoch, 'I' AS op, * FROM s0
UNION ALL
SELECT 1, 'I', * FROM (SELECT * FROM s1 EXCEPT SELECT * FROM s0)
UNION ALL
SELECT 1, 'D', * FROM (SELECT * FROM s0 EXCEPT SELECT * FROM s1)
UNION ALL
SELECT 2, 'I', * FROM (SELECT * FROM s2 EXCEPT SELECT * FROM s1)
UNION ALL
SELECT 2, 'D', * FROM (SELECT * FROM s1 EXCEPT SELECT * FROM s2)
ORDER BY epoch, op, user_id, valid_from, event_id
"""


#: The maintained table exactly as of T2: batch SCD2 history over the
#: first two event-time slices.
SCD2_TIME_TRAVEL_ORACLE = f"""
SELECT user_id, event_id,
       ts AS valid_from,
       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
         AS valid_to,
       value,
       (lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
          IS NULL) AS is_current
FROM events
WHERE ts <= TIMESTAMP '{_TT_T2}'
ORDER BY user_id, valid_from, event_id
"""


def stream_asof_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SERVING stream completing the point-in-time trio (history /
    maintenance / online lookups): probe rows arrive in 3 epochs
    (source split on ``probe_id % 3``, ``maxFilesPerTrigger=1``) and
    each micro-batch answers itself with an as-of lookup against the
    standing feature history — the online read path of a feature
    store ("what is this user's feature value right now / at this
    training row's timestamp?"). Epoch outputs land in the idempotent
    ``batch_id=N`` sink layout, so the replay contract matches every
    other serving stream here.

    Per-epoch cost tracks the EPOCH, not the corpus: the state side
    is pruned to the epoch's users (``left_semi`` on the batch's
    distinct user_ids — the same affected-users discipline as
    :func:`scd2_merge`) before the union-sort-fill runs, so each
    epoch sorts only the probing users' histories; the history scan
    itself is shared across epochs via a transient cache. Oracle:
    :data:`ASOF_ORACLE` VERBATIM — the union of per-epoch answers
    over the disjoint probe split must equal the one-shot batch
    as-of join, proving pruning + epoch reassembly change nothing."""
    from psd_project_spark.functions.caching import (
        scratch_dir,
        transient_cache,
    )
    from psd_project_spark.streaming.foreach_sink import (
        run_stream,
        stage_stream_splits,
        write_epoch,
    )

    ev = load_table(spark, sf_dir, "events").select(*_EVENT_COLS)
    state = transient_cache(ev.filter(F.col("event_id") % 2 == 1))
    probes = ev.filter(F.col("event_id") % 2 == 0).select(
        "user_id", F.col("event_id").alias("probe_id"), "ts"
    )
    src = scratch_dir("psd_asof_src_")
    out_dir = scratch_dir("psd_asof_")
    ckpt = scratch_dir("psd_asof_ckpt_")
    stage_stream_splits(probes, F.col("probe_id") % 3, src)
    arriving = (
        spark.readStream.schema("user_id long, probe_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )

    def answer_epoch(df: DataFrame, batch_id: int) -> None:
        pruned = state.join(
            df.select("user_id").distinct(), "user_id", "left_semi"
        )
        write_epoch(asof_join(pruned, df), out_dir, batch_id)

    run_stream(arriving, answer_epoch, ckpt, state_partitions=None)
    return spark.read.parquet(out_dir).select(
        "user_id", "probe_id", "ts", "asof_event_id", "asof_value"
    )


def stream_scd2_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """READ-WHILE-MAINTAIN: the composition closing the point-in-time
    trio's last open loop (VERDICT r10 "Next round" #3 — r10's
    serving stream answered from batch-derived state while the
    maintenance stream maintained a table nobody served from). Here
    the probe epochs are answered AGAINST the versioned ``current``
    table that the SCD2 maintenance stream publishes, while that
    maintenance is still in flight: six interleaved availableNow runs
    (maintain epoch 0 → serve epoch 0 → maintain 1 → serve 1 →
    maintain 2 → serve 2) over two persistent checkpoints, each
    serving epoch resolving the maintained table's newest manifest at
    its own epoch time — three distinct versions of the state table
    answer live reads mid-maintenance, proving the atomic
    manifest-publish story under a reader.

    Correctness is EVENT-TIME ALIGNED, the way a real feature store
    serves during backfill: both streams are cut at the same absolute
    ts terciles, so when probe epoch i runs, every feature event with
    ts ≤ t_i has been merged — and an as-of answer depends only on
    state at-or-before the probe instant, so later (not yet merged)
    features cannot change it. The union of per-epoch answers must
    therefore equal the one-shot batch as-of join: oracle
    :data:`ASOF_ORACLE` VERBATIM.

    Per-epoch cost tracks the epoch: the maintained-table read is
    manifest-pruned to complete versions, the state side is
    ``left_semi``-pruned to the epoch's probing users before the
    union-sort-fill runs, and the maintenance epochs themselves
    rewrite only affected user-buckets (the bucket-aligned runner)."""
    from psd_project_spark.functions.caching import scratch_dir

    return run_read_while_maintain(
        spark,
        sf_dir,
        src_f=scratch_dir("psd_serve_feat_"),
        src_p=scratch_dir("psd_serve_probe_"),
        state_dir=scratch_dir("psd_serve_state_"),
        out_dir=scratch_dir("psd_serve_out_"),
        ckpt_m=scratch_dir("psd_serve_ckm_"),
        ckpt_s=scratch_dir("psd_serve_cks_"),
    )


def run_read_while_maintain(
    spark: SparkSession,
    sf_dir: str,
    src_f: str,
    src_p: str,
    state_dir: str,
    out_dir: str,
    ckpt_m: str,
    ckpt_s: str,
) -> DataFrame:
    """The injectable half of :func:`stream_scd2_serve` (dirs supplied
    so the epoch/version structure is testable)."""
    from psd_project_spark.streaming.foreach_sink import (
        N_STATE_BUCKETS,
        read_versioned,
        run_stream,
        write_epoch,
        write_split_with_buckets,
    )

    ev = load_table(spark, sf_dir, "events").select(*_EVENT_COLS)
    feats = ev.filter(F.col("event_id") % 2 == 1)
    probes = ev.filter(F.col("event_id") % 2 == 0).select(
        "user_id", F.col("event_id").alias("probe_id"), "ts"
    )
    # one 2-value driver row: the shared absolute-ts tercile cuts
    t1, t2 = (
        ev.select(
            F.expr(
                "percentile(unix_micros(ts), array(1.0D/3, 2.0D/3))"
            ).alias("c")
        ).first()["c"]
    )
    t1, t2 = int(t1), int(t2)

    def epoch_pred(i: int):
        us = F.unix_micros(F.col("ts"))
        if i == 0:
            return us <= t1
        if i == 1:
            return (us > t1) & (us <= t2)
        return us > t2

    def serve_epoch(df: DataFrame, batch_id: int) -> None:
        cur = read_versioned(spark, state_dir)
        st = cur.join(
            df.select("user_id").distinct(), "user_id", "left_semi"
        ).select(
            "user_id", "event_id", F.col("valid_from").alias("ts"), "value"
        )
        write_epoch(asof_join(st, df), out_dir, batch_id)

    def _stage(df: DataFrame, path: str) -> None:
        df.coalesce(1).write.mode("overwrite").parquet(path)

    def _stage_feat(df: DataFrame, path: str) -> None:
        # feature epochs feed the bucket-aligned maintenance sink: the
        # staged-sidecar fast path hands each micro-batch its bucket
        # set, removing the per-epoch delta distinct-collect job
        # (optimization r15, VERDICT r14 #2)
        write_split_with_buckets(df, path, ["user_id"], N_STATE_BUCKETS)

    # The maintain-i → serve-i interleaving IS the demonstrated
    # contract and stays exactly as it was; what overlaps (guide §2.6)
    # is only the staging of inputs the CURRENT stream run does not
    # read: probe epoch i stages while maintenance i runs (maintenance
    # reads src_f; serve i starts strictly after both complete), and
    # feature epoch i+1 stages while serve i runs (serve reads src_p +
    # state_dir; maintenance i+1 starts strictly after both complete).
    # SHUFFLE-FREE STAGING INVARIANT (ADVICE r14 #3): these staged
    # frames must stay narrow filter + coalesce(1) + observe — the
    # overlapped stagings run while run_scd2_maintenance mutates the
    # session-global spark.sql.shuffle.partitions, so a shuffle in the
    # staging lineage would run under an unintended partition count.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=1) as pool:
        _stage_feat(feats.filter(epoch_pred(0)), f"{src_f}/f0")
        for i in range(3):
            staging = pool.submit(
                _stage, probes.filter(epoch_pred(i)), f"{src_p}/f{i}"
            )
            try:
                run_scd2_maintenance(
                    spark.readStream.schema(
                        "user_id long, event_id long, ts timestamp, "
                        "value double"
                    )
                    .option("recursiveFileLookup", "true")
                    .parquet(src_f),
                    state_dir,
                    ckpt_m,
                )
            finally:
                # the background staging's exception must never be
                # dropped behind a stream-run error (ADVICE r14 #2)
                staging.result()
            if i + 1 < 3:
                staging = pool.submit(
                    _stage_feat,
                    feats.filter(epoch_pred(i + 1)),
                    f"{src_f}/f{i + 1}",
                )
            try:
                run_stream(
                    spark.readStream.schema(
                        "user_id long, probe_id long, ts timestamp"
                    )
                    .option("recursiveFileLookup", "true")
                    .parquet(src_p),
                    serve_epoch,
                    ckpt_s,
                    state_partitions=None,
                )
            finally:
                if i + 1 < 3:
                    staging.result()
    return spark.read.parquet(out_dir).select(
        "user_id", "probe_id", "ts", "asof_event_id", "asof_value"
    )


QUERIES = {
    "scd2_schema_evolution": (scd2_schema_evolution, SCD2_EVOLUTION_ORACLE),
    "scd2_history": (scd2_history, SCD2_ORACLE),
    "asof_feature_join": (asof_feature_join, ASOF_ORACLE),
    "stream_scd2_maintain": (stream_scd2_maintain, SCD2_ORACLE),
    "stream_scd2_erase": (stream_scd2_erase, SCD2_ERASE_ORACLE),
    "scd2_time_travel": (scd2_time_travel, SCD2_TIME_TRAVEL_ORACLE),
    "scd2_change_feed": (scd2_change_feed, SCD2_CHANGE_FEED_ORACLE),
    "cdf_materialized_view": (cdf_materialized_view, CDF_VIEW_ORACLE),
    "cdf_feed_retention": (cdf_feed_retention, CDF_VIEW_ORACLE),
    "cdf_multi_consumer": (cdf_multi_consumer, CDF_VIEW_ORACLE),
    "cdf_consumer_eviction": (cdf_consumer_eviction, CDF_VIEW_ORACLE),
    "stream_asof_lookup": (stream_asof_lookup, ASOF_ORACLE),
    "stream_scd2_serve": (stream_scd2_serve, ASOF_ORACLE),
}
