"""Round-13 operator tests: type-widening schema evolution on the
versioned MERGE sink (VERDICT r12 "Next round" #5), multi-consumer CDF
feed retention (#3), and bucket-aligned view snapshots (#6)."""

import glob
import hashlib
import os

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F


def _gen_file_hashes(root: str) -> dict[str, str]:
    out = {}
    for f in glob.glob(os.path.join(root, "g*", "_bucket=*", "*.parquet")):
        with open(f, "rb") as fh:
            out[f] = hashlib.md5(fh.read()).hexdigest()
    return out


# --- type widening (VERDICT r12 #5) ------------------------------------------

def test_widening_lattice():
    from psd_project_spark.streaming.foreach_sink import _is_widening

    assert _is_widening("integer", "long")
    assert _is_widening("byte", "integer")
    assert _is_widening("float", "double")
    assert _is_widening("integer", "double")
    assert not _is_widening("long", "integer")   # narrowing
    assert not _is_widening("double", "float")   # narrowing
    assert not _is_widening("long", "double")    # lossy past 2^53
    assert not _is_widening("string", "long")    # cross-kind
    assert not _is_widening("integer", "integer")


def test_reconcile_fields_widens_keeps_and_rejects():
    from psd_project_spark.streaming.foreach_sink import _reconcile_fields

    prev = [
        {"name": "k", "type": "long", "nullable": True, "metadata": {}},
        {"name": "q", "type": "integer", "nullable": True, "metadata": {}},
        {"name": "v", "type": "double", "nullable": True, "metadata": {}},
    ]
    # widening upgrades in place, additive appends, order stable
    merged = [
        {"name": "k", "type": "long", "nullable": True, "metadata": {}},
        {"name": "q", "type": "long", "nullable": True, "metadata": {}},
        {"name": "v", "type": "double", "nullable": True, "metadata": {}},
        {"name": "tag", "type": "string", "nullable": True, "metadata": {}},
    ]
    out = _reconcile_fields(prev, merged)
    assert [(f["name"], f["type"]) for f in out] == [
        ("k", "long"), ("q", "long"), ("v", "double"), ("tag", "string"),
    ]
    # a NARROWER merge output keeps the recorded wide type (a late
    # narrow delta must not shrink the schema under standing files)
    wide = [{"name": "q", "type": "long", "nullable": True, "metadata": {}}]
    narrow = [
        {"name": "q", "type": "integer", "nullable": True, "metadata": {}}
    ]
    assert _reconcile_fields(wide, narrow)[0]["type"] == "long"
    # an incompatible change fails the epoch loudly
    with pytest.raises(ValueError, match="widening lattice"):
        _reconcile_fields(
            [{"name": "q", "type": "string", "nullable": True,
              "metadata": {}}],
            [{"name": "q", "type": "long", "nullable": True,
              "metadata": {}}],
        )


def _rank_merge(key, order):
    w = Window.partitionBy(key).orderBy(F.col(order).desc())

    def merge(current, df, batch_id):
        merged = (
            df if current is None
            else current.unionByName(df, allowMissingColumns=True)
        )
        return (
            merged.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    return merge


def _widening_lifecycle(spark, tmp_path):
    """Epoch 0: 10 keys with qty INT; epoch 1: keys 0-1 with qty LONG
    (values needing the width). Returns out_dir."""
    from psd_project_spark.streaming.foreach_sink import (
        apply_versioned_epoch,
    )

    out_dir = str(tmp_path / "state")
    merge = _rank_merge("k", "seq")
    e0 = spark.range(10).select(
        F.col("id").alias("k"),
        F.lit(0).alias("seq"),
        (F.col("id") * 10).cast("int").alias("qty"),
    )
    apply_versioned_epoch(e0, out_dir, 0, merge, bucket_by=["k"])
    e1 = spark.range(2).select(
        F.col("id").alias("k"),
        F.lit(1).alias("seq"),
        (F.col("id") + 5_000_000_000).alias("qty"),  # long-range values
    )
    apply_versioned_epoch(e1, out_dir, 1, merge, bucket_by=["k"])
    return out_dir


def test_type_widening_evolves_without_rewrite(spark, tmp_path):
    from pyspark.sql.types import IntegerType, LongType

    from psd_project_spark.streaming.foreach_sink import (
        apply_versioned_epoch,
        read_versioned,
    )

    out_dir = str(tmp_path / "state")
    merge = _rank_merge("k", "seq")
    e0 = spark.range(10).select(
        F.col("id").alias("k"),
        F.lit(0).alias("seq"),
        (F.col("id") * 10).cast("int").alias("qty"),
    )
    apply_versioned_epoch(e0, out_dir, 0, merge, bucket_by=["k"])
    before = _gen_file_hashes(out_dir)
    e1 = spark.range(2).select(
        F.col("id").alias("k"),
        F.lit(1).alias("seq"),
        (F.col("id") + 5_000_000_000).alias("qty"),
    )
    apply_versioned_epoch(e1, out_dir, 1, merge, bucket_by=["k"])
    # (a) the current schema carries the WIDENED type and values are
    # correct on both sides of the widening boundary
    cur = read_versioned(spark, out_dir)
    assert isinstance(cur.schema["qty"].dataType, LongType)
    rows = {r.k: r.qty for r in cur.collect()}
    assert rows[0] == 5_000_000_000 and rows[1] == 5_000_000_001
    assert rows[5] == 50  # pre-widening row, up-cast at read
    # (b) PRE-widening generation files are byte-untouched: evolution
    # cost one epoch, never a rewrite or backfill
    after = _gen_file_hashes(out_dir)
    for path, h in before.items():
        assert after.get(path) == h, f"pre-widening file rewritten: {path}"
    # (c) time travel to the pre-widening version returns the OLD type
    v0 = read_versioned(spark, out_dir, version=0)
    assert isinstance(v0.schema["qty"].dataType, IntegerType)
    assert {r.qty for r in v0.filter(F.col("k") < 2).collect()} == {0, 10}


def test_widening_then_narrow_delta_keeps_wide_type(spark, tmp_path):
    from pyspark.sql.types import LongType

    from psd_project_spark.streaming.foreach_sink import (
        apply_versioned_epoch,
        read_versioned,
    )

    out_dir = _widening_lifecycle(spark, tmp_path)
    merge = _rank_merge("k", "seq")
    e2 = spark.range(3).select(  # a late delta whose qty fits in int
        F.col("id").alias("k"),
        F.lit(2).alias("seq"),
        F.lit(7).cast("int").alias("qty"),
    )
    apply_versioned_epoch(e2, out_dir, 2, merge, bucket_by=["k"])
    cur = read_versioned(spark, out_dir)
    assert isinstance(cur.schema["qty"].dataType, LongType)
    assert {r.qty for r in cur.filter(F.col("k") < 3).collect()} == {7}


def test_float_to_double_widening(spark, tmp_path):
    from pyspark.sql.types import DoubleType

    from psd_project_spark.streaming.foreach_sink import (
        apply_versioned_epoch,
        read_versioned,
    )

    out_dir = str(tmp_path / "state")
    merge = _rank_merge("k", "seq")
    e0 = spark.range(4).select(
        F.col("id").alias("k"), F.lit(0).alias("seq"),
        (F.col("id") * 0.5).cast("float").alias("w"),
    )
    apply_versioned_epoch(e0, out_dir, 0, merge, bucket_by=["k"])
    e1 = spark.range(1).select(
        F.col("id").alias("k"), F.lit(1).alias("seq"),
        F.lit(0.1).alias("w"),  # double
    )
    apply_versioned_epoch(e1, out_dir, 1, merge, bucket_by=["k"])
    cur = read_versioned(spark, out_dir)
    assert isinstance(cur.schema["w"].dataType, DoubleType)
    got = {r.k: r.w for r in cur.collect()}
    assert got[0] == 0.1 and got[3] == 1.5


def test_incompatible_evolution_fails_epoch(spark, tmp_path):
    from psd_project_spark.streaming.foreach_sink import (
        apply_versioned_epoch,
    )

    out_dir = str(tmp_path / "state")

    def replace(current, df, batch_id):
        return df  # replace-all merge: output schema = delta schema

    e0 = spark.range(2).select(
        F.col("id").alias("k"), F.lit(1).cast("int").alias("q")
    )
    apply_versioned_epoch(e0, out_dir, 0, replace, bucket_by=["k"])
    e1 = spark.range(2).select(
        F.col("id").alias("k"), F.lit("x").alias("q")
    )
    with pytest.raises(ValueError, match="widening lattice"):
        apply_versioned_epoch(e1, out_dir, 1, replace, bucket_by=["k"])


# --- CDF: multi-consumer retention + bucket-aligned snapshots ----------------

def _write_change_epoch(spark, feed_dir: str, epoch: int, users) -> None:
    """A synthetic change-feed epoch: one 'I' row per user."""
    rows = [(int(u), "I", float(u) + 0.25, True) for u in users]
    (
        spark.createDataFrame(
            rows, "user_id long, op string, value double, is_current boolean"
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(os.path.join(feed_dir, f"batch_id={epoch}"))
    )


def test_feed_gc_pinned_to_slowest_consumer(spark, tmp_path):
    """VERDICT r12 #3 done-criteria: with two registered consumers at
    different paces, feed epochs survive until the SLOWER one has
    applied them — and both snapshots converge to the same view."""
    from psd_project_spark.operators.scd import (
        apply_feed_epoch,
        feed_consumer_progress,
        register_feed_consumer,
    )
    from psd_project_spark.streaming.foreach_sink import read_versioned

    feed = str(tmp_path / "feed")
    va, vb = str(tmp_path / "va"), str(tmp_path / "vb")
    os.makedirs(feed)
    register_feed_consumer(feed, "fast")
    register_feed_consumer(feed, "slow")
    for i in range(3):
        _write_change_epoch(spark, feed, i, range(10 * i, 10 * i + 5))

    def feed_epochs():
        return sorted(
            d for d in os.listdir(feed) if d.startswith("batch_id=")
        )

    # fast applies 0 and 1; slow has applied nothing — NOTHING is GC'd
    apply_feed_epoch(spark, feed, va, 0, consumer="fast")
    apply_feed_epoch(spark, feed, va, 1, consumer="fast")
    assert feed_epochs() == ["batch_id=0", "batch_id=1", "batch_id=2"]
    assert feed_consumer_progress(feed) == {"fast": 1, "slow": -1}
    # slow catches up through epoch 1 — epoch 0 is now paid for
    apply_feed_epoch(spark, feed, vb, 0, consumer="slow")
    assert feed_epochs() == ["batch_id=0", "batch_id=1", "batch_id=2"]
    apply_feed_epoch(spark, feed, vb, 1, consumer="slow")
    assert feed_epochs() == ["batch_id=1", "batch_id=2"]
    # both finish; GC advances to min progress = 2
    apply_feed_epoch(spark, feed, va, 2, consumer="fast")
    apply_feed_epoch(spark, feed, vb, 2, consumer="slow")
    assert feed_epochs() == ["batch_id=2"]
    a = read_versioned(spark, va).orderBy("user_id").collect()
    b = read_versioned(spark, vb).orderBy("user_id").collect()
    assert a == b and len(a) == 15
    # a REPLAYED apply of an epoch whose change file is already GC'd
    # (consumer crash after publish, before offset commit) is a clean
    # no-op — the guard must not touch the gone feed file
    apply_feed_epoch(spark, feed, va, 1, consumer="fast")
    assert read_versioned(spark, va).orderBy("user_id").collect() == a
    # but a consumer that truly never applied a gone epoch fails loudly
    vc = str(tmp_path / "vc")
    with pytest.raises(FileNotFoundError, match="GC'd past"):
        apply_feed_epoch(spark, feed, vc, 1, consumer="late-joiner")


def test_single_consumer_apply_respects_registered_laggards(
    spark, tmp_path
):
    """A consumer=None apply on a feed that HAS registered consumers
    must not GC epochs a registered-but-slower consumer still needs —
    register_feed_consumer's no-deletion-before-applied guarantee
    holds across both call forms."""
    from psd_project_spark.operators.scd import (
        apply_feed_epoch,
        register_feed_consumer,
    )

    feed = str(tmp_path / "feed")
    view = str(tmp_path / "view")
    os.makedirs(feed)
    register_feed_consumer(feed, "slow")  # progress -1, never applies
    for i in range(3):
        _write_change_epoch(spark, feed, i, range(5))
        apply_feed_epoch(spark, feed, view, i)  # single-consumer form
    assert sorted(
        d for d in os.listdir(feed) if d.startswith("batch_id=")
    ) == ["batch_id=0", "batch_id=1", "batch_id=2"]


def test_view_snapshot_untouched_buckets_byte_identical(spark, tmp_path):
    """VERDICT r12 #6 done-criteria: an epoch touching one user
    rewrites only that user's snapshot bucket — every other bucket's
    files are byte-identical and the manifest carries their entries
    unchanged."""
    import json

    from psd_project_spark.operators.scd import apply_feed_epoch
    from psd_project_spark.streaming.foreach_sink import (
        _MANIFEST,
        read_versioned,
    )

    feed = str(tmp_path / "feed")
    view = str(tmp_path / "view")
    os.makedirs(feed)
    _write_change_epoch(spark, feed, 0, range(10))
    _write_change_epoch(spark, feed, 1, [0])
    apply_feed_epoch(spark, feed, view, 0)
    before = _gen_file_hashes(view)
    with open(os.path.join(view, "v0", _MANIFEST)) as fh:
        m0 = json.load(fh)["buckets"]
    apply_feed_epoch(spark, feed, view, 1)
    after = _gen_file_hashes(view)
    with open(os.path.join(view, "v1", _MANIFEST)) as fh:
        m1 = json.load(fh)["buckets"]
    changed = {b for b in m0 if m1.get(b) != m0[b]}
    assert len(changed) == 1  # exactly user 0's bucket repointed
    untouched_files = [
        p for p in before
        if not any(f"/_bucket={b}/" in p and "/g1/" in p for b in changed)
    ]
    for p in untouched_files:
        assert after.get(p) == before[p], f"untouched bucket rewritten: {p}"
    # the folded view is still correct: user 0 counted twice
    rows = {r.user_id: r.n_rows for r in read_versioned(spark, view).collect()}
    assert rows[0] == 2 and rows[5] == 1


# --- zorder: symmetric clamp, deferred sweep, ingest-after-delete ------------

def test_zcells_box_clamps_symmetrically():
    """ADVICE r12: a box lying entirely OUTSIDE the base-derived grid
    resolves to the edge bins (where the streamed layout's clamped
    binning puts out-of-grid rows), never to an empty rectangle."""
    import datetime as dt

    from psd_project_spark.operators.zorder import (
        _BINS,
        _EPOCH,
        _SPREAD,
        zcells_for_box,
    )

    params = {"amin": 0, "aw": 10, "bmin": 0, "bw": 10}
    # fully above the grid on both dimensions -> the (max,max) cell
    hi = zcells_for_box(
        params,
        _EPOCH + dt.timedelta(days=5000),
        _EPOCH + dt.timedelta(days=6000),
        900,
        950,
    )
    assert hi == [_SPREAD[_BINS - 1] + 2 * _SPREAD[_BINS - 1]]
    # fully below the grid on the custkey dimension -> bbin 0 column
    lo = zcells_for_box(
        params, _EPOCH, _EPOCH + dt.timedelta(days=5), -50, -10
    )
    assert lo == [_SPREAD[0] + 2 * _SPREAD[0]]
    # interior boxes unchanged by the clamp
    mid = zcells_for_box(
        params, _EPOCH + dt.timedelta(days=15),
        _EPOCH + dt.timedelta(days=25), 12, 18,
    )
    assert mid == sorted(_SPREAD[a] + 2 * _SPREAD[1] for a in (1, 2))


def _orders_like(spark, keys, cust_of):
    import datetime as dt

    rows = [
        (
            int(k),
            dt.date(1995, 1, 1) + dt.timedelta(days=int(k) % 300),
            int(cust_of(k)),
            f"{int(k) % 3 + 1}-X",
            float(k) + 0.5,
        )
        for k in keys
    ]
    return spark.createDataFrame(
        rows,
        "o_orderkey long, o_orderdate date, o_custkey long, "
        "o_orderpriority string, o_totalprice double",
    )


def test_purge_inplace_immediate_and_keeps_applied(spark, tmp_path):
    """VERDICT r12 #4's erasure half: the in-place band purge drops
    covered cells' bytes NOW (no one-epoch retention for erasure),
    rewrites straddlers band-free, and leaves the applied-epoch
    counter untouched so ingestion can continue."""
    import glob as _glob

    from psd_project_spark.operators.zorder import (
        _build_zcell_base,
        _load_zcells,
        _purge_band_inplace,
        _zorder_ingest_batch_fn,
    )

    path = str(tmp_path / "layout")
    # custkeys spread 0..99 -> full bbin range under base-derived grid
    _build_zcell_base(spark, _orders_like(spark, range(200), lambda k: k % 100), path)
    _zorder_ingest_batch_fn(path)(
        _orders_like(spark, range(200, 260), lambda k: k % 100), 0
    )
    assert _load_zcells(path)["applied"] == 0
    files_before = set(_glob.glob(os.path.join(path, "zcell=*", "*.parquet")))
    _purge_band_inplace(spark, path, 20, 79)
    m = _load_zcells(path)
    assert m["applied"] == 0  # the counter survives the purge
    # every surviving data row is out of band
    live = [
        os.path.join(path, f"zcell={c}", f)
        for c, fs in m["cells"].items()
        for f in fs
    ]
    assert (
        spark.read.parquet(*live)
        .filter(F.col("o_custkey").between(20, 79))
        .count()
        == 0
    )
    # erasure is IMMEDIATE: every pre-purge file the new manifest does
    # not reference is physically gone (no retain window)
    files_after = set(_glob.glob(os.path.join(path, "zcell=*", "*.parquet")))
    for f in files_after - set(live):
        assert f not in files_before, f"unreferenced file survived: {f}"
    # and out-of-band rows all survived (260 keys, custkey = k % 100)
    assert spark.read.parquet(*live).count() == sum(
        1 for k in range(260) if not (20 <= k % 100 <= 79)
    )


def test_ingest_sweep_defers_one_epoch(spark, tmp_path, monkeypatch):
    """ADVICE r12: a compaction's dropped inputs survive exactly ONE
    more publish (a reader holding the previous manifest keeps a
    complete file list), then drop out at the next epoch."""
    from psd_project_spark.operators import zorder
    from psd_project_spark.operators.zorder import (
        _build_zcell_base,
        _load_zcells,
        _zorder_ingest_batch_fn,
    )

    import datetime as dt

    monkeypatch.setattr(zorder, "ZORDER_MAX_CELL_FILES", 1)
    path = str(tmp_path / "layout")

    # one-cell layout: constant custkey AND constant date, so every
    # epoch hits the same cell and the 1-file cap forces compaction
    def mk(keys):
        rows = [
            (int(k), dt.date(1995, 1, 1), 5, "1-X", float(k))
            for k in keys
        ]
        return spark.createDataFrame(
            rows,
            "o_orderkey long, o_orderdate date, o_custkey long, "
            "o_orderpriority string, o_totalprice double",
        )
    _build_zcell_base(spark, mk(range(10)), path)
    base_files = {
        f
        for fs in _load_zcells(path)["cells"].values()
        for f in fs
    }
    fn = _zorder_ingest_batch_fn(path)
    fn(mk(range(10, 20)), 0)  # append + forced compaction
    m0 = _load_zcells(path)
    retained = {f for fs in m0.get("retain", {}).values() for f in fs}
    assert base_files <= retained  # prev manifest's files retained...
    for c, fs in m0["retain"].items():
        cdir = os.path.join(path, f"zcell={c}")
        for f in fs:
            assert os.path.exists(os.path.join(cdir, f))  # ...on disk
    fn(mk(range(20, 30)), 1)  # next publish: they drop out
    for c, fs in m0["retain"].items():
        cdir = os.path.join(path, f"zcell={c}")
        for f in fs:
            assert not os.path.exists(os.path.join(cdir, f))
    # a REPLAY of epoch 1 re-runs only the sweep: current retain
    # survives, manifest bytes unchanged
    m1_path = os.path.join(path, "_ZCELLS.json")
    before = open(m1_path, "rb").read()
    fn(mk(range(20, 30)), 1)
    assert open(m1_path, "rb").read() == before
    m1 = _load_zcells(path)
    for c, fs in m1.get("retain", {}).items():
        for f in fs:
            assert os.path.exists(os.path.join(path, f"zcell={c}", f))


def test_resume_replay_guard_across_delete_boundary(spark):
    """The registry lifecycle's end state: applied epoch 2 (the late
    epoch applied THROUGH the post-delete manifest), and a replay of
    that epoch is a guarded no-op."""
    from tests.conftest import SF_DIR

    from psd_project_spark.operators.zorder import (
        _load_zcells,
        _zorder_dir,
        _zorder_ingest_batch_fn,
        stream_zorder_resume,
    )
    from psd_project_spark.sources.registry import load_table

    stream_zorder_resume(spark, SF_DIR)  # gated: reuses the build
    path = _zorder_dir(SF_DIR) + "_resume"
    m = _load_zcells(path)
    assert m["applied"] == 2
    mpath = os.path.join(path, "_ZCELLS.json")
    before = open(mpath, "rb").read()
    late = load_table(spark, SF_DIR, "orders").filter(
        F.col("o_orderkey") % 5 == 2
    )
    _zorder_ingest_batch_fn(path)(late, 2)  # replay: must no-op
    assert open(mpath, "rb").read() == before
    # pre-late files carry no band rows (the purge removed them);
    # late-epoch files may
    pre_late = [
        os.path.join(path, f"zcell={c}", f)
        for c, fs in m["cells"].items()
        for f in fs
        if not f.startswith("e2-")
    ]
    if pre_late:
        from psd_project_spark.operators.zorder import _KC1, _KC2

        assert (
            spark.read.parquet(*pre_late)
            .filter(F.col("o_custkey").between(_KC1, _KC2))
            .count()
            == 0
        )


def _li_like(spark, keys, day_of):
    import datetime as dt

    rows = [
        (
            int(k),
            dt.datetime(1996, 1, 1) + dt.timedelta(days=int(day_of(k))),
            "A",
            1.0,
            10.0,
            0.0,
        )
        for k in keys
    ]
    return spark.createDataFrame(
        rows,
        "l_orderkey long, l_shipdate timestamp, l_returnflag string, "
        "l_quantity double, l_extendedprice double, l_discount double",
    )


def test_zonemap_purge_journal_blocks_resurrection(spark, tmp_path):
    """The hazard stream_zonemap_resume exists to close: the zone-map
    ingest REPLACES a replayed epoch's output wholesale, so without
    the purge journal a pre-purge epoch replaying after an erasure
    would resurrect its purged rows. With the journal: the replay
    re-applies the purge to its own rows; a fully-consumed epoch's
    entries drop; a LATER epoch's in-range rows survive untouched."""
    import json

    from psd_project_spark.operators.zorder import (
        _ZONEMAP,
        _build_zonemap_base,
        _purge_range_inplace,
        _zonemap_ingest_batch_fn,
    )

    path = str(tmp_path / "layout")
    # base: days 0..19; epoch 0: days 20..39 (straddles the purge)
    _build_zonemap_base(spark, _li_like(spark, range(20), lambda k: k), path)
    fn = _zonemap_ingest_batch_fn(path)
    e0 = _li_like(spark, range(100, 120), lambda k: k % 100 + 20)
    fn(e0, 0)

    def live_rows():
        with open(os.path.join(path, _ZONEMAP)) as fh:
            names = sorted(json.load(fh))
        if not names:
            return spark.range(0).select()
        return spark.read.parquet(*(os.path.join(path, n) for n in names))

    assert live_rows().count() == 40
    lo, hi = "1996-01-11 00:00:00", "1996-01-31 23:59:59"  # days 10..30
    _purge_range_inplace(spark, path, lo, hi)
    in_range = F.col("l_shipdate").between(lo, hi)
    assert live_rows().filter(in_range).count() == 0
    survivors = live_rows().count()
    assert survivors == 40 - 21  # days 10..30 inclusive purged
    # REPLAY the journaled epoch with its original (pre-purge) rows:
    # purged rows must NOT resurrect
    fn(e0, 0)
    assert live_rows().filter(in_range).count() == 0
    assert live_rows().count() == survivors
    # a LATE epoch's in-range rows legitimately survive (not in the
    # journal — they arrived after the purge)
    fn(_li_like(spark, range(200, 210), lambda k: 15), 1)
    assert live_rows().filter(in_range).count() == 10


def test_zonemap_purge_fully_consumed_epoch_replay_drops_entries(
    spark, tmp_path
):
    """A replayed epoch whose EVERY row a recorded purge consumed
    stages nothing — its files and manifest entries must still drop
    (the replay replaces its output with the empty set)."""
    import json

    from psd_project_spark.operators.zorder import (
        _ZONEMAP,
        _build_zonemap_base,
        _purge_range_inplace,
        _zonemap_ingest_batch_fn,
    )

    path = str(tmp_path / "layout")
    _build_zonemap_base(spark, _li_like(spark, range(5), lambda k: k), path)
    fn = _zonemap_ingest_batch_fn(path)
    e0 = _li_like(spark, range(100, 110), lambda k: 50)  # all day 50
    fn(e0, 0)
    _purge_range_inplace(
        spark, path, "1996-02-15 00:00:00", "1996-02-25 23:59:59"
    )
    with open(os.path.join(path, _ZONEMAP)) as fh:
        assert not any(n.startswith("e0-") for n in json.load(fh))
    fn(e0, 0)  # replay: stages nothing, must not error or resurrect
    with open(os.path.join(path, _ZONEMAP)) as fh:
        names = sorted(json.load(fh))
    assert not any(n.startswith("e0-") for n in names)
    assert (
        spark.read.parquet(*(os.path.join(path, n) for n in names)).count()
        == 5
    )
