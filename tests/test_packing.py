"""pack_sequences: crafted-edge differential against a Python
reference (empty docs, exact-boundary fits, straddlers) plus the
sf-fixture oracle check exercised with real crossings."""

from pyspark.sql import Row

from tests.conftest import SF_DIR
from tests.oracle_utils import compare_frames, duck_connection


def _py_pack(docs, seq_len, shards):
    """Reference implementation: per-shard running cumsum packing."""
    out = {}
    state = {}
    for doc_id, nt in sorted(docs):
        sh = doc_id % shards
        cum = state.get(sh, 0) + nt
        state[sh] = cum
        start_bin = (cum - nt) // seq_len
        crossing = nt > 0 and (cum - 1) // seq_len > start_bin
        k = (sh, start_bin)
        d = out.setdefault(k, [0, 0, 0])
        d[0] += 1
        d[1] += nt
        d[2] += int(crossing)
    return {
        k: tuple(v) for k, v in out.items()
    }


def test_crafted_edges_match_reference(spark, monkeypatch):
    import psd_project_spark.operators.packing as pk

    monkeypatch.setattr(pk, "PACK_SEQ_LEN", 10)
    monkeypatch.setattr(pk, "PACK_SHARDS", 2)
    # doc texts with known whitespace token counts; includes an empty
    # doc (split(trim('')) = [''] → 1 token, the engine-wide token
    # definition in BOTH engines), an exact-boundary fit, straddlers
    texts = [(0, 4), (1, 3), (2, 6), (3, 0), (4, 10), (5, 7), (6, 1), (7, 9)]
    rows = [
        Row(doc_id=i, text=" ".join(["tok"] * n) if n else "")
        for i, n in texts
    ]
    counts = [
        (r.doc_id, len(r.text.strip(" ").split(" "))) for r in rows
    ]
    df = spark.createDataFrame(rows)

    def fake_load(spark_, sf, name):
        assert name == "documents"
        return df

    monkeypatch.setattr(pk, "load_table", fake_load)
    got = {
        (r["shard"], r["bin"]): (r["n_docs"], r["n_tokens"], r["n_crossing"])
        for r in pk.pack_sequences(spark, "unused").collect()
    }
    assert got == _py_pack(counts, 10, 2)


def test_fixture_has_real_crossings_and_matches_oracle(spark):
    from psd_project_spark.operators.packing import (
        PACK_SEQUENCES_ORACLE,
        pack_sequences,
    )

    got = pack_sequences(spark, SF_DIR).toPandas()
    assert got["bin"].max() >= 1  # multi-bin at driver SF
    assert got["n_crossing"].sum() > 0  # boundary logic exercised
    con = duck_connection(SF_DIR)
    compare_frames(got, con.execute(PACK_SEQUENCES_ORACLE).fetchdf())


def test_randomized_docs_match_reference(spark, monkeypatch):
    """200 random docs (random token counts incl. empties and
    boundary-sized docs) against the Python reference — one Spark run,
    seeded, so the differential is deterministic."""
    import random

    import psd_project_spark.operators.packing as pk

    rng = random.Random(17)
    monkeypatch.setattr(pk, "PACK_SEQ_LEN", 37)  # prime: misaligned bins
    monkeypatch.setattr(pk, "PACK_SHARDS", 5)
    rows = []
    for i in range(200):
        n = rng.choice([0, 1, rng.randint(2, 36), 37, rng.randint(38, 120)])
        rows.append(
            Row(doc_id=i * 7 % 997, text=" ".join(["t"] * n) if n else "")
        )
    counts = [(r.doc_id, len(r.text.strip(" ").split(" "))) for r in rows]
    df = spark.createDataFrame(rows)
    monkeypatch.setattr(pk, "load_table", lambda s, sf, name: df)
    got = {
        (r["shard"], r["bin"]): (r["n_docs"], r["n_tokens"], r["n_crossing"])
        for r in pk.pack_sequences(spark, "unused").collect()
    }
    assert got == _py_pack(counts, 37, 5)
