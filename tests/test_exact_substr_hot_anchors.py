"""Hot-anchor guard inside the ExactSubstr pipeline (VERDICT r06
"What's wrong" #1).

The duplicated-anchor count must degrade gracefully when one
boilerplate k-gram floods the corpus — the pathological input where a
count-over-anchor window serializes every occurrence into one task.
The guard (groupBy partial count + AQE-splittable equi-join,
``exact_substr._dup_islands``) is semantics-preserving, so this
differential replicates a boilerplate sentence into every document and
checks EXACT equality against the DuckDB oracle — not just "it
finished"."""

import duckdb
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

SMALL = "/root/testdata/sf0.001"

#: One 12-token boilerplate sentence appended to EVERY doc: every
#: k-gram window inside it (12 − 8 + 1 = 5 anchors) occurs once per
#: document — the hottest anchors the corpus can produce.
BOILER = (
    "all rights reserved terms of service apply to this page content here"
)


@pytest.fixture(scope="module")
def boiler_docs(tmp_path_factory):
    d = tmp_path_factory.mktemp("boilerdocs")
    t = pq.read_table(f"{SMALL}/documents.parquet")
    texts = pc.binary_join_element_wise(t["text"], BOILER, " ")
    t = t.set_column(t.schema.get_field_index("text"), "text", texts)
    pq.write_table(t, str(d / "documents.parquet"))
    return str(d)


def _oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_dir}/documents.parquet'"
    )
    return con.execute(sql).fetchdf()


@pytest.mark.parametrize(
    "qname", ["dedup_exact_substr", "exact_substr_cut",
              "decontaminate_substr"]
)
def test_substr_queries_exact_under_boilerplate(spark, boiler_docs, qname):
    from psd_project_spark.operators import exact_substr as xs

    fn, sql = xs.QUERIES[qname]
    got = fn(spark, boiler_docs).toPandas()
    want = _oracle(sql, boiler_docs)
    cols = sorted(got.columns)
    assert sorted(want.columns) == cols
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    b = b.astype(a.dtypes.to_dict())
    assert len(a) == len(b) and len(a) > 0
    assert a.equals(b)
    if qname == "dedup_exact_substr":
        # the boilerplate suffix is genuinely hot: every doc reports
        # at least one duplicated span covering it
        assert int((got["n_spans"] >= 1).sum()) == len(got)


def test_dup_islands_plan_has_no_anchor_window(spark, boiler_docs):
    """The guard's point: no window over the anchor key anywhere in
    the physical plan (a window partition can't be split by AQE; the
    per-doc islands windows partition by doc_id, which is fine)."""
    from psd_project_spark.operators.exact_substr import (
        dedup_exact_substr,
    )

    plan = dedup_exact_substr(spark, boiler_docs)._jdf.queryExecution(
    ).executedPlan().toString()
    for line in plan.splitlines():
        if "Window" in line and "anchor" in line:
            raise AssertionError(f"anchor-partitioned window found: {line}")
