"""Oracle parity at sf0.1 for the SCALE-ADAPTIVE queries.

The CI parity suite (test_oracle_parity.py) runs at sf0.001 and the
correctness driver at sf0.01 — but the adaptive rules (LSH banding,
SemDeDup cell count) deliberately CHANGE behavior with corpus size, so
a small-SF-only check never executes the larger layouts. Round 2's
cogroup 1-NN bug (silently paired half the blocks, only above sf0.01)
is exactly this class. These tests re-run the driver comparison at
sf0.1 for every query whose plan or parameters depend on corpus size.
"""

import pytest

from tests.oracle_utils import check_query_vs_oracle

SF_LARGE = "/root/testdata/sf0.1"

#: Queries whose banding / cell count / block layout changes with n,
#: plus round-3 composites whose candidate/feature distributions only
#: get interesting at the larger corpus.
ADAPTIVE = [
    "ann_lsh_cosine",      # adaptive_band_bits: 8×4 at sf0.01 → 16×6
    "semantic_dedup",      # adaptive_cells: 16 → 32
    "dedup_embedding_lsh",  # candidate volume scales with banding
    "dedup_minhash_lsh",   # hot-bucket volume grows with corpus
    "dedup_exact_then_minhash",  # collapse stage only has work when dups exist
    "boilerplate_screen",  # cross-doc chunk repeats need the bigger corpus
    "quality_features",    # composite of distribution-dependent features
    # round 4: fixpoint strategy + pair volume change with graph size
    "dedup_components",
    "dedup_canonical",
    # round 4: sketch register occupancy / linear-counting-vs-raw
    # branch flips with cardinality; probe bucket volume with corpus
    "table_profile",
    "cms_heavy_hitters",
    "ann_index_export",
    # round 4: model tables (bigrams / vocab) grow with corpus
    "dsir_weights",
    "bpe_encode_stats",
    "stream_ingest_dedup",
    # round 5: index bucket population and per-bucket file layout grow
    # with corpus; the dyadic sketch's heavy set / mid-level pruning
    # and the packing bin count are cardinality-dependent; the
    # streaming sketch's node state only multi-bins at larger n
    "minhash_index_incremental",
    "ann_index_incremental",
    "dyadic_quantile_sketch",
    "stream_value_quantiles",
    "pack_sequences",
    "ngram_familiarity",
    # round 5 float-fidelity regressions: these queries diverged from
    # the oracle ONLY at sf0.1 (sums big enough that the ulp crosses
    # the rounding digit / decimal-cast drift accumulates / a value
    # lands within an ulp of a half boundary) — the three cross-engine
    # classes fixed by the canonicalization sweeps (shortest-repr
    # decimal cast, decimal-space round, string-hop decimal→double).
    # A small-SF-only suite can never catch this class again.
    "q1_pricing_summary",
    "cube_orders",
    "grouping_sets_orders",
    "pivot_status_totals",
    "partitioned_parquet_roundtrip",
    "alerts_batch",
    "alerts_stream",
    # round 6: duplicated-anchor volume, index bucket/file layout,
    # per-day shard count and micro-batch/epoch structure all grow
    # with the corpus
    "dedup_exact_substr",
    "exact_substr_cut",
    "decontaminate_substr",
    "minhash_index_compaction",
    "dyadic_quantile_rollup",
    "stream_value_quantiles_sink",
    # round 7: anchor-index bucket/file layout and probe-bucket volume
    # grow with the corpus; the classifier trains on
    # distribution-dependent features
    "substr_index_incremental",
    "ann_index_compaction",
    "quality_classifier_train",
    "quality_classifier_score",
    # round 7 mid-round: the cut's covered-position volume and the
    # streaming probes' epoch/bucket structure grow with the corpus
    "decontaminate_cut",
    "stream_crawl_screen",
    "stream_ann_search",
    # round 7 late-round curation tier: the feature store's bucket
    # population and the per-epoch lookup volume grow with the corpus;
    # the mixture weights aggregate distribution-dependent keep
    # decisions; the sampler's cluster populations (and the salted
    # two-phase survivor volume) grow with n
    "stream_quality_score",
    "domain_mixture_weights",
    "cluster_balanced_sample",
    # the budget draw: budgets, survivor volumes, and the selected
    # prefix all scale with the corpus's kept token mass
    "mixture_resample",
    # the store lifecycle: base/delta/compaction volumes and the
    # probed bucket population grow with the corpus
    "quality_store_incremental",
]


@pytest.mark.parametrize("name", ADAPTIVE)
def test_adaptive_query_matches_oracle_at_sf01(spark, name):
    sdf = check_query_vs_oracle(spark, name, SF_LARGE, rel=0.0)
    assert len(sdf) > 0, f"{name} returned no rows at {SF_LARGE}"
