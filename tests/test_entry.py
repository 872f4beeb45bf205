"""Driver-contract smoke: entry() + queries() run at sf0.001 and every
oracle key has a callable (full value comparison lives in
tools/check_oracle.py and the driver's own verify)."""

from __future__ import annotations

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"

FAST_QUERIES = [
    "prefix_pair_counts",
    "state_pagination",
    "grounding_join",
    "all_by_all_pairs",
    "anti_join",
    "dedup_exact",
    "token_counts",
    "record_hash",
    "curie_standardize",
    "exact_dedup_docs",
    "langid_quality",
    "token_count_bpe",
    "ann_ivf",
    "contributor_counts",
    "redundancy_report",
    "curie_uri_expand",
    "same_text_filter",
    "missing_edges",
    "unstable_components",
]


class TestContract:
    def test_entry_returns_rows(self, spark):
        df = entrymod.entry(spark)
        rows = df.collect()
        assert len(rows) > 0
        assert set(df.columns) == {"surface", "object_id", "n_docs", "n_mentions"}

    def test_oracle_keys_subset_of_queries(self):
        qs = entrymod.queries()
        missing = set(entrymod.oracle_sql()) - set(qs)
        assert not missing

    def test_fast_queries_run_at_sf0001(self, spark):
        qs = entrymod.queries()
        for name in FAST_QUERIES:
            df = qs[name](spark, SF)
            assert df.columns, name
            df.limit(5).collect()
