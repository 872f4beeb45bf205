"""Repetition gates + benchmark decontamination (Gopher/GPT-3-style
training-corpus hygiene operators)."""

from __future__ import annotations

import pytest


from sssom_curator_spark.operators.decontam import decontaminate
from sssom_curator_spark.operators.textstats import repetition_stats


class TestRepetitionStats:
    def _stats(self, spark, rows):
        df = spark.createDataFrame(rows, "doc_id string, text string")
        return {r["doc_id"]: r for r in repetition_stats(df).collect()}

    def test_hand_computed_document(self, spark):
        got = self._stats(
            spark,
            [
                # 4 lines, "dup" twice -> 3 distinct; chars 3+3+5+7=18,
                # distinct chars 3+5+7=15; words: dup dup hello a b a b ->
                # 2-grams [dup dup, dup hello, hello a, a b, b a, a b]:
                # top "a b" = 2 of 6
                ("d1", "dup\ndup\nhello\na b a b"),
            ],
        )["d1"]
        assert got["n_lines"] == 4
        assert got["dup_line_frac"] == round(1 - 3 / 4, 6)
        assert got["dup_line_char_frac"] == round(1 - 15 / 18, 6)
        assert got["top_2gram_frac"] == round(2 / 6, 6)

    def test_degenerate_documents(self, spark):
        got = self._stats(
            spark,
            [
                ("empty", ""),
                ("null", None),
                ("oneword", "hello"),
                ("blanklines", "\n\n  \n"),
            ],
        )
        for doc in ("empty", "null", "blanklines"):
            assert got[doc]["n_lines"] == 0
            assert got[doc]["dup_line_frac"] == 0.0
            assert got[doc]["dup_line_char_frac"] == 0.0
            assert got[doc]["top_2gram_frac"] == 0.0
        assert got["oneword"]["n_lines"] == 1
        assert got["oneword"]["top_2gram_frac"] == 0.0  # no 2-grams

    def test_no_repetition_scores_zero(self, spark):
        got = self._stats(spark, [("clean", "alpha\nbeta\ngamma delta")])["clean"]
        assert got["dup_line_frac"] == 0.0
        assert got["dup_line_char_frac"] == 0.0
        # all 2-grams distinct: top = 1/n
        assert got["top_2gram_frac"] == round(1 / 3, 6)


class TestDecontaminate:
    def _fixture(self, spark):
        docs = spark.createDataFrame(
            [
                ("leak", "intro text the quick brown fox jumps over the lazy dog outro"),
                ("clean", "completely unrelated content about mapping curation at scale"),
                ("short", "tiny doc"),
            ],
            "doc_id string, text string",
        )
        bench = spark.createDataFrame(
            [("q1", "The quick brown fox jumps over the lazy dog")],
            "qid string, text string",
        )
        return docs, bench

    def test_flag_mode(self, spark):
        docs, bench = self._fixture(spark)
        got = {
            r["doc_id"]: r["contaminated"]
            for r in decontaminate(docs, bench, n=8).collect()
        }
        assert got == {"leak": True, "clean": False, "short": False}

    def test_drop_mode(self, spark):
        docs, bench = self._fixture(spark)
        kept = sorted(
            r["doc_id"] for r in decontaminate(docs, bench, n=8, action="drop").collect()
        )
        assert kept == ["clean", "short"]

    def test_empty_benchmark_flags_nothing(self, spark):
        docs, _ = self._fixture(spark)
        bench = spark.createDataFrame([], "qid string, text string")
        got = decontaminate(docs, bench, n=8)
        assert all(not r["contaminated"] for r in got.collect())

    def test_bad_action_raises(self, spark):
        docs, bench = self._fixture(spark)
        with pytest.raises(ValueError, match="flag"):
            decontaminate(docs, bench, action="purge")

    def test_case_and_whitespace_insensitive(self, spark):
        docs = spark.createDataFrame(
            [("d", "THE  Quick\tBrown FOX jumps over the lazy dog")],
            "doc_id string, text string",
        )
        bench = spark.createDataFrame(
            [("q", "the quick brown fox jumps over the lazy dog")],
            "qid string, text string",
        )
        assert decontaminate(docs, bench, n=8).collect()[0]["contaminated"]


class TestCanonicalizeUrl:
    CASES = [
        # (input, expected)
        ("HTTPS://WWW.Shop.COM:443/Item/3/?utm_source=m&b=2&a=1#top",
         "https://www.shop.com/Item/3?a=1&b=2"),
        ("http://Host.org:80/a/b/", "http://host.org/a/b"),
        ("http://host.org:8080/a", "http://host.org:8080/a"),  # non-default port kept
        ("https://host.org/path?fbclid=xyz&gclid=1&utm_campaign=2",
         "https://host.org/path"),  # all params tracking -> '?' dropped
        ("https://host.org", "https://host.org"),  # no path/query
        ("https://host.org/?z=1&a=2", "https://host.org?a=2&z=1"),  # sorted
        ("https://host.org/CaseSensitive/Path", "https://host.org/CaseSensitive/Path"),
        ("  https://host.org/x  ", "https://host.org/x"),  # trimmed
        ("https://host.org/x?utmost=1", "https://host.org/x?utmost=1"),  # prefix, not LIKE _
    ]

    def test_hand_cases(self, spark):
        from sssom_curator_spark.functions.url_ops import canonicalize_url

        df = spark.createDataFrame([(u,) for u, _ in self.CASES], "url string")
        got = [r["c"] for r in df.select(canonicalize_url("url").alias("c")).collect()]
        for (raw, want), g in zip(self.CASES, got):
            assert g == want, f"{raw!r}: {g!r} != {want!r}"

    def test_url_dedup_collapses_variants(self, spark):
        from sssom_curator_spark.functions.url_ops import url_dedup

        df = spark.createDataFrame(
            [
                ("HTTP://A.com:80/x?utm_source=1",),
                ("http://a.com/x",),
                ("http://a.com/y",),
            ],
            "url string",
        )
        kept = sorted(r["url"] for r in url_dedup(df).collect())
        # min raw url wins among the two /x variants ('HTTP...' < 'http...')
        assert kept == ["HTTP://A.com:80/x?utm_source=1", "http://a.com/y"]


class TestCanonicalizeUrlProperties:
    """Algebraic invariants over generated URLs (hypothesis)."""

    @staticmethod
    def _spark():
        from tests.test_functions import get_cached_spark

        return get_cached_spark()

    def _canon(self, urls):
        from pyspark.sql import functions as F

        from sssom_curator_spark.functions.url_ops import canonicalize_url

        df = self._spark().createDataFrame([(u,) for u in urls], "url string")
        return [r["c"] for r in df.select(canonicalize_url("url").alias("c")).collect()]

    def test_idempotent_and_variant_insensitive(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        # hostnames/paths are ASCII in practice (IDN hosts travel as
        # punycode); exotic-Unicode upper/lower round-trips differ between
        # Python and the JVM and are out of contract
        seg = st.text("abcdefghijklmnopqrstuvwxyz0123456789", min_size=1, max_size=6)

        @st.composite
        def url_variants(draw):
            scheme = draw(st.sampled_from(["http", "https"]))
            host = ".".join(draw(st.lists(seg, min_size=2, max_size=3)))
            path = "/" + "/".join(draw(st.lists(seg, min_size=0, max_size=3)))
            params = draw(
                st.lists(
                    st.tuples(seg, seg).map(lambda kv: f"{kv[0]}{kv[1]}=1"),
                    max_size=3,
                    unique=True,
                )
            )
            tracking = draw(st.lists(st.sampled_from(
                ["utm_source=x", "utm_campaign=y", "fbclid=z", "gclid=w"]), max_size=2))
            frag = draw(st.sampled_from(["", "#top"]))
            shuffled = draw(st.permutations(params + tracking))
            q = "&".join(shuffled)
            default_port = ":80" if scheme == "http" else ":443"
            port = draw(st.sampled_from(["", default_port]))
            # case-vary the host on one variant; add trailing slash on another
            base = f"{scheme}://{host}{port}{path}"
            v1 = base + (f"?{q}" if q else "") + frag
            v2 = (
                f"{scheme}://{host.upper()}{path}"
                + ("/" if not path.endswith("/") else "")
                + (f"?{'&'.join(draw(st.permutations(params)))}" if params else "")
            )
            return v1, v2

        @given(url_variants())
        @settings(max_examples=15, deadline=None)
        def run(pair):
            v1, v2 = pair
            c1, c2 = self._canon([v1, v2])
            # crawl variants (case/port/tracking/param-order/slash/fragment)
            # collapse to one canonical form
            assert c1 == c2, (v1, v2)
            # canonicalization is idempotent
            again = self._canon([c1])[0]
            assert again == c1

        run()


class TestUrlDedupTies:
    def test_identical_raw_urls_keep_exactly_one(self, spark):
        """Ties on the winner key (same raw URL re-crawled) must still
        yield exactly ONE row per canonical URL (code-review finding:
        the min-key semi-join kept every row tying for the minimum)."""
        from sssom_curator_spark.functions.url_ops import url_dedup

        df = spark.createDataFrame(
            [
                ("http://a.com/x", "crawl1"),
                ("http://a.com/x", "crawl2"),  # same raw url, tie on key
                ("HTTP://A.com:80/x?utm_source=1", "crawl3"),
                ("http://a.com/y", "crawl4"),
            ],
            "url string, crawl string",
        )
        kept = url_dedup(df).collect()
        assert len(kept) == 2  # one per canonical URL
        by_url = sorted((r["url"], r["crawl"]) for r in kept)
        # min raw url wins; among the two identical raw urls the content
        # hash picks one deterministically
        assert by_url[0][0] == "HTTP://A.com:80/x?utm_source=1"
        assert by_url[1] == ("http://a.com/y", "crawl4")
        again = sorted((r["url"], r["crawl"]) for r in url_dedup(df.repartition(7)).collect())
        assert again == by_url  # partition-invariant winner

    def test_map_columns_take_fallback_path(self, spark):
        """Spark hash/ordering expressions reject MapType; a frame with a
        map column must still dedup (winner keys over non-map columns,
        semi-join resolution — ADVICE r04)."""
        from pyspark.sql import functions as F

        from sssom_curator_spark.functions.url_ops import url_dedup

        df = spark.createDataFrame(
            [
                ("HTTP://A.com:80/x?utm_source=1", "c3"),
                ("http://a.com/x", "c1"),
                ("http://a.com/y", "c4"),
            ],
            "url string, crawl string",
        ).withColumn("headers", F.create_map(F.lit("k"), F.col("crawl")))
        kept = sorted((r["url"], r["crawl"]) for r in url_dedup(df).collect())
        assert kept == [("HTTP://A.com:80/x?utm_source=1", "c3"), ("http://a.com/y", "c4")]
        again = sorted(
            (r["url"], r["crawl"]) for r in url_dedup(df.repartition(5)).collect()
        )
        assert again == kept


class TestDomainOps:
    def test_host_and_registered_domain(self, spark):
        from pyspark.sql import functions as F

        from sssom_curator_spark.functions.url_ops import registered_domain, url_host

        cases = [
            ("https://WWW.Shop.COM:8080/x?q=1#f", "www.shop.com", "shop.com"),
            ("http://localhost/x", "localhost", "localhost"),
            ("https://a.b.c.example.org", "a.b.c.example.org", "example.org"),
            ("no-scheme/path", None, None),
            ("", None, None),
        ]
        df = spark.createDataFrame([(u,) for u, _, _ in cases], "url string")
        got = df.select(
            url_host("url").alias("h"), registered_domain("url").alias("d")
        ).collect()
        for (u, h, d), r in zip(cases, got):
            assert r["h"] == h, (u, r["h"])
            assert r["d"] == d, (u, r["d"])

    def test_domain_stats_and_blocklist(self, spark):
        import pandas as pd

        from sssom_curator_spark.functions.url_ops import (
            domain_stats,
            filter_blocklisted_domains,
        )

        pages = spark.createDataFrame(
            pd.DataFrame(
                {
                    "url": [
                        "https://www.a.com/x?utm_source=1",
                        "https://a.com/x",  # different host, same DOMAIN a.com
                        "https://www.a.com/x",  # same canonical as row 0
                        "https://b.com/y",
                        "bad url",
                    ],
                    "text": ["aaaa", "bb", "cc", "dd", "e"],
                }
            )
        )
        stats = {
            r["domain"]: (r["n_pages"], r["n_urls"], r["avg_chars"])
            for r in domain_stats(pages, url_col="url", text_col="text").collect()
        }
        # rows 0+2 share a canonical URL; avg chars = (4+2+2)/3
        assert stats["a.com"] == (3, 2, round(8 / 3, 6))
        assert stats["b.com"] == (1, 1, 2.0)
        assert stats[None][0] == 1  # malformed stays visible under NULL

        blocked = spark.createDataFrame(pd.DataFrame({"domain": ["a.com"]}))
        kept = sorted(
            r["url"] for r in filter_blocklisted_domains(pages, blocked).collect()
        )
        # NULL-domain (malformed) rows survive the anti-join
        assert kept == ["bad url", "https://b.com/y"]


class TestVocabStats:
    def _docs(self, spark):
        return spark.createDataFrame(
            [
                ("d1", "the cat sat  ON the mat"),
                ("d2", "the dog\tand the cat"),
                ("d3", None),
                ("d4", "   "),
            ],
            "doc_id string, text string",
        )

    def test_tf_df_and_ordering(self, spark):
        from sssom_curator_spark.operators.textstats import vocab_stats

        rows = vocab_stats(self._docs(spark), top_k=3).collect()
        # "the" tf=4 across 2 docs; ties below broken token-ascending
        assert [r["token"] for r in rows] == ["the", "cat", "and"]
        assert (rows[0]["tf"], rows[0]["df_docs"]) == (4, 2)
        assert (rows[1]["tf"], rows[1]["df_docs"]) == (2, 2)

    def test_min_df_filters_singletons(self, spark):
        from sssom_curator_spark.operators.textstats import vocab_stats

        toks = {
            r["token"]
            for r in vocab_stats(self._docs(spark), min_df=2).collect()
        }
        assert toks == {"the", "cat"}

    def test_plan_hub_safe_distinct_and_topk(self, spark):
        """Pin the two scale properties: the distinct-doc count must plan
        with its FIRST exchange keyed on (token, doc) — a stopword in
        every document cannot hot-key one reducer — and the top-k must be
        a TakeOrderedAndProject, never a global sort."""
        from sssom_curator_spark.operators.textstats import vocab_stats

        plan = (
            vocab_stats(self._docs(spark))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "TakeOrderedAndProject" in plan
        assert "Sort " not in plan
        exchanges = [l for l in plan.splitlines() if "Exchange hashpartitioning" in l]
        assert len(exchanges) == 2
        # bottom-most exchange (printed last) carries both keys
        assert "token" in exchanges[-1] and "_doc" in exchanges[-1]


class TestBpePairCounts:
    def test_counts_match_hand_replay(self, spark):
        from sssom_curator_spark.operators.textstats import bpe_pair_counts

        docs = spark.createDataFrame(
            [("d1", "aba  AB"), ("d2", "aba x"), ("d3", None)],
            "doc_id string, text string",
        )
        rows = bpe_pair_counts(docs, top_k=10).collect()
        got = {(r["lhs"], r["rhs"]): r["cnt"] for r in rows}
        # words: aba x2, ab x1 ('x' has no pairs, None drops)
        # pairs: aba -> (a,b)+(b,a) each x2; ab -> (a,b) x1
        assert got == {("a", "b"): 3, ("b", "a"): 2}
        # ordering: cnt DESC then lhs/rhs ASC
        assert [(r["lhs"], r["rhs"]) for r in rows] == [("a", "b"), ("b", "a")]

    def test_explode_is_vocabulary_sized(self, spark):
        """Pin the scale shape: the pair explode must sit ABOVE the word
        aggregation (vocabulary-sized input), i.e. the plan has exactly
        two aggregate exchanges (word, then pair) and the generator
        consumes the aggregated count column."""
        from sssom_curator_spark.operators.textstats import bpe_pair_counts

        docs = spark.createDataFrame([("d", "a b ab")], "doc_id string, text string")
        plan = (
            bpe_pair_counts(docs)._jdf.queryExecution().executedPlan().toString()
        )
        assert "TakeOrderedAndProject" in plan
        exchanges = [l for l in plan.splitlines() if "Exchange hashpartitioning" in l]
        assert len(exchanges) == 2
        gen = plan.index("Generate explode")
        # the word-count aggregate's exchange is BELOW (printed after) the
        # generator: the explode runs over aggregated distinct words
        assert any("word" in l for l in plan[gen:].splitlines()
                   if "Exchange hashpartitioning" in l)


class TestCrawlMerge:
    def test_newest_capture_wins(self, spark):
        from sssom_curator_spark.functions.url_ops import crawl_merge

        old = spark.createDataFrame(
            [
                ("HTTP://A.com:80/x?utm_source=1", "2024-01-01", "old-x"),
                ("http://a.com/y", "2024-01-01", "old-y"),
            ],
            "url string, warc_ts string, body string",
        )
        new = spark.createDataFrame(
            [("http://a.com/x", "2024-02-01", "new-x")],
            "url string, warc_ts string, body string",
        )
        kept = {r["body"]: r for r in crawl_merge(old, new).collect()}
        # /x refreshed by the new crawl; /y untouched survives
        assert set(kept) == {"new-x", "old-y"}

    def test_ties_and_identical_rows_keep_exactly_one(self, spark):
        from sssom_curator_spark.functions.url_ops import crawl_merge

        old = spark.createDataFrame(
            [("http://a.com/x", "2024-01-01", "a")],
            "url string, warc_ts string, body string",
        )
        new = spark.createDataFrame(
            [
                ("http://a.com/x", "2024-01-01", "b"),  # ts tie, content differs
                ("http://a.com/x", "2024-01-01", "b"),  # fully identical pair
            ],
            "url string, warc_ts string, body string",
        )
        kept = crawl_merge(old, new).collect()
        assert len(kept) == 1
        assert kept[0]["body"] == "b"  # struct-max tiebreak: larger row wins
        again = crawl_merge(old.repartition(5), new.repartition(3)).collect()
        assert [tuple(r) for r in again] == [tuple(r) for r in kept]

    def test_map_columns_take_fallback_path(self, spark):
        from pyspark.sql import functions as F

        from sssom_curator_spark.functions.url_ops import crawl_merge

        old = spark.createDataFrame(
            [("http://a.com/x", "2024-01-01", "a")],
            "url string, warc_ts string, body string",
        ).withColumn("headers", F.create_map(F.lit("k"), F.col("body")))
        new = spark.createDataFrame(
            [("http://a.com/x", "2024-02-01", "b")],
            "url string, warc_ts string, body string",
        ).withColumn("headers", F.create_map(F.lit("k"), F.col("body")))
        kept = crawl_merge(old, new).collect()
        assert len(kept) == 1 and kept[0]["body"] == "b"


class TestSessionWindowBoundary:
    def test_exact_gap_merges_into_session(self, spark):
        """Pin Spark's session-merge semantics: windows that TOUCH merge,
        so an event exactly `gap` after the previous one JOINS its
        session (the DuckDB oracle therefore splits on strictly >)."""
        from pyspark.sql import functions as F

        ev = spark.createDataFrame(
            [
                (1, "2024-01-01 00:00:00"),
                (1, "2024-01-01 00:30:00"),  # exactly the 30-min gap
                (1, "2024-01-01 00:40:00"),  # merges with the second
            ],
            "user_id int, ts_s string",
        ).select("user_id", F.to_timestamp("ts_s").alias("ts"))
        rows = (
            ev.groupBy("user_id", F.session_window(F.col("ts"), "30 minutes"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        assert sorted(r["n"] for r in rows) == [3]


class TestBpeTrain:
    @staticmethod
    def _py_bpe(texts, n_merges):
        """Pure-python BPE replay (greedy left-to-right apply)."""
        from collections import Counter

        vocab = Counter()
        for t in texts:
            if t:
                for w in t.strip().lower().split():
                    vocab[w] += 1
        syms = {w: list(w) for w in vocab}
        merges = []
        for rank in range(n_merges):
            counts = Counter()
            for w, n in vocab.items():
                s = syms[w]
                for i in range(len(s) - 1):
                    counts[(s[i], s[i + 1])] += n
            if not counts:
                break
            (lhs, rhs), cnt = min(
                counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
            )
            merges.append((rank, lhs, rhs, cnt))
            for w in syms:
                s, out = syms[w], []
                for sym in s:
                    if out and out[-1] == lhs and sym == rhs:
                        out[-1] = lhs + rhs
                    else:
                        out.append(sym)
                syms[w] = out
        return merges

    def test_matches_python_replay(self, spark):
        from sssom_curator_spark.operators.textstats import bpe_train

        texts = [
            "the theme thesis",
            "then the other theory",
            "aaa aaaa banana bandana",
            None,
        ]
        docs = spark.createDataFrame(
            [(str(i), t) for i, t in enumerate(texts)], "doc_id string, text string"
        )
        got = [
            (r["merge_rank"], r["lhs"], r["rhs"], r["cnt"])
            for r in bpe_train(docs, n_merges=5).orderBy("merge_rank").collect()
        ]
        want = self._py_bpe(texts, 5)
        assert got == want

    def test_greedy_left_to_right_overlap(self, spark):
        """'aaa' under merge a+a must yield [aa, a], so the second
        iteration's top pair becomes (aa, a)."""
        from sssom_curator_spark.operators.textstats import bpe_train

        docs = spark.createDataFrame([("d", "aaa aaa")], "doc_id string, text string")
        rows = bpe_train(docs, n_merges=2).orderBy("merge_rank").collect()
        # counting sees both overlapping (a,a) positions in 'aaa' (x2 docs
        # -> 4); the APPLY is non-overlapping, so iteration 2 sees [aa, a]
        assert (rows[0]["lhs"], rows[0]["rhs"], rows[0]["cnt"]) == ("a", "a", 4)
        assert (rows[1]["lhs"], rows[1]["rhs"], rows[1]["cnt"]) == ("aa", "a", 2)

    def test_empty_corpus(self, spark):
        from sssom_curator_spark.operators.textstats import bpe_train

        docs = spark.createDataFrame([], "doc_id string, text string")
        assert bpe_train(docs, n_merges=3).count() == 0


class TestBpeEncode:
    def test_encode_matches_train_replay(self, spark):
        """Train 3 merges, encode with them: every word's symbols must
        equal the python replay's final vocabulary entry."""
        from sssom_curator_spark.operators.textstats import bpe_encode, bpe_train

        texts = ["the theme then", "the other theory aaa"]
        docs = spark.createDataFrame(
            [(str(i), t) for i, t in enumerate(texts)], "doc_id string, text string"
        )
        merges = [
            (r["lhs"], r["rhs"])
            for r in bpe_train(docs, n_merges=3).orderBy("merge_rank").collect()
        ]
        enc = {r["doc_id"]: r for r in bpe_encode(docs, merges).collect()}

        syms = {}
        for t in texts:
            for w in t.split():
                syms[w] = list(w)
        for lhs, rhs in merges:
            for w in syms:
                out = []
                for sym in syms[w]:
                    if out and out[-1] == lhs and sym == rhs:
                        out[-1] = lhs + rhs
                    else:
                        out.append(sym)
                syms[w] = out
        for i, t in enumerate(texts):
            want = [s for w in t.split() for s in syms[w]]
            assert enc[str(i)]["bpe_tokens"] == want, (t, enc[str(i)]["bpe_tokens"])
            assert enc[str(i)]["n_bpe_tokens"] == len(want)

    def test_no_merges_yields_chars(self, spark):
        from sssom_curator_spark.operators.textstats import bpe_encode

        docs = spark.createDataFrame([("d", "ab c"), ("e", None)],
                                     "doc_id string, text string")
        rows = {r["doc_id"]: r for r in bpe_encode(docs, []).collect()}
        assert rows["d"]["bpe_tokens"] == ["a", "b", "c"]
        assert rows["e"]["bpe_tokens"] == [] and rows["e"]["n_bpe_tokens"] == 0


class TestTfidfTopk:
    def test_hand_example(self, spark):
        import math

        from sssom_curator_spark.operators.textstats import tfidf_topk

        docs = spark.createDataFrame(
            [
                ("d1", "apple apple banana"),
                ("d2", "banana cherry"),
                ("d3", "cherry cherry cherry"),
            ],
            "doc_id string, text string",
        )
        rows = {
            (r["doc_id"], r["token"]): r for r in tfidf_topk(docs, k=2).collect()
        }
        idf = lambda df_docs: math.floor(math.log(4.0 / (df_docs + 1)) * 1e6)
        # d1: apple tf=2 df=1 beats banana tf=1 df=2
        assert rows[("d1", "apple")]["score_micro"] == 2 * idf(1)
        assert rows[("d1", "banana")]["score_micro"] == 1 * idf(2)
        assert ("d2", "banana") in rows and ("d2", "cherry") in rows
        # per-doc cap at k
        from collections import Counter

        per_doc = Counter(d for d, _ in rows)
        assert all(v <= 2 for v in per_doc.values())

    def test_deterministic_tie_order(self, spark):
        from sssom_curator_spark.operators.textstats import tfidf_topk

        docs = spark.createDataFrame(
            [("d1", "zz aa"), ("d2", "qq")], "doc_id string, text string"
        )
        rows = [
            (r["doc_id"], r["token"])
            for r in tfidf_topk(docs, k=1).orderBy("doc_id").collect()
        ]
        # zz and aa tie on score in d1 -> token-ascending wins
        assert rows == [("d1", "aa"), ("d2", "qq")]


class TestQualityFeatureRegressions:
    def test_empty_and_whitespace_docs_score_zero_words(self, spark):
        from sssom_curator_spark.operators.textstats import quality_score

        docs = spark.createDataFrame(
            [("e", ""), ("w", "   \n\t "), ("n", None)],
            "doc_id string, text string",
        )
        rows = {r["doc_id"]: r for r in quality_score(docs).collect()}
        for d in ("e", "w", "n"):
            assert rows[d]["n_words"] == 0
            assert rows[d]["mean_word_len"] == 0.0

    def test_mean_word_len_ignores_whitespace_runs(self, spark):
        from sssom_curator_spark.operators.textstats import quality_features

        docs = spark.createDataFrame(
            [("d", "hi\n\n\n   there")], "doc_id string, text string"
        )
        r = quality_features(docs).collect()[0]
        assert r["n_words"] == 2
        assert r["mean_word_len"] == round((2 + 5) / 2, 4)


class TestBpeSeparatorStripping:
    def test_unit_separator_char_in_tokens(self, spark):
        from sssom_curator_spark.operators.textstats import bpe_encode

        docs = spark.createDataFrame(
            [("d", "a\x1fb ab")], "doc_id string, text string"
        )
        rows = bpe_encode(docs, []).collect()[0]
        # the \x1f inside the token is stripped, not a phantom symbol
        assert rows["bpe_tokens"] == ["a", "b", "a", "b"]
        assert rows["n_bpe_tokens"] == 4


class TestUrlDedupNullKeyFallback:
    def test_map_fallback_keeps_null_key_group(self, spark):
        """A NULL url in the map-column fallback path must still keep
        exactly one row of its canonical group (plain == on the NULL
        winner key dropped the whole group)."""
        from pyspark.sql import functions as F

        from sssom_curator_spark.functions.url_ops import url_dedup

        df = spark.createDataFrame(
            [(None, "c1"), (None, "c2"), ("http://a.com/x", "c3")],
            "url string, crawl string",
        ).withColumn("headers", F.create_map(F.lit("k"), F.col("crawl")))
        kept = url_dedup(df).collect()
        urls = sorted((r["url"] or "<null>") for r in kept)
        assert urls == ["<null>", "http://a.com/x"]


class TestUnigramLogprob:
    def _docs(self, spark):
        import pandas as pd

        return spark.createDataFrame(
            pd.DataFrame(
                {
                    "doc_id": [1, 2, 3, 4],
                    "text": [
                        "the cat sat on the mat",
                        "the dog sat",
                        "zyxw qqqq",  # rare tokens -> high NLL
                        "   ",  # token-less
                    ],
                }
            )
        )

    def test_matches_python_oracle(self, spark):
        import math
        from collections import Counter

        from sssom_curator_spark.operators.textstats import unigram_logprob_score

        texts = {
            1: "the cat sat on the mat",
            2: "the dog sat",
            3: "zyxw qqqq",
            4: "   ",
        }
        toks = {d: t.lower().split() for d, t in texts.items()}
        tf = Counter(w for ws in toks.values() for w in ws)
        total, vsize = sum(tf.values()), len(tf)
        denom = total + 1.0 * (vsize + 1)

        def nll(ws):
            return sum(math.log(denom) - math.log(tf[w] + 1.0) for w in ws) / len(ws)

        got = {
            r["doc_id"]: (r["n_tokens"], r["mean_nll"])
            for r in unigram_logprob_score(self._docs(spark)).collect()
        }
        assert set(got) == {1, 2, 3, 4}
        assert got[4] == (0, None)
        for d in (1, 2, 3):
            assert got[d][0] == len(toks[d])
            assert got[d][1] == pytest.approx(nll(toks[d]), abs=2e-6)
        # rare-token doc scores worse than stopword-y docs
        assert got[3][1] > got[1][1] and got[3][1] > got[2][1]

    def test_null_text(self, spark):
        import pandas as pd

        from sssom_curator_spark.operators.textstats import unigram_logprob_score

        docs = spark.createDataFrame(
            pd.DataFrame({"doc_id": [1, 2], "text": ["a b", None]})
        )
        got = {r["doc_id"]: r["n_tokens"] for r in unigram_logprob_score(docs).collect()}
        assert got == {1: 2, 2: 0}


class TestCrawlDiff:
    def test_added_removed_changed(self, spark):
        import pandas as pd

        from sssom_curator_spark.functions.url_ops import crawl_diff

        old = spark.createDataFrame(
            pd.DataFrame(
                {
                    "url": [
                        "http://a.com/1",
                        "http://a.com/2",
                        "http://a.com/3",
                        # duplicate capture within the snapshot: max hash wins
                        "http://a.com/3",
                    ],
                    "text": ["same", "old content", "dup-a", "dup-b"],
                }
            )
        )
        new = spark.createDataFrame(
            pd.DataFrame(
                {
                    "url": ["http://a.com/1", "http://a.com/2", "http://a.com/4"],
                    "text": ["same", "NEW content", "brand new"],
                }
            )
        )
        got = {r["url"]: r["status"] for r in crawl_diff(old, new).collect()}
        assert got == {
            "http://a.com/2": "changed",
            "http://a.com/3": "removed",
            "http://a.com/4": "added",
        }

    def test_unchanged_corpus_is_empty_delta(self, spark):
        import pandas as pd

        from sssom_curator_spark.functions.url_ops import crawl_diff

        df = spark.createDataFrame(
            pd.DataFrame({"url": ["http://x.org/a"], "text": ["t"]})
        )
        assert crawl_diff(df, df).count() == 0


class TestBigramPmi:
    def test_matches_python_oracle(self, spark):
        import math
        from collections import Counter

        import pandas as pd

        from sssom_curator_spark.operators.textstats import bigram_pmi

        texts = [
            "new york is far from new jersey",
            "new york new york",
            "the city of new york",
            "",
        ]
        docs = spark.createDataFrame(
            pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
        )
        got = {
            (r["w1"], r["w2"]): (r["c"], r["pmi"])
            for r in bigram_pmi(docs, min_count=2).collect()
        }

        toks = [t.split() for t in texts]
        uni = Counter(w for ws in toks for w in ws)
        t1 = sum(uni.values())
        t2 = t1 - sum(1 for ws in toks if ws)
        pairs = Counter((ws[i], ws[i + 1]) for ws in toks for i in range(len(ws) - 1))
        want = {
            p: (c, round(math.log((c / t2) / ((uni[p[0]] / t1) * (uni[p[1]] / t1))) + 1e-9, 6))
            for p, c in pairs.items()
            if c >= 2
        }
        assert got == want
        assert ("new", "york") in got and got[("new", "york")][0] == 4

    def test_empty_corpus(self, spark):
        import pandas as pd

        from sssom_curator_spark.operators.textstats import bigram_pmi

        docs = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "text": ["solo"]}))
        assert bigram_pmi(docs).count() == 0


class TestZipfFit:
    def test_matches_numpy_lstsq(self, spark):
        import math
        from collections import Counter

        import pandas as pd

        from sssom_curator_spark.operators.textstats import zipf_fit

        texts = [" ".join(f"w{j}" for j in range(i % 17 + 1)) for i in range(80)]
        docs = spark.createDataFrame(
            pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
        )
        row = zipf_fit(docs, top_k=10).collect()[0]

        tf = Counter(w for t in texts for w in t.split())
        top = sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        xs = [math.log(r + 1) for r in range(len(top))]
        ys = [math.log(c) for _, c in top]
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        sxx = sum(x * x for x in xs)
        slope = (sxy - sx * sy / n) / (sxx - sx * sx / n)
        intercept = sy / n - slope * sx / n
        assert row["n_tokens_fit"] == n
        assert row["slope"] == pytest.approx(slope, abs=2e-6)
        assert row["intercept"] == pytest.approx(intercept, abs=2e-6)
        # a frequency-decaying corpus fits a negative slope
        assert row["slope"] < 0


class TestZipfDegenerate:
    def test_single_token_vocab_is_null(self, spark):
        import pandas as pd

        from sssom_curator_spark.operators.textstats import zipf_fit

        docs = spark.createDataFrame(
            pd.DataFrame({"doc_id": [1, 2], "text": ["aaa aaa", "aaa"]})
        )
        row = zipf_fit(docs, top_k=5).collect()[0]
        assert row["n_tokens_fit"] == 1
        assert row["slope"] is None and row["intercept"] is None
