"""Link extraction and domain link-graph tests."""

from __future__ import annotations

import pandas as pd

from sssom_curator_spark.operators.weblinks import extract_links, link_graph


def _pages(spark):
    rows = [
        (
            "http://a.example.com/1",
            '<html><body><p>see <a href="http://x.other.org/p">X page</a> and '
            '<a class="ext" href="https://www.y.net/q?id=2">Y&amp;Z</a></p>'
            "<a>no href</a></body></html>",
        ),
        (
            "http://b.example.com/2",
            '<div><a href="http://x.other.org/r">X again</a>'
            '<a href="http://x.other.org/r"><b>nested markup</b></a></div>',
        ),
        ("http://c.example.com/3", "<p>no links at all</p>"),
        ("http://a.example.com/4", None),
    ]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["url", "html"])
    )


class TestExtractLinks:
    def test_positions_hrefs_anchors(self, spark):
        got = extract_links(_pages(spark)).collect()
        by_url = {}
        for r in got:
            by_url.setdefault(r["url"], []).append((r["pos"], r["href"], r["anchor"]))
        assert by_url["http://a.example.com/1"] == [
            (0, "http://x.other.org/p", "X page"),
            (1, "https://www.y.net/q?id=2", "Y&amp;Z"),
        ]
        # nested-markup anchor does not match the [^<]* rule; href-less <a> skipped
        assert by_url["http://b.example.com/2"] == [(0, "http://x.other.org/r", "X again")]
        assert "http://c.example.com/3" not in by_url
        assert "http://a.example.com/4" not in by_url

    def test_binary_html(self, spark):
        df = spark.createDataFrame(
            pd.DataFrame(
                {
                    "url": ["http://a.com/x"],
                    "html": [b'<a href="http://b.com/y">go</a>'],
                }
            )
        )
        rows = extract_links(df).collect()
        assert [(r["href"], r["anchor"]) for r in rows] == [("http://b.com/y", "go")]


class TestLinkGraph:
    def test_aggregation(self, spark):
        links = extract_links(_pages(spark))
        got = {
            (r["src_domain"], r["dst_domain"]): (r["n_links"], r["n_pages"])
            for r in link_graph(links).collect()
        }
        assert got == {
            ("example.com", "other.org"): (2, 2),
            ("example.com", "y.net"): (1, 1),
        }


class TestAnchorGrounding:
    def test_normalized_anchor_join(self, spark):
        from sssom_curator_spark.operators.weblinks import anchor_entity_candidates

        links = spark.createDataFrame(
            pd.DataFrame(
                {
                    "url": ["http://s.com/1"] * 3 + ["http://s.com/2"],
                    "href": [
                        "http://a.org/x",
                        "http://a.org/y",
                        "http://b.net/z",
                        "http://a.org/w",
                    ],
                    "anchor": ["Alpha-Tocopherol ", "alpha  tocopherol", "aspirin", "nothing"],
                }
            )
        )
        index = spark.createDataFrame(
            pd.DataFrame(
                {
                    "prefix": ["CHEBI", "CHEBI"],
                    "identifier": ["18145", "15365"],
                    "norm_text": ["alpha tocopherol", "aspirin"],
                }
            )
        )
        got = {
            (r["dst_domain"], r["object_id"]): r["n_links"]
            for r in anchor_entity_candidates(links, index).collect()
        }
        assert got == {
            ("a.org", "CHEBI:18145"): 2,   # dash + case + whitespace all normalize
            ("b.net", "CHEBI:15365"): 1,
        }
