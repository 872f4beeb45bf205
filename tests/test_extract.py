"""HTML extraction: the byte-identical-per-url invariant + edge cases."""

from __future__ import annotations

from sssom_curator_spark.extract import extract_text, extraction_parity
from sssom_curator_spark.sources.pages import generate_pages


class TestExtractText:
    def test_basic_blocks(self):
        html = "<html><body><p>hello</p><p>world</p></body></html>"
        assert extract_text(html) == "hello\nworld"

    def test_script_style_dropped(self):
        html = "<body><script>var x = '<p>no</p>';</script><style>p{}</style><p>yes</p></body>"
        assert extract_text(html) == "yes"

    def test_boilerplate_containers_dropped(self):
        html = (
            "<body><nav>menu</nav><header>head</header>"
            '<div class="cookie-notice">cookies</div>'
            '<div id="main-menu">nav2</div><p>content</p><footer>foot</footer></body>'
        )
        assert extract_text(html) == "content"

    def test_entities_decoded(self):
        assert extract_text("<p>a &amp; b &lt;c&gt;</p>") == "a & b <c>"

    def test_comments_stripped(self):
        assert extract_text("<p>keep</p><!-- <p>gone</p> -->") == "keep"

    def test_nested_dropped_subtree(self):
        html = "<nav><div><span>deep</span></div></nav><p>kept</p>"
        assert extract_text(html) == "kept"

    def test_whitespace_collapse(self):
        assert extract_text("<p>a   b\t c</p>\n\n<p> d </p>") == "a b c\nd"

    def test_bytes_input(self):
        assert extract_text("<p>héllo</p>".encode()) == "héllo"

    def test_none(self):
        assert extract_text(None) is None

    def test_deterministic(self):
        html = "<body><p>x</p><nav>y</nav></body>"
        assert extract_text(html) == extract_text(html)


class TestParityInvariant:
    def test_generated_pages_extract_byte_identically(self, spark):
        # north rule: byte-identical extracted text per url
        pages = generate_pages(spark, 300)
        assert extraction_parity(pages).count() == 0

    def test_parity_across_parallelism(self, spark):
        pages = generate_pages(spark, 120)
        assert extraction_parity(pages.repartition(16)).count() == 0
        assert extraction_parity(pages.coalesce(1)).count() == 0
