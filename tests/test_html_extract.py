"""HTML -> text extraction (`operators/text.py html_extract`, r11):
golden cases for nested, malformed, and adversarial markup, plus the
keep rules (word count, link density) and entity-decoding order."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from automated_datastore_discovery_with_aws_glue_spark.operators.text import html_extract


def _extract(spark, raw, **kw):
    df = spark.createDataFrame([(raw,)], ["raw"])
    return df.select(html_extract(F.col("raw"), **kw).alias("t")).collect()[0]["t"]


def test_strips_script_style_comments_including_tagged_content(spark):
    raw = (
        "<html><head><style>p { color: red; } /* <div>x</div> */</style>"
        "<script>if (a < b) { document.write('<p>injected words here</p>'); }</script>"
        "</head><body><!-- note: <p>commented words never appear</p> -->"
        "<p>Only this sentence should survive the sweep.</p></body></html>"
    )
    assert _extract(spark, raw) == "Only this sentence should survive the sweep."


def test_nested_blocks_split_and_merge_inline_markup(spark):
    raw = (
        "<div><div><p>Deeply <b>nested</b> prose block one.</p></div>"
        "<ul><li>List item with three words</li>"
        "<li>Second item also has words</li></ul></div>"
    )
    out = _extract(spark, raw)
    assert out.split("\n") == [
        "Deeply nested prose block one.",
        "List item with three words",
        "Second item also has words",
    ]


def test_malformed_markup_degrades_without_losing_body_text(spark):
    # unclosed tags, stray '<', an attribute value containing '>'
    raw = (
        "<p>Unclosed paragraph keeps its words"
        "<div>Math like 1 < 2 stays when not a tag start.</div>"
        '<p data-x="a>b">Attribute greater-than truncates the tag early.</p>'
    )
    out = _extract(spark, raw)
    assert "Unclosed paragraph keeps its words" in out
    assert "Math like 1 < 2 stays when not a tag start." in out
    # documented limit: '>' inside an attribute value ends the tag there,
    # leaking the remainder — the block's words still survive
    assert "Attribute greater-than truncates the tag early." in out


def test_link_density_drops_navs_but_keeps_prose_with_inline_links(spark):
    nav = (
        '<nav><a href="/">Home page link</a> <a href="/a">About us page</a>'
        ' <a href="/b">Contact form here</a></nav>'
    )
    prose = (
        "<p>A real paragraph of body text mentioning "
        '<a href="/ref">one reference</a> inline and carrying on.</p>'
    )
    out = _extract(spark, nav + prose)
    assert "Home page link" not in out
    assert out.startswith("A real paragraph")
    # the same nav SURVIVES when the density rule is relaxed
    loose = _extract(spark, nav + prose, max_link_bp=10000)
    assert "Home page link" in loose


def test_word_count_rule_and_empty_result(spark):
    raw = "<p>Too short</p><p>ok</p><h2>x</h2>"
    assert _extract(spark, raw) == ""
    assert _extract(spark, raw, min_words=2) == "Too short"


def test_entity_decoding_order_and_subset(spark):
    raw = (
        "<p>Decoded: a &lt; b &gt; c &quot;q&quot; it&#39;s &apos;s&apos;"
        " x&nbsp;y &amp; done</p>"
        "<p>Double encoded &amp;lt; stays a literal entity here.</p>"
        "<p>Numeric &#65; forms pass through untouched by design.</p>"
    )
    out = _extract(spark, raw).split("\n")
    assert out[0] == "Decoded: a < b > c \"q\" it's 's' x y & done"
    # &amp; decodes LAST: double-encoded text yields the entity, not '<'
    assert out[1] == "Double encoded &lt; stays a literal entity here."
    assert out[2] == "Numeric &#65; forms pass through untouched by design."


def test_entity_encoded_markup_is_text_not_structure(spark):
    raw = "<p>The string &lt;script&gt;alert(1)&lt;/script&gt; is visible text.</p>"
    assert (
        _extract(spark, raw)
        == "The string <script>alert(1)</script> is visible text."
    )


def test_case_insensitive_tags_and_whitespace_normalization(spark):
    raw = (
        "<P>Upper   case\t\ttags   and\n\nragged    whitespace collapse.</P>"
        "<SCRIPT>var hidden = 'three words here';</SCRIPT>"
        "<BR><H3>Another kept heading block</H3>"
    )
    out = _extract(spark, raw)
    assert out.split("\n") == [
        "Upper case tags and ragged whitespace collapse.",
        "Another kept heading block",
    ]


def test_numeric_entities_decode_like_named_twins(spark):
    # decimal forms and their named twins land on the SAME character, so
    # dedup fingerprints agree across encodings (r11 entity-table widening)
    raw = (
        "<p>&#8220;smart&#8221; &ldquo;smart&rdquo; quotes here</p>"
        "<p>dash &#8211; and &#8212; meet &ndash; and &mdash; today</p>"
        "<p>ellipsis&#8230; ellipsis&hellip; apostrophe&#8217;s test</p>"
        "<p>nbsp&#160;and&nbsp;amp &#38; &amp; done now</p>"
    )
    out = _extract(spark, raw)
    assert out.split("\n") == [
        "“smart” “smart” quotes here",
        "dash – and — meet – and — today",
        "ellipsis… ellipsis… apostrophe’s test",
        "nbsp and amp & & done now",
    ]


def test_unknown_numeric_entities_pass_through(spark):
    # still a documented limit: arbitrary codes are NOT computed
    assert _extract(spark, "<p>code &#12345; stays put here</p>") == (
        "code &#12345; stays put here"
    )


def test_double_encoded_ampersand_family_decodes_one_level(spark):
    # '&amp;#38;' is the LITERAL text '&#38;' one level up; '&#38;amp;'
    # is the literal '&amp;' — the single-pass regex never rescans its
    # replacement, so neither over-decodes (code-review r11)
    raw = "<p>literal one &amp;#38; literal two &#38;amp; and &amp;lt; stay</p>"
    assert _extract(spark, raw) == "literal one &#38; literal two &amp; and &lt; stay"
