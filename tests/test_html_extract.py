"""HTML main-content extraction — shallow-feature block filtering.

Semantics follow the public literature (boilerpipe WSDM 2010 / jusText
2011 shallow features: block text length + link density); these tests
pin segmentation, feature math, and the keep rule.
"""

from pyspark.sql import functions as F

from bambooanalysis_spark.operators.text import (
    extract_main_text,
    html_blocks,
)


def _blocks(spark, html):
    rows = (
        spark.createDataFrame([(html,)], "html string")
        .select(F.explode(html_blocks(F.col("html"))).alias("b"))
        .select("b.*")
        .where(F.col("text_chars") > 0)
        .collect()
    )
    return [
        (r["text"], r["text_chars"], r["anchor_chars"], r["link_density_e4"])
        for r in rows
    ]


def _main(spark, html, **kw):
    return (
        spark.createDataFrame([(html,)], "html string")
        .select(extract_main_text(F.col("html"), **kw).alias("m"))
        .collect()[0]["m"]
    )


def test_block_features_nav_vs_prose(spark):
    html = (
        "<div><a href=/>Home</a> <a href=/a>About us page</a></div>"
        "<p>Prose with one <a href=/r>link</a> inside a long sentence.</p>"
    )
    got = _blocks(spark, html)
    nav = got[0]
    prose = got[1]
    assert nav[0] == "Home About us page"
    assert nav[2] == len("Home") + len("About us page")
    assert nav[3] == nav[2] * 10000 // nav[1]
    assert prose[2] == len("link")
    assert prose[3] < 1500 < nav[3]


def test_invisible_content_removed(spark):
    html = (
        "<script>var x = 'twenty five chars of js';</script>"
        "<style>.c { content: 'styled text here' }</style>"
        "<noscript>enable javascript to see this page</noscript>"
        "<!-- comment with <p>fake tags</p> and words -->"
        "<p>Only this sentence should survive the extraction.</p>"
    )
    assert _main(spark, html) == "Only this sentence should survive the extraction."


def test_entities_decoded_and_whitespace_collapsed(spark):
    html = "<p>Fish &amp; chips &lt;here&gt;,\n\t priced &quot;fairly&quot; today.</p>"
    assert _main(spark, html) == 'Fish & chips <here>, priced "fairly" today.'


def test_self_closing_and_case_insensitive_tags_split(spark):
    html = (
        "<P>First sentence long enough to keep around.</P><BR/>"
        "<DIV>Second sentence long enough to keep around.</DIV>"
    )
    assert _main(spark, html) == (
        "First sentence long enough to keep around.\n"
        "Second sentence long enough to keep around."
    )


def test_bare_li_does_not_swallow_following_anchor(spark):
    """Regression: '<li>' must not consume the '<a ...>' after it (the
    attribute tail of the block regex has to require a leading space)."""
    html = "<ul><li><a href=/1>Item text</a></li></ul>"
    got = _blocks(spark, html)
    assert got == [("Item text", 9, 9, 10000)]


def test_min_chars_and_density_thresholds(spark):
    html = (
        "<p>Short.</p>"
        "<p><a href=/x>An all anchor block that is long enough</a></p>"
        "<p>A plain prose block that is long enough to keep.</p>"
    )
    assert _main(spark, html) == "A plain prose block that is long enough to keep."
    # loosen the density cap: the all-anchor block comes back
    loose = _main(spark, html, max_link_density_e4=10000)
    assert loose.startswith("An all anchor block")
    # raise the length floor: everything drops -> empty string
    assert _main(spark, html, min_chars=100) == ""


def test_null_and_tagless_inputs(spark):
    df = spark.createDataFrame([(None,), ("no tags at all",)], "html string")
    rows = df.select(extract_main_text(F.col("html")).alias("m")).collect()
    assert rows[0]["m"] is None
    # a tagless string is one block; kept iff it passes the length floor
    assert rows[1]["m"] == ""
    assert _main(spark, "a tagless run of plain text long enough") == (
        "a tagless run of plain text long enough"
    )


def test_anchor_crossing_block_boundary_splits_with_block(spark):
    """Block tags terminate anchor runs (jusText segmentation): the
    anchor chars land in the block where the <a> opened; text on both
    sides is preserved."""
    html = "<p>start of it <a href=/x>left<div>right side of anchor</div>rest</a></p>"
    texts = [t for t, *_ in _blocks(spark, html)]
    assert texts == ["start of it left", "right side of anchor", "rest"]
