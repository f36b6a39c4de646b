"""HTML/markup stripping: chain order, entity decode, whitespace squeeze,
NULL contract, and the zero-shuffle plan pin."""

from __future__ import annotations

import pytest

from polars_nexpresso_spark.functions.markup import strip_markup


def test_strip_markup_full_document(spark):
    html = (
        "<html><head><title>T</title>"
        "<style>p { color: red }</style>"
        "<script>var x = '<p>not text</p>';</script></head>"
        "<body><!-- nav below --><h1>Big Title</h1>"
        "<p>first &amp; second</p>"
        "<p>third<br>fourth</p>"
        "<div>a &lt;tag&gt; quoted &quot;q&quot; nb&nbsp;sp</div>"
        "</body></html>"
    )
    df = spark.createDataFrame([(1, html)], ["doc_id", "text"])
    row = strip_markup(df, "text").collect()[0]
    assert row["had_markup"] is True
    # script/style/comment bodies gone entirely; block closers became
    # newlines; remaining tags became spaces and squeezed away.
    assert row["text"] == (
        "T Big Title\nfirst & second\nthird\nfourth\n"
        'a <tag> quoted "q" nb sp'
    )


def test_strip_markup_entity_single_pass(spark):
    # "&amp;lt;" decodes to the literal text "&lt;" (single pass —
    # &amp; is decoded LAST and never re-scanned).
    df = spark.createDataFrame([(1, "x &amp;lt; y")], ["doc_id", "text"])
    assert strip_markup(df, "text").collect()[0]["text"] == "x &lt; y"


def test_strip_markup_keeps_prose_inequalities(spark):
    # Math in prose is not markup: the tag pattern requires a letter (or
    # '!') right after '<'.
    df = spark.createDataFrame(
        [(1, "if a < b and b <3 then a < 3")], ["doc_id", "text"]
    )
    row = strip_markup(df, "text").collect()[0]
    assert row["text"] == "if a < b and b <3 then a < 3"
    assert row["had_markup"] is False


def test_strip_markup_null_and_plain(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "already clean prose")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in strip_markup(df, "text").collect()}
    assert out[1]["text"] is None and out[1]["had_markup"] is False
    assert out[2]["text"] == "already clean prose"
    assert out[2]["had_markup"] is False


def test_strip_markup_whitespace_squeeze(spark):
    df = spark.createDataFrame(
        [(1, "a  \t b</p>\n\n\n\n<p>c   d")], ["doc_id", "text"]
    )
    row = strip_markup(df, "text").collect()[0]
    assert row["text"] == "a b\n\nc d"


def test_strip_markup_out_col_preserves_original(spark):
    df = spark.createDataFrame([(1, "<b>hi</b>")], ["doc_id", "text"])
    row = strip_markup(df, "text", out_col="clean").collect()[0]
    assert row["text"] == "<b>hi</b>" and row["clean"] == "hi"


def test_strip_markup_validates_column(spark):
    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="not in DataFrame"):
        strip_markup(df, "body")


def test_strip_markup_plan_has_no_exchange(spark):
    df = spark.createDataFrame([(1, "<b>x</b>")], ["doc_id", "text"])
    plan = (
        strip_markup(df, "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "BatchEvalPython" not in plan
