"""Corpus-preparation operators added in round 7 session 2:
token-boundary truncation (and, below as they land, the epoch planner /
upsampler and reference-corpus dedup)."""

from __future__ import annotations

import pytest

from polars_nexpresso_spark.functions.text import truncate_tokens


def test_truncate_tokens_caps_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c d e f"),
            (2, "one two"),
            (3, "Case Kept UPPER low"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r
        for r in truncate_tokens(df, "text", 3).collect()
    }
    assert out[1]["text"] == "a b c"
    assert out[1]["n_tokens"] == 6 and out[1]["was_truncated"] is True
    assert out[2]["text"] == "one two"
    assert out[2]["n_tokens"] == 2 and out[2]["was_truncated"] is False
    # case preserved (truncation is NOT normalization)
    assert out[3]["text"] == "Case Kept UPPER"


def test_truncate_tokens_whitespace_and_null_contract(spark):
    df = spark.createDataFrame(
        [
            (1, "  a\t\tb \n c  "),
            (2, None),
            (3, ""),
            (4, "   \n\t  "),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r
        for r in truncate_tokens(df, "text", 10).collect()
    }
    # runs collapse, edge whitespace never makes empty tokens
    assert out[1]["text"] == "a b c" and out[1]["n_tokens"] == 3
    assert out[2]["text"] is None
    assert out[2]["n_tokens"] == 0 and out[2]["was_truncated"] is False
    assert out[3]["text"] == "" and out[3]["n_tokens"] == 0
    assert out[4]["text"] == "" and out[4]["n_tokens"] == 0


def test_truncate_tokens_out_col_and_validation(spark):
    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    row = truncate_tokens(df, "text", 2, out_col="short").collect()[0]
    assert row["text"] == "a b c" and row["short"] == "a b"
    with pytest.raises(ValueError, match="not in DataFrame"):
        truncate_tokens(df, "body", 2)
    with pytest.raises(ValueError, match="max_tokens"):
        truncate_tokens(df, "text", 0)


def test_truncate_tokens_plan_has_no_exchange(spark):
    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    plan = (
        truncate_tokens(df, "text", 2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "BatchEvalPython" not in plan
