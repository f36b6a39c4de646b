"""Structuring utility tests (reference ``tests/test_structuring_utils.py``)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from polars_nexpresso_spark import convert_spark_schema, unnest_all, unnest_rename


@pytest.fixture()
def nested_df(spark):
    return spark.createDataFrame(
        [
            Row(id=1, meta=Row(source="web", detail=Row(code="A", score=0.5)), tags=["x"]),
            Row(id=2, meta=Row(source="api", detail=Row(code="B", score=0.7)), tags=[]),
        ]
    )


def test_unnest_rename_single(nested_df):
    result = unnest_rename(nested_df, "meta")
    assert "meta.source" in result.columns
    assert "meta.detail" in result.columns
    assert "meta" not in result.columns


def test_unnest_rename_non_struct_raises(nested_df):
    with pytest.raises(ValueError):
        unnest_rename(nested_df, "id")


def test_unnest_all_recursive(nested_df):
    result = unnest_all(nested_df)
    assert sorted(result.columns) == [
        "id",
        "meta.detail.code",
        "meta.detail.score",
        "meta.source",
        "tags",
    ]
    rows = {r["id"]: r["meta.detail.code"] for r in result.collect()}
    assert rows == {1: "A", 2: "B"}


def test_unnest_all_custom_separator(nested_df):
    result = unnest_all(nested_df, separator="_")
    assert "meta_detail_code" in result.columns


def test_unnest_all_preserves_nulls(spark):
    df = spark.createDataFrame(
        [Row(id=1, s=Row(a=1)), Row(id=2, s=None)]
    )
    result = unnest_all(df)
    rows = {r["id"]: r["s.a"] for r in result.collect()}
    assert rows == {1: 1, 2: None}


def test_convert_spark_schema(nested_df):
    converted = convert_spark_schema(nested_df.schema)
    assert converted["id"] == "bigint"
    assert converted["meta"]["source"] == "string"
    assert converted["meta"]["detail"]["score"] == "double"
    assert converted["tags"] == ["string"]


def test_validate_array_widths_pass_and_fail(spark):
    from polars_nexpresso_spark.structuring import validate_array_widths

    df = spark.createDataFrame(
        [
            (1, [1.0, 2.0, 3.0], [1, 2]),
            (2, [4.0, 5.0, 6.0], None),  # NULL array is not a violation
            (3, [7.0, 8.0], [3, 4, 5]),  # emb too short, ids too long
        ],
        "id long, emb array<double>, ids array<int>",
    )
    counts = validate_array_widths(
        df, {"emb": 3, "ids": 2}, raise_on_violation=False
    )
    assert counts == {"emb": 1, "ids": 1}

    ok = df.filter("id < 3")
    assert validate_array_widths(ok, {"emb": 3}) == {"emb": 0}

    import pytest as _pytest

    with _pytest.raises(ValueError, match="violations"):
        validate_array_widths(df, {"emb": 3})
    with _pytest.raises(ValueError, match="not in frame"):
        validate_array_widths(df, {"nope": 3})
    with _pytest.raises(ValueError, match="not arrays"):
        validate_array_widths(df, {"id": 3})
