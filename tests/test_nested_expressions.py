"""Nested expression builder tests — ported from the reference
``tests/test_nested_helper.py``: select/create/edit fields, lists of structs,
deep nesting, both struct modes, error paths."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import Row

from polars_nexpresso_spark import (
    NestedExpressionBuilder,
    apply_nested_operations,
    generate_nested_exprs,
    struct_fn,
)


@pytest.fixture()
def simple_nested_df(spark):
    return spark.createDataFrame(
        [
            Row(id=1, data=Row(name="a", value=10)),
            Row(id=2, data=Row(name="b", value=20)),
        ]
    )


@pytest.fixture()
def list_of_structs_df(spark):
    return spark.createDataFrame(
        [
            Row(id=1, items=[Row(name="x", qty=2), Row(name="y", qty=3)]),
            Row(id=2, items=[Row(name="z", qty=5)]),
        ]
    )


@pytest.fixture()
def deep_df(spark):
    return spark.createDataFrame(
        [
            Row(a=1, b=4, c=Row(x=10, y=[Row(z=11), Row(z=12)])),
            Row(a=2, b=5, c=Row(x=12, y=[Row(z=13), Row(z=14)])),
        ]
    )


def test_select_as_is(simple_nested_df):
    result = apply_nested_operations(simple_nested_df, {"id": None, "data": None})
    assert result.columns == ["id", "data"]
    assert result.count() == 2


def test_top_level_callable(simple_nested_df):
    result = apply_nested_operations(simple_nested_df, {"id": lambda x: x * 2})
    assert sorted(r["id"] for r in result.collect()) == [2, 4]


def test_create_new_column_with_expr(simple_nested_df):
    result = apply_nested_operations(
        simple_nested_df, {"id": None, "created": F.lit(42)}
    )
    assert all(r["created"] == 42 for r in result.collect())


def test_create_column_without_expr_raises(simple_nested_df):
    with pytest.raises(ValueError, match="not found in schema"):
        apply_nested_operations(simple_nested_df, {"missing": None})


def test_invalid_struct_mode_raises(simple_nested_df):
    with pytest.raises(ValueError, match="Invalid struct_mode"):
        NestedExpressionBuilder(simple_nested_df.schema, "bogus")


def test_struct_select_mode(simple_nested_df):
    result = apply_nested_operations(
        simple_nested_df,
        {"id": None, "data": {"value": lambda v: v + 1}},
        struct_mode="select",
    )
    rows = {r["id"]: r["data"].asDict() for r in result.collect()}
    assert rows == {1: {"value": 11}, 2: {"value": 21}}  # name dropped


def test_struct_with_fields_mode(simple_nested_df):
    result = apply_nested_operations(
        simple_nested_df,
        {"id": None, "data": {"value": lambda v: v + 1}},
        struct_mode="with_fields",
    )
    rows = {r["id"]: r["data"].asDict() for r in result.collect()}
    assert rows == {1: {"name": "a", "value": 11}, 2: {"name": "b", "value": 21}}


def test_struct_new_field_from_lit(simple_nested_df):
    result = apply_nested_operations(
        simple_nested_df,
        {"data": {"flag": F.lit(True)}},
        struct_mode="with_fields",
    )
    assert all(r["data"]["flag"] is True for r in result.collect())


def test_struct_fn_references_original_siblings(simple_nested_df):
    result = apply_nested_operations(
        simple_nested_df,
        {"data": {"double_value": struct_fn(lambda s: s["value"] * 2)}},
        struct_mode="with_fields",
    )
    rows = {r["data"]["value"]: r["data"]["double_value"] for r in result.collect()}
    assert rows == {10: 20, 20: 40}


def test_list_of_structs_transform(list_of_structs_df):
    result = apply_nested_operations(
        list_of_structs_df,
        {"id": None, "items": {"qty": lambda q: q * 10}},
        struct_mode="with_fields",
    )
    rows = {r["id"]: [i["qty"] for i in r["items"]] for r in result.collect()}
    assert rows == {1: [20, 30], 2: [50]}


def test_deep_nesting(deep_df):
    result = apply_nested_operations(
        deep_df,
        {
            "a": None,
            "c": {"y": {"z": lambda z: z + 100}},
        },
        struct_mode="with_fields",
    )
    rows = {r["a"]: [e["z"] for e in r["c"]["y"]] for r in result.collect()}
    assert rows == {1: [111, 112], 2: [113, 114]}


def test_callable_on_missing_field_raises(simple_nested_df):
    with pytest.raises(ValueError, match="non-existent field"):
        apply_nested_operations(
            simple_nested_df, {"data": {"nope": lambda x: x}}, struct_mode="with_fields"
        )


def test_dict_on_missing_field_raises(simple_nested_df):
    with pytest.raises(ValueError, match="non-existent struct field"):
        apply_nested_operations(
            simple_nested_df, {"data": {"nope": {"x": None}}}, struct_mode="with_fields"
        )


def test_recurse_into_scalar_raises(simple_nested_df):
    with pytest.raises(ValueError, match="Cannot recurse"):
        apply_nested_operations(simple_nested_df, {"id": {"x": None}})


def test_empty_dict_select_mode_raises(simple_nested_df):
    with pytest.raises(ValueError, match="Empty field specification"):
        apply_nested_operations(simple_nested_df, {"data": {}}, struct_mode="select")


def test_empty_dict_with_fields_keeps_struct(simple_nested_df):
    result = apply_nested_operations(
        simple_nested_df, {"data": {}}, struct_mode="with_fields"
    )
    rows = {r["data"]["name"]: r["data"]["value"] for r in result.collect()}
    assert rows == {"a": 10, "b": 20}


def test_invalid_spec_type_raises(simple_nested_df):
    with pytest.raises(TypeError):
        apply_nested_operations(simple_nested_df, {"id": 123})


def test_generate_exprs_accepts_dataframe(simple_nested_df):
    exprs = generate_nested_exprs({"id": None}, simple_nested_df)
    assert len(exprs) == 1


def test_use_with_columns(simple_nested_df):
    result = apply_nested_operations(
        simple_nested_df,
        {"id": lambda x: x * 2},
        use_with_columns=True,
    )
    assert result.columns == ["id", "data"]
    assert sorted(r["id"] for r in result.collect()) == [2, 4]


def test_select_mode_keeps_spec_order(deep_df):
    result = apply_nested_operations(
        deep_df,
        {"c": {"y": None, "x": None}},
        struct_mode="select",
    )
    fields = [f.name for f in result.schema["c"].dataType.fields]
    assert fields == ["y", "x"]
