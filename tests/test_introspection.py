"""Introspection, discovery, and schema validation tests (reference
``tests/test_hierarchical_packer.py:1311-1833``)."""

from __future__ import annotations

import pytest

from polars_nexpresso_spark import HierarchicalPacker, HierarchySpec, LevelSpec

SPEC = HierarchySpec(
    levels=[
        LevelSpec(name="country", id_fields=["code"]),
        LevelSpec(name="city", id_fields=["id"]),
        LevelSpec(name="street", id_fields=["name"]),
    ]
)


@pytest.fixture()
def packer():
    return HierarchicalPacker(SPEC)


@pytest.fixture()
def flat_df(spark):
    rows = [("US", "NYC", 8, "Broadway", 21.0)]
    return spark.createDataFrame(
        rows,
        [
            "country.code",
            "country.city.id",
            "country.city.population",
            "country.city.street.name",
            "country.city.street.length_km",
        ],
    )


def test_level_navigation(packer):
    assert packer.level_names == ["country", "city", "street"]
    assert packer.root_level == "country"
    assert packer.leaf_level == "street"
    assert packer.get_ancestor_levels("street") == ["country", "city"]
    assert packer.get_ancestor_levels("country") == []
    assert packer.get_descendant_levels("country") == ["city", "street"]
    assert packer.get_descendant_levels("street") == []


def test_get_level_keys(packer):
    assert packer.get_level_keys("city") == ["id"]
    assert packer.get_level_keys("city", form="long") == ["country.city.id"]
    assert packer.get_level_keys("city", include_ancestors=True) == [
        "country.code",
        "country.city.id",
    ]


def test_get_level_fields_flat_and_packed(packer, flat_df):
    assert sorted(packer.get_level_fields("city", flat_df)) == ["id", "population"]
    assert packer.get_level_fields("city", flat_df, form="long") == [
        "country.city.id",
        "country.city.population",
    ]
    packed = packer.pack(flat_df, "city")
    assert sorted(packer.get_level_fields("city", packed)) == ["id", "population"]


def test_infer_current_level(packer, flat_df):
    assert packer.infer_current_level(flat_df) == "street"
    assert packer.infer_current_level(packer.pack(flat_df, "street")) == "city"
    assert packer.infer_current_level(packer.pack(flat_df, "city")) == "country"
    assert packer.infer_current_level(packer.pack(flat_df, "country")) == "country"


def test_infer_unrecognisable_raises(packer, spark):
    df = spark.createDataFrame([(1,)], ["unrelated"])
    with pytest.raises(ValueError):
        packer.infer_current_level(df)


def test_get_level_schema(packer, flat_df):
    schema = packer.get_level_schema("city", flat_df)
    assert set(schema.keys()) == {"id", "population"}
    assert schema["id"].simpleString() == "string"


def test_describe(packer):
    text = packer.describe()
    assert "country" in text and "street" in text and "(root)" in text and "(leaf)" in text


def test_discover_levels_flat(flat_df):
    levels = HierarchicalPacker.discover_levels(flat_df)
    by_name = {lvl.name: lvl for lvl in levels}
    assert set(by_name) == {"country", "city", "street"}
    assert by_name["street"].depth == 2
    assert by_name["street"].parent == "city"
    assert by_name["street"].fields == ("length_km", "name")
    assert not by_name["street"].is_packed


def test_discover_levels_packed(packer, flat_df):
    packed = packer.pack(flat_df, "city")
    levels = HierarchicalPacker.discover_levels(packed)
    by_name = {lvl.name: lvl for lvl in levels}
    assert by_name["city"].is_packed
    assert by_name["street"].is_packed


def test_validate_schema_ok(packer, flat_df):
    result = packer.validate_schema(flat_df)
    assert result.is_compatible
    assert result.inferred_level == "street"
    assert result.present_levels == ["country", "city", "street"]


def test_validate_schema_wrong_expected_level(packer, flat_df):
    result = packer.validate_schema(flat_df, expected_level="city")
    assert not result.is_compatible


def test_validate_schema_incompatible(packer, spark):
    df = spark.createDataFrame([(1,)], ["unrelated"])
    result = packer.validate_schema(df)
    assert not result.is_compatible
    assert result.missing_levels == ["country", "city", "street"]


def test_get_level_columns(packer):
    assert packer.get_level_columns("city") == ["country.city.id"]


def test_escaped_separator_roundtrip(spark):
    """Field names containing the separator survive pack/unpack (E12)."""
    spec = HierarchySpec(
        levels=[
            LevelSpec(name="p", id_fields=["id"]),
            LevelSpec(name="c", id_fields=["id"]),
        ]
    )
    packer = HierarchicalPacker(spec)
    df = spark.createDataFrame(
        [("p1", "c1", "v")], ["p.id", "p.c.id", "p.c.odd\\.name"]
    )
    packed = packer.pack(df, "c")
    fields = [f.name for f in packed.schema["p.c"].dataType.elementType.fields]
    assert "odd\\.name" in fields
    unpacked = packer.unpack(packed, "c")
    assert "p.c.odd\\.name" in unpacked.columns


def test_custom_separator(spark):
    spec = HierarchySpec(
        levels=[
            LevelSpec(name="p", id_fields=["id"]),
            LevelSpec(name="c", id_fields=["id"]),
        ]
    )
    packer = HierarchicalPacker(spec, granularity_separator="/")
    df = spark.createDataFrame([("p1", "c1")], ["p/id", "p/c/id"])
    packed = packer.pack(df, "c")
    assert "p/c" in packed.columns
    unpacked = packer.unpack(packed, "c")
    assert sorted(unpacked.columns) == ["p/c/id", "p/id"]
