"""Relational bridge tests: build_from_tables, split_levels, normalize,
denormalize (reference F4 fixtures: company/department/employee)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polars_nexpresso_spark import (
    HierarchicalPacker,
    HierarchySpec,
    HierarchyValidationError,
    LevelSpec,
    qcol,
)
from tests.conftest import assert_same_rows, canonical_rows

COMPANY_SPEC = HierarchySpec.from_levels(
    LevelSpec(name="company", id_fields=["id"]),
    LevelSpec(name="department", id_fields=["id"], parent_keys=["company_id"]),
    LevelSpec(name="employee", id_fields=["id"], parent_keys=["dept_id"]),
)


@pytest.fixture()
def company_tables(spark):
    company = spark.createDataFrame(
        [("c1", "Acme", 1990), ("c2", "Globex", 2005)],
        ["id", "name", "founded"],
    )
    department = spark.createDataFrame(
        [("d1", "Engineering", "c1"), ("d2", "Sales", "c1"), ("d3", "Ops", "c2")],
        ["id", "name", "company_id"],
    )
    employee = spark.createDataFrame(
        [
            ("e1", "Alice", 100, "d1"),
            ("e2", "Bob", 90, "d1"),
            ("e3", "Cara", 80, "d2"),
            ("e4", "Dan", 70, "d3"),
        ],
        ["id", "name", "salary", "dept_id"],
    )
    return {"company": company, "department": department, "employee": employee}


def test_build_from_tables_roundtrip(company_tables):
    packer = HierarchicalPacker(COMPANY_SPEC)
    packed = packer.build_from_tables(company_tables, target_level="company")
    assert packed.columns == ["company"]
    assert packed.count() == 2

    flat = packer.unpack(packed, "employee")
    # every employee row present with its full ancestry
    rows = {
        (r["company.id"], r["company.department.id"], r["company.department.employee.id"])
        for r in flat.collect()
    }
    assert rows == {
        ("c1", "d1", "e1"),
        ("c1", "d1", "e2"),
        ("c1", "d2", "e3"),
        ("c2", "d3", "e4"),
    }


def test_build_from_tables_left_keeps_childless_parents(spark, company_tables):
    packer = HierarchicalPacker(COMPANY_SPEC)
    extra_dept = spark.createDataFrame(
        [("d1", "Engineering", "c1"), ("d4", "Empty", "c2")],
        ["id", "name", "company_id"],
    )
    tables = {**company_tables, "department": extra_dept}
    packed = packer.build_from_tables(tables, target_level="company")
    assert packed.count() == 2  # childless dept d4 kept with null employees

    inner = packer.build_from_tables(tables, target_level="company", join_type="inner")
    flat = packer.unpack(inner, "department")
    ids = sorted(r["company.department.id"] for r in flat.collect())
    assert ids == ["d1"]  # d4 has no employees → dropped by inner join


def test_build_from_tables_missing_table_raises(company_tables):
    # Tables are required only for levels down to target_level (matching the
    # reference :1493-1502): packing to "employee" needs all three.
    packer = HierarchicalPacker(COMPANY_SPEC)
    tables = {k: v for k, v in company_tables.items() if k != "department"}
    with pytest.raises(HierarchyValidationError):
        packer.build_from_tables(tables, target_level="employee")


def test_split_levels_and_normalize(spark):
    spec = HierarchySpec(
        levels=[
            LevelSpec(name="country", id_fields=["code"]),
            LevelSpec(name="city", id_fields=["id"]),
        ]
    )
    packer = HierarchicalPacker(spec)
    rows = [
        ("US", "United States", "NYC", 8),
        ("US", "United States", "LA", 4),
        ("CA", "Canada", "TOR", 3),
    ]
    df = spark.createDataFrame(
        rows, ["country.code", "country.name", "country.city.id", "country.city.pop"]
    )
    tables = packer.normalize(df)
    assert set(tables.keys()) == {"country", "city"}

    country_rows = {
        (r["country.code"], r["country.name"]) for r in tables["country"].collect()
    }
    assert country_rows == {("US", "United States"), ("CA", "Canada")}

    city_rows = {
        (r["country.code"], r["country.city.id"], r["country.city.pop"])
        for r in tables["city"].collect()
    }
    assert city_rows == {("US", "NYC", 8), ("US", "LA", 4), ("CA", "TOR", 3)}


def test_normalize_denormalize_roundtrip(spark):
    spec = HierarchySpec(
        levels=[
            LevelSpec(name="country", id_fields=["code"]),
            LevelSpec(name="city", id_fields=["id"]),
        ]
    )
    packer = HierarchicalPacker(spec)
    rows = [
        ("US", "United States", "NYC", 8),
        ("US", "United States", "LA", 4),
        ("CA", "Canada", "TOR", 3),
    ]
    df = spark.createDataFrame(
        rows, ["country.code", "country.name", "country.city.id", "country.city.pop"]
    )
    # denormalize to the root keeps the root flat with nested children —
    # exactly what pack-to-the-immediate-child produces (the reference
    # compares denormalize(target=L) against pack(df, L): tests
    # test_hierarchical_packer.py:173-178).
    expected = packer.pack(df, "city")
    tables = packer.normalize(df)
    rebuilt = packer.denormalize(tables)
    assert_same_rows(expected, rebuilt)


def test_denormalize_missing_root_raises(spark):
    spec = HierarchySpec(
        levels=[
            LevelSpec(name="country", id_fields=["code"]),
            LevelSpec(name="city", id_fields=["id"]),
        ]
    )
    packer = HierarchicalPacker(spec)
    city = spark.createDataFrame([("US", "NYC")], ["country.code", "country.city.id"])
    with pytest.raises(HierarchyValidationError):
        packer.denormalize({"city": city})
    with pytest.raises(HierarchyValidationError):
        packer.denormalize({})


def test_prepare_level_table_mapping(spark):
    packer = HierarchicalPacker(COMPANY_SPEC)
    raw = spark.createDataFrame([("d1", "Eng", "c1")], ["dept_code", "label", "company_id"])
    prepared = packer.prepare_level_table(
        "department", raw, column_mapping={"dept_code": "id", "label": "name"}
    )
    assert sorted(prepared.columns) == [
        "company.department.company_id",
        "company.department.id",
        "company.department.name",
    ]


def test_null_children_survive_roundtrip(spark):
    """Parents whose child columns are all null (e.g. from a left join) keep a
    null-fields child struct through pack → unpack (reference F6 null-child
    fixture; SURVEY §7.3 item 3)."""
    spec = HierarchySpec(
        levels=[
            LevelSpec(name="parent", id_fields=["id"]),
            LevelSpec(name="child", id_fields=["id"]),
        ]
    )
    packer = HierarchicalPacker(spec)
    rows = [
        ("p1", "c1", 1.0),
        ("p2", None, None),  # null child
        ("p3", "c3", 3.0),
    ]
    df = spark.createDataFrame(rows, ["parent.id", "parent.child.id", "parent.child.v"])
    packed = packer.pack(df, "child")
    assert packed.count() == 3
    unpacked = packer.unpack(packed, "child")
    assert_same_rows(unpacked, df)


def test_empty_frame_pack_schema(spark):
    """Packing a 0-row frame yields 0 rows with the correct nested schema."""
    spec = HierarchySpec(
        levels=[
            LevelSpec(name="parent", id_fields=["id"]),
            LevelSpec(name="child", id_fields=["id"]),
        ]
    )
    packer = HierarchicalPacker(spec)
    df = spark.createDataFrame([], "`parent.id` string, `parent.child.id` string")
    packed = packer.pack(df, "child")
    assert packed.count() == 0
    assert "parent.child" in packed.columns
    dtype = {f.name: f.dataType.simpleString() for f in packed.schema.fields}
    assert dtype["parent.child"] == "array<struct<id:string>>"
    unpacked = packer.unpack(packed, "child")
    assert sorted(unpacked.columns) == ["parent.child.id", "parent.id"]
