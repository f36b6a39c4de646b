"""Edge-case fixtures from the reference suite (FIXTURES.md §F6): name
collisions across levels, array attributes that are not child levels,
single-row and single-level frames.

Reference provenance: tests/test_complex_hierarchies.py:384-393 (name
collisions), :422-429 (list attribute), :493-571 (tiny/wide frames).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polars_nexpresso_spark import (
    HierarchicalPacker,
    HierarchySpec,
    LevelSpec,
    qcol,
)
from tests.conftest import assert_same_rows

COMPANY_SPEC = HierarchySpec.from_levels(
    LevelSpec(name="company", id_fields=["id"]),
    LevelSpec(name="department", id_fields=["id"]),
    LevelSpec(name="employee", id_fields=["id"]),
)


def test_name_collision_across_levels(spark):
    """A ``name`` field at every level simultaneously: the path-qualified
    flat names keep them distinct and the roundtrip preserves each."""
    df = spark.createDataFrame(
        [
            ("c1", "Acme", "d1", "Eng", "e1", "Alice"),
            ("c1", "Acme", "d1", "Eng", "e2", "Bob"),
            ("c1", "Acme", "d2", "Sales", "e3", "Cara"),
        ],
        [
            "company.id",
            "company.name",
            "company.department.id",
            "company.department.name",
            "company.department.employee.id",
            "company.department.employee.name",
        ],
    )
    packer = HierarchicalPacker(COMPANY_SPEC)
    packed = packer.pack(df, "department")
    row = packed.filter(qcol("company.department").isNotNull()).first()
    dept_names = {d["name"] for d in row["company.department"]}
    assert dept_names <= {"Eng", "Sales"}
    assert_same_rows(packer.unpack(packed, "employee"), df)


def test_array_attribute_is_not_a_child_level(spark):
    """An array<string> column at a level is an ATTRIBUTE (packed inside the
    level struct / recovered first-ignorenulls), never mistaken for a child
    list to explode."""
    df = spark.createDataFrame(
        [
            ("o1", ["vip", "eu"], "i1", 2),
            ("o1", ["vip", "eu"], "i2", 1),
            ("o2", [], "i3", 5),
        ],
        ["order.id", "order.customer_tags", "order.item.id", "order.item.qty"],
    )
    spec = HierarchySpec.from_levels(
        LevelSpec(name="order", id_fields=["id"]),
        LevelSpec(name="item", id_fields=["id"]),
    )
    packer = HierarchicalPacker(spec)
    packed = packer.pack(df, "item")
    # one row per order; tags stay a plain array column at the order level
    assert packed.count() == 2
    got = {
        r["order.id"]: (list(r["order.customer_tags"]), len(r["order.item"]))
        for r in packed.collect()
    }
    assert got == {"o1": (["vip", "eu"], 2), "o2": ([], 1)}
    assert_same_rows(packer.unpack(packed, "item"), df)


def test_single_row_roundtrip(spark):
    df = spark.createDataFrame(
        [("c1", "d1", "e1")],
        ["company.id", "company.department.id", "company.department.employee.id"],
    )
    packer = HierarchicalPacker(COMPANY_SPEC)
    for level in ("company", "department", "employee"):
        packed = packer.pack(df, level)
        assert packed.count() == 1
        assert_same_rows(packer.unpack(packed, "employee"), df)


def test_single_level_hierarchy(spark):
    """A one-level spec: pack collapses to the root struct; unpack restores
    the flat frame. Degenerate but must not error."""
    spec = HierarchySpec.from_levels(LevelSpec(name="doc", id_fields=["id"]))
    packer = HierarchicalPacker(spec)
    df = spark.createDataFrame(
        [(1, "hello"), (2, "world")], ["doc.id", "doc.text"]
    )
    packed = packer.pack(df, "doc")
    assert packed.columns == ["doc"]
    assert packed.count() == 2
    assert_same_rows(packer.unpack(packed, "doc"), df)


def test_wide_level_roundtrip(spark):
    """20 attribute columns per level (FIXTURES.md F6 wide frame): spec
    compilation and pack/unpack stay correct as width grows."""
    cols = {"company.id": ["c1", "c1", "c2"]}
    for i in range(20):
        cols[f"company.attr_{i}"] = [i, i, i + 100]
    cols["company.department.id"] = ["d1", "d2", "d3"]
    for i in range(20):
        cols[f"company.department.attr_{i}"] = [i * 2, i * 3, i * 4]
    rows = list(zip(*cols.values()))
    df = spark.createDataFrame(rows, schema=list(cols.keys()))

    spec = HierarchySpec.from_levels(
        LevelSpec(name="company", id_fields=["id"]),
        LevelSpec(name="department", id_fields=["id"]),
    )
    packer = HierarchicalPacker(spec)
    packed = packer.pack(df, "department")
    assert packed.count() == 2
    dept_struct = dict(packed.dtypes)["company.department"]
    assert dept_struct.count("attr_") == 20
    assert_same_rows(packer.unpack(packed, "department"), df)


def test_streaming_variants_disk_to_disk_roundtrip(spark, tmp_path):
    """pack_streaming(defer=False) checkpoints through parquet and
    unpack_streaming(sink_path=...) re-scans its sink: both disk modes
    reproduce the in-memory result exactly, including from a path source.

    Child order is pinned with ``order_by``: a parquet DIRECTORY has no
    defined row order (equal-size files pack into scan partitions in
    nondeterministic order), so best-effort input order cannot be asserted
    across a disk roundtrip — only the contractual ordering can."""
    df = spark.createDataFrame(
        [("c1", "d1"), ("c1", "d2"), ("c2", "d3")],
        ["company.id", "company.department.id"],
    )
    spec = HierarchySpec.from_levels(
        LevelSpec(name="company", id_fields=["id"]),
        LevelSpec(
            name="department",
            id_fields=["id"],
            order_by=["company.department.id"],
        ),
    )
    packer = HierarchicalPacker(spec)
    expected_packed = packer.pack(df, "department")

    src = str(tmp_path / "flat.parquet")
    df.write.parquet(src)
    packed = packer.pack_streaming(
        src, "department", partitions=2, tmp_dir=str(tmp_path / "ckpt"),
        defer=False, spark=spark,
    )
    assert_same_rows(packed, expected_packed)

    sink = str(tmp_path / "unpacked.parquet")
    restored = packer.unpack_streaming(packed, "department", sink_path=sink)
    assert_same_rows(restored, df)
    # the sink really was written and re-scanned
    assert spark.read.parquet(sink).count() == 3


def test_pack_streaming_missing_root_keys_is_a_clear_error(spark):
    """Absent root key columns raise HierarchyValidationError naming them,
    not an AnalysisException from repartitioning on nonexistent columns;
    alias-only inputs resolve through key_aliases first and succeed."""
    from polars_nexpresso_spark.plans.spec import HierarchyValidationError

    spec = HierarchySpec.from_levels(
        LevelSpec(name="company", id_fields=["id"]),
        LevelSpec(name="department", id_fields=["id"]),
        key_aliases={"company.id": "corp_id"},
    )
    packer = HierarchicalPacker(spec)

    aliased = spark.createDataFrame(
        [("c1", "d1"), ("c1", "d2")], ["corp_id", "company.department.id"]
    )
    assert packer.pack_streaming(aliased, "department", partitions=2).count() == 1

    bogus = spark.createDataFrame(
        [("d1",), ("d2",)], ["company.department.id"]
    )
    with pytest.raises(HierarchyValidationError, match="company.*id"):
        packer.pack_streaming(bogus, "department", partitions=2)


def test_operators_invariant_under_aqe_toggle(spark):
    """Results must not depend on adaptive execution being on (the
    default) or off — catches accidental reliance on AQE-only rewrites
    in the join/window operators added this round."""
    from pyspark.sql import functions as F

    from polars_nexpresso_spark.functions.sampling import top_k_per_group
    from polars_nexpresso_spark.operators.asof import asof_join
    from polars_nexpresso_spark.operators.fuzzyjoin import fuzzy_join
    from polars_nexpresso_spark.operators.rangejoin import interval_join

    left = spark.createDataFrame(
        [(i, "k", i * 3 % 40) for i in range(30)], ["pid", "key", "t"]
    )
    right = spark.createDataFrame(
        [("k", f"iv{i}", i * 5, i * 5 + 7) for i in range(8)],
        ["key", "iv", "s", "e"],
    )
    words = spark.createDataFrame(
        [(i, w) for i, w in enumerate(["abc", "abd", "xbd", "zzz"])],
        ["wid", "w"],
    )
    words2 = (
        words.withColumnRenamed("wid", "wid2").withColumnRenamed("w", "w2")
    )

    def run_all():
        return (
            {(r["pid"], r["iv"]) for r in interval_join(
                left, right, on=["key"], point="t", start="s", end="e",
                bucket_width=6,
            ).collect()},
            {(r["pid"], r["iv"]) for r in asof_join(
                left, right.select("key", F.col("s").alias("rt"), "iv"),
                on=["key"], left_time="t", right_time="rt",
                payload_cols=["iv"], skew_time_bucket=10,
            ).collect()},
            {(r["wid"], r["wid2"]) for r in fuzzy_join(
                words, words2, left_on="w", right_on="w2", max_distance=1,
            ).collect()},
            {(r["pid"], r["rank"]) for r in top_k_per_group(
                left, ["key"], [F.col("t").desc(), "pid"], k=4, skew_salt=4,
            ).collect()},
        )

    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    with_aqe = run_all()
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        without_aqe = run_all()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert with_aqe == without_aqe
