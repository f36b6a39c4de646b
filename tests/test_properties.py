"""Property-based tests (hypothesis) for the engine-agnostic layers, plus
metamorphic pack invariants the reference's suite checks by hand
(``tests/test_streaming.py:60-147`` in the reference).

The escaping state machine (SURVEY §7.3 item 9) is the riskiest pure-Python
code: separators interact with user field names, configurable escape chars,
and Spark backtick quoting. Properties beat examples here.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from polars_nexpresso_spark import HierarchicalPacker, HierarchySpec, LevelSpec, qcol
from polars_nexpresso_spark.columns import (
    escape_field,
    join_path,
    split_path,
    unescape_field,
)
from tests.conftest import assert_same_rows, canonical_rows

# Separator/escape chars the packer accepts (any distinct pair); sample a
# hostile mix including regex metacharacters and multi-byte text.
_chars = st.sampled_from([".", "/", ":", "|", "\\", "~", "$", "^", "§"])
_names = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), min_size=0, max_size=12
)


@st.composite
def _sep_esc(draw):
    sep = draw(_chars)
    esc = draw(_chars.filter(lambda c: c != sep))
    return sep, esc


@given(name=_names, cfg=_sep_esc())
@settings(max_examples=300, deadline=None)
def test_escape_unescape_roundtrip(name, cfg):
    sep, esc = cfg
    escaped = escape_field(name, sep, esc)
    assert unescape_field(escaped, sep, esc) == name
    # Escaped form never contains an unescaped separator: splitting yields
    # exactly one component equal to the original name.
    assert split_path(escaped, sep, esc) == [name] or name == ""


@given(
    components=st.lists(_names.filter(lambda s: s != ""), min_size=1, max_size=5),
    cfg=_sep_esc(),
)
@settings(max_examples=300, deadline=None)
def test_join_split_roundtrip(components, cfg):
    sep, esc = cfg
    assert split_path(join_path(components, sep, esc), sep, esc) == components


@given(path=_names, cfg=_sep_esc())
@settings(max_examples=300, deadline=None)
def test_split_join_idempotent(path, cfg):
    """join(split(p)) re-splits to the same components (split is a
    left-inverse of join on split's own output)."""
    sep, esc = cfg
    parts = split_path(path, sep, esc)
    assert split_path(join_path(parts, sep, esc), sep, esc) == parts


# ---------------------------------------------------------------------------
# Metamorphic pack invariants (SparkSession-backed, example-scale)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def shuffle_fixture(spark):
    rows = [
        (g, f"name{g}", i, float(i * 10))
        for g in range(6)
        for i in range(g * 4, g * 4 + 3)
    ]
    df = spark.createDataFrame(
        rows, ["g.gid", "g.name", "g.item.iid", "g.item.val"]
    )
    spec = HierarchySpec.from_levels(
        LevelSpec(name="g", id_fields=["gid"]),
        LevelSpec(name="item", id_fields=["iid"], order_by=["g.item.iid"]),
    )
    return df, HierarchicalPacker(spec)


def test_pack_row_shuffle_invariant(shuffle_fixture):
    """Packing a row-shuffled input yields identical content when child
    order is pinned by order_by (reference tests/test_streaming.py:60-69)."""
    df, packer = shuffle_fixture
    shuffled = df.orderBy(F.rand(seed=7))
    assert canonical_rows(packer.pack(df, "g")) == canonical_rows(
        packer.pack(shuffled, "g")
    )


def test_pack_streaming_partition_sweep(shuffle_fixture):
    """pack_streaming ≡ pack for partitions ∈ {1, 4, 64} (reference
    tests/test_streaming.py:140-147)."""
    df, packer = shuffle_fixture
    baseline = packer.pack(df, "g")
    for parts in (1, 4, 64):
        assert_same_rows(
            packer.pack_streaming(df, "g", partitions=parts), baseline
        )


def test_pack_streaming_bounded_equivalence(shuffle_fixture, tmp_path):
    """bounded=True (K sequential per-bucket jobs, parquet append) is
    content-identical to the one-shot pack for partitions ∈ {1, 4}; 64
    buckets over a tiny frame also exercises the empty-bucket skip."""
    df, packer = shuffle_fixture
    baseline = packer.pack(df, "g")
    for parts in (1, 4, 64):
        got = packer.pack_streaming(
            df,
            "g",
            partitions=parts,
            bounded=True,
            tmp_dir=str(tmp_path / f"b{parts}"),
        )
        assert_same_rows(got, baseline)


def test_pack_skew_salt_equivalence(shuffle_fixture):
    """Two-phase salted pack is content-identical to the plain pack for
    salt ∈ {2, 8} (chunk merge re-sorts globally per group)."""
    df, packer = shuffle_fixture
    baseline = packer.pack(df, "g")
    for salt in (2, 8):
        assert_same_rows(packer.pack(df, "g", skew_salt=salt), baseline)


@st.composite
def _hierarchy_rows(draw):
    """Random 2-level data: per-group-uniform parent attrs (the pack
    contract), nullable unicode/float payloads, 1-4 children per group."""
    rows = []
    for g in range(draw(st.integers(1, 4))):
        gname = draw(st.one_of(st.none(), st.text(max_size=6)))
        for i in range(draw(st.integers(1, 4))):
            rows.append(
                (
                    g,
                    gname,
                    g * 10 + i,
                    draw(
                        st.one_of(
                            st.none(),
                            st.floats(allow_nan=False, allow_infinity=False, width=32),
                        )
                    ),
                    draw(st.one_of(st.none(), st.text(max_size=8))),
                )
            )
    return rows


@given(rows=_hierarchy_rows())
@settings(max_examples=10, deadline=None)
def test_pack_unpack_roundtrip_random(spark, rows):
    """unpack(pack(df)) ≡ df on randomized data with nulls and unicode
    (reference roundtrip property, tests/test_hierarchical_packer.py:84-90)."""
    df = spark.createDataFrame(
        rows,
        "`g.gid` long, `g.name` string, `g.item.iid` long, "
        "`g.item.val` double, `g.item.tag` string",
    )
    spec = HierarchySpec.from_levels(
        LevelSpec(name="g", id_fields=["gid"]),
        LevelSpec(name="item", id_fields=["iid"], order_by=["g.item.iid"]),
    )
    packer = HierarchicalPacker(spec)
    restored = packer.unpack(packer.pack(df, "g"), "item")
    assert canonical_rows(restored) == canonical_rows(df)


def test_computed_id_fields(spark):
    """Computed (aliased-expression) id columns materialize before packing
    and serve as group keys (reference hierarchical_packer.py:2550-2569)."""
    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "a", 2.0), (3, "b", 3.0)],
        ["g.item.iid", "g.tag", "g.item.val"],
    )
    spec = HierarchySpec.from_levels(
        LevelSpec(name="g", id_fields=[("g.gid", F.upper(qcol("g.tag")))]),
        LevelSpec(name="item", id_fields=["iid"], order_by=["g.item.iid"]),
    )
    packer = HierarchicalPacker(spec)
    packed = packer.pack(df, "item")
    rows = {r["g.gid"]: r for r in packed.collect()}
    assert set(rows) == {"A", "B"}
    assert [e["iid"] for e in rows["A"]["g.item"]] == [1, 2]
    assert [e["iid"] for e in rows["B"]["g.item"]] == [3]


@given(rows=_hierarchy_rows(), salt=st.sampled_from([None, 4]))
@settings(max_examples=8, deadline=None)
def test_parent_strategies_equivalent_random(spark, rows, salt):
    """aggregate ≡ split_join ≡ auto on randomized group-uniform data
    with a heavy array root attribute (the split_join trigger), with and
    without the skew salt — strategy is plan shape, never content."""
    df = spark.createDataFrame(
        rows,
        "`g.gid` long, `g.name` string, `g.item.iid` long, "
        "`g.item.val` double, `g.item.tag` string",
    ).withColumn(
        "g.payload", F.array_repeat(qcol("g.gid").cast("double"), 5)
    )
    spec = HierarchySpec.from_levels(
        LevelSpec(name="g", id_fields=["gid"]),
        LevelSpec(name="item", id_fields=["iid"], order_by=["g.item.iid"]),
    )
    packer = HierarchicalPacker(spec)
    base = canonical_rows(packer.pack(df, "g", skew_salt=salt))
    for strategy in ("split_join", "auto"):
        got = canonical_rows(
            packer.pack(df, "g", parent_strategy=strategy, skew_salt=salt)
        )
        assert got == base, strategy


@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "dd", "e f"]),
            min_size=0,
            max_size=6,
        ).map("\n".join),
        min_size=1,
        max_size=8,
    ),
    min_docs=st.integers(min_value=1, max_value=4),
)
@settings(max_examples=10, deadline=None)
def test_boilerplate_and_intradoc_match_python_reference(
    spark, texts, min_docs
):
    """Both line operators must agree with a direct Python re-derivation
    on randomized corpora (order preservation, counts, empty docs)."""
    from polars_nexpresso_spark.functions.dedup import (
        dedup_lines_within_doc,
        remove_boilerplate_lines,
    )

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    # python reference: boilerplate = lines in >= min_docs distinct docs
    from collections import Counter

    doc_lines = {i: t.split("\n") for i, t in rows}
    df_counts = Counter()
    for lines in doc_lines.values():
        for line in set(lines):
            df_counts[line] += 1
    boiler = {ln for ln, c in df_counts.items() if c >= min_docs}

    got = {
        r["doc_id"]: (r["clean_text"], r["n_kept"], r["n_removed"])
        for r in remove_boilerplate_lines(
            df, "text", "doc_id", min_docs=min_docs
        ).collect()
    }
    for i, lines in doc_lines.items():
        kept = [ln for ln in lines if ln not in boiler]
        assert got[i] == (
            "\n".join(kept),
            len(kept),
            len(lines) - len(kept),
        ), i

    got2 = {
        r["doc_id"]: (r["clean_text"], r["n_kept"], r["n_removed"])
        for r in dedup_lines_within_doc(df, "text", "doc_id").collect()
    }
    for i, lines in doc_lines.items():
        seen: set[str] = set()
        firsts = []
        for ln in lines:
            if ln not in seen:
                seen.add(ln)
                firsts.append(ln)
        assert got2[i] == (
            "\n".join(firsts),
            len(firsts),
            len(lines) - len(firsts),
        ), i


@given(
    sizes=st.lists(
        st.integers(min_value=0, max_value=9), min_size=1, max_size=40
    ),
    budget=st.integers(min_value=0, max_value=120),
)
@settings(max_examples=10, deadline=None)
def test_take_token_budget_matches_sorted_cumsum(spark, sizes, budget):
    """The two-level windowed selection must equal the straightforward
    'sort by hash, take while cumsum <= budget' Python re-derivation."""
    import hashlib

    from polars_nexpresso_spark.functions.sampling import take_token_budget

    rows = [(i, " ".join(["w"] * n) if n else "") for i, n in enumerate(sizes)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    def h60(i):
        return int(hashlib.md5(f"42:{i}".encode()).hexdigest()[:15], 16)

    # token_count("") == 0 (tokens() drops empties)
    ordered = sorted(range(len(sizes)), key=lambda i: (h60(i), i))
    cum = 0
    want = {}
    for i in ordered:
        cum += sizes[i]
        if cum > budget:
            break
        want[i] = (sizes[i], cum)

    got = {
        r["doc_id"]: (r["n_tokens"], r["cum_tokens"])
        for r in take_token_budget(
            df, "text", "doc_id", budget=budget, n_buckets=8
        ).collect()
    }
    assert got == want


@given(
    corpus=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "d"]),
            min_size=0,
            max_size=12,
        ),
        min_size=1,
        max_size=6,
    ),
    window=st.integers(min_value=1, max_value=4),
)
@settings(max_examples=12, deadline=None)
def test_remove_duplicated_windows_properties(spark, corpus, window):
    """Structural invariants of ExactSubstr removal on random small
    corpora: token counts conserve (n_kept + n_removed == n), kept text
    is a subsequence of the original, and keep_first=True never removes
    MORE than keep_first=False."""
    from polars_nexpresso_spark.functions.dedup import (
        remove_duplicated_windows,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(corpus)],
        "doc_id long, text string",
    )

    def run(keep_first):
        return {
            r["doc_id"]: r
            for r in remove_duplicated_windows(
                docs, "text", "doc_id", window=window, keep_first=keep_first
            ).collect()
        }

    soft, hard = run(True), run(False)

    def is_subsequence(sub, full):
        it = iter(full)
        return all(tok in it for tok in sub)

    for i, toks in enumerate(corpus):
        # split("", " ") yields one empty token — the family's empty-text
        # convention; mirror it for the expected counts
        full = toks if toks else [""]
        for variant in (soft, hard):
            row = variant[i]
            assert row["n_kept"] + row["n_removed"] == len(full), (i, row)
            kept = row["clean_text"].split(" ") if row["clean_text"] else []
            assert len(kept) == row["n_kept"] or (
                row["n_kept"] == 1 and row["clean_text"] == ""
            )
            assert is_subsequence(kept, full), (i, kept, full)
        assert soft[i]["n_removed"] <= hard[i]["n_removed"], i


# ---------------------------------------------------------------------------
# r11 rewrites, pinned against slow Python reference models: char_entropy's
# single-pass run-length fold and word_ngrams_all's zip-shifted windows were
# both restructured for plan reasons (HOF re-evaluation / ExtractPythonUDFs)
# — the VALUES must be indistinguishable from the naive formulations on
# hostile inputs (unicode, repeats, whitespace runs, empties).
# ---------------------------------------------------------------------------

_doc_text = st.text(
    alphabet=st.characters(
        blacklist_categories=("Cs",), blacklist_characters="\x00"
    ),
    min_size=0,
    max_size=60,
)


@settings(max_examples=12, deadline=None)
@given(st.lists(_doc_text, min_size=1, max_size=6))
def test_char_entropy_matches_python_model(spark, texts):
    import math
    from collections import Counter

    from polars_nexpresso_spark.functions.text import char_entropy

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    got = {r["doc_id"]: r for r in char_entropy(df, "text", "doc_id").collect()}
    for i, t in enumerate(texts):
        expect = None
        if len(t) > 0:
            n = len(t)
            expect = round(
                -sum((c / n) * math.log(c / n) for c in Counter(t).values()),
                9,
            )
        assert got[i]["n_chars"] == len(t)
        if expect is None:
            assert got[i]["entropy"] is None, (t, got[i])
        else:
            assert got[i]["entropy"] == pytest.approx(expect, abs=2e-9), (
                t, got[i]["entropy"], expect,
            )


@settings(max_examples=12, deadline=None)
@given(
    st.lists(_doc_text, min_size=1, max_size=5),
    st.integers(min_value=2, max_value=5),
)
def test_word_ngrams_all_matches_python_model(spark, texts, n):
    from polars_nexpresso_spark.functions.text import word_ngrams_all

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: r["g"]
        for r in df.select(
            "doc_id", word_ngrams_all(F.col("text"), n).alias("g")
        ).collect()
    }
    import re

    for i, t in enumerate(texts):
        # replicate tokens() exactly: Java regex \s is [ \t\n\x0B\f\r]
        # (narrower than Python's str.split() whitespace — \x1c-\x1f and
        # unicode spaces are TOKEN CHARS to the operator)
        norm = re.sub(r"[ \t\n\x0b\f\r]+", " ", t.lower()).strip(
            " \t\n\x0b\f\r"
        )
        toks = norm.split(" ") if norm else []
        if len(toks) >= n:
            expect = [
                " ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)
            ]
        else:
            expect = [" ".join(toks)]
        assert got[i] == expect, (t, n, got[i], expect)


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                codec="utf-8", exclude_categories=("Cs",)
            ),
            max_size=60,
        ),
        min_size=1,
        max_size=5,
    )
)
def test_robust_canonical_text_properties(spark, texts):
    """The robust canon (both fold modes) is IDEMPOTENT — canon(canon(x))
    == canon(x) — and the unicode fold leaves no folded-class character
    behind. Idempotence is what makes the fingerprint a safe incremental
    key: re-canonicalizing an already-canonical reference corpus cannot
    change its md5s."""
    from polars_nexpresso_spark.functions.text import (
        UNICODE_PUNCT_CLASS,
        robust_canonical_text,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    for fold in (False, True):
        once = df.select(
            "doc_id",
            robust_canonical_text(
                F.col("text"), fold_unicode=fold
            ).alias("c1"),
        )
        twice = once.select(
            "doc_id",
            "c1",
            robust_canonical_text(
                F.col("c1"), fold_unicode=fold
            ).alias("c2"),
        )
        for r in twice.collect():
            assert r["c2"] == r["c1"], (fold, r)
            if fold and r["c1"]:
                # expand the class ranges to a concrete char set
                import re as _re

                assert not _re.search(
                    "[" + UNICODE_PUNCT_CLASS + "]", r["c1"]
                ), r
