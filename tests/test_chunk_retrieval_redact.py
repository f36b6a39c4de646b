"""Tests for the round-4 pipeline additions: token-window chunking, BM25
retrieval, PII redaction, the composite quality gate, and the token-length
histogram."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from polars_nexpresso_spark.functions.chunking import chunk_documents
from polars_nexpresso_spark.functions.redaction import redact_pii, redact_text
from polars_nexpresso_spark.functions.retrieval import bm25_topk
from polars_nexpresso_spark.functions.text import (
    quality_filter,
    token_length_histogram,
)


@pytest.fixture()
def corpus(spark):
    rows = [
        (1, "a b c d e f g h i j"),  # 10 tokens
        (2, "x " * 25),  # 25 tokens, trailing space normalized away
        (3, ""),  # empty
        (4, "solo"),  # 1 token
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


# --- chunking ---------------------------------------------------------------


def test_chunk_window_arithmetic(corpus):
    out = chunk_documents(
        corpus, "text", "doc_id", chunk_size=4, overlap=1
    ).collect()
    by_doc: dict[int, list] = {}
    for r in sorted(out, key=lambda r: (r["doc_id"], r["chunk_id"])):
        by_doc.setdefault(r["doc_id"], []).append(r)
    # 10 tokens, size 4, stride 3 -> ceil((10-4)/3)+1 = 3 chunks
    assert [r["chunk_text"] for r in by_doc[1]] == [
        "a b c d",
        "d e f g",
        "g h i j",
    ]
    # 25 tokens, stride 3 -> ceil(21/3)+1 = 8 chunks; last is full here
    assert len(by_doc[2]) == 8
    assert all(r["n_chunk_tokens"] == 4 for r in by_doc[2])
    # empty doc -> no chunks; 1 short doc -> exactly one (short) chunk
    assert 3 not in by_doc
    assert [(r["chunk_id"], r["n_chunk_tokens"]) for r in by_doc[4]] == [
        (0, 1)
    ]


def test_chunk_short_last_window(spark):
    df = spark.createDataFrame([(1, "a b c d e")], ["doc_id", "text"])
    out = sorted(
        chunk_documents(
            df, "text", "doc_id", chunk_size=3, overlap=1
        ).collect(),
        key=lambda r: r["chunk_id"],
    )
    # 5 tokens, stride 2 -> chunks [a b c], [c d e] — exact cover, and a
    # 6th token would add [e f]
    assert [r["chunk_text"] for r in out] == ["a b c", "c d e"]


def test_chunk_overlap_reconstructs_document(corpus):
    # Dropping each chunk's first `overlap` tokens (except chunk 0) and
    # concatenating reconstructs the original token stream exactly.
    overlap = 2
    rows = sorted(
        chunk_documents(
            corpus.filter(F.col("doc_id") == 1),
            "text",
            "doc_id",
            chunk_size=5,
            overlap=overlap,
        ).collect(),
        key=lambda r: r["chunk_id"],
    )
    toks: list[str] = []
    for r in rows:
        parts = r["chunk_text"].split(" ")
        toks.extend(parts if r["chunk_id"] == 0 else parts[overlap:])
    assert " ".join(toks) == "a b c d e f g h i j"


def test_chunk_invalid_overlap_raises(corpus):
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(corpus, "text", "doc_id", chunk_size=4, overlap=4)


def test_chunk_plan_has_no_exchange(corpus):
    plan = chunk_documents(
        corpus, "text", "doc_id", chunk_size=4, overlap=1
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # map-side only: explode over the scan


# --- BM25 -------------------------------------------------------------------


@pytest.fixture()
def search_corpus(spark):
    rows = [
        (1, "hash join hash join hash join"),  # tf-heavy for both terms
        (2, "hash table scan"),  # one term once
        (3, "sort merge join strategy"),  # other term once
        (4, "nothing relevant at all"),
        (5, "hash hash hash hash hash hash hash hash"),  # long, one term
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_bm25_ranks_and_scores(search_corpus):
    out = bm25_topk(search_corpus, "text", "doc_id", "hash join", k=5)
    rows = out.collect()
    assert [r["doc_id"] for r in rows][0] == 1  # both terms, high tf
    assert len(rows) == 4  # doc 4 has no query term at all
    # Hand-check doc 2's score: N=5, df(hash)=3, tf=1, dl=3,
    # avgdl=(6+3+4+4+8)/5=5.0
    idf = math.log(1 + (5 - 3 + 0.5) / (3 + 0.5))
    denom = 1 + 1.2 * (0.25 + 0.75 * 3 / 5.0)
    expected = round(idf * (1 * 2.2) / denom, 6)
    got = {r["doc_id"]: r["score"] for r in rows}
    assert got[2] == pytest.approx(expected, abs=1e-6)


def test_bm25_rare_term_outweighs_common(search_corpus):
    # 'join' (df=2) carries more idf than 'hash' (df=3): doc 3 (join only)
    # must outrank doc 2 (hash only) at equal tf.
    rows = bm25_topk(
        search_corpus, "text", "doc_id", "hash join", k=5
    ).collect()
    order = [r["doc_id"] for r in rows]
    assert order.index(3) < order.index(2)


def test_bm25_empty_query_raises(search_corpus):
    with pytest.raises(ValueError, match="no terms"):
        bm25_topk(search_corpus, "text", "doc_id", "   ")


def test_bm25_broadcasts_small_sides(search_corpus):
    plan = (
        bm25_topk(search_corpus, "text", "doc_id", "hash join", k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


# --- PII redaction ----------------------------------------------------------


def test_redact_each_pattern(spark):
    df = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@sub.example.co.uk now"),
            (2, "from 192.168.001.1 and 10.0.0.7"),
            (3, "ssn 123-45-6789 ok"),
            (4, "call 555-123-4567 or 555 123 4567"),
            (5, "clean text with no pii at all"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in redact_pii(df, "text").collect()}
    assert out[1]["text"] == "mail <EMAIL> now"
    assert out[1]["n_email"] == 1 and out[1]["n_pii"] == 1
    assert out[2]["text"] == "from <IP> and <IP>"
    assert out[2]["n_ipv4"] == 2
    assert out[3]["text"] == "ssn <SSN> ok"
    assert out[4]["text"] == "call <PHONE> or <PHONE>"
    assert out[4]["n_phone"] == 2
    assert out[5]["text"] == "clean text with no pii at all"
    assert out[5]["n_pii"] == 0


def test_redact_order_email_before_ip(spark):
    # An email whose domain embeds an IP-shaped run must redact as ONE
    # email — if the IP pass ran first it would punch <IP> into the
    # middle of the address and break the email match.
    df = spark.createDataFrame(
        [(1, "x u@1.2.3.4.com y"), (2, "x 12@1.2.3.44 y")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in redact_pii(df, "text").collect()}
    assert out[1]["text"] == "x <EMAIL> y"
    assert out[1]["n_email"] == 1 and out[1]["n_ipv4"] == 0
    # A bare numeric host is NOT an email by the pattern (TLD must be
    # alphabetic) — it falls through to the IP pass.
    assert out[2]["text"] == "x 12@<IP> y"
    assert out[2]["n_email"] == 0 and out[2]["n_ipv4"] == 1


def test_redact_out_col_preserves_original(spark):
    df = spark.createDataFrame([(1, "a@b.com")], ["doc_id", "text"])
    row = redact_pii(df, "text", out_col="clean").collect()[0]
    assert row["text"] == "a@b.com" and row["clean"] == "<EMAIL>"


def test_redact_plan_has_no_exchange(spark):
    df = spark.createDataFrame([(1, "a@b.com")], ["doc_id", "text"])
    plan = (
        redact_pii(df, "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_redact_text_column_helper(spark):
    df = spark.createDataFrame([("e a@b.io p 555-123-4567",)], ["t"])
    assert (
        df.select(redact_text(F.col("t")).alias("r")).collect()[0]["r"]
        == "e <EMAIL> p <PHONE>"
    )


# --- quality gate -----------------------------------------------------------


def test_quality_filter_rules(spark):
    # 24 distinct tokens: unique ratio 1.0, stopwords 2/24 ≈ 0.083,
    # avg token length in range — passes every rule.
    long_ok = (
        "the a quick brown fox jumps over lazy dog stone river mountain "
        "cloud paper glass metal wood fire water earth wind light dark sun"
    )
    rows = [
        (1, long_ok),  # passes
        (2, "too short"),  # too_few_tokens
        (3, " ".join(["aa"] * 30)),  # repeated token + no stopwords
        # avg len (3*10 + 20*15)/25 = 13.2 > 12, digit-heavy
        (4, " ".join(["the"] * 10 + ["12345678901234567890"] * 15)),
        (5, ""),  # empty -> too_few_tokens only
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: r
        for r in quality_filter(df, "text", "doc_id").collect()
    }
    assert out[1]["keep"] and out[1]["reasons"] == ""
    assert not out[2]["keep"]
    assert "too_few_tokens" in out[2]["reasons"]
    assert set(out[3]["reasons"].split(",")) == {
        "low_stopword_ratio",
        "low_unique_ratio",
    }
    assert "high_digit_ratio" in out[4]["reasons"]
    assert "bad_avg_token_len" in out[4]["reasons"]
    assert out[5]["reasons"] == "too_few_tokens" and out[5]["n_tokens"] == 0


def test_quality_filter_plan_has_no_exchange(spark):
    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    plan = (
        quality_filter(df, "text", "doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


# --- histogram --------------------------------------------------------------


def test_token_length_histogram(spark):
    rows = [(1, "a b c"), (2, "x y"), (3, " ".join(["t"] * 12))]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["bucket"]: r
        for r in token_length_histogram(
            df, "text", bucket_width=10
        ).collect()
    }
    assert out[0]["n_docs"] == 2 and out[0]["total_tokens"] == 5
    assert out[10]["n_docs"] == 1 and out[10]["total_tokens"] == 12


# --- stream-safety: the new stateless stages on a real readStream -----------


def test_redact_chunk_gate_compose_on_readstream(spark):
    """redact_pii → quality_filter-style gating → chunk_documents as ONE
    streaming plan (all stateless, so no watermark/state needed): the
    availableNow drain must equal the batch run of the same composition
    row-for-row."""
    import shutil
    import tempfile

    from polars_nexpresso_spark.sources.io import read_table

    docs = read_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", F.concat(F.col("text"), F.lit(" ping a@b.io")).alias("text")
    )
    tmp = tempfile.mkdtemp(prefix="pns_redact_stream_")
    try:
        docs.repartition(3).write.mode("overwrite").parquet(f"{tmp}/in")
        static = spark.read.parquet(f"{tmp}/in")

        def pipeline(frame):
            from polars_nexpresso_spark.functions.dedup import (
                dedup_lines_within_doc,
                remove_fixed_boilerplate,
            )

            red = redact_pii(frame, "text")
            gated = red.filter(F.col("n_pii") > 0)
            # intra-doc dedup is a pure map-side expression — stream-safe
            # in the same stateless plan (token unit: corpus has no \n)
            deduped = dedup_lines_within_doc(
                gated, "text", "doc_id", delimiter=" "
            ).withColumnRenamed("clean_text", "text")
            # fixed-set boilerplate strip: broadcast dictionary, also
            # stateless — completes the ingest chain
            stripped = remove_fixed_boilerplate(
                deduped, ["ping"], "text", "doc_id", delimiter=" "
            ).withColumnRenamed("clean_text", "text")
            return chunk_documents(
                stripped, "text", "doc_id", chunk_size=16, overlap=4
            )

        expected = {
            (r["doc_id"], r["chunk_id"], r["chunk_text"])
            for r in pipeline(static).collect()
        }
        assert expected  # every doc got salted PII

        stream = (
            spark.readStream.schema(static.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{tmp}/in")
        )
        out = pipeline(stream)
        assert out.isStreaming
        q = (
            out.writeStream.format("memory")
            .queryName("redact_chunks")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            (r["doc_id"], r["chunk_id"], r["chunk_text"])
            for r in spark.table("redact_chunks").collect()
        }
        assert got == expected
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_chunk_dedup_keeps_first_occurrence(spark):
    from polars_nexpresso_spark.functions.text import doc_fingerprint

    # doc 2 repeats doc 1's second window exactly; doc 3 is unrelated.
    w1 = " ".join(f"a{i}" for i in range(4))
    w2 = " ".join(f"b{i}" for i in range(4))
    rows = [
        (1, f"{w1} {w2}"),
        (2, f"{w2} c0 c1 c2 c3"),
        (3, "d0 d1 d2 d3"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    chunks = chunk_documents(df, "text", "doc_id", chunk_size=4, overlap=0)
    agg = (
        chunks.select(
            doc_fingerprint(F.col("chunk_text")).alias("fp"),
            F.struct("doc_id", "chunk_id").alias("first"),
        )
        .groupBy("fp")
        .agg(F.min("first").alias("keep"), F.count("*").alias("dup_count"))
        .filter(F.col("dup_count") > 1)
        .collect()
    )
    assert len(agg) == 1
    assert agg[0]["keep"]["doc_id"] == 1 and agg[0]["keep"]["chunk_id"] == 1
    assert agg[0]["dup_count"] == 2


# --- keep_top_fraction ------------------------------------------------------


def test_keep_top_fraction_lowest_and_highest(spark):
    from polars_nexpresso_spark.functions.sampling import keep_top_fraction

    rows = [(i, "a", float(i)) for i in range(1, 11)]  # scores 1..10
    rows += [(100 + i, "b", float(i)) for i in range(1, 5)]  # 1..4
    df = spark.createDataFrame(rows, ["doc_id", "src", "score"])
    low = keep_top_fraction(
        df, "score", frac=0.3, by=["src"], keep="lowest"
    ).collect()
    by_src: dict[str, set] = {}
    for r in low:
        by_src.setdefault(r["src"], set()).add(r["score"])
    # group a: 0.3-quantile of 1..10 = 3.7 -> keep {1,2,3}
    assert by_src["a"] == {1.0, 2.0, 3.0}
    # group b: 0.3-quantile of 1..4 = 1.9 -> keep {1}
    assert by_src["b"] == {1.0}
    high = keep_top_fraction(
        df.filter(df.src == "a"), "score", frac=0.2, by=["src"],
        keep="highest",
    ).collect()
    assert {r["score"] for r in high} == {9.0, 10.0}


def test_keep_top_fraction_ties_kept_and_nulls_dropped(spark):
    from polars_nexpresso_spark.functions.sampling import keep_top_fraction

    df = spark.createDataFrame(
        [(1, 5.0), (2, 5.0), (3, 5.0), (4, 9.0), (5, None)],
        "doc_id long, score double",
    )
    kept = {
        r["doc_id"]
        for r in keep_top_fraction(df, "score", frac=0.5).collect()
    }
    # global 0.5-quantile of (5,5,5,9) = 5.0; all ties kept, null dropped
    assert kept == {1, 2, 3}


def test_keep_top_fraction_validates(spark):
    from polars_nexpresso_spark.functions.sampling import keep_top_fraction

    df = spark.createDataFrame([(1, 1.0)], ["doc_id", "score"])
    with pytest.raises(ValueError, match="frac"):
        keep_top_fraction(df, "score", frac=0.0)
    with pytest.raises(ValueError, match="keep"):
        keep_top_fraction(df, "score", frac=0.5, keep="middle")


def test_score_buckets_terciles_and_nulls(spark):
    from polars_nexpresso_spark.functions.sampling import score_buckets

    rows = [(i, float(i)) for i in range(1, 10)]  # 1..9
    rows.append((99, None))
    df = spark.createDataFrame(rows, "doc_id long, score double")
    out = {r["doc_id"]: r["bucket"] for r in score_buckets(df, "score").collect()}
    # terciles of 1..9: t0=3.666.., t1=6.333..
    assert [out[i] for i in range(1, 10)] == (
        ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3
    )
    assert out[99] is None


def test_score_buckets_validates(spark):
    from polars_nexpresso_spark.functions.sampling import score_buckets

    df = spark.createDataFrame([(1, 1.0)], ["doc_id", "score"])
    with pytest.raises(ValueError, match="labels"):
        score_buckets(df, "score", fracs=(0.5,), labels=("a", "b", "c"))
    with pytest.raises(ValueError, match="fracs"):
        score_buckets(df, "score", fracs=(0.8, 0.2), labels=("a", "b", "c"))


# --- chunking property test (pure-python replica of the window math) --------

from hypothesis import given, settings
from hypothesis import strategies as st


@given(
    n=st.integers(min_value=0, max_value=200),
    chunk=st.integers(min_value=1, max_value=32),
    data=st.data(),
)
@settings(max_examples=200, deadline=None)
def test_chunk_count_formula_property(n, chunk, data):
    # The integer window-count formula the operator AND the oracle share:
    # replicate it in python and check the invariants every (n, c, o).
    overlap = data.draw(st.integers(min_value=0, max_value=chunk - 1))
    stride = chunk - overlap
    if n <= 0:
        n_chunks = 0
    elif n <= chunk:
        n_chunks = 1
    else:
        n_chunks = (n - chunk + stride - 1) // stride + 1
    # invariants: full coverage, no window starts past the end, minimal
    starts = [i * stride for i in range(n_chunks)]
    if n > 0:
        assert starts[-1] < n  # last window is non-empty
        assert starts[-1] + chunk >= n  # covers the tail
        if n_chunks > 1:
            assert starts[-2] + chunk < n  # dropping one loses coverage
        covered = set()
        for s in starts:
            covered.update(range(s, min(s + chunk, n)))
        assert covered == set(range(n))  # every token in >= 1 window


def test_chunk_spark_matches_python_formula(spark):
    # One Spark execution over a sweep of lengths, cross-checked against
    # the same python formula the property test validates.
    chunk, overlap = 7, 3
    stride = chunk - overlap
    rows = [(n, " ".join(f"t{i}" for i in range(n))) for n in range(0, 40)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got: dict[int, int] = {}
    for r in (
        chunk_documents(df, "text", "doc_id", chunk_size=chunk, overlap=overlap)
        .groupBy("doc_id")
        .count()
        .collect()
    ):
        got[r["doc_id"]] = r["count"]
    for n in range(0, 40):
        expect = 0 if n == 0 else (1 if n <= chunk else (n - chunk + stride - 1) // stride + 1)
        assert got.get(n, 0) == expect, n


def test_normalize_unicode_composes_and_roundtrips(spark):
    from polars_nexpresso_spark.functions.text import (
        doc_fingerprint,
        normalize_unicode,
    )

    decomposed = "caf" + "é"  # 'café' with combining acute
    composed = "café"
    df = spark.createDataFrame(
        [(1, decomposed), (2, composed), (3, None)], ["doc_id", "text"]
    )
    out = {
        r["doc_id"]: r["text"]
        for r in normalize_unicode(df, "text", form="NFC").collect()
    }
    assert out[1] == composed and out[2] == composed and out[3] is None
    # the dedup motivation: identical fingerprints after normalization
    fps = (
        normalize_unicode(df.filter(df.doc_id < 3), "text", form="NFC")
        .select(doc_fingerprint(F.col("text")).alias("fp"))
        .distinct()
        .count()
    )
    assert fps == 1
    nfd = {
        r["doc_id"]: r["text"]
        for r in normalize_unicode(df, "text", form="NFD").collect()
    }
    assert nfd[2] == decomposed
    with pytest.raises(ValueError, match="form"):
        normalize_unicode(df, "text", form="NFX")


def test_corpus_diff_statuses_include_removed(spark):
    from polars_nexpresso_spark.functions.text import doc_fingerprint

    old = spark.createDataFrame(
        [(1, "same text"), (2, "old text"), (3, "gone text")],
        ["doc_id", "text"],
    ).select("doc_id", doc_fingerprint(F.col("text")).alias("ofp"))
    new = spark.createDataFrame(
        [(1, "same text"), (2, "new text"), (4, "brand new")],
        ["doc_id", "text"],
    ).select("doc_id", doc_fingerprint(F.col("text")).alias("nfp"))
    j = old.join(new, on="doc_id", how="full_outer")
    status = (
        F.when(F.col("ofp").isNull(), F.lit("added"))
        .when(F.col("nfp").isNull(), F.lit("removed"))
        .when(F.col("ofp") == F.col("nfp"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    got = {
        r["doc_id"]: r["s"]
        for r in j.select("doc_id", status.alias("s")).collect()
    }
    assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


def test_score_buckets_all_null_group_survives(spark):
    from polars_nexpresso_spark.functions.sampling import score_buckets

    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "a", 2.0), (3, "a", 3.0), (4, "b", None)],
        "doc_id long, src string, score double",
    )
    out = {
        r["doc_id"]: r["bucket"]
        for r in score_buckets(df, "score", by=["src"]).collect()
    }
    assert out[4] is None  # group 'b' has no threshold row; row survives
    assert out[1] == "head" and out[3] == "tail"


def test_top_k_per_group(spark):
    from polars_nexpresso_spark.functions.sampling import top_k_per_group

    rows = [
        (1, "a", 9.0), (2, "a", 7.0), (3, "a", 7.0), (4, "a", 1.0),
        (5, "b", 3.0),
    ]
    df = spark.createDataFrame(rows, ["id", "g", "v"])
    out = top_k_per_group(
        df, ["g"], [F.col("v").desc(), F.col("id").asc()], k=2
    ).collect()
    got = {(r["g"], r["rank"]): r["id"] for r in out}
    assert got == {("a", 1): 1, ("a", 2): 2, ("b", 1): 5}
    # rank_col=None drops the rank; k validation
    no_rank = top_k_per_group(
        df, ["g"], [F.col("v").desc(), F.col("id").asc()], k=1,
        rank_col=None,
    )
    assert "rank" not in no_rank.columns and no_rank.count() == 2
    with pytest.raises(ValueError, match="k must"):
        top_k_per_group(df, ["g"], ["v"], k=0)


# --- persisted BM25 index ----------------------------------------------------


def test_bm25_index_matches_direct_topk(spark, tmp_path):
    """Scoring from the persisted index is row-identical to the direct
    corpus-scan bm25_topk — same scores, order, and tie-break."""
    from polars_nexpresso_spark.functions.retrieval import (
        bm25_against_index,
        bm25_topk,
        build_text_index,
    )

    docs = spark.createDataFrame(
        [
            (1, "hash join beats sort merge join on small builds"),
            (2, "window functions spill when frames grow"),
            (3, "hash partitioning and hash aggregation"),
            (4, "completely unrelated prose about gardens"),
            (5, "join join join"),
        ],
        ["doc_id", "text"],
    )
    build_text_index(
        docs, "text", "doc_id", "pns_test_tidx",
        num_buckets=8, path=str(tmp_path / "tidx"),
    )
    try:
        direct = bm25_topk(docs, "text", "doc_id", "hash join spill", k=5)
        indexed = bm25_against_index(
            spark, "pns_test_tidx", "hash join spill", k=5
        )
        assert [tuple(r) for r in indexed.collect()] == [
            tuple(r) for r in direct.collect()
        ]
        assert indexed.columns == ["doc_id", "score"]
    finally:
        for t in ("pns_test_tidx_postings", "pns_test_tidx_terms",
                  "pns_test_tidx_stats"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bm25_index_matches_direct_with_null_text(spark, tmp_path):
    """NULL-text docs: bm25_topk's avg(dl) skips them while its idf N
    counts them — the index must reproduce BOTH or scores diverge
    (round-8 review finding, reproduced before the n_text fix)."""
    from polars_nexpresso_spark.functions.retrieval import (
        bm25_against_index,
        bm25_topk,
        build_text_index,
    )

    docs = spark.createDataFrame(
        [
            (1, "hash join spill window"),
            (2, "hash hash join"),
            (3, None),
            (4, "window spill"),
        ],
        "doc_id long, text string",
    )
    build_text_index(
        docs, "text", "doc_id", "pns_test_tidx_n",
        num_buckets=4, path=str(tmp_path / "tidxn"),
    )
    try:
        direct = bm25_topk(docs, "text", "doc_id", "hash join", k=4)
        indexed = bm25_against_index(
            spark, "pns_test_tidx_n", "hash join", k=4
        )
        assert [tuple(r) for r in indexed.collect()] == [
            tuple(r) for r in direct.collect()
        ]
    finally:
        for t in ("pns_test_tidx_n_postings", "pns_test_tidx_n_terms",
                  "pns_test_tidx_n_stats"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bm25_index_scan_bucket_prunes_to_query_terms(spark, tmp_path):
    """The postings scan must read only the buckets holding the query's
    terms — query cost scales with posting lists, not corpus size."""
    import re

    from polars_nexpresso_spark.functions.retrieval import (
        bm25_against_index,
        build_text_index,
    )

    docs = spark.createDataFrame(
        [(i, f"term{i} filler words and term{i % 3} here")
         for i in range(100)],
        ["doc_id", "text"],
    )
    build_text_index(
        docs, "text", "doc_id", "pns_test_tidx2",
        num_buckets=16, path=str(tmp_path / "tidx2"),
    )
    try:
        plan = (
            bm25_against_index(spark, "pns_test_tidx2", "term1 term2", k=3)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
        assert m, "postings scan is not bucket-pruned"
        assert int(m.group(1)) < int(m.group(2))
    finally:
        for t in ("pns_test_tidx2_postings", "pns_test_tidx2_terms",
                  "pns_test_tidx2_stats"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bm25_index_validates(spark):
    import pytest as _pytest

    from polars_nexpresso_spark.functions.retrieval import (
        bm25_against_index,
        build_text_index,
    )

    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    with _pytest.raises(ValueError, match="must be in the DataFrame"):
        build_text_index(df, "body", "doc_id", "t")
    with _pytest.raises(ValueError, match="no terms"):
        bm25_against_index(spark, "t", "   ")


def test_extend_text_index_equals_rebuild(spark, tmp_path):
    """Appending a document batch must score identically to rebuilding
    the index over the union — df partials and stats partials sum to
    the rebuild's exact values."""
    from polars_nexpresso_spark.functions.retrieval import (
        bm25_against_index,
        build_text_index,
        extend_text_index,
    )

    batch1 = spark.createDataFrame(
        [
            (1, "hash join beats sort merge join"),
            (2, "window functions spill to disk"),
        ],
        ["doc_id", "text"],
    )
    batch2 = spark.createDataFrame(
        [
            (3, "hash partitioning and hash aggregation spill"),
            (4, "gardens and completely unrelated prose"),
        ],
        ["doc_id", "text"],
    )
    build_text_index(
        batch1, "text", "doc_id", "pns_test_tidx_e",
        num_buckets=8, path=str(tmp_path / "e"),
    )
    build_text_index(
        batch1.unionByName(batch2), "text", "doc_id", "pns_test_tidx_r",
        num_buckets=8, path=str(tmp_path / "r"),
    )
    try:
        extend_text_index(batch2, "text", "doc_id", "pns_test_tidx_e")
        got = [
            tuple(r)
            for r in bm25_against_index(
                spark, "pns_test_tidx_e", "hash join spill", k=4
            ).collect()
        ]
        want = [
            tuple(r)
            for r in bm25_against_index(
                spark, "pns_test_tidx_r", "hash join spill", k=4
            ).collect()
        ]
        assert got == want and len(got) >= 3
    finally:
        for stem in ("pns_test_tidx_e", "pns_test_tidx_r"):
            for suf in ("postings", "terms", "stats"):
                spark.sql(f"DROP TABLE IF EXISTS {stem}_{suf}")


def test_bm25_route_matches_direct_scores(spark, tmp_path):
    """Routing a batch against its own index reproduces bm25_topk's
    scores exactly (same collection model), for every scored doc."""
    from polars_nexpresso_spark.functions.retrieval import (
        bm25_route_stream,
        bm25_topk,
        build_text_index,
    )
    from polars_nexpresso_spark.sources.io import read_table

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    build_text_index(
        docs, "text", "doc_id", "pns_t_route_eq", num_buckets=4,
        path=str(tmp_path / "idx"),
    )
    routed = {
        r["doc_id"]: r["score"]
        for r in bm25_route_stream(
            docs, "text", "doc_id", "pns_t_route_eq",
            [("q", "hash join spill window")],
        ).collect()
    }
    direct = {
        r["doc_id"]: r["score"]
        for r in bm25_topk(
            docs, "text", "doc_id", "hash join spill window", k=10**6
        ).collect()
        if r["score"] > 0
    }
    assert routed == direct


def test_bm25_route_stream_drain_equals_batch(spark, tmp_path):
    """availableNow drain of a real readStream routes the identical
    (doc, query, score) rows — the stateless-projection contract."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from polars_nexpresso_spark.functions.retrieval import (
        bm25_route_stream,
        build_text_index,
    )
    from polars_nexpresso_spark.sources.io import read_table

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    build_text_index(
        docs, "text", "doc_id", "pns_t_route_stream", num_buckets=4,
        path=str(tmp_path / "idx"),
    )
    queries = [("a", "hash join"), ("b", "window watermark")]
    tmp = tempfile.mkdtemp(prefix="pns_route_stream_")
    try:
        docs.repartition(4).write.mode("overwrite").parquet(f"{tmp}/in")
        static = spark.read.parquet(f"{tmp}/in")
        expected = {
            (r["doc_id"], r["query_id"], r["score"])
            for r in bm25_route_stream(
                static, "text", "doc_id", "pns_t_route_stream", queries
            ).collect()
        }
        assert expected
        stream = spark.readStream.schema(static.schema).parquet(f"{tmp}/in")
        routed = bm25_route_stream(
            stream, "text", "doc_id", "pns_t_route_stream", queries
        )
        assert routed.isStreaming
        q = (
            routed.writeStream.format("memory")
            .queryName("bm25_route_out")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            (r["doc_id"], r["query_id"], r["score"])
            for r in spark.table("bm25_route_out").collect()
        }
        assert got == expected
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_bm25_route_contracts_and_plan(spark, tmp_path):
    import pytest
    from pyspark.sql import functions as F

    from polars_nexpresso_spark.functions.retrieval import (
        bm25_route_stream,
        build_text_index,
    )

    docs = spark.createDataFrame(
        [(1, "hash join planning"), (2, None), (3, "nothing shared")],
        "doc_id long, text string",
    )
    build_text_index(
        docs, "text", "doc_id", "pns_t_route_contracts", num_buckets=2,
        path=str(tmp_path / "idx"),
    )
    out = bm25_route_stream(
        docs, "text", "doc_id", "pns_t_route_contracts",
        [("q", "hash join")],
    )
    rows = out.collect()
    # NULL text never routes; a doc sharing no term never routes
    assert {r["doc_id"] for r in rows} == {1}
    # ...and the same holds under NON-ANSI semantics (Spark 3.5
    # defaults), where size(NULL) = -1 would otherwise give tf = dl =
    # -1 and a garbage positive score for the NULL-text doc
    ansi = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        non_ansi_rows = bm25_route_stream(
            docs, "text", "doc_id", "pns_t_route_contracts",
            [("q", "hash join")],
        ).collect()
        assert {r["doc_id"] for r in non_ansi_rows} == {1}
    finally:
        spark.conf.set("spark.sql.ansi.enabled", ansi)
    # stateless map-side plan: no shuffle anywhere
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p
    with pytest.raises(ValueError, match="non-empty"):
        bm25_route_stream(
            docs, "text", "doc_id", "pns_t_route_contracts", []
        )
    with pytest.raises(ValueError, match="no terms"):
        bm25_route_stream(
            docs, "text", "doc_id", "pns_t_route_contracts", [("q", "  ")]
        )


def test_compact_text_index_folds_partials_scores_unchanged(spark, tmp_path):
    """After two extends the terms/stats tables hold partial rows per
    batch; compaction folds them to one row per term and one stats row
    while every BM25 score stays identical — the LSM contract."""
    from pyspark.sql import functions as F

    from polars_nexpresso_spark.functions.retrieval import (
        bm25_against_index,
        build_text_index,
        compact_text_index,
        extend_text_index,
    )
    from polars_nexpresso_spark.sources.io import read_table

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    day0 = docs.filter(F.col("doc_id") % 3 == 0)
    day1 = docs.filter(F.col("doc_id") % 3 == 1)
    day2 = docs.filter(F.col("doc_id") % 3 == 2)
    build_text_index(
        day0, "text", "doc_id", "pns_t_compact", num_buckets=4,
        path=str(tmp_path / "idx"),
    )
    extend_text_index(
        day1, "text", "doc_id", "pns_t_compact",
    )
    extend_text_index(
        day2, "text", "doc_id", "pns_t_compact",
    )
    query = "hash join spill window"
    before = sorted(
        map(tuple, bm25_against_index(
            spark, "pns_t_compact", query, k=50).collect())
    )
    # num_buckets deliberately NOT passed: compaction must preserve the
    # build-time bucket count (4) read from the catalog, not a default
    report = compact_text_index(
        spark, "pns_t_compact", path=str(tmp_path / "idx_c"),
    )
    after = sorted(
        map(tuple, bm25_against_index(
            spark, "pns_t_compact", query, k=50).collect())
    )
    assert after == before
    # partials folded: strictly fewer term rows, exactly one per term,
    # one stats row
    assert report["term_rows_after"] < report["term_rows_before"]
    terms = spark.table("pns_t_compact_terms")
    assert terms.groupBy("term").count().filter("count > 1").count() == 0
    assert spark.table("pns_t_compact_stats").count() == 1
    assert report["stats_rows_before"] == 3
    # bucketing spec read from the catalog and preserved
    from polars_nexpresso_spark.sources.io import catalog_num_buckets

    assert catalog_num_buckets(spark, "pns_t_compact_terms") == 4
    # external index + no path: fail fast instead of silently rewriting
    # as managed tables and stranding the external data files
    with pytest.raises(ValueError, match="EXTERNAL"):
        compact_text_index(spark, "pns_t_compact")


# --- cross-encoder rerank ---------------------------------------------------


def test_cross_encoder_rerank(spark):
    """Pairwise joint scoring over a shortlist: hand-computable
    distinct-token Jaccard scores, per-query top-k with the doc_id
    tie-break, 0.0 for both-empty, NULL text ranked last, and the
    model backend raising per the stub policy."""
    from polars_nexpresso_spark.functions.retrieval import (
        cross_encoder_rerank,
    )

    texts = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma epsilon"),   # 3/5 with doc 1
            (3, "alpha beta zeta eta"),        # 2/6 with doc 1
            (4, "alpha beta gamma delta"),     # 4/4 with doc 1
            (5, None),                         # NULL text
        ],
        ["doc_id", "text"],
    )
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (1, 5)], ["query_id", "doc_id"]
    )
    out = cross_encoder_rerank(pairs, texts, k=3).collect()
    got = {r["doc_id"]: r for r in out}
    assert len(out) == 3  # k=3 of 4 candidates
    assert got[4]["rank"] == 1 and got[4]["ce_score"] == 1.0
    assert got[2]["rank"] == 2 and got[2]["ce_score"] == 0.6
    assert got[3]["rank"] == 3 and abs(got[3]["ce_score"] - 1 / 3) < 1e-6
    # NULL-text candidate ranked last -> cut by k=3
    assert 5 not in got

    # tie-break: equal scores rank by doc_id ascending
    tie_pairs = spark.createDataFrame(
        [(1, 4), (1, 2)], ["query_id", "doc_id"]
    )
    tie = {
        r["doc_id"]: r["rank"]
        for r in cross_encoder_rerank(tie_pairs, texts, k=2).collect()
    }
    assert tie[4] == 1 and tie[2] == 2

    # both-empty pair scores 0.0 (not NULL)
    empty = spark.createDataFrame([(7, ""), (8, "")], ["doc_id", "text"])
    z = cross_encoder_rerank(
        spark.createDataFrame([(7, 8)], ["query_id", "doc_id"]),
        empty,
        k=1,
    ).collect()
    assert z[0]["ce_score"] == 0.0

    with pytest.raises(NotImplementedError):
        cross_encoder_rerank(pairs, texts, scorer="model")
    with pytest.raises(ValueError):
        cross_encoder_rerank(pairs, texts, scorer="tfidf")
    with pytest.raises(ValueError):
        cross_encoder_rerank(pairs.withColumnRenamed("query_id", "q"), texts)


def test_distillation_pairs(spark):
    """Hand-computable triplet election: the top-scored candidate is
    the positive, margins are pos-neg, hardest (smallest margin)
    negatives rank first, NULL-scored candidates are never the
    positive and rank softest."""
    from polars_nexpresso_spark.functions.retrieval import (
        distillation_pairs,
    )

    scored = spark.createDataFrame(
        [
            (1, 10, 0.9),
            (1, 11, 0.8),   # margin 0.1 — hardest
            (1, 12, 0.3),   # margin 0.6
            (1, 13, None),  # NULL — softest, cut by n_negatives=2
            (2, 20, 0.5),
            (2, 21, 0.5),   # tie: lowest id (20) wins the positive
        ],
        "query_id long, doc_id long, ce_score double",
    )
    out = distillation_pairs(scored, n_negatives=2).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    q1 = sorted(by_q[1], key=lambda r: r["neg_rank"])
    assert [r["pos_id"] for r in q1] == [10, 10]
    assert [r["neg_id"] for r in q1] == [11, 12]
    assert abs(q1[0]["margin"] - 0.1) < 1e-9
    assert abs(q1[1]["margin"] - 0.6) < 1e-9
    (q2,) = by_q[2]
    assert q2["pos_id"] == 20 and q2["neg_id"] == 21 and q2["margin"] == 0.0


def test_cross_encoder_rerank_prefilter_invariance(spark):
    """r13 optimization pin: cross_encoder_rerank left-semi-filters the
    text table to the ids that appear in a candidate pair before
    tokenizing (then localCheckpoints the bounded token sets). Adding
    text rows that NO pair references must not change a single output
    row — the inner pair joins dropped them before, the semi-join drops
    them now."""
    from polars_nexpresso_spark.functions.retrieval import (
        cross_encoder_rerank,
    )

    texts = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma epsilon"),
            (3, "alpha beta zeta eta"),
        ],
        ["doc_id", "text"],
    )
    extra = texts.unionByName(
        spark.createDataFrame(
            [(90, "noise text one"), (91, None), (92, "")],
            ["doc_id", "text"],
        )
    )
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3)], ["query_id", "doc_id"]
    )
    base = sorted(
        map(tuple, cross_encoder_rerank(pairs, texts, k=5).collect())
    )
    with_extra = sorted(
        map(tuple, cross_encoder_rerank(pairs, extra, k=5).collect())
    )
    assert base == with_extra
    assert len(base) == 2
