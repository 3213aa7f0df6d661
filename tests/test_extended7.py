"""Corpus-preparation operators (round 2): chunking, repetition
signals, PII scrubbing."""

from __future__ import annotations

from fifa_data_pipeline_spark.operators.text import (
    chunk_documents,
    pii_scrub,
    repetition_score,
)


def test_chunk_documents_windows_and_remainder(spark):
    df = spark.createDataFrame(
        [(1, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9")], ["doc_id", "text"]
    )
    out = {
        r.chunk_idx: (r.chunk_text, r.n_tokens)
        for r in chunk_documents(df, chunk_tokens=4, overlap=1).collect()
    }
    # stride 3 over 10 tokens -> starts 0,3,6,9
    assert out[0] == ("t0 t1 t2 t3", 4)
    assert out[1] == ("t3 t4 t5 t6", 4)
    assert out[2] == ("t6 t7 t8 t9", 4)
    assert out[3] == ("t9", 1)  # remainder window
    assert len(out) == 4


def test_chunk_documents_short_doc_single_chunk(spark):
    df = spark.createDataFrame([(1, "only two")], ["doc_id", "text"])
    rows = chunk_documents(df, chunk_tokens=64, overlap=16).collect()
    assert len(rows) == 1
    assert rows[0].chunk_text == "only two" and rows[0].n_tokens == 2


def test_chunk_documents_rejects_overlap_ge_chunk(spark):
    import pytest

    df = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=8, overlap=8)


def test_repetition_score_flags_boilerplate(spark):
    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam"),  # all 4 grams identical
            (2, "all tokens here are unique words"),
        ],
        ["doc_id", "text"],
    )
    got = {
        r.doc_id: (r.dup_gram_ratio, r.dup_token_ratio)
        for r in repetition_score(df).collect()
    }
    assert got[1] == (0.75, round(5 / 6, 6))  # 4 grams, 1 distinct
    assert got[2] == (0.0, 0.0)


def test_pii_scrub_redacts_emails_then_phones(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at jo.doe+x@corp.example.org or +1 (555) 010-9999 ok"),
            (2, "no pii here at all"),
        ],
        ["doc_id", "text"],
    )
    got = {r.doc_id: (r.clean_text, r.n_redactions) for r in pii_scrub(df).collect()}
    assert got[1] == ("mail me at <EMAIL> or <PHONE> ok", 2)
    assert got[2] == ("no pii here at all", 0)
