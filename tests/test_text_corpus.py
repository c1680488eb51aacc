"""JSONL/CSV corpus sources: per-row fault isolation (S4 contract across
line-oriented formats)."""

from __future__ import annotations

from pyspark.sql.types import LongType, StringType, StructField, StructType

from azuredatalakeindexer_spark.sources.text_corpus import (
    read_csv_corpus,
    read_jsonl_corpus,
    split_corrupt,
)

SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("text", StringType())]
)


def test_jsonl_fault_isolation(spark, tmp_path):
    p = tmp_path / "corpus.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "good one"}\n'
        "THIS IS NOT JSON AT ALL\n"
        '{"doc_id": 2, "text": "also fine"}\n'
        '{"doc_id": 3, "text": broken}\n'
    )
    df = read_jsonl_corpus(spark, str(p), SCHEMA).cache()
    good, bad = split_corrupt(df)
    rows = {r["doc_id"]: r["text"] for r in good.collect()}
    assert rows == {1: "good one", 2: "also fine"}
    assert bad.count() == 2
    assert {r["_corrupt"] for r in bad.collect()} == {
        "THIS IS NOT JSON AT ALL",
        '{"doc_id": 3, "text": broken}',
    }


def test_csv_fault_isolation(spark, tmp_path):
    p = tmp_path / "corpus.csv"
    p.write_text(
        "doc_id,text\n"
        "1,good one\n"
        "not_a_number,still captured\n"
        "2,also fine\n"
    )
    df = read_csv_corpus(spark, str(p), SCHEMA).cache()
    good, bad = split_corrupt(df)
    rows = {r["doc_id"]: r["text"] for r in good.collect()}
    assert rows == {1: "good one", 2: "also fine"}
    assert bad.count() == 1
    assert bad.collect()[0]["_corrupt"] == "not_a_number,still captured"
