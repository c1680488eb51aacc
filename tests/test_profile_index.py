"""Multi-field persisted index (sources/profile_index.py): index-served
scoring profiles must be bit-identical to the scan-time
operators.search.scoring_profile_topk on the indexed corpus."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from azuredatalakeindexer_spark.operators.search import scoring_profile_topk
from azuredatalakeindexer_spark.sources.fixtures import load_table
from azuredatalakeindexer_spark.sources.profile_index import (
    build_profile_index,
    query_profile_index,
)

SF = "/root/testdata/sf0.001"
PROFILE = {"text": (["merge", "query", "stream"], 2.0), "source": (["src1"], 1.0)}


def _docs(spark):
    return load_table(spark, SF, "documents").select(
        "doc_id", "text", "source", "n_chars"
    )


def _rows(df):
    return [tuple(r) for r in df.collect()]


def test_profile_index_matches_scan_time_plain(spark, tmp_path):
    docs = _docs(spark)
    path = str(tmp_path / "pidx")
    build_profile_index(
        docs, path, field_cols=["text", "source"], attr_cols=["n_chars", "source"]
    )
    served = query_profile_index(spark, path, PROFILE, k=20)
    scan = scoring_profile_topk(docs, PROFILE, k=20)
    assert _rows(served) == _rows(scan)


def test_profile_index_matches_scan_time_with_boosts(spark, tmp_path):
    docs = _docs(spark)
    path = str(tmp_path / "pidx")
    build_profile_index(
        docs, path, field_cols=["text", "source"], attr_cols=["n_chars", "source"]
    )
    boost = ("n_chars", 0.5, 200.0, 800.0)
    tag = ("source", ["src1", "src3", "src5"], 0.3)
    served = query_profile_index(spark, path, PROFILE, boost=boost, tag_boost=tag, k=20)
    scan = scoring_profile_topk(docs, PROFILE, boost=boost, tag_boost=tag, k=20)
    assert _rows(served) == _rows(scan)
    # single-field profile against the same index too
    p1 = {"text": (["merge", "stream"], 1.5)}
    assert _rows(
        query_profile_index(spark, path, p1, boost=boost, k=10)
    ) == _rows(scoring_profile_topk(docs, p1, boost=boost, k=10))


def test_profile_index_validates_fields_and_attrs(spark, tmp_path):
    docs = _docs(spark)
    path = str(tmp_path / "pidx")
    build_profile_index(docs, path, field_cols=["text"], attr_cols=["n_chars"])
    with pytest.raises(ValueError, match="not indexed"):
        query_profile_index(spark, path, {"source": (["src1"], 1.0)})
    with pytest.raises(ValueError, match="not persisted"):
        query_profile_index(
            spark,
            path,
            {"text": (["merge"], 1.0)},
            tag_boost=("source", ["src1"], 0.3),
        )


def test_profile_index_prunes_buckets(spark, tmp_path):
    """The postings scan must touch only the query terms' bucket
    directories — static partition pruning, the index's point."""
    docs = _docs(spark)
    path = str(tmp_path / "pidx")
    build_profile_index(docs, path, field_cols=["text", "source"], n_buckets=16)
    out = query_profile_index(spark, path, {"text": (["merge"], 1.0)}, k=5)
    assert out.count() > 0
    from azuredatalakeindexer_spark.sources.text_index import _py_bucket

    # inputFiles() ignores pruning — assert the scan's PartitionFilters
    # pin the single bucket AND the term IN-list is pushed
    import re

    want = _py_bucket("merge", 16)
    plan = out._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[[^\]]*bucket[^\]]*\]", plan)
    assert m and str(want) in m.group(0), plan
    assert re.search(r"PushedFilters: \[[^\]]*(In|EqualTo)\(term", plan), plan


def test_facets_over_match_set(spark, tmp_path):
    """facets_from_index == scan-time facet_counts restricted to the
    matching documents — the service's facet semantics (facets are
    computed on the filtered match set, never the whole corpus)."""
    from azuredatalakeindexer_spark.operators.search import facet_counts
    from azuredatalakeindexer_spark.functions.text import tokens
    from azuredatalakeindexer_spark.sources.profile_index import (
        facets_from_index,
    )

    docs = load_table(spark, SF, "documents").select(
        "doc_id", "text", "source", "lang", "n_chars"
    )
    path = str(tmp_path / "pidx")
    build_profile_index(
        docs,
        path,
        field_cols=["text", "source"],
        attr_cols=["lang", "source", "n_chars"],
    )
    terms = ["merge", "stream"]
    query = {"text": terms, "source": ["src1"]}
    got = facets_from_index(spark, path, query, ["lang", "source"], top_n=5)

    hit = F.arrays_overlap(
        tokens(F.col("text")), F.array(*[F.lit(t) for t in terms])
    ) | F.arrays_overlap(tokens(F.col("source")), F.array(F.lit("src1")))
    expected = facet_counts(docs.where(hit), ["lang", "source"], top_n=5)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, expected.collect())
    )
    # the profile (terms, weight) shape is accepted too
    got2 = facets_from_index(
        spark, path, {"text": (terms, 2.0), "source": (["src1"], 1.0)},
        ["lang", "source"], top_n=5,
    )
    assert sorted(map(tuple, got2.collect())) == sorted(
        map(tuple, expected.collect())
    )
    with pytest.raises(ValueError, match="not persisted"):
        facets_from_index(spark, path, query, ["missing_col"])
