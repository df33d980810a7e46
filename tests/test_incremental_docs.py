"""Incremental near-dup index maintenance (analytics/incremental_docs.py).

Parity contract: after any sequence of batch appends, the stored pair set
and cluster labels equal a from-scratch build on the union corpus —
including pairs that BRIDGE batches (a new doc near-duplicating an old
one) and label merges that fuse previously separate clusters.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ph_ee_nats_importer_rdbms_spark.analytics import incremental_docs as inc
from ph_ee_nats_importer_rdbms_spark.sources.files import load_table


import pytest

pytestmark = pytest.mark.slow  # heavy Spark gate; default selection skips (pytest.ini), round-close runs all


def _pairs(spark, root):
    return {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in inc.read_pairs(spark, root).collect()
    }


def _labels(spark, root):
    return {
        (r["node"], r["label"]) for r in inc.read_labels(spark, root).collect()
    }


def test_append_matches_full_rebuild_on_real_corpus(spark, sf_dir, tmp_path):
    """Split the sf0.001 documents by source into two deliveries; append
    must equal the from-scratch build of the union."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "source")
    first = docs.filter(~docs.source.isin("src0", "src1")).drop("source")
    second = docs.filter(docs.source.isin("src0", "src1")).drop("source")

    root = str(tmp_path / "inc")
    inc.build_index(spark, first, root)
    stats = inc.append_batch(spark, second, root)
    assert stats["new_docs"] == second.count()

    full = str(tmp_path / "full")
    inc.build_index(spark, docs.drop("source"), full)

    assert _pairs(spark, root) == _pairs(spark, full)
    assert _labels(spark, root) == _labels(spark, full)
    assert _pairs(spark, root), "corpus contains planted near-dups"


def _doc(doc_id: int, words: list[str]) -> tuple:
    return (doc_id, " ".join(words))


@st.composite
def _batches(draw):
    """2-3 batches of synthetic docs drawn from a tiny vocabulary so
    near-dups (and cross-batch bridges, and cluster fusions) are likely."""
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    base = draw(
        st.lists(
            st.lists(st.sampled_from(vocab), min_size=4, max_size=7),
            min_size=2,
            max_size=4,
        )
    )
    n_batches = draw(st.integers(2, 3))
    batches = [[] for _ in range(n_batches)]
    doc_id = 0
    for words in base:
        # each template spawns 1-3 exact/near copies spread across batches
        for _ in range(draw(st.integers(1, 3))):
            w = list(words)
            if draw(st.booleans()) and len(w) > 4:
                w[draw(st.integers(0, len(w) - 1))] = draw(st.sampled_from(vocab))
            batches[draw(st.integers(0, n_batches - 1))].append(_doc(doc_id, w))
            doc_id += 1
    # every batch non-empty: pad with a unique filler doc
    for i, b in enumerate(batches):
        if not b:
            b.append(_doc(doc_id, [f"filler{i}", "one", "two", "three"]))
            doc_id += 1
    return batches


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batches=_batches())
def test_fuzz_append_sequence_matches_full_rebuild(
    batches, spark, tmp_path_factory
):
    base = tmp_path_factory.mktemp("incdocs")
    root, full = str(base / "inc"), str(base / "full")

    schema = "doc_id long, text string"
    inc.build_index(spark, spark.createDataFrame(batches[0], schema), root)
    for b in batches[1:]:
        inc.append_batch(spark, spark.createDataFrame(b, schema), root)

    union = [d for b in batches for d in b]
    inc.build_index(spark, spark.createDataFrame(union, schema), full)

    assert _pairs(spark, root) == _pairs(spark, full)
    assert _labels(spark, root) == _labels(spark, full)


def test_append_rejects_redelivered_doc_ids(spark, tmp_path):
    import pytest as _pytest

    schema = "doc_id long, text string"
    root = str(tmp_path / "inc")
    inc.build_index(
        spark, spark.createDataFrame([(1, "alpha beta gamma delta")], schema), root
    )
    with _pytest.raises(ValueError, match="already in the store"):
        inc.append_batch(
            spark,
            spark.createDataFrame([(1, "alpha beta gamma delta")], schema),
            root,
        )
