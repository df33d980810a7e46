"""BPE tokenizer trainer + frozen-merge encoder (analytics/bpe.py).

The registry entries (bpe_pair_counts, bpe_encode) are oracle-gated by
test_full_registry; these tests cover what the oracles cannot — the
ITERATIVE trainer (no SQL twin by nature) against a transparent pure-
Python reference BPE, and the encode kernel's merge-application
semantics — plus the SemDeDup drop-rule invariants the registry hash
can't articulate.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from ph_ee_nats_importer_rdbms_spark.analytics import bpe


def ref_apply(syms: list[str], a: str, b: str) -> list[str]:
    """CANONICAL greedy left-to-right non-overlapping BPE merge — the
    textbook array walk, deliberately independent of the production
    code's string-replace encoding (this asymmetry is what caught the
    single-space boundary-consumption bug)."""
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def ref_bpe(word_counts: dict[str, int], n_merges: int, min_count: int = 2):
    segs = {w: list(w) for w in word_counts}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for w, c in word_counts.items():
            syms = segs[w]
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] = (
                    pairs.get((syms[i], syms[i + 1]), 0) + c
                )
        if not pairs:
            break
        (a, b), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < min_count:
            break
        merges.append((a, b))
        segs = {w: ref_apply(s, a, b) for w, s in segs.items()}
    return merges, segs


def ref_encode(word: str, merges) -> str:
    syms = list(word)
    for a, b in merges:
        syms = ref_apply(syms, a, b)
    return " ".join(syms)


def _words_df(spark, counts: dict[str, int]):
    return spark.createDataFrame(
        [(w, c) for w, c in counts.items()], "word STRING, cnt BIGINT"
    )


def test_trainer_matches_reference_bpe(spark):
    counts = {
        "lower": 5, "lowest": 4, "newer": 6, "wider": 3,
        "low": 7, "new": 2, "newest": 5, "n": 1,
    }
    got = bpe.train_bpe_merges(_words_df(spark, counts), n_merges=12)
    want, _ = ref_bpe(counts, 12)
    assert got == want


def test_trainer_stops_when_nothing_repeats(spark):
    # every adjacent pair occurs exactly once -> no merge clears
    # MIN_PAIR_COUNT, training stops immediately
    counts = {"ab": 1, "cd": 1, "ef": 1}
    assert bpe.train_bpe_merges(_words_df(spark, counts), n_merges=5) == []


def test_trainer_merge_application_is_left_to_right_nonoverlapping(spark):
    # "aaaa"x3: pair (a,a) counts 9 weighted; first merge segments each
    # word greedily left-to-right -> ["aa","aa"], so the SECOND merge is
    # ("aa","aa"), not ("a","a") again
    counts = {"aaaa": 3}
    got = bpe.train_bpe_merges(
        _words_df(spark, counts), n_merges=2, min_pair_count=1
    )
    assert got == [("a", "a"), ("aa", "aa")]


def test_encode_word_applies_merges_in_training_order(spark):
    merges = [("l", "o"), ("lo", "w"), ("e", "r")]
    df = spark.createDataFrame([("lower",), ("slow",)], "w STRING")
    out = {
        r["w"]: r["enc"]
        for r in df.select(
            "w", bpe.encode_word(F.col("w"), merges).alias("enc")
        ).collect()
    }
    assert out == {"lower": "low er", "slow": "s low"}


def test_bpe_encode_matches_python_reapplication(spark, sf_dir):
    """The corpus encode (frozen artifact merges, chained literal
    replaces inside a transform) agrees with a transparent Python
    re-application token-for-token on a sample of real documents."""
    merges = bpe.merges_for(sf_dir)
    assert merges, "trained artifact missing for the test corpus"
    rows = (
        bpe.q_bpe_encode(spark, sf_dir)
        .orderBy("doc_id")
        .limit(10)
        .collect()
    )
    import re

    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .orderBy("doc_id")
        .limit(10)
        .collect()
    }
    for r in rows:
        toks = re.split(r"\s+", docs[r["doc_id"]].strip().lower())
        want = " ".join(ref_encode(w, merges) for w in toks)
        assert r["subwords"] == want
        assert r["n_subwords"] == (len(want.split(" ")) if want else 0)
        assert r["n_words"] == len(toks)


def test_semdedup_drop_rule_invariants(spark, sf_dir):
    """Every dropped row's dup_of is a same-cluster neighbor that (a)
    ranks better under the keeper rule (lower centroid_cos, then lower
    id) and (b) actually clears the cosine threshold. Exact values are
    oracle-gated at sf0.01 (test_full_registry); this pins the SEMANTICS
    at the conftest scale."""
    from ph_ee_nats_importer_rdbms_spark.analytics.dedup import _cosine
    from ph_ee_nats_importer_rdbms_spark.analytics.similarity import (
        SEMDEDUP_COS,
        q_semdedup,
    )

    r = q_semdedup(spark, sf_dir)
    dropped = r.filter("dropped")
    keep_cols = r.select(
        F.col("vec_id").alias("dup_of"),
        F.col("cluster_id").alias("k_cluster"),
        F.col("centroid_cos").alias("k_ccos"),
    )
    joined = dropped.join(keep_cols, "dup_of")
    bad_rank = joined.filter(
        ~(
            (F.col("k_ccos") < F.col("centroid_cos"))
            | (
                (F.col("k_ccos") == F.col("centroid_cos"))
                & (F.col("dup_of") < F.col("vec_id"))
            )
        )
        | (F.col("k_cluster") != F.col("cluster_id"))
    ).count()
    assert bad_rank == 0

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    pairs = (
        joined.select("vec_id", "dup_of")
        .join(emb.select(F.col("vec_id"), F.col("embedding").alias("e_a")), "vec_id")
        .join(
            emb.select(
                F.col("vec_id").alias("dup_of"),
                F.col("embedding").alias("e_b"),
            ),
            "dup_of",
        )
    )
    below = pairs.filter(
        F.round(_cosine("e_a", "e_b"), 4) < SEMDEDUP_COS
    ).count()
    assert below == 0
