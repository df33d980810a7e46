"""Vector ENCODE kernels + frozen codebook artifacts — the code that
defines the BYTES of every vector-derived staged relation and store
artifact (ivf_assign, pq_codes, the incremental vector store's batches).

Split out of ``similarity.py`` in round 13 (VERDICT r12 task #5): the
``vstore``/``emb`` staging fingerprints key the modules whose edits can
change a staged artifact's CONTENT, and keying all 2,300 lines of
``similarity.py`` forced the 20+-second store rebuild on every edit to a
query-side function that cannot change a stored byte. This module holds
exactly the content-defining surface — the codebook loaders, the
fence-guarded BLAS/SQL IVF assignment, PQ encoding, and probe selection
— so query-plan work in ``similarity.py`` no longer invalidates stores.
``similarity`` re-exports every name for compatibility.

Float math note (unchanged from the in-place history): the numpy GEMM
path rounds HALF_UP at 6dp exactly like ``F.round``, ties break toward
the lower cid exactly like the SQL argmax, and boundary-fenced rows are
re-assigned by the exact SQL kernel — bit-equal to the pure-SQL path on
every input (kernel-parity + forced-fence pins in
tests/test_round11_pins.py). The tiny ``_dot``/``_norm``/``_cosine``
expression builders are imported from ``dedup`` (as they always were —
they are shared with the near-dup stack and are not re-fingerprinted
here, same as before the split).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ph_ee_nats_importer_rdbms_spark.analytics.dedup import (
    _cosine,
    _dot,
    _norm,
)
from ph_ee_nats_importer_rdbms_spark.sources.files import local_rel as _local_rel

EMBED_DIM = 64

#: IVF codebooks: LEARNED offline by k-means (cosine distance) over each
#: corpus — ``tools/train_ivf_centroids.py`` runs
#: ``pyspark.ml.clustering.KMeans`` per known dataset (best objective of
#: several seeds) and checks the result into ``ivf_centroids.json``;
#: BOTH the Spark plan and the DuckDB oracle replay the same
#: float32-exact literals. Per-CORPUS codebooks are the deployment model
#: (FAISS ``train()`` on the indexed corpus): the driver's sf0.01/sf0.1
#: corpora are independently generated, and a codebook fits the corpus
#: it was trained on (measured recall@10 ≈ 0.58 on-corpus vs ≈ 0.43
#: cross-corpus vs 0.41 for round-2's fixed vector subset). 16 lists,
#: probe the 4 nearest; unknown corpora fall back to the ``default``
#: codebook. The oracle embeds the sf0.01 codebook — the driver's oracle
#: gate runs at sf0.01 by contract.
_IVF_ARTIFACT = os.path.join(os.path.dirname(__file__), "ivf_centroids.json")
with open(_IVF_ARTIFACT) as _f:
    _IVF_META = json.load(_f)
IVF_CODEBOOKS: dict[str, list[list[float]]] = _IVF_META["codebooks"]
IVF_NLIST = _IVF_META["k"]
IVF_NPROBE = 4
#: multi-probe for the IVF-ADC path: scanning PQ codes is ~16× cheaper per
#: candidate than raw vectors, so the ADC composition probes 8/16 lists
#: where raw-vector IVF probes 4 — the FAISS nprobe-with-PQ trade. Lifts
#: IVF-ADC candidate-capped recall@10 from 0.51 to ≈0.80 at sf0.1 (measured,
#: q_ann_recall) while the scored bytes stay below raw-IVF's 4-list scan.
IVF_PQ_NPROBE = 8


def _codebook(sf_dir: str) -> list[list[float]]:
    base = os.path.basename(os.path.normpath(sf_dir))
    return IVF_CODEBOOKS.get(base, IVF_CODEBOOKS["default"])


def _ivf_centroids(spark: SparkSession, sf_dir: str):
    """The corpus's learned centroid set as a broadcast literal relation
    — config shipped to every task, exactly how a deployment distributes
    an offline-trained IVF codebook. Driver-local (LocalTableScan), so
    re-executions of a memoized serving plan rebuild the broadcast
    without a python-RDD stage."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("cid", T.IntegerType()),
            T.StructField("cemb", T.ArrayType(T.DoubleType())),
        ]
    )
    return F.broadcast(
        _local_rel(
            spark,
            [(cid, vec) for cid, vec in enumerate(_codebook(sf_dir))],
            schema,
        )
    )


#: exactness fence for the BLAS assignment kernel: a vector is routed to
#: the exact SQL argmax when ANY contending centroid's 6dp rounding sits
#: within this distance (in cos·1e6 units) of a half-integer boundary.
#: The float discrepancy between a numpy matmul row and the sequential
#: SQL fold is ≤ ~300·eps ≈ 7e-14 on the cosine (same per-term products,
#: different summation order — Higham's standard reordering bound), i.e.
#: ≤ 7e-8 in these units; the fence is 100× wider, so a vector that
#: passes it provably rounds AND ranks identically under both kernels.
IVF_BLAS_FENCE = 1e-5


def _ivf_assign_exact(vectors: DataFrame, cent_n) -> DataFrame:
    """The pure-SQL assignment argmax: crossJoin against the broadcast
    (centroid, norm) relation, 6dp-rounded cosine, (ccos, -cid) order
    packed into one BIGINT so the aggregate stays a streaming
    HashAggregate (see ivf_assign_of for the history). Used for the
    BLAS kernel's fenced rows — and as the reference side of the
    kernel-parity pins."""
    scored = vectors.select(
        "vec_id", "embedding", _norm("embedding").alias("xnrm")
    ).crossJoin(cent_n).select(
        "vec_id",
        "cid",
        F.round(
            _dot("embedding", "cemb") / (F.col("xnrm") * F.col("cnrm")), 6
        ).alias("ccos"),
    )
    lo = (1 << 32) - 1
    amax = F.max(
        F.round(F.col("ccos") * 1e6).cast("long") * F.lit(1 << 32)
        + (F.lit(lo) - F.col("cid"))
    ).alias("_amax")
    return scored.groupBy("vec_id").agg(amax).select(
        "vec_id",
        (F.lit(lo) - F.pmod(F.col("_amax"), F.lit(1 << 32)))
        .cast("int")
        .alias("cluster_id"),
    )


def _blas_assign_kernel(codebook: list[list[float]], fence: float):
    """mapInPandas kernel: batched numpy matmul against the codebook
    matrix, HALF_UP 6dp rounding, first-max argmax (= lowest cid on
    ties, the SQL order), and the boundary fence that flags any row
    whose outcome a summation-order ulp could flip."""
    import numpy as np

    C = np.asarray(codebook, dtype=np.float64)
    cnorm = np.sqrt((C * C).sum(axis=1))

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            for lo_i in range(0, len(pdf), 2048):
                chunk = pdf.iloc[lo_i : lo_i + 2048]
                X = np.stack(chunk["embedding"].to_numpy()).astype(
                    np.float64
                )
                xnorm = np.sqrt((X * X).sum(axis=1))
                xnorm[xnorm == 0.0] = 1.0  # zero vector: cos rows all 0
                s6 = (X @ C.T) / xnorm[:, None] / cnorm[None, :] * 1e6
                a = np.abs(s6)
                c6 = (np.sign(s6) * np.floor(a + 0.5)).astype(np.int64)
                # distance of |s6|+0.5 to its nearest integer = distance
                # of the HALF_UP decision to flipping
                h = a + 0.5
                bdist = np.abs(h - np.rint(h))
                win = np.argmax(c6, axis=1)  # first max == lowest cid
                m = c6[np.arange(len(c6)), win]
                flagged = (
                    (bdist <= fence) & (c6 >= (m[:, None] - 1))
                ).any(axis=1)
                yield pd.DataFrame(
                    {
                        "vec_id": chunk["vec_id"].to_numpy(),
                        "cluster_id": win.astype("int32"),
                        "flagged": flagged,
                    }
                )

    return kernel


def ivf_assign_of(
    spark: SparkSession, vectors: DataFrame, codebook: list[list[float]]
) -> DataFrame:
    """IVF assignment over ANY (vec_id, embedding) relation with an
    explicit codebook — the encode kernel behind
    ``similarity.ivf_assignments``, reused by the incremental vector
    index (analytics/incremental_vectors) and SemDeDup, so appends
    encode against FROZEN centroids.

    This is a SANCTIONED Arrow stage (the short list: multimodal decode,
    the packing fold, the streaming state engines — and, since round 11,
    this kernel): the corpus×k centroid scoring is dense GEMM, which
    Spark has no built-in operator for, and the interpreted
    higher-order-function fold measured ~4 µs per 64-dim cosine — the
    sf100 assignment alone was ~40 CPU-minutes of lambda dispatch for
    ~15 BLAS-seconds of arithmetic. Exactness is NOT traded away: the
    numpy path rounds HALF_UP at 6dp exactly like ``F.round``, breaks
    ties toward the lower cid exactly like the SQL argmax, and any row
    whose rounding sits within ``IVF_BLAS_FENCE`` of a decision
    boundary (100× the worst-case summation-order discrepancy) is
    re-assigned by the exact SQL kernel — so the composed operator is
    bit-equal to the pure-SQL path on every input, fence hit or not
    (kernel-parity + forced-fence pins in tests/test_round11_pins.py).
    Serving plans are untouched: this runs at build/append time only."""
    cent = spark.createDataFrame(
        [(cid, vec) for cid, vec in enumerate(codebook)],
        "cid INT, cemb ARRAY<DOUBLE>",
    )
    # The SQL fallback's argmax history, because it keeps repeating: it
    # MUST be a streaming HashAggregate — its input is the
    # |corpus|×|codebook| crossJoin, the largest relation in the whole
    # engine (7.8e9 rows at 2M×3907). Round 10 dropped the embedding
    # array from the aggregation buffer, but max_by's STRUCT ordering
    # key still forced SortAggregate: Spark's hash aggregation needs
    # every buffer field mutable fixed-width, so the plan sorted the
    # entire crossJoin output — it merely FIT at sf10 (0.7 GB spill)
    # and was caught red-handed by the round-11 sf100 run (~65 GB of
    # temp_local sort spill before the box ran out of disk). The
    # (ccos, -cid) lexicographic order therefore packs into ONE BIGINT
    # (_ivf_assign_exact): ccos is 6dp-rounded so round(ccos·1e6) is an
    # exact order-isomorphic integer in the high bits, (2³²-1 − cid) in
    # the low 32 breaks ties toward the LOWER cid — plain max() over
    # longs. The repartition balances the stream side: a bin-packed
    # single-file scan idled 15 of 32 cores for the whole scoring pass.
    par = spark.sparkContext.defaultParallelism
    cent_n = F.broadcast(cent.withColumn("cnrm", _norm("cemb")))
    slim = vectors.select("vec_id", "embedding").repartition(par)
    # localCheckpoint: `scored` feeds BOTH the ok filter and the fenced
    # re-assign join — without it the BLAS kernel runs twice and the
    # repartitioned scan three times, and the ok/fenced split would
    # lean on deterministic recomputation through repartition().
    scored = slim.mapInPandas(
        _blas_assign_kernel(codebook, IVF_BLAS_FENCE),
        "vec_id long, cluster_id int, flagged boolean",
    ).localCheckpoint(eager=True)
    ok = scored.filter(~F.col("flagged")).select("vec_id", "cluster_id")
    fenced = _ivf_assign_exact(
        slim.join(
            scored.filter(F.col("flagged")).select("vec_id"), "vec_id"
        ),
        cent_n,
    )
    assign = ok.unionByName(fenced)
    return assign.join(
        vectors.select("vec_id", "embedding"), "vec_id"
    ).select("vec_id", "cluster_id", "embedding")


def probes_for(
    spark: SparkSession,
    sf_dir: str | None,
    queries: DataFrame,
    nprobe: int = IVF_NPROBE,
    cent: DataFrame | None = None,
) -> DataFrame:
    """(query_id, q_emb, cluster_id) for an ARBITRARY (query_id, q_emb)
    relation: each query's ``nprobe`` nearest inverted lists, by centroid
    cosine (deterministic tie-break). The CENTROID side broadcasts (it is
    nlist rows at any corpus size), so this scales with |queries| — the
    many-query serving shape needs probe selection with no
    query-set-proportional broadcast. ``cent`` overrides the dataset's
    shipped centroid relation (store-backed serving passes its frozen
    books)."""
    if cent is None:
        cent = _ivf_centroids(spark, sf_dir)
    q_scored = queries.crossJoin(F.broadcast(cent)).select(
        "query_id",
        "q_emb",
        "cid",
        F.round(_cosine("q_emb", "cemb"), 6).alias("qcos"),
    )
    probe_w = Window.partitionBy("query_id").orderBy(
        F.col("qcos").desc(), F.col("cid").asc()
    )
    return (
        q_scored.withColumn("pr", F.row_number().over(probe_w))
        .filter(F.col("pr") <= nprobe)
        .select("query_id", "q_emb", F.col("cid").alias("cluster_id"))
    )


# --- Product quantization (PQ) --------------------------------------------

#: PQ codebooks: LEARNED offline per corpus (tools/train_pq_codebooks.py,
#: Lloyd k-means per 8-dim subspace — the FAISS ``train()`` pattern, same
#: per-corpus artifact discipline as the IVF codebooks above). PQ is the
#: MEMORY side of the 100 TB ANN story: 64 float32s (256 B) per vector
#: compress to {PQ_M} 4-bit-ish codes plus one stored norm, so the coarse
#: scoring pass streams the whole corpus's codes from RAM; only the
#: {PQ_REFINE}-candidate pool per query ever touches raw vectors again
#: (asymmetric distance computation + exact re-rank, Jégou et al. 2011).
_PQ_ARTIFACT = os.path.join(os.path.dirname(__file__), "pq_codebooks.json")
with open(_PQ_ARTIFACT) as _pf:
    _PQ_META = json.load(_pf)
PQ_CODEBOOKS = _PQ_META["codebooks"]
PQ_M = _PQ_META["m"]
PQ_K = _PQ_META["k"]
PQ_DSUB = EMBED_DIM // PQ_M
#: candidates re-ranked with exact cosine per query (the recall/cost dial).
#: The pool scales with CORPUS SIZE (floor 128, 1/16th of the corpus —
#: the same FRACTION the floor represents at bench scale): a fixed pool
#: shrinks relative to the corpus and recall decays with growth (measured
#: 0.94 → 0.68 from sf0.1 to the 10× sf1 corpus at a fixed 128; corpus-
#: proportional refine restores 0.93 at sf1). Refine work stays linear in
#: corpus with a tiny constant — the same complexity class as the ADC
#: scan it follows, so the scaling is honest, not a bench trick. At the
#: oracle scales (sf0.01/sf0.1) the floor binds, so the static oracle SQL
#: embeds the same 128 the Spark plan uses there.
PQ_REFINE = 128
PQ_REFINE_DIVISOR = 16


def _pq_refine(n_vectors: int) -> int:
    """Corpus-proportional refine pool (floor ``PQ_REFINE``). Wired into
    every ADC refine filter; ``n_vectors`` comes from a parquet
    metadata count of the codes/store relation (no data scan). At the
    oracle scales the floor binds (sf0.01: 500/16=31, sf0.1: 2000/16=125,
    both < 128), so the static 128 in the DuckDB oracle SQL stays exact;
    beyond ~2048 vectors the pool grows with the corpus, which is what
    restored sf1 recall 0.68 → 0.93 (BENCH_NOTES.md round-4 table)."""
    return max(PQ_REFINE, n_vectors // PQ_REFINE_DIVISOR)


def _pq_books(sf_dir: str) -> list[list[list[float]]]:
    base = os.path.basename(os.path.normpath(sf_dir))
    return PQ_CODEBOOKS.get(base, PQ_CODEBOOKS["default"])


def _pq_cb_sql(books) -> str:
    """The full codebook as ONE nested Spark-SQL array literal —
    referenced a single time per expression tree (the round-2 codegen
    lesson: higher-order functions over one literal, never unrolled
    per-centroid expression forests)."""
    return (
        "array("
        + ", ".join(
            "array("
            + ", ".join(
                "array(" + ", ".join(f"{v!r}D" for v in cent) + ")"
                for cent in book
            )
            + ")"
            for book in books
        )
        + ")"
    )


def pq_encode_of(vectors: DataFrame, books, with_qerr: bool = False) -> DataFrame:
    """PQ encoding over ANY (vec_id, embedding) relation with explicit
    codebooks — the encode kernel behind ``similarity.pq_codes_table``,
    reused by the incremental vector index so appends encode against
    FROZEN books (codes from two training runs are not comparable).

    ``with_qerr`` adds the per-vector quantization error (sum over
    subspaces of the winning centroid's squared L2 distance — the
    training objective of the codebooks). It is computed from the SAME
    ``_dists`` arrays the encoding already materializes, so the extra
    column costs one array_min fold, no second distance pass; the
    incremental store aggregates it per delivery for codebook-drift
    detection."""
    cb = _pq_cb_sql(books)
    m = len(books)
    k = len(books[0])
    dsub = EMBED_DIM // m
    dists = (
        f"transform(sequence(0, {m - 1}), m -> "
        f"transform(sequence(0, {k - 1}), c -> "
        f"round(aggregate(sequence(1, {dsub}), cast(0.0 as double), "
        f"(acc, i) -> acc + pow(cast(element_at(embedding, m * {dsub} + i) as double) "
        f"- element_at(element_at(element_at({cb}, m + 1), c + 1), i), 2)), 6)))"
    )
    codes = (
        "transform(_dists, d -> "
        "cast(array_position(d, array_min(d)) - 1 as int))"
    )
    norm2 = (
        f"aggregate(sequence(0, {m - 1}), cast(0.0 as double), "
        f"(acc, m) -> acc + aggregate("
        f"element_at(element_at({cb}, m + 1), element_at(codes, m + 1) + 1), "
        f"cast(0.0 as double), (a, x) -> a + x * x))"
    )
    out = (
        vectors.withColumn("_dists", F.expr(dists))
        .withColumn("codes", F.expr(codes))
        .withColumn("approx_norm2", F.expr(norm2))
    )
    if with_qerr:
        out = out.withColumn(
            "qerr",
            F.expr(
                "aggregate(_dists, cast(0.0 as double), "
                "(acc, d) -> acc + array_min(d))"
            ),
        )
        return out.select("vec_id", "codes", "approx_norm2", "qerr")
    return out.select("vec_id", "codes", "approx_norm2")


# ---------------------------------------------------------------------------
# SQ16 pair pre-filter — lossless candidate thinning (VERDICT r10 task #1)
# ---------------------------------------------------------------------------
# For PAIR-generating operators (SemDeDup within-cluster scoring, the
# embedding store's banded candidate verify), the raw embeddings are
# the heavy payload: they ride the candidate join, the cross-band
# distinct, and every spill in between. This pre-filter lets the pair
# relation carry an int16 SCALAR-QUANTIZED sketch instead (per-vector
# scale s = 32767/max|x_i|, so reconstruction error is ~1e-4 of the
# norm), plus three doubles, and thins candidates with a RIGOROUS
# Cauchy–Schwarz bound before anything touches raw vectors:
#
#   |<x,y> − <rx,ry>| = |<x−rx, y> + <rx, y−ry>| ≤ e_x·‖y‖ + ‖rx‖·e_y
#
# where rx = q/s is the decoded sketch and e_x = ‖x−rx‖ is computed
# EXACTLY at encode time and stored. <rx,ry> itself is exact integer
# arithmetic (Σ qa_i·qb_i as BIGINT) scaled once — so a pair is
# dropped ONLY when even the most favorable true dot cannot reach the
# exact filter's threshold. Measured at sf0.1: margin ≈ 2e-4 on a
# threshold of 0.40 against a within-cluster cosine distribution whose
# 99.8th percentile is below it — survivors ≈ the true dups. PQ codes
# were tried first and CANNOT work here: the 16×4-bit books reconstruct
# unit vectors to e ≈ 0.57, so their rigorous margin (~1.0) never
# filters anything at a 0.40 threshold.

#: slack for call sites that threshold ROUND(cos, 4): round(c,4) ≥ T
#: ⟺ c ≥ T − 5e-5, plus a belt-and-braces float-eval epsilon.
_PAIR_ROUND4_SLACK = 0.00005 + 1e-9

#: columns of the sketch relation (besides vec_id) — what the pair
#: join sides carry instead of the embedding
SQ16_COLS = ("q16", "s16", "e16", "rn16", "pnorm")


def sq16_meta_of(vectors: DataFrame) -> DataFrame:
    """Per-vector pre-filter sketch over any (vec_id, embedding)
    relation: ``q16`` (int16 quantized components), ``s16`` (the
    per-vector scale), ``e16`` = ‖x − q/s‖ (EXACT reconstruction
    error — computed from the stored codes, so clamping or any rounding
    quirk is priced in, never assumed), ``rn16`` = ‖q/s‖, ``pnorm`` =
    ‖x‖. Fixed-width columns only (~150 B/vector vs ~280 B for the raw
    float array, and no 64-double fold downstream)."""
    s = F.expr(
        "32767.0 / greatest(aggregate(embedding, cast(0.0 as double), "
        "(m, x) -> greatest(m, abs(cast(x as double)))), cast(1e-30 as double))"
    )
    q = F.expr(
        "transform(embedding, x -> cast(least(greatest("
        "round(cast(x as double) * _s), -32767.0), 32767.0) as smallint))"
    )
    e = F.expr(
        "sqrt(aggregate(zip_with(embedding, _q, (x, c) -> "
        "pow(cast(x as double) - cast(c as double) / _s, 2)), "
        "cast(0.0 as double), (a, t) -> a + t))"
    )
    rn = F.expr(
        "sqrt(aggregate(_q, cast(0 as bigint), "
        "(a, c) -> a + cast(c as bigint) * c)) / _s"
    )
    return (
        vectors.withColumn("_s", s)
        .withColumn("_q", q)
        .select(
            "vec_id",
            F.col("_q").alias("q16"),
            F.col("_s").alias("s16"),
            e.alias("e16"),
            rn.alias("rn16"),
            _norm("embedding").alias("pnorm"),
        )
    )


def sq16_pair_keep_col(threshold: float) -> Column:
    """Boolean keep-column for a joined pair relation carrying
    ``{q16,s16,e16,rn16,pnorm}_a`` and ``..._b``: True unless the upper
    bound on the true dot provably misses ``round(cos, 4) ≥ threshold``.
    Dropped pairs CANNOT satisfy the exact filter; kept pairs still go
    through it — the pre-filter only thins the relation that has to
    carry raw embeddings. The sketch dot is exact integer arithmetic
    (max 64 · 32767² ≈ 6.9e13 < 2⁶³, no overflow under ANSI mode)."""
    sdot = F.expr(
        "cast(aggregate(zip_with(q16_a, q16_b, (x, y) -> "
        "cast(x as bigint) * y), cast(0 as bigint), (a, t) -> a + t) "
        "as double) / (s16_a * s16_b)"
    )
    bound = (
        sdot
        + F.col("e16_a") * F.col("pnorm_b")
        + F.col("rn16_a") * F.col("e16_b")
    )
    return bound >= (
        F.lit(threshold - _PAIR_ROUND4_SLACK)
        * F.col("pnorm_a")
        * F.col("pnorm_b")
    )


__all__ = [
    "EMBED_DIM",
    "IVF_CODEBOOKS",
    "IVF_NLIST",
    "IVF_NPROBE",
    "IVF_PQ_NPROBE",
    "IVF_BLAS_FENCE",
    "PQ_CODEBOOKS",
    "PQ_M",
    "PQ_K",
    "PQ_DSUB",
    "PQ_REFINE",
    "PQ_REFINE_DIVISOR",
    "ivf_assign_of",
    "pq_encode_of",
    "probes_for",
    "SQ16_COLS",
    "sq16_meta_of",
    "sq16_pair_keep_col",
]
