"""Training-data pipeline operators over ``documents``.

The four stages every large-scale pretraining data pipeline runs after
cleaning/dedup (complementing analytics/dedup.py and analytics/text.py):

* Deterministic split   — hash-bucket each doc into train/valid/test. No
  shuffle, no RNG state: the assignment is a pure function of doc_id, so
  it is stable across re-runs, cluster sizes, and partitionings (the
  property that matters when the corpus is re-materialized at 100 TB).
* Decontamination       — find test-split documents sharing enough word
  shingles with any train-split document (benchmark-leakage check). Same
  inverted-index shape as the n-gram Jaccard join: explode shingles, join
  test→train ON shingle, count per pair — never a doc×doc product.
  PRODUCTION DEFAULT: the CAPPED variant (``q_decontamination_capped``,
  registry ``decontamination_capped``) — it drops shingles above the
  ``DECON_MAX_DF`` document frequency before the pair join, bounding
  every shuffle key's work at DF² (the GPT-3-style common-n-gram drop;
  stop-shingle matches are noise, not leakage signal). The uncapped
  entry (``decontamination``) is the ORACLE-FAITHFUL twin: its skew is
  bounded only by the corpus's natural stop-shingle frequency
  (data-dependent — 31s at sf10), so run it for exact-semantics
  verification, not at scale.
* Length percentiles    — exact interpolated quantiles of doc length per
  language (the stats that drive truncation/packing decisions). Built-in
  ``percentile`` = one pass, map-side partial aggregation.
* Balanced sampling     — top-k docs per language by a deterministic hash
  order: reproducible class-balanced subsample. Window row_number per
  language; at scale the partial top-k is pushed map-side by the rank
  filter (no full sort, only a k-row heap per partition per key).

All values are oracle-checked against DuckDB re-computations (portable
md5-prefix hashes from hashing.py on both sides).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from ph_ee_nats_importer_rdbms_spark.analytics.dedup import (
    _DUCK_SHINGLES,
    shingle_sets,
)
from ph_ee_nats_importer_rdbms_spark.analytics.hashing import duck_h32, spark_h32
from ph_ee_nats_importer_rdbms_spark.sources.files import load_table

#: train/valid/test ≈ 80/10/10 by hash bucket.
SPLIT_TRAIN_PCT = 80
SPLIT_VALID_PCT = 90
SPLIT_SALT = "split:"
#: test↔train shingle-overlap threshold flagged as contamination.
DECONTAMINATION_MIN_OVERLAP = 5
#: per-language sample size.
BALANCED_SAMPLE_K = 20
SAMPLE_SALT = "sample:"


# ---------------------------------------------------------------------------
# Deterministic train/valid/test split
# ---------------------------------------------------------------------------


_DUCK_SALTED = f"'{SPLIT_SALT}' || CAST(doc_id AS VARCHAR)"


def _split_bucket_duck() -> str:
    return f"{duck_h32(_DUCK_SALTED)} % 100"


def split_column() -> F.Column:
    """train/valid/test label as a pure function of doc_id."""
    return split_of("doc_id")


def q_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, split) assignment for the whole corpus — narrow projection,
    zero shuffle, embarrassingly parallel at any scale."""
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", split_column().alias("split"))


TRAIN_TEST_SPLIT_ORACLE = f"""
SELECT doc_id,
       CASE WHEN {_split_bucket_duck()} < {SPLIT_TRAIN_PCT} THEN 'train'
            WHEN {_split_bucket_duck()} < {SPLIT_VALID_PCT} THEN 'valid'
            ELSE 'test' END AS split
FROM documents
"""


# ---------------------------------------------------------------------------
# Test-set decontamination (shingle overlap against the train split)
# ---------------------------------------------------------------------------


def q_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(test_doc_id, train_doc_id, overlap) pairs where a test doc shares
    ≥ DECONTAMINATION_MIN_OVERLAP distinct word shingles with a train doc.

    Inverted-index join: explode the (already staged) distinct-shingle
    sets, split-label each side from doc_id, join test→train on the
    shingle itself, then count shingles per (test, train) pair. Work is
    Σ_shingle |test_docs(s)|·|train_docs(s)| — linear in true overlap, not
    corpus² (the web-scale decontamination shape, e.g. GPT-3 App. C)."""
    sh = shingle_sets(spark, sf_dir)
    labeled = sh.select(
        "doc_id", split_column().alias("split"), F.explode("shingles").alias("shingle")
    )
    test = labeled.filter(F.col("split") == "test").select(
        F.col("doc_id").alias("test_doc_id"), "shingle"
    )
    train = labeled.filter(F.col("split") == "train").select(
        F.col("doc_id").alias("train_doc_id"), "shingle"
    )
    pairs = test.join(train, on="shingle").groupBy("test_doc_id", "train_doc_id").agg(
        F.count("*").alias("overlap")
    )
    return pairs.filter(F.col("overlap") >= DECONTAMINATION_MIN_OVERLAP)


DECONTAMINATION_ORACLE = f"""
WITH sh AS ({_DUCK_SHINGLES}),
labeled AS (
  SELECT doc_id,
         CASE WHEN {_split_bucket_duck()} < {SPLIT_TRAIN_PCT} THEN 'train'
              WHEN {_split_bucket_duck()} < {SPLIT_VALID_PCT} THEN 'valid'
              ELSE 'test' END AS split,
         unnest(shingles) AS shingle
  FROM sh
)
SELECT t.doc_id AS test_doc_id, tr.doc_id AS train_doc_id,
       CAST(count(*) AS BIGINT) AS overlap
FROM labeled t JOIN labeled tr USING (shingle)
WHERE t.split = 'test' AND tr.split = 'train'
GROUP BY 1, 2
HAVING count(*) >= {DECONTAMINATION_MIN_OVERLAP}
"""


#: stop-shingle cap: shingles present in more than this many documents are
#: dropped before the decontamination join. At 100 TB the uncapped join's
#: worst shuffle key is the corpus's hottest stop-shingle ("in the of"-
#: style), whose per-key work is |test_docs(s)|·|train_docs(s)| — the cap
#: bounds that product at DECON_MAX_DF² per key, which is what GPT-3-style
#: decontamination runs do (common n-grams carry no leakage signal anyway:
#: a match on a stop-shingle is noise, not benchmark contamination). 4
#: bites on the bench corpora (sf0.01: 151 of ~16k shingles drop).
DECON_MAX_DF = 4


def q_decontamination_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """:func:`q_decontamination` with the production stop-shingle cap:
    shingles whose corpus-wide document frequency exceeds ``DECON_MAX_DF``
    are dropped before the inverted-index join.

    Scale shape: one extra map-side-combinable count per shingle (the
    shingle sets are distinct per doc, so ``count(*)`` IS the document
    frequency), a semi join of the exploded relation against the surviving
    shingles, then the uncapped plan. Every shuffle key in the pair join
    now carries ≤ DECON_MAX_DF rows per side — the hot-key bound is a
    constant, asserted in tests/test_analytics.py.

    The exploded relation feeds BOTH the DF aggregate and the semi-join
    probe; it is deliberately NOT checkpointed — re-exploding from the
    memoized shingle arrays is cheaper than materializing the ~200×-larger
    exploded relation into the block manager (measured 1.6s vs 4.1s at
    sf0.1).

    r13 (guide §2.3/§2.4): the pair join is a COLLECT-THEN-EXPLODE over
    the capped groups instead of a test⋈train self-join. The old shape
    referenced ``capped`` twice, so the plan carried FOUR explode passes
    (the DF aggregate and the semi-join probe, once per side) and built
    the rare-shingle aggregate twice; now the probe side explodes once,
    valid-split rows drop before the semi join (they can never pair),
    and one per-shingle aggregate collects the test/train doc lists —
    each group is ≤ DECON_MAX_DF rows by the cap, so the collect is
    skew-bounded by construction (the DF count still runs BEFORE any
    list materializes, preserving the 100 TB hot-key guard). Per
    shingle, exploding test_docs × train_docs yields exactly the rows
    the self-join produced — the pair counts are bit-identical
    (oracle-checked at sf0.001/0.01/0.1)."""
    sh = shingle_sets(spark, sf_dir)
    labeled = sh.select(
        "doc_id", split_column().alias("split"), F.explode("shingles").alias("shingle")
    )
    rare = (
        labeled.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= DECON_MAX_DF)
        .select("shingle")
    )
    capped = labeled.filter(F.col("split") != "valid").join(
        rare, "shingle", "leftsemi"
    )
    per_shingle = capped.groupBy("shingle").agg(
        F.collect_list(
            F.when(F.col("split") == "test", F.col("doc_id"))
        ).alias("test_docs"),
        F.collect_list(
            F.when(F.col("split") == "train", F.col("doc_id"))
        ).alias("train_docs"),
    )
    pairs = (
        per_shingle.select(
            F.explode("test_docs").alias("test_doc_id"), "train_docs"
        )
        .select("test_doc_id", F.explode("train_docs").alias("train_doc_id"))
        .groupBy("test_doc_id", "train_doc_id")
        .agg(F.count(F.lit(1)).alias("overlap"))
    )
    return pairs.filter(F.col("overlap") >= DECONTAMINATION_MIN_OVERLAP)


DECONTAMINATION_CAPPED_ORACLE = f"""
WITH sh AS ({_DUCK_SHINGLES}),
labeled AS (
  SELECT doc_id,
         CASE WHEN {_split_bucket_duck()} < {SPLIT_TRAIN_PCT} THEN 'train'
              WHEN {_split_bucket_duck()} < {SPLIT_VALID_PCT} THEN 'valid'
              ELSE 'test' END AS split,
         unnest(shingles) AS shingle
  FROM sh
),
rare AS (
  SELECT shingle FROM labeled GROUP BY shingle
  HAVING count(*) <= {DECON_MAX_DF}
),
capped AS (
  SELECT l.* FROM labeled l JOIN rare USING (shingle)
)
SELECT t.doc_id AS test_doc_id, tr.doc_id AS train_doc_id,
       CAST(count(*) AS BIGINT) AS overlap
FROM capped t JOIN capped tr USING (shingle)
WHERE t.split = 'test' AND tr.split = 'train'
GROUP BY 1, 2
HAVING count(*) >= {DECONTAMINATION_MIN_OVERLAP}
"""


# ---------------------------------------------------------------------------
# Fuzzy decontamination (MinHash near-dup overlap across the split)
# ---------------------------------------------------------------------------


def split_of(col: str) -> F.Column:
    """train/valid/test label as a pure function of ANY doc-id column —
    the generalization of :func:`split_column` that lets relations
    carrying doc ids under other names (pair lists) label themselves
    with ZERO joins."""
    salted = f"concat('{SPLIT_SALT}', CAST({col} AS STRING))"
    bucket = F.expr(f"{spark_h32(salted)} % 100")
    return (
        F.when(bucket < SPLIT_TRAIN_PCT, F.lit("train"))
        .when(bucket < SPLIT_VALID_PCT, F.lit("valid"))
        .otherwise(F.lit("test"))
    )


def _duck_split_case(col: str) -> str:
    salted = f"'{SPLIT_SALT}' || CAST({col} AS VARCHAR)"
    bucket = f"{duck_h32(salted)} % 100"
    return (
        f"CASE WHEN {bucket} < {SPLIT_TRAIN_PCT} THEN 'train' "
        f"WHEN {bucket} < {SPLIT_VALID_PCT} THEN 'valid' "
        f"ELSE 'test' END"
    )


def q_decontamination_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(test_doc_id, train_doc_id, jaccard): test-split documents that
    are MinHash-LSH NEAR-DUPLICATES of a train-split document — the
    fuzzy complement of the exact-shingle-overlap check. Exact n-gram
    decontamination misses lightly-edited benchmark leakage (reworded
    prompts, shuffled fields); the verified near-dup pair list catches
    those at ``JACCARD_THRESHOLD``, and large-scale pipelines run BOTH
    screens.

    Scale shape: the staged near-dup pair list (the dedup pipeline's
    canonical artifact — already bucket-joined, verified, and memoized
    by ``q_minhash_dups``) gets split labels as PURE FUNCTIONS of its
    own id columns (``split_of``), so this is a map-only pass over an
    output-sized relation: zero joins, zero shuffles, nothing
    corpus-sized."""
    from ph_ee_nats_importer_rdbms_spark.analytics.dedup import q_minhash_dups

    lab = (
        q_minhash_dups(spark, sf_dir)
        .withColumn("split_a", split_of("doc_a"))
        .withColumn("split_b", split_of("doc_b"))
    )
    fwd = lab.filter(
        (F.col("split_a") == "test") & (F.col("split_b") == "train")
    ).select(
        F.col("doc_a").alias("test_doc_id"),
        F.col("doc_b").alias("train_doc_id"),
        "jaccard",
    )
    rev = lab.filter(
        (F.col("split_a") == "train") & (F.col("split_b") == "test")
    ).select(
        F.col("doc_b").alias("test_doc_id"),
        F.col("doc_a").alias("train_doc_id"),
        "jaccard",
    )
    return fwd.unionByName(rev)


def _decontamination_fuzzy_oracle() -> str:
    from ph_ee_nats_importer_rdbms_spark.analytics.dedup import (
        MINHASH_DUPS_ORACLE,
    )

    return f"""
WITH pairs AS ({MINHASH_DUPS_ORACLE}),
lab AS (
  SELECT doc_a, doc_b, jaccard,
         {_duck_split_case("doc_a")} AS split_a,
         {_duck_split_case("doc_b")} AS split_b
  FROM pairs
)
SELECT doc_a AS test_doc_id, doc_b AS train_doc_id, jaccard
FROM lab WHERE split_a = 'test' AND split_b = 'train'
UNION ALL
SELECT doc_b AS test_doc_id, doc_a AS train_doc_id, jaccard
FROM lab WHERE split_a = 'train' AND split_b = 'test'
"""


DECONTAMINATION_FUZZY_ORACLE = _decontamination_fuzzy_oracle()


# ---------------------------------------------------------------------------
# Per-language exact length percentiles
# ---------------------------------------------------------------------------


def q_length_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated p50/p90/p99 of n_chars per language. Spark
    ``percentile`` and DuckDB ``quantile_cont`` share the linear-
    interpolation definition; rounding absorbs float formatting."""
    d = load_table(spark, sf_dir, "documents")
    pct = F.expr("percentile(n_chars, array(0.5, 0.9, 0.99))")
    return (
        d.groupBy("lang")
        .agg(pct.alias("p"))
        .select(
            "lang",
            F.round(F.col("p")[0], 2).alias("p50"),
            F.round(F.col("p")[1], 2).alias("p90"),
            F.round(F.col("p")[2], 2).alias("p99"),
        )
    )


#: percentile_approx accuracy knob: error bound is 1/accuracy of the
#: rank, i.e. ±0.01% of rows at 10000.
APPROX_PCT_ACCURACY = 10000


def q_length_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB twin of :func:`q_length_percentiles`: exact
    ``percentile`` buffers every distinct value per group (memory grows
    with group cardinality — fine at bench scale, wrong at corpus
    scale), while ``percentile_approx`` folds a bounded Greenwald-Khanna
    sketch: O(accuracy·log n) state per group, map-side mergeable, rank
    error ≤ n/accuracy. Not oracle-registered — DuckDB has no matching
    sketch, so the gate is a pytest bound against the exact operator
    (|approx − exact| within the documented rank tolerance)."""
    d = load_table(spark, sf_dir, "documents")
    pct = F.expr(
        "percentile_approx(n_chars, array(0.5, 0.9, 0.99), "
        f"{APPROX_PCT_ACCURACY})"
    )
    return (
        d.groupBy("lang")
        .agg(pct.alias("p"))
        .select(
            "lang",
            F.col("p")[0].alias("p50"),
            F.col("p")[1].alias("p90"),
            F.col("p")[2].alias("p99"),
        )
    )


LENGTH_PERCENTILES_ORACLE = """
SELECT lang,
       round(quantile_cont(n_chars, 0.5), 2) AS p50,
       round(quantile_cont(n_chars, 0.9), 2) AS p90,
       round(quantile_cont(n_chars, 0.99), 2) AS p99
FROM documents
GROUP BY lang
"""


#: the percentile targets the sketch gate verifies, as (label, quantile)
_APPROX_PCTS = ((0.5, "p50"), (0.9, "p90"), (0.99, "p99"))


def q_length_percentiles_approx_check(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Deterministic DRIVER GATE for the GK sketch (VERDICT r8 task #2).

    ``percentile_approx``'s output depends on sketch compaction order, so
    its VALUES have no DuckDB twin — but its GUARANTEE is deterministic:
    each returned value is an actual corpus value whose rank is within
    n/accuracy (+1 interpolation slack) of the target rank. This entry
    verifies that guarantee DISTRIBUTED and emits the verdict booleans,
    which the oracle asserts must all be TRUE — so rows+schema+hash are
    fully checkable and a sketch-bound violation turns the driver row
    red. The raw sketch values remain available via
    :func:`q_length_percentiles_approx`.

    Shape: one corpus pass for the sketch (bounded mergeable state), one
    corpus pass for the rank check — the sketch output (#langs × 3 rows)
    is broadcast back against the doc lengths, so the verification is a
    map-side join + aggregate, no corpus shuffle.
    """
    from pyspark.sql.functions import broadcast

    d = load_table(spark, sf_dir, "documents").select("lang", "n_chars")
    pct = F.expr(
        "percentile_approx(n_chars, array(0.5, 0.9, 0.99), "
        f"{APPROX_PCT_ACCURACY})"
    )
    sk = d.groupBy("lang").agg(
        pct.alias("p"), F.count(F.lit(1)).alias("n_docs")
    )
    per_pct = sk.select(
        "lang",
        "n_docs",
        F.explode(
            F.map_from_arrays(
                F.array(*[F.lit(q) for q, _ in _APPROX_PCTS]),
                F.col("p"),
            )
        ).alias("pct", "v"),
    )
    return rank_check(d, per_pct)


def rank_check(d: DataFrame, per_pct: DataFrame) -> DataFrame:
    """Distributed GK-guarantee verification: for each claimed percentile
    value ``v`` in ``per_pct`` (lang, n_docs, pct, v), count its rank
    window over ``d`` (lang, n_chars) and emit whether the window is
    within n/accuracy (+1) of the target rank and whether ``v`` is an
    actual corpus value. ``per_pct`` is #langs × #pcts rows — broadcast."""
    from pyspark.sql.functions import broadcast

    joined = d.join(broadcast(per_pct), "lang")
    ranks = joined.groupBy("lang", "pct", "v", "n_docs").agg(
        F.sum((F.col("n_chars") < F.col("v")).cast("long")).alias("lo"),
        F.sum((F.col("n_chars") <= F.col("v")).cast("long")).alias("hi_cnt"),
        F.max((F.col("n_chars") == F.col("v")).cast("int")).alias("present"),
    )
    target = F.col("pct") * (F.col("n_docs") - 1)
    tol = F.col("n_docs") / F.lit(APPROX_PCT_ACCURACY) + 1
    hi = F.col("hi_cnt") - 1  # value occupies ranks [lo, hi_cnt-1]
    dist = F.when(
        (F.col("lo") <= target) & (target <= hi), F.lit(0.0)
    ).otherwise(F.least(F.abs(F.col("lo") - target), F.abs(hi - target)))
    return ranks.select(
        "lang",
        F.col("pct").cast("double").alias("pct"),
        F.col("n_docs").cast("long").alias("n_docs"),
        (dist <= tol).alias("within_rank_bound"),
        (F.col("present") == 1).alias("is_corpus_value"),
    )


LENGTH_PERCENTILES_APPROX_CHECK_ORACLE = """
SELECT lang,
       CAST(pct AS DOUBLE) AS pct,
       CAST(n_docs AS BIGINT) AS n_docs,
       TRUE AS within_rank_bound,
       TRUE AS is_corpus_value
FROM (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang)
CROSS JOIN (VALUES (0.5), (0.9), (0.99)) AS p(pct)
"""


# ---------------------------------------------------------------------------
# Deterministic language-balanced sample
# ---------------------------------------------------------------------------


def q_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-BALANCED_SAMPLE_K docs per language in deterministic hash order
    (reproducible 'random' subsample, equal quota per class)."""
    d = load_table(spark, sf_dir, "documents")
    h = F.expr(spark_h32(f"concat('{SAMPLE_SALT}', CAST(doc_id AS STRING))"))
    w = Window.partitionBy("lang").orderBy(h.asc(), F.col("doc_id").asc())
    return (
        d.select("doc_id", "lang", F.row_number().over(w).alias("rank"))
        .filter(F.col("rank") <= BALANCED_SAMPLE_K)
    )


BALANCED_SAMPLE_ORACLE = f"""
SELECT doc_id, lang, rank FROM (
  SELECT doc_id, lang,
         CAST(row_number() OVER (
           PARTITION BY lang
           ORDER BY {duck_h32(f"'{SAMPLE_SALT}' || CAST(doc_id AS VARCHAR)")}, doc_id
         ) AS INT) AS rank
  FROM documents
)
WHERE rank <= {BALANCED_SAMPLE_K}
"""


# ---------------------------------------------------------------------------
# Sequence packing (context-window filling)
# ---------------------------------------------------------------------------

#: tokens per packed training sequence (the context-window budget)
PACK_CAPACITY = 256
#: deterministic shard fan-out: packing is shard-local in every real
#: pipeline — globally optimal bin packing is NP-hard and pointless when
#: each shard holds millions of tokens; per-shard greedy loses a few
#: percent utilization and parallelizes perfectly. The shard count is a
#: FIXED semantic constant (not the cluster's partition count) so the
#: assignment is reproducible anywhere.
PACK_SHARDS = 8


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into fixed-capacity training sequences: each doc is
    hashed to one of ``PACK_SHARDS`` shards, docs in a shard are ordered by
    (n_tokens desc, doc_id) and folded greedily — next-fit-decreasing: a
    doc that would overflow the open sequence closes it and starts the
    next (a doc longer than the capacity gets a sequence of its own).

    Scale shape: one map to (doc, shard, n_tokens), one shuffle on the
    shard key, then an Arrow-batched ``applyInPandas`` per shard — the
    greedy fold is inherently sequential PER SHARD, which is exactly the
    unit a real packing job runs on one worker; shards scale out. The
    DuckDB oracle replays the identical fold as a recursive CTE, so the
    assignment is engine-checked row-for-row, not rows-only.

    Staged per dataset (``train`` domain): packing runs once per corpus
    snapshot, immediately before training — the assignment is an ingest
    artifact, not a per-query computation."""
    from ph_ee_nats_importer_rdbms_spark.plans import staging

    return staging.load_memoized(
        spark,
        sf_dir,
        "packed_sequences",
        lambda: _pack_sequences_build(spark, sf_dir),
        domain="train",
    )


def _pack_sequences_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pack_of(load_table(spark, sf_dir, "documents"))


def pack_of(d: DataFrame) -> DataFrame:
    """:func:`q_pack_sequences`'s transform as a relation function —
    applied to one delivery at a time by the append-only pack store
    (analytics/incremental_training.py). seq_ids start at 0 per shard;
    the store shifts them past its committed high-water mark."""
    import pandas as pd

    docs = d.select(
        F.expr(
            f"cast({spark_h32('cast(doc_id as string)')} % {PACK_SHARDS} as int)"
        ).alias("shard_id"),
        "doc_id",
        F.size(
            F.split(F.trim(F.lower(F.col("text"))), r"\s+")
        ).alias("n_tokens"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["n_tokens", "doc_id"], ascending=[False, True]
        ).reset_index(drop=True)
        seq_ids = []
        seq, load = 0, 0
        for n in pdf["n_tokens"]:
            if load > 0 and load + n > PACK_CAPACITY:
                seq += 1
                load = 0
            seq_ids.append(seq)
            load += int(n)
        return pdf.assign(seq_id=seq_ids)[
            ["shard_id", "doc_id", "n_tokens", "seq_id"]
        ]

    return docs.groupBy("shard_id").applyInPandas(
        pack, "shard_id int, doc_id bigint, n_tokens int, seq_id int"
    )


PACK_SEQUENCES_ORACLE = rf"""
WITH RECURSIVE t AS (
  SELECT CAST({duck_h32("CAST(doc_id AS VARCHAR)")} % {PACK_SHARDS} AS INT)
           AS shard_id,
         doc_id,
         CAST(len(regexp_split_to_array(trim(lower(text)), '\s+')) AS INT)
           AS n_tokens
  FROM documents
),
ordered AS (
  SELECT shard_id, doc_id, n_tokens,
         row_number() OVER (PARTITION BY shard_id
                            ORDER BY n_tokens DESC, doc_id ASC) AS rn
  FROM t
),
rec(shard_id, rn, doc_id, n_tokens, seq_id, load) AS (
  SELECT shard_id, rn, doc_id, n_tokens, 0, n_tokens
  FROM ordered WHERE rn = 1
  UNION ALL
  SELECT d.shard_id, d.rn, d.doc_id, d.n_tokens,
         CASE WHEN r.load + d.n_tokens > {PACK_CAPACITY}
              THEN r.seq_id + 1 ELSE r.seq_id END,
         CASE WHEN r.load + d.n_tokens > {PACK_CAPACITY}
              THEN d.n_tokens ELSE r.load + d.n_tokens END
  FROM ordered d JOIN rec r
    ON d.shard_id = r.shard_id AND d.rn = r.rn + 1
)
SELECT shard_id, doc_id, n_tokens, seq_id FROM rec
"""


# ---------------------------------------------------------------------------
# Source-weighted mixture sampling (data mixing)
# ---------------------------------------------------------------------------

#: sampling rates in basis points, assigned to a source by its numeric
#: suffix mod 4 — stands in for the per-source mixture config an LLM
#: pretraining run declares (e.g. upweight curated sources, downweight
#: crawl tails).
MIXTURE_TIERS_BP = [10000, 7500, 5000, 2500]
MIXTURE_SALT = "mix:"

_MIX_TIER_SQL = (
    "CASE TRY_CAST(regexp_extract(source, '([0-9]+)$', 1) AS BIGINT) % 4 "
    f"WHEN 0 THEN {MIXTURE_TIERS_BP[0]} WHEN 1 THEN {MIXTURE_TIERS_BP[1]} "
    f"WHEN 2 THEN {MIXTURE_TIERS_BP[2]} WHEN 3 THEN {MIXTURE_TIERS_BP[3]} "
    f"ELSE {MIXTURE_TIERS_BP[0]} END"
)


def q_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic source-weighted corpus thinning — the "data mixing"
    stage that turns per-source weights into a training subsample.

    A doc is kept iff h32(mix:doc_id) % 10000 < its source's rate, so the
    whole stage is a map-only filter: no shuffle, no RNG state, stable
    under re-runs, repartitioning, and cluster size — at 100 TB it is a
    single embarrassingly-parallel scan with the filter and the two-column
    projection pushed to parquet. Because the per-doc hash is fixed,
    samples nest: raising a source's rate strictly grows its sample
    (adding data never churns what an earlier run already selected —
    the property that keeps tokenized shards reusable across mixture
    revisions). The rate is computed inline from the source name here;
    a production run would broadcast-join a config dimension instead,
    which changes nothing about the plan shape (broadcast, still no
    shuffle of the fact side).
    """
    d = load_table(spark, sf_dir, "documents")
    keep = (
        F.expr(spark_h32(f"concat('{MIXTURE_SALT}', CAST(doc_id AS STRING))")) % 10000
        < F.expr(_MIX_TIER_SQL)
    )
    return d.filter(keep).select(
        "doc_id", "source", F.expr(_MIX_TIER_SQL).alias("rate_bp")
    )


MIXTURE_SAMPLE_ORACLE = f"""
SELECT doc_id, source, CAST({_MIX_TIER_SQL} AS BIGINT) AS rate_bp
FROM documents
WHERE {duck_h32(f"'{MIXTURE_SALT}' || CAST(doc_id AS VARCHAR)")} % 10000
      < {_MIX_TIER_SQL}
"""


# ---------------------------------------------------------------------------
# Quality-weighted importance sampling (classifier-score thinning)
# ---------------------------------------------------------------------------

#: exponent sharpening the quality weight into a keep probability —
#: p(keep) = quality_score², the FineWeb-edu/DCLM-style move of trusting
#: the scorer more at the extremes (a 0.9 doc keeps at 81%, a 0.5 doc at
#: 25%) without a hard threshold's cliff.
IMPORTANCE_SALT = "imp:"


def q_importance_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic quality-weighted corpus thinning: keep a doc iff
    h32(imp:doc_id) % 10000 < floor(quality_score² · 10000).

    Same map-only hash-Bernoulli shape as :func:`q_mixture_sample` — no
    shuffle, no RNG state, stable under re-runs and repartitioning — but
    the keep probability is PER-DOCUMENT, driven by the (map-only,
    oracle-checked) quality score instead of a per-source config. Samples
    nest across scorer revisions exactly like mixture samples nest across
    weight revisions: a doc whose score rises is strictly more likely to
    stay kept, and the kept set at a given score is reproducible forever.
    At 100 TB this composes with mixture sampling in the same single
    scan (two filter predicates, both pushed down)."""
    from ph_ee_nats_importer_rdbms_spark.analytics.text import q_quality

    scored = q_quality(spark, sf_dir)
    p_bp = F.floor(F.col("quality_score") * F.col("quality_score") * 10000)
    keep = (
        F.expr(spark_h32(f"concat('{IMPORTANCE_SALT}', CAST(doc_id AS STRING))"))
        % 10000
        < p_bp
    )
    return scored.filter(keep).select(
        "doc_id", "quality_score", p_bp.cast("long").alias("keep_bp")
    )


def _importance_sample_oracle() -> str:
    from ph_ee_nats_importer_rdbms_spark.analytics.text import QUALITY_ORACLE

    return f"""
WITH q AS ({QUALITY_ORACLE})
SELECT doc_id, quality_score,
       CAST(floor(quality_score * quality_score * 10000) AS BIGINT) AS keep_bp
FROM q
WHERE {duck_h32(f"'{IMPORTANCE_SALT}' || CAST(doc_id AS VARCHAR)")} % 10000
      < floor(quality_score * quality_score * 10000)
"""


IMPORTANCE_SAMPLE_ORACLE = _importance_sample_oracle()


# ---------------------------------------------------------------------------
# Corpus-unigram log-probability (statistical LM quality signal)
# ---------------------------------------------------------------------------

#: tokens in more documents than this are Zipf-head stopwords: their count
#: rows broadcast to the exploded relation instead of shuffling with it,
#: so no reducer ever keys on "the" (same split as dup_ngram_frac).
UNIGRAM_HOT_DF = 64


def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean corpus-unigram log-probability per document — the classic
    cheap LM fluency proxy (CCNet's LM-perplexity filter with the corpus
    itself as the model): score(d) = (Σ_tok c_d(tok)·ln c(tok))/|d| − ln N.
    Gibberish and boilerplate-with-rare-symbols score low; stopword-rich
    prose scores high.

    Scale shape: within-doc token counts collapse per (doc_id, token)
    BEFORE anything shuffles (rows on the wire = distinct tokens per doc,
    not tokens); the corpus count table aggregates map-side-combinably
    from those partials; the count join back splits hot tokens (document
    frequency > UNIGRAM_HOT_DF — the Zipf head, a config-sized relation)
    onto a broadcast join so the shuffle join's per-key rows are bounded
    by the constant. The per-doc sum folds over the token-sorted term
    array (left fold from 0.0) so both engines add in the same order —
    float addition isn't associative, and an unordered SUM would be
    nondeterministic run to run, let alone engine to engine.

    A per-doc curation stat like the repetition/quality relations, so it
    stages per dataset (``docs`` domain): the two token shuffles run
    once at ingest, warm calls read parquet."""
    from ph_ee_nats_importer_rdbms_spark.plans import staging

    return staging.load_memoized(
        spark, sf_dir, "unigram_logprob",
        lambda: _unigram_logprob_build(spark, sf_dir), domain="docs",
    )


def _unigram_logprob_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ph_ee_nats_importer_rdbms_spark.analytics.text import _tokens

    d = load_table(spark, sf_dir, "documents")
    per_doc = (
        d.select("doc_id", F.explode(_tokens()).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c_doc"))
        .localCheckpoint(eager=False)
    )
    vocab = per_doc.groupBy("tok").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("c_doc").alias("c_tot")
    ).localCheckpoint(eager=False)
    hot = vocab.filter(F.col("n_docs") > UNIGRAM_HOT_DF).select("tok", "c_tot")
    rare = vocab.filter(F.col("n_docs") <= UNIGRAM_HOT_DF).select("tok", "c_tot")
    joined = (
        per_doc.join(F.broadcast(hot), "tok")
        .unionByName(per_doc.join(rare, "tok"))
    )
    term = (F.col("c_doc").cast("double") * F.log(F.col("c_tot").cast("double"))).alias(
        "term"
    )
    folded = (
        joined.select("doc_id", "tok", "c_doc", term)
        .groupBy("doc_id")
        .agg(
            F.sum("c_doc").alias("n_tokens"),
            F.expr(
                "aggregate(array_sort(collect_list(struct(tok, term))),"
                " cast(0.0 as double), (a, x) -> a + x.term)"
            ).alias("total"),
        )
    )
    n_corpus = vocab.agg(F.sum("c_tot").alias("n_corpus"))
    score = F.floor(
        (F.col("total") / F.col("n_tokens") - F.log(F.col("n_corpus").cast("double")))
        * 10000
    ) / 10000
    return folded.crossJoin(F.broadcast(n_corpus)).select(
        "doc_id", "n_tokens", score.alias("logprob")
    )


def _unigram_logprob_oracle() -> str:
    from ph_ee_nats_importer_rdbms_spark.analytics.text import _duck_tokens

    return f"""
WITH per_doc AS (
  SELECT doc_id, tok, count(*) AS c_doc
  FROM (SELECT doc_id, unnest({_duck_tokens()}) AS tok FROM documents)
  GROUP BY doc_id, tok
),
vocab AS (
  SELECT tok, sum(c_doc) AS c_tot FROM per_doc GROUP BY tok
),
n AS (SELECT sum(c_tot) AS n_corpus FROM vocab),
terms AS (
  SELECT p.doc_id, p.tok, p.c_doc,
         CAST(p.c_doc AS DOUBLE) * ln(CAST(v.c_tot AS DOUBLE)) AS term
  FROM per_doc p JOIN vocab v USING (tok)
),
folded AS (
  SELECT doc_id, CAST(sum(c_doc) AS BIGINT) AS n_tokens,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                  list(term ORDER BY tok, term)),
                     (a, b) -> a + b) AS total
  FROM terms GROUP BY doc_id
)
SELECT doc_id, n_tokens,
       floor((total / n_tokens - ln(CAST(n_corpus AS DOUBLE))) * 10000) / 10000
         AS logprob
FROM folded, n
"""


UNIGRAM_LOGPROB_ORACLE = _unigram_logprob_oracle()


# ---------------------------------------------------------------------------
# Leakage-safe split (near-dup-cluster-aware train/test assignment)
# ---------------------------------------------------------------------------

#: distinct salt so cluster-keyed buckets are independent of the per-doc split.
CLUSTER_SPLIT_SALT = "csplit:"

_SPARK_CSALTED = f"concat('{CLUSTER_SPLIT_SALT}', CAST(split_key AS STRING))"
_DUCK_CSALTED = f"'{CLUSTER_SPLIT_SALT}' || CAST(split_key AS VARCHAR)"


def q_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/valid/test assignment where near-duplicate documents can never
    straddle the split boundary.

    ``q_train_test_split`` buckets each doc independently, so two near-dup
    docs (same boilerplate, one edit apart) can land one in train and one in
    test — silent benchmark leakage that per-doc decontamination then has to
    detect after the fact. This operator closes the hole structurally: the
    hash-bucket key is the document's MinHash-LSH duplicate-CLUSTER label
    (``q_dup_clusters``: min doc id of the verified near-dup component),
    falling back to the doc's own id for singletons. Every member of a
    near-dup cluster shares one key, hence one bucket, hence one split —
    the cluster moves atomically.

    Scale shape: the cluster-label relation is dup-rate-sized (only docs in
    a verified pair appear) and is already staged per corpus snapshot by
    ``q_dup_clusters``; the assignment itself is one left join on doc_id
    (AQE broadcasts it when the dup rate is low; at high dup rates a hash
    join on the narrow (id, label) pair is the right plan) followed by
    map-only bucketing — no new corpus-sized state, no window, no RNG.
    """
    from ph_ee_nats_importer_rdbms_spark.analytics.dedup import q_dup_clusters

    d = load_table(spark, sf_dir, "documents")
    labels = q_dup_clusters(spark, sf_dir).select("doc_id", "cluster_id")
    bucket = F.expr(f"{spark_h32(_SPARK_CSALTED)} % 100")
    return (
        d.select("doc_id")
        .join(labels, "doc_id", "left")
        .withColumn("split_key", F.coalesce("cluster_id", "doc_id"))
        .select(
            "doc_id",
            "split_key",
            F.when(bucket < SPLIT_TRAIN_PCT, F.lit("train"))
            .when(bucket < SPLIT_VALID_PCT, F.lit("valid"))
            .otherwise(F.lit("test"))
            .alias("split"),
        )
    )


def _leakage_safe_split_oracle() -> str:
    from ph_ee_nats_importer_rdbms_spark.analytics.dedup import (
        DUP_CLUSTERS_ORACLE,
    )

    return f"""
WITH clusters AS (
{DUP_CLUSTERS_ORACLE}
),
keyed AS (
  SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS split_key
  FROM documents d LEFT JOIN clusters c ON d.doc_id = c.doc_id
)
SELECT doc_id, split_key,
       CASE WHEN {duck_h32(_DUCK_CSALTED)} % 100 < {SPLIT_TRAIN_PCT} THEN 'train'
            WHEN {duck_h32(_DUCK_CSALTED)} % 100 < {SPLIT_VALID_PCT} THEN 'valid'
            ELSE 'test' END AS split
FROM keyed
"""


LEAKAGE_SAFE_SPLIT_ORACLE = _leakage_safe_split_oracle()
