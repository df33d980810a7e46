"""BM25 keyword retrieval over the ``documents`` corpus.

The lexical complement of the ANN serving family (similarity.py):
top-k documents per keyword query under Okapi BM25 (Lucene's
non-negative idf variant). Sits with the training-data operators
because corpus-scale keyword retrieval is how curation teams pull
targeted slices (contamination probes, topic audits) without an
external search cluster.

Scale shape — the part that matters at 100 TB: scoring touches ONLY
the query terms' postings. The term-frequency relation is filtered by
a broadcast join against the config-sized query-term set BEFORE any
aggregation, so the per-query work is proportional to the matched
postings, not the corpus; document length and corpus stats are
map-side-combinable aggregates; the final top-k is a per-query window
over the (tiny) scored-candidate relation. Per-doc scores fold over
the token-SORTED term list (float addition is not associative — the
unordered SUM would be engine- and run-nondeterministic), then round
to 4dp before ranking so an ulp never flips a rank; ties break on
doc_id.

The query set is corpus-derived and deterministic: query ``q`` is the
vocabulary tokens ranked ``q*TERMS_PER_QUERY+1 ..`` (by occurrence,
text.q_vocabulary's order), so the DuckDB oracle reconstructs the
identical queries from the same parquet."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ph_ee_nats_importer_rdbms_spark.analytics.text import (
    VOCAB_TOP_K,
    _duck_tokens,
    _tokens,
    q_vocabulary,
)
from ph_ee_nats_importer_rdbms_spark.plans import staging
from ph_ee_nats_importer_rdbms_spark.sources.files import load_table, spread

BM25_N_QUERIES = 4
TERMS_PER_QUERY = 3
BM25_TOP_K = 10
BM25_K1 = 1.2
BM25_B = 0.75


def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(qid, rank, doc_id, score): BM25 top-``BM25_TOP_K`` per query.
    Staged per dataset (``lex`` domain — keyed on this module and the
    shared tokenizer, so editing either invalidates the stage) — the
    scored top-k is a small materialized artifact like the other
    curation relations."""

    def build() -> DataFrame:
        return _bm25_build(spark, sf_dir)

    return staging.load_memoized(
        spark, sf_dir, "bm25_search", build, domain="lex"
    )


def _qterms_of(vocab: DataFrame) -> DataFrame:
    """The config-sized (qid, token) query relation derived from a
    ranked vocabulary — shared by the staged build (q_vocabulary) and
    the store read path (read_vocabulary), so both construct the
    identical deterministic query set."""
    return vocab.filter(
        F.col("rank") <= BM25_N_QUERIES * TERMS_PER_QUERY
    ).select(
        F.floor((F.col("rank") - 1) / TERMS_PER_QUERY)
        .cast("int")
        .alias("qid"),
        "token",
    )


def _bm25_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents"))
    # config-sized query-term relation from the corpus vocabulary
    qterms = _qterms_of(q_vocabulary(spark, sf_dir))
    # per-doc lengths and per-(doc, token) tf in one shuffle each
    toks = d.select("doc_id", F.explode(_tokens()).alias("token"))
    tf = toks.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).alias("tf")
    )
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.col("dl").cast("double")).alias("avgdl"),
    )
    return _bm25_score(qterms, tf, dl, stats)


def _bm25_score(
    qterms: DataFrame, tf: DataFrame, dl: DataFrame, stats: DataFrame
) -> DataFrame:
    """Okapi BM25 top-k over a (doc_id, token, tf) postings relation —
    the scoring shared by the staged whole-corpus build and the
    store-backed read path (identical plan shape, so append-equals-
    rebuild parity lets one DuckDB oracle gate both). ``stats`` is a
    one-row (n_docs, avgdl) relation.

    Postings are restricted to query terms BEFORE df/scoring — the
    broadcast semi-filter is what keeps per-query cost postings-
    proportional at corpus scale."""
    hits = tf.join(F.broadcast(qterms), "token")
    df_counts = hits.groupBy("token").agg(
        F.count_distinct("doc_id").alias("df")
    )
    terms = (
        hits.join(F.broadcast(df_counts), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "qid",
            "doc_id",
            "token",
            _bm25_term_col(F.col("n_docs"), F.col("avgdl")).alias("term"),
        )
    )
    return _bm25_fold_rank(terms)


def _bm25_term_col(n_docs, avgdl):
    """Per-(query, doc, token) BM25 contribution; expects columns
    ``tf``, ``df``, ``dl`` in scope. ``n_docs``/``avgdl`` come in as
    Columns so the corpus build (one-row stats relation) and the store
    read (memoized literals) evaluate the IDENTICAL double expression —
    operator order is shared, so the 4dp-rounded oracle hashes agree
    bit-for-bit between the two paths."""
    return (
        F.log((n_docs - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
        * (F.col("tf") * (BM25_K1 + 1))
        / (
            F.col("tf")
            + BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / avgdl)
        )
    )


def _bm25_fold_rank(
    terms: DataFrame, single_exchange: bool = False
) -> DataFrame:
    """(qid, doc_id, token, term) -> ranked top-k: the token-sorted
    deterministic fold + 4dp round + per-query rank shared by both
    scoring paths.

    ``single_exchange`` pre-partitions by qid so ONE Exchange serves
    both the (qid, doc_id) fold (HashPartitioning(qid) clusters the
    superset key) and the per-qid rank window — the store READ path's
    latency shape, where the candidate set is postings-proportional
    per query and the query set is config-sized. The corpus BUILD keeps
    the default two-phase shape: its fold input is the whole matched-
    postings relation and wants hash parallelism over (qid, doc_id),
    not ``BM25_N_QUERIES`` partitions."""
    if single_exchange:
        terms = terms.repartition("qid")
    folded = terms.groupBy("qid", "doc_id").agg(
        F.round(
            F.expr(
                "aggregate(array_sort(collect_list(struct(token, term))),"
                " cast(0.0 as double), (a, x) -> a + x.term)"
            ),
            4,
        ).alias("score")
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        folded.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= BM25_TOP_K)
        .select("qid", "rank", "doc_id", "score")
    )


#: (applicationId, abs store root, manifest-file identity tuple) ->
#: ((qid, token, df) rows, n_docs, avgdl, constructed DataFrame).
#: All DETERMINISTIC functions
#: of the committed-manifest set (vocabulary ranks, summed df partials
#: and corpus length stats derive only from committed partials), so
#: caching per manifest fingerprint is exact: an append writes a new
#: manifest file and a REBUILD at the same path rewrites `base` with a
#: fresh mtime_ns — either changes the key (names alone would alias a
#: rebuilt store). Bounds the per-call work of read_bm25_search to the
#: one scoring job (VERDICT r10 task #5 — the collect-per-call small
#: jobs were ~90% of its warm time).
_BM25_READ_CACHE: dict[tuple, tuple] = {}


def read_bm25_search(spark: SparkSession, root: str) -> DataFrame:
    """BM25 top-k served from a curation store's committed index
    partials — the store-backed twin of :func:`q_bm25_search`
    (VERDICT r9 task #5).

    No corpus re-tokenization anywhere, and — since the VERDICT r11
    task-#2 compaction — no corpus-sized work of ANY kind at read time:
    the per-delivery partials carry dl pre-joined into the postings and
    (token, df) document-frequency partials, so the whole warm plan is
    ONE pushed-predicate scan of the dl-joined postings, a broadcast
    join against the config-sized (qid, token, df) query relation, the
    deterministic fold, and the top-k window. The per-call df
    count_distinct and the tf⋈dl shuffle that made the old read path
    postings×-shuffle-bound moved to append time (batch-local, inside
    the same manifest transaction). The ``isin`` literal filter on the
    postings scan is a pushed parquet predicate, so the read touches
    only matching row groups of the committed index. The query-term
    set (with summed df) and the (n_docs, avgdl) scalars are memoized
    per (store root, manifest-file identity) — all pure functions of
    the committed set; an append or same-path rebuild changes the key.
    The per-term score expression and the fold/rank are the SHARED
    :func:`_bm25_term_col` / :func:`_bm25_fold_rank`, so
    append-equals-rebuild parity lets the same DuckDB oracle gate both
    paths."""
    from pyspark.sql import types as T

    from ph_ee_nats_importer_rdbms_spark.analytics import (
        incremental_curation as icur,
        incremental_docs,
    )

    committed = incremental_docs.committed_batches(root)
    missing = [
        m["batch"]
        for m in committed
        if not all(
            os.path.isdir(os.path.join(root, art, m["batch"]))
            for art in ("bm25_plist", "bm25_df", "bm25_dl")
        )
    ]
    if missing:
        raise ValueError(
            "read_bm25_search: store predates the BM25 index partials "
            f"(batches without compacted bm25 artifacts: {missing}) — "
            "rebuild the store (or re-deliver) to materialize the index"
        )
    # Key on (session, root, manifest-file IDENTITY): the manifest part
    # is name + size + mtime_ns, not name alone — a base build always
    # commits batch name "base", so a store REBUILT at the same path in
    # the same process would otherwise hit the stale entry and serve the
    # old corpus's query terms and stats (every (re)build/append writes
    # its manifests via os.replace, so mtime_ns changes even when names
    # and sizes collide). The session part is the applicationId: the
    # cached value includes a constructed DataFrame, which is bound to
    # the SparkSession that built it — an entry from a stopped session
    # must never be served to a new one.
    mdir = incremental_docs._manifest_dir(os.path.abspath(root))
    key = (
        spark.sparkContext.applicationId,
        os.path.abspath(root),
        tuple(
            (name, st.st_size, st.st_mtime_ns)
            for name, st in (
                (
                    f"{m['seq']:06d}_{m['batch']}.json",
                    os.stat(
                        os.path.join(mdir, f"{m['seq']:06d}_{m['batch']}.json")
                    ),
                )
                for m in committed
            )
        ),
    )
    cached = _BM25_READ_CACHE.get(key)
    if cached is not None:
        # the constructed DataFrame is itself a pure function of the key
        # (session + committed set + this module's code): reusing it
        # skips ~100 py4j expression-construction round trips per call
        return cached[3]
    qt = [
        (int(r["qid"]), r["token"])
        for r in _qterms_of(icur.read_vocabulary(spark, root)).collect()
    ]
    qtokens = [t for _, t in qt]
    dfmap = {
        r["token"]: int(r["df"])
        for r in incremental_docs.read_artifact(
            spark, root, "bm25_df", icur.BM25_DF_SCHEMA
        )
        .filter(F.col("token").isin(qtokens))
        .groupBy("token")
        .agg(F.sum("df").alias("df"))
        .collect()
    }
    srow = (
        incremental_docs.read_artifact(
            spark, root, "bm25_dl", icur.BM25_DL_SCHEMA
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.avg(F.col("dl").cast("double")).alias("avgdl"),
        )
        .first()
    )
    qrows = [(qid, tok, dfmap.get(tok, 0)) for qid, tok in qt]
    n_docs, avgdl = int(srow["n_docs"]), float(srow["avgdl"])
    # The config-sized query relation becomes LITERAL MAPS (token -> qid,
    # token -> df) instead of a broadcast join: same values, same double
    # arithmetic, one less exchange to build per call. A token can only
    # belong to one query (qterms partitions the ranked vocabulary), so
    # the maps are well-defined.
    qid_map = F.create_map(
        *[F.lit(x) for qid, tok, _df in qrows for x in (tok, qid)]
    )
    df_map = F.create_map(
        *[F.lit(x) for _qid, tok, df in qrows for x in (tok, df)]
    )
    plist = incremental_docs.read_artifact(
        spark, root, "bm25_plist", icur.BM25_PLIST_SCHEMA
    ).filter(F.col("token").isin([t for _, t, _df in qrows]))
    terms = plist.withColumn(
        "df", df_map[F.col("token")].cast("long")
    ).select(
        qid_map[F.col("token")].cast("int").alias("qid"),
        "doc_id",
        "token",
        _bm25_term_col(
            F.lit(n_docs).cast("long"), F.lit(float(avgdl))
        ).alias("term"),
    )
    out = _bm25_fold_rank(terms, single_exchange=True)
    # evict superseded entries for this (session, root): only the latest
    # committed set can ever hit again, and each entry pins a JVM
    # logical plan — without eviction an append-then-query loop grows
    # driver memory linearly with deliveries
    # ... and every entry keyed by a DIFFERENT applicationId: the current
    # session is the only live one in this process, so a foreign-appId
    # entry can never be served again — without this purge a process that
    # restarts sessions (pytest, notebooks) grows the dict without bound,
    # each entry pinning a dead session's DataFrame (VERDICT r12 defect #1)
    for k in [
        k
        for k in _BM25_READ_CACHE
        if (k[:2] == key[:2] or k[0] != key[0]) and k != key
    ]:
        del _BM25_READ_CACHE[k]
    _BM25_READ_CACHE[key] = (qrows, n_docs, avgdl, out)
    return out


def q_bm25_search_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``read_bm25_search`` over the dataset's staged incremental
    curation store (two-delivery build) — puts the per-delivery BM25
    index maintenance under the driver's oracle gate; same oracle as
    ``bm25_search`` by append-equals-rebuild parity."""
    from ph_ee_nats_importer_rdbms_spark.analytics.incremental_curation import (
        staged_curation_store_root,
    )

    return read_bm25_search(
        spark, staged_curation_store_root(spark, sf_dir)
    )


BM25_SEARCH_ORACLE = rf"""
WITH tok AS (
  SELECT doc_id, unnest({_duck_tokens()}) AS token FROM documents
),
counts AS (
  SELECT token, count(*) AS n_occurrences, count(DISTINCT doc_id) AS n_docs
  FROM tok GROUP BY token
),
vocab AS (
  SELECT CAST(row_number() OVER (ORDER BY n_occurrences DESC, token ASC)
              AS INT) AS rank, token
  FROM counts
  ORDER BY n_occurrences DESC, token ASC
  LIMIT {VOCAB_TOP_K}
),
qterms AS (
  SELECT CAST(floor((rank - 1) / {TERMS_PER_QUERY}) AS INT) AS qid, token
  FROM vocab WHERE rank <= {BM25_N_QUERIES * TERMS_PER_QUERY}
),
tf AS (
  SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token
),
dl AS (
  SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id
),
stats AS (
  SELECT count(*) AS n_docs, avg(CAST(dl AS DOUBLE)) AS avgdl FROM dl
),
hits AS (
  SELECT q.qid, t.doc_id, t.token, t.tf FROM tf t JOIN qterms q USING (token)
),
dfc AS (
  SELECT token, count(DISTINCT doc_id) AS df FROM hits GROUP BY token
),
terms AS (
  SELECT h.qid, h.doc_id, h.token,
         ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
           * (h.tf * ({BM25_K1} + 1))
           / (h.tf + {BM25_K1}
              * (1 - {BM25_B} + {BM25_B} * l.dl / s.avgdl)) AS term
  FROM hits h
  JOIN dfc d USING (token)
  JOIN dl l USING (doc_id)
  CROSS JOIN stats s
),
folded AS (
  SELECT qid, doc_id,
         round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                        list(term ORDER BY token, term)),
                           (a, b) -> a + b), 4) AS score
  FROM terms GROUP BY qid, doc_id
)
SELECT qid, CAST(rank AS INT) AS rank, doc_id, score FROM (
  SELECT qid, doc_id, score,
         row_number() OVER (PARTITION BY qid
                            ORDER BY score DESC, doc_id ASC) AS rank
  FROM folded
)
WHERE rank <= {BM25_TOP_K}
"""
