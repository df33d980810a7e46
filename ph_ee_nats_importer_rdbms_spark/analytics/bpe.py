"""Distributed BPE tokenizer training + frozen-merge subword encoding.

The reference importer has no tokenizer surface (its text handling stops
at JSON payload extraction — ``InboundMessageParser.java``); this module
is part of the training-data-pipeline layer: ``vocabulary`` (text.py)
gives the word-level statistic, this module learns the SUBWORD merge
table from it and encodes the corpus with it — the step a real LLM data
pipeline runs between curation and sequence packing.

Scale shape (the reason BPE training is feasible at 100 TB at all): the
only corpus-linear pass is the initial WORD-COUNT aggregation — one
map-side-combinable shuffle, exactly ``vocabulary``'s shape. Every merge
iteration after that runs over the DISTINCT-WORD relation (vocabulary-
sized, millions of rows at worst), not the corpus: per iteration, one
small explode+sum for weighted pair counts, one single-row collect for
the argmax, one map-only merge application. This is how production BPE
trainers are structured (word-count pre-aggregation first); the corpus
never re-enters the loop.

Merge application uses literal string ``replace`` over a DOUBLE-space-
separated symbol string (``"  a  b  c  "`` — every boundary, ends
included, is exactly two spaces): ``replace(s, ' a  b ', ' ab ')``.
The pattern consumes ONE space from each side's boundary and the
replacement restores them, so back-to-back occurrences still match —
with single-space separators the first match would eat the boundary the
next match needs as its lead, silently skipping every second occurrence
in a run (caught by test_trainer_merge_application_...). Literal
replace is greedy left-to-right non-overlapping in Spark (Java
``String.replace``) and DuckDB ``replace``, which under this encoding
is EXACTLY canonical BPE merge application (verified against an
array-walk reference in tests/test_bpe.py) — one semantic across the
trainer, the frozen-merge encoder, and the DuckDB oracle, zero UDFs.

The learned merge lists are FROZEN ARTIFACTS (``bpe_merges.json``,
trained by ``tools/train_bpe.py``), per corpus like the IVF/PQ codebooks
(``similarity.py``): a tokenizer is trained once and versioned with the
dataset; both the Spark encode plan and the DuckDB oracle replay the
same literal merge chain, and the driver's oracle gate runs at sf0.01 by
contract (``ORACLE_SF_BASE``).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import Column, DataFrame, SparkSession, Window, functions as F

from ph_ee_nats_importer_rdbms_spark.analytics.text import _duck_tokens, _tokens
from ph_ee_nats_importer_rdbms_spark.sources.files import load_table, spread

#: pair-count cut for the bpe_pair_counts registry entry
PAIR_TOP_K = 50

#: merges per frozen tokenizer artifact; training stops early when the
#: best pair's weighted count drops below MIN_PAIR_COUNT (nothing repeats)
N_MERGES = 40
MIN_PAIR_COUNT = 2

_BPE_ARTIFACT = os.path.join(os.path.dirname(__file__), "bpe_merges.json")

ORACLE_SF_BASE = "sf0.01"


def _load_merge_artifact() -> dict[str, list[list[str]]]:
    if not os.path.exists(_BPE_ARTIFACT):
        return {}
    with open(_BPE_ARTIFACT) as f:
        return json.load(f)["merges"]


BPE_MERGES: dict[str, list[list[str]]] = _load_merge_artifact()


def merges_for(sf_dir: str) -> list[tuple[str, str]]:
    base = os.path.basename(os.path.normpath(sf_dir))
    table = BPE_MERGES.get(base) or BPE_MERGES.get("default") or []
    return [(a, b) for a, b in table]


# ---------------------------------------------------------------------------
# Symbol-string primitives (shared by trainer, encoder, and oracle SQL)
# ---------------------------------------------------------------------------
# Pre-tokenization is IMPORTED from text.py (_tokens/_duck_tokens): one
# corpus, one word definition — a change to the shared tokenizer changes
# the BPE surface together with the rest of the curation stack instead of
# silently diverging from it.


def _spaced(word: Column) -> Column:
    """``"  a  b  c  "`` — the word as a DOUBLE-space-separated symbol
    string (two-space boundaries at the ends too; see module docstring
    for why the doubling is load-bearing). ``regexp_replace`` rather
    than an empty-pattern split so the Spark and DuckDB forms are
    construction-identical."""
    return F.concat(F.lit("  "), F.regexp_replace(word, r"(.)", r"$1  "))


def _duck_spaced(word: str) -> str:
    return rf"'  ' || regexp_replace({word}, '(.)', '\1  ', 'g')"


def _pairs_of(syms: Column) -> Column:
    """Adjacent symbol pairs of a symbol ARRAY as structs (l, r) —
    ``transform`` over a 0-based index against the same array, all
    JVM-side."""
    return F.expr(
        "transform(slice(syms, 1, size(syms) - 1),"
        " (x, i) -> struct(x AS l, syms[i + 1] AS r))"
    )


def _word_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(word, cnt): the corpus's word-frequency table — the ONE
    corpus-linear pass (map-side-combinable hash aggregate); every merge
    iteration downstream touches only this vocabulary-sized relation.

    Staged per dataset (r13, lex domain): the trainer and the
    pair-counts registry entry both start from this table, and it is a
    corpus-linear aggregate with a vocabulary-sized output — exactly the
    ingest-artifact shape the other staged curation relations share, so
    warm calls read the (tiny) parquet instead of re-running the
    tokenize+explode+aggregate corpus pass per call."""
    from ph_ee_nats_importer_rdbms_spark.plans import staging

    def build() -> DataFrame:
        d = spread(load_table(spark, sf_dir, "documents"))
        return (
            d.select(F.explode(_tokens()).alias("word"))
            .groupBy("word")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )

    return staging.load_memoized(
        spark, sf_dir, "word_counts", build, domain="lex"
    )


# ---------------------------------------------------------------------------
# Trainer (distributed; vocabulary-sized iterations)
# ---------------------------------------------------------------------------


def train_bpe_merges(
    words: DataFrame,
    n_merges: int = N_MERGES,
    min_pair_count: int = MIN_PAIR_COUNT,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a (word, cnt) relation.

    Per iteration: weighted adjacent-pair counts (small explode + sum
    over the word table), a ONE-ROW collect for the argmax (count desc,
    then (l, r) asc — deterministic tie-break), and a map-only literal
    ``replace`` applying the merge to every word's symbol string.
    ``localCheckpoint`` every few iterations bounds plan depth; the
    relation being checkpointed is vocabulary-sized, never the corpus.
    """
    cur = words.select(_spaced(F.col("word")).alias("s"), "cnt")
    merges: list[tuple[str, str]] = []
    for i in range(n_merges):
        if i > 0 and i % 8 == 0:
            cur = cur.localCheckpoint(eager=False)
        pair_counts = (
            cur.select(
                F.split(F.trim(F.col("s")), "  ").alias("syms"), "cnt"
            )
            .select(F.explode(_pairs_of(F.col("syms"))).alias("p"), "cnt")
            .groupBy("p.l", "p.r")
            .agg(F.sum("cnt").alias("n"))
        )
        best = (
            pair_counts.orderBy(
                F.col("n").desc(), F.col("l").asc(), F.col("r").asc()
            )
            .limit(1)
            .collect()
        )
        if not best or best[0]["n"] < min_pair_count:
            break
        a, b = best[0]["l"], best[0]["r"]
        merges.append((a, b))
        cur = cur.select(
            F.replace(
                F.col("s"), F.lit(f" {a}  {b} "), F.lit(f" {a}{b} ")
            ).alias("s"),
            "cnt",
        )
    return merges


def train_bpe_for_sf(
    spark: SparkSession, sf_dir: str, n_merges: int = N_MERGES
) -> list[tuple[str, str]]:
    """Train a merge table for one corpus (``tools/train_bpe.py``)."""
    return train_bpe_merges(_word_counts(spark, sf_dir), n_merges)


# ---------------------------------------------------------------------------
# bpe_pair_counts — the iteration-0 statistic, driver-gated
# ---------------------------------------------------------------------------


def q_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-``PAIR_TOP_K`` weighted adjacent character-pair counts over
    the word-frequency table — the statistic BPE's first merge argmaxes
    over (and the corpus diagnostic for choosing merge counts). Shape:
    the corpus-linear word count, then explode/sum over the
    vocabulary-sized relation; the top-k cut is an ordered limit over
    the (tiny) distinct-pair relation."""
    pairs = (
        _word_counts(spark, sf_dir)
        .select(
            F.split(F.trim(_spaced(F.col("word"))), "  ").alias("syms"),
            "cnt",
        )
        .select(F.explode(_pairs_of(F.col("syms"))).alias("p"), "cnt")
        .groupBy(
            F.col("p.l").alias("left_sym"), F.col("p.r").alias("right_sym")
        )
        .agg(
            F.sum("cnt").alias("pair_count"),
            F.count(F.lit(1)).alias("n_positions"),
        )
    )
    order = [
        F.col("pair_count").desc(),
        F.col("left_sym").asc(),
        F.col("right_sym").asc(),
    ]
    return (
        pairs.orderBy(*order)
        .limit(PAIR_TOP_K)
        .withColumn("rank", F.row_number().over(Window.orderBy(*order)))
        .select("rank", "left_sym", "right_sym", "pair_count", "n_positions")
    )


BPE_PAIR_COUNTS_ORACLE = rf"""
WITH w AS (
  SELECT token AS word, count(*) AS cnt
  FROM (SELECT unnest({_duck_tokens()}) AS token FROM documents)
  GROUP BY token
),
s AS (
  SELECT regexp_split_to_array(trim({_duck_spaced('word')}), '  ') AS syms,
         cnt
  FROM w
),
p AS (
  SELECT syms[CAST(i AS INT)] AS left_sym,
         syms[CAST(i AS INT) + 1] AS right_sym,
         cnt
  FROM s, unnest(range(1, len(syms))) AS u(i)
  WHERE len(syms) >= 2
),
agg AS (
  SELECT left_sym, right_sym,
         CAST(sum(cnt) AS BIGINT) AS pair_count, count(*) AS n_positions
  FROM p GROUP BY left_sym, right_sym
)
SELECT CAST(row_number() OVER (ORDER BY pair_count DESC, left_sym, right_sym)
            AS INT) AS rank,
       left_sym, right_sym, pair_count, n_positions
FROM agg
ORDER BY pair_count DESC, left_sym, right_sym
LIMIT {PAIR_TOP_K}
"""


# ---------------------------------------------------------------------------
# bpe_encode — the corpus encoded with the frozen merge table
# ---------------------------------------------------------------------------


def encode_word(word: Column, merges: list[tuple[str, str]]) -> Column:
    """One word → its space-joined subword segmentation under the frozen
    merge chain: double-spaced chars, one literal ``replace`` per merge
    IN TRAINING ORDER (the BPE application rule), then the double
    separators collapse to single spaces. A static column-expression
    chain — no UDF, no iteration at run time."""
    s = _spaced(word)
    for a, b in merges:
        s = F.replace(s, F.lit(f" {a}  {b} "), F.lit(f" {a}{b} "))
    return F.replace(F.trim(s), F.lit("  "), F.lit(" "))


def _duck_encode_word(word: str, merges: list[tuple[str, str]]) -> str:
    def q(x: str) -> str:
        return x.replace("'", "''")

    s = _duck_spaced(word)
    for a, b in merges:
        s = f"replace({s}, ' {q(a)}  {q(b)} ', ' {q(a)}{q(b)} ')"
    return f"replace(trim({s}), '  ', ' ')"


def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, subwords, n_subwords, n_words): every document encoded
    as its subword sequence under the corpus's frozen merge table —
    the id-izable training artifact downstream of ``token_ids``'s
    word-level encode. Map-only (a per-token ``transform`` applying the
    literal replace chain); staged per dataset (``lex`` domain — keyed
    on this module, the shared tokenizer, AND the frozen
    ``bpe_merges.json``, so retraining the merge table invalidates the
    stage) like the other materialized training artifacts."""
    from ph_ee_nats_importer_rdbms_spark.plans import staging

    merges = merges_for(sf_dir)

    def build() -> DataFrame:
        d = spread(load_table(spark, sf_dir, "documents"))
        enc = F.transform(_tokens(), lambda w: encode_word(w, merges))
        sub = F.array_join(enc, " ")
        return d.select(
            "doc_id",
            sub.alias("subwords"),
            F.when(sub == "", F.lit(0))
            .otherwise(F.size(F.split(sub, " ")))
            .cast("int")
            .alias("n_subwords"),
            F.size(_tokens()).cast("int").alias("n_words"),
        )

    return staging.load_memoized(
        spark, sf_dir, "bpe_encode", build, domain="lex"
    )


def _bpe_encode_oracle() -> str:
    merges = [
        (a, b) for a, b in (BPE_MERGES.get(ORACLE_SF_BASE) or [])
    ]
    enc = _duck_encode_word("w", merges)
    return rf"""
WITH enc AS (
  SELECT doc_id,
         array_to_string(
           list_transform({_duck_tokens()}, w -> {enc}), ' ') AS subwords,
         len({_duck_tokens()}) AS n_words
  FROM documents
)
SELECT doc_id, subwords,
       CAST(CASE WHEN subwords = '' THEN 0
                 ELSE len(string_split(subwords, ' ')) END AS INT)
         AS n_subwords,
       CAST(n_words AS INT) AS n_words
FROM enc
"""


BPE_ENCODE_ORACLE = _bpe_encode_oracle()
