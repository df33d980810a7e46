"""Training-data analytics over the document / embedding tables.

North-star additions beyond the reference importer (SURVEY.md §2.7): the
operations a large-scale training-data pipeline needs — deduplication
(exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding near-dup),
similarity search (brute-force + LSH-bucketed ANN), text analysis
(language-ID, quality scoring, token counting, fingerprinting), and
multimodal column plumbing.

Everything is expressed with built-in `pyspark.sql.functions` (JVM-side,
whole-stage-codegen'd) except the multimodal decode step, which is an
Arrow-batched `mapInPandas` by design. Every operator has a DuckDB oracle
built from the same deterministic md5-based hash primitives (hashing.py),
so results are bit-comparable across engines.
"""
