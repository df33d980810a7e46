"""Deterministic, engine-portable hash primitives.

Every sketch in this package (MinHash, SimHash, LSH buckets, winnowing
fingerprints, random hyperplanes) needs hashes that are *identical* in
Spark and in the DuckDB oracle. We derive everything from md5 — both
engines agree on it byte-for-byte — via:

    h32(s) = uint32 from the first 8 hex chars of md5(s)

Spark:   CAST(conv(substring(md5(s),1,8), 16, 10) AS BIGINT)
DuckDB:  CAST('0x' || substring(md5(s),1,8) AS BIGINT)

Both yield the same value in [0, 2^32). Downstream arithmetic stays in
int64 (a*h+b with a,b,h < 2^31 cannot overflow).
"""

from __future__ import annotations

import hashlib

#: Mersenne prime 2^31-1 — modulus for MinHash permutations. Keeping every
#: operand under 2^31 bounds products under 2^62 (no int64 overflow in
#: either engine).
MINHASH_PRIME = 2147483647

#: (a, b) pairs for the MinHash permutation family h_j(x) = (a_j*x + b_j) % P.
#: Fixed constants (odd multipliers, spread offsets) so signatures are stable
#: across runs, engines, and cluster sizes.
MINHASH_PERMS: list[tuple[int, int]] = [
    (1048573, 12289),
    (2097143, 786433),
    (4194301, 196613),
    (8388593, 49157),
    (16777213, 1610612741),
    (33554393, 805306457),
    (67108859, 402653189),
    (134217689, 201326611),
    (268435399, 100663319),
    (536870909, 50331653),
    (1073741789, 25165843),
    (99990001, 6291469),
]

#: MinHash LSH banding: 12 signatures = 4 bands x 3 rows. Collision prob for
#: Jaccard j is 1-(1-j^3)^4 (~50% at j≈0.46).
MINHASH_BANDS = 4
MINHASH_ROWS_PER_BAND = 3

#: 60-bit SimHash (15 md5 hex chars fit int64 with headroom). 32 bits is too
#: collision-prone on small-vocabulary corpora — the band join degenerates.
SIMHASH_BITS = 60
SIMHASH_BANDS = 4  # 4 bands x 15 bits; Hamming ≤ 3 ⇒ ≥1 band equal


def spark_h60(s: str) -> str:
    """SQL snippet (Spark dialect): uint60 md5-prefix hash of expression."""
    return f"CAST(conv(substring(md5({s}),1,15),16,10) AS BIGINT)"


def duck_h60(s: str) -> str:
    """SQL snippet (DuckDB dialect): same value as :func:`spark_h60`."""
    return f"CAST('0x' || substring(md5({s}),1,15) AS BIGINT)"


def spark_h32(s: str) -> str:
    """SQL snippet (Spark dialect): uint32 md5-prefix hash of expression."""
    return f"CAST(conv(substring(md5({s}),1,8),16,10) AS BIGINT)"


def duck_h32(s: str) -> str:
    """SQL snippet (DuckDB dialect): same value as :func:`spark_h32`."""
    return f"CAST('0x' || substring(md5({s}),1,8) AS BIGINT)"


def py_h32(s: str) -> int:
    """Python-side mirror of h32 (for inlined literal planes)."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16)


def hyperplanes(n_planes: int, dim: int, salt: str = "plane") -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes in [-1, 1)^dim for sign-LSH.

    Components derive from ``py_h32`` so Python (plane generation), Spark
    (inlined literals), and DuckDB (inlined literals) all agree exactly.
    """
    return [
        [
            (py_h32(f"{salt}:{p}:{d}") % 2000001 - 1000000) / 1000000.0
            for d in range(dim)
        ]
        for p in range(n_planes)
    ]
