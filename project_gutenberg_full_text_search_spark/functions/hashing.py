"""Cross-engine deterministic hashing.

For any operator whose correctness oracle runs in DuckDB (dedup, MinHash,
SimHash, fingerprints), the hash function must produce bit-identical values
in Spark SQL, DuckDB SQL, and Python. Spark's xxhash64/hash are
Spark-specific, so we standardize on **md5 truncated to 62 bits**
(signed-positive long), expressible everywhere:

    Spark : conv(substring(md5(s), 1, 15), 16, 10)::long  & mask
    DuckDB: ('0x' || substring(md5(s), 1, 15))::bigint    & mask
    Python: int(hashlib.md5(s).hexdigest()[:15], 16)      & mask

15 hex chars = 60 bits → always fits a signed 64-bit int in every engine.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

HASH_BITS = 60


def md5_long_py(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def md5_long_col(c: Column | str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def md5_long_sql(expr: str) -> str:
    """DuckDB SQL fragment computing the same 60-bit hash."""
    return f"(('0x' || substring(md5({expr}), 1, 15))::BIGINT)"


def seeded_hash_col(c: Column | str, seed: int) -> Column:
    """Seeded variant: hash of 'seed:value'."""
    c = F.col(c) if isinstance(c, str) else c
    return md5_long_col(F.concat(F.lit(f"{seed}:"), c))


def seeded_hash_sql(expr: str, seed: int) -> str:
    return md5_long_sql(f"'{seed}:' || {expr}")


def seeded_hash_py(s: str, seed: int) -> int:
    return md5_long_py(f"{seed}:{s}")


# ---------------------------------------------------------------------------
# MinHash lane hashes: h_s(x) = (A_s * md5_long(x) + B_s) mod 2^60
#
# One md5 per unique shingle, k numpy-vectorized affine lanes on top —
# instead of k md5 calls per shingle. Cross-engine exact because uint64
# wrap-around then low-60-bit mask ≡ mod 2^60 (2^60 divides 2^64), which
# DuckDB reproduces with HUGEINT arithmetic:
#     ((A::HUGEINT * hv + B) % 1152921504606846976)::BIGINT
# The lane constants are themselves md5-derived (deterministic, no RNG).
# ---------------------------------------------------------------------------

MINHASH_MOD = 1 << 60


def minhash_lane_consts(k: int):
    """(A, B) uint64 arrays of k affine-lane constants; A odd (bijective
    multiplier mod 2^60)."""
    import numpy as np

    a = np.array([md5_long_py(f"a:{s}") | 1 for s in range(k)], dtype=np.uint64)
    b = np.array([md5_long_py(f"b:{s}") for s in range(k)], dtype=np.uint64)
    return a, b


def minhash_hash_py(s: str, seed: int) -> int:
    """Python twin of lane `seed` applied to shingle `s` (tests/oracles)."""
    a = md5_long_py(f"a:{seed}") | 1
    b = md5_long_py(f"b:{seed}")
    return (a * md5_long_py(s) + b) % MINHASH_MOD


def minhash_hash_sql(expr: str, seed: int) -> str:
    """DuckDB fragment for lane `seed` over shingle expression `expr`."""
    a = md5_long_py(f"a:{seed}") | 1
    b = md5_long_py(f"b:{seed}")
    return f"((({a}::HUGEINT * {md5_long_sql(expr)}) + {b}) % {MINHASH_MOD})::BIGINT"
