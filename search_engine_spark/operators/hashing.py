"""Portable hash family shared by the engine and its DuckDB oracles.

Round 1 hashed MinHash/SimHash/hyperplane-LSH with Spark's `xxhash64`,
which DuckDB cannot compute — so a quarter of the driver's correctness
gate ran rows-only. This module replaces it with an md5-derived 60-bit
hash that BOTH engines evaluate identically:

    Spark : conv(substring(md5(col), 1, 15), 16, 10) :: long
    DuckDB: CAST(('0x' || substring(md5(col), 1, 15)) AS BIGINT)

(15 hex chars = 60 bits, always positive, no signed-overflow semantics
to reconcile; parity incl. non-ASCII verified — both md5 the UTF-8
bytes.)

Derived families, all pure 64-bit-safe integer arithmetic so Spark
longs and DuckDB BIGINTs agree exactly (no wraparound on either side):

- MinHash permutations over M31 = 2^31-1: h_i = (a_i·(h mod M31)+b_i)
  mod M31 with a_i < M31 — products < 2^62. One md5 per (doc, term)
  row + 64 long mult/mod (vs 64 xxhash64 calls before): stays in
  whole-stage codegen. The 31-bit range is plenty for MinHash —
  collisions only perturb the Jaccard estimate and candidates are
  verified exactly downstream.
- SimHash: the 60-bit h64 directly (bit votes over bits 0..59).
- Hyperplane LSH: Rademacher (±1) plane components from the PYTHON md5
  of "hp|table|plane|dim" — plan-time constants, embedded as literals
  in both the Spark plan and the oracle SQL (no per-row hashing at
  all).
- Karp-Rabin rolling hash mod M31 with base 257: per-step products
  < 2^40, so the numpy uint64 path never wraps (fixes the r1 advisory:
  the old mod-(2^61-1) powers overflowed uint64 before the mod).

The constants below are the single source of truth — `__spark_entry__`
builds its DuckDB oracle SQL from these same values.
"""

from __future__ import annotations

import hashlib
import random
from functools import lru_cache

from pyspark.sql import Column
from pyspark.sql import functions as F

M31 = (1 << 31) - 1  # Mersenne prime 2^31-1: (a*h+b) products fit int64
KR_BASE = 257  # Karp-Rabin polynomial base (rolling_fingerprints)
N_MINHASH = 64  # default signature width


#: Hash families for the dedup/similarity surface. `portable` is the
#: md5-derived 60-bit hash both Spark AND DuckDB evaluate identically —
#: required for the oracle gate, but md5-per-row is ~3× the cost of a
#: native hash (measured: minhash_dedup 3.4 s → 11.3 s at sf0.1).
#: `xxhash64` is Spark's native 64-bit hash masked to the same 60-bit
#: non-negative range — the production default; DuckDB cannot recompute
#: it, so oracle-verified paths pass family="portable" explicitly.
FAMILIES = ("portable", "xxhash64")


def h64(c: Column, family: str = "portable") -> Column:
    """60-bit non-negative hash of a string column in the chosen family
    (see module docstring and FAMILIES)."""
    if family == "xxhash64":
        return F.xxhash64(c).bitwiseAND(F.lit((1 << 60) - 1))
    if family != "portable":
        raise ValueError(f"unknown hash family {family!r}; one of {FAMILIES}")
    return F.conv(F.substring(F.md5(c.cast("binary")), 1, 15), 16, 10).cast(
        "long"
    )


def h64_sql(expr: str) -> str:
    """The identical hash as a DuckDB SQL expression over `expr`."""
    return f"CAST(('0x' || substring(md5({expr}), 1, 15)) AS BIGINT)"


def h64_py(s: str) -> int:
    """The identical hash in plain Python (for plan-time constants)."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


@lru_cache(maxsize=4)
def minhash_perms(n: int = N_MINHASH) -> tuple[tuple[int, int], ...]:
    """n deterministic (a, b) permutation constants, a ∈ [1, M31),
    b ∈ [0, M31) — seeded PRNG, identical across runs/processes."""
    rng = random.Random(0x5EED_0001)
    return tuple(
        (rng.randrange(1, M31), rng.randrange(0, M31)) for _ in range(n)
    )


def minhash_columns(base_col: Column, n: int = N_MINHASH) -> list[Column]:
    """[h_0, ..., h_{n-1}] over an ALREADY-MATERIALIZED base column
    (h64(term) % M31, computed in its own projection): Catalyst's
    CollapseProject would otherwise inline the md5 into all n
    permutation expressions — measured 64 md5 evals per row, 1.6×
    slower at sf0.1 and linearly worse with n."""
    return [
        ((F.lit(a) * base_col + F.lit(b)) % M31).alias(f"mh{i}")
        for i, (a, b) in enumerate(minhash_perms(n))
    ]


@lru_cache(maxsize=8)
def plane_signs(
    n_tables: int, n_planes: int, dim: int
) -> tuple[tuple[tuple[float, ...], ...], ...]:
    """signs[t][p][i] ∈ {+1.0, -1.0}: Rademacher hyperplane components,
    derived from h64_py so the oracle can re-derive (or embed) them."""
    return tuple(
        tuple(
            tuple(
                1.0 if h64_py(f"hp|{t}|{p}|{i}") % 2 == 0 else -1.0
                for i in range(dim)
            )
            for p in range(n_planes)
        )
        for t in range(n_tables)
    )


def hyperplane_sigs(
    emb_col: Column, dim: int, n_planes: int, n_tables: int
) -> Column:
    """array<long> of per-table sign signatures (bit p of sigs[t] set
    iff emb·plane(t,p) > 0). Plane components are plan-time literals —
    zero per-row hashing, pure codegen arithmetic."""
    signs = plane_signs(n_tables, n_planes, dim)
    sigs = []
    for t in range(n_tables):
        bits = F.lit(0).cast("long")
        for p in range(n_planes):
            plane = F.array(*[F.lit(s) for s in signs[t][p]])
            d = F.aggregate(
                F.zip_with(emb_col, plane, lambda x, s: x.cast("double") * s),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            bits = bits.bitwiseOR(
                F.when(d > 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(
                    F.lit(0).cast("long")
                )
            )
        sigs.append(bits)
    return F.array(*sigs)


def py_hyperplane_sigs(
    vec, dim: int, n_planes: int, n_tables: int
) -> list[int]:
    """Driver-side twin of hyperplane_sigs for a single query vector —
    same plane literals, same left-to-right f64 fold from 0.0, so the
    Python sig is bit-identical to the Spark column's (f64 arithmetic
    is deterministic; float32 embedding values widen exactly). Used by
    the materialized-index probe path to compute the query's bucket
    keys without running a Spark job over the full table."""
    if len(vec) != dim:
        raise ValueError(
            f"query vector has {len(vec)} dims, index built with {dim} — "
            "Spark's zip_with would null-pad while zip() truncates, so a "
            "mismatch silently diverges from the stored signatures"
        )
    signs = plane_signs(n_tables, n_planes, dim)
    sigs = []
    for t in range(n_tables):
        bits = 0
        for p in range(n_planes):
            d = 0.0
            for x, s in zip(vec, signs[t][p]):
                d = d + float(x) * s
            if d > 0:
                bits |= 1 << p
        sigs.append(bits)
    return sigs


@lru_cache(maxsize=4)
def kr_powers(k: int) -> tuple[int, ...]:
    """(B^(k-1), ..., B^1, B^0) mod M31 — Karp-Rabin window weights."""
    return tuple(pow(KR_BASE, k - 1 - j, M31) for j in range(k))
