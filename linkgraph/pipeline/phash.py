"""Engine-portable hash family for LSH-style operators.

Round 1 used ``xxhash64`` for minhash/simhash, which no other engine can
reproduce, so those queries had no independent SQL oracle. This module
replaces it with a seeded affine (multiplicative) family over Z_p:

    h_i(x) = (a_i * x + b_i) mod P,   P = 1_000_000_007

with ``x`` a polynomial character hash of the input string. Every step
is exact int64 arithmetic (all intermediates < 2^60), so the identical
computation is expressible in DuckDB SQL — each Spark Column builder
here has a ``*_sql`` twin emitting the equivalent SQL fragment, and the
driver oracle in ``__spark_entry__.py`` assembles full queries from
them. Affine maps over Z_p are a classic universal hash family, so
MinHash/SimHash quality matches the xxhash64 version.

Hot-path note: the string hash ``x`` is computed ONCE per shingle/token;
the per-function work is one multiply-add-mod — cheaper than round 1's
per-(i, shingle) xxhash64 calls.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

P = 1_000_000_007  # modulus: products of two residues stay < 2^60
BASE = 131  # character-polynomial base
LEN_MIX = 9176  # mixes string length into bounded-prefix hashes
COMBINE = 1_000_003  # base for combining signature rows into a band bucket


def seeded_coeffs(n: int, seed: int) -> list[tuple[int, int]]:
    """n deterministic (a, b) pairs, a in [1, P), b in [0, P).

    A bare LCG (numerical-recipes constants) rather than ``random`` so
    the constants are reproducible from first principles in any
    language/engine if ever needed.
    """
    state = (seed * 2654435761 + 1) % (1 << 32)
    out = []
    for _ in range(n):
        state = (state * 1664525 + 1013904223) % (1 << 32)
        a = state % (P - 1) + 1
        state = (state * 1664525 + 1013904223) % (1 << 32)
        b = state % P
        out.append((a, b))
    return out


def _pow_base(j: int) -> int:
    return pow(BASE, j, P)


# ---------------------------------------------------------------------------
# fixed-length (shingle) character hash: x = sum_j cp_j * BASE^(k-1-j) mod P
# codepoints < 2^21, BASE^j mod P < 2^30 -> each term < 2^51, k terms < 2^55
# ---------------------------------------------------------------------------


def char_hash(col: Column, k: int) -> Column:
    """Polynomial hash of the first ``k`` characters (Spark side).

    Positions past the end contribute 0 WITHOUT a branch: both engines
    define substring-past-end = '' and ascii('') = 0 (verified), so
    strings shorter than ``k`` hash consistently — and dropping the
    per-char CASE guards shrinks whole-stage codegen ~3×.
    """
    total = F.lit(0).cast("long")
    for j in range(k):
        c = _pow_base(k - 1 - j)
        total = total + F.ascii(F.substring(col, j + 1, 1)).cast("long") * F.lit(c)
    return total % F.lit(P)


def char_hash_sql(expr: str, k: int) -> str:
    """DuckDB twin of :func:`char_hash` over SQL expression ``expr``."""
    terms = []
    for j in range(k):
        c = _pow_base(k - 1 - j)
        terms.append(
            f"CAST(ascii(substring({expr}, {j + 1}, 1)) AS BIGINT) * {c}"
        )
    return f"(({' + '.join(terms)}) % {P})"


# ---------------------------------------------------------------------------
# variable-length (token) hash: 8-char-prefix polynomial + length mixing
# ---------------------------------------------------------------------------

TOKEN_PREFIX = 8


def token_hash(col: Column) -> Column:
    """Hash of an arbitrary-length token (Spark side): polynomial over
    the first 8 characters plus ``len * LEN_MIX`` so same-prefix tokens
    of different length split."""
    total = F.lit(0).cast("long")
    for j in range(TOKEN_PREFIX):
        c = _pow_base(TOKEN_PREFIX - 1 - j)
        total = total + F.ascii(F.substring(col, j + 1, 1)).cast("long") * F.lit(c)
    total = total + F.length(col).cast("long") * F.lit(LEN_MIX)
    return total % F.lit(P)


def token_hash_sql(expr: str) -> str:
    terms = []
    for j in range(TOKEN_PREFIX):
        c = _pow_base(TOKEN_PREFIX - 1 - j)
        terms.append(
            f"CAST(ascii(substring({expr}, {j + 1}, 1)) AS BIGINT) * {c}"
        )
    terms.append(f"CAST(length({expr}) AS BIGINT) * {LEN_MIX}")
    return f"(({' + '.join(terms)}) % {P})"


# ---------------------------------------------------------------------------
# affine family members over a precomputed x
# ---------------------------------------------------------------------------


def affine(x: Column, a: int, b: int) -> Column:
    return (x * F.lit(a) + F.lit(b)) % F.lit(P)


def affine_sql(expr: str, a: int, b: int) -> str:
    return f"(({expr} * {a} + {b}) % {P})"


def combine(values: list[Column]) -> Column:
    """Fold signature rows into one band-bucket key (Spark side)."""
    acc = F.lit(0).cast("long")
    for v in values:
        acc = (acc * F.lit(COMBINE) + v) % F.lit(P)
    return acc


def combine_sql(exprs: list[str]) -> str:
    acc = "0"
    for e in exprs:
        acc = f"((({acc}) * {COMBINE} + {e}) % {P})"
    return acc
