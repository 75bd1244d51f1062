"""Engine-portable arithmetic hashing constants.

Dedup/fingerprint operators must be verifiable against an independent SQL
engine (the driver's DuckDB oracle), so every hash on the data path that
feeds a *checked* result is plain 64-bit-safe integer arithmetic over
dense token ids — identical in Spark SQL and ANSI SQL — rather than an
engine-specific hash builtin. (xxhash64 is still used where only Spark
consumes the value, e.g. vertex ids.)

MinHash permutation family: h_i(x) = (A_i * x + B_i) mod P, P prime.
All intermediates stay < 2^63: x < P ≈ 1e9, A_i < 2^7 → A_i*x + B_i < 2^40.
"""

from __future__ import annotations

P = 1_000_000_007
NUM_PERM = 16
ROWS_PER_BAND = 2
NUM_BANDS = NUM_PERM // ROWS_PER_BAND

SIMHASH_BITS = 16

FP_A = 1_315_423_911  # fingerprint token multiplier
FP_B = 2_654_435_761  # fingerprint position multiplier


def perm_coeffs(i: int) -> tuple[int, int]:
    """Deterministic coefficients of the i-th minhash permutation."""
    return 2 * i + 1, 7919 * (i + 1)


def minhash_expr_sql(i: int, x: str = "tid") -> str:
    """SQL text of h_i(x) — same string used by the Spark plan and the
    DuckDB oracle so the two engines cannot diverge."""
    a, b = perm_coeffs(i)
    return f"(({a} * {x} + {b}) % {P})"


def simhash_bit_expr_sql(k: int, x: str = "tid") -> str:
    """SQL text of the ±1 contribution of token-hash bit k."""
    h = minhash_expr_sql(0, x)
    return f"(CASE WHEN ({h} // {2**k}) % 2 = 1 THEN 1 ELSE -1 END)"


def fingerprint_term_sql(tid: str = "tid", pos: str = "pos") -> str:
    """SQL text of one position-sensitive fingerprint term."""
    return f"(({FP_A} * {tid} + {FP_B} * {pos}) % {P})"
