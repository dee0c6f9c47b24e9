"""Exact integer arithmetic shared by Spark expressions and DuckDB
oracles (both engines must compute published values bit-identically)."""

from __future__ import annotations


def ppm_expr(x: str, n: str, div: str) -> str:
    """floor(x * 1e6 / n) without the 128-bit multiply.

    The naive ``x * 1000000`` overflows int64 once x exceeds ~9.2e12 —
    a few tens of TB of tokens, inside the scale these metrics target —
    and the engines then DIVERGE (Spark wraps or throws by ANSI mode,
    DuckDB promotes to HUGEINT). This expands the nested floor-division
    identity

        floor(x*1e6/n) = (x div n)*1e6 + floor((x mod n)*1e6/n)
        floor(r*1e6/n) = ((r*1000) div n)*1000
                         + ((r*1000 mod n)*1000) div n

    so every intermediate stays in int64 whenever n <= 9.2e15 and the
    quotient x/n <= 9.2e12 (ratio metrics bound the quotient by
    construction: padding/doc <= bucket_cap, subwords/word <= word
    length). ``div`` is the engine's integer-division token — ``div``
    for Spark SQL, ``//`` for DuckDB.
    """
    r = f"(({x}) % ({n}))"
    return (
        f"(({x}) {div} ({n})) * 1000000"
        f" + (({r} * 1000) {div} ({n})) * 1000"
        f" + ((({r} * 1000) % ({n})) * 1000) {div} ({n})"
    )


def fixed_div_expr(x: str, n: str, digits: int, div: str) -> str:
    """floor(x * 10^digits / n) with every intermediate bounded by
    10·n — the digit-at-a-time long-division expansion of ppm_expr,
    for divisors too large for its 1000-wide steps (ppm_expr needs
    n <= 9.2e15; this needs only 10·n <= 9.2e18).

        q = (x div n)·10^digits + Σ_k ((r_{k-1}·10) div n)·10^(digits-k)
        r_k = (r_{k-1}·10) mod n,   r_0 = x mod n

    Cost is an expression tree quadratic in `digits` (each r_k nests the
    previous) — fine for the 4-6 digit scales these metrics use; both
    engines fold it in whole-stage codegen / expression execution.
    ``div`` is the engine's integer-division token (``div`` Spark,
    ``//`` DuckDB)."""
    terms = [f"(({x}) {div} ({n})) * {10 ** digits}"]
    r = f"(({x}) % ({n}))"
    for k in range(1, digits + 1):
        r10 = f"({r} * 10)"
        terms.append(f"(({r10}) {div} ({n})) * {10 ** (digits - k)}")
        r = f"(({r10}) % ({n}))"
    return " + ".join(terms)
