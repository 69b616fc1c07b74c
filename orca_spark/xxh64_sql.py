"""DuckDB-SQL re-derivation of Spark's ``xxhash64`` — the fragment that
lets the MinHash/SimHash dedup family graduate from rows-only driver
checks to full value oracles (r11 verdict item 1).

Spark's ``xxhash64(cols...)`` is the reference XXH64 algorithm (seed 42,
little-endian lane reads) applied to each argument's UTF-8 bytes with
the running hash as the next argument's seed. DuckDB has no xxhash
built-in and its 64-bit integer arithmetic traps on overflow, so the
generator below emits a *pure-SQL scalar expression* that evaluates
XXH64 exactly, for any input length, using only constructs the oracle
harness already relies on (``multimodal7._PPM_TILE_SQL`` precedent):

* all 64-bit mod-2^64 arithmetic runs in HUGEINT with 32-bit limb
  multiplication (``a*b mod 2^64`` via ``al*bl + ((ah*bl + al*bh) mod
  2^32)<<32`` — every intermediate < 2^66, far inside HUGEINT);
* rotations are exact divide/multiply by powers of two (no masking);
* bytes come from ``hex(encode(s))`` nibble parsing, so the hashed
  bytes are the UTF-8 encoding Spark hashes;
* the three variable-length loops of XXH64 (32-byte stripes, 8-byte
  words, tail bytes) are ``list_reduce`` folds with the accumulator
  prepended (DuckDB 1.0 semantics: first element is the initial
  accumulator);
* single-use ``list_transform([v], x -> body)[1]`` let-bindings keep
  the emitted expression linear in size — naive inlining of the merge
  and avalanche steps would blow up 2^k-fold because each step
  references its input twice.

The emitted SQL is large (~15 KB per application) but constant-size per
column, vectorizes across rows, and — the point — is *bit-exact* vs
Spark for every input length and seed (property-tested against a live
SparkSession in tests/test_xxh64_sql.py, including the 0/4/8/31/32/33-
byte phase boundaries and multi-byte UTF-8).

No reference parity: the reference (core.clj) has no hashing surface;
this is oracle infrastructure for the LLM-pipeline extensions.
"""

from __future__ import annotations

# XXH64 primes (public domain algorithm constants, Cyan4973/xxHash).
_P1 = 11400714785074694791
_P2 = 14029467366897019727
_P3 = 1609587929392839161
_P4 = 9650029242287828579
_P5 = 2870177450012600261

_M64 = 1 << 64
_M32 = 1 << 32

# every generated let-binding gets a fresh variable name; the counter is
# module-global so independently generated fragments can be composed in
# one statement without capture collisions
_ctr = [0]


def _v(prefix: str = "x") -> str:
    _ctr[0] += 1
    return f"_{prefix}{_ctr[0]}"


def _let(bindings: list[tuple[str, str]], body: str) -> str:
    """Nested single-value let-bindings: list_transform([e], v -> b)[1].

    Each bound expression is evaluated once however many times the body
    references the name — the lever that keeps XXH64's self-referencing
    steps (h appears 2x per merge/avalanche stage) linear in SQL size.
    """
    for name, expr in reversed(bindings):
        body = f"list_transform([{expr}], {name} -> ({body}))[1]"
    return body


def _mulc(a: str, c: int) -> str:
    """(a * c) mod 2^64 for a SIMPLE ref ``a`` and constant ``c``.

    32-bit limb product: every intermediate fits HUGEINT. ``a`` is
    referenced three times — callers must pass a let-bound name or
    lambda variable, never a compound expression.
    """
    cl, ch = c % _M32, c // _M32
    return (
        f"((({a}) % {_M32}) * {cl}"
        f" + (((({a}) // {_M32}) * {cl} + (({a}) % {_M32}) * {ch})"
        f" % {_M32}) * {_M32}) % {_M64}"
    )


def _rot(a: str, r: int) -> str:
    """rotl64 for a SIMPLE ref — exact divide/multiply, no masking."""
    lo = 1 << (64 - r)
    return f"((({a}) % {lo}) * {1 << r} + (({a}) // {lo}))"


def _round(acc: str, lane: str) -> str:
    """XXH64 round() for SIMPLE refs acc/lane: rot31(acc + lane*P2)*P1."""
    t, u = _v("rd"), _v("rr")
    return _let(
        [(t, f"(({acc}) + {_mulc(lane, _P2)}) % {_M64}"), (u, _rot(t, 31))],
        _mulc(u, _P1),
    )


def _merge(h: str, vx: str) -> str:
    """XXH64 mergeRound for SIMPLE refs: (h ^ round(0, v)) * P1 + P4."""
    k, x = _v("mg"), _v("mx")
    return _let(
        [
            (k, _round("0::HUGEINT", vx)),
            (x, f"xor(({h})::HUGEINT, {k}::HUGEINT)"),
        ],
        f"({_mulc(x, _P1)} + {_P4}) % {_M64}",
    )


def _avalanche(h: str) -> str:
    """Final mix for a SIMPLE ref h."""
    a1, a2, a3, a4 = _v("av"), _v("av"), _v("av"), _v("av")
    return _let(
        [
            (a1, f"xor(({h})::HUGEINT, (({h}) // {1 << 33})::HUGEINT)"),
            (a2, _mulc(a1, _P2)),
            (a3, f"xor({a2}::HUGEINT, ({a2} // {1 << 29})::HUGEINT)"),
            (a4, _mulc(a3, _P3)),
        ],
        f"xor({a4}::HUGEINT, ({a4} // {_M32})::HUGEINT)",
    )


def _word64(bl: str, off: str) -> str:
    """Little-endian 8-byte read from the HUGEINT byte list ``bl`` at
    0-based offset expression ``off`` (referenced 8 times — keep simple)."""
    return (
        "("
        + " + ".join(f"{bl}[({off}) + {j + 1}] * {1 << (8 * j)}" for j in range(8))
        + ")"
    )


def _word32(bl: str, off: str) -> str:
    return (
        "("
        + " + ".join(f"{bl}[({off}) + {j + 1}] * {1 << (8 * j)}" for j in range(4))
        + ")"
    )


def xxh64(data: str, seed: str | int = 42) -> str:
    """DuckDB scalar SQL: XXH64 of the UTF-8 bytes of string expression
    ``data`` with ``seed`` (SQL expression or int), as HUGEINT in
    [0, 2^64). Compose chains by passing a previous result as ``seed``
    (Spark's multi-argument ``xxhash64`` semantics); convert the final
    value with :func:`to_signed` to match Spark's BIGINT output.
    """
    hx, n, bl, sd = _v("hx"), _v("n"), _v("bl"), _v("sd")
    i = _v("i")
    nibble = (
        f"(strpos('0123456789ABCDEF', substr({hx}, 2*{i}-1, 1)) - 1) * 16"
        f" + (strpos('0123456789ABCDEF', substr({hx}, 2*{i}, 1)) - 1)"
    )
    bytes_list = (
        f"list_transform(range(1, {n} + 1), {i} -> ({nibble})::HUGEINT)"
    )

    # --- n >= 32: stripe fold over {a,b,c,d} word structs --------------
    s, va, vx = _v("s"), _v("va"), _v("vx")
    stripe_elems = (
        f"list_transform(range(0, {n} // 32), {s} -> "
        f"{{'a': {_word64(bl, f'{s}*32')}, 'b': {_word64(bl, f'{s}*32+8')}, "
        f"'c': {_word64(bl, f'{s}*32+16')}, 'd': {_word64(bl, f'{s}*32+24')}}})"
    )
    stripe_init = (
        f"{{'a': ({sd} + {(_P1 + _P2) % _M64}) % {_M64}, "
        f"'b': ({sd} + {_P2}) % {_M64}, "
        f"'c': {sd}, "
        f"'d': ({sd} + {_M64 - _P1}) % {_M64}}}"
    )
    stripe_fold = (
        f"list_reduce(list_prepend({stripe_init}, {stripe_elems}), "
        f"({va}, {vx}) -> {{'a': {_round(f'{va}.a', f'{vx}.a')}, "
        f"'b': {_round(f'{va}.b', f'{vx}.b')}, "
        f"'c': {_round(f'{va}.c', f'{vx}.c')}, "
        f"'d': {_round(f'{va}.d', f'{vx}.d')}}})"
    )
    vv, c0, c1, c2, c3 = _v("vv"), _v("cv"), _v("cv"), _v("cv"), _v("cv")
    converged = _let(
        [
            (vv, stripe_fold),
            (
                c0,
                f"({_rot(f'{vv}.a', 1)} + {_rot(f'{vv}.b', 7)}"
                f" + {_rot(f'{vv}.c', 12)} + {_rot(f'{vv}.d', 18)}) % {_M64}",
            ),
            (c1, _merge(c0, f"{vv}.a")),
            (c2, _merge(c1, f"{vv}.b")),
            (c3, _merge(c2, f"{vv}.c")),
        ],
        _merge(c3, f"{vv}.d"),
    )
    acc0 = (
        f"CASE WHEN {n} >= 32 THEN ({converged}) "
        f"ELSE ({sd} + {_P5}) % {_M64} END"
    )

    # --- tail: 8-byte words, one 4-byte word, single bytes -------------
    off0 = f"(({n} // 32) * 32)"  # bytes the stripe phase consumed
    k, wa, wx = _v("k"), _v("wa"), _v("wx")
    w1, w2 = _v("w"), _v("w")
    word_step = _let(
        [
            (w1, _round("0::HUGEINT", wx)),
            (w2, f"xor({wa}::HUGEINT, {w1}::HUGEINT)"),
        ],
        _let([(w1 + "r", _rot(w2, 27))], f"({_mulc(w1 + 'r', _P1)} + {_P4}) % {_M64}"),
    )
    words = (
        f"list_transform(range(0, ({n} - {off0}) // 8), {k} -> "
        f"{_word64(bl, f'{off0} + 8*{k}')})"
    )
    h0, h1, h2 = _v("h"), _v("h"), _v("h")
    off1 = f"({off0} + (({n} - {off0}) // 8) * 8)"
    f1, f2 = _v("f"), _v("f")
    four_step = _let(
        [
            (f1, f"({_word32(bl, off1)} * 1)::HUGEINT"),
            (f2, f"xor({h1}::HUGEINT, ({_mulc(f1, _P1)})::HUGEINT)"),
        ],
        _let([(f2 + "r", _rot(f2, 23))], f"({_mulc(f2 + 'r', _P2)} + {_P3}) % {_M64}"),
    )
    j, ba, bx = _v("j"), _v("ba"), _v("bx")
    b1 = _v("b")
    byte_step = _let(
        [(b1, f"xor({ba}::HUGEINT, (({bx} * {_P5}) % {_M64})::HUGEINT)")],
        _let([(b1 + "r", _rot(b1, 11))], _mulc(b1 + "r", _P1)),
    )
    off2 = f"({off1} + CASE WHEN {n} - {off1} >= 4 THEN 4 ELSE 0 END)"
    tail_bytes = f"list_transform(range({off2}, {n}), {j} -> {bl}[{j} + 1])"

    # the avalanche input must be let-bound (it is referenced 2x inside)
    h3 = _v("h")
    body = _let(
        [
            (h0, f"(({acc0}) + {n}) % {_M64}"),
            (
                h1,
                f"list_reduce(list_prepend({h0}::HUGEINT, {words}), "
                f"({wa}, {wx}) -> {word_step})",
            ),
            (h2, f"CASE WHEN {n} - {off1} >= 4 THEN ({four_step}) ELSE {h1} END"),
            (
                h3,
                f"list_reduce(list_prepend({h2}::HUGEINT, {tail_bytes}), "
                f"({ba}, {bx}) -> {byte_step})",
            ),
        ],
        _avalanche(h3),
    )

    enc, sdr = _v("enc"), _v("sdr")
    return _let(
        [
            (enc, f"encode({data})"),
            (hx, f"hex({enc})"),
            (n, f"octet_length({enc})"),
            # the raw seed is let-bound before the 3-reference sign
            # normalization — ``seed`` may itself be a full chained
            # fragment, and inlining one of those three times trips the
            # DuckDB 1.0 duplication bug to_signed documents
            (sdr, f"({seed})::HUGEINT"),
            (sd, f"(({sdr}) % {_M64} + {_M64}) % {_M64}"),
            (bl, bytes_list),
        ],
        body,
    )


def to_signed(u: str) -> str:
    """HUGEINT in [0, 2^64) → Spark's signed BIGINT (two's complement).

    The argument is let-bound BEFORE the 3-reference CASE: inlining a
    full xxh64 fragment three times trips a DuckDB 1.0 evaluation bug
    (lambda-heavy subtrees duplicated at that scale mis-bind their
    input vectors and fail with a spurious STRING→BLOB cast error on
    mixed-length multi-row inputs — reproduced and isolated while
    building this module; a single let-bound reference is reliable).
    """
    t = _v("ts")
    return _let(
        [(t, u)],
        f"CAST(CASE WHEN {t} >= {1 << 63} THEN {t} - {_M64} "
        f"ELSE {t} END AS BIGINT)",
    )
