"""Grisu2 double-to-string, output-compatible with nlohmann::json's
serializer (the JSON library the reference links for its GeoJSON
output, src/osm2pgsql-expire.cpp tile_to_json).

Python's repr() produces the true shortest round-trip representation
(Gay/Ryu); Grisu2 (Loitsch, PLDI 2010, "Printing Floating-Point
Numbers Quickly and Accurately with Integers") is only *almost*
always shortest — in ~0.5% of cases it emits one extra digit.  To
reproduce the reference's golden files byte-for-byte we must emit
exactly Grisu2's digits, so this is a from-paper reimplementation
with the same parameters nlohmann uses (alpha=-60, gamma=-32, cached
powers of 10^(8k)).  The cached-power table is computed exactly from
big-integer arithmetic instead of being pasted in.
"""

from __future__ import annotations

import struct

_ALPHA = -60
_GAMMA = -32
_MASK64 = (1 << 64) - 1

# cached powers: round-to-nearest 64-bit significands of 10^k for
# k = -300, -292, ..., 324 (step 8), as in the published Grisu tables
_CACHE_MIN_K = -300
_CACHE_STEP = 8


def _make_cached(k: int) -> tuple[int, int]:
    """(f, e) with f * 2^e the round-to-nearest 64-bit approximation of
    10^k, 2^63 <= f < 2^64."""
    if k >= 0:
        num, den = 10 ** k, 1
    else:
        num, den = 1, 10 ** (-k)
    # choose e so the quotient has exactly 64 bits
    e = num.bit_length() - den.bit_length() - 64
    while True:
        if e >= 0:
            q, r = divmod(num, den << e)
        else:
            q, r = divmod(num << -e, den)
        if q >= (1 << 64):
            e += 1
            continue
        if q < (1 << 63):
            e -= 1
            continue
        break
    # round to nearest (ties away — the table values are plain nearest;
    # no 10^k with k in range lands exactly on a tie at 64 bits)
    half = (den << e) if e >= 0 else den
    if 2 * r >= half:
        q += 1
        if q == (1 << 64):
            q >>= 1
            e += 1
    return q, e


_CACHED = [
    (_make_cached(k), k)
    for k in range(_CACHE_MIN_K, 325, _CACHE_STEP)
]


def _cached_power_for(e: int) -> tuple[int, int, int]:
    """Cached power 10^k such that alpha <= e_c + e + 64 <= gamma
    (nlohmann get_cached_power_for_binary_exponent): returns (f, e_c, k)."""
    # k = ceil((alpha - e - 1) * log10(2)); the integer magic below is
    # the standard fixed-point approximation, exact for |e| < 1500
    f = _ALPHA - e - 1
    q = f * 78913
    # C99 truncating division
    k = q // (1 << 18) if q >= 0 else -((-q) // (1 << 18))
    if f > 0:
        k += 1
    index = (-_CACHE_MIN_K + k + (_CACHE_STEP - 1)) // _CACHE_STEP
    (cf, ce), ck = _CACHED[index]
    return cf, ce, ck


def _mul(fa: int, ea: int, fb: int, eb: int) -> tuple[int, int]:
    """DiyFp multiply with round-to-nearest of the 128-bit product's
    high half (the paper's and nlohmann's rounding: +2^63)."""
    p = fa * fb
    f = (p + (1 << 63)) >> 64
    return f & _MASK64, ea + eb + 64


def _round(digits: list, dist: int, delta: int, rest: int, ten_k: int) -> None:
    while (rest < dist and delta - rest >= ten_k
           and (rest + ten_k < dist or dist - rest > rest + ten_k - dist)):
        digits[-1] -= 1
        rest += ten_k


def _digit_gen(mm_f: int, w_f: int, mp_f: int, e: int) -> tuple[str, int]:
    """Digits + decimal exponent offset for the scaled interval
    [M-, M+] around w, all sharing exponent e in [alpha, gamma]."""
    delta = mp_f - mm_f
    dist = mp_f - w_f
    one_f = 1 << (-e)
    p1 = mp_f >> (-e)
    p2 = mp_f & (one_f - 1)
    digits: list[int] = []
    exponent = 0
    # integer part: emit decimal digits of p1 high-to-low
    n = len(str(p1))
    while n > 0:
        pow10 = 10 ** (n - 1)
        d, p1 = divmod(p1, pow10)
        digits.append(d)
        n -= 1
        rest = (p1 << (-e)) + p2
        if rest <= delta:
            exponent += n
            _round(digits, dist, delta, rest, pow10 << (-e))
            return "".join(chr(48 + d) for d in digits), exponent
    # fractional part
    while True:
        p2 *= 10
        delta *= 10
        dist *= 10
        d = p2 >> (-e)
        digits.append(d)
        p2 &= one_f - 1
        exponent -= 1
        if p2 <= delta:
            _round(digits, dist, delta, p2, one_f)
            return "".join(chr(48 + d) for d in digits), exponent


def _grisu2(value: float) -> tuple[str, int]:
    """(digits, decimal_exponent) with value = 0.digits * 10^(k+len)…
    precisely: value ≈ digits * 10^decimal_exponent."""
    bits = struct.unpack("<Q", struct.pack("<d", value))[0]
    frac = bits & ((1 << 52) - 1)
    biased = bits >> 52
    if biased == 0:
        f, e = frac, -1074
    else:
        f, e = frac | (1 << 52), biased - 1075
    # boundaries
    lower_closer = frac == 0 and biased > 1
    mp_f, mp_e = (f << 1) + 1, e - 1
    if lower_closer:
        mm_f, mm_e = (f << 2) - 1, e - 2
    else:
        mm_f, mm_e = (f << 1) - 1, e - 1
    # normalize m_plus, then m_minus to the same exponent; normalize v
    shift = 64 - mp_f.bit_length()
    mp_f <<= shift
    mp_e -= shift
    mm_f <<= mm_e - mp_e
    mm_e = mp_e
    vshift = 64 - f.bit_length()
    v_f, v_e = f << vshift, e - vshift

    cf, ce, ck = _cached_power_for(mp_e)
    w_f, w_e = _mul(v_f, v_e, cf, ce)
    MP_f, MP_e = _mul(mp_f, mp_e, cf, ce)
    MM_f, _ = _mul(mm_f, mm_e, cf, ce)
    # shrink the interval by one ulp on each side to guarantee that
    # anything we print round-trips
    digits, exp_off = _digit_gen(MM_f + 1, w_f, MP_f - 1, MP_e)
    return digits, -ck + exp_off


def dtoa(value: float) -> str:
    """Format like nlohmann::json: shortest-Grisu2 digits, plain
    decimal for exponents in (-5, 17], scientific otherwise, integral
    doubles as 'd.0'."""
    if value != value:
        return "null"  # JSON has no NaN; callers shouldn't pass one
    if value == 0.0:
        return "-0.0" if struct.pack("<d", value)[7] & 0x80 else "0.0"
    sign = ""
    if value < 0:
        sign = "-"
        value = -value
    digits, k = _grisu2(value)
    n = len(digits) + k  # position of the decimal point
    if len(digits) <= n <= 17:
        return sign + digits + "0" * (n - len(digits)) + ".0"
    if 0 < n <= 17:
        return sign + digits[:n] + "." + digits[n:]
    if -5 < n <= 0:
        return sign + "0." + "0" * (-n) + digits
    # scientific: d[.ddd]e±EE (at least two exponent digits)
    mant = digits[0] + ("." + digits[1:] if len(digits) > 1 else "")
    exp = n - 1
    esign = "-" if exp < 0 else "+"
    return f"{sign}{mant}e{esign}{abs(exp):02d}"
