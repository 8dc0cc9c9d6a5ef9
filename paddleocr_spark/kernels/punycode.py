"""Punycode (RFC 3492 bootstring) — the wire form of IDN hostnames:
the homograph attack surface (functions/homograph.py) reaches a
crawler as `xn--` ACE labels, so the URL layer needs the codec to map
wire hosts to the Unicode form the confusable skeletonizer inspects.

Implemented from the RFC's parameter set (base 36, tmin 1, tmax 26,
skew 38, damp 700, initial_bias 72, initial_n 0x80) — not a wrapper:
the stdlib `idna` codec is used only as the PARITY REFERENCE in tests
and in-runner asserts (encode must byte-match stdlib for every label
stdlib accepts). Decode is the exact inverse and raises on malformed
streams rather than guessing.
"""

from __future__ import annotations

BASE = 36
TMIN = 1
TMAX = 26
SKEW = 38
DAMP = 700
INITIAL_BIAS = 72
INITIAL_N = 0x80


def _adapt(delta: int, numpoints: int, firsttime: bool) -> int:
    delta = delta // DAMP if firsttime else delta // 2
    delta += delta // numpoints
    k = 0
    while delta > ((BASE - TMIN) * TMAX) // 2:
        delta //= BASE - TMIN
        k += BASE
    return k + (((BASE - TMIN + 1) * delta) // (delta + SKEW))


def _digit_char(d: int) -> str:
    return "abcdefghijklmnopqrstuvwxyz0123456789"[d]


def _char_digit(c: str) -> int:
    if "a" <= c <= "z":
        return ord(c) - ord("a")
    if "0" <= c <= "9":
        return ord(c) - ord("0") + 26
    if "A" <= c <= "Z":
        return ord(c) - ord("A")
    raise ValueError(f"invalid punycode digit {c!r}")


def punycode_encode(label: str) -> str:
    """Unicode label -> punycode body (no 'xn--' prefix)."""
    basic = [c for c in label if ord(c) < 0x80]
    out = list(basic)
    h = b = len(basic)
    if b:
        out.append("-")
    n = INITIAL_N
    delta = 0
    bias = INITIAL_BIAS
    while h < len(label):
        m = min(ord(c) for c in label if ord(c) >= n)
        delta += (m - n) * (h + 1)
        n = m
        for c in label:
            cp = ord(c)
            if cp < n:
                delta += 1
            elif cp == n:
                q = delta
                k = BASE
                while True:
                    t = (
                        TMIN
                        if k <= bias
                        else (TMAX if k >= bias + TMAX else k - bias)
                    )
                    if q < t:
                        break
                    out.append(_digit_char(t + (q - t) % (BASE - t)))
                    q = (q - t) // (BASE - t)
                    k += BASE
                out.append(_digit_char(q))
                bias = _adapt(delta, h + 1, h == b)
                delta = 0
                h += 1
        delta += 1
        n += 1
    return "".join(out)


def punycode_decode(body: str) -> str:
    """Punycode body -> Unicode label; exact inverse of encode."""
    pos = body.rfind("-")
    if pos > 0:
        out = list(body[:pos])
        if any(ord(c) >= 0x80 for c in out):
            raise ValueError("non-basic code point in literal portion")
        rest = body[pos + 1 :]
    else:
        out = []
        rest = body[1:] if pos == 0 else body
    n = INITIAL_N
    i = 0
    bias = INITIAL_BIAS
    p = 0
    while p < len(rest):
        oldi = i
        w = 1
        k = BASE
        while True:
            if p >= len(rest):
                raise ValueError("truncated punycode stream")
            digit = _char_digit(rest[p])
            p += 1
            i += digit * w
            t = (
                TMIN
                if k <= bias
                else (TMAX if k >= bias + TMAX else k - bias)
            )
            if digit < t:
                break
            w *= BASE - t
            k += BASE
        bias = _adapt(i - oldi, len(out) + 1, oldi == 0)
        n += i // (len(out) + 1)
        i %= len(out) + 1
        if n < 0x80:
            raise ValueError("decoded basic code point in extended part")
        out.insert(i, chr(n))
        i += 1
    return "".join(out)


def host_to_ascii(host: str) -> str:
    """IDNA ToASCII (lookup subset): lowercase, per-label punycode
    with the 'xn--' ACE prefix for non-ASCII labels."""
    labels = host.lower().split(".")
    out = []
    for lab in labels:
        if all(ord(c) < 0x80 for c in lab):
            out.append(lab)
        else:
            out.append("xn--" + punycode_encode(lab))
    return ".".join(out)


def host_to_unicode(host: str) -> str:
    """Inverse of host_to_ascii for ACE-form hosts."""
    out = []
    for lab in host.lower().split("."):
        if lab.startswith("xn--"):
            out.append(punycode_decode(lab[4:]))
        else:
            out.append(lab)
    return ".".join(out)
