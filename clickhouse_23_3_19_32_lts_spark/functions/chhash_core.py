"""Bit-exact pure-Python cores of the reference's hash functions.

Reference: src/Functions/FunctionsHashing.h registers cityHash64, sipHash64,
halfMD5, murmurHash2_32/64, murmurHash3_32/64, intHash32/64, javaHash,
hiveHash over the bundled public-domain/BSD algorithm implementations
(contrib/cityhash102, contrib/murmurhash; SipHash in src/Common/SipHash.h).
These are reimplementations of the published algorithms (CityHash v1.0.2 —
Google, MIT; SipHash-2-4 — Aumasson/Bernstein, CC0; MurmurHash — Appleby,
public domain), validated against the reference's own stateless-test
.reference vectors (tests/queries/0_stateless/00259_hashing_tuples.reference
et al.).

Semantics (FunctionsHashing.h):
  - fixed-size values hash their little-endian byte image at the CH type
    width; strings hash their raw bytes
  - multi-arg / tuple args flatten, hash per element, then fold pairwise
    with the family's combineHashes
"""

from __future__ import annotations

import hashlib
import struct

M64 = (1 << 64) - 1
M32 = (1 << 32) - 1

# --- CityHash v1.0.2 (64-bit) ----------------------------------------------

_K0 = 0xC3A5C85C97CB3127
_K1 = 0xB492B66FBE98F273
_K2 = 0x9AE16A3B2F90404F
_K3 = 0xC949D7C7509E6557
_KMUL = 0x9DDFEA08EB382D69


def _rot(v: int, s: int) -> int:
    return ((v >> s) | (v << (64 - s))) & M64 if s else v


def _rot_at_least_1(v: int, s: int) -> int:
    return _rot(v, s & 63) if (s & 63) else _rot(v, 1)


def _shift_mix(v: int) -> int:
    return (v ^ (v >> 47)) & M64


def _f64(s: bytes, i: int = 0) -> int:
    return struct.unpack_from("<Q", s, i)[0]


def _f32(s: bytes, i: int = 0) -> int:
    return struct.unpack_from("<I", s, i)[0]


def hash128to64(lo: int, hi: int) -> int:
    a = ((lo ^ hi) * _KMUL) & M64
    a ^= a >> 47
    b = ((hi ^ a) * _KMUL) & M64
    b ^= b >> 47
    return (b * _KMUL) & M64


def _hash_len16(u: int, v: int) -> int:
    return hash128to64(u, v)


def _hash_len_0_to_16(s: bytes) -> int:
    n = len(s)
    if n > 8:
        a = _f64(s)
        b = _f64(s, n - 8)
        return (_hash_len16(a, _rot_at_least_1((b + n) & M64, n)) ^ b) & M64
    if n >= 4:
        a = _f32(s)
        return _hash_len16((n + (a << 3)) & M64, _f32(s, n - 4))
    if n > 0:
        a, b, c = s[0], s[n >> 1], s[n - 1]
        y = (a + (b << 8)) & M64
        z = (n + (c << 2)) & M64
        return (_shift_mix((y * _K2 ^ z * _K3) & M64) * _K2) & M64
    return _K2


def _hash_len_17_to_32(s: bytes) -> int:
    n = len(s)
    a = (_f64(s) * _K1) & M64
    b = _f64(s, 8)
    c = (_f64(s, n - 8) * _K2) & M64
    d = (_f64(s, n - 16) * _K0) & M64
    return _hash_len16(
        (_rot((a - b) & M64, 43) + _rot(c, 30) + d) & M64,
        (a + _rot((b ^ _K3) & M64, 20) - c + n) & M64,
    )


def _weak_hash_len32_with_seeds_words(
    w: int, x: int, y: int, z: int, a: int, b: int
) -> tuple[int, int]:
    a = (a + w) & M64
    b = _rot((b + a + z) & M64, 21)
    c = a
    a = (a + x + y) & M64
    b = (b + _rot(a, 44)) & M64
    return (a + z) & M64, (b + c) & M64


def _weak_hash_len32_with_seeds(s: bytes, i: int, a: int, b: int) -> tuple[int, int]:
    return _weak_hash_len32_with_seeds_words(
        _f64(s, i), _f64(s, i + 8), _f64(s, i + 16), _f64(s, i + 24), a, b
    )


def _hash_len_33_to_64(s: bytes) -> int:
    n = len(s)
    z = _f64(s, 24)
    a = (_f64(s) + (n + _f64(s, n - 16)) * _K0) & M64
    b = _rot((a + z) & M64, 52)
    c = _rot(a, 37)
    a = (a + _f64(s, 8)) & M64
    c = (c + _rot(a, 7)) & M64
    a = (a + _f64(s, 16)) & M64
    vf = (a + z) & M64
    vs = (b + _rot(a, 31) + c) & M64
    a = (_f64(s, 16) + _f64(s, n - 32)) & M64
    z = _f64(s, n - 8)
    b = _rot((a + z) & M64, 52)
    c = _rot(a, 37)
    a = (a + _f64(s, n - 24)) & M64
    c = (c + _rot(a, 7)) & M64
    a = (a + _f64(s, n - 16)) & M64
    wf = (a + z) & M64
    ws = (b + _rot(a, 31) + c) & M64
    r = _shift_mix(((vf + ws) * _K2 + (wf + vs) * _K0) & M64)
    return (_shift_mix((r * _K0 + vs) & M64) * _K2) & M64


def city64(s: bytes) -> int:
    n = len(s)
    if n <= 16:
        return _hash_len_0_to_16(s)
    if n <= 32:
        return _hash_len_17_to_32(s)
    if n <= 64:
        return _hash_len_33_to_64(s)
    x = _f64(s)
    y = (_f64(s, n - 16) ^ _K1) & M64
    z = (_f64(s, n - 56) ^ _K0) & M64
    v = _weak_hash_len32_with_seeds(s, n - 64, n, y)
    w = _weak_hash_len32_with_seeds(s, n - 32, (n * _K1) & M64, _K0)
    z = (z + _shift_mix(v[1]) * _K1) & M64
    x = (_rot((z + x) & M64, 39) * _K1) & M64
    y = (_rot(y, 33) * _K1) & M64
    n2 = (n - 1) & ~63
    i = 0
    while True:
        x = (_rot((x + y + v[0] + _f64(s, i + 16)) & M64, 37) * _K1) & M64
        y = (_rot((y + v[1] + _f64(s, i + 48)) & M64, 42) * _K1) & M64
        x ^= w[1]
        y ^= v[0]
        z = _rot((z ^ w[0]) & M64, 33)
        v = _weak_hash_len32_with_seeds(s, i, (v[1] * _K1) & M64, (x + w[0]) & M64)
        w = _weak_hash_len32_with_seeds(s, i + 32, (z + w[1]) & M64, y)
        z, x = x, z
        i += 64
        n2 -= 64
        if n2 == 0:
            break
    return _hash_len16(
        (_hash_len16(v[0], w[0]) + _shift_mix(y) * _K1 + z) & M64,
        (_hash_len16(v[1], w[1]) + x) & M64,
    )


def city_combine(h1: int, h2: int) -> int:
    """FunctionsHashing.h CityHash64::combineHashes."""
    return hash128to64(h1, h2)


# --- SipHash-2-4, k0 = k1 = 0 (src/Common/SipHash.h) ------------------------


def _sipround(v0, v1, v2, v3):
    v0 = (v0 + v1) & M64
    v1 = _rotl64(v1, 13) ^ v0
    v0 = _rotl64(v0, 32)
    v2 = (v2 + v3) & M64
    v3 = _rotl64(v3, 16) ^ v2
    v0 = (v0 + v3) & M64
    v3 = _rotl64(v3, 21) ^ v0
    v2 = (v2 + v1) & M64
    v1 = _rotl64(v1, 17) ^ v2
    v2 = _rotl64(v2, 32)
    return v0, v1, v2, v3


def _rotl64(v: int, s: int) -> int:
    return ((v << s) | (v >> (64 - s))) & M64


def siphash64(s: bytes, k0: int = 0, k1: int = 0) -> int:
    v0 = 0x736F6D6570736575 ^ k0
    v1 = 0x646F72616E646F6D ^ k1
    v2 = 0x6C7967656E657261 ^ k0
    v3 = 0x7465646279746573 ^ k1
    n = len(s)
    end = n - (n % 8)
    for i in range(0, end, 8):
        m = _f64(s, i)
        v3 ^= m
        v0, v1, v2, v3 = _sipround(v0, v1, v2, v3)
        v0, v1, v2, v3 = _sipround(v0, v1, v2, v3)
        v0 ^= m
    b = (n & 0xFF) << 56
    tail = s[end:]
    for i, c in enumerate(tail):
        b |= c << (8 * i)
    v3 ^= b
    v0, v1, v2, v3 = _sipround(v0, v1, v2, v3)
    v0, v1, v2, v3 = _sipround(v0, v1, v2, v3)
    v0 ^= b
    v2 ^= 0xFF
    for _ in range(4):
        v0, v1, v2, v3 = _sipround(v0, v1, v2, v3)
    return (v0 ^ v1 ^ v2 ^ v3) & M64


def siphash_combine(h1: int, h2: int) -> int:
    """SipHash64 combineHashes: sipHash64 of the two hashes' 16 bytes."""
    return siphash64(struct.pack("<QQ", h1, h2))


# --- halfMD5: first 8 bytes of MD5, big-endian (FunctionsHashing.h) ---------


def halfmd5(s: bytes) -> int:
    return struct.unpack(">Q", hashlib.md5(s).digest()[:8])[0]


def halfmd5_combine(h1: int, h2: int) -> int:
    return halfmd5(struct.pack("<QQ", h1, h2))


# --- intHash32 / intHash64 (src/Common/HashTable/Hash.h) --------------------


def inthash64(x: int) -> int:
    x &= M64
    x ^= x >> 33
    x = (x * 0xFF51AFD7ED558CCD) & M64
    x ^= x >> 33
    x = (x * 0xC4CEB9FE1A85EC53) & M64
    x ^= x >> 33
    return x


def inthash32(x: int, salt: int = 0) -> int:
    """intHash32<salt> (Hash.h:499) — Wang mix with ROTATES, not shifts."""
    k = (x ^ salt) & M64
    k = (~k + (k << 18)) & M64
    k ^= ((k >> 31) | (k << 33)) & M64
    k = (k * 21) & M64
    k ^= ((k >> 11) | (k << 53)) & M64
    k = (k + (k << 6)) & M64
    k ^= ((k >> 22) | (k << 42)) & M64
    return k & M32


# --- MurmurHash2 (seed 0 — contrib/murmurhash) ------------------------------


def murmur2_64(s: bytes, seed: int = 0) -> int:
    m = 0xC6A4A7935BD1E995
    r = 47
    n = len(s)
    h = (seed ^ ((n * m) & M64)) & M64
    end = n - (n % 8)
    for i in range(0, end, 8):
        k = _f64(s, i)
        k = (k * m) & M64
        k ^= k >> r
        k = (k * m) & M64
        h ^= k
        h = (h * m) & M64
    tail = s[end:]
    for i in range(len(tail) - 1, -1, -1):
        h ^= tail[i] << (8 * i)
    if tail:
        h = (h * m) & M64
    h ^= h >> r
    h = (h * m) & M64
    h ^= h >> r
    return h


def murmur2_32(s: bytes, seed: int = 0) -> int:
    m = 0x5BD1E995
    r = 24
    n = len(s)
    h = (seed ^ n) & M32
    end = n - (n % 4)
    for i in range(0, end, 4):
        k = _f32(s, i)
        k = (k * m) & M32
        k ^= k >> r
        k = (k * m) & M32
        h = (h * m) & M32
        h ^= k
    tail = s[end:]
    for i in range(len(tail) - 1, -1, -1):
        h ^= tail[i] << (8 * i)
    if tail:
        h = (h * m) & M32
    h ^= h >> 13
    h = (h * m) & M32
    h ^= h >> 15
    return h


# --- MurmurHash3 (x86_32 and x64_128 — contrib/murmurhash) ------------------


def murmur3_32(s: bytes, seed: int = 0) -> int:
    c1, c2 = 0xCC9E2D51, 0x1B873593
    n = len(s)
    h = seed & M32
    end = n - (n % 4)
    for i in range(0, end, 4):
        k = _f32(s, i)
        k = (k * c1) & M32
        k = ((k << 15) | (k >> 17)) & M32
        k = (k * c2) & M32
        h ^= k
        h = ((h << 13) | (h >> 19)) & M32
        h = (h * 5 + 0xE6546B64) & M32
    k = 0
    tail = s[end:]
    for i in range(len(tail) - 1, -1, -1):
        k = (k << 8) | tail[i]
    if tail:
        k = (k * c1) & M32
        k = ((k << 15) | (k >> 17)) & M32
        k = (k * c2) & M32
        h ^= k
    h ^= n
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & M32
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & M32
    h ^= h >> 16
    return h


def _fmix64(k: int) -> int:
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & M64
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & M64
    k ^= k >> 33
    return k


def murmur3_128(s: bytes, seed: int = 0) -> tuple[int, int]:
    c1 = 0x87C37B91114253D5
    c2 = 0x4CF5AD432745937F
    n = len(s)
    h1 = h2 = seed & M64
    nblocks = n // 16
    for i in range(nblocks):
        k1 = _f64(s, i * 16)
        k2 = _f64(s, i * 16 + 8)
        k1 = (k1 * c1) & M64
        k1 = _rotl64(k1, 31)
        k1 = (k1 * c2) & M64
        h1 ^= k1
        h1 = _rotl64(h1, 27)
        h1 = (h1 + h2) & M64
        h1 = (h1 * 5 + 0x52DCE729) & M64
        k2 = (k2 * c2) & M64
        k2 = _rotl64(k2, 33)
        k2 = (k2 * c1) & M64
        h2 ^= k2
        h2 = _rotl64(h2, 31)
        h2 = (h2 + h1) & M64
        h2 = (h2 * 5 + 0x38495AB5) & M64
    tail = s[nblocks * 16 :]
    k1 = k2 = 0
    tl = len(tail)
    for i in range(tl - 1, 7, -1):
        k2 = (k2 << 8) | tail[i]
    for i in range(min(tl, 8) - 1, -1, -1):
        k1 = (k1 << 8) | tail[i]
    if tl > 8:
        k2 = (k2 * c2) & M64
        k2 = _rotl64(k2, 33)
        k2 = (k2 * c1) & M64
        h2 ^= k2
    if tl > 0:
        k1 = (k1 * c1) & M64
        k1 = _rotl64(k1, 31)
        k1 = (k1 * c2) & M64
        h1 ^= k1
    h1 ^= n
    h2 ^= n
    h1 = (h1 + h2) & M64
    h2 = (h2 + h1) & M64
    h1 = _fmix64(h1)
    h2 = _fmix64(h2)
    h1 = (h1 + h2) & M64
    h2 = (h2 + h1) & M64
    return h1, h2


def murmur3_64(s: bytes) -> int:
    """murmurHash3_64: low 64 bits of the x64_128 variant
    (FunctionsHashing.h MurmurHash3Impl64 returns h[0] ^ h[1])."""
    h1, h2 = murmur3_128(s)
    return (h1 ^ h2) & M64


# --- javaHash / hiveHash ----------------------------------------------------


def javahash(s: bytes) -> int:
    h = 0
    for c in s:
        h = (31 * h + c) & M32
    return h - (1 << 32) if h >= (1 << 31) else h


def hivehash(s: bytes) -> int:
    return javahash(s) & 0x7FFFFFFF


# --- FarmHash na::Hash64 / Fingerprint64 (Google, MIT — contrib/farmhash) ---
# The <=32-byte paths are validated against the reference's own vector
# (00751_hashing_ints: farmFingerprint64('123456')); longer inputs follow the
# published farmhashna structure.


def _farm_h16(u: int, v: int, mul: int) -> int:
    a = ((u ^ v) * mul) & M64
    a ^= a >> 47
    b = ((v ^ a) * mul) & M64
    b ^= b >> 47
    return (b * mul) & M64


def _farm_len_0_16(s: bytes) -> int:
    n = len(s)
    if n >= 8:
        mul = (_K2 + n * 2) & M64
        a = (_f64(s) + _K2) & M64
        b = _f64(s, n - 8)
        c = (_rot(b, 37) * mul + a) & M64
        d = ((_rot(a, 25) + b) * mul) & M64
        return _farm_h16(c, d, mul)
    if n >= 4:
        mul = (_K2 + n * 2) & M64
        a = _f32(s)
        return _farm_h16((n + (a << 3)) & M64, _f32(s, n - 4), mul)
    if n > 0:
        a, b, c = s[0], s[n >> 1], s[n - 1]
        y = (a + (b << 8)) & M32
        z = (n + (c << 2)) & M32
        return (_shift_mix((y * _K2 ^ z * _K0) & M64) * _K2) & M64
    return _K2


def _farm_len_17_32(s: bytes) -> int:
    n = len(s)
    mul = (_K2 + n * 2) & M64
    a = (_f64(s) * _K1) & M64
    b = _f64(s, 8)
    c = (_f64(s, n - 8) * mul) & M64
    d = (_f64(s, n - 16) * _K2) & M64
    return _farm_h16(
        (_rot((a + b) & M64, 43) + _rot(c, 30) + d) & M64,
        (a + _rot((b + _K2) & M64, 18) + c) & M64,
        mul,
    )


def _farm_len_33_64(s: bytes) -> int:
    n = len(s)
    mul = (_K2 + n * 2) & M64
    a = (_f64(s) * _K2) & M64
    b = _f64(s, 8)
    c = _f64(s, n - 24)
    d = _f64(s, n - 32)
    e = (_f64(s, 16) * _K2) & M64
    f = (_f64(s, 24) * 9) & M64
    g = _f64(s, n - 8)
    h = (_f64(s, n - 16) * mul) & M64
    u = (_rot((a + g) & M64, 43) + (_rot(b, 30) + c) * 9) & M64
    v = (((a + g) ^ d) + f + 1) & M64
    w = (int.from_bytes((((u + v) * mul) & M64).to_bytes(8, "little"), "big") + h) & M64
    x = (_rot((e + f) & M64, 42) + c) & M64
    y = (
        (int.from_bytes((((v + w) * mul) & M64).to_bytes(8, "little"), "big") + g)
        * mul
    ) & M64
    z = (e + f + c) & M64
    a = (
        int.from_bytes((((x + z) * mul + y) & M64).to_bytes(8, "little"), "big") + b
    ) & M64
    b = (_shift_mix(((z + a) * mul + d + h) & M64) * mul) & M64
    return (b + x) & M64


def farm64(s: bytes) -> int:
    n = len(s)
    if n <= 16:
        return _farm_len_0_16(s)
    if n <= 32:
        return _farm_len_17_32(s)
    if n <= 64:
        return _farm_len_33_64(s)
    seed = 81
    x = seed
    y = (seed * _K1 + 113) & M64
    z = (_shift_mix((y * _K2 + 113) & M64) * _K2) & M64
    v = (0, 0)
    w = (0, 0)
    x = (x * _K2 + _f64(s)) & M64
    end = ((n - 1) // 64) * 64
    last64 = end + ((n - 1) & 63) - 63
    i = 0
    while True:
        x = (_rot((x + y + v[0] + _f64(s, i + 8)) & M64, 37) * _K1) & M64
        y = (_rot((y + v[1] + _f64(s, i + 48)) & M64, 42) * _K1) & M64
        x ^= w[1]
        y = (y + v[0] + _f64(s, i + 40)) & M64
        z = (_rot((z + w[0]) & M64, 33) * _K1) & M64
        v = _weak_hash_len32_with_seeds(s, i, (v[1] * _K1) & M64, (x + w[0]) & M64)
        w = _weak_hash_len32_with_seeds(
            s, i + 32, (z + w[1]) & M64, (y + _f64(s, i + 16)) & M64
        )
        z, x = x, z
        i += 64
        if i == end:
            break
    mul = (_K1 + ((z & 0xFF) << 1)) & M64
    i = last64
    w = ((w[0] + ((n - 1) & 63)) & M64, w[1])
    v = ((v[0] + w[0]) & M64, v[1])
    w = ((w[0] + v[0]) & M64, w[1])
    x = (_rot((x + y + v[0] + _f64(s, i + 8)) & M64, 37) * mul) & M64
    y = (_rot((y + v[1] + _f64(s, i + 48)) & M64, 42) * mul) & M64
    x ^= (w[1] * 9) & M64
    y = (y + v[0] * 9 + _f64(s, i + 40)) & M64
    z = (_rot((z + w[0]) & M64, 33) * mul) & M64
    v = _weak_hash_len32_with_seeds(s, i, (v[1] * mul) & M64, (x + w[0]) & M64)
    w = _weak_hash_len32_with_seeds(
        s, i + 32, (z + w[1]) & M64, (y + _f64(s, i + 16)) & M64
    )
    z, x = x, z
    return _farm_h16(
        (_farm_h16(v[0], w[0], mul) + _shift_mix(y) * _K0 + z) & M64,
        (_farm_h16(v[1], w[1], mul) + x) & M64,
        mul,
    )


def farm_fingerprint_combine(lo: int, hi: int) -> int:
    """farmhash Fingerprint(uint128) — like Hash128to64 but 47/44/41 shifts."""
    a = ((lo ^ hi) * _KMUL) & M64
    a ^= a >> 47
    b = ((hi ^ a) * _KMUL) & M64
    b ^= b >> 44
    b = (b * _KMUL) & M64
    b ^= b >> 41
    return (b * _KMUL) & M64


# --- jumpConsistentHash (Lamping & Veach, public algorithm) -----------------


def jump_consistent_hash(key: int, buckets: int) -> int:
    key &= M64
    b, j = -1, 0
    while j < buckets:
        b = j
        key = (key * 2862933555777941757 + 1) & M64
        j = int((b + 1) * (float(1 << 31) / float((key >> 33) + 1)))
    return b
