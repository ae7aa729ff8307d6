"""Bit-exactness tests for the reference hash-function cores.

Every expected value below is read from the reference's own stateless test
vectors (tests/queries/0_stateless/00259_hashing_tuples.reference,
00678_murmurhash.reference, 00746_hashing_tuples.reference,
00751_hashing_ints.reference, 01032_cityHash64_for_decimal.reference) —
the same files the golden-corpus gate replays end-to-end through Spark.
These unit tests keep the pure-Python cores honest without a SparkSession.
"""

import struct

from clickhouse_23_3_19_32_lts_spark.functions import chhash_core as C

X64 = 0x4CF2D2BAAE6DA887
S32 = 0x75D9543DE018BF45


def ih64(x):
    return C.inthash64((x ^ X64) & C.M64)


def le(v, w):
    return (v & ((1 << (8 * w)) - 1)).to_bytes(w, "little")


def test_cityhash64_multi_arg_and_tuple():
    # cityHash64(1, 2, '') — 00259_hashing_tuples
    h = C.city_combine(C.city_combine(ih64(1), ih64(2)), C.city64(b""))
    assert h == 3151614220437955012


def test_cityhash64_ints_via_inthash64():
    # cityHash64(123456) — 00751_hashing_ints (use_int_hash_for_pods)
    assert ih64(123456) == 13379111408315310133


def test_cityhash64_decimal_bytes():
    # cityHash64(toDecimal32(32, 2)) — 01032: raw scaled int at width 4
    assert C.city64(le(3200, 4)) == 7948708622144234705


def test_halfmd5_and_sip():
    assert C.halfmd5(le(123456, 4)) == 1452224150530656417
    assert C.siphash64(le(123456, 4)) == 11717965186011240346
    # sipHash64(1, 2, 3) — 00746
    s = C.siphash64(le(1, 1))
    s = C.siphash_combine(s, C.siphash64(le(2, 1)))
    s = C.siphash_combine(s, C.siphash64(le(3, 1)))
    assert s == 12940785793559895259


def test_murmur_family():
    # 00678_murmurhash vectors
    assert C.murmur2_32(le(123456, 4)) == 623211862
    assert C.murmur2_32(le(3, 1)) == 3533626746
    assert C.murmur2_32(struct.pack("<f", 1.2684)) == 2388617433
    assert C.murmur2_32(le(-154477, 8)) == 2708309598
    assert C.murmur2_32(b"foo") == 2414502773
    assert C.murmur2_32(le(1, 1)) == 0
    assert C.murmur2_64(b"foo") == 14834356025302342401
    assert C.murmur2_64(b"\x01") == 12725806677685968135
    assert C.murmur3_32(b"foo") == 4138058784
    assert C.murmur3_32(b"\x01") == 3831157163
    assert C.murmur3_64(b"foo") == 11303473983767132390
    assert C.murmur3_64(b"\x01") == 956517343494314387
    # gccMurmurHash = MurmurHash64A with seed 0xc70f6907
    assert C.murmur2_64(b"foo", 0xC70F6907) == 9631199822919835226


def test_murmur3_128_hex():
    h1, h2 = C.murmur3_128(b"foo")
    assert struct.pack("<QQ", h1, h2).hex().upper() == "6145F501578671E2877DBA2BE487AF7E"


def test_array_stream_fold():
    # sipHash64(('a', [1,2,3], 4, (4, ['foo','bar'], 1, (1, 2)))) — 00746:
    # arrays stream IntHash64(len) + element tokens into the RUNNING fold
    def si(v):
        return C.siphash64(le(v, 1))

    hs = [
        C.siphash64(b"a"), ih64(3), si(1), si(2), si(3), si(4), si(4),
        ih64(2), C.siphash64(b"foo"), C.siphash64(b"bar"), si(1), si(1), si(2),
    ]
    acc = hs[0]
    for h in hs[1:]:
        acc = C.siphash_combine(acc, h)
    assert acc == 7456555839952096623


def test_inthash32_rotate_mix():
    # murmurHash2_32(1, 2, 3) = 2822869866 (00746) exercises
    # IntHash32Impl's rotate-based combine
    def comb32(a, b):
        return (C.inthash32((a ^ S32) & C.M64) ^ b) & C.M32

    h = C.murmur2_32(le(1, 1))
    h = comb32(h, C.murmur2_32(le(2, 1)))
    h = comb32(h, C.murmur2_32(le(3, 1)))
    assert h == 2822869866


def test_farm64_short():
    # farmFingerprint64('123456') — 00751
    assert C.farm64(b"123456") == 7773179648686038998


def test_javahash():
    assert C.javahash(b"abc") == 96354
    assert C.hivehash(b"abc") == 96354
