"""Randomized parity batteries: Spark expressions vs independent Python.

The reference pins hashing and key semantics with a handful of goldens
(PartitionerTest.kt:11-19, UnquoteRecordKeyTest.kt:44-114); these tests widen
that to hundreds of generated cases per run, comparing the whole batch in one
DataFrame against pure-Python reimplementations (zlib.crc32, Kotlin
``removeSurrounding`` semantics).
"""

import random
import zlib

from pyspark.sql import functions as F

from kafka_connect_plugins_spark.functions.hashing import crc32_pmod
from kafka_connect_plugins_spark.functions.strings import unquote_both_ends

_RNG = random.Random(0xC0FFEE)

_ALPHABETS = [
    "abcdefghijklmnopqrstuvwxyz0123456789-|/._",
    'ABC"\'\\ \t|',
    "é日本語🎉½",
]


def _rand_strings(n: int) -> list[str]:
    out = []
    for _ in range(n):
        alpha = _RNG.choice(_ALPHABETS)
        out.append("".join(_RNG.choice(alpha) for _ in range(_RNG.randint(0, 24))))
    return out


def test_crc32_pmod_matches_zlib(spark):
    cases = _rand_strings(400) + [
        "", "my-string", "04a96f30-3dfa-11ec-9bbc-0242ac130002", "a" * 1000
    ]
    df = spark.createDataFrame([(s,) for s in cases], "s string")
    got = {
        r.s: (r.p10, r.p7)
        for r in df.select(
            "s",
            crc32_pmod(F.col("s"), 10).alias("p10"),
            crc32_pmod(F.col("s"), 7).alias("p7"),
        ).collect()
    }
    for s in cases:
        c = zlib.crc32(s.encode("utf-8"))
        assert got[s] == (c % 10, c % 7), s


def _kotlin_remove_surrounding(s: str) -> str:
    # Kotlin removeSurrounding(delimiter): strip iff startswith AND endswith
    # AND len >= 2*len(delim)
    if len(s) >= 2 and s.startswith('"') and s.endswith('"'):
        return s[1:-1]
    return s


def test_unquote_matches_kotlin_semantics(spark):
    cases = _rand_strings(300) + [
        '"', '""', '"""', '"a"', '"a', 'a"', "", "a", '"ab"cd"', '" "', "'q'"
    ]
    df = spark.createDataFrame([(s,) for s in cases], "s string")
    got = {r.s: r.u for r in df.select("s", unquote_both_ends(F.col("s")).alias("u")).collect()}
    for s in cases:
        assert got[s] == _kotlin_remove_surrounding(s), repr(s)
