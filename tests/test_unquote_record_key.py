"""UnquoteRecordKey semantics from UnquoteRecordKeyTest.kt:44-114."""

from pyspark.sql import types as T

from kafka_connect_plugins_spark.operators import UnquoteRecordKey
from tests.helpers import make_envelope_df

VALUE_T = T.StructType([T.StructField("name", T.StringType())])


def _apply(spark, keys):
    df = make_envelope_df(spark, VALUE_T, [{"key": k, "value": {"name": "v"}} for k in keys])
    out = UnquoteRecordKey().apply(df).orderBy("offset")
    return [r["key"] for r in out.collect()]


def test_unquote_matrix(spark):
    cases = {
        '"8a7e82f0-c5b5-11eb-aa56-e9a8d6b3bd79"': "8a7e82f0-c5b5-11eb-aa56-e9a8d6b3bd79",
        "plain-key": "plain-key",  # unquoted passes through (:76-88)
        '"leading-only': '"leading-only',  # single-side quote preserved (:91-98)
        'trailing-only"': 'trailing-only"',
        '"': '"',  # single char: removeSurrounding requires len >= 2
        '""': "",  # exactly one pair
        '""x""': '"x"',  # strips only ONE pair
        None: None,  # null key passthrough (:101-113)
    }
    got = _apply(spark, list(cases.keys()))
    assert got == list(cases.values())


def test_value_preserved(spark):
    df = make_envelope_df(spark, VALUE_T, [{"key": '"k"', "value": {"name": "payload"}}])
    row = UnquoteRecordKey().apply(df).first()
    assert row["value"]["name"] == "payload"
    assert row["topic"] == "test-topic"
