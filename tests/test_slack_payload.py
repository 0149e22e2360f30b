"""SlackPayloadUnify: the {V1,V2} x {live,deleted} x {status-encoding} matrix
from SlackIntegrationPayloadTransformerTest.kt:27-188."""

from pyspark.sql import types as T

from kafka_connect_plugins_spark.operators import SlackPayloadUnify
from tests.helpers import make_envelope_df

OAUTH_T = T.StructType(
    [
        T.StructField("access_token", T.StringType()),
        T.StructField("team_id", T.StringType()),
        T.StructField("team_name", T.StringType()),
        T.StructField("scope", T.StringType()),
        T.StructField("enterprise_id", T.StringType()),
        T.StructField(
            "team",
            T.StructType([T.StructField("id", T.StringType()), T.StructField("name", T.StringType())]),
        ),
        T.StructField(
            "enterprise",
            T.StructType([T.StructField("id", T.StringType()), T.StructField("name", T.StringType())]),
        ),
        T.StructField("bot", T.StructType([T.StructField("bot_access_token", T.StringType())])),
    ]
)
VALUE_T = T.StructType(
    [
        T.StructField("account_aggregate_id", T.StringType()),
        T.StructField("oauth_response_data", OAUTH_T),
        T.StructField("deleted_at", T.StringType()),
        T.StructField("status", T.StringType()),
    ]
)

V1 = {
    "account_aggregate_id": "acct-1",
    "oauth_response_data": {
        "access_token": None,
        "team_id": "T-V1",
        "team_name": "Team V1",
        "scope": "read,write",
        "enterprise_id": "E-V1",
        "team": None,
        "enterprise": None,
        "bot": {"bot_access_token": "xoxb-v1-token"},
    },
    "deleted_at": None,
    "status": '{"$symbol": "active"}',  # mongo5 extended-JSON encoding
}
V2 = {
    "account_aggregate_id": "acct-2",
    "oauth_response_data": {
        "access_token": "xoxb-v2-token",
        "team_id": None,
        "team_name": None,
        "scope": "read",
        "enterprise_id": None,
        "team": {"id": "T-V2", "name": "Team V2"},
        "enterprise": {"id": "E-V2", "name": "Ent"},
        "bot": None,
    },
    "deleted_at": "2021-11-01T00:00:00Z",
    "status": "inactive",  # mongo6 plain-string encoding
}


def test_variant_unification(spark):
    df = make_envelope_df(spark, VALUE_T, [{"value": V1}, {"value": V2}])
    out = {r["account_aggregate_id"]: r for r in SlackPayloadUnify().apply(df).collect()}
    v1, v2 = out["acct-1"], out["acct-2"]
    # V1: bot token + top-level team fields (SlackIntegrationPayloadTransformer.kt:67-80)
    assert v1["access_token"] == "xoxb-v1-token"
    assert (v1["team_id"], v1["team_name"]) == ("T-V1", "Team V1")
    assert v1["enterprise_id"] == "E-V1"
    assert v1["is_deleted"] is False
    assert v1["status"] == "active"  # $symbol parse (:101-107)
    assert v1["access_token_scopes"] == "read,write"
    # V2: top-level token + nested team/enterprise (:81-91)
    assert v2["access_token"] == "xoxb-v2-token"
    assert (v2["team_id"], v2["team_name"]) == ("T-V2", "Team V2")
    assert v2["enterprise_id"] == "E-V2"
    assert v2["is_deleted"] is True  # deleted_at non-null (:114)
    assert v2["status"] == "inactive"  # plain-string passthrough


def test_output_schema_is_fixed_8_columns(spark):
    df = make_envelope_df(spark, VALUE_T, [{"value": V1}])
    out = SlackPayloadUnify().apply(df)
    assert out.columns == [
        "account_aggregate_id",
        "access_token",
        "team_id",
        "team_name",
        "access_token_scopes",
        "enterprise_id",
        "is_deleted",
        "status",
    ]
