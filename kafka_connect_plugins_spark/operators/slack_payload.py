"""Variant-unifying reshape: two document shapes → one fixed 8-column schema.

Reference: SlackIntegrationPayloadTransformer.kt:25-128. Two payload
generations share a topic:

- V1: token at ``oauth_response_data.bot.bot_access_token``; ``team_id`` /
  ``team_name`` at the top of ``oauth_response_data``; discriminated by the
  presence of the ``bot`` struct (:67-91);
- V2: token at ``oauth_response_data.access_token``; team at
  ``oauth_response_data.team.{id,name}``; optional ``enterprise.id``.

Shared: ``status`` is either Mongo extended JSON ``{"$symbol": "active"}`` or
a plain string (:101-107); ``is_deleted = deleted_at IS NOT NULL`` (:114).
Output (slack-integration-target-schema.avsc): ``account_aggregate_id,
access_token, team_id, team_name, access_token_scopes, enterprise_id,
is_deleted, status``.

Spark expression: the try/catch discrimination becomes ``when(bot IS NOT
NULL, v1_path).otherwise(v2_path)`` — per-variant coalesce over nested
paths; ``$symbol`` parsing uses ``from_json`` to a map (the key contains a
``$`` so JSONPath is avoided). All native Columns, no UDF. This operator is
the model for arbitrary RedactFields-style reshape stages: a projection from
variant nested paths to a stable contract schema.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_connect_plugins_spark.config import ConfigDef
from kafka_connect_plugins_spark.functions.paths import dot_path_exists
from kafka_connect_plugins_spark.operators.base import Stage


class SlackPayloadUnify(Stage):
    config_def = ConfigDef().define("value.column", str, "payload column", default="value")

    def configure(self, config: dict[str, Any]) -> None:
        self.value_column = config["value.column"]

    def apply(self, df: DataFrame) -> DataFrame:
        v = F.col(self.value_column)
        oauth = v.getField("oauth_response_data")

        def has(path: str) -> bool:
            return dot_path_exists(df, self.value_column, path)

        bot_token = (
            oauth.getField("bot").getField("bot_access_token")
            if has("oauth_response_data.bot.bot_access_token")
            else F.lit(None).cast("string")
        )
        v2_token = (
            oauth.getField("access_token")
            if has("oauth_response_data.access_token")
            else F.lit(None).cast("string")
        )
        v1_team_id = (
            oauth.getField("team_id")
            if has("oauth_response_data.team_id")
            else F.lit(None).cast("string")
        )
        v1_team_name = (
            oauth.getField("team_name")
            if has("oauth_response_data.team_name")
            else F.lit(None).cast("string")
        )
        v2_team_id = (
            oauth.getField("team").getField("id")
            if has("oauth_response_data.team.id")
            else F.lit(None).cast("string")
        )
        v2_team_name = (
            oauth.getField("team").getField("name")
            if has("oauth_response_data.team.name")
            else F.lit(None).cast("string")
        )
        v1_enterprise = (
            oauth.getField("enterprise_id")
            if has("oauth_response_data.enterprise_id")
            else F.lit(None).cast("string")
        )
        v2_enterprise = (
            oauth.getField("enterprise").getField("id")
            if has("oauth_response_data.enterprise.id")
            else F.lit(None).cast("string")
        )

        # Variant discrimination: the reference try/catches on `bot` presence
        # (SlackIntegrationPayloadTransformer.kt:67-91). Column form: V1 wins
        # when the bot token is present.
        is_v1 = bot_token.isNotNull()
        status_raw = v.getField("status")
        # {"$symbol": "active"} or plain "active" (:101-107). from_json returns
        # null for non-JSON input, so coalesce falls back to the plain string.
        status_parsed = F.coalesce(
            F.from_json(status_raw, T.MapType(T.StringType(), T.StringType())).getItem("$symbol"),
            status_raw,
        )
        return df.select(
            v.getField("account_aggregate_id").alias("account_aggregate_id"),
            F.when(is_v1, bot_token).otherwise(v2_token).alias("access_token"),
            F.when(is_v1, v1_team_id).otherwise(v2_team_id).alias("team_id"),
            F.when(is_v1, v1_team_name).otherwise(v2_team_name).alias("team_name"),
            oauth.getField("scope").alias("access_token_scopes"),
            F.when(is_v1, v1_enterprise).otherwise(v2_enterprise).alias("enterprise_id"),
            v.getField("deleted_at").isNotNull().alias("is_deleted"),
            status_parsed.alias("status"),
        )
