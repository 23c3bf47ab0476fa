"""Marketing attribution (SURVEY F25 + F5/F6/F7 composed:
stg_shopify__order_attribution → int_shopify__orders_enriched →
mart_marketing_performance) and unpivot/stack.

Landing/referrer fields are synthesized deterministically per event with
identical expressions in both engines; the extraction + classification logic
is exactly the reference's.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from importer_spark.functions import dec, out_double
from importer_spark.io import Tables
from importer_spark.queries.registry import query

_SYNTH_SQL = """
  SELECT event_id, user_id, value,
    (['https://s.example.com/checkout?utm_source=google&utm_medium=cpc&utm_campaign=spring+sale',
      'https://s.example.com/?utm_source=newsletter&utm_medium=email',
      'https://s.example.com/products/anchor-kit',
      ''])[(event_id % 4) + 1] AS landing_site,
    (['https://www.google.com/search?q=anchors',
      'https://m.facebook.com/groups/diy',
      ''])[(event_id % 3) + 1] AS referring_site,
    CASE WHEN event_id % 5 = 0 THEN 'web' ELSE 'pos' END AS source_name
  FROM events
"""

_ATTRIBUTION_SQL = f"""
WITH raw AS ({_SYNTH_SQL}),
extracted AS (
  SELECT *,
    split_part(landing_site, '?', 1) AS landing_page,
    regexp_replace(regexp_extract(landing_site, 'utm_source=([^&]*)', 1), '\\+', ' ', 'g')
      AS utm_source,
    regexp_replace(regexp_extract(landing_site, 'utm_medium=([^&]*)', 1), '\\+', ' ', 'g')
      AS utm_medium,
    regexp_replace(regexp_extract(landing_site, 'utm_campaign=([^&]*)', 1), '\\+', ' ', 'g')
      AS utm_campaign
  FROM raw
),
classified AS (
  SELECT *,
    CASE
      WHEN utm_source <> '' THEN 'Paid'
      WHEN referring_site SIMILAR TO '.*(google|bing|duckduckgo).*' THEN 'Organic Search'
      WHEN referring_site <> '' THEN 'Referral'
      WHEN source_name = 'web' THEN 'Direct'
      ELSE 'Unknown'
    END AS acquisition_channel
  FROM extracted
)
SELECT acquisition_channel,
       nullif(utm_source, '') AS utm_source,
       nullif(utm_campaign, '') AS utm_campaign,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM classified
GROUP BY 1, 2, 3
"""


@query("marketing_attribution", oracle=_ATTRIBUTION_SQL)
def marketing_attribution(spark, sf_dir):
    """F25 acquisition-channel classifier with strict precedence (reference:
    int_shopify__orders_enriched.sql:45-53) over F5/F6/F7 UTM extraction
    (stg_shopify__order_attribution.sql:16-47: query-string strip, capture
    groups, '+'-decode), rolled up mart_marketing_performance-style."""
    t = Tables(spark, sf_dir)
    raw = t.events.select(
        "event_id",
        "user_id",
        "value",
        F.element_at(
            F.array(
                F.lit("https://s.example.com/checkout?utm_source=google&utm_medium=cpc&utm_campaign=spring+sale"),
                F.lit("https://s.example.com/?utm_source=newsletter&utm_medium=email"),
                F.lit("https://s.example.com/products/anchor-kit"),
                F.lit(""),
            ),
            (F.col("event_id") % 4 + 1).cast("int"),
        ).alias("landing_site"),
        F.element_at(
            F.array(
                F.lit("https://www.google.com/search?q=anchors"),
                F.lit("https://m.facebook.com/groups/diy"),
                F.lit(""),
            ),
            (F.col("event_id") % 3 + 1).cast("int"),
        ).alias("referring_site"),
        F.when(F.col("event_id") % 5 == 0, "web").otherwise("pos").alias("source_name"),
    )

    def utm(param):
        return F.regexp_replace(
            F.regexp_extract(F.col("landing_site"), f"{param}=([^&]*)", 1), r"\+", " "
        )

    extracted = raw.select(
        "*",
        F.split_part(F.col("landing_site"), F.lit("?"), F.lit(1)).alias("landing_page"),
        utm("utm_source").alias("utm_source"),
        utm("utm_medium").alias("utm_medium"),
        utm("utm_campaign").alias("utm_campaign"),
    )
    channel = (
        F.when(F.col("utm_source") != "", "Paid")
        .when(F.col("referring_site").rlike("(google|bing|duckduckgo)"), "Organic Search")
        .when(F.col("referring_site") != "", "Referral")
        .when(F.col("source_name") == "web", "Direct")
        .otherwise("Unknown")
    )
    return (
        extracted.withColumn("acquisition_channel", channel)
        .groupBy(
            "acquisition_channel",
            F.nullif(F.col("utm_source"), F.lit("")).alias("utm_source"),
            F.nullif(F.col("utm_campaign"), F.lit("")).alias("utm_campaign"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            out_double(F.sum(dec(F.col("value")))).alias("total_value"),
        )
    )


_UNPIVOT_SQL = """
WITH wide AS (
  SELECT c_mktsegment AS mktsegment,
    CAST(SUM(CASE WHEN c_acctbal < 0 THEN CAST(c_acctbal AS DECIMAL(18,2)) END) AS DOUBLE)
      AS negative_balance,
    CAST(SUM(CASE WHEN c_acctbal >= 0 THEN CAST(c_acctbal AS DECIMAL(18,2)) END) AS DOUBLE)
      AS positive_balance
  FROM customer GROUP BY 1
)
SELECT mktsegment, metric, amount
FROM wide, LATERAL (VALUES
  ('negative_balance', negative_balance),
  ('positive_balance', positive_balance)
) t(metric, amount)
"""


@query("unpivot_balances", oracle=_UNPIVOT_SQL)
def unpivot_balances(spark, sf_dir):
    """Unpivot via stack(): wide metric columns → (metric, value) rows —
    the inverse of pivot_revenue, used to normalize metric stacks. A NULL
    metric cell stays a row (a segment with no negative balances is
    information); the oracle therefore unpivots with explicit LATERAL
    VALUES — SQL's UNPIVOT clause silently DROPS null cells, which would
    desync row counts the day a segment's metric goes empty."""
    t = Tables(spark, sf_dir)
    neg = F.sum(F.when(F.col("c_acctbal") < 0, dec(F.col("c_acctbal"))))
    pos = F.sum(F.when(F.col("c_acctbal") >= 0, dec(F.col("c_acctbal"))))
    wide = t.customer.groupBy(F.col("c_mktsegment").alias("mktsegment")).agg(
        out_double(neg).alias("negative_balance"),
        out_double(pos).alias("positive_balance"),
    )
    return wide.selectExpr(
        "mktsegment",
        "stack(2, 'negative_balance', negative_balance, "
        "'positive_balance', positive_balance) AS (metric, amount)",
    )
