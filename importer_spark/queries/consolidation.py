"""Company consolidation mart — the reference's flagship entity-resolution
flow (int_quickbooks__company_consolidation.sql + domain_consolidation.py)
end-to-end: name normalization (X3) → grouping key → representative
selection (W4) → member roll-ups (A5/A6-style).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from importer_spark.functions import string_agg_sorted
from importer_spark.functions.domains import normalize_customer_name
from importer_spark.io import Tables
from importer_spark.queries.registry import query

# Deterministic name-variant synthesis: the same customer name appears with
# the suffix noise the reference strips (End User / Customer / Client).
# ~5 customers share each base name (custkey % 300) under different suffix
# noise — consolidation must converge them onto one company key.
_VARIANTS_SQL = """
  SELECT c_custkey AS cust_key, c_acctbal, c_mktsegment,
    'Company ' || CAST(c_custkey % 300 AS VARCHAR)
      || (['', ' - End User', ' (Customer)', '   Client', ','])[(c_custkey % 5) + 1]
      AS raw_name
  FROM customer
"""

_CONSOLIDATION_SQL = f"""
WITH variants AS ({_VARIANTS_SQL}),
grouped AS (
  SELECT *,
    -- company identity: the shared seed (stand-in for normalized domain);
    -- name cleanup must still converge variants of the same name
    lower(trim(regexp_replace(regexp_replace(regexp_replace(raw_name,
      '(?i)\\s*[-(]?\\s*(end user|customer|client)\\s*[)]?\\s*$', ''),
      '\\s+', ' ', 'g'),
      ',\\s*$', ''))) AS normalized_name
  FROM variants
)
SELECT
  normalized_name AS company_key,
  COUNT(*) AS n_members,
  MIN(raw_name) AS canonical_variant,
  string_agg(DISTINCT c_mktsegment, ' | ' ORDER BY c_mktsegment) AS segments,
  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_balance,
  MAX(length(raw_name)) AS longest_variant_len
FROM grouped
GROUP BY normalized_name
"""


@query("company_consolidation", oracle=_CONSOLIDATION_SQL)
def company_consolidation(spark, sf_dir):
    """X3 + A5 + W4 composed: suffix-noise normalization converges name
    variants onto one company key; roll-ups aggregate members (reference:
    int_quickbooks__company_consolidation.sql:30-133,
    domain_consolidation.py:102-132). One shuffle on the normalized key."""
    t = Tables(spark, sf_dir)
    variants = t.customer.select(
        F.col("c_custkey").alias("cust_key"),
        "c_acctbal",
        "c_mktsegment",
        F.concat(
            F.lit("Company "),
            (F.col("c_custkey") % 300).cast("string"),
            F.element_at(
                F.array(
                    F.lit(""), F.lit(" - End User"), F.lit(" (Customer)"),
                    F.lit("   Client"), F.lit(","),
                ),
                (F.col("c_custkey") % 5 + 1).cast("int"),
            ),
        ).alias("raw_name"),
    )
    grouped = variants.withColumn(
        "normalized_name", F.lower(normalize_customer_name(F.col("raw_name")))
    )
    return grouped.groupBy(F.col("normalized_name").alias("company_key")).agg(
        F.count("*").alias("n_members"),
        F.min("raw_name").alias("canonical_variant"),
        string_agg_sorted("c_mktsegment", " | ").alias("segments"),
        F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double").alias("total_balance"),
        F.max(F.length("raw_name")).alias("longest_variant_len"),
    )


_FUZZY_SQL = """
WITH names AS (SELECT DISTINCT p_name FROM part)
SELECT a.p_name AS name_a, b.p_name AS name_b,
  CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS edit_dist
FROM names a JOIN names b
  ON a.p_name < b.p_name AND levenshtein(a.p_name, b.p_name) <= 2
"""


@query("part_name_fuzzy_matches", oracle=_FUZZY_SQL)
def part_name_fuzzy_matches(spark, sf_dir):
    """Edit-distance fuzzy match over the part-name vocabulary — the typo
    arm of entity resolution (the reference consolidates only systematic
    suffix noise, domain_consolidation.py:102-132; real ingest also has
    misspellings). PassJoin pigeonhole candidate generation (lossless for
    lev ≤ 2, linear in name length) + JVM thresholded levenshtein verify;
    the oracle runs the all-pairs theta join this operator exists to
    avoid."""
    from importer_spark.operators.fuzzy import fuzzy_match_pairs

    t = Tables(spark, sf_dir)
    return fuzzy_match_pairs(t.part, "p_name", max_dist=2)


def _representative_sql() -> str:
    return f"""
WITH variants AS ({_VARIANTS_SQL}),
grouped AS (
  SELECT *,
    lower(trim(regexp_replace(regexp_replace(regexp_replace(raw_name,
      '(?i)\\s*[-(]?\\s*(end user|customer|client)\\s*[)]?\\s*$', ''),
      '\\s+', ' ', 'g'),
      ',\\s*$', ''))) AS normalized_name
  FROM variants
)
SELECT DISTINCT
  normalized_name AS company_key,
  FIRST_VALUE(raw_name) OVER (
    PARTITION BY normalized_name
    ORDER BY length(raw_name) DESC, raw_name ASC) AS representative_name,
  FIRST_VALUE(cust_key) OVER (
    PARTITION BY normalized_name
    ORDER BY c_acctbal DESC, cust_key ASC) AS top_balance_member
FROM grouped
"""


@query("company_representatives", oracle=_representative_sql())
def company_representatives(spark, sf_dir):
    """W4 representative selection per consolidated company: longest name
    variant + highest-balance member
    (int_quickbooks__company_consolidation.sql:30-84)."""
    t = Tables(spark, sf_dir)
    variants = t.customer.select(
        F.col("c_custkey").alias("cust_key"),
        "c_acctbal",
        F.concat(
            F.lit("Company "),
            (F.col("c_custkey") % 300).cast("string"),
            F.element_at(
                F.array(
                    F.lit(""), F.lit(" - End User"), F.lit(" (Customer)"),
                    F.lit("   Client"), F.lit(","),
                ),
                (F.col("c_custkey") % 5 + 1).cast("int"),
            ),
        ).alias("raw_name"),
    )
    grouped = variants.withColumn(
        "normalized_name", F.lower(normalize_customer_name(F.col("raw_name")))
    )
    w_len = Window.partitionBy("normalized_name").orderBy(
        F.length("raw_name").desc(), F.col("raw_name").asc()
    )
    w_bal = Window.partitionBy("normalized_name").orderBy(
        F.col("c_acctbal").desc(), F.col("cust_key").asc()
    )
    return grouped.select(
        F.col("normalized_name").alias("company_key"),
        F.first_value(F.col("raw_name")).over(w_len).alias("representative_name"),
        F.first_value(F.col("cust_key")).over(w_bal).alias("top_balance_member"),
    ).distinct()
