"""Domain / name / country normalization (SURVEY §2.10 X1-X4, §2.3 F26).

The reference implements these as driver-side Python over psycopg2 rows
(domain_consolidation.py) and a dbt Jinja macro family
(macros/country_normalization.sql). Here they are Column expressions driven
by Python constant lists — evaluated JVM-side per row, broadcast-free (the
lists compile into the plan).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MARKETPLACE_DOMAINS = ["marketplace.amazon.com"]
INDIVIDUAL_EMAIL_DOMAINS = [
    # reference: config/individual_email_domains.txt
    "gmail.com", "yahoo.com", "hotmail.com", "outlook.com", "aol.com",
    "icloud.com", "msn.com", "live.com", "comcast.net", "att.net",
]

US_STATE_CODES = [
    "AL", "AK", "AZ", "AR", "CA", "CO", "CT", "DE", "FL", "GA", "HI", "ID",
    "IL", "IN", "IA", "KS", "KY", "LA", "ME", "MD", "MA", "MI", "MN", "MS",
    "MO", "MT", "NE", "NV", "NH", "NJ", "NM", "NY", "NC", "ND", "OH", "OK",
    "OR", "PA", "RI", "SC", "SD", "TN", "TX", "UT", "VT", "VA", "WA", "WV",
    "WI", "WY", "DC", "PR", "VI", "GU", "AS", "MP",
]
CA_PROVINCE_CODES = [
    "AB", "BC", "MB", "NB", "NL", "NS", "NT", "NU", "ON", "PE", "QC", "SK", "YT",
]

COUNTRY_ALIASES = {
    "United States": ["USA", "US", "U.S.", "U.S.A.", "UNITED STATES", "United States"],
    "Canada": ["CA", "CAN", "CANADA", "Canada"],
    "United Kingdom": ["UK", "U.K.", "GB", "UNITED KINGDOM", "United Kingdom"],
}

COUNTRY_REGION = {
    "United States": "North America",
    "Canada": "North America",
    "United Kingdom": "Europe",
}


def extract_primary_domain(email: Column) -> Column:
    """X1 (domain_consolidation.py:56-71): first address of a ';'-separated
    list, the part after '@', lowercased."""
    first = F.split_part(email, F.lit(";"), F.lit(1))
    return F.lower(F.split_part(first, F.lit("@"), F.lit(2)))


def normalize_domain(domain: Column) -> Column:
    """X2 (domain_consolidation.py:73-100): marketplace → skip sentinel,
    individual providers → INDIVIDUAL_<DOMAIN>, else the domain itself
    (which makes .gov/.mil/.edu passthrough automatic — the fallback
    already returns the domain unchanged, so no explicit branch exists)."""
    d = F.lower(F.trim(domain))
    return (
        F.when(d.isNull() | (d == ""), F.lit(None).cast("string"))
        .when(d.isin(MARKETPLACE_DOMAINS), "SKIP_AMAZON_MARKETPLACE")
        .when(d.isin(INDIVIDUAL_EMAIL_DOMAINS), F.concat(F.lit("INDIVIDUAL_"), F.upper(d)))
        .otherwise(d)
    )


def normalize_customer_name(name: Column) -> Column:
    """X3 (domain_consolidation.py:102-132): strip End User/Customer/Client
    suffixes, collapse whitespace, drop trailing commas."""
    cleaned = F.regexp_replace(name, r"(?i)\s*[-(]?\s*(end user|customer|client)\s*[)]?\s*$", "")
    cleaned = F.regexp_replace(cleaned, r"\s+", " ")
    cleaned = F.regexp_replace(cleaned, r",\s*$", "")
    return F.trim(cleaned)


def normalize_country(country: Column, state: Column) -> Column:
    """F26 (macros/country_normalization.sql:6-75): explicit alias mapping,
    then inference from US state / CA province codes, fallback
    'United States'."""
    c = F.trim(country)
    s = F.upper(F.trim(state))
    expr = F.when(c.isNull() | (c == ""), F.lit(None).cast("string"))
    for canonical, aliases in COUNTRY_ALIASES.items():
        expr = expr.when(F.upper(c).isin([a.upper() for a in aliases]), canonical)
    expr = expr.otherwise(c)
    return (
        F.when((c.isNull() | (c == "")) & s.isin(US_STATE_CODES), "United States")
        .when((c.isNull() | (c == "")) & s.isin(CA_PROVINCE_CODES), "Canada")
        .when(c.isNull() | (c == ""), "United States")
        .otherwise(expr)
    )


def country_region(country: Column) -> Column:
    """F26 region roll-up."""
    expr = F.when(F.lit(False), "")
    for name, region in COUNTRY_REGION.items():
        expr = expr.when(country == name, region)
    return expr.otherwise("International")
