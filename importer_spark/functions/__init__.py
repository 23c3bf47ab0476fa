from importer_spark.functions.core import (  # noqa: F401
    bucket,
    dec,
    growth_pct,
    money2,
    out_double,
    mode_det,
    ratio,
    string_agg_sorted,
    surrogate_key,
)
