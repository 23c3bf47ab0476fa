from importer_spark.operators.joins import asof_join, range_attribution  # noqa: F401
