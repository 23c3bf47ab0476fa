from importer_spark.plans.dag import ModelGraph, model  # noqa: F401
