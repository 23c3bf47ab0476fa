"""Oracle-checked query catalog.

Each query is registered with the @query decorator: a Spark callable
(spark, sf_dir) -> DataFrame plus an equivalent DuckDB-ANSI-SQL oracle
string over the same parquet tables. The driver and tests/ compare the two
order-insensitively at sf=0.01. Genuinely non-SQL-expressible operators
(iterative fixpoints, engine-specific sketches, sub-1.0-recall ANN) register
with catalog=False into DIAGNOSTICS — runnable the same way, verified by
error-bound/recall/determinism tests instead, and never exported to the
driver, so the external gate is oracle-complete by construction.
"""

from importer_spark.queries.registry import DIAGNOSTICS, ORACLES, QUERIES, query  # noqa: F401

# Importing the modules populates the registry.
from importer_spark.queries import consolidation  # noqa: F401,E402
from importer_spark.queries import core  # noqa: F401,E402
from importer_spark.queries import etl  # noqa: F401,E402
from importer_spark.queries import aggs  # noqa: F401,E402
from importer_spark.queries import analytics2  # noqa: F401,E402
from importer_spark.queries import analytics3  # noqa: F401,E402
from importer_spark.queries import analytics4  # noqa: F401,E402
from importer_spark.queries import analytics5  # noqa: F401,E402
from importer_spark.queries import attribution  # noqa: F401,E402
from importer_spark.queries import joins  # noqa: F401,E402
from importer_spark.queries import intervals_q  # noqa: F401,E402
from importer_spark.queries import joins2  # noqa: F401,E402
from importer_spark.queries import llm_dedup  # noqa: F401,E402
from importer_spark.queries import llm_lm  # noqa: F401,E402
from importer_spark.queries import llm_multimodal  # noqa: F401,E402
from importer_spark.queries import llm_similarity  # noqa: F401,E402
from importer_spark.queries import llm_text  # noqa: F401,E402
from importer_spark.queries import llm_sampling  # noqa: F401,E402
from importer_spark.queries import llm_tfidf  # noqa: F401,E402
from importer_spark.queries import llm_mixture  # noqa: F401,E402
from importer_spark.queries import llm_refine  # noqa: F401,E402
from importer_spark.queries import marts  # noqa: F401,E402
from importer_spark.queries import marts2  # noqa: F401,E402
from importer_spark.queries import misc  # noqa: F401,E402
from importer_spark.queries import pricing  # noqa: F401,E402
from importer_spark.queries import quality_q  # noqa: F401,E402
from importer_spark.queries import recursive_q  # noqa: F401,E402
from importer_spark.queries import scalars  # noqa: F401,E402
from importer_spark.queries import sql_api  # noqa: F401,E402
from importer_spark.queries import stats  # noqa: F401,E402
from importer_spark.queries import sessions2  # noqa: F401,E402
from importer_spark.queries import streaming_q  # noqa: F401,E402
from importer_spark.queries import timeseries  # noqa: F401,E402
from importer_spark.queries import structs  # noqa: F401,E402
from importer_spark.queries import windows  # noqa: F401,E402

# NOTE: the external-verification SAMPLING ORDER (the priority list a
# driver prefix-draw follows) lives in __spark_entry__.py at the repo root.
# It is driver protocol, not engine semantics, and keeping it here meant any
# reorder invalidated every gate certificate (r8 verdict #4). This module's
# registration order is stable and semantically meaningless.
