from importer_spark.sources.files import (  # noqa: F401
    align_to_schema,
    discover_files,
    optional_column,
    read_xlsx,
    read_xlsx_distributed,
    with_ingest_metadata,
)
from importer_spark.sources.graphql import GraphQLCursorSource, extract_path  # noqa: F401
from importer_spark.sources.rest import RestCursorSource  # noqa: F401
