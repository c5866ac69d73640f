from sql_identity_resolution_spark.sources.catalog import Catalog  # noqa: F401
