from crawld_spark.sources.tables import Catalog  # noqa: F401
