from quackflight_spark.sources.fixtures import TABLES, load_table, register_all  # noqa: F401
