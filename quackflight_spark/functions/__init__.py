from quackflight_spark.functions.chsql import register_chsql_functions  # noqa: F401
