"""DDL / DML / session statements — SURVEY.md §2.11 D1-D7, exercised
through the engine's SQL front door (run_script), matching reference
semantics per statement."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from quackflight_spark.plans.dialect import run_script


@pytest.fixture(scope="module", autouse=True)
def ware(spark):
    spark.sql("DROP DATABASE IF EXISTS ddl_test CASCADE")
    yield
    spark.sql("DROP DATABASE IF EXISTS ddl_test CASCADE")


def test_d1_create_schema(spark):
    """D1: CREATE SCHEMA IF NOT EXISTS (reference main.py:600-635)."""
    run_script(spark, "CREATE DATABASE IF NOT EXISTS ddl_test")
    assert any(d.name == "ddl_test" for d in spark.catalog.listDatabases())
    run_script(spark, "CREATE DATABASE IF NOT EXISTS ddl_test")  # idempotent


def test_d2_create_table_typed(spark):
    """D2: CREATE TABLE IF NOT EXISTS with typed columns incl. arrays
    (reference main.py:700-705; VARCHAR[] array col per README.md:98)."""
    run_script(
        spark,
        "CREATE TABLE IF NOT EXISTS ddl_test.people "
        "(id BIGINT, name STRING, tags ARRAY<STRING>) USING parquet",
    )
    schema = spark.table("ddl_test.people").schema
    assert [f.dataType.simpleString() for f in schema.fields] == [
        "bigint", "string", "array<string>",
    ]


def test_d3_ctas_multistatement(spark):
    """D3: CTAS + multi-statement ticket returning the last result
    (examples/flight_read.py:7)."""
    df = run_script(
        spark,
        "CREATE TABLE IF NOT EXISTS ddl_test.vt USING parquet AS "
        "SELECT version() AS v, now() AS t; "
        "SELECT * FROM ddl_test.vt;",
    )
    assert df.count() == 1 and df.columns == ["v", "t"]


def test_d4_insert_values(spark):
    """D4: INSERT INTO ... VALUES (...),(...) (examples/flight_insert.py)."""
    run_script(spark, "CREATE TABLE IF NOT EXISTS ddl_test.ins (a BIGINT, b STRING) USING parquet")
    run_script(spark, "INSERT INTO ddl_test.ins VALUES (1, 'x'), (2, 'y'), (3, 'z')")
    assert spark.table("ddl_test.ins").count() == 3


def test_d5_insert_select(spark):
    """D5: INSERT INTO t SELECT ... (reference main.py:798-799)."""
    run_script(spark, "INSERT INTO ddl_test.ins SELECT a + 10, upper(b) FROM ddl_test.ins")
    assert spark.table("ddl_test.ins").count() == 6
    assert spark.table("ddl_test.ins").filter(F.col("b") == "X").count() == 1


def test_d6_use_database(spark):
    """D6: USE db (reference main.py:284)."""
    prev = spark.catalog.currentDatabase()
    try:
        run_script(spark, "USE ddl_test")
        assert spark.catalog.currentDatabase() == "ddl_test"
        # unqualified name resolves in the current database
        assert spark.table("ins").count() == 6
    finally:
        spark.catalog.setCurrentDatabase(prev)


def test_d7_insert_routing_token_parse(spark):
    """D7: the HTTP INSERT route parses the table name with the real
    lexer path, not split('INTO') (reference main.py:199 fragility)."""
    from quackflight_spark.serving.http_app import _INSERT_RE

    m = _INSERT_RE.match("  insert into ddl_test.ins FORMAT JSONEachRow")
    assert m and m.group(1) == "ddl_test.ins"
    assert _INSERT_RE.match("SELECT 'insert into x'") is None


def test_s3_catalog_statements(spark):
    """S3: SHOW DATABASES / SHOW TABLES / version() canned queries
    (reference main.py:496-521)."""
    dbs = {r[0] for r in run_script(spark, "SHOW DATABASES").collect()}
    assert "ddl_test" in dbs
    tables = run_script(spark, "SHOW TABLES IN ddl_test").collect()
    assert {t.tableName for t in tables} >= {"people", "ins", "vt"}
    v = run_script(spark, "SELECT version() AS v").collect()[0]["v"]
    assert v.startswith("4.")
