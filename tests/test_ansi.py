"""ANSI-on execution sweep of every registered key.

The driver grades under Spark 4's default ``spark.sql.ansi.enabled=true``
while the package session factory pins ANSI off (DuckDB-permissive
overflow/cast parity). That gap hid r5's only wrong answer: the
events_ab_test z-score divided by zero on a fully-converting corpus —
NULL under ANSI off (oracle-matching), a hard DIVIDE_BY_ZERO under the
driver's session. This sweep executes all 200+ registered keys with ANSI
flipped on at runtime so any expression that hard-errors only in the
driver's grading session fails HERE first.

Execution-only (collect, no oracle compare): the ANSI-off differential
harness (tools/check.py) proves value parity; this leg proves the plan
survives the strict session. Value parity under ANSI-on is additionally
spot-checked by tools/check.py --ansi.
"""

from __future__ import annotations

import pytest

from quackflight_spark import registry

registry.load_all()

ALL_KEYS = sorted(registry.QUERIES)


@pytest.fixture(scope="module")
def ansi_spark(spark):
    """The shared session with ANSI flipped on, restored afterward."""
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        yield spark
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)


@pytest.mark.parametrize("key", ALL_KEYS)
def test_key_executes_ansi_on(ansi_spark, sf_dir, key):
    df = registry.QUERIES[key](ansi_spark, sf_dir)
    rows = df.collect()
    assert rows is not None  # executed to completion under ANSI-on
