from __future__ import annotations

from quackflight_spark.operators.flagship import flagship


def test_flagship_rows(spark, sf_dir):
    rows = flagship(spark, sf_dir).collect()
    assert len(rows) > 0
    assert rows[0]["l_returnflag"] == "R"
    # counts descend
    counts = [r["c"] for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_flagship_plan_quality(spark, sf_dir):
    """The plan must push the filter to the scan, prune columns, and fuse
    top-k into TakeOrderedAndProject (no global sort at scale)."""
    df = flagship(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    explained = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "TakeOrderedAndProject" in explained
    assert "PushedFilters: [IsNotNull(l_returnflag), EqualTo(l_returnflag,R)]" in explained
    # column pruning: only the two grouping columns are read
    assert "l_extendedprice" not in explained.split("ReadSchema")[1].splitlines()[0]


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
