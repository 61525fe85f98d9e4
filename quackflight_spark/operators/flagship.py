"""Flagship query — the reference's README demo shape on our fixtures.

Reference demo (README.md:5, base64-decoded): scan parquet → equality
filter → GROUP BY two columns → count() → ORDER BY count DESC → LIMIT 10.
Transposed to the lineitem fixture: filter one returnflag, group by
(l_returnflag, l_linestatus), count, top-10 by count.

Plan shape we want (and get — see tests/test_flagship.py):
- parquet scan with PushedFilters [IsNotNull(l_returnflag),
  EqualTo(l_returnflag,'R')] and a 3-column ReadSchema (pruning),
- partial hash agg (map-side combine) → shuffle on group keys → final agg,
- TakeOrderedAndProject fusing ORDER BY DESC + LIMIT (no global sort).
At 100 TB this is scan-bound with a tiny shuffle (grouping cardinality is
bounded by flag×status), which is exactly the right plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quackflight_spark.sources.fixtures import load_table


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem
        .filter(F.col("l_returnflag") == "R")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "l_returnflag", "l_linestatus")
        .limit(10)
    )


FLAGSHIP_ORACLE = """
SELECT l_returnflag, l_linestatus, count(*) AS c
FROM lineitem
WHERE l_returnflag = 'R'
GROUP BY l_returnflag, l_linestatus
ORDER BY c DESC, l_returnflag, l_linestatus
LIMIT 10
"""
