"""Python UDTF — SURVEY.md §2.10(c): table-function extensibility.

The reference's extensibility is DuckDB extension loading (main.py:83-86);
ours is threefold: SQL-UDF session functions (chsql.py), Pandas
UDF/mapInPandas kernels (pipeline/multimodal.py), and — demonstrated
here — native Python UDTFs (Spark ≥3.5): a lateral table function
callable from SQL, the analog of a DuckDB table-producing extension
function.

UDTFs run row-at-a-time in Python — keep them OUT of hot paths (this one
exists for surface parity; the engine's own operators never use it).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType="word: string, pos: int")
class SplitWords:
    """split_words(text): one row per whitespace-separated word."""

    def eval(self, text: str):  # noqa: D102
        if text is None:
            return
        for pos, word in enumerate(text.split()):
            yield word, pos


def register_udtfs(spark: SparkSession) -> None:
    spark.udtf.register("split_words", SplitWords)
