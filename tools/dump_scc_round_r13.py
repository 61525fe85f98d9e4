"""Dump the `_fb_labels` ROUND-1 physical plan, old vs new shape, into
plans/r13/scc_fb_round1_{before,after}.txt (the cc_kernel_round1
precedent: iterative keys' registered `.explain` shows only the final
assembly — checkpoints hide the round bodies — so the round-1 plan is
probed directly on the same edge/label frames the real peel builds).

BEFORE = the r12 shape: two pull joins into two groupBys, stepped over
both, 5-column materialize target.
AFTER  = the r13 shape: one tagged-union pull join into ONE groupBy
with conditional mins, observe node, 3-column materialize target.

Usage: SF_DIR=/root/testdata/sf0.1 python tools/dump_scc_round_r13.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Observation  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13"
)


def explain_str(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    from quackflight_spark.operators import graph as g
    from quackflight_spark.session import get_spark
    from quackflight_spark.sources.fixtures import load_table

    spark = get_spark(app_name="dump_scc_round_r13")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")

    # the real query's edge build (graph_scc), checkpointed like the peel
    op = (
        load_table(spark, SF_DIR, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    a, b = op.alias("a"), op.alias("b")
    e0 = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .groupBy(F.col("a.p").alias("u"), F.col("b.p").alias("v"))
        .agg(F.count(F.lit(1)).alias("n_co"))
        .filter(F.col("n_co") >= g.SCC_MIN_CO)
        .select("u", "v")
    )
    par = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("u").cast("string"), F.lit(","),
                               F.col("v").cast("string"))), 1, 1,
            ), 16, 10,
        ).cast("int") % 2 == 0
    )
    edges = e0.select(
        F.when(par, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(par, F.col("v")).otherwise(F.col("u")).alias("dst"),
    ).localCheckpoint()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    labels = nodes.select(
        "node", F.col("node").alias("f"), F.col("node").alias("b")
    ).localCheckpoint()
    bc = nodes.count() <= g.SCC_BROADCAST_NODE_LIMIT

    def mb(df):
        return F.broadcast(df) if bc else df

    # ---- BEFORE: the r12 round body -------------------------------
    nmf = (
        edges.join(mb(labels.select("node", "f")), edges.dst == F.col("node"))
        .groupBy(F.col("src").alias("node")).agg(F.min("f").alias("nf"))
    )
    nmb = (
        edges.join(mb(labels.select("node", "b")), edges.src == F.col("node"))
        .groupBy(F.col("dst").alias("node")).agg(F.min("b").alias("nb"))
    )
    stepped_o = (
        labels.join(mb(nmf), "node", "left").join(mb(nmb), "node", "left")
        .select(
            "node",
            F.least("f", F.coalesce("nf", "f")).alias("f"),
            F.least("b", F.coalesce("nb", "b")).alias("b"),
            F.col("f").alias("of"), F.col("b").alias("ob"),
        )
    )
    fmap = labels.select(F.col("node").alias("fk"), F.col("f").alias("fv"))
    bmap = labels.select(F.col("node").alias("bk"), F.col("b").alias("bv"))
    before = (
        stepped_o.join(mb(fmap), stepped_o.f == fmap.fk, "left")
        .join(mb(bmap), stepped_o.b == bmap.bk, "left")
        .select(
            "node",
            F.least("f", F.coalesce("fv", "f")).alias("f"),
            F.least("b", F.coalesce("bv", "b")).alias("b"),
            "of", "ob",
        )
    )
    with open(os.path.join(OUT_DIR, "scc_fb_round1_before.txt"), "w") as fh:
        fh.write(explain_str(before))
    print("wrote scc_fb_round1_before.txt")

    # ---- AFTER: the r13 round body (mirrors graph._fb_labels) -----
    e2 = edges.select(
        F.col("src").alias("tgt"), F.col("dst").alias("key"),
        F.lit(True).alias("isf"),
    ).unionByName(edges.select(
        F.col("dst").alias("tgt"), F.col("src").alias("key"),
        F.lit(False).alias("isf"),
    ))
    nm = (
        e2.join(mb(labels), F.col("key") == labels.node)
        .groupBy("tgt")
        .agg(
            F.min(F.when(F.col("isf"), F.col("f"))).alias("nf"),
            F.min(F.when(~F.col("isf"), F.col("b"))).alias("nb"),
        )
        .withColumnRenamed("tgt", "node")
    )
    stepped_n = (
        labels.join(mb(nm), "node", "left")
        .select(
            "node",
            F.least("f", F.coalesce("nf", "f")).alias("f"),
            F.least("b", F.coalesce("nb", "b")).alias("b"),
            F.col("f").alias("of"), F.col("b").alias("ob"),
        )
    )
    new_labels = (
        stepped_n.join(mb(fmap), stepped_n.f == fmap.fk, "left")
        .join(mb(bmap), stepped_n.b == bmap.bk, "left")
        .select(
            "node",
            F.least("f", F.coalesce("fv", "f")).alias("f"),
            F.least("b", F.coalesce("bv", "b")).alias("b"),
            "of", "ob",
        )
    )
    obs = Observation()
    after = new_labels.observe(
        obs,
        F.sum(((F.col("f") != F.col("of")) | (F.col("b") != F.col("ob")))
              .cast("long")).alias("changed"),
    ).select("node", "f", "b")
    with open(os.path.join(OUT_DIR, "scc_fb_round1_after.txt"), "w") as fh:
        fh.write(explain_str(after))
    print("wrote scc_fb_round1_after.txt")
    spark.conf.set("spark.sql.shuffle.partitions", prev)


if __name__ == "__main__":
    main()
