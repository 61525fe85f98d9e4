"""Grid-accelerated DBSCAN — round 7's clustering composite.

Beyond-reference family (SURVEY.md §2.12): density-based spatial
clustering (Ester et al. 1996) built ENTIRELY from operators this engine
already proves — the join_spatial_grid cell decomposition for the
eps-neighborhood join, the shuffle-once max/min(struct) argmin for
deterministic border assignment, and the shared min-label-propagation
kernel (pipeline/dedup.py::min_label_components, the dedup_clusters /
graph_wcc engine) for core connectivity. The composition is the point:
DBSCAN at warehouse scale IS a radius join + a connected-components pass
(the MR-DBSCAN / RDD-DBSCAN decomposition), never the sequential
seed-expansion of the textbook algorithm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quackflight_spark.registry import query
from quackflight_spark.sources.fixtures import load_table

DBSCAN_EPS = 60        # eps in integer deci-degrees (cell side = eps)
DBSCAN_MIN_PTS = 4     # core iff |N_eps(p)| >= this, p itself included
DBSCAN_MAX_ROUNDS = 20  # CC kernel bound; blob components are shallow
DBSCAN_BLOB_R = 40     # cluster blob radius (< eps: blobs are dense)
DBSCAN_NOISE_MOD = 5   # 1-in-5 points are uniform background noise

# Clustered synthesis — DBSCAN's own precondition. The uniform
# md5-points the spatial JOINS use are exactly what DBSCAN is NOT for:
# at bench density they percolate into one near-critical giant
# component whose graph diameter tracks the SPATIAL extent (measured:
# diameter 63 at sf0.01, CC convergence ~diameter/2 rounds — minutes at
# sf0.1). Real density clustering runs on clustered data, so the
# synthesis plants K = max(5, n/100) md5-derived blob centers, puts 80%
# of points inside radius-{40} blobs (K capped at 25 so the BLOB-center graph itself stays subcritical
# -- uncapped, blob chains at bench scale rebuild the long-diameter
# component the cap exists to kill) and scatters 20% as uniform noise — compact components with
# 3-4-hop diameters at every scale, noise points for the outlier-
# rejection semantics to bite on.
_PTS_SQL = f"""
      SELECT c_custkey,
             CASE WHEN noise THEN u_lat
                  ELSE c_lat + CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || ':dx'), 1, 4) AS BIGINT) % (2 * {DBSCAN_BLOB_R} + 1) - {DBSCAN_BLOB_R}
             END AS lat_d,
             CASE WHEN noise THEN u_lon
                  ELSE c_lon + CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || ':dy'), 1, 4) AS BIGINT) % (2 * {DBSCAN_BLOB_R} + 1) - {DBSCAN_BLOB_R}
             END AS lon_d
      FROM (
        SELECT c_custkey,
               CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || ':n'), 1, 4) AS BIGINT) % {DBSCAN_NOISE_MOD} = 0 AS noise,
               CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 4) AS BIGINT) % 2000 AS u_lat,
               CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 5, 8) AS BIGINT) % lon_dom AS u_lon,
               50 + CAST('0x' || substr(md5('c' || CAST(cid AS VARCHAR)), 1, 4) AS BIGINT) % 1900 AS c_lat,
               50 + CAST('0x' || substr(md5('cy' || CAST(cid AS VARCHAR)), 1, 8) AS BIGINT) % (lon_dom - 100) AS c_lon
        FROM (
          SELECT c_custkey,
                 CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || ':c'), 1, 4) AS BIGINT)
                   % (SELECT greatest(5, count(*) // 100) FROM customer) AS cid,
                 (SELECT greatest(999, (1999 * count(*)) // 1500) FROM customer) AS lon_dom
          FROM customer
        )
      )
"""


@query("cluster_dbscan", oracle=f"""
    WITH pts AS ({_PTS_SQL}),
    cand AS MATERIALIZED (
      SELECT a.c_custkey AS ka, b.c_custkey AS kb,
             (a.lat_d - b.lat_d) * (a.lat_d - b.lat_d)
             + (a.lon_d - b.lon_d) * (a.lon_d - b.lon_d) AS dist_sq
      FROM pts a JOIN pts b
        ON a.c_custkey <> b.c_custkey
       AND (a.lat_d - b.lat_d) * (a.lat_d - b.lat_d)
           + (a.lon_d - b.lon_d) * (a.lon_d - b.lon_d)
           <= {DBSCAN_EPS * DBSCAN_EPS}
    ),
    core AS MATERIALIZED (
      SELECT ka AS k FROM cand GROUP BY ka
      HAVING count(*) + 1 >= {DBSCAN_MIN_PTS}
    ),
    ce AS MATERIALIZED (
      SELECT c.ka, c.kb FROM cand c
      JOIN core x ON x.k = c.ka JOIN core y ON y.k = c.kb
    ),
    reach AS (
      WITH RECURSIVE r(a, b) AS (
        SELECT ka, kb FROM ce
        UNION
        SELECT r.a, e.kb FROM r JOIN ce e ON e.ka = r.b
      ) SELECT a, b FROM r UNION SELECT k, k FROM core
    ),
    comp AS MATERIALIZED (
      SELECT a AS k, min(b) AS cluster_id FROM reach GROUP BY a
    ),
    border AS (
      SELECT c.ka AS k, min(ROW(c.dist_sq, c.kb)) AS m
      FROM cand c JOIN core y ON y.k = c.kb
      WHERE c.ka NOT IN (SELECT k FROM core)
      GROUP BY c.ka
    )
    SELECT k AS c_custkey, cluster_id, 'core' AS role FROM comp
    UNION ALL
    SELECT b.k, cp.cluster_id, 'border'
    FROM border b JOIN comp cp ON cp.k = CAST(b.m[2] AS BIGINT)
""")
def cluster_dbscan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSCAN (new r7) over the md5-synthesized customer point set the
    spatial-join keys share: a point is CORE if its eps-neighborhood
    (eps = {DBSCAN_EPS} deci-degrees, self included) holds ≥
    {DBSCAN_MIN_PTS} points; clusters are the connected components of
    the core-core eps-graph; non-core points within eps of a core join
    as BORDER; everything else is noise and is excluded. The density
    clusterer for arbitrary-shape clusters with built-in outlier
    rejection — the geo/embedding complement of cluster_kmeans.

    Determinism contract: textbook DBSCAN assigns a border point to
    whichever core claimed it first (scan-order-dependent); here the
    border joins its NEAREST core (ties to smaller core id) via the
    shuffle-once min(struct(dist², core)) argmin, and cluster ids are
    canonical (component-min core id from the shared min-label kernel)
    — the output is a pure function of the data on any engine or
    partitioning, which is what lets the quadratic-definition oracle
    hash-match.

    Scale shape (the MR-DBSCAN decomposition): the eps-neighborhood
    join is the join_spatial_grid cell equi-join — candidate volume
    Σ(cell²), never n²; the neighbor-pair frame is checkpointed once
    and feeds core counting (map-side-combinable), the core-core edge
    filter (two semi-joins), and border argmin; connectivity is
    path-halved min-label propagation, O(log diameter) rounds of two
    keyed shuffles. The known hazard is a cell whose density explodes
    (a downtown at 100 TB) — the same bounded-block contract as the
    fuzzy/semantic family: pre-aggregate per-cell counts and cap or
    sub-split hot cells before the pair join."""
    from quackflight_spark.pipeline.dedup import min_label_components

    cust = load_table(spark, sf_dir, "customer")
    n_pts = cust.count()  # bounded control-plane count
    k_blobs = max(5, n_pts // 100)
    # density-constant region: lon extent scales linearly with n so the
    # NOISE population stays subcritical at every SF (fixed-region
    # synthesis made bare noise percolate at bench density — measured
    # 14,947-core giant with diameter 59); integer arithmetic, no sqrt
    lon_dom = max(999, (1999 * n_pts) // 1500)

    def h48(suffix_col: F.Column, lo: int = 1, ln: int = 4) -> F.Column:
        return F.conv(F.substring(F.md5(suffix_col), lo, ln), 16, 10).cast(
            "bigint"
        )

    key_s = F.col("c_custkey").cast("string")
    cid = h48(F.concat(key_s, F.lit(":c"))) % k_blobs
    noise = h48(F.concat(key_s, F.lit(":n"))) % DBSCAN_NOISE_MOD == 0
    span = 2 * DBSCAN_BLOB_R + 1
    c_lat = 50 + h48(F.concat(F.lit("c"), cid.cast("string"))) % 1900
    c_lon = 50 + h48(F.concat(F.lit("cy"), cid.cast("string")), 1, 8) % (
        lon_dom - 100
    )
    u_lat = h48(key_s) % 2000
    u_lon = h48(key_s, 5, 8) % lon_dom
    pts = cust.select(
        "c_custkey",
        F.when(noise, u_lat)
        .otherwise(
            c_lat
            + h48(F.concat(key_s, F.lit(":dx"))) % span
            - DBSCAN_BLOB_R
        )
        .alias("lat_d"),
        F.when(noise, u_lon)
        .otherwise(
            c_lon
            + h48(F.concat(key_s, F.lit(":dy"))) % span
            - DBSCAN_BLOB_R
        )
        .alias("lon_d"),
    )
    eps = DBSCAN_EPS
    cx = (F.col("lat_d") / eps).cast("bigint")
    cy = (F.col("lon_d") / eps).cast("bigint")
    build = pts.select(
        F.col("c_custkey").alias("kb"),
        F.col("lat_d").alias("lat_b"),
        F.col("lon_d").alias("lon_b"),
        cx.alias("cx"),
        cy.alias("cy"),
    )
    probe = pts.select(
        F.col("c_custkey").alias("ka"),
        F.col("lat_d").alias("lat_a"),
        F.col("lon_d").alias("lon_a"),
        F.explode(
            F.array(
                *[
                    F.struct((cx + dx).alias("cx"), (cy + dy).alias("cy"))
                    for dx in (-1, 0, 1)
                    for dy in (-1, 0, 1)
                ]
            )
        ).alias("c"),
    ).select(
        "ka", "lat_a", "lon_a",
        F.col("c.cx").alias("cx"), F.col("c.cy").alias("cy"),
    )
    dist_sq = (F.col("lat_a") - F.col("lat_b")) * (
        F.col("lat_a") - F.col("lat_b")
    ) + (F.col("lon_a") - F.col("lon_b")) * (F.col("lon_a") - F.col("lon_b"))
    cand = (
        probe.join(build, ["cx", "cy"])
        .filter(F.col("ka") != F.col("kb"))
        .withColumn("dist_sq", dist_sq)
        .filter(F.col("dist_sq") <= eps * eps)
        .select("ka", "kb", "dist_sq")
        # lazy (r12): feeds core count, core edges, border argmin — the
        # CC kernel's first fused job materializes the whole chain;
        # eager paid two extra standalone jobs of floor here
        .localCheckpoint(eager=False)
    )
    core = (
        cand.groupBy("ka")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") + 1 >= DBSCAN_MIN_PTS)
        .select(F.col("ka").alias("k"))
        .localCheckpoint(eager=False)
    )
    ce = (
        cand.join(core.withColumnRenamed("k", "ka"), "ka", "left_semi")
        .join(core.withColumnRenamed("k", "kb"), "kb", "left_semi")
        .select(F.col("ka").alias("src"), F.col("kb").alias("dst"))
    )
    labels = min_label_components(ce, DBSCAN_MAX_ROUNDS, "cluster_dbscan")
    # isolated cores (no core neighbor) are their own singleton clusters
    comp = labels.unionByName(
        core.join(labels.select(F.col("node").alias("k")), "k", "left_anti")
        .select(F.col("k").alias("node"), F.col("k").alias("lbl"))
    )
    border = (
        cand.join(core.withColumnRenamed("k", "kb"), "kb", "left_semi")
        .join(core.withColumnRenamed("k", "ka"), "ka", "left_anti")
        .groupBy("ka")
        .agg(F.min(F.struct("dist_sq", "kb")).alias("m"))
        .select(F.col("ka").alias("k"), F.col("m.kb").alias("core_k"))
    )
    core_rows = comp.select(
        F.col("node").alias("c_custkey"),
        F.col("lbl").alias("cluster_id"),
        F.lit("core").alias("role"),
    )
    border_rows = border.join(
        comp.select(F.col("node").alias("core_k"), F.col("lbl").alias("cluster_id")),
        "core_k",
    ).select(
        F.col("k").alias("c_custkey"),
        "cluster_id",
        F.lit("border").alias("role"),
    )
    return core_rows.unionByName(border_rows)
