"""Geospatial operators: grid-bucketed distance join and hotspot
detection over synthetic planar coordinates.

The fixtures carry no lat/lon, so coordinates are DERIVED
deterministically (portable md5 -> integer meters on a bounded plane)
from stable keys — the same trick the sampling/shuffle operators use —
which keeps every query exactly reproducible in DuckDB for the oracle
diff while exercising the real spatial plan shapes:

* ``join_geo_grid`` is the classic scalable spatial equi-join
  reduction: bucket both point sets into fixed-size grid cells, expand
  ONE side to its 3x3 cell neighborhood (radius <= cell edge, so the
  neighborhood provably covers every within-radius pair), equi-join on
  cell id, then exact-distance verify. Candidate volume is bounded by
  cell occupancy — never |A| x |B|. This is the same
  bucket-then-verify shape as the package's LSH dedup family
  (llm.py), instantiated for metric space instead of hash space.
* ``geo_hotspot_cells`` is the density-map aggregation (geohash-style
  rollup + global-mean hotspot screen) in one map-side-combinable
  groupBy plus a broadcast scalar.

Reference tie-in: the reference has no spatial surface; this extends
the engine the same way B.11 extends it for LLM pipelines (SURVEY.md
§2.B scope note). All arithmetic is exact integer; distance compares
are squared-integer (no sqrt), hotspot compares are cross-multiplied
(no division), so Spark and DuckDB agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from metadata_extractors_api_spark.catalog import load
from metadata_extractors_api_spark.registry import register

#: coordinate domain: integer "meters" in [0, GRID_SIZE).
GRID_SIZE = 10_000

#: grid cell edge. RADIUS <= CELL guarantees the 3x3 neighborhood of a
#: point's cell covers every candidate within RADIUS.
CELL = 500

#: match radius (squared compare; no floats).
RADIUS = 400


def _coord(salt: str, key) -> F.Column:
    """Deterministic integer coordinate in [0, GRID_SIZE) from a key.

    Same portable construction as ``sample_hash``/``shuffle_deterministic``:
    first 8 md5 hex chars -> bigint (< 2^32, non-negative) -> mod.
    """
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt + ":"), key.cast("string"))), 1, 8),
        16,
        10,
    )
    return h.cast("bigint") % GRID_SIZE


def _cell(coord: F.Column) -> F.Column:
    """Grid cell index of a non-negative integer coordinate."""
    return F.floor(coord / F.lit(CELL)).cast("bigint")


def _sql_coord(salt: str, key_expr: str) -> str:
    """DuckDB rendering of :func:`_coord` (oracle side)."""
    return (
        f"('0x' || substr(md5('{salt}:' || CAST({key_expr} AS VARCHAR)), 1, 8))"
        f"::BIGINT % {GRID_SIZE}"
    )


@register(
    "join_geo_grid",
    oracle=f"""
    WITH c AS (
      SELECT c_custkey,
             {_sql_coord("cx", "c_custkey")} AS cx,
             {_sql_coord("cy", "c_custkey")} AS cy
      FROM customer),
    s AS (
      SELECT s_suppkey,
             {_sql_coord("sx", "s_suppkey")} AS sx,
             {_sql_coord("sy", "s_suppkey")} AS sy
      FROM supplier),
    p AS (
      SELECT c.c_custkey, s.s_suppkey,
             (c.cx - s.sx) * (c.cx - s.sx)
               + (c.cy - s.sy) * (c.cy - s.sy) AS d2
      FROM c CROSS JOIN s),
    f AS (SELECT * FROM p WHERE d2 <= {RADIUS * RADIUS}),
    nearest AS (
      SELECT c_custkey, s_suppkey AS nearest_supp
      FROM (SELECT c_custkey, s_suppkey,
                   ROW_NUMBER() OVER (PARTITION BY c_custkey
                                      ORDER BY d2, s_suppkey) AS rn
            FROM f)
      WHERE rn = 1)
    SELECT f.c_custkey,
           CAST(COUNT(*) AS BIGINT) AS n_nearby,
           CAST(MIN(d2) AS BIGINT) AS min_d2,
           CAST(MIN(nearest_supp) AS BIGINT) AS nearest_supp
    FROM f JOIN nearest ON f.c_custkey = nearest.c_custkey
    GROUP BY f.c_custkey
    """,
)
def join_geo_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-radius spatial join via grid bucketing: which suppliers
    sit within RADIUS meters of each customer, with count / nearest /
    min-distance per customer.

    Plan shape (the 100 TB one): suppliers (the smaller side) explode
    to their 3x3 cell neighborhood (x9 rows, still dimension-sized)
    and equi-join customers on the cell id — a plain hash join Spark
    can broadcast or shuffle as sizes dictate; the exact squared-
    distance filter runs post-join on the bounded candidate set. The
    DuckDB oracle states the same SEMANTICS as a cross join + distance
    predicate (fine at oracle scale), so the grid reduction itself is
    what's being verified: any neighborhood-coverage bug shows up as a
    missing pair. Nearest tie-break is ``min_by`` over the struct
    (d2, s_suppkey) — lexicographic struct ordering is injective at
    ANY supplier cardinality, unlike the previous packed integer key
    (d2 * 1e6 + suppkey), which collides across the d2 boundary once
    s_suppkey reaches 1e6 (~SF 100). The oracle states the same
    tie-break as a per-customer ROW_NUMBER (DuckDB's arg_min rejects
    composite keys).
    """
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey",
        _coord("cx", F.col("c_custkey")).alias("cx"),
        _coord("cy", F.col("c_custkey")).alias("cy"),
    )
    cust = cust.withColumn("cell_x", _cell(F.col("cx"))).withColumn(
        "cell_y", _cell(F.col("cy"))
    )
    supp = load(spark, sf_dir, "supplier").select(
        "s_suppkey",
        _coord("sx", F.col("s_suppkey")).alias("sx"),
        _coord("sy", F.col("s_suppkey")).alias("sy"),
    )
    # Expand each supplier to its 3x3 cell neighborhood. RADIUS <= CELL,
    # so a customer in cell (i,j) can only match suppliers whose own
    # cell is in (i±1, j±1) — the expansion makes that an equi-join.
    supp9 = supp.select(
        "s_suppkey",
        "sx",
        "sy",
        F.explode(
            F.sequence(_cell(F.col("sx")) - 1, _cell(F.col("sx")) + 1)
        ).alias("cell_x"),
    ).select(
        "s_suppkey",
        "sx",
        "sy",
        "cell_x",
        F.explode(
            F.sequence(_cell(F.col("sy")) - 1, _cell(F.col("sy")) + 1)
        ).alias("cell_y"),
    )
    d2 = (F.col("cx") - F.col("sx")) * (F.col("cx") - F.col("sx")) + (
        F.col("cy") - F.col("sy")
    ) * (F.col("cy") - F.col("sy"))
    pairs = (
        cust.join(supp9, ["cell_x", "cell_y"])
        .withColumn("d2", d2)
        .filter(F.col("d2") <= RADIUS * RADIUS)
    )
    return pairs.groupBy("c_custkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nearby"),
        F.min("d2").cast("bigint").alias("min_d2"),
        F.min_by("s_suppkey", F.struct("d2", "s_suppkey"))
        .cast("bigint")
        .alias("nearest_supp"),
    )


@register(
    "geo_hotspot_cells",
    oracle=f"""
    WITH pts AS (
      SELECT {_sql_coord("cx", "c_custkey")} // {CELL} AS cell_x,
             {_sql_coord("cy", "c_custkey")} // {CELL} AS cell_y
      FROM customer),
    cells AS (
      SELECT cell_x, cell_y, CAST(COUNT(*) AS BIGINT) AS n_points
      FROM pts GROUP BY cell_x, cell_y),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
             CAST(SUM(n_points) AS BIGINT) AS n_total
      FROM cells)
    SELECT cell_x, cell_y, n_points
    FROM cells, tot
    WHERE n_points * n_cells >= 2 * n_total
    """,
)
def geo_hotspot_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Density hotspots: grid cells holding at least 2x the mean
    points-per-nonempty-cell — the geohash-rollup + global-threshold
    screen behind density maps and spatial skew triage.

    One map-side-combinable groupBy builds the cell census; the global
    mean arrives as a broadcast 1-row scalar; the 2x-mean test is the
    cross-multiplied integer compare ``n_points * n_cells >= 2 *
    n_total`` (no division, no floats). At 100 TB the census output is
    bounded by the grid (cells, not rows), so the scalar join stays
    broadcast-sized no matter the input.
    """
    pts = load(spark, sf_dir, "customer").select(
        _cell(_coord("cx", F.col("c_custkey"))).alias("cell_x"),
        _cell(_coord("cy", F.col("c_custkey"))).alias("cell_y"),
    )
    cells = pts.groupBy("cell_x", "cell_y").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_points")
    )
    tot = cells.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.sum("n_points").cast("bigint").alias("n_total"),
    )
    return cells.crossJoin(F.broadcast(tot)).filter(
        F.col("n_points") * F.col("n_cells") >= 2 * F.col("n_total")
    ).select("cell_x", "cell_y", "n_points")


#: neighbors returned per point by the broadcast k-NN.
KNN_K = 3

#: hard bound on the broadcast reference cardinality (see size guard).
KNN_MAX_REF = 5_000_000


@register(
    "join_spatial_knn",
    oracle=f"""
    WITH c AS (
      SELECT c_custkey,
             {_sql_coord("cx", "c_custkey")} AS cx,
             {_sql_coord("cy", "c_custkey")} AS cy
      FROM customer),
    s AS (
      SELECT s_suppkey,
             {_sql_coord("sx", "s_suppkey")} AS sx,
             {_sql_coord("sy", "s_suppkey")} AS sy
      FROM supplier),
    p AS (
      SELECT c.c_custkey, s.s_suppkey,
             (c.cx - s.sx) * (c.cx - s.sx)
               + (c.cy - s.sy) * (c.cy - s.sy) AS d2,
             row_number() OVER (PARTITION BY c.c_custkey
                                ORDER BY (c.cx - s.sx) * (c.cx - s.sx)
                                         + (c.cy - s.sy) * (c.cy - s.sy),
                                         s.s_suppkey) AS knn_rank
      FROM c CROSS JOIN s)
    SELECT c_custkey, CAST(knn_rank AS BIGINT) AS knn_rank,
           CAST(s_suppkey AS BIGINT) AS s_suppkey,
           CAST(d2 AS BIGINT) AS d2
    FROM p WHERE knn_rank <= {KNN_K}
    """,
)
def join_spatial_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-nearest-neighbor spatial join for a DIMENSION-SIZED reference
    set: the 3 closest suppliers per customer, exact.

    Plan shape — the broadcast-KNN pattern, VECTORIZED: the supplier
    set (a dimension, bounded) is collected once and shipped as a
    SparkContext broadcast of three numpy arrays; each customer
    partition streams through ``mapInPandas``, computing the full
    (batch x |ref|) squared-distance matrix in numpy and extracting
    the top-k per row with ``argpartition`` (O(|ref|) select, then an
    O(k log k) refine) — no data shuffle, no windows, no exchanges at
    all beyond the documented round-robin repartition
    (``parallelize=True``) that restores scan parallelism on the
    single-row-group local fixtures. The classic window formulation
    (the oracle states it) would instead shuffle |cust| x |supp| rows
    on c_custkey.

    History: the previous form scored via interpreted higher-order
    functions (transform -> array_sort -> slice) at ~2.6 ms/row —
    2.19 s at sf0.1 and 11+ core-hours per 15M rows at 100x. The
    numpy path is ~10x cheaper per row and Arrow-batched. Tie-break
    (d2, sid) packs into one int64 key d2 * (max_sid+1) + sid —
    injective for ANY supplier cardinality because the multiplier is
    derived from the data (overflows int64 only past |ref| ~ 4.6e10 /
    d2_max, far beyond any dimension this broadcast pattern is for;
    corpus-sized references are what the IVF/LSH ANN family is for).
    The driver-side ``collect`` is the index-build step of the
    pattern, bounded by the dimension — same legitimacy class as a
    broadcast-join build side.
    """
    cust = load(spark, sf_dir, "customer", parallelize=True).select(
        "c_custkey",
        _coord("cx", F.col("c_custkey")).alias("cx"),
        _coord("cy", F.col("c_custkey")).alias("cy"),
    )
    supp_df = load(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").cast("bigint").alias("sid"),
        _coord("sx", F.col("s_suppkey")).alias("sx"),
        _coord("sy", F.col("s_suppkey")).alias("sy"),
    )
    # Size guard (no silent caps): the broadcast-KNN pattern is ONLY
    # for dimension-sized reference sets. Refuse loudly past the bound
    # (3 int64 arrays x 5M = 120 MB broadcast) instead of OOMing the
    # driver/executors; corpus-sized references belong to sim_ann_*.
    n_ref = supp_df.count()
    if n_ref > KNN_MAX_REF:
        raise ValueError(
            f"join_spatial_knn: reference set has {n_ref} rows "
            f"(> {KNN_MAX_REF}); broadcast-KNN is bounded to "
            "dimension-sized references — use the sim_ann_* family "
            "for corpus-sized reference sets"
        )
    supp_rows = supp_df.collect()
    import numpy as np

    ref_sid = np.array([r["sid"] for r in supp_rows], dtype=np.int64)
    ref_sx = np.array([r["sx"] for r in supp_rows], dtype=np.int64)
    ref_sy = np.array([r["sy"] for r in supp_rows], dtype=np.int64)
    bc = spark.sparkContext.broadcast((ref_sid, ref_sx, ref_sy))
    k = KNN_K

    def knn(batches):
        import numpy as np
        import pandas as pd

        sid, sx, sy = bc.value
        m = len(sid)
        kk = min(k, m)
        mult = int(sid.max()) + 1 if m else 1
        # keep the (rows x m) distance matrix near ~32 MB per chunk
        chunk = max(1, 4_000_000 // max(m, 1))
        for pdf in batches:
            for lo in range(0, len(pdf), chunk):
                part = pdf.iloc[lo : lo + chunk]
                cx = part["cx"].to_numpy(np.int64)[:, None]
                cy = part["cy"].to_numpy(np.int64)[:, None]
                d2 = (cx - sx[None, :]) ** 2 + (cy - sy[None, :]) ** 2
                key = d2 * mult + sid[None, :]
                if kk < m:
                    idx = np.argpartition(key, kk - 1, axis=1)[:, :kk]
                else:
                    idx = np.broadcast_to(
                        np.arange(m), (len(part), m)
                    ).copy()
                pk = np.take_along_axis(key, idx, axis=1)
                idx = np.take_along_axis(
                    idx, np.argsort(pk, axis=1, kind="stable"), axis=1
                )
                yield pd.DataFrame(
                    {
                        "c_custkey": np.repeat(
                            part["c_custkey"].to_numpy(np.int64), kk
                        ),
                        "knn_rank": np.tile(
                            np.arange(1, kk + 1, dtype=np.int64), len(part)
                        ),
                        "s_suppkey": sid[idx].ravel(),
                        "d2": np.take_along_axis(d2, idx, axis=1).ravel(),
                    }
                )

    return cust.mapInPandas(
        knn,
        "c_custkey bigint, knn_rank bigint, s_suppkey bigint, d2 bigint",
    )


def _min_label_components(
    labels: DataFrame, edges: DataFrame, max_rounds: int = 64
) -> DataFrame:
    """Connected components by min-label propagation WITH pointer
    jumping: each round takes the min over (own label, neighbors'
    labels, label-of-label). The jump halves label-chain distances, so
    convergence is O(log diameter) rounds instead of O(diameter) — on
    a fine grid (geohash-7 is ~10^10 cells) whose giant component
    spans the whole plane, one-hop propagation alone needs
    diameter-many rounds. Early-exits on a driver-side changed count
    (one scalar per round — data never leaves the cluster); each
    round's frame is localCheckpointed to cut the iterative lineage,
    exactly like dedup_components. ``labels`` is (node, lbl) with lbl
    initialized to node; ``edges`` is directed (u, v) with both
    orientations present. Returns the converged (node, lbl).

    Stress evidence: tests/test_stress_scale.py drives this kernel on
    a 1000x1000 grid (10^6 cells, diameter ~2000) and asserts both the
    single-component answer and the O(log D) round count."""
    labels = labels.localCheckpoint()
    for _ in range(max_rounds):
        nb = (
            edges.join(labels, edges.v == labels.node)
            .groupBy("u")
            .agg(F.min("lbl").alias("nb_lbl"))
        )
        jump = labels.select(
            F.col("node").alias("lbl"), F.col("lbl").alias("jump_lbl")
        )
        updated = (
            labels.join(nb, labels.node == nb.u, "left")
            .join(jump, "lbl", "left")
            .select(
                "node",
                F.least(
                    F.col("lbl"),
                    F.coalesce(F.col("nb_lbl"), F.col("lbl")),
                    F.coalesce(F.col("jump_lbl"), F.col("lbl")),
                ).alias("new_lbl"),
                "lbl",
            )
            .localCheckpoint()
        )
        changed = updated.filter(F.col("new_lbl") != F.col("lbl")).count()
        labels = updated.select("node", F.col("new_lbl").alias("lbl"))
        if changed == 0:
            break
    return labels


#: density threshold: a cell is DENSE when it holds >= this many points.
DBSCAN_MIN_PTS = 4

#: injective (cell_x, cell_y) -> int64 packing for cluster keys:
#: k = (x + OFF) * MUL + (y + OFF). MUL = 2^31 and OFF = 2^30 make the
#: packing collision-free for ANY |cell| < 2^30 (max k ~ 2^62 fits a
#: bigint) -- geohash-7's ~10^10 cells are ~2^17 per axis, far inside.
#: A fixed multiplier sized to the DOMAIN (not the data) keeps the key
#: deterministic across runs; the old *1000 packing silently merged
#: distinct cells whenever cell_y >= 1000 or went negative (round-4
#: ADVICE item 1).
_CELL_KEY_MUL = 1 << 31
_CELL_KEY_OFF = 1 << 30


def _cell_key(x, y):
    """Collision-free bigint key for a grid cell (see _CELL_KEY_MUL)."""
    return (x.cast("bigint") + F.lit(_CELL_KEY_OFF)) * F.lit(
        _CELL_KEY_MUL
    ) + y.cast("bigint") + F.lit(_CELL_KEY_OFF)


@register(
    "geo_cluster_cells",
    oracle=f"""
    WITH RECURSIVE pts AS (
      SELECT {_sql_coord("cx", "c_custkey")} // {CELL} AS cell_x,
             {_sql_coord("cy", "c_custkey")} // {CELL} AS cell_y
      FROM customer),
    cells AS (
      SELECT cell_x, cell_y, CAST(COUNT(*) AS BIGINT) AS n_points
      FROM pts GROUP BY cell_x, cell_y
      HAVING COUNT(*) >= {DBSCAN_MIN_PTS}),
    keyed AS (
      SELECT CAST((cell_x + {_CELL_KEY_OFF}) * CAST({_CELL_KEY_MUL} AS BIGINT)
                  + cell_y + {_CELL_KEY_OFF} AS BIGINT) AS k,
             cell_x, cell_y, n_points
      FROM cells),
    edges AS (
      SELECT a.k AS u, b.k AS v
      FROM keyed a JOIN keyed b
        ON abs(a.cell_x - b.cell_x) <= 1 AND abs(a.cell_y - b.cell_y) <= 1
       AND a.k <> b.k),
    walk(u, lbl) AS (
      SELECT k, k FROM keyed
      UNION
      SELECT e.u, w.lbl FROM edges e JOIN walk w ON w.u = e.v),
    labels AS (SELECT u AS k, MIN(lbl) AS cluster_id FROM walk GROUP BY u)
    SELECT CAST(l.cluster_id AS BIGINT) AS cluster_id,
           CAST(COUNT(*) AS BIGINT) AS n_cells,
           CAST(SUM(c.n_points) AS BIGINT) AS n_points,
           CAST(MIN(c.cell_x) AS BIGINT) AS min_x,
           CAST(MAX(c.cell_x) AS BIGINT) AS max_x,
           CAST(MIN(c.cell_y) AS BIGINT) AS min_y,
           CAST(MAX(c.cell_y) AS BIGINT) AS max_y
    FROM labels l JOIN keyed c ON l.k = c.k
    GROUP BY l.cluster_id
    """,
)
def geo_cluster_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Density-connected spatial clustering (grid-DBSCAN's core):
    DENSE grid cells (>= DBSCAN_MIN_PTS points) merge into clusters
    through 8-neighbor adjacency, and each cluster reports its cell
    count, point mass, and bounding box — the hotspot-REGION readout
    (``geo_hotspot_cells`` flags cells; this stitches them into
    contiguous areas).

    Scale shape: the census bounds everything downstream by the GRID
    (cells, not rows); adjacency is an equi-join on the 9-cell
    neighborhood expansion (same coverage trick as join_geo_grid,
    never cells x cells); components run the package's min-label
    propagation loop (dedup_components' Pregel shape) with driver-side
    convergence testing — one count per round, data never leaves the
    cluster. The oracle recomputes the identical clustering with a
    recursive min-label walk.

    Design note: at THIS fixed 20x20 grid the census is provably <=400
    rows and a driver-side union-find would be legitimate (bounded
    report, like the ANN probe parameters); the distributed loop is
    kept because the same operator must serve fine grids (geohash-7 is
    ~10^10 cells) where the census is again data-sized."""
    pts = load(spark, sf_dir, "customer").select(
        _cell(_coord("cx", F.col("c_custkey"))).alias("cell_x"),
        _cell(_coord("cy", F.col("c_custkey"))).alias("cell_y"),
    )
    cells = (
        pts.groupBy("cell_x", "cell_y")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_points"))
        .filter(F.col("n_points") >= DBSCAN_MIN_PTS)
        .withColumn("k", _cell_key(F.col("cell_x"), F.col("cell_y")))
        .localCheckpoint()
    )
    nine = cells.select(
        "k",
        F.explode(
            F.sequence(F.col("cell_x") - 1, F.col("cell_x") + 1)
        ).alias("nx"),
        "cell_y",
    ).select(
        "k",
        "nx",
        F.explode(
            F.sequence(F.col("cell_y") - 1, F.col("cell_y") + 1)
        ).alias("ny"),
    )
    edges = (
        nine.join(
            cells.select(
                F.col("k").alias("v"),
                F.col("cell_x").alias("nx"),
                F.col("cell_y").alias("ny"),
            ),
            ["nx", "ny"],
        )
        .filter(F.col("k") != F.col("v"))
        .select(F.col("k").alias("u"), "v")
        .localCheckpoint()
    )
    labels = cells.select(F.col("k").alias("node"), F.col("k").alias("lbl"))
    labels = _min_label_components(labels, edges)
    return (
        labels.join(cells, labels.node == cells.k)
        .groupBy(F.col("lbl").cast("bigint").alias("cluster_id"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_cells"),
            F.sum("n_points").cast("bigint").alias("n_points"),
            F.min("cell_x").cast("bigint").alias("min_x"),
            F.max("cell_x").cast("bigint").alias("max_x"),
            F.min("cell_y").cast("bigint").alias("min_y"),
            F.max("cell_y").cast("bigint").alias("max_y"),
        )
    )


#: rectangular zones dimension: (zone_id, x0, x1, y0, y1) in meters.
#: Deliberately overlapping and partial-coverage so points can fall in
#: 0, 1, or 2 zones.
ZONES: list[tuple[int, int, int, int, int]] = [
    (1, 0, 3000, 0, 3000),
    (2, 2000, 7000, 1000, 5000),
    (3, 6000, 10000, 6000, 10000),
    (4, 500, 1500, 8000, 9500),
]


@register(
    "join_point_in_zone",
    oracle=f"""
    WITH zones(zone_id, x0, x1, y0, y1) AS (VALUES
      {", ".join(f"({z}, {a}, {b}, {c}, {d})" for z, a, b, c, d in ZONES)}),
    c AS (
      SELECT c_custkey,
             {_sql_coord("cx", "c_custkey")} AS cx,
             {_sql_coord("cy", "c_custkey")} AS cy
      FROM customer)
    SELECT z.zone_id,
           CAST(COUNT(*) AS BIGINT) AS n_points,
           CAST(MIN(c.c_custkey) AS BIGINT) AS first_cust
    FROM c JOIN zones z
      ON c.cx >= z.x0 AND c.cx < z.x1 AND c.cy >= z.y0 AND c.cy < z.y1
    GROUP BY z.zone_id
    """,
)
def join_point_in_zone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-region CONTAINMENT join — the third spatial join kind
    after within-radius (join_geo_grid) and k-NN (join_spatial_knn):
    count customers inside each rectangular zone (overlapping zones
    allowed — a point can land in several).

    Plan shape: zones are a dimension -> the range-predicate join is a
    BroadcastNestedLoopJoin with all four comparisons evaluated
    codegen-side per (point, zone) pair — bounded work per point by
    |zones|. At larger zone counts the same query grid-partitions
    (explode zones to covered cells, equi-join on cell, exact verify —
    join_geo_grid's reduction); the dimension-sized form is stated
    here because it IS the right plan at dimension cardinality: no
    shuffle of the fact at all, one combinable rollup."""
    zones = spark.createDataFrame(
        ZONES, "zone_id INT, x0 INT, x1 INT, y0 INT, y1 INT"
    )
    c = load(spark, sf_dir, "customer").select(
        "c_custkey",
        _coord("cx", F.col("c_custkey")).alias("cx"),
        _coord("cy", F.col("c_custkey")).alias("cy"),
    )
    inside = (
        (F.col("cx") >= F.col("x0"))
        & (F.col("cx") < F.col("x1"))
        & (F.col("cy") >= F.col("y0"))
        & (F.col("cy") < F.col("y1"))
    )
    return (
        c.join(F.broadcast(zones), inside)
        .groupBy("zone_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_points"),
            F.min("c_custkey").cast("bigint").alias("first_cust"),
        )
    )
