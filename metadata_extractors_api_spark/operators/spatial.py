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
      FROM c CROSS JOIN s)
    SELECT c_custkey,
           CAST(COUNT(*) AS BIGINT) AS n_nearby,
           CAST(MIN(d2) AS BIGINT) AS min_d2,
           CAST(arg_min(s_suppkey, d2 * 1000000 + s_suppkey) AS BIGINT)
               AS nearest_supp
    FROM p
    WHERE d2 <= {RADIUS * RADIUS}
    GROUP BY c_custkey
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
    missing pair. Nearest tie-break folds (d2, suppkey) into one
    integer key (d2 * 1e6 + suppkey; d2 <= 2*GRID_SIZE^2 = 2e8, keys
    < 1e6, no overflow) so Spark's min_by and DuckDB's arg_min agree
    without struct-ordering semantics.
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
        F.min_by(
            "s_suppkey", F.col("d2") * 1_000_000 + F.col("s_suppkey")
        )
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

    Plan shape — the broadcast-KNN pattern: the supplier set collapses
    to ONE broadcast row holding an array of (x, y, id) structs; each
    customer row then computes transform (distance) -> array_sort (by
    (d2, id) struct order) -> slice (top-k) -> explode. No data
    shuffle, no windows — the only exchanges are the single-row
    supplier rollup and the documented round-robin repartition
    (``parallelize=True``) that restores scan parallelism on the
    single-row-group local fixtures; the classic window formulation
    (the oracle states it) would instead shuffle |cust| x |supp| rows
    on c_custkey. Cost model: higher-order functions evaluate
    INTERPRETED (not codegen), so per-row cost is O(|ref| log |ref|)
    interpreted ops — measured ~2.6 ms/row at |ref|=1000, which is
    why the repartition matters and why this pattern is bounded to
    dimension-sized reference sets; corpus-sized references are what
    the IVF/LSH ANN family is for (sim_ann_*, the same
    index-once/probe-cheap inversion).
    """
    cust = load(spark, sf_dir, "customer", parallelize=True).select(
        "c_custkey",
        _coord("cx", F.col("c_custkey")).alias("cx"),
        _coord("cy", F.col("c_custkey")).alias("cy"),
    )
    supp = load(spark, sf_dir, "supplier").select(
        F.struct(
            _coord("sx", F.col("s_suppkey")).alias("sx"),
            _coord("sy", F.col("s_suppkey")).alias("sy"),
            F.col("s_suppkey").alias("sid"),
        ).alias("sp")
    )
    ref = supp.agg(F.collect_list("sp").alias("refs"))
    scored = cust.crossJoin(F.broadcast(ref)).select(
        "c_custkey",
        F.slice(
            F.array_sort(
                F.expr(
                    "transform(refs, r -> struct("
                    "(cx - r.sx) * (cx - r.sx) + (cy - r.sy) * (cy - r.sy)"
                    " AS d2, r.sid AS sid))"
                )
            ),
            1,
            KNN_K,
        ).alias("top"),
    )
    return scored.select(
        "c_custkey", F.posexplode("top").alias("pos", "nb")
    ).select(
        "c_custkey",
        (F.col("pos") + 1).cast("bigint").alias("knn_rank"),
        F.col("nb.sid").cast("bigint").alias("s_suppkey"),
        F.col("nb.d2").cast("bigint").alias("d2"),
    )
