"""Geospatial operators: grid-cell radius join, nearest-neighbor
within radius, cell density — the spatial-join family.

A corpus with geotagged rows (store/DC placement, delivery events,
image EXIF) needs "what is near what" answered WITHOUT the O(n·m)
cross join: the standard reduction is a uniform grid with cell size =
search radius, so every true neighbor pair shares a cell or touches
one of the 8 adjacent cells — candidates come from a plain equi-join
on cell id, and only candidates pay the exact distance check. That is
the same candidates-from-buckets shape as the LSH dedup family
(``llm/dedup.py``), applied to 2-D coordinates.

The test tables carry no coordinates, so both engines derive a
deterministic synthetic placement from the integer keys (multiply by a
prime, mod the world size) — pure int64 arithmetic, bitwise identical
everywhere; in production these are just the projected-coordinate
columns. Distances stay in INTEGER centi-unit² space end-to-end: no
sqrt, no float, nothing for two engines to disagree on.

Scale: the big side shuffles once on its cell id; the smaller side is
replicated to its 3×3 cell neighborhood (a bounded 9× explode) and
broadcast when it fits, else co-hashed on the same cell key. Cell
occupancy bounds every candidate list; a skewed hotspot cell is a
salting problem, not an algorithm change. At planetary scale the flat
grid becomes a hierarchical one (S2/H3-style) — same join shape per
level. Reference parity: the reference has no spatial surface at all;
this extends the engine's bucketed-candidate-join pattern
(SURVEY.md §2.1 joins family) to metric space.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load, spread
from ..registry import register

# World is 100_000 × 100_000 centi-units (1000.00 × 1000.00 units).
WORLD = 100_000
RADIUS = 5_000          # search radius, centi-units (50.00 units)
R2 = RADIUS * RADIUS    # compare squared distances — no sqrt anywhere
_PX, _PY = 7919, 104729  # placement primes (hash-spread the keys)


def _place(df: DataFrame, key: str) -> DataFrame:
    """Deterministic synthetic placement: key → (x, y) centi-units."""
    k = F.col(key)
    return df.select(
        key,
        ((k * _PX) % WORLD).alias("x"),
        ((k * _PY) % WORLD).alias("y"),
    )


def _sql_place(table: str, key: str) -> str:
    return (
        f"SELECT {key}, ({key} * {_PX}) % {WORLD} AS x,"
        f" ({key} * {_PY}) % {WORLD} AS y FROM {table}"
    )


_SQL_PAIRS = f"""
c AS ({_sql_place('customer', 'c_custkey')}),
s AS ({_sql_place('supplier', 's_suppkey')}),
pairs AS (
  SELECT c.c_custkey, s.s_suppkey,
         (c.x - s.x) * (c.x - s.x) + (c.y - s.y) * (c.y - s.y) AS dist2
  FROM c CROSS JOIN s
  WHERE (c.x - s.x) * (c.x - s.x) + (c.y - s.y) * (c.y - s.y) <= {R2}
)"""


def _radius_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-cell candidate generation + exact distance verification.

    Suppliers (small side) explode to their 3×3 cell neighborhood and
    broadcast; customers compute one cell id and equi-join — no
    customer-side replication, no cross join anywhere. Correctness
    argument: cell size == RADIUS, so any pair within RADIUS differs
    by at most one cell index per axis and is guaranteed to meet in
    the customer's cell."""
    cust = _place(load(spark, sf_dir, "customer"), "c_custkey").withColumn(
        "cell",
        (F.floor(F.col("x") / RADIUS) * F.lit(1_000_000)
         + F.floor(F.col("y") / RADIUS)),
    )
    supp = _place(load(spark, sf_dir, "supplier"), "s_suppkey")
    offsets = spark.range(9).select(
        (F.col("id") % 3 - 1).alias("dx"), (F.col("id") / 3).cast("long").alias("dy")
    ).select("dx", (F.col("dy") - 1).alias("dy"))
    supp9 = supp.crossJoin(offsets).select(
        "s_suppkey",
        F.col("x").alias("sx"),
        F.col("y").alias("sy"),
        ((F.floor(F.col("x") / RADIUS) + F.col("dx")) * F.lit(1_000_000)
         + F.floor(F.col("y") / RADIUS) + F.col("dy")).alias("cell"),
    )
    dist2 = (
        (F.col("x") - F.col("sx")) * (F.col("x") - F.col("sx"))
        + (F.col("y") - F.col("sy")) * (F.col("y") - F.col("sy"))
    )
    return (
        cust.join(F.broadcast(supp9), "cell")
        .withColumn("dist2", dist2)
        .filter(F.col("dist2") <= R2)
        .select("c_custkey", "s_suppkey", "dist2")
    )


@register(
    "geo_radius_join",
    tags=("geo", "join", "spatial"),
    oracle=f"""
WITH {_SQL_PAIRS}
SELECT c_custkey, s_suppkey, CAST(dist2 AS BIGINT) AS dist2
FROM pairs
""",
)
def geo_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All (customer, supplier) pairs within RADIUS, via the grid-cell
    candidate join — verified row-for-row against the brute-force
    cross-join oracle, which is the proof that the 3×3 neighborhood
    loses no pair.

    Cost model at 100 TB: candidates ≈ Σ_cell |cust_cell|·|supp_3×3|,
    i.e. proportional to local density — the cross join's n·m never
    materializes. The only wide exchange is the customer side's hash
    on cell id (and none at all while the replicated side broadcasts)."""
    return _radius_pairs(spark, sf_dir).select(
        "c_custkey", "s_suppkey", F.col("dist2").cast("bigint").alias("dist2")
    )


@register(
    "geo_nearest_within_radius",
    tags=("geo", "join", "spatial", "topk"),
    oracle=f"""
WITH {_SQL_PAIRS},
ranked AS (
  SELECT c_custkey, s_suppkey, dist2,
         ROW_NUMBER() OVER (PARTITION BY c_custkey
                            ORDER BY dist2, s_suppkey) AS rn
  FROM pairs
)
SELECT c_custkey, s_suppkey AS nearest_suppkey,
       CAST(dist2 AS BIGINT) AS dist2
FROM ranked WHERE rn = 1
""",
)
def geo_nearest_within_radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest supplier per customer, searched only within RADIUS
    (customers with no supplier in range are excluded — the bounded-
    search contract that makes grid NN exact: a global NN would need
    expanding-ring search). Ties break on the smaller supplier key so
    the winner is unique and cross-engine stable.

    The rank-1 window rides the candidate frame grouped by customer —
    Spark rewrites it to WindowGroupLimit, so each partition keeps one
    running winner per customer instead of sorting full candidate
    lists."""
    pairs = _radius_pairs(spark, sf_dir)
    w = Window.partitionBy("c_custkey").orderBy("dist2", "s_suppkey")
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "c_custkey",
            F.col("s_suppkey").alias("nearest_suppkey"),
            F.col("dist2").cast("bigint").alias("dist2"),
        )
    )


@register(
    "geo_cell_density",
    tags=("geo", "aggregate", "spatial"),
    oracle=f"""
WITH c AS ({_sql_place('customer', 'c_custkey')}),
s AS ({_sql_place('supplier', 's_suppkey')}),
cc AS (
  SELECT (x // {RADIUS}) * 1000000 + (y // {RADIUS}) AS cell,
         COUNT(*) AS n_customers
  FROM c GROUP BY 1
),
sc AS (
  SELECT (x // {RADIUS}) * 1000000 + (y // {RADIUS}) AS cell,
         COUNT(*) AS n_suppliers
  FROM s GROUP BY 1
)
SELECT COALESCE(cc.cell, sc.cell) AS cell,
       CAST(COALESCE(n_customers, 0) AS BIGINT) AS n_customers,
       CAST(COALESCE(n_suppliers, 0) AS BIGINT) AS n_suppliers
FROM cc FULL OUTER JOIN sc ON cc.cell = sc.cell
""",
)
def geo_cell_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial density heatmap: per grid cell, how many customers and
    suppliers landed there (full outer union of the two per-cell
    counts). The aggregate each side runs BEFORE the join means the
    join touches O(occupied cells), not O(rows) — the map-reduce shape
    that holds when the point set is 100 TB and the cell histogram is
    megabytes."""
    cell = lambda: (
        F.floor(F.col("x") / RADIUS) * F.lit(1_000_000)
        + F.floor(F.col("y") / RADIUS)
    ).alias("cell")
    cc = (
        _place(load(spark, sf_dir, "customer"), "c_custkey")
        .select(cell())
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    sc = (
        _place(load(spark, sf_dir, "supplier"), "s_suppkey")
        .select(cell())
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    return (
        cc.join(sc, "cell", "full_outer")
        .select(
            "cell",
            F.coalesce("n_customers", F.lit(0)).cast("bigint").alias("n_customers"),
            F.coalesce("n_suppliers", F.lit(0)).cast("bigint").alias("n_suppliers"),
        )
    )


# --- grid-DBSCAN clustering -----------------------------------------------

DB_MINPTS = 5  # a cell is CORE when it holds >= this many points


@register(
    "geo_dbscan_grid",
    tags=("geo", "clustering", "iterative"),
    oracle=f"""
WITH RECURSIVE c AS ({_sql_place('customer', 'c_custkey')}),
cells AS (
  SELECT (x // {RADIUS}) * 1000000 + (y // {RADIUS}) AS cell,
         COUNT(*) AS n
  FROM c GROUP BY 1
),
core AS (
  SELECT cell, n, cell // 1000000 AS cx, cell % 1000000 AS cy
  FROM cells WHERE n >= {DB_MINPTS}
),
edges AS (
  SELECT a.cell AS u, b.cell AS v
  FROM core a JOIN core b
    ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1
   AND a.cell < b.cell
),
und AS (SELECT u AS src, v AS dst FROM edges UNION ALL SELECT v, u FROM edges),
reach(node, lab) AS (
  SELECT cell, cell FROM core
  UNION
  SELECT e.dst, r.lab FROM reach r JOIN und e ON e.src = r.node
),
labels AS (SELECT node AS cell, MIN(lab) AS cluster FROM reach GROUP BY node)
SELECT l.cluster AS cluster_id,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(co.n) AS BIGINT) AS n_points
FROM core co JOIN labels l ON co.cell = l.cell
GROUP BY l.cluster
""",
)
def geo_dbscan_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-DBSCAN: density clustering without pairwise distances —
    cells holding ≥ {DB_MINPTS} points are CORE, 8-adjacent core cells
    merge, and connected groups of core cells are the clusters (the
    GriT-DBSCAN-style reduction that keeps DBSCAN's density semantics
    at a grid join's cost). The spatial twin of the LSH-bucket →
    connected-components dedup pipeline, assembled from this engine's
    existing pieces: the geo grid and the min-label component loop.

    Cell aggregation is one corpus shuffle; everything after runs on
    O(occupied core cells) rows — adjacency is a bounded 3×3
    neighborhood self-join, components are integer min-label rounds
    proven against DuckDB's recursive closure."""
    from .graph import min_label_components

    pts = _place(load(spark, sf_dir, "customer"), "c_custkey")
    cells = (
        pts.groupBy(
            (
                F.expr(f"(x div {RADIUS}) * 1000000 + (y div {RADIUS})")
            ).alias("cell")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    core = cells.filter(F.col("n") >= DB_MINPTS).select(
        "cell",
        "n",
        F.expr("cell div 1000000").alias("cx"),
        (F.col("cell") % 1000000).alias("cy"),
    )
    a, b = core.alias("a"), core.alias("b")
    edges = a.join(
        b,
        (F.abs(F.col("a.cx") - F.col("b.cx")) <= 1)
        & (F.abs(F.col("a.cy") - F.col("b.cy")) <= 1)
        & (F.col("a.cell") < F.col("b.cell")),
    ).select(F.col("a.cell").alias("u"), F.col("b.cell").alias("v"))
    labels = min_label_components(edges)
    clustered = (
        core.join(
            labels.select(F.col("node").alias("cell"), F.col("lab")),
            "cell",
            "left",
        )
        # isolated core cells never appear in the edge list — they are
        # their own single-cell clusters
        .select("cell", "n", F.coalesce("lab", F.col("cell")).alias("cluster"))
    )
    return clustered.groupBy(F.col("cluster").alias("cluster_id")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.sum("n").cast("bigint").alias("n_points"),
    )


# --- geohash encoding -----------------------------------------------------

GH_BITS = 20   # bits per axis -> 40-bit cell = 8 base32 chars
GH_CHARS = 8
_GH32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _gh_interleave_sql(x: str, y: str) -> str:
    """Morton-interleave two GH_BITS-bit ints, x on the EVEN (low) bit
    positions (geohash convention: first/highest bit is longitude)."""
    terms = []
    for i in range(GH_BITS):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i})")
    return " | ".join(terms)


def _gh_chars_sql(code: str) -> str:
    parts = [
        f"substr('{_GH32}', CAST((({code}) >> {5 * (GH_CHARS - 1 - j)}) & 31 AS INTEGER) + 1, 1)"
        for j in range(GH_CHARS)
    ]
    return " || ".join(parts)


@register(
    "geo_geohash_encode",
    tags=("geo", "encoding"),
    oracle=f"""
WITH placed AS ({_sql_place("customer", "c_custkey")}),
scaled AS (
  SELECT c_custkey, x, y,
         (x * {1 << GH_BITS}) // {WORLD} AS xb,
         (y * {1 << GH_BITS}) // {WORLD} AS yb
  FROM placed
),
coded AS (
  SELECT c_custkey, x, y, {_gh_interleave_sql("xb", "yb")} AS code
  FROM scaled
)
SELECT c_custkey, x, y,
       {_gh_chars_sql("code")} AS geohash,
       substr({_gh_chars_sql("code")}, 1, 4) AS cell4
FROM coded
""",
)
def geo_geohash_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GEOHASH encoding of the synthetic placements: scale each axis
    to {GH_BITS} bits, Morton-interleave (x on the high bit — the
    longitude-first geohash convention), and render {GH_CHARS} base32
    characters. The PREFIX property is the point: truncating the
    string is exactly coarsening the grid, so prefix equality is a
    hierarchical cell join key (the S2/H3-style index the geo module's
    flat grid graduates to), LIKE 'u4pr%' is a spatial range scan, and
    lexicographic sort order is a space-filling-curve layout — the
    same clustering trick as `scan_zorder_write`, made human-readable.

    Pure integer bit arithmetic and table lookups — bitwise identical
    everywhere; zero shuffles (a projection)."""
    placed = _place(load(spark, sf_dir, "customer"), "c_custkey")
    scaled = placed.select(
        "c_custkey",
        "x",
        "y",
        F.expr(f"(x * {1 << GH_BITS}) div {WORLD}").alias("xb"),
        F.expr(f"(y * {1 << GH_BITS}) div {WORLD}").alias("yb"),
    )
    coded = scaled.select(
        "c_custkey",
        "x",
        "y",
        F.expr(_gh_interleave_sql("xb", "yb")).alias("code"),
    )
    gh = F.expr(_gh_chars_sql("code"))
    return coded.select(
        "c_custkey",
        "x",
        "y",
        gh.alias("geohash"),
        F.substring(gh, 1, 4).alias("cell4"),
    )


# --- point-in-polygon geofencing -------------------------------------------

# Literal fence polygons (centi-units): a convex quad, a non-convex
# pentagon, and a triangle. Vertices are ordered; the edge list closes
# each ring.
POLYGONS: dict[int, list[tuple[int, int]]] = {
    1: [(10000, 10000), (40000, 15000), (35000, 45000), (12000, 38000)],
    2: [(50000, 50000), (90000, 55000), (60000, 70000), (85000, 90000),
        (52000, 85000)],
    3: [(20000, 60000), (45000, 95000), (5000, 90000)],
}


def _polygon_edges() -> list[tuple[int, int, int, int, int]]:
    """(polygon_id, x1, y1, x2, y2) per edge, ring-closed."""
    rows = []
    for pid, verts in POLYGONS.items():
        for i, (x1, y1) in enumerate(verts):
            x2, y2 = verts[(i + 1) % len(verts)]
            rows.append((pid, x1, y1, x2, y2))
    return rows


_SQL_EDGE_VALUES = ", ".join(
    f"({pid}, {x1}, {y1}, {x2}, {y2})" for pid, x1, y1, x2, y2 in _polygon_edges()
)
_SQL_NVERTS = ", ".join(f"({pid}, {len(v)})" for pid, v in POLYGONS.items())


@register(
    "geo_point_in_polygon",
    tags=("geo", "joins", "polygon"),
    oracle=f"""
WITH pts AS ({_sql_place('customer', 'c_custkey')}),
edges(pid, x1, y1, x2, y2) AS (VALUES {_SQL_EDGE_VALUES}),
nv(pid, n_vertices) AS (VALUES {_SQL_NVERTS}),
crossings AS (
  SELECT p.c_custkey, e.pid,
         CASE WHEN (e.y1 > p.y) <> (e.y2 > p.y)
              AND ((e.y2 - e.y1 > 0 AND
                    (p.x - e.x1) * (e.y2 - e.y1)
                      < (e.x2 - e.x1) * (p.y - e.y1))
                OR (e.y2 - e.y1 < 0 AND
                    (p.x - e.x1) * (e.y2 - e.y1)
                      > (e.x2 - e.x1) * (p.y - e.y1)))
              THEN 1 ELSE 0 END AS hit
  FROM pts p CROSS JOIN edges e
),
inside AS (
  SELECT c_custkey, pid FROM crossings
  GROUP BY c_custkey, pid HAVING SUM(hit) % 2 = 1
),
npts AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_points FROM pts)
SELECT nv.pid AS polygon_id,
       CAST(nv.n_vertices AS BIGINT) AS n_vertices,
       CAST(COUNT(i.c_custkey) AS BIGINT) AS n_inside,
       CAST(COUNT(i.c_custkey) AS DOUBLE) / ANY_VALUE(np.n_points)
         AS frac_inside
FROM nv CROSS JOIN npts np
LEFT JOIN inside i ON i.pid = nv.pid
GROUP BY nv.pid, nv.n_vertices
""",
)
def geo_point_in_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-polygon geofencing by ray casting, in EXACT int64
    arithmetic: a point is inside when a horizontal ray crosses the
    ring an odd number of times, and the crossing test cross-multiplies
    instead of dividing ((px-x1)(y2-y1) vs (x2-x1)(py-y1), sign-
    adjusted) so no float ever appears — nothing for two engines to
    round apart. Fences are literal rings (convex, non-convex, and
    triangle cases); points are the deterministic customer placement
    shared by the whole geo family.

    Scale shape: the edge table is O(total vertices) and BROADCASTS to
    every task (a fence set is always tiny next to the point corpus);
    each point evaluates all edges map-side and reduces by (point,
    polygon) parity with map-side partial aggregation. At planetary
    fence counts the broadcast swaps for a grid-cell pre-join (only
    polygons whose bbox cell matches the point's cell) — the same
    candidates-from-buckets reduction as ``geo_radius_join``."""
    pts = _place(load(spark, sf_dir, "customer"), "c_custkey")
    edges = spark.createDataFrame(
        _polygon_edges(), "pid int, x1 long, y1 long, x2 long, y2 long"
    )
    nv = spark.createDataFrame(
        [(pid, len(v)) for pid, v in POLYGONS.items()], "pid int, n_vertices long"
    )
    dy = F.col("y2") - F.col("y1")
    lhs = (F.col("x") - F.col("x1")) * dy
    rhs = (F.col("x2") - F.col("x1")) * (F.col("y") - F.col("y1"))
    straddles = (F.col("y1") > F.col("y")) != (F.col("y2") > F.col("y"))
    hit = F.when(
        straddles & (((dy > 0) & (lhs < rhs)) | ((dy < 0) & (lhs > rhs))), 1
    ).otherwise(0)
    inside = (
        pts.crossJoin(F.broadcast(edges))
        .select("c_custkey", "pid", hit.alias("hit"))
        .groupBy("c_custkey", "pid")
        .agg(F.sum("hit").alias("n_cross"))
        .filter(F.col("n_cross") % 2 == 1)
    )
    npts = pts.agg(F.count(F.lit(1)).cast("bigint").alias("n_points"))
    # Reduce BEFORE the final join: per-polygon counts are O(#polygons)
    # rows after map-side partials, so the tiny fence frame joins a
    # broadcast 3-row aggregate instead of shuffling every inside-point
    # row through a 3-key (maximally skewed) join.
    per_poly = inside.groupBy("pid").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_in")
    )
    return (
        nv.crossJoin(F.broadcast(npts))
        .join(F.broadcast(per_poly), "pid", "left")
        .select(
            F.col("pid").alias("polygon_id"),
            "n_vertices",
            F.coalesce(F.col("n_in"), F.lit(0)).cast("bigint").alias("n_inside"),
            (
                F.coalesce(F.col("n_in"), F.lit(0)).cast("double")
                / F.col("n_points")
            ).alias("frac_inside"),
        )
    )


# --- trajectory similarity (grid-signature candidates) ---------------------

TRAJ_CELL = 5_000       # grid cell edge, centi-units
TRAJ_USER_CAP = 400     # evaluation range (PAIRWISE_CAP idiom)
TRAJ_TOP_K = 20
_TM1, _TM2 = 731, 977   # per-minute path step primes
_TB1, _TB2 = 12_345, 54_321  # per-class base offsets


@register(
    "geo_trajectory_similarity",
    tags=("geo", "trajectory", "similarity", "topk"),
    oracle=f"""
WITH pts AS (
  SELECT user_id,
         ((user_id % 7) * {_TB1}
          + (CAST(floor(epoch(ts)) AS BIGINT) // 60) * {_TM1}) % {WORLD} AS x,
         ((user_id % 7) * {_TB2}
          + (CAST(floor(epoch(ts)) AS BIGINT) // 60) * {_TM2}) % {WORLD} AS y
  FROM events WHERE user_id < {TRAJ_USER_CAP}
),
cells AS (
  SELECT DISTINCT user_id, x // {TRAJ_CELL} AS cx, y // {TRAJ_CELL} AS cy
  FROM pts
),
sizes AS (SELECT user_id, COUNT(*) AS n_cells FROM cells GROUP BY user_id),
common AS (
  SELECT a.user_id AS user_a, b.user_id AS user_b, COUNT(*) AS n_common
  FROM cells a JOIN cells b
    ON a.cx = b.cx AND a.cy = b.cy AND a.user_id < b.user_id
  GROUP BY a.user_id, b.user_id
)
SELECT user_a, user_b,
       CAST(n_common AS BIGINT) AS n_common,
       CAST(n_common AS DOUBLE)
         / (sa.n_cells + sb.n_cells - n_common) AS jaccard
FROM common
JOIN sizes sa ON sa.user_id = user_a
JOIN sizes sb ON sb.user_id = user_b
ORDER BY jaccard DESC, user_a, user_b
LIMIT {TRAJ_TOP_K}
""",
)
def geo_trajectory_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k trajectory similarity via GRID SIGNATURES — the
    candidates-from-buckets reduction of distributed trajectory search
    (REPOSE, ICDE 2021, PAPERS.md — reference-point tries play the role
    our grid cells play here): each user's event-time path becomes the
    SET of grid cells it visits; pair candidates come from an equi-join
    on shared cells (never all user pairs); similarity is exact cell-set
    Jaccard; top-k by (jaccard, pair) is fully ordered. Trajectories
    derive deterministically from (user class, event minute) — int64
    arithmetic both engines reproduce bitwise — and the evaluation
    range is capped (the PAIRWISE_CAP idiom) because users in one path
    class share most cells: at corpus scale the cap is replaced by
    REPOSE-style per-cell reference pruning plus the hot-bucket
    star-edge guard this repo applies to its LSH banding (same
    degenerate-bucket problem, same fix).

    Scale shape: one distinct over (user, cell) — O(events) —, one
    shared-cell equi-join bounded by cell occupancy, one pair-keyed
    count with map-side partials, and a global TOP_K TakeOrdered."""
    ev = spread(
        load(spark, sf_dir, "events").filter(F.col("user_id") < TRAJ_USER_CAP)
    )
    minute = F.expr("div(CAST(floor(unix_timestamp(ts)) AS BIGINT), 60)")
    cls = F.col("user_id") % 7
    pts = ev.select(
        "user_id",
        ((cls * _TB1 + minute * _TM1) % WORLD).alias("x"),
        ((cls * _TB2 + minute * _TM2) % WORLD).alias("y"),
    )
    cells = pts.select(
        "user_id",
        F.expr(f"div(x, {TRAJ_CELL})").alias("cx"),
        F.expr(f"div(y, {TRAJ_CELL})").alias("cy"),
    ).distinct()
    sizes = cells.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_cells"))
    a = cells.select(
        F.col("user_id").alias("user_a"), "cx", "cy"
    ).hint("shuffle_hash")
    b = cells.select(
        F.col("user_id").alias("user_b"), "cx", "cy"
    ).hint("shuffle_hash")
    common = (
        a.join(b, ["cx", "cy"])
        .filter(F.col("user_a") < F.col("user_b"))
        .groupBy("user_a", "user_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("user_id").alias("user_a"), F.col("n_cells").alias("na"))
    sb = sizes.select(F.col("user_id").alias("user_b"), F.col("n_cells").alias("nb"))
    return (
        common.join(F.broadcast(sa), "user_a")
        .join(F.broadcast(sb), "user_b")
        .select(
            "user_a",
            "user_b",
            F.col("n_common").cast("bigint").alias("n_common"),
            (
                F.col("n_common").cast("double")
                / (F.col("na") + F.col("nb") - F.col("n_common"))
            ).alias("jaccard"),
        )
        .orderBy(F.desc("jaccard"), "user_a", "user_b")
        .limit(TRAJ_TOP_K)
    )


# --- hexagonal binning (H3-style cube rounding) --------------------------------

HEX_SIZE = 700.0  # hex circumradius, centi-units
_SQRT3_3 = 0.5773502691896257  # sqrt(3)/3, shared literal both engines
_THIRD = 0.3333333333333333
_TWO_THIRDS = 0.6666666666666666


@register(
    "geo_hex_binning",
    tags=("geo", "binning", "hex"),
    oracle=f"""
WITH pts AS ({{PLACE}}),
ax AS (
  SELECT c_custkey,
         (CAST({_SQRT3_3} AS DOUBLE) * x - CAST({_THIRD} AS DOUBLE) * y)
           / CAST({HEX_SIZE} AS DOUBLE) AS qf,
         (CAST({_TWO_THIRDS} AS DOUBLE) * y) / CAST({HEX_SIZE} AS DOUBLE) AS rf
  FROM pts
),
cube AS (
  SELECT c_custkey, qf, rf, -qf - rf AS yf,
         round(qf, 0) AS rx, round(-qf - rf, 0) AS ry, round(rf, 0) AS rz
  FROM ax
),
fixed AS (
  SELECT c_custkey,
         CASE WHEN abs(rx - qf) > abs(ry - yf) AND abs(rx - qf) > abs(rz - rf)
              THEN -(ry + rz) ELSE rx END AS fq,
         CASE WHEN abs(rx - qf) > abs(ry - yf) AND abs(rx - qf) > abs(rz - rf)
              THEN rz
              WHEN abs(ry - yf) > abs(rz - rf) THEN rz
              ELSE -(rx + ry) END AS fr
  FROM cube
)
SELECT CAST(fq AS BIGINT) AS q, CAST(fr AS BIGINT) AS r,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(MIN(c_custkey) AS BIGINT) AS min_key
FROM fixed GROUP BY fq, fr
""".replace("{PLACE}", _sql_place("customer", "c_custkey")),
)
def geo_hex_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hexagonal spatial binning (the H3/Uber cell shape, flat grid's
    superior cousin: equidistant neighbors, ~13% lower quantization
    error): points map to fractional axial coordinates, then CUBE
    ROUNDING (round all three cube components, re-fix the one with the
    largest rounding error so x+y+z=0 — the exact algorithm from the
    hex-grid literature) assigns the containing hex. Both engines
    evaluate the identical double expression tree with shared literal
    constants, so cell ids match exactly. Scale: pure codegen
    expressions ahead of one count aggregate — same shape as the flat
    geo_cell_density, so everything said there about O(occupied cells)
    carries over."""
    import math

    assert abs(_SQRT3_3 - math.sqrt(3.0) / 3.0) < 1e-16
    pts = _place(load(spark, sf_dir, "customer"), "c_custkey")
    size = F.lit(HEX_SIZE)
    qf = (F.lit(_SQRT3_3) * F.col("x") - F.lit(_THIRD) * F.col("y")) / size
    rf = (F.lit(_TWO_THIRDS) * F.col("y")) / size
    ax = pts.select("c_custkey", qf.alias("qf"), rf.alias("rf"))
    cube = ax.select(
        "c_custkey", "qf", "rf",
        (-F.col("qf") - F.col("rf")).alias("yf"),
        F.round(F.col("qf"), 0).alias("rx"),
        F.round(-F.col("qf") - F.col("rf"), 0).alias("ry"),
        F.round(F.col("rf"), 0).alias("rz"),
    )
    dx = F.abs(F.col("rx") - F.col("qf"))
    dy = F.abs(F.col("ry") - F.col("yf"))
    dz = F.abs(F.col("rz") - F.col("rf"))
    x_bad = (dx > dy) & (dx > dz)
    fixed = cube.select(
        "c_custkey",
        F.when(x_bad, -(F.col("ry") + F.col("rz"))).otherwise(F.col("rx")).alias("fq"),
        F.when(x_bad, F.col("rz"))
        .when(dy > dz, F.col("rz"))
        .otherwise(-(F.col("rx") + F.col("ry")))
        .alias("fr"),
    )
    return fixed.groupBy(
        F.col("fq").cast("bigint").alias("q"),
        F.col("fr").cast("bigint").alias("r"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.min("c_custkey").cast("bigint").alias("min_key"),
    )
