"""Spatial statistics — global Moran's I autocorrelation over a cell
grid (engine-added; the reference projects and measures but never asks
"is this surface clustered?", the first question a spatial analyst puts
to a gridded aggregate).

Moran's I over the OCCUPIED cells of a rollup, rook contiguity:

    I = (n / W) * Σ_ij w_ij z_i z_j / Σ_i z_i²

with w_ij = 1 for occupied rook neighbors (E/W wrap across the
antimeridian — same convention as ``index.cells.neighbors_np``; N/S clip
at the poles), W the number of DIRECTED neighbor pairs, z the deviation
from the occupied-cell mean.

Scale shape: one map-side-combinable count-per-cell aggregate, a 1-row
broadcast for (n, mean), a 4-way in-task neighbor fan-out joined back to
the cell table on the neighbor id (equi-join of two cell-sized tables —
never the point corpus), and a single global reduce.  Determinism: the
mean is sum/count of exact integer sums (bit-identical across engines),
so z is bit-identical; the remaining float sums carry ~1e-13 relative
spread vs the ×1e6 output quantum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..index.cells import _scale


def morans_i(cells: DataFrame, res: int, cell: str = "cell_id",
             val: str = "cnt") -> DataFrame:
    """Global Moran's I of ``val`` over occupied cells at ``res``.

    Returns ONE row: (n_cells, w_pairs, moran_i).  Cells are row-major
    ids (ix * 2^res + iy).  Isolated cells contribute to n and the
    denominator but no pairs; if no pairs exist at all W = 0 and the
    result row carries a null I rather than dividing by zero.
    """
    n_s = _scale(res)
    # Spark inlines CTEs: z feeds THREE consumers (neighbor fan-out, the
    # join's build side, the denominator), and without materialization
    # each replays the upstream cell rollup — at corpus scale that is N
    # extra full scans (observed: 17 exchanges vs 5).  The z table is
    # O(occupied cells), so an eager localCheckpoint is cheap and
    # truncates the replay (same discipline as operators/cluster.py).
    base = cells.select(F.col(cell).alias("c"), F.col(val).cast("long").alias("v"))
    g = base.agg(
        F.count("*").alias("n_cells"),
        (F.sum("v").cast("double") / F.count("*")).alias("mean_v"),
    )
    z = base.crossJoin(F.broadcast(g)).select(
        "c", (F.col("v") - F.col("mean_v")).alias("z"), "n_cells"
    ).localCheckpoint()
    ix = F.floor(F.col("c") / n_s).cast("long")
    iy = (F.col("c") % n_s).cast("long")
    east = ((ix + 1) % n_s) * n_s + iy
    west = ((ix - 1 + n_s) % n_s) * n_s + iy
    north = F.when(iy + 1 < n_s, ix * n_s + iy + 1)
    south = F.when(iy - 1 >= 0, ix * n_s + iy - 1)
    nbrs = z.select(
        "z",
        F.explode(
            F.array_compact(F.array(east, west, north, south))
        ).alias("nc"),
    )
    pairs = nbrs.join(
        z.select(F.col("c").alias("nc"), F.col("z").alias("z2")), "nc"
    )
    num = pairs.agg(
        F.count("*").alias("w_pairs"), F.sum(F.col("z") * F.col("z2")).alias("num")
    )
    den = z.groupBy("n_cells").agg(F.sum(F.col("z") ** 2).alias("den"))
    return den.crossJoin(num).select(
        F.col("n_cells"),
        F.col("w_pairs"),
        F.when(
            (F.col("w_pairs") > 0) & (F.col("den") > 0.0),
            (F.col("n_cells").cast("double") / F.col("w_pairs"))
            * F.col("num") / F.col("den"),
        ).alias("moran_i"),
    )


def getis_ord_gstar(cells: DataFrame, res: int, cell: str = "cell_id",
                    val: str = "cnt") -> DataFrame:
    """Local Getis-Ord G* hot/cold-spot score per occupied cell.

        G*_i = (Σ_j∈N*(i) x_j − x̄·W_i) / (S·√((n·W_i − W_i²)/(n−1)))

    with N*(i) the rook neighborhood INCLUDING i itself (the "star"
    variant; E/W wrap, N/S clip — same lattice as ``morans_i``), W_i its
    occupied size, x̄ and S the global mean / standard deviation.
    |G*| ≳ 2 flags a significant hot (positive) or cold (negative) spot.

    Determinism is total: Σx, Σx², the per-cell Σ_j x_j and W_i are all
    EXACT integer aggregates, and the float formula on top is the same
    operation sequence in both engines — the output is bit-identical,
    not merely within-quantum.  Same materialization discipline as
    ``morans_i`` (the cell table feeds the fan-out and the join build).
    Degenerate guards: null G* when n < 2 or S = 0.
    """
    n_s = _scale(res)
    base = cells.select(
        F.col(cell).alias("c"), F.col(val).cast("long").alias("v")
    ).localCheckpoint()
    g = base.agg(
        F.count("*").alias("n_cells"),
        F.sum("v").alias("sum_v"),
        F.sum(F.col("v") * F.col("v")).alias("sum_v2"),
    )
    ix = F.floor(F.col("c") / n_s).cast("long")
    iy = (F.col("c") % n_s).cast("long")
    east = ((ix + 1) % n_s) * n_s + iy
    west = ((ix - 1 + n_s) % n_s) * n_s + iy
    north = F.when(iy + 1 < n_s, ix * n_s + iy + 1)
    south = F.when(iy - 1 >= 0, ix * n_s + iy - 1)
    fan = base.select(
        F.col("c"),
        F.explode(
            F.array_compact(F.array(F.col("c"), east, west, north, south))
        ).alias("nc"),
    )
    hood = (
        fan.join(base.select(F.col("c").alias("nc"), F.col("v").alias("xv")),
                 "nc")
        .groupBy("c")
        .agg(F.sum("xv").alias("wsum"), F.count("*").alias("w_i"))
    )
    n = F.col("n_cells").cast("double")
    mean = F.col("sum_v").cast("double") / n
    s = F.sqrt(F.col("sum_v2").cast("double") / n - mean * mean)
    wi = F.col("w_i").cast("double")
    denom = s * F.sqrt((n * wi - wi * wi) / (n - 1.0))
    return hood.crossJoin(F.broadcast(g)).select(
        F.col("c").alias(cell),
        F.col("w_i"),
        F.when(
            (F.col("n_cells") > 1) & (s > 0.0),
            (F.col("wsum").cast("double") - mean * wi) / denom,
        ).alias("gstar"),
    )


def local_moran(cells: DataFrame, res: int, cell: str = "cell_id",
                val: str = "cnt") -> DataFrame:
    """Local Moran's I (Anselin's LISA) per occupied cell — the per-cell
    decomposition of ``morans_i``:

        I_i = (z_i / m2) · Σ_j∈N(i) z_j        m2 = Σ z² / n

    Rook contiguity EXCLUDING self (E/W wrap, N/S clip — the same lattice
    as ``morans_i``; G* is the including-self companion).  Positive I_i =
    the cell sits in a high-high or low-low cluster; negative = a spatial
    outlier.  Cells whose neighborhood is empty get a null I_i (no spatial
    evidence either way) but still appear with w_i = 0.

    Same scale/determinism shape as its siblings: the z table is
    materialized once (three consumers), the fan-out is in-task, the one
    equi-join moves cell-sized tables, and the mean feeding z is
    sum/count of exact integers (bit-identical cross-engine).
    """
    n_s = _scale(res)
    base = cells.select(F.col(cell).alias("c"), F.col(val).cast("long").alias("v"))
    g = base.agg(
        F.count("*").alias("n_cells"),
        (F.sum("v").cast("double") / F.count("*")).alias("mean_v"),
    )
    z = base.crossJoin(F.broadcast(g)).select(
        "c", (F.col("v") - F.col("mean_v")).alias("z"), "n_cells"
    ).localCheckpoint()
    m2 = z.groupBy("n_cells").agg(
        (F.sum(F.col("z") ** 2) / F.col("n_cells").cast("double")).alias("m2")
    ).select("m2")
    ix = F.floor(F.col("c") / n_s).cast("long")
    iy = (F.col("c") % n_s).cast("long")
    east = ((ix + 1) % n_s) * n_s + iy
    west = ((ix - 1 + n_s) % n_s) * n_s + iy
    north = F.when(iy + 1 < n_s, ix * n_s + iy + 1)
    south = F.when(iy - 1 >= 0, ix * n_s + iy - 1)
    fan = z.select(
        "c", "z",
        F.explode(F.array_compact(F.array(east, west, north, south))).alias("nc"),
    )
    hood = (
        fan.join(z.select(F.col("c").alias("nc"), F.col("z").alias("z2")), "nc")
        .groupBy("c", "z")
        .agg(F.sum("z2").alias("lag_z"), F.count("*").alias("w_i"))
    )
    # left join back so isolated cells survive with w_i = 0 / null I_i
    out = (
        z.select("c")
        .join(hood, "c", "left")
        .crossJoin(F.broadcast(m2))
    )
    return out.select(
        F.col("c").alias(cell),
        F.coalesce(F.col("w_i"), F.lit(0)).cast("long").alias("w_i"),
        F.when(
            F.col("w_i").isNotNull() & (F.col("m2") > 0.0),
            F.col("z") / F.col("m2") * F.col("lag_z"),
        ).alias("lisa"),
    )


def mann_kendall(series: DataFrame, key: str = "cell_id",
                 bucket: str = "bucket", val: str = "v") -> DataFrame:
    """Mann-Kendall trend statistic per ``key`` over a SHORT ordered
    bucket series (the per-cell engine of an ESRI-style emerging-hot-spot
    analysis over a space-time cube):

        S = Σ_{i<j} sign(v_j − v_i)        var(S) = n(n−1)(2n+5)/18

    Returns (key, n_buckets, s_stat, z_e6) — S and n are EXACT integers
    (bit-identical cross-engine); z is the tie-free normal approximation
    with the ±1 continuity correction (0 when S = 0), quantized upstream.

    Plan shape: the pair fan-out is a self-equi-join ON ``key`` — with T
    buckets per key that is T²/2 rows per key (T is small and bounded by
    the calendar: ~30 for a month of days), partitioned by the key, never
    a global product.  The variance needs no second scan: n_buckets
    rides the same aggregate.
    """
    # the series table sits on BOTH sides of the pair join AND under the
    # n_buckets aggregate — without materialization the caller's upstream
    # (typically a corpus rollup) executes three times.  It is
    # (key × bucket)-sized, so the checkpoint is cheap; LAZY, so it rides
    # the consumer's own action.
    series = series.select(key, bucket, val).localCheckpoint(eager=False)
    a = series.select(
        F.col(key).alias("k"), F.col(bucket).alias("b1"), F.col(val).alias("v1")
    )
    b = series.select(
        F.col(key).alias("k"), F.col(bucket).alias("b2"), F.col(val).alias("v2")
    )
    pairs = a.join(b, "k").where(F.col("b1") < F.col("b2"))
    agg = pairs.groupBy("k").agg(
        F.sum(F.signum(F.col("v2") - F.col("v1")).cast("long")).alias("s_stat"),
    )
    keys = series.select(F.col(key).alias("k")).groupBy("k").agg(
        F.count("*").alias("n_buckets"))
    n = F.col("n_buckets").cast("double")
    var = n * (n - 1.0) * (2.0 * n + 5.0) / 18.0
    s = F.col("s_stat").cast("double")
    z = (
        F.when(F.col("s_stat") > 0, (s - 1.0) / F.sqrt(var))
        .when(F.col("s_stat") < 0, (s + 1.0) / F.sqrt(var))
        .otherwise(F.lit(0.0))
    )
    return (
        keys.join(agg, "k", "left")
        .select(
            F.col("k").alias(key),
            F.col("n_buckets"),
            F.coalesce(F.col("s_stat"), F.lit(0)).cast("long").alias("s_stat"),
            F.when(F.col("n_buckets") > 1, z)
            .otherwise(F.lit(0.0)).alias("mk_z"),
        )
    )


def ripley_pairs(
    pts: DataFrame,
    radii_m: tuple[float, ...],
    res: int = 6,
    id_col: str = "id",
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Ripley's K pair counts: ONE row with the number of unordered
    point pairs within each radius (the raw ingredient of K̂(r) =
    A·2·n_pairs(r)/(n(n−1)); counts and n are exact integers, so the
    caller can normalize with whatever area convention it likes).

    NEVER all-pairs: points are bucketed at ``res`` and each point fans
    out to a LATITUDE-ADAPTIVE lon ring — the number of E/W neighbor
    cells is ceil(r_max / lon-cell-width at the point's worst-case
    latitude), so high-latitude points (where a fixed ring would MISS
    pairs: 5.625° of longitude is only ~108 km at 80°N) widen their
    window instead of silently undercounting.  N/S stays a fixed ring
    from r_max / cell-lat-span.  The join is a plain cell equi-join of
    the fanned side against the bucketed side; each unordered pair
    matches exactly once per direction and the ``id_a < id_b`` filter
    keeps one — no distinct, no shuffle beyond the join's.

    The brute-force SQL twin (a < b cross pairs) is the oracle — any
    ring that clipped too tight fails the gate by construction.
    """
    # NO explicit materialization here: the fan/bucket sides and n_pts
    # all hang off the same repartitioned scan and AQE's ReusedExchange
    # already runs the derivation once (measured: adding a
    # localCheckpoint made the arm 2x SLOWER — 1.6 s -> 3.2 s at sf0.1;
    # knox_pairs, with two structurally different joins, is the case
    # where the checkpoint wins)
    pairs = _ring_pairs(pts, max(radii_m), res, id_col, lon, lat).select("_d")
    # count(when) not sum(when): an empty pair set must yield 0, not null
    aggs = [
        F.count(F.when(F.col("_d") < F.lit(r), 1)).cast("long")
        .alias(f"pairs_{int(r / 1000)}km")
        for r in radii_m
    ]
    n_row = pts.agg(F.count("*").cast("long").alias("n_pts"))
    return n_row.crossJoin(pairs.agg(*aggs))


def knox_pairs(
    pts: DataFrame,
    r_m: float,
    tau_us: int,
    res: int = 6,
    id_col: str = "id",
    t_col: str = "t_us",
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Knox space-time interaction counts: ONE row with the number of
    unordered pairs close in SPACE (d < r), close in TIME (0 ≤ Δt < τ,
    ties on t broken by id), and close in BOTH — the raw integers of
    the Knox test (X = pairs_both; its null expectation is
    pairs_space·pairs_time/C(n,2), computable by the caller from this
    row).  Epidemiology/crime analytics' standard "do events cluster in
    space AND time simultaneously?" statistic.

    Neither count is all-pairs:

    - spatial candidates come from the same latitude-adaptive cell ring
      as ``ripley_pairs`` (pairs_both only needs spatially-close pairs,
      so it rides the same join with a Δt filter);
    - temporal candidates come from a τ-bucket equi-join: a fans to
      buckets {k−1, k, k+1}, b sits in its own bucket, the canonical
      (t_a < t_b | tie → id_a < id_b) filter keeps each pair once.

    Every output is an exact integer; Δt arithmetic is integer µs and
    the d comparison sees the same doubles on both engines.
    """
    # five consumers of the sampled input (ring fan + bucket, both
    # sides, n_pts) — materialize once (CLAUDE.md: Spark inlines CTEs)
    pts = pts.localCheckpoint()
    spat = _ring_pairs(pts, r_m, res, id_col, lon, lat,
                       extra_cols=[t_col])
    both_cond = (
        F.abs(F.col(f"{t_col}_b") - F.col(f"{t_col}_a")) < F.lit(int(tau_us))
    )
    space_agg = spat.agg(
        F.count(F.when(F.col("_d") < F.lit(r_m), 1)).cast("long")
        .alias("pairs_space"),
        F.count(F.when((F.col("_d") < F.lit(r_m)) & both_cond, 1))
        .cast("long").alias("pairs_both"),
    )
    a = pts.select(
        F.col(id_col).alias("ida"), F.col(t_col).cast("long").alias("ta"),
        F.floor(F.col(t_col).cast("long") / F.lit(int(tau_us))).alias("_k"),
    )
    b = pts.select(
        F.col(id_col).alias("idb"), F.col(t_col).cast("long").alias("tb"),
        F.floor(F.col(t_col).cast("long") / F.lit(int(tau_us))).alias("_kb"),
    )
    fan = a.withColumn("_dk", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1)))) \
           .select("ida", "ta", (F.col("_k") + F.col("_dk")).alias("_kb"))
    canon = (
        (F.col("ta") < F.col("tb"))
        | ((F.col("ta") == F.col("tb")) & (F.col("ida") < F.col("idb")))
    )
    time_agg = (
        fan.join(b, "_kb")
        .where(canon & ((F.col("tb") - F.col("ta")) < F.lit(int(tau_us)))
               & (F.col("tb") - F.col("ta") >= 0))
        .agg(F.count("*").cast("long").alias("pairs_time"))
    )
    n_row = pts.agg(F.count("*").cast("long").alias("n_pts"))
    return n_row.crossJoin(space_agg).crossJoin(time_agg).select(
        "n_pts", "pairs_space", "pairs_time", "pairs_both")


def _ring_pairs(pts, r_max, res, id_col, lon, lat, extra_cols=()):
    """Shared latitude-adaptive cell-ring pair candidate join (the
    ``ripley_pairs`` plan, factored for reuse): returns one row per
    unordered candidate pair with the haversine distance ``_d`` < r_max
    and any ``extra_cols`` carried as <col>_a / <col>_b."""
    import math

    n_s = _scale(res)
    lat_span_deg = 180.0 / n_s
    lon_span_deg = 360.0 / n_s
    deg_m = 111_320.0
    k_lat = int(math.ceil(r_max / (deg_m * lat_span_deg)))
    dlat_max_deg = r_max / deg_m

    a = pts.select(
        F.col(id_col).alias("ida"),
        F.col(lon).alias("lona"), F.col(lat).alias("lata"),
        *[F.col(c).alias(f"{c}_a") for c in extra_cols],
    )
    wlat = F.least(F.abs(F.col("lata")) + F.lit(dlat_max_deg), F.lit(89.0))
    k_lon = F.ceil(
        F.lit(r_max) / (F.lit(deg_m) * F.cos(F.radians(wlat)) * F.lit(lon_span_deg))
    ).cast("int")
    ix = F.least(F.floor((F.col("lona") + 180.0) / F.lit(lon_span_deg))
                 .cast("long"), F.lit(n_s - 1))
    iy = F.least(F.floor((F.col("lata") + 90.0) / F.lit(lat_span_deg))
                 .cast("long"), F.lit(n_s - 1))
    fan = (
        a.withColumn("_kl", k_lon)
        .withColumn("_dx", F.explode(F.sequence(-F.col("_kl"), F.col("_kl"))))
        .withColumn("_dy", F.explode(F.sequence(F.lit(-k_lat), F.lit(k_lat))))
        .select(
            "ida", "lona", "lata",
            *[f"{c}_a" for c in extra_cols],
            ((((ix + F.col("_dx")) % n_s + n_s) % n_s) * n_s
             + (iy + F.col("_dy"))).alias("nc"),
            (iy + F.col("_dy")).alias("_niy"),
        )
        .where((F.col("_niy") >= 0) & (F.col("_niy") < n_s))
        .drop("_niy")
    )
    bx = F.least(F.floor((F.col("lonb") + 180.0) / F.lit(lon_span_deg))
                 .cast("long"), F.lit(n_s - 1))
    by = F.least(F.floor((F.col("latb") + 90.0) / F.lit(lat_span_deg))
                 .cast("long"), F.lit(n_s - 1))
    b = pts.select(
        F.col(id_col).alias("idb"),
        F.col(lon).alias("lonb"), F.col(lat).alias("latb"),
        *[F.col(c).alias(f"{c}_b") for c in extra_cols],
    ).select(
        "idb", "lonb", "latb",
        *[f"{c}_b" for c in extra_cols],
        (bx * n_s + by).alias("nc"),
    )
    from ..functions import haversine_col

    d = haversine_col(F.col("lona"), F.col("lata"), F.col("lonb"), F.col("latb"))
    return (
        fan.join(b, "nc")
        .where(F.col("ida") < F.col("idb"))
        .withColumn("_d", d)
        .where(F.col("_d") < F.lit(r_max))
    )


def std_ellipse(pts: DataFrame, key: str, lon: str = "lon",
                lat: str = "lat") -> DataFrame:
    """Standard deviational ellipse per ``key`` group (CrimeStat/ArcGIS
    convention): mean center, orientation θ (clockwise from north of the
    major axis, in [0°, 180°)), and the two axis standard deviations.

        tan 2θ' = 2·C / (A − B)   A=Σdx², B=Σdy², C=Σdx·dy
        σ₁,₂² = (A+B)/(2n) ± √((A−B)² + 4C²)/(2n)

    computed in planar degree space (the operator is a descriptive
    dispersion summary, not a geodesic quantity — the classic tooling is
    planar too).  ONE map-side-combinable aggregate: raw moments
    (Σx, Σy, Σx², Σy², Σxy, n) per group, closed form on top — no second
    pass, no window.  Degenerate groups (n < 3 or zero variance) yield
    null θ; σ are always real (the discriminant is a norm ≥ 0).

    Determinism: float moment sums carry partition-order spread ~1e-13
    relative; callers quantize outputs orders of magnitude above that.
    θ is ill-conditioned only when A≈B AND C≈0 (a perfectly isotropic
    cloud — the md5-derived fixtures are never within float noise of it).
    """
    m = pts.groupBy(key).agg(
        F.count("*").alias("n"),
        F.sum(lon).alias("sx"), F.sum(lat).alias("sy"),
        F.sum(F.col(lon) * F.col(lon)).alias("sxx"),
        F.sum(F.col(lat) * F.col(lat)).alias("syy"),
        F.sum(F.col(lon) * F.col(lat)).alias("sxy"),
    )
    n = F.col("n").cast("double")
    mx, my = F.col("sx") / n, F.col("sy") / n
    a = F.col("sxx") - n * mx * mx
    b = F.col("syy") - n * my * my
    c = F.col("sxy") - n * mx * my
    # θ' from atan2 is the major-axis direction in math convention;
    # map to compass-from-north, folded into [0, 180)
    theta_m = F.atan2(2.0 * c, a - b) / 2.0
    disc = F.sqrt((a - b) * (a - b) + 4.0 * c * c)
    s1 = F.sqrt((a + b + disc) / (2.0 * n))  # major
    s2 = F.sqrt(F.greatest((a + b - disc) / (2.0 * n), F.lit(0.0)))  # minor
    theta_deg = (F.lit(90.0) - F.degrees(theta_m)) % 180.0
    return m.select(
        key,
        F.col("n").cast("long").alias("n"),
        mx.alias("mean_lon"), my.alias("mean_lat"),
        F.when((F.col("n") >= 3) & (disc > 0.0), theta_deg).alias("theta_deg"),
        s1.alias("sigma_major_deg"), s2.alias("sigma_minor_deg"),
    )
