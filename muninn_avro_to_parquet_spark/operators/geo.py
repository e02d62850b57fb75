"""Geospatial primitives: haversine distance + grid-bucketed neighbor
joins.

The same bucket-join discipline every pair-generating operator in this
engine uses (LSH bands, fuzzy blocks, PQ cells) applied to coordinates:
points hash into fixed-degree grid cells, each point probes its own and
the 8 adjacent cells (so no near pair straddling a cell edge is lost for
radii up to one cell size), candidates equi-join on the cell key, and the
exact haversine filter runs post-join in codegen. Never a cross product;
``max_cell`` guards the one pathological case (everything in one city).

Determinism: the haversine evaluates in IEEE double with a fixed
expression order — sin/cos differ across libm implementations by ~1 ulp,
which is ~1e-9 relative; rounding the distance to 3 decimals (meters at
km scale) leaves six orders of magnitude of margin, so the DuckDB oracle
hash-matches (same precedent as the ln/exp rounding in the TF-IDF and LM
operators)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0


def haversine_km(lat_a: Column, lon_a: Column, lat_b: Column, lon_b: Column) -> Column:
    """Great-circle distance in km (haversine formula, fixed evaluation
    order: dlat/dlon halves → sin² terms → asin)."""
    dlat = F.radians(lat_b - lat_a) / 2.0
    dlon = F.radians(lon_b - lon_a) / 2.0
    a = (
        F.sin(dlat) * F.sin(dlat)
        + F.cos(F.radians(lat_a)) * F.cos(F.radians(lat_b)) * F.sin(dlon) * F.sin(dlon)
    )
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def grid_cell(lat: Column, lon: Column, cell_deg: float) -> tuple[Column, Column]:
    """Integer grid-cell coordinates for a fixed-degree grid."""
    return (
        F.floor(lat / F.lit(cell_deg)).cast("long"),
        F.floor(lon / F.lit(cell_deg)).cast("long"),
    )


def neighbor_pairs(
    df: DataFrame,
    id_col: str,
    lat_col: str,
    lon_col: str,
    radius_km: float,
    cell_deg: float = 1.0,
    max_cell: int | None = None,
) -> DataFrame:
    """All point pairs within ``radius_km`` (id_a < id_b, exact haversine,
    rounded to 3 decimals) via the 3x3 grid-probe bucket join.

    ``cell_deg`` must make one cell at least ``radius_km`` wide at the
    latitudes in play (1° latitude ≈ 111 km; longitude shrinks toward the
    poles — pick the cell from the worst-case latitude), otherwise pairs
    straddling more than one cell boundary are missed. ``max_cell`` drops
    over-dense cells like every other bucket guard here.

    Antimeridian: points within one cell of the ±180° seam are duplicated
    on the probing side with ``lon ± 360`` (re-bucketed at the shifted
    longitude), so near pairs straddling the seam are found; the haversine
    is 360°-periodic in Δlon, so the shifted copy scores the exact same
    distance. ``cell_deg`` must be ≤ 90 so the shifted probe cells can
    never collide with the unshifted 3x3 neighborhood (≥4 cells around the
    globe keeps them >2 cells apart). Pole-crossing pairs (two points
    within ``radius_km`` of the same pole across meridians) are still
    out of contract — a polar cap cell would be the fix at that latitude."""
    if cell_deg > 90.0:
        raise ValueError(
            f"cell_deg={cell_deg} > 90: with fewer than 4 longitude cells the "
            "antimeridian probe duplicates collide with the 3x3 neighborhood"
        )
    cy, cx = grid_cell(F.col(lat_col), F.col(lon_col), cell_deg)
    pts = df.select(
        F.col(id_col),
        F.col(lat_col).cast("double").alias("_lat"),
        F.col(lon_col).cast("double").alias("_lon"),
        cy.alias("_cy"),
        cx.alias("_cx"),
    )
    if max_cell is not None:
        sizes = pts.groupBy("_cy", "_cx").agg(F.count("*").alias("_n"))
        pts = pts.join(
            sizes.filter(F.col("_n") <= max_cell).select("_cy", "_cx"),
            ["_cy", "_cx"],
        )
    # seam duplicates: the probing side gains a lon±360 copy of every
    # point within one cell of the antimeridian, re-bucketed at the
    # shifted longitude (the home side stays unshifted — each straddling
    # pair is reached from the endpoint whose shifted probe lands on the
    # other's home cell, and the id_a < id_b filter keeps one direction)
    east = pts.filter(F.col("_lon") >= F.lit(180.0 - cell_deg)).withColumn(
        "_lon", F.col("_lon") - F.lit(360.0)
    )
    west = pts.filter(F.col("_lon") < F.lit(-180.0 + cell_deg)).withColumn(
        "_lon", F.col("_lon") + F.lit(360.0)
    )
    probe_pts = (
        pts.unionByName(east)
        .unionByName(west)
        .withColumn("_cx", F.floor(F.col("_lon") / F.lit(cell_deg)).cast("long"))
    )
    # the LEFT side probes its 3x3 neighborhood; the right side stays in
    # its own cell — every near pair is generated exactly once per
    # (probe, home) combination and dedup falls out of the id_a < id_b
    # filter plus the distinct cell key
    probing = probe_pts.select(
        F.col(id_col).alias("id_a"),
        F.col("_lat").alias("_lat_a"),
        F.col("_lon").alias("_lon_a"),
        "_cy",
        "_cx",
        F.expr(
            "explode(flatten(transform(sequence(-1, 1), dy -> "
            "transform(sequence(-1, 1), dx -> struct(dy, dx)))))"
        ).alias("_o"),
    ).select(
        "id_a",
        "_lat_a",
        "_lon_a",
        (F.col("_cy") + F.col("_o.dy")).alias("_cy"),
        (F.col("_cx") + F.col("_o.dx")).alias("_cx"),
    )
    home = pts.select(
        F.col(id_col).alias("id_b"),
        F.col("_lat").alias("_lat_b"),
        F.col("_lon").alias("_lon_b"),
        "_cy",
        "_cx",
    )
    dist = haversine_km(
        F.col("_lat_a"), F.col("_lon_a"), F.col("_lat_b"), F.col("_lon_b")
    )
    return (
        probing.join(home, ["_cy", "_cx"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(dist, 3).alias("dist_km"))
        .filter(F.col("dist_km") <= radius_km)
    )
