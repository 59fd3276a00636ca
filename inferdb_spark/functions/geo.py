"""Geospatial scalar functions.

The reference ships a plpgsql `calculate_distance` implementing the
spherical law of cosines with mile/km/nautical-mile units
(sql_scripts/geo_distance.sql:30-60).  Its Python featurizer path uses true
WGS84 geodesics (geographiclib) — the SQL formula is the spec we replicate
(SURVEY.md §2.8 notes the discrepancy).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_MILES_FACTOR = 60 * 1.1515  # statute miles per degree, as in the ref SQL


def spherical_distance(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column, units: str = "km"
) -> Column:
    """Spherical law of cosines distance (sql_scripts/geo_distance.sql:30-60).

    dist = acos(sin(lat1)sin(lat2) + cos(lat1)cos(lat2)cos(lon1-lon2)) in
    degrees * 60 * 1.1515 (miles); km = miles*1.609344; nmi = miles*0.8684.
    Identical-point rows short-circuit to 0 (acos domain safety).
    """
    theta = lon1 - lon2
    cos_arg = F.sin(F.radians(lat1)) * F.sin(F.radians(lat2)) + F.cos(
        F.radians(lat1)
    ) * F.cos(F.radians(lat2)) * F.cos(F.radians(theta))
    # clamp for fp noise at identical/antipodal points, as acos NaNs outside [-1,1]
    cos_arg = F.least(F.lit(1.0), F.greatest(F.lit(-1.0), cos_arg))
    miles = F.degrees(F.acos(cos_arg)) * F.lit(EARTH_RADIUS_MILES_FACTOR)
    if units == "miles":
        out = miles
    elif units == "km":
        out = miles * F.lit(1.609344)
    elif units == "nmi":
        out = miles * F.lit(0.8684)
    else:
        raise ValueError(f"unknown units {units!r}")
    return F.when((lat1 == lat2) & (lon1 == lon2), F.lit(0.0)).otherwise(out)


def euclidean_distance_sq(x1: Column, y1: Column, x2: Column, y2: Column) -> Column:
    """Squared euclidean distance — used for nearest-cluster assignment
    (src/featurizers/create_featurizer_pg.py:106-107 uses SQRT; comparisons
    are monotone in the square so we skip the sqrt in argmin paths)."""
    dx, dy = x1 - x2, y1 - y2
    return dx * dx + dy * dy


def bearing_degrees(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Initial great-circle bearing in [0, 360) degrees
    (src/featurizers/nyc_rides_featurizer.py:115-135 computes azimuth)."""
    dlon = F.radians(lon2 - lon1)
    y = F.sin(dlon) * F.cos(F.radians(lat2))
    x = F.cos(F.radians(lat1)) * F.sin(F.radians(lat2)) - F.sin(
        F.radians(lat1)
    ) * F.cos(F.radians(lat2)) * F.cos(dlon)
    return (F.degrees(F.atan2(y, x)) + 360.0) % 360.0


def compass_quadrant(bearing: Column) -> Column:
    """Bearing -> compass quadrant label, the reference's direction feature
    (src/featurizers/nyc_rides_featurizer.py:137-163)."""
    return (
        F.when((bearing >= 315) | (bearing < 45), F.lit("N"))
        .when(bearing < 135, F.lit("E"))
        .when(bearing < 225, F.lit("S"))
        .otherwise(F.lit("W"))
    )
