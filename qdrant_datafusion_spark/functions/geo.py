"""Geo scoring — ``V_GEO_DISTANCE`` + ``V_GAUSS_DECAY``
(reference tests/bin/tests.sql:282-303: gaussian-decay geo boosting).

Pure built-in trigonometry (sin/cos/atan2/radians) — codegen'd, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_M = 6_371_000.0


def v_geo_distance(
    lat1: Column, lon1: Column, lat2: Column | float, lon2: Column | float
) -> Column:
    """Haversine great-circle distance in meters.

    ``(lat2, lon2)`` may be literals — the ``POINT(lat, lon)`` constructor
    shape (tests/bin/tests.sql:295-299).
    """
    lat2c = F.lit(float(lat2)) if not isinstance(lat2, Column) else lat2
    lon2c = F.lit(float(lon2)) if not isinstance(lon2, Column) else lon2
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2c)
    dlat = F.radians(lat2c - lat1)
    dlon = F.radians(lon2c - lon1)
    a = (
        F.sin(dlat / 2) * F.sin(dlat / 2)
        + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlon / 2) * F.sin(dlon / 2)
    )
    return F.lit(2.0 * EARTH_RADIUS_M) * F.atan2(F.sqrt(a), F.sqrt(1 - a))


def v_gauss_decay(distance: Column, scale: float) -> Column:
    """Gaussian decay boost in (0, 1] — ``V_GAUSS_DECAY(distance, scale)``
    (tests/bin/tests.sql:294-300)."""
    return F.exp(-(distance * distance) / F.lit(2.0 * float(scale) * float(scale)))
