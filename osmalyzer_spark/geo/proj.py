"""CRS reprojection: LKS-92 (EPSG:3059) <-> WGS84, vectorized.

Spark equivalent of the reference's shapefile ingestion path, which
reprojects Latvian micro-reserve geometry from LKS-92 to WGS84 via ProjNet
(Osmalyzer/Data/Misc Data Fetchers/MicroReserveAnalysisData.cs:72-146).
Implemented from the public transverse-Mercator series (Snyder, USGS
PP 1395) on the GRS80 ellipsoid with the LKS-92 parameters:
lat0=0, lon0=24, k0=0.9996, FE=500000, FN=-6000000.

Pure numpy (Arrow batch in, batch out) — no proj library needed. Round
trip accuracy ~1e-7 deg (~1 cm, series truncation at the far-east extent)
over Latvia (tested).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

_A = 6_378_137.0  # GRS80 semi-major
_F = 1.0 / 298.257222101
_E2 = _F * (2 - _F)
_EP2 = _E2 / (1 - _E2)
_K0 = 0.9996
_LON0 = np.radians(24.0)
_FE = 500_000.0
_FN = -6_000_000.0


def _meridian_arc(phi: np.ndarray) -> np.ndarray:
    e2, e4, e6 = _E2, _E2**2, _E2**3
    return _A * (
        (1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256) * phi
        - (3 * e2 / 8 + 3 * e4 / 32 + 45 * e6 / 1024) * np.sin(2 * phi)
        + (15 * e4 / 256 + 45 * e6 / 1024) * np.sin(4 * phi)
        - (35 * e6 / 3072) * np.sin(6 * phi)
    )


def lks92_forward(lat_deg: np.ndarray, lon_deg: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """WGS84 degrees -> LKS-92 (x=easting, y=northing) meters."""
    phi = np.radians(np.asarray(lat_deg, dtype=np.float64))
    lam = np.radians(np.asarray(lon_deg, dtype=np.float64))
    n = _A / np.sqrt(1 - _E2 * np.sin(phi) ** 2)
    t = np.tan(phi) ** 2
    c = _EP2 * np.cos(phi) ** 2
    a_ = (lam - _LON0) * np.cos(phi)
    m = _meridian_arc(phi)
    x = _FE + _K0 * n * (
        a_
        + (1 - t + c) * a_**3 / 6
        + (5 - 18 * t + t**2 + 72 * c - 58 * _EP2) * a_**5 / 120
    )
    y = _FN + _K0 * (
        m
        + n
        * np.tan(phi)
        * (
            a_**2 / 2
            + (5 - t + 9 * c + 4 * c**2) * a_**4 / 24
            + (61 - 58 * t + t**2 + 600 * c - 330 * _EP2) * a_**6 / 720
        )
    )
    return x, y


def lks92_inverse(x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """LKS-92 meters -> WGS84 (lat, lon) degrees."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    m = (y - _FN) / _K0
    mu = m / (_A * (1 - _E2 / 4 - 3 * _E2**2 / 64 - 5 * _E2**3 / 256))
    e1 = (1 - np.sqrt(1 - _E2)) / (1 + np.sqrt(1 - _E2))
    phi1 = (
        mu
        + (3 * e1 / 2 - 27 * e1**3 / 32) * np.sin(2 * mu)
        + (21 * e1**2 / 16 - 55 * e1**4 / 32) * np.sin(4 * mu)
        + (151 * e1**3 / 96) * np.sin(6 * mu)
        + (1097 * e1**4 / 512) * np.sin(8 * mu)
    )
    n1 = _A / np.sqrt(1 - _E2 * np.sin(phi1) ** 2)
    r1 = _A * (1 - _E2) / (1 - _E2 * np.sin(phi1) ** 2) ** 1.5
    t1 = np.tan(phi1) ** 2
    c1 = _EP2 * np.cos(phi1) ** 2
    d = (x - _FE) / (n1 * _K0)
    phi = phi1 - (n1 * np.tan(phi1) / r1) * (
        d**2 / 2
        - (5 + 3 * t1 + 10 * c1 - 4 * c1**2 - 9 * _EP2) * d**4 / 24
        + (61 + 90 * t1 + 298 * c1 + 45 * t1**2 - 252 * _EP2 - 3 * c1**2) * d**6 / 720
    )
    lam = _LON0 + (
        d
        - (1 + 2 * t1 + c1) * d**3 / 6
        + (5 - 2 * c1 + 28 * t1 - 3 * c1**2 + 8 * _EP2 + 24 * t1**2) * d**5 / 120
    ) / np.cos(phi1)
    return np.degrees(phi), np.degrees(lam)


def lks92_to_wgs84_udf():
    """pandas UDF (x, y) -> struct<lat double, lon double>."""

    @F.pandas_udf(
        T.StructType(
            [T.StructField("lat", T.DoubleType()), T.StructField("lon", T.DoubleType())]
        )
    )
    def _inv(x: pd.Series, y: pd.Series) -> pd.DataFrame:
        lat, lon = lks92_inverse(x.to_numpy(), y.to_numpy())
        return pd.DataFrame({"lat": lat, "lon": lon})

    return _inv


def wgs84_to_lks92_udf():
    """pandas UDF (lat, lon) -> struct<x double, y double>."""

    @F.pandas_udf(
        T.StructType([T.StructField("x", T.DoubleType()), T.StructField("y", T.DoubleType())])
    )
    def _fwd(lat: pd.Series, lon: pd.Series) -> pd.DataFrame:
        x, y = lks92_forward(lat.to_numpy(), lon.to_numpy())
        return pd.DataFrame({"x": x, "y": y})

    return _fwd
