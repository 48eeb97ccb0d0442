"""Training-label generation, geometry-only.

Functional surface of labeling/label_ld.py:56-113: project landmark bbox
corners into an image grid and emit normalized YOLO label rows
[cls, xc_norm, yc_norm, w_norm, h_norm].  The reference's raster-specific
parts (rasterio CRS transform, PNG export) are replaced by an explicit
lon/lat window -> pixel grid mapping (equirectangular window), which is what
the projection reduces to for the label geometry.
"""
from __future__ import annotations

import numpy as np


def label_grid(landmarks: np.ndarray, lon_min: float, lat_min: float,
               lon_max: float, lat_max: float, width: int, height: int
               ) -> np.ndarray:
    """landmarks rows: [centroid_lon, centroid_lat, left_lon, bot_lat,
    right_lon, top_lat, ...] (the CSV column content of
    sim/landmark_csvs/*_top_salient.csv).

    Returns (K, 5) label rows for landmarks fully inside the window,
    replicating the symmetric width/height doubling of label_raster
    (labeling/label_ld.py:69-74) and the in-bounds gate (:75-79).
    """
    lm = np.asarray(landmarks, dtype=np.float64)
    c_lon, c_lat = lm[:, 0], lm[:, 1]
    l_lon, b_lat = lm[:, 2], lm[:, 3]
    r_lon, t_lat = lm[:, 4], lm[:, 5]

    def to_px(lon, lat):
        u = (lon - lon_min) / (lon_max - lon_min) * width
        v = (lat_max - lat) / (lat_max - lat_min) * height
        return u, v

    cu, cv = to_px(c_lon, c_lat)
    tlu, tlv = to_px(l_lon, t_lat)
    bru, brv = to_px(r_lon, b_lat)

    right_w = bru - cu
    left_w = cu - tlu
    top_h = cv - tlv
    bot_h = brv - cv
    ws = np.maximum(left_w, right_w) * 2
    hs = np.maximum(top_h, bot_h) * 2

    inb = (
        (tlu > 0) & (tlu < width) & (tlv > 0) & (tlv < height)
        & (bru > 0) & (bru < width) & (brv > 0) & (brv < height)
    )
    idx = np.where(inb)[0]
    rows = np.stack(
        [idx.astype(np.float64), cu[idx] / width, cv[idx] / height,
         ws[idx] / width, hs[idx] / height], axis=1
    )
    return rows
