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


# ---------------------------------------------------------------------------
# Raster-CRS labeling (label_ld.label_raster parity, labeling/label_ld.py:56-113)
# ---------------------------------------------------------------------------

WEB_MERCATOR_R = 6378137.0  # m, EPSG:3857 sphere radius


def lonlat_to_epsg3857(lon_deg, lat_deg):
    """Forward Web-Mercator projection (the pyproj lonlat->EPSG:3857
    transform of label_ld.py:63, implemented natively).  Latitude is clipped
    to the projection's +-85.051129 deg validity bound."""
    lon = np.radians(np.asarray(lon_deg, dtype=np.float64))
    lat = np.radians(np.clip(np.asarray(lat_deg, dtype=np.float64),
                             -85.051129, 85.051129))
    x = WEB_MERCATOR_R * lon
    y = WEB_MERCATOR_R * np.log(np.tan(np.pi / 4 + lat / 2))
    return x, y


def epsg3857_to_lonlat(x, y):
    """Inverse Web-Mercator (for round-trip validation)."""
    lon = np.degrees(np.asarray(x, dtype=np.float64) / WEB_MERCATOR_R)
    lat = np.degrees(
        2 * np.arctan(np.exp(np.asarray(y, dtype=np.float64)
                             / WEB_MERCATOR_R)) - np.pi / 2
    )
    return lon, lat


def label_raster(landmarks: np.ndarray, transform, width: int, height: int,
                 crs: str = "EPSG:3857") -> np.ndarray:
    """YOLO labels for a REAL raster: project landmark bboxes through the
    raster's CRS + geotransform (label_ld.py:56-113).

    landmarks rows: [centroid_lon, centroid_lat, left_lon, bot_lat,
    right_lon, top_lat, ...] (the *_top_salient.csv column content);
    transform: a tools.raster.Affine mapping pixel -> CRS world coords (the
    GDAL geotransform); crs: "EPSG:3857" (Web-Mercator training GeoTIFFs)
    or "EPSG:4326" (lon/lat degrees raster).

    Returns (K, 5) rows [cls_idx, xc_n, yc_n, w_n, h_n] with the symmetric
    width/height doubling (:69-74) and the all-corners-in-bounds gate
    (:75-79) of the reference.
    """
    lm = np.asarray(landmarks, dtype=np.float64)
    c_lon, c_lat = lm[:, 0], lm[:, 1]
    l_lon, b_lat = lm[:, 2], lm[:, 3]
    r_lon, t_lat = lm[:, 4], lm[:, 5]

    if crs.upper() in ("EPSG:3857", "3857"):
        def proj(lon, lat):
            return lonlat_to_epsg3857(lon, lat)
    elif crs.upper() in ("EPSG:4326", "4326"):
        def proj(lon, lat):
            return np.asarray(lon, np.float64), np.asarray(lat, np.float64)
    else:
        raise ValueError(f"unsupported CRS {crs!r}: EPSG:3857 / EPSG:4326")

    def to_px(lon, lat):
        x, y = proj(lon, lat)
        return transform.world_to_pixel(x, y)

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
    return np.stack(
        [idx.astype(np.float64), cu[idx] / width, cv[idx] / height,
         ws[idx] / width, hs[idx] / height], axis=1
    )


def write_yolo_labels(rows: np.ndarray, path: str):
    """Write label rows as a YOLO txt file (label_ld.py:97-105)."""
    with open(path, "w") as f:
        for r in rows:
            f.write(f"{int(r[0])} {r[1]:.6f} {r[2]:.6f} "
                    f"{r[3]:.6f} {r[4]:.6f}\n")


def read_yolo_labels(path: str) -> np.ndarray:
    """Read a YOLO txt label file back into (K, 5) rows."""
    rows = []
    with open(path) as f:
        for line in f:
            p = line.split()
            if len(p) == 5:
                rows.append([float(v) for v in p])
    return np.array(rows) if rows else np.zeros((0, 5))


# 3x5 bitmap digit glyphs for the class-id annotation (cv2.putText stand-in)
_DIGITS = {
    "0": ["111", "101", "101", "101", "111"],
    "1": ["010", "110", "010", "010", "111"],
    "2": ["111", "001", "111", "100", "111"],
    "3": ["111", "001", "111", "001", "111"],
    "4": ["101", "101", "111", "001", "001"],
    "5": ["111", "100", "111", "001", "111"],
    "6": ["111", "100", "111", "101", "111"],
    "7": ["111", "001", "010", "010", "010"],
    "8": ["111", "101", "111", "101", "111"],
    "9": ["111", "101", "111", "001", "111"],
}


def _draw_digits(im: np.ndarray, text: str, top: int, left: int,
                 color, scale: int = 2):
    H, W = im.shape[:2]
    x = left
    for ch in text:
        g = _DIGITS.get(ch)
        if g is None:
            x += 4 * scale
            continue
        for r in range(5):
            for c in range(3):
                if g[r][c] == "1":
                    y0, x0 = top + r * scale, x + c * scale
                    im[max(0, y0):max(0, min(H, y0 + scale)),
                       max(0, x0):max(0, min(W, x0 + scale))] = color
        x += 4 * scale


def visualize_label(labels: np.ndarray, image: np.ndarray,
                    color=(0, 255, 0), thickness: int = 2) -> np.ndarray:
    """Overlay YOLO label boxes + class ids on an image — the labeling QA
    visualization of the reference (visualize_label,
    labeling/label_ld.py:116-137: green 2-px cv2 rectangles with the class
    id drawn at the top-left corner), implemented in pure numpy.

    labels: (K, 5) [cls, xc_n, yc_n, w_n, h_n] rows (or a label .txt path);
    image: (H, W, 3) uint8 (or a grayscale (H, W), promoted).
    Returns a new annotated (H, W, 3) uint8 image.
    """
    if isinstance(labels, str):
        labels = read_yolo_labels(labels)
    im = np.asarray(image)
    if im.ndim == 2:
        im = np.repeat(im[..., None], 3, axis=-1)
    im = im.astype(np.uint8).copy()
    H, W = im.shape[:2]
    color = np.asarray(color, np.uint8)
    for row in np.asarray(labels):
        cls, xc, yc, w, h = row[:5]
        left = int((xc - w / 2) * W)
        top = int((yc - h / 2) * H)
        right = int((xc + w / 2) * W)
        bottom = int((yc + h / 2) * H)
        l, t_ = max(0, left), max(0, top)
        r_, b = min(W, right + 1), min(H, bottom + 1)
        if r_ <= l or b <= t_:
            continue
        th = thickness
        im[t_:min(b, t_ + th), l:r_] = color          # top edge
        im[max(t_, b - th):b, l:r_] = color           # bottom edge
        im[t_:b, l:min(r_, l + th)] = color           # left edge
        im[t_:b, max(l, r_ - th):r_] = color          # right edge
        _draw_digits(im, str(int(cls)), top - 12, left, color)
    return im


def write_ppm(image: np.ndarray, path: str):
    """Write an (H, W, 3) uint8 image as binary PPM (P6) — dependency-free
    counterpart of the reference's cv2.imwrite for the viz_labels output
    (label_ld.py:113)."""
    im = np.ascontiguousarray(np.asarray(image, np.uint8))
    assert im.ndim == 3 and im.shape[2] == 3
    with open(path, "wb") as f:
        f.write(f"P6\n{im.shape[1]} {im.shape[0]}\n255\n".encode())
        f.write(im.tobytes())
