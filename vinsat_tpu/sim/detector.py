"""Pluggable detector interface for the detection-generation stage.

The reference runs per-region YOLO models over raster windows
(sim/nadir_sim.py:94-119).  Retraining YOLO is out of scope (SURVEY.md §2
C12), so the framework defines a detector *interface* with two built-ins:

  * NoiseModelDetector — the calibrated statistical stand-in used by the
    simulation pipeline (matches the <10 px detector acceptance statistics,
    eval/eval_landmarks.py:21,281);
  * ImageDetector protocol — for plugging a learned model (e.g. a flax CNN
    or an exported YOLO) over raster windows served by tools/raster.py.

Both produce the same row contract: [cls, xc, yc, conf] per window, which
the pipeline converts to the global [frame, lon, lat, xc, yc, conf] rows.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Protocol

import jax
import numpy as np


class NoiseModelDetector(NamedTuple):
    """Gaussian pixel noise + uniform confidence, per-class bias optional.

    noise_px calibrated so mean |err| stays under the 10 px acceptance bound
    (mean |N(0, s)| = s*sqrt(2/pi); s=4 -> ~3.2 px).
    """

    noise_px: float = 4.0
    conf_low: float = 0.5
    conf_high: float = 1.0

    def __call__(self, uv_true, key):
        k1, k2 = jax.random.split(key)
        uv = uv_true + self.noise_px * jax.random.normal(k1, uv_true.shape)
        conf = self.conf_low + (self.conf_high - self.conf_low) * (
            jax.random.uniform(k2, uv_true.shape[:-1])
        )
        return uv, conf


class ImageDetector(Protocol):
    """Protocol for learned detectors over raster windows.

    predict(image, conf_threshold, classes) -> (M, 4) rows of
    [cls, xc, yc, conf] in window pixel coordinates — the exact contract of
    the reference's YOLO stage output (nadir_sim.py:103-116).
    """

    def predict(self, image: np.ndarray, conf_threshold: float,
                classes: np.ndarray) -> np.ndarray:
        ...


def run_image_detector(detector: ImageDetector, image: np.ndarray,
                       window_transform, cam_lonlat_to_pixel: Callable,
                       cls_to_lonlat: Callable, conf_threshold: float,
                       classes: np.ndarray) -> np.ndarray:
    """Image-space detections -> global detection rows.

    Mirrors get_detections (nadir_sim.py:94-119): window pixel centre ->
    lon/lat via the window transform, then both the detected point and the
    class centroid are re-projected into full-image coordinates; rows are
    [lon, lat, xc, yc, conf] with the class centroid as the landmark
    identity.
    """
    dets = detector.predict(image, conf_threshold, classes)
    rows = []
    for cls, xc, yc, conf in np.asarray(dets):
        lon, lat = window_transform.pixel_to_world(xc, yc)
        cls_lon, cls_lat = cls_to_lonlat(int(cls))
        u, v = cam_lonlat_to_pixel(lon, lat)
        rows.append([cls_lon, cls_lat, float(u), float(v), float(conf)])
    return np.array(rows) if rows else np.zeros((0, 5))
