"""Landmark database as dense arrays + visibility tests.

The reference keeps 34 per-region CSVs of salient landmarks (~495 each,
sim/landmark_csvs/*_top_salient.csv; readers at sim/SatCam.py:156-164 and
sim/nadir_sim.py:121-129) and gates imaging on >=3 "best-class" landmarks in
the footprint (sim/SatCam.py:232-262).

Here the DB is a struct-of-arrays usable on device:
  lon, lat          (L,) degrees       centroids
  bbox              (L, 4) degrees     (left_lon, bot_lat, right_lon, top_lat)
  region            (L,) int32         index into mgrs.ZONE_LABELS
  cls               (L,) int32         per-region class id (CSV row index)
  best              (L,) bool          class passed detector QA (best_classes)
  saliency          (L,) float         saliency score used for downselect

Two sources: `load_csv_dir` reads a VINSat-format CSV directory (for running
against reference data when present); `synthesize` generates a statistically
similar DB so the pipeline is fully self-contained.
"""
from __future__ import annotations

import csv
import os
from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from vinsat_tpu.sim import mgrs


class LandmarkDB(NamedTuple):
    lon: jnp.ndarray
    lat: jnp.ndarray
    bbox: jnp.ndarray
    region: jnp.ndarray
    cls: jnp.ndarray
    best: jnp.ndarray
    saliency: jnp.ndarray

    @property
    def num_landmarks(self) -> int:
        return self.lon.shape[0]


def synthesize(key, regions: Optional[Sequence[str]] = None,
               per_region: int = 495, best_fraction: float = 0.2) -> LandmarkDB:
    """Generate a synthetic landmark DB over the given MGRS regions.

    Landmarks are uniform within each region's bounds with margin; a
    `best_fraction` subset is marked detector-accepted, mirroring the
    best_classes downselect (eval/eval_landmarks.py:259-286, the reference's
    best_classes/*.npy are ~20%-ish of ~495 classes).

    Host-side numpy on purpose: this is data preparation, not device compute
    (remote-TPU dispatch latency makes per-region device RNG calls costly).
    """
    if regions is None:
        regions = mgrs.ACTIVE_REGIONS
    seed = int(np.asarray(jax.random.key_data(key)).ravel()[-1]) & 0x7FFFFFFF
    rng = np.random.default_rng(seed)
    lons, lats, regs, clss, bests, sals, bboxes = [], [], [], [], [], [], []
    for r in regions:
        b = np.asarray(mgrs.ZONE_BOUNDS[mgrs.ZONE_INDEX[r]])
        lon = b[0] + (b[2] - b[0]) * rng.random(per_region)
        lat = b[1] + (b[3] - b[1]) * rng.random(per_region)
        sal = rng.random(per_region)
        nbest = max(1, int(per_region * best_fraction))
        best = np.zeros(per_region, dtype=bool)
        best[rng.permutation(per_region)[:nbest]] = True
        # bbox half-sizes ~ 0.005-0.05 deg (hundreds of m to km scale objects)
        half = 0.005 + 0.045 * rng.random((per_region, 2))
        bbox = np.stack(
            [lon - half[:, 0], lat - half[:, 1],
             lon + half[:, 0], lat + half[:, 1]], axis=1
        )
        lons.append(lon)
        lats.append(lat)
        regs.append(np.full(per_region, mgrs.ZONE_INDEX[r], dtype=np.int32))
        clss.append(np.arange(per_region, dtype=np.int32))
        bests.append(best)
        sals.append(sal)
        bboxes.append(bbox)
    return LandmarkDB(
        lon=jnp.array(np.concatenate(lons)),
        lat=jnp.array(np.concatenate(lats)),
        bbox=jnp.array(np.concatenate(bboxes)),
        region=jnp.array(np.concatenate(regs)),
        cls=jnp.array(np.concatenate(clss)),
        best=jnp.array(np.concatenate(bests)),
        saliency=jnp.array(np.concatenate(sals)),
    )


def load_csv_dir(path: str, regions: Optional[Sequence[str]] = None,
                 best_classes_dir: Optional[str] = None) -> LandmarkDB:
    """Load a VINSat-format landmark CSV directory.

    Expects files named <REGION>_top_salient.csv with Centroid/Top-Left/
    Bottom-Right Longitude/Latitude columns (format of
    sim/landmark_csvs/10S_top_salient.csv; reader parity with
    sim/SatCam.py:156-164).  Optional best_classes_dir with
    <REGION>_best_classes.npy arrays (SatCam.py:234).
    """
    if regions is None:
        regions = [
            f.split("_")[0] for f in sorted(os.listdir(path))
            if f.endswith("_top_salient.csv")
        ]
    lons, lats, regs, clss, bests, sals, bboxes = [], [], [], [], [], [], []
    for r in regions:
        fp = os.path.join(path, f"{r}_top_salient.csv")
        with open(fp) as f:
            rows = list(csv.DictReader(f))
        n = len(rows)
        lon = np.array([float(x["Centroid Longitude"]) for x in rows])
        lat = np.array([float(x["Centroid Latitude"]) for x in rows])

        def col(rows, *names):
            for nm in names:
                if rows and nm in rows[0]:
                    return np.array([float(x[nm]) for x in rows])
            return None

        ll = col(rows, "Top-Left Longitude", "Top Left Longitude")
        tt = col(rows, "Top-Left Latitude", "Top Left Latitude")
        rr = col(rows, "Bottom-Right Longitude", "Bottom Right Longitude")
        bb = col(rows, "Bottom-Right Latitude", "Bottom Right Latitude")
        if ll is None:
            ll, rr = lon - 0.01, lon + 0.01
            tt, bb = lat + 0.01, lat - 0.01
        sal = col(rows, "Saliency", "saliency")
        if sal is None:
            sal = np.zeros(n)
        best = np.zeros(n, dtype=bool)
        if best_classes_dir is not None:
            bc = os.path.join(best_classes_dir, f"{r}_best_classes.npy")
            if os.path.exists(bc):
                idx = np.load(bc).astype(int)
                best[idx[idx < n]] = True
        else:
            best[:] = True
        lons.append(lon)
        lats.append(lat)
        regs.append(np.full(n, mgrs.ZONE_INDEX[r], dtype=np.int32))
        clss.append(np.arange(n, dtype=np.int32))
        bests.append(best)
        sals.append(sal)
        bboxes.append(np.stack([ll, bb, rr, tt], axis=1))
    return LandmarkDB(
        lon=jnp.array(np.concatenate(lons)),
        lat=jnp.array(np.concatenate(lats)),
        bbox=jnp.array(np.concatenate(bboxes)),
        region=jnp.array(np.concatenate(regs)),
        cls=jnp.array(np.concatenate(clss)),
        best=jnp.array(np.concatenate(bests)),
        saliency=jnp.array(np.concatenate(sals)),
    )


def select_best_classes(db: LandmarkDB, seed: int = 0,
                        samples_per_class: int = 12,
                        px_threshold: float = 10.0,
                        scale_median_px: float = 10.0,
                        scale_sigma: float = 0.6):
    """Detector-QA class downselect over a landmark DB — the best_classes
    stage of the reference pipeline (per-region error records -> confidence
    search maximizing #classes under the 10 px bound,
    eval/eval_landmarks.py:259-286; outputs consumed at sim/SatCam.py:234
    and sim/nadir_sim.py:97-103).

    The framework carries no externally-trained YOLO weights, so per-class
    detector quality comes from the calibrated model: class k localizes
    with pixel scale s_k ~ LogNormal(ln scale_median_px, scale_sigma) and
    confidence ~ U(0.5, 1).  The resulting [cls, err_px, conf] records run
    through the REAL reference selection rule
    (px_err.best_conf_maximize_classes), per region — so the accepted-class
    mask has the same statistical shape as the reference's best_classes
    (a minority of ~495 classes per region; measured ~40% here).

    Returns (db with the best mask replaced, {region: best_conf}).
    """
    from vinsat_tpu.evalx import px_err

    rng = np.random.default_rng(seed)
    region = np.asarray(db.region)
    cls = np.asarray(db.cls)
    best = np.zeros(db.num_landmarks, dtype=bool)
    best_confs = {}
    for r in np.unique(region):
        at = region == r
        classes = cls[at]
        n = len(classes)
        # per-class localization scale (detector quality varies by class)
        s_k = np.exp(np.log(scale_median_px)
                     + scale_sigma * rng.standard_normal(n))
        err = np.hypot(
            rng.standard_normal((n, samples_per_class)) * s_k[:, None],
            rng.standard_normal((n, samples_per_class)) * s_k[:, None],
        )
        conf = 0.5 + 0.5 * rng.random((n, samples_per_class))
        keep, bc = px_err.best_classes_grid(err, conf,
                                            px_threshold=px_threshold)
        best_confs[int(r)] = bc
        best[np.nonzero(at)[0][keep]] = True
    return db._replace(best=jnp.asarray(best)), best_confs


def load_reference_db(csv_dir: str, best_downselect: bool = True,
                      seed: int = 0) -> LandmarkDB:
    """Load the reference's landmark CSV directory and (optionally) apply
    the detector-QA best-class downselect — the DB configuration the
    reference sim runs with (sim/SatCam.py:156-164,234)."""
    db = load_csv_dir(csv_dir)
    if best_downselect:
        db, _ = select_best_classes(db, seed=seed)
    return db


def in_bounds_mask(db: LandmarkDB, bounds):
    """(..., L) mask of landmarks with centroid inside lon/lat box bounds
    (lon_min, lat_min, lon_max, lat_max), broadcast over leading axes.

    Vectorized version of check_for_landmarks_in_region's box test
    (SatCam.py:243-248).  Antimeridian-aware: camera.footprint_bounds emits
    wrapped boxes with lon_max > 180 (matching the wrap handling of
    SatCam.py:218-219), so each landmark is tested at both lon and lon+360;
    for ordinary boxes (lon_max <= 180) the lifted test can never pass, so
    this is exact in both regimes.
    """
    lon_min = bounds[..., 0:1]
    lat_min = bounds[..., 1:2]
    lon_max = bounds[..., 2:3]
    lat_max = bounds[..., 3:4]
    lon_lift = db.lon + 360.0
    in_lon = ((db.lon > lon_min) & (db.lon < lon_max)) | (
        (lon_lift > lon_min) & (lon_lift < lon_max)
    )
    return in_lon & (db.lat > lat_min) & (db.lat < lat_max)


def visible_best_count(db: LandmarkDB, bounds, region_active_mask=None):
    """Number of detector-accepted landmarks in the footprint box.

    The imaging gate is count >= 3 (SatCam.py:249-262).
    """
    m = in_bounds_mask(db, bounds) & db.best
    if region_active_mask is not None:
        m = m & region_active_mask[db.region]
    return m.sum(axis=-1)


def downselect_by_saliency(saliency: np.ndarray, scales: np.ndarray,
                           num_landmarks: int, scale_values=None):
    """Per-scale saliency percentile cut (labeling/ld_downselect.py:24-43).

    Returns a bool keep-mask over the input landmarks.
    """
    saliency = np.asarray(saliency)
    scales = np.asarray(scales)
    if scale_values is None:
        scale_values = np.unique(scales)
    tot = sum((scales == s).sum() for s in scale_values)
    thresh = (1 - num_landmarks / tot) * 100
    keep = np.zeros(len(saliency), dtype=bool)
    for s in scale_values:
        at = scales == s
        if not at.any():
            continue
        cut = np.percentile(saliency[at], thresh)
        keep |= at & (saliency > cut)
    return keep
