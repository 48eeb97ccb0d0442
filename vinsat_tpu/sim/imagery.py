"""Synthetic raster imagery + an image-space landmark detector.

Completes the imagery half of the pipeline (SatCam rasters + YOLO,
sim/SatCam.py:278-361 + sim/nadir_sim.py:94-119) with fully synthetic,
self-contained components:

  * `make_landmark_templates` — a distinct texture patch per landmark class
    (standing in for the visual appearance YOLO learns);
  * `render_region_image` — region raster = noise background + landmark
    patches pasted at their projected pixel positions (the synthetic
    GeoTIFF);
  * `TemplateDetector` — normalized cross-correlation of the image against
    all class templates (conv on the MXU), peak-per-class detection emitting
    the reference's [cls, xc, yc, conf] rows.  A classical, deterministic
    detector that exercises the identical interface a learned model would
    (sim/detector.ImageDetector).

Together with tools/raster.RasterImageServer this runs the reference's
image pipeline end-to-end: render raster -> window crop -> detect ->
associate class -> global detection rows -> OD.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


def make_landmark_templates(key, num_classes: int, size: int = 12):
    """(K, size, size) float32 zero-mean unit-norm texture patches."""
    t = jax.random.normal(key, (num_classes, size, size), jnp.float32)
    t = t - t.mean(axis=(1, 2), keepdims=True)
    t = t / jnp.linalg.norm(t.reshape(num_classes, -1), axis=1)[:, None, None]
    return t


def render_region_image(key, H: int, W: int, templates, px_positions,
                        noise_sigma: float = 0.15, amplitude: float = 1.0):
    """Render a synthetic single-channel region raster.

    px_positions (K, 2) float (col, row) centre of each class's landmark;
    classes with positions outside the image are simply not drawn.
    """
    K, S, _ = templates.shape
    img = noise_sigma * jax.random.normal(key, (H, W), jnp.float32)
    half = S // 2

    def paste(img, k):
        c, r = px_positions[k, 0], px_positions[k, 1]
        r0 = jnp.clip(jnp.round(r).astype(jnp.int32) - half, 0, H - S)
        c0 = jnp.clip(jnp.round(c).astype(jnp.int32) - half, 0, W - S)
        inside = ((r >= half) & (r < H - half) & (c >= half) & (c < W - half))
        patch = jax.lax.dynamic_slice(img, (r0, c0), (S, S))
        new = patch + amplitude * templates[k] * inside
        return jax.lax.dynamic_update_slice(img, new, (r0, c0)), None

    img, _ = jax.lax.scan(paste, img, jnp.arange(K))
    return img


@functools.partial(jax.jit, static_argnames=("H", "W"))
def render_region_u8(key, H: int, W: int, templates, px_positions,
                     noise_sigma: float = 0.15, amplitude: float = 1.0):
    """render_region_image + min-max normalization to uint8 in ONE jitted
    program: region rasters are consumed host-side (the C++ window
    cropper), so the render should cost one dispatch and a uint8 transfer
    — not render/min/max/scale round-trips of an f32 image.  Run it on the
    CPU backend when the accelerator is remote (pipeline stage 0): the
    paste scan is trivial compute and the raster never needs to visit the
    accelerator."""
    img = render_region_image(key, H, W, templates, px_positions,
                              noise_sigma=noise_sigma, amplitude=amplitude)
    lo, hi = img.min(), img.max()
    return jnp.clip((img - lo) / (hi - lo) * 255.0, 0, 255).astype(jnp.uint8)


class TemplateDetector(NamedTuple):
    """Normalized cross-correlation detector over class templates.

    Implements the sim/detector.ImageDetector protocol: predict(image,
    conf_threshold, classes) -> (M, 4) rows [cls, xc, yc, conf].
    """

    templates: jnp.ndarray  # (K, S, S)

    def predict(self, image: np.ndarray, conf_threshold: float,
                classes: np.ndarray) -> np.ndarray:
        img = jnp.asarray(image, jnp.float32)
        if img.ndim == 3:
            img = img.mean(axis=-1)
        scores, rows_, cols_ = _correlate_peaks(img, self.templates)
        out = []
        cls_set = set(int(c) for c in np.asarray(classes))
        for k, (s, r, c) in enumerate(zip(np.asarray(scores),
                                          np.asarray(rows_),
                                          np.asarray(cols_))):
            if k in cls_set and s > conf_threshold:
                # calibrate NCC in [-1, 1] to a detector-style confidence in
                # [0, 1]: true matches (ncc ~0.6-0.9) land above the OD's
                # conf>0.8 gate, noise peaks (ncc ~0.3-0.5) below it
                conf = 0.5 + 0.5 * float(s)
                out.append([k, float(c), float(r), conf])
        return np.array(out) if out else np.zeros((0, 4))


# batched variant: (F, H, W) crops against the shared template bank in ONE
# device call (the per-frame loop costs one dispatch per frame — ~0.5 s
# each over a remote-TPU tunnel)
correlate_peaks_batch = jax.jit(jax.vmap(
    lambda img, templates: _correlate_peaks(img, templates),
    in_axes=(0, None),
))


def _ncc_surface(img2d, templates):
    """Zero-mean NCC surface: (K, H-S+1, W-S+1) of each (zero-mean)
    template correlated over img2d (H, W).  One K-channel conv for the
    numerator; the denominator is the local patch's centered norm
    sqrt(sum x^2 - S^2 mean^2).  Shared by the full-image detector
    (_correlate_peaks) and the local refinement windows
    (refine_peaks_ncc)."""
    K, S, _ = templates.shape
    x = img2d[None, None]  # NCHW
    dn = ("NCHW", "OIHW", "NCHW")
    corr = jax.lax.conv_general_dilated(
        x, templates[:, None], (1, 1), "VALID", dimension_numbers=dn)[0]
    ones = jnp.ones((1, 1, S, S), jnp.float32)
    sq = jax.lax.conv_general_dilated(
        x * x, ones, (1, 1), "VALID", dimension_numbers=dn)[0, 0]
    sm = jax.lax.conv_general_dilated(
        x, ones, (1, 1), "VALID", dimension_numbers=dn)[0, 0]
    var = jnp.maximum(sq - sm * sm / (S * S), 1e-12)
    return corr / jnp.sqrt(var)[None]


def _quad_offsets(surface, r_i, c_i):
    """Sub-pixel peak offsets by separable quadratic (parabola) fit.

    surface (K, Hc, Wc) score maps; r_i/c_i (K,) integer argmax coords.
    Returns (dr, dc) in [-1, 1] sample units: the vertex of the parabola
    through the three samples along each axis, 0 wherever the fit is
    degenerate (peak on the map border, or non-concave samples — e.g. a
    plateau of equal scores).  The standard matched-filter refinement: the
    correlation of a shifted template is locally quadratic in the shift,
    so the vertex recovers the continuous peak the integer argmax floors.
    """
    K, Hc, Wc = surface.shape
    ks = jnp.arange(K)

    def grab(dr, dc):
        return surface[ks, jnp.clip(r_i + dr, 0, Hc - 1),
                       jnp.clip(c_i + dc, 0, Wc - 1)]

    s0 = grab(0, 0)

    def axis_off(sm, sp, at_border):
        denom = sm - 2.0 * s0 + sp
        ok = (~at_border) & (denom < -1e-12)
        off = 0.5 * (sm - sp) / jnp.where(ok, denom, 1.0)
        return jnp.where(ok, jnp.clip(off, -1.0, 1.0), 0.0)

    dr = axis_off(grab(-1, 0), grab(1, 0), (r_i <= 0) | (r_i >= Hc - 1))
    dc = axis_off(grab(0, -1), grab(0, 1), (c_i <= 0) | (c_i >= Wc - 1))
    return dr, dc


@functools.partial(jax.jit, static_argnames=("radius",))
def refine_peaks_ncc(img, templates, rows, cols, radius: int = 4):
    """Matched-filter sub-pixel localization around integer candidates.

    For each class k, correlate the class template over a (2*radius+1)^2
    neighborhood of the candidate (rows[k], cols[k]) and return the
    NCC-argmax position with quadratic sub-pixel interpolation, plus the
    peak NCC value.  This is the localization AND verification stage for
    detectors whose own grid is coarse (the PatchCNN's stride-2 patch
    grid — learned_detector.TrainedDetector.templates): candidate
    proposal/class remain the detector's decision, while the peak NCC
    separates true matches (measured 0.6-0.9) from the classifier's
    confident false positives on landmark-free crops (noise correlations
    0.3-0.5 — the TemplateDetector calibration, predict above).

    img (H, W); templates (K, S, S); rows/cols (K,) float candidate
    centres.  Returns (rows_f, cols_f, ncc_peak) float32.
    """
    K, S, _ = templates.shape
    H, W = img.shape
    img = img.astype(jnp.float32)
    win = S + 2 * radius

    def per_class(k, r, c):
        # window origin clamped inside the image; offsets stay exact
        # because positions are reconstructed from the origin
        r0 = jnp.clip(r.astype(jnp.int32) - S // 2 - radius, 0, H - win)
        c0 = jnp.clip(c.astype(jnp.int32) - S // 2 - radius, 0, W - win)
        patch = jax.lax.dynamic_slice(img, (r0, c0), (win, win))
        ncc = _ncc_surface(patch, templates[k][None])[0]
        idx = jnp.argmax(ncc)
        Wc = win - S + 1
        ri, ci = idx // Wc, idx % Wc
        drf, dcf = _quad_offsets(ncc[None], ri[None], ci[None])
        rf = (r0 + ri + drf[0] + S // 2).astype(jnp.float32)
        cf = (c0 + ci + dcf[0] + S // 2).astype(jnp.float32)
        # border veto: a peak on the search-window edge means the true
        # peak likely sits OUTSIDE the candidate's neighborhood (the
        # proposal was off by more than `radius`).  Keep the ORIGINAL
        # (unrefined) position — the edge peak is a partial-overlap
        # localization the code itself distrusts — and report peak -1 so
        # the calibrated-confidence map 0.5 + 0.5*peak yields exactly 0:
        # the veto drops the detection through any confidence gate, with
        # no floor a low threshold could readmit.
        interior = ((ri > 0) & (ri < Wc - 1) & (ci > 0) & (ci < Wc - 1))
        peak = jnp.where(interior, ncc.reshape(-1)[idx], -1.0)
        rf = jnp.where(interior, rf, r.astype(jnp.float32))
        cf = jnp.where(interior, cf, c.astype(jnp.float32))
        return rf, cf, peak

    return jax.vmap(per_class)(jnp.arange(K), rows, cols)


@functools.partial(jax.jit, static_argnames=())
def _correlate_peaks(img, templates):
    """Per-class best normalized-correlation peak, sub-pixel refined.

    Returns (K,) scores in [-1, 1], (K,) row, (K,) col of each class's best
    match.  The correlation is one conv2d (K output channels) — MXU work;
    the integer argmax gets quadratic (parabola-vertex) interpolation from
    the neighboring correlation samples (_quad_offsets), breaking the
    1 px grid floor (the raster ground scale makes every detection pixel
    hundreds of meters — docs/BENCHMARKS.md "sub-pixel localization").
    """
    K, S, _ = templates.shape
    H, W = img.shape
    # uint8 crops upload 4x less over a remote-device tunnel; NCC is
    # invariant to the affine intensity scale, so cast on device
    ncc = _ncc_surface(img.astype(jnp.float32), templates)
    flat = ncc.reshape(K, -1)
    idx = jnp.argmax(flat, axis=1)
    scores = jnp.take_along_axis(flat, idx[:, None], axis=1)[:, 0]
    Wc = W - S + 1
    r_i = idx // Wc
    c_i = idx % Wc
    dr, dc = _quad_offsets(ncc, r_i, c_i)
    rows_ = r_i.astype(jnp.float32) + dr + S // 2
    cols_ = c_i.astype(jnp.float32) + dc + S // 2
    return scores, rows_, cols_
