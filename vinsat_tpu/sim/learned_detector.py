"""Learned landmark detector: a small flax CNN trained on landmark patch
appearance, applied convolutionally over raster windows.

This is the trained counterpart of sim/imagery.TemplateDetector and the
in-framework stand-in for the reference's externally-trained YOLO models
(sim/nadir_sim.py:94-103; the reference repo itself contains no training
code — models come from the ultralytics CLI).  Here the full loop lives in
the framework: generate training patches -> train on device (optax/flax)
-> detect through the sim/detector.ImageDetector protocol.

Architecture: 2 conv blocks + flatten + dense K-way classifier over SxS
single-channel patches, with an extra "background" class so non-landmark
patches are rejected.  Inference slides the classifier over the window at a
fixed stride (patch extraction + one batched forward pass — MXU work).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

try:
    import flax.linen as nn
    import optax

    _HAS_FLAX = True
except ImportError:  # pragma: no cover
    _HAS_FLAX = False


class PatchCNN(nn.Module if _HAS_FLAX else object):
    """SxS patch -> (K+1) logits (class K = background)."""

    num_classes: int
    features: int = 32

    @nn.compact
    def __call__(self, x):  # x (B, S, S, 1)
        x = nn.Conv(self.features, (3, 3))(x)
        x = nn.relu(x)
        x = nn.Conv(self.features, (3, 3))(x)
        x = nn.relu(x)
        x = x.reshape((x.shape[0], -1))  # keep spatial detail (textures)
        x = nn.Dense(2 * self.features)(x)
        x = nn.relu(x)
        return nn.Dense(self.num_classes + 1)(x)


def make_training_batch(key, templates, batch: int, noise_sigma: float = 0.15,  # noqa: E501
                        amplitude_range=(0.8, 2.0), bg_fraction: float = 0.2,
                        hard_neg_fraction: float = 0.25):
    """Augmented patches + labels.

    Positives: scaled noisy templates with +-2 px jitter.  Negatives
    (labelled K): pure noise AND hard negatives — templates shifted 4-7 px
    off-centre, teaching the classifier "centred or nothing" so the sliding
    grid does not fire on partial overlaps far from the true position.
    """
    K, S, _ = templates.shape
    k1, k2, k3, k4, k5, k6, k7 = jax.random.split(key, 7)
    labels = jax.random.randint(k1, (batch,), 0, K)
    u = jax.random.uniform(k2, (batch,))
    is_bg = u < bg_fraction
    is_hard = (u >= bg_fraction) & (u < bg_fraction + hard_neg_fraction)
    amp = amplitude_range[0] + (amplitude_range[1] - amplitude_range[0]) * (
        jax.random.uniform(k3, (batch, 1, 1))
    )
    base = templates[labels] * amp
    small = jax.random.randint(k4, (batch, 2), -2, 3)
    big_mag = jax.random.randint(k6, (batch, 2), 4, 9)
    big_sign = jnp.where(jax.random.uniform(k7, (batch, 2)) < 0.5, -1, 1)
    shift = jnp.where(is_hard[:, None], big_mag * big_sign, small)
    # TRUE partial-overlap shifts (what a sliding window actually sees):
    # embed the template in a 2S canvas, then crop an offset S-window —
    # texture leaves the crop instead of wrapping around
    canvas = jnp.zeros((batch, 2 * S, 2 * S), base.dtype)
    canvas = jax.vmap(
        lambda cv, b: jax.lax.dynamic_update_slice(cv, b, (S // 2, S // 2))
    )(canvas, base)
    start = jnp.clip(S // 2 + shift, 0, S)
    base = jax.vmap(
        lambda cv, st: jax.lax.dynamic_slice(cv, (st[0], st[1]), (S, S))
    )(canvas, start)
    noise = noise_sigma * jax.random.normal(k5, (batch, S, S))
    patches = jnp.where(is_bg[:, None, None], noise, base + noise)
    labels = jnp.where(is_bg | is_hard, K, labels)
    return _normalize_patches(patches)[..., None], labels


def _normalize_patches(patches):
    """Zero-mean unit-norm per patch: makes the classifier invariant to the
    raster's brightness/contrast, and keeps train and inference statistics
    identical."""
    m = patches.mean(axis=(-2, -1), keepdims=True)
    p = patches - m
    n = jnp.sqrt(jnp.sum(p * p, axis=(-2, -1), keepdims=True))
    return p / jnp.maximum(n, 1e-6)


class TrainedDetector(NamedTuple):
    """ImageDetector-protocol wrapper around trained PatchCNN params.

    `templates` (optional, (K, S, S)): class appearance templates enabling
    the matched-filter sub-pixel localization stage — the PatchCNN decides
    presence/class on its stride-`stride` patch grid, then each accepted
    candidate is re-localized by a local NCC + quadratic-peak fit
    (imagery.refine_peaks_ncc).  Without templates, positions stay on the
    patch grid (~stride px quantization — measured as the dominant OD
    error of the grid-only detector, docs/BENCHMARKS.md).
    """

    params: dict
    num_classes: int
    patch_size: int
    stride: int = 2
    templates: jnp.ndarray = None

    def predict(self, image: np.ndarray, conf_threshold: float,
                classes: np.ndarray) -> np.ndarray:
        img = jnp.asarray(image, jnp.float32)
        if img.ndim == 3:
            img = img.mean(axis=-1)
        if self.templates is not None:
            # matched-filter VERIFICATION + CALIBRATION: the classifier
            # proposes its top-k owning patches per class, a local
            # template correlation refines each to sub-pixel and the
            # best-correlating candidate wins with the TemplateDetector's
            # calibrated 0.5+0.5*ncc confidence.  True matches
            # (ncc 0.6-0.9) clear the OD conf>0.8 gate even when the
            # softmax is lukewarm; the classifier's confident false
            # positives on landmark-free crops (ncc 0.3-0.5) fall under
            # it instead of poisoning the solve (measured: the
            # un-verified chain kept 7/38 rows incl. 27/62 px outliers
            # and finished 53 km off), and a wrong-texture top patch is
            # out-correlated by a lower-ranked candidate at the true
            # landmark (docs/BENCHMARKS.md round 5).
            vals, rk, ck = _detect_grid_topk(
                self.params, img, self.num_classes, self.patch_size,
                self.stride, _PROPOSAL_TOPK)
            probs, rows_, cols_ = _select_refined(
                img, jnp.asarray(self.templates, jnp.float32), vals, rk, ck)
        else:
            probs, rows_, cols_ = _detect_grid(
                self.params, img, self.num_classes, self.patch_size,
                self.stride)
        out = []
        cls_set = set(int(c) for c in np.asarray(classes))
        for k in range(self.num_classes):
            p = float(probs[k])
            if k in cls_set and p > conf_threshold:
                out.append([k, float(cols_[k]), float(rows_[k]), p])
        return np.array(out) if out else np.zeros((0, 4))


def save_detector(path: str, det: TrainedDetector) -> None:
    """Serialize trained PatchCNN params to one npz (tiny — a few 100 KB).

    Enables committing a fully-trained full-difficulty detector as a test
    fixture so the headline localization claim is verified inference-side
    in the DEFAULT suite (full training is minutes of device time,
    VERDICT r2 #8), while the training path stays covered by the fast
    easier-SNR test + the env-gated full run."""
    flat = {}
    for kp, v in jax.tree_util.tree_leaves_with_path(det.params):
        name = "/".join(str(getattr(k, "key", k)) for k in kp)
        flat[name] = np.asarray(v)
    if det.templates is not None:
        flat["__templates__"] = np.asarray(det.templates)
    np.savez(path, __meta__=np.array(
        [det.num_classes, det.patch_size, det.stride]), **flat)


def load_detector(path: str) -> TrainedDetector:
    """Load a save_detector npz.  Parameter-tree keys must match the
    CURRENT PatchCNN architecture — predict fails loudly on drift."""
    z = np.load(path)
    meta = z["__meta__"].astype(int)
    params: dict = {}
    templates = None
    for name in z.files:
        if name == "__meta__":
            continue
        if name == "__templates__":
            templates = jnp.asarray(z[name])
            continue
        d = params
        parts = name.split("/")
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = jnp.asarray(z[name])
    return TrainedDetector(params=params, num_classes=int(meta[0]),
                           patch_size=int(meta[1]), stride=int(meta[2]),
                           templates=templates)


def _extract_patches(img, S: int, stride: int):
    H, W = img.shape
    nr = (H - S) // stride + 1
    nc = (W - S) // stride + 1
    r0 = jnp.arange(nr) * stride
    c0 = jnp.arange(nc) * stride

    def get(r, c):
        return jax.lax.dynamic_slice(img, (r, c), (S, S))

    patches = jax.vmap(lambda r: jax.vmap(lambda c: get(r, c))(c0))(r0)
    return patches.reshape(nr * nc, S, S), nr, nc


import functools


@functools.partial(jax.jit, static_argnames=("num_classes", "S", "stride"))
def _detect_grid(params, img, num_classes: int, S: int, stride: int):
    """Best softmax probability + location per class over the patch grid."""
    patches, nr, nc = _extract_patches(img, S, stride)
    return _classify_patches(params, patches, nr, nc, num_classes, S, stride)


def _gated_map(params, patches, num_classes):
    """(P, K) ownership-gated class probabilities.

    Decision rule: a patch detects class k only if k is the patch's OWN
    softmax argmax (background competes) — taking a bare
    max-prob-per-class over ~10k patches would fire on chance noise
    peaks.  Shared by the best-1 grid, the top-k proposal stage, and the
    chunked batch path."""
    patches = _normalize_patches(patches)
    model = PatchCNN(num_classes=num_classes)
    logits = model.apply({"params": params}, patches[..., None])
    full = jax.nn.softmax(logits, axis=-1)  # (P, K+1) incl. background
    cls_hat = jnp.argmax(full, axis=-1)  # (P,)
    return jnp.where(cls_hat[:, None] == jnp.arange(num_classes)[None],
                     full[:, :num_classes], 0.0)


def _classify_patches(params, patches, nr, nc, num_classes, S, stride):
    gated = _gated_map(params, patches, num_classes)
    idx = jnp.argmax(gated, axis=0)  # (K,) best owning patch per class
    best = jnp.take_along_axis(gated, idx[None], axis=0)[0]
    rows_ = (idx // nc) * stride + S // 2
    cols_ = (idx % nc) * stride + S // 2
    return best, rows_.astype(jnp.float32), cols_.astype(jnp.float32)


# proposals per class fed to the matched-filter selection stage: the
# classifier's top patch alone measurably misses landmarks whose best
# owning patch sits on neighboring texture; 3 candidates recover them at
# negligible cost (3 local correlations per class per crop)
_PROPOSAL_TOPK = 3


def _topk_from_gated(gated, nc: int, S: int, stride: int, k: int):
    """Top-k owning patches per class from a (P, K) gated-probability map.

    Returns (vals, rows, cols), each (K, k): the k highest-probability
    patches whose own argmax is the class (vals may be 0 where a class
    owns fewer than k patches — those slots are non-candidates)."""
    vals, idx = jax.lax.top_k(gated.T, k)  # (K, k)
    rows_ = (idx // nc) * stride + S // 2
    cols_ = (idx % nc) * stride + S // 2
    return vals, rows_.astype(jnp.float32), cols_.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("num_classes", "S", "stride",
                                             "k"))
def _detect_grid_topk(params, img, num_classes: int, S: int, stride: int,
                      k: int):
    """Top-k candidate locations per class (single image) — the proposal
    stage for matched-filter selection (detect with templates)."""
    patches, nr, nc = _extract_patches(img, S, stride)
    gated = _gated_map(params, patches, num_classes)
    return _topk_from_gated(gated, nc, S, stride, min(k, nr * nc))


@functools.partial(jax.jit,
                   static_argnames=("num_classes", "S", "stride", "k",
                                    "batch"))
def _detect_grid_batch_topk(params, imgs, num_classes: int, S: int,
                            stride: int, k: int, batch: int = 8192):
    """Batched top-k proposals: (F, K, k) vals/rows/cols."""
    imgs = imgs.astype(jnp.float32)

    def per_frame(im):
        patches, nr, nc = _extract_patches(im, S, stride)
        gated = _classify_gated_chunked(params, patches, num_classes, batch)
        return _topk_from_gated(gated, nc, S, stride,
                                min(k, patches.shape[0]))

    return jax.lax.map(per_frame, imgs)


def _select_refined(im, tmpl, vals, rows_k, cols_k):
    """Refine every proposal and keep the best-correlating one per class.

    vals/rows_k/cols_k (K, k) from a top-k proposal stage; returns
    (score, rows, cols) with score the calibrated matched-filter
    confidence of the WINNING candidate (0 when no candidate is owned or
    every one is border-vetoed).  Multi-candidate proposals close the
    recall gap of best-patch-only proposals: when the classifier's top
    patch for a class sits on the wrong texture, a lower-ranked owning
    patch at the true landmark still reaches the matched filter, which
    is the better judge (measured: 1800 s imagery OD 1.26 -> sub-km)."""
    from vinsat_tpu.sim import imagery

    rf, cf, pk = jax.vmap(
        lambda rr, cc: imagery.refine_peaks_ncc(im, tmpl, rr, cc),
        in_axes=(1, 1), out_axes=1,
    )(rows_k, cols_k)  # (K, k)
    pk = jnp.where(vals > 0, pk, -1.0)  # non-owned slots never win
    j = jnp.argmax(pk, axis=1)
    best = jnp.take_along_axis(pk, j[:, None], axis=1)[:, 0]
    rows_ = jnp.take_along_axis(rf, j[:, None], axis=1)[:, 0]
    cols_ = jnp.take_along_axis(cf, j[:, None], axis=1)[:, 0]
    score = jnp.maximum(0.5 + 0.5 * best, 0.0)
    return score, rows_, cols_


def _classify_gated_chunked(params, patches, num_classes: int,
                            batch: int = 8192):
    """(P, K) background-gated class probabilities, classified in bounded
    chunks: OD-scale crops yield ~50k patches/frame, and one flat forward
    pass would materialize P*S^2*features conv activations (hundreds of GB
    over a frame batch — measured OOM).  lax.map bounds the live
    activations to one `batch` at a time inside a single device program."""
    P = patches.shape[0]
    nb = -(-P // batch)
    pad = jnp.zeros((nb * batch,) + patches.shape[1:], patches.dtype)
    pad = jax.lax.dynamic_update_slice(pad, patches,
                                       (0,) * patches.ndim)

    def body(chunk):
        return _gated_map(params, chunk, num_classes)

    gated = jax.lax.map(body, pad.reshape((nb, batch) + patches.shape[1:]))
    return gated.reshape(nb * batch, num_classes)[:P]


@functools.partial(jax.jit,
                   static_argnames=("num_classes", "S", "stride", "batch"))
def _detect_grid_batch(params, imgs, num_classes: int, S: int, stride: int,
                       batch: int = 8192):
    imgs = imgs.astype(jnp.float32)

    def per_frame(im):
        patches, nr, nc = _extract_patches(im, S, stride)
        gated = _classify_gated_chunked(params, patches, num_classes, batch)
        idx = jnp.argmax(gated, axis=0)  # (K,) best owning patch per class
        best = jnp.take_along_axis(gated, idx[None], axis=0)[0]
        rows_ = (idx // nc) * stride + S // 2
        cols_ = (idx % nc) * stride + S // 2
        return best, rows_.astype(jnp.float32), cols_.astype(jnp.float32)

    # frames sequential (lax.map), patches chunked: peak live memory is one
    # patch chunk's activations regardless of F or crop size
    return jax.lax.map(per_frame, imgs)


def detect_peaks_batch(det: "TrainedDetector", imgs):
    """Batched grid detection over (F, H, W) crops in ONE device call —
    the learned-detector counterpart of imagery.correlate_peaks_batch
    (same contract: (F, K) scores/rows/cols), so the imagery OD pipeline
    can swap the NCC stage for the trained PatchCNN (the reference's
    YOLO -> detections -> OD chain, sim/nadir_sim.py:94-103,220).

    Without templates, scores are softmax probabilities in [0, 1] and
    positions sit on the stride grid.  With det.templates set, top-k
    proposals per class are matched-filter refined to sub-pixel and the
    winner carries the CALIBRATED 0.5+0.5*ncc confidence (vetoed /
    unproposed classes exactly 0) — see TrainedDetector.predict."""
    imgs = jnp.asarray(imgs, jnp.float32)
    if det.templates is None:
        return _detect_grid_batch(det.params, imgs, det.num_classes,
                                  det.patch_size, det.stride)
    # matched-filter verification + calibration over top-k proposals (see
    # TrainedDetector.predict): the best-correlating candidate per class
    # wins with the calibrated NCC confidence
    tmpl = jnp.asarray(det.templates, jnp.float32)
    vals, rk, ck = _detect_grid_batch_topk(
        det.params, imgs, det.num_classes, det.patch_size, det.stride,
        _PROPOSAL_TOPK)
    return jax.vmap(
        lambda im, v, rr, cc: _select_refined(im, tmpl, v, rr, cc)
    )(imgs, vals, rk, ck)


def train_detector(key, templates, steps: int = 3000, batch: int = 256,
                   lr: float = 2e-3, stride: int = 2,
                   noise_sigma: float = 0.15,
                   cosine_decay: bool = False) -> TrainedDetector:
    """Train the patch classifier on augmented template patches (on-device
    optax/adam loop, one jitted step).

    At the default raster SNR (unit-norm templates, amplitude ~1.5, pixel
    noise 0.15) the task is matched-filter hard; ~3000 steps reach <3 px
    localization for every class (validated in tests at an easier SNR for
    runtime).
    """
    assert _HAS_FLAX, "flax/optax unavailable"
    K, S, _ = templates.shape
    model = PatchCNN(num_classes=K)
    k_init, k_data = jax.random.split(key)
    params = model.init(k_init, jnp.zeros((1, S, S, 1)))["params"]
    if cosine_decay:
        # anneal to lr/100: at SNR~1 the final localization precision is
        # limited by optimizer noise at a fixed step size
        tx = optax.adam(optax.cosine_decay_schedule(lr, steps, alpha=0.01))
    else:
        tx = optax.adam(lr)
    opt_state = tx.init(params)

    def step(carry, key):
        params, opt_state = carry
        x, y = make_training_batch(key, templates, batch,
                                   noise_sigma=noise_sigma)

        def loss_fn(p):
            logits = model.apply({"params": p}, x)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y
            ).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    @jax.jit
    def train_loop(params, opt_state, key):
        # entire training as ONE device program (a per-step host loop costs
        # a dispatch round-trip per step — ~0.5 s each over a remote-TPU
        # tunnel vs microseconds on-device)
        keys = jax.random.split(key, steps)
        (params, opt_state), losses = jax.lax.scan(
            step, (params, opt_state), keys
        )
        return params, losses[-1]

    params, loss = train_loop(params, opt_state, k_data)
    return TrainedDetector(params=params, num_classes=K, patch_size=S,
                           stride=stride), float(loss)
