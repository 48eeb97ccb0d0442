"""On-device detector training (flax/optax) + sliding-window detection."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vinsat_tpu.sim import imagery

ld = pytest.importorskip("vinsat_tpu.sim.learned_detector")


def test_trained_detector_localizes(rng):
    """Easier-SNR configuration so the test trains in ~1-2 min; the
    full-difficulty result (<3 px on all classes at SNR~1 after 3000 steps)
    is recorded in docs/ROADMAP.md."""
    K, H, W, S = 6, 160, 160, 12
    templates = imagery.make_landmark_templates(jax.random.PRNGKey(0), K, S)
    det, loss = ld.train_detector(
        jax.random.PRNGKey(1), templates, steps=500, lr=2e-3,
        noise_sigma=0.08,
    )
    assert loss < 0.8, f"training underfit: loss {loss}"
    pos = np.stack([rng.uniform(20, W - 20, K), rng.uniform(20, H - 20, K)],
                   axis=1)
    img = imagery.render_region_image(
        jax.random.PRNGKey(2), H, W, templates, jnp.asarray(pos),
        noise_sigma=0.08, amplitude=2.0,
    )
    rows = det.predict(np.asarray(img), conf_threshold=0.5,
                       classes=np.arange(K))
    good = 0
    for cls, xc, yc, conf in rows:
        err = np.hypot(xc - pos[int(cls), 0], yc - pos[int(cls), 1])
        if err < 4.0:
            good += 1
    assert good >= K - 1, f"only {good}/{K} classes localized: {rows}"


def test_training_batch_labels(rng):
    K, S = 5, 12
    templates = imagery.make_landmark_templates(jax.random.PRNGKey(0), K, S)
    x, y = ld.make_training_batch(jax.random.PRNGKey(3), templates, 512)
    assert x.shape == (512, S, S, 1)
    y = np.asarray(y)
    assert set(np.unique(y)) <= set(range(K + 1))
    # background + hard negatives present
    assert (y == K).mean() > 0.3
    # patches are normalized
    norms = np.linalg.norm(np.asarray(x).reshape(512, -1), axis=1)
    np.testing.assert_allclose(norms[norms > 1e-3], 1.0, atol=1e-4)


@pytest.mark.skipif(os.environ.get("VINSAT_SLOW_TESTS") != "1",
                    reason="full-difficulty training takes ~5-10 min on CPU "
                           "(set VINSAT_SLOW_TESTS=1); the result is also "
                           "recorded in docs/BENCHMARKS.md from a TPU run")
def test_trained_detector_full_difficulty(rng):
    """The headline claim at FULL task difficulty (patch SNR ~1,
    noise_sigma=0.15 vs unit-norm templates): 3000 training steps localize
    every class to a few px."""
    K, H, W, S = 10, 192, 192, 12
    templates = imagery.make_landmark_templates(jax.random.PRNGKey(0), K, S)
    det, loss = ld.train_detector(
        jax.random.PRNGKey(1), templates, steps=3000, lr=2e-3,
        noise_sigma=0.15,
    )
    pos = np.stack([rng.uniform(20, W - 20, K), rng.uniform(20, H - 20, K)],
                   axis=1)
    img = imagery.render_region_image(
        jax.random.PRNGKey(2), H, W, templates, jnp.asarray(pos),
        noise_sigma=0.15, amplitude=1.5,
    )
    rows = det.predict(np.asarray(img), conf_threshold=0.5,
                       classes=np.arange(K))
    good = 0
    for cls, xc, yc, conf in rows:
        err = np.hypot(xc - pos[int(cls), 0], yc - pos[int(cls), 1])
        if err < 4.0:
            good += 1
    assert good >= K - 1, f"only {good}/{K} classes localized"
