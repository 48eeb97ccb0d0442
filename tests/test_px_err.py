import numpy as np

from vinsat_tpu.evalx import px_err


def test_error_records_matching():
    label_cls = [0, 1, 2]
    label_uv = [[0.5, 0.5], [0.25, 0.25], [0.75, 0.75]]
    det_cls = [0, 1, 9]
    det_uv = [[0.5, 0.5], [0.30, 0.25], [0.1, 0.1]]
    det_conf = [0.9, 0.8, 0.7]
    recs = px_err.error_records(label_cls, label_uv, det_cls, det_uv,
                                det_conf, im_w=100, im_h=100)
    # det 0: exact match -> err 0; det 1: dx=0.05*100=5 px; det 9: extra
    # (err=-1); label 2 missed (conf=-1)
    assert recs.shape == (4, 3)
    by_cls = {int(r[0]): r for r in recs[:3]}
    np.testing.assert_allclose(by_cls[0][1], 0.0, atol=1e-9)
    np.testing.assert_allclose(by_cls[1][1], 5.0, atol=1e-9)
    assert by_cls[9][1] == -1.0
    missed = recs[3]
    assert missed[0] == 2 and missed[2] == -1.0


def _fake_err(rng, n_classes=20, per=30):
    recs = []
    for cl in range(n_classes):
        base = 3.0 if cl < 12 else 25.0  # 12 good classes, 8 bad
        for _ in range(per):
            recs.append([cl, max(0.1, rng.normal(base, 1.0)),
                         rng.uniform(0.5, 1.0)])
    return np.array(recs)


def test_class_stats(rng):
    err = _fake_err(rng)
    cl, mean_err, med_err, mean_conf, missed, extra = px_err.class_stats(
        err, 0, conf_threshold=0.5)
    assert cl == 0
    assert 1.0 < mean_err < 5.0
    assert missed == 0 and extra == 0


def test_best_conf_maximize_classes(rng):
    err = _fake_err(rng)
    classes, best_conf = px_err.best_conf_maximize_classes(err,
                                                          px_threshold=10.0)
    assert classes is not None
    # the 12 good classes are accepted, the 8 bad ones are not
    assert len(classes) == 12
    assert set(classes[:, 0].astype(int)) == set(range(12))
    assert 0.5 <= best_conf <= 0.9


def test_best_conf_minimize_error(rng):
    # high-conf detections are more accurate -> best conf should be high
    recs = []
    for _ in range(500):
        conf = rng.uniform(0.5, 1.0)
        err = 20.0 - 15.0 * (conf - 0.5) / 0.5 + rng.normal(0, 1)
        recs.append([0, max(0.1, err), conf])
    best = px_err.best_conf_minimize_error(np.array(recs))
    assert best > 0.7


def test_summarize_detector(rng):
    s = px_err.summarize_detector(_fake_err(rng))
    assert s["num_accepted_classes"] == 12
    assert s["mean_accepted_err"] < 10.0


def test_best_classes_grid_matches_loop(rng):
    # the vectorized grid rule must match best_conf_maximize_classes on
    # regular (class x sample) records
    n, S = 40, 12
    scales = np.exp(np.log(9.0) + 0.7 * rng.standard_normal(n))
    err = np.hypot(rng.standard_normal((n, S)) * scales[:, None],
                   rng.standard_normal((n, S)) * scales[:, None])
    conf = 0.5 + 0.5 * rng.random((n, S))
    recs = np.stack([np.repeat(np.arange(n), S), err.ravel(),
                     conf.ravel()], axis=1)
    ref_rows, ref_conf = px_err.best_conf_maximize_classes(recs)
    keep, got_conf = px_err.best_classes_grid(err, conf)
    assert got_conf == ref_conf
    ref_set = (set() if ref_rows is None
               else set(ref_rows[:, 0].astype(int)))
    assert set(np.nonzero(keep)[0]) == ref_set
