"""Command-line interface covering the reference's executable surface.

Subcommands map to the reference entry points:
  simulate    — sim/nadir_sim.py __main__ (detection-sequence generation)
  stream      — estimation/od_pipe.py __main__ (streaming OD over sequences)
  fullbatch   — estimation/od_pipe.full_batch_optimization
  eval        — estimation/errors_eval.py (time-to-<5km histogram)
  downselect  — labeling/ld_downselect.py (saliency percentile cut)
  label       — labeling/label_ld.py (geometry-only label generation)

Usage: python -m vinsat_tpu.cli <subcommand> [...]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def cmd_simulate(args):
    from vinsat_tpu import pipeline
    from vinsat_tpu.estimation.window import _f64_prep_context

    os.makedirs(args.out, exist_ok=True)
    db = None
    if args.landmark_csv_dir:
        from vinsat_tpu.sim import landmarks as _lm

        db = _lm.load_reference_db(args.landmark_csv_dir,
                                   best_downselect=not args.no_best_classes)
        print(f"landmark DB: {db.num_landmarks} landmarks from "
              f"{args.landmark_csv_dir} (best fraction "
              f"{float(np.asarray(db.best).mean()):.2f})", file=sys.stderr)
    for seed in range(args.first, args.first + args.num):
        # ground truth must be simulated in f64 (on the host CPU backend
        # when the default backend is an f32-only accelerator): f32
        # simulation produces NaN streams (docs/BENCHMARKS.md)
        with _f64_prep_context():
            if args.imagery:
                seq = pipeline.simulate_sequence_imagery(
                    seed, duration_s=args.duration, frame_stride=args.stride,
                )
            else:
                seq = pipeline.simulate_sequence(
                    seed, duration_s=args.duration, frame_stride=args.stride,
                    db=db,
                    along_track=args.along_track, noise_px=args.noise_px,
                    pass_every_s=args.pass_every, pass_len_s=args.pass_len,
                    hifi_truth=args.hifi_truth,
                )
        sid = str(seed).zfill(5)
        np.save(os.path.join(args.out, f"{sid}_all_detections.npy"),
                seq.det_rows)
        np.save(os.path.join(args.out, f"{sid}_orbit_eci_km.npy"),
                seq.orbit_pos_eci_km)
        print(f"seed {seed}: {len(seq.det_rows)} detections", file=sys.stderr)


def cmd_stream(args):
    from vinsat_tpu import pipeline
    from vinsat_tpu.estimation.window import StreamingConfig, stream_orbit

    import jax

    # f64 end-to-end on CPU (validation config); f32 solver + f64 CPU-side
    # conditioning on accelerators (the tuned TPU configuration — f64
    # arrays would silently truncate on an f32-only backend)
    dtype = "float64" if jax.default_backend() == "cpu" else "float32"
    cfg = StreamingConfig(dtype=dtype,
                          use_prior=args.use_prior,
                          marginalize=args.marginalize,
                          use_ekf_hybrid=args.ekf_hybrid,
                          track_nees=args.track_nees,
                          auto_calibrate=args.auto_calibrate)
    errors, times = [], []
    nees_infos, nees_est, nees_gt = [], [], []
    os.makedirs(args.out, exist_ok=True)
    from vinsat_tpu.estimation import ingest as _ingest

    for fn in sorted(os.listdir(args.data)):
        if not fn.endswith("_all_detections.npy"):
            continue
        sid = fn.split("_")[0]
        det = _ingest.load_reference_detections(os.path.join(args.data, fn))
        km_path = os.path.join(args.data, f"{sid}_orbit_eci_km.npy")
        if os.path.exists(km_path):
            orbit = np.load(km_path)
        else:
            # VINSat-format pose file (ECEF metres + axis vectors)
            ref_path = os.path.join(args.data,
                                    f"{sid}_orbit_eci_zyxvecs.npy")
            orbit = _ingest.load_reference_orbit(ref_path)
        if len(det) == 0:
            continue
        ckpt = (os.path.join(args.out, f"{sid}_ckpt")
                if args.checkpoint else None)
        # a checkpoint belongs to ONE sequence ({sid}_ckpt.w{N}.npz):
        # restoring it into any other sequence's stream would corrupt it
        resume = args.resume_from or None
        if resume and not os.path.basename(resume).startswith(f"{sid}_"):
            resume = None
        res = stream_orbit(det, orbit, seed=int(sid), cfg=cfg,
                           checkpoint_path=ckpt,
                           resume_from=resume)
        errors.append(res.errors)
        times.append(res.times)
        if len(res.errors):
            print(f"{sid}: min err {res.errors.min():.2f} km",
                  file=sys.stderr)
        else:
            print(f"{sid}: no observations survived gating", file=sys.stderr)
        if args.track_nees and res.window_infos is not None:
            nees_infos.extend(res.window_infos)
            nees_est.extend(res.window_est)
            nees_gt.extend(res.window_gt)
    np.save(os.path.join(args.out, "errors.npy"),
            np.array(errors, dtype=object), allow_pickle=True)
    np.save(os.path.join(args.out, "times.npy"),
            np.array(times, dtype=object), allow_pickle=True)
    if args.track_nees and nees_infos:
        from vinsat_tpu.evalx import calibration

        c = calibration.calibrate_inflation(nees_infos, nees_est, nees_gt)
        f_pos, f_rot, f_vel = calibration.floors_from_inflation(nees_infos, c)
        np.savez(os.path.join(args.out, "nees.npz"),
                 infos=np.asarray(nees_infos), est=np.asarray(nees_est),
                 gt=np.asarray(nees_gt))
        print(json.dumps({
            "nees_windows": len(nees_infos),
            "covariance_inflation": c,
            "recommended_floors": {
                "prior_pos_floor_km": f_pos, "prior_rot_floor": f_rot,
                "prior_vel_floor": f_vel,
            },
        }, indent=2))


def cmd_fullbatch(args):
    from vinsat_tpu import pipeline

    for fn in sorted(os.listdir(args.data)):
        if not fn.endswith("_all_detections.npy"):
            continue
        sid = fn.split("_")[0]
        det = np.load(os.path.join(args.data, fn))
        orbit = np.load(os.path.join(args.data, f"{sid}_orbit_eci_km.npy"))
        if len(det) == 0:
            continue
        seq = pipeline.SimulatedSequence(det, orbit, None, None)
        states, knot_t, gt_states = pipeline.run_full_batch(
            seq, seed=int(sid), num_iters=args.iters
        )
        err = np.linalg.norm(states[:, :3] - gt_states[:, :3], axis=-1)
        print(f"{sid}: median knot error {np.median(err):.3f} km")


def cmd_constellation(args):
    from vinsat_tpu import pipeline

    out = pipeline.run_constellation(
        list(range(args.first, args.first + args.num)),
        duration_s=args.duration, num_iters=args.iters,
    )
    print(json.dumps(out, indent=2))


def cmd_eval(args):
    from vinsat_tpu.evalx import ate

    errors = np.load(os.path.join(args.data, "errors.npy"), allow_pickle=True)
    times = np.load(os.path.join(args.data, "times.npy"), allow_pickle=True)
    summary = ate.summarize(list(errors), list(times))
    print(json.dumps(summary, indent=2))
    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        ts, frac = ate.cumulative_fraction(list(errors), list(times))
        plt.figure(figsize=(10, 6))
        plt.step(ts, frac, where="post",
                 label="Fraction of Orbits <5km Error")
        plt.title("Cumulative Fraction of First Times Reaching <5km Error")
        plt.xlabel("Time (s)")
        plt.ylabel("Fraction of Total Orbits")
        plt.ylim(0, 1)
        plt.grid(True)
        plt.legend()
        plt.savefig(args.plot)
        print(f"saved {args.plot}", file=sys.stderr)


def cmd_evaldet(args):
    """Detector QA: class stats + best-conf search over an error-record npy
    (eval/eval_landmarks.py CLI surface; records are [cls, err_px, conf])."""
    from vinsat_tpu.evalx import px_err

    err = np.load(args.err_path)
    classes, best_conf = px_err.best_conf_maximize_classes(
        err, px_threshold=args.px_threshold
    )
    summary = px_err.summarize_detector(err, args.px_threshold)
    print(json.dumps(summary, indent=2))
    if args.save_best_conf:
        np.save(args.best_conf_path, best_conf)
        if classes is not None:
            np.save(args.best_classes_path, np.unique(classes[:, 0]))
        print(f"saved best_conf={best_conf:.3f}", file=sys.stderr)


def cmd_downselect(args):
    from vinsat_tpu.sim.landmarks import downselect_by_saliency

    all_landmarks = np.load(args.path)
    scales = args.scales or [0, 5, 10, 15, 20, 25, 30, 35, 40, 45, 50]
    keep = downselect_by_saliency(
        all_landmarks[:, -1], all_landmarks[:, -2], args.num_landmarks,
        np.array(scales),
    )
    out = all_landmarks[keep]
    np.save(args.output_path, out)
    print(f"Downselected to {len(out)} landmarks from {len(all_landmarks)}")


def cmd_label(args):
    from vinsat_tpu.tools.labeling import label_grid

    landmarks = np.load(args.landmark_path)
    rows = label_grid(
        landmarks, args.lon_min, args.lat_min, args.lon_max, args.lat_max,
        args.width, args.height,
    )
    os.makedirs(os.path.dirname(args.output_path) or ".", exist_ok=True)
    with open(args.output_path, "w") as f:
        for r in rows:
            f.write(f"{int(r[0])} {r[1]} {r[2]} {r[3]} {r[4]}\n")
    print(f"wrote {len(rows)} labels to {args.output_path}")
    if args.viz:
        # label-overlay QA image (visualize_label, label_ld.py:116-137);
        # with no raster given, boxes render on a neutral canvas
        from vinsat_tpu.tools.labeling import visualize_label, write_ppm

        if args.viz_image and os.path.exists(args.viz_image):
            canvas = np.load(args.viz_image)
        else:
            canvas = np.full((args.height, args.width, 3), 64, np.uint8)
        write_ppm(visualize_label(rows, canvas), args.viz)
        print(f"wrote label overlay to {args.viz}", file=sys.stderr)


def _configure_jax():
    """CLI-level JAX setup: f64 on CPU (the validation configuration — f32
    without it silently truncates and costs accuracy), true-f32 matmuls on
    TPU, persistent compilation cache."""
    import jax

    # register the host CPU backend next to the accelerator so data
    # conditioning can run in f64 (window._f64_prep_context): f32
    # conditioning costs km-level final error (docs/BENCHMARKS.md).
    # MUST happen before the first backend access — jax_platforms updates
    # after backend initialization are silently ignored (jax 0.9.0).
    plat = (jax.config.jax_platforms
            or os.environ.get("JAX_PLATFORMS", "")).strip()
    if plat and "cpu" not in plat.split(","):
        jax.config.update("jax_platforms", plat + ",cpu")
    try:
        backend = jax.default_backend()
    except RuntimeError:
        # e.g. JAX_PLATFORMS names an unregistered plugin platform
        jax.config.update("jax_platforms", "")
        backend = jax.default_backend()
    if backend == "cpu":
        jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_default_matmul_precision", "highest")
    from vinsat_tpu.utils.cache import configure_persistent_cache

    configure_persistent_cache(os.environ.get(
        "VINSAT_JAX_CACHE", os.path.expanduser("~/.cache/vinsat_jax")
    ))
    if os.environ.get("VINSAT_DEBUG_NANS") == "1":
        jax.config.update("jax_debug_nans", True)


def main(argv=None):
    _configure_jax()
    p = argparse.ArgumentParser(prog="vinsat_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("simulate")
    s.add_argument("--out", required=True)
    s.add_argument("--first", type=int, default=0)
    s.add_argument("--num", type=int, default=1)
    s.add_argument("--duration", type=int, default=10800)
    s.add_argument("--stride", type=int, default=1)
    s.add_argument("--noise-px", type=float, default=4.0)
    s.add_argument("--along-track", action="store_true")
    s.add_argument("--pass-every", type=int, default=None,
                   help="region-pass landmark layout: landmarks only under "
                        "track segments every N s (real detection gaps)")
    s.add_argument("--pass-len", type=int, default=300)
    s.add_argument("--hifi-truth", action="store_true",
                   help="simulate truth with the full force model "
                        "(drag/SRP/third-body)")
    s.add_argument("--imagery", action="store_true",
                   help="full imagery path: region rasters + NCC detector")
    s.add_argument("--landmark-csv-dir", default=None,
                   help="load the landmark DB from a VINSat-format CSV "
                        "directory (e.g. the reference's "
                        "sim/landmark_csvs) instead of synthesizing one")
    s.add_argument("--no-best-classes", action="store_true",
                   help="skip the detector-QA best-class downselect when "
                        "loading --landmark-csv-dir")
    s.set_defaults(fn=cmd_simulate)

    s = sub.add_parser("stream")
    s.add_argument("--data", required=True)
    s.add_argument("--out", required=True)
    s.add_argument("--use-prior", action="store_true")
    s.add_argument("--marginalize", action="store_true",
                   help="bounded-memory windows with anchor marginal prior")
    s.add_argument("--ekf-hybrid", action="store_true",
                   help="EKF+BA hybrid (config 3): EKF warm start + prior")
    s.add_argument("--checkpoint", action="store_true",
                   help="write per-window checkpoints next to --out")
    s.add_argument("--resume-from", default=None,
                   help="checkpoint .npz to resume from")
    s.add_argument("--track-nees", action="store_true",
                   help="record per-window NEES and print covariance "
                        "calibration (inflation factors + recommended "
                        "prior floors; evalx/calibration.py)")
    s.add_argument("--auto-calibrate", action="store_true",
                   help="self-calibrating anchor prior (bounded modes): "
                        "inflate by the measured NEES factors instead of "
                        "the static floors once enough windows exist")
    s.set_defaults(fn=cmd_stream)

    s = sub.add_parser("fullbatch")
    s.add_argument("--data", required=True)
    s.add_argument("--iters", type=int, default=100)
    s.set_defaults(fn=cmd_fullbatch)

    s = sub.add_parser("constellation")
    s.add_argument("--first", type=int, default=0)
    s.add_argument("--num", type=int, default=8)
    s.add_argument("--duration", type=int, default=3600)
    s.add_argument("--iters", type=int, default=20)
    s.set_defaults(fn=cmd_constellation)

    s = sub.add_parser("eval")
    s.add_argument("--data", required=True)
    s.add_argument("--plot", default=None)
    s.set_defaults(fn=cmd_eval)

    s = sub.add_parser("evaldet")
    s.add_argument("--err_path", required=True)
    s.add_argument("--px_threshold", type=float, default=10.0)
    s.add_argument("--save_best_conf", action="store_true")
    s.add_argument("--best_conf_path", default="best_conf.npy")
    s.add_argument("--best_classes_path", default="best_classes.npy")
    s.set_defaults(fn=cmd_evaldet)

    s = sub.add_parser("downselect")
    s.add_argument("--path", required=True)
    s.add_argument("--num_landmarks", type=int, required=True)
    s.add_argument("--output_path", required=True)
    s.add_argument("--scales", type=float, nargs="+", default=None)
    s.set_defaults(fn=cmd_downselect)

    s = sub.add_parser("label")
    s.add_argument("--landmark_path", required=True)
    s.add_argument("--output_path", required=True)
    s.add_argument("--lon_min", type=float, required=True)
    s.add_argument("--lat_min", type=float, required=True)
    s.add_argument("--lon_max", type=float, required=True)
    s.add_argument("--lat_max", type=float, required=True)
    s.add_argument("--width", type=int, default=4608)
    s.add_argument("--height", type=int, default=2592)
    s.add_argument("--viz", default=None,
                   help="write a label-overlay QA image (PPM) here")
    s.add_argument("--viz_image", default=None,
                   help="npy image to overlay on (default: neutral canvas)")
    s.set_defaults(fn=cmd_label)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
