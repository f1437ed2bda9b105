#!/usr/bin/env python
"""End-to-end accuracy evaluation (BASELINE.md north star 1).

Scripts the full verify recipe: render a Lafida-layout synthetic dataset
(full pixel pipeline — fisheye images, FAST/ORB extraction, the real CLI),
run the CLI exactly as on Lafida (4 positional args, MKFTrajectoryLAFIDA.txt
output), and score ATE RMSE against the known ground-truth trajectory with
the in-repo evaluator (io/trajectory.ate_rmse, Sim3-aligned — the standard
Lafida/TUM protocol the reference evaluates with externally, README.md:
180-199).

Prints ONE JSON line, e.g.
  {"metric": "synthetic_lafida_ate_rmse", "value": 0.0093, "unit": "m", ...}
and is regression-gated by tests/test_eval_accuracy.py. Record results in
EVAL.md.

Modes:
  (default)     synthetic rig, 200 feats x 2 levels — the fast regression run
  --real-calib  REAL Lafida helmet calibration (/root/reference/Examples/
                Lafida YAMLs: 754x480, real polynomials + cde skew + mirror
                geometry) driven through the full pixel pipeline at the
                reference's 400-feats x 8-levels load (cSystem.cpp:125-180
                LoadMCS; README.md:100-127 schema)
  --selfcal     self-calibrating-BA capability demo (BASELINE config 4):
                build a map with the true rig, perturb the extrinsics M_c,
                free them in GBA (FreeMask mc per-camera, cam0 pinned for
                gauge) and report the recovered extrinsic error

Usage: python eval.py [--frames N] [--out DIR] [--tpu] [--real-calib | --selfcal]
"""
import json
import os
import sys
import time

LAFIDA_CALIB = "/root/reference/Examples/Lafida"


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    n_frames = 35
    out_dir = "/tmp/mcslam_eval"
    use_tpu = False
    real_calib = False
    selfcal = False
    use_async = False
    mdbrief = False
    seed = 7
    n_seeds = 1
    it = iter(argv)
    for a in it:
        if a == "--frames":
            n_frames = int(next(it))
        elif a == "--out":
            out_dir = next(it)
        elif a == "--tpu":
            use_tpu = True
        elif a == "--real-calib":
            real_calib = True
        elif a == "--selfcal":
            selfcal = True
        elif a == "--async":
            use_async = True
        elif a == "--mdbrief":
            mdbrief = True
        elif a == "--seed":
            seed = int(next(it))
        elif a == "--seeds":
            n_seeds = int(next(it))
        else:
            raise SystemExit(f"unknown arg {a}")

    import jax

    if not use_tpu:
        jax.config.update("jax_platforms", "cpu")
    if selfcal:
        return _selfcal(n_frames if n_frames != 35 else 60)
    if real_calib:
        return _real_calib(n_frames if n_frames != 35 else 40, out_dir + "_real")
    if n_seeds > 1:
        # multi-run protocol: "SLAM is not deterministic" — the reference's
        # settings encode multiple runs per sequence
        # (Slam_Settings_indoor1.yaml:44-57 traj.trajrun); report the
        # median + max over seeds and gate on the median.
        import numpy as np

        vals, tracked = [], []
        for i in range(n_seeds):
            r = _synthetic(n_frames, f"{out_dir}_s{seed + i}", use_async,
                           seed + i, mdbrief, use_tpu)
            vals.append(r["value"])
            tracked.append(r["frames_tracked"])
        result = {
            "metric": ("synthetic_lafida_ate_rmse_multiseed"
                       + ("_mdbrief" if mdbrief else "")),
            "value": round(float(np.median(vals)), 5),
            "unit": f"m (MEDIAN over {n_seeds} seeds, Sim3-aligned, full pixel pipeline)",
            "max": round(float(np.max(vals)), 5),
            "per_seed": [round(float(v), 5) for v in vals],
            "seeds": list(range(seed, seed + n_seeds)),
            "frames_tracked": tracked,
            "n_frames": n_frames,
            "pipeline": "async" if use_async else "sync",
        }
        print(json.dumps(result))
        return 0 if np.isfinite(result["value"]) else 1
    r = _synthetic(n_frames, out_dir, use_async, seed, mdbrief, use_tpu)
    print(json.dumps(r))
    import numpy as np

    return 0 if np.isfinite(r["value"]) else 1


def _synthetic(n_frames: int, out_dir: str, use_async: bool, seed: int,
               mdbrief: bool, use_tpu: bool = False) -> dict:
    """One synthetic-Lafida CLI run (full pixel pipeline) -> result dict.
    `mdbrief` switches the extractor to mdBRIEF with learned stability masks
    (usemdBRIEF=1 masks=1 — the reference paper's headline descriptor,
    mdBRIEFextractorOct.cpp:410-554) so every matcher runs the masked
    Hamming x0.5-threshold path end-to-end."""
    # deterministic artifact: the sequential pipeline by default (async
    # mapping interleaves BA with tracking and makes the number run-to-run
    # noisy); --async measures the SHIPPING default pipeline instead
    extra_cli = [] if use_async else ["--sync-mapping"]
    from multicol_slam_tpu.utils.jaxcache import enable_compile_cache

    enable_compile_cache()

    import numpy as np

    from multicol_slam_tpu.io.render import write_dataset
    from multicol_slam_tpu.io.synthetic import make_world
    from multicol_slam_tpu.io.trajectory import ate_rmse, load_tum_trajectory

    world = make_world(n_points=600, n_frames=n_frames, n_cams=3, n_feats=200,
                       noise_px=0.0, trajectory="line", seed=seed)
    seq_dir = write_dataset(world, out_dir)
    if mdbrief:
        _set_yaml_keys(os.path.join(seq_dir, "Slam_Settings_synthetic.yaml"),
                       {"extractor.usemdBRIEF": 1, "extractor.masks": 1})

    from multicol_slam_tpu.cli import main as cli_main

    traj_path = os.path.join(out_dir, "MKFTrajectoryLAFIDA.txt")
    cwd = os.getcwd()
    os.chdir(out_dir)  # the CLI writes MKFTrajectoryLAFIDA.txt in cwd
    t0 = time.perf_counter()
    try:
        cli_main(["no_voc.yml",
                  os.path.join(seq_dir, "Slam_Settings_synthetic.yaml"),
                  seq_dir, seq_dir] + extra_cli)
    finally:
        os.chdir(cwd)
    wall = time.perf_counter() - t0

    est_t, est_xyz = load_tum_trajectory(traj_path)
    gt_t = world.timestamps
    ate = ate_rmse(est_t, est_xyz, gt_t, world.poses[:, 3:6])
    return {
        "metric": "synthetic_lafida_ate_rmse" + ("_mdbrief" if mdbrief else ""),
        "value": round(float(ate), 5),
        "unit": f"m (Sim3-aligned, {len(est_t)}/{n_frames} frames tracked, full pixel pipeline)",
        "frames_tracked": int(len(est_t)),
        "n_frames": n_frames,
        "seed": seed,
        "wall_s": round(wall, 1),
        "platform": "tpu" if use_tpu else "cpu",
        "pipeline": "async" if use_async else "sync",
        "descriptor": "mdBRIEF+masks" if mdbrief else "ORB",
    }


def _set_yaml_keys(path: str, kv: dict) -> None:
    """Overwrite `key: value` lines in an OpenCV-YAML settings file."""
    with open(path) as f:
        lines = f.read().splitlines()
    done = set()
    for i, ln in enumerate(lines):
        for k, v in kv.items():
            if ln.startswith(k + ":"):
                lines[i] = f"{k}: {v}"
                done.add(k)
    for k, v in kv.items():
        if k not in done:
            lines.append(f"{k}: {v}")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def _real_calib(n_frames: int, out_dir: str):
    """End-to-end run through the REAL Lafida calibration: render the
    synthetic indoor world through the rig loaded from the reference's
    calibration YAMLs at 754x480, run the CLI with calib_dir pointing at the
    REAL files, score ATE (VERDICT r3 item 5)."""
    from multicol_slam_tpu.utils.jaxcache import enable_compile_cache

    enable_compile_cache()
    import numpy as np

    from multicol_slam_tpu.io.render import write_dataset
    from multicol_slam_tpu.io.synthetic import make_world
    from multicol_slam_tpu.io.trajectory import ate_rmse, load_tum_trajectory
    from multicol_slam_tpu.utils.config import load_rig

    if not os.path.isdir(LAFIDA_CALIB):
        print(json.dumps({"metric": "real_calib_ate_rmse", "value": None,
                          "unit": "m", "skipped": "no reference calibration dir"}))
        return 0
    rig = load_rig(LAFIDA_CALIB)
    # period 400 -> walking-speed motion at the 25 fps camera rate (the
    # profile the reference's keyframe-cadence constants are tuned for)
    world = make_world(n_points=2400, n_frames=n_frames, n_cams=rig.n_cams,
                       n_feats=400, noise_px=0.0, trajectory="circle_noyaw",
                       radius=3.0, seed=11, period=400,
                       landmarks="room", max_vis_dist=12.0, rig=rig)
    seq_dir = write_dataset(world, out_dir)
    # overwrite the auto-generated settings with the reference's Lafida
    # extractor load (Slam_Settings_indoor1.yaml:11-38: 400 feats, 8 levels)
    with open(os.path.join(seq_dir, "Slam_Settings_synthetic.yaml"), "w") as f:
        f.write("%YAML:1.0\n\nCamera.fps: 25.0\nCamera.RGB: 0\n")
        f.write("extractor.usemdBRIEF: 0\nextractor.masks: 0\nextractor.useAgast: 0\n")
        f.write("extractor.fastAgastType: 2\nextractor.descSize: 32\n")
        f.write("extractor.nFeatures: 400\nextractor.scaleFactor: 1.2\n")
        f.write("extractor.nLevels: 8\nextractor.fastTh: 20\n")
        f.write("extractor.nScoreType: 0\nUseMotionModel: 1\n")
        f.write(f"traj.StartFrame: 1\ntraj.EndFrame: {n_frames + 1}\n")

    from multicol_slam_tpu.cli import main as cli_main

    traj_path = os.path.join(out_dir, "MKFTrajectoryLAFIDA.txt")
    cwd = os.getcwd()
    os.chdir(out_dir)
    t0 = time.perf_counter()
    try:
        # calib_dir = the REAL reference files (LoadMCS path, cSystem.cpp:125-180)
        cli_main(["no_voc.yml",
                  os.path.join(seq_dir, "Slam_Settings_synthetic.yaml"),
                  LAFIDA_CALIB, seq_dir, "--sync-mapping"])
    finally:
        os.chdir(cwd)
    wall = time.perf_counter() - t0
    est_t, est_xyz = load_tum_trajectory(traj_path)
    ate = ate_rmse(est_t, est_xyz, world.timestamps, world.poses[:, 3:6])
    result = {
        "metric": "real_calib_ate_rmse",
        "value": round(float(ate), 5),
        "unit": f"m (Sim3-aligned, {len(est_t)}/{n_frames} frames, REAL Lafida "
                f"754x480 calibration, 400 feats x 8 levels, full pixel pipeline)",
        "frames_tracked": int(len(est_t)),
        "n_frames": n_frames,
        "wall_s": round(wall, 1),
    }
    print(json.dumps(result))
    return 0 if np.isfinite(ate) else 1


def _selfcal(n_frames: int):
    """Self-calibrating BA (BASELINE config 4): track a sequence with the
    TRUE rig (oracle features — isolates the calibration estimation), then
    perturb the non-anchor cameras' extrinsics, free them in GBA
    (cOptimizer.cpp:141-158 keeps these vertices fixed; we turn them on) and
    measure the recovered extrinsic error. Success: >=10x error reduction."""
    import jax.numpy as jnp
    import numpy as np

    from multicol_slam_tpu.utils.jaxcache import enable_compile_cache

    enable_compile_cache()

    from multicol_slam_tpu.io.synthetic import make_world
    from multicol_slam_tpu.optim.ba import bundle_adjust_jit
    from multicol_slam_tpu.optim.problem import BAParams, FreeMask, Observations
    from multicol_slam_tpu.slam.map_store import MapConfig, cayley_to_hom_np
    from multicol_slam_tpu.slam.system import MultiColSLAM
    from multicol_slam_tpu.utils.config import ExtractorSettings, SlamSettings

    world = make_world(n_points=900, n_frames=n_frames, n_cams=3, n_feats=250,
                       noise_px=0.15, trajectory="circle_noyaw", radius=3.0,
                       seed=3, period=n_frames)
    settings = SlamSettings(fps=10.0, extractor=ExtractorSettings(
        n_features=world.n_feats, n_levels=1))
    cfg = MapConfig(max_keyframes=64, max_points=12000, n_cams=3,
                    feats_per_cam=world.n_feats, n_levels=1)
    slam = MultiColSLAM(world.rig, settings, cfg, use_loop_closing=False)
    for t in range(n_frames):
        slam.track(feats=world.frame_features(t), timestamp=world.timestamps[t])
    s = slam.store
    kfs = s.active_kfs()

    def mc_err(mc_a, mc_b):
        """Mean SE3 discrepancy (rot rad + trans m) across cameras."""
        e = 0.0
        for c in range(len(mc_a)):
            Ta = cayley_to_hom_np(np.asarray(mc_a[c], np.float32))
            Tb = cayley_to_hom_np(np.asarray(mc_b[c], np.float32))
            D = np.linalg.inv(Ta) @ Tb
            rot = np.arccos(np.clip((np.trace(D[:3, :3]) - 1) / 2, -1, 1))
            e += rot + np.linalg.norm(D[:3, 3])
        return e / len(mc_a)

    # perturb cams 1..C-1 (cam0 = gauge anchor): ~1 deg rotation + cm-level
    # translation — realistic calibration decay
    rng = np.random.default_rng(5)
    mc_true = np.asarray(world.rig.Mc_cayley, np.float32)
    mc_pert = mc_true.copy()
    mc_pert[1:, :3] += rng.normal(0, 0.008, mc_pert[1:, :3].shape).astype(np.float32)
    mc_pert[1:, 3:] += rng.normal(0, 0.02, mc_pert[1:, 3:].shape).astype(np.float32)
    err0 = mc_err(mc_pert, mc_true)

    prob = s.ba_problem(kfs[1:], kfs[:1])
    from multicol_slam_tpu.slam.local_mapping import _bucket4

    nK, nP, nO = len(prob["kf_ids"]), len(prob["pt_ids"]), len(prob["obs_kf"])
    pK, pP, pO = _bucket4(nK, 8), _bucket4(nP, 256), _bucket4(nO, 1024)
    params = BAParams(
        jnp.asarray(np.pad(prob["poses"], ((0, pK - nK), (0, 0)))),
        jnp.asarray(np.pad(prob["points"], ((0, pP - nP), (0, 0)))),
        jnp.asarray(mc_pert),
        jnp.asarray(world.rig.cams.to_vector()),
    )
    obs = Observations(
        jnp.asarray(np.pad(prob["obs_kf"], (0, pO - nO))),
        jnp.asarray(np.pad(prob["obs_pt"], (0, pO - nO), constant_values=pP - 1)),
        jnp.asarray(np.pad(prob["obs_cam"], (0, pO - nO))),
        jnp.asarray(np.pad(prob["obs_uv"], ((0, pO - nO), (0, 0)))),
        jnp.asarray(np.pad(prob["obs_inv_sigma2"], (0, pO - nO))),
        jnp.asarray(np.arange(pO) < nO),
    )
    mc_free = np.ones(3, bool)
    mc_free[0] = False  # gauge: anchor camera 0's extrinsic
    free = FreeMask(
        poses=jnp.asarray(np.arange(pK) < prob["n_free_kf"]),
        points=jnp.asarray(np.arange(pP) < nP),
        mc=jnp.asarray(mc_free),
    )
    out, _ = bundle_adjust_jit(params, obs, free, max_iters=25, cg_iters=40,
                               solve_mc=True)
    err1 = mc_err(np.asarray(out.mc), mc_true)
    result = {
        "metric": "selfcal_extrinsic_error_reduction",
        "value": round(float(err0 / max(err1, 1e-12)), 1),
        "unit": f"x (injected {err0:.4f} -> recovered {err1:.4f} rad+m mean, "
                f"{nK} KFs, {nO} obs, cams 1-2 free, cam0 gauge-anchored)",
        "err_injected": round(float(err0), 5),
        "err_recovered": round(float(err1), 5),
        "n_keyframes": int(nK),
        "n_obs": int(nO),
    }
    print(json.dumps(result))
    return 0 if err1 * 10.0 <= err0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
