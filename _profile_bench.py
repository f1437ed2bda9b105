import time, numpy as np, jax, jax.numpy as jnp
from multicol_slam_tpu.io.synthetic import make_world
from multicol_slam_tpu.slam.features import extract_features_jit
from multicol_slam_tpu.slam.tracking_kernels import LocalPoints, track_stage
from multicol_slam_tpu.utils.config import ExtractorSettings
from multicol_slam_tpu.models.camera import OmniCamera
from multicol_slam_tpu.models.rig import MultiCamRig

rng = np.random.default_rng(0)
C, H, W = 3, 480, 754
settings = ExtractorSettings(n_features=400, n_levels=8, scale_factor=1.2, fast_th=20)
world = make_world(n_points=4096, n_frames=4, n_cams=C, n_feats=400, noise_px=0.3, trajectory="line", seed=3)
rig = world.rig
cams = OmniCamera.from_params(
    [[-209.2, 0.0, 0.0021, -4.2e-06, 1.77e-08]] * C,
    [[293.7, 150.0, -10.4, 28.2, 7.1, 0.06, 10.4, 0.17, -5.9, 1.18, 3.1, 0.81]] * C,
    [[1.0, 0.0, 0.0]] * C,
    [[W / 2.0, H / 2.0]] * C,
    [[W, H]] * C,
)
rig = MultiCamRig.from_cayley(cams, np.asarray(rig.Mc_cayley))
images = jnp.asarray(rng.uniform(0, 255, (C, H, W)).astype(np.float32))
mc6 = jnp.asarray(np.asarray(rig.Mc_cayley, np.float32))
intr = jnp.asarray(rig.cams.to_vector())
L = 4096
pts = LocalPoints(
    X=jnp.asarray(rng.normal(size=(L, 3)).astype(np.float32) * 3 + np.array([0, 0, 6], np.float32)),
    desc=jnp.asarray(rng.integers(0, 256, (L, 32), dtype=np.uint8)),
    min_dist=jnp.full((L,), 0.5), max_dist=jnp.full((L,), 25.0), valid=jnp.ones((L,), bool),
)
pose0 = jnp.zeros(6, jnp.float32)

feats = extract_features_jit(images, rig.cams, settings)
jax.block_until_ready(feats)
t0 = time.perf_counter()
for _ in range(30):
    feats = extract_features_jit(images, rig.cams, settings)
jax.block_until_ready(feats)
print("extract ms/frame:", (time.perf_counter()-t0)/30*1000)

o = track_stage(mc6, intr, rig.cams, feats, pose0, pts, radius=15.0, th_desc=96.0)
jax.block_until_ready(o.pose)
t0 = time.perf_counter()
for _ in range(30):
    o = track_stage(mc6, intr, rig.cams, feats, pose0, pts, radius=15.0, th_desc=96.0)
jax.block_until_ready(o.pose)
print("track_stage ms:", (time.perf_counter()-t0)/30*1000)
