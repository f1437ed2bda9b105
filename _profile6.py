import time, numpy as np, jax, jax.numpy as jnp
from multicol_slam_tpu.models.camera import OmniCamera
from multicol_slam_tpu.slam.features import extract_features, extract_features_jit
from multicol_slam_tpu.utils.config import ExtractorSettings

rng = np.random.default_rng(0)
C, H, W = 3, 480, 754
settings = ExtractorSettings(n_features=400, n_levels=8, scale_factor=1.2, fast_th=20)
cams_np = OmniCamera.from_params(
    [[-209.2, 0.0, 0.0021, -4.2e-06, 1.77e-08]] * C,
    [[293.7, 150.0, -10.4, 28.2, 7.1, 0.06, 10.4, 0.17, -5.9, 1.18, 3.1, 0.81]] * C,
    [[1.0, 0.0, 0.0]] * C, [[W/2., H/2.]] * C, [[W, H]] * C)
images = jnp.asarray(rng.uniform(0, 255, (C, H, W)).astype(np.float32))
cams_dev = jax.tree_util.tree_map(jnp.asarray, cams_np)

def run(tag, call, n=50):
    r = call(); jax.block_until_ready(r)
    # force real materialization to host once to prove compute happened
    t0 = time.perf_counter()
    for _ in range(n): r = call()
    jax.block_until_ready(r)
    dt1 = (time.perf_counter()-t0)/n*1000
    # with host fetch each iter
    t0 = time.perf_counter()
    for _ in range(10):
        r = call(); _ = np.asarray(r.uv)
    dt2 = (time.perf_counter()-t0)/10*1000
    print(f"{tag}: async-chain {dt1:.3f} ms | with-host-fetch {dt2:.3f} ms")

run("args=device cams", lambda: extract_features_jit(images, cams_dev, settings))
run("args=numpy cams", lambda: extract_features_jit(images, cams_np, settings))
g = jax.jit(lambda im: extract_features(im, cams_dev, settings))
run("cams closed over", lambda: g(images))
