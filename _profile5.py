import time, numpy as np, jax, jax.numpy as jnp
from multicol_slam_tpu.models.camera import OmniCamera
from multicol_slam_tpu.slam.features import extract_features, extract_features_jit
from multicol_slam_tpu.utils.config import ExtractorSettings

rng = np.random.default_rng(0)
C, H, W = 3, 480, 754
settings = ExtractorSettings(n_features=400, n_levels=8, scale_factor=1.2, fast_th=20)
cams = OmniCamera.from_params(
    [[-209.2, 0.0, 0.0021, -4.2e-06, 1.77e-08]] * C,
    [[293.7, 150.0, -10.4, 28.2, 7.1, 0.06, 10.4, 0.17, -5.9, 1.18, 3.1, 0.81]] * C,
    [[1.0, 0.0, 0.0]] * C, [[W/2., H/2.]] * C, [[W, H]] * C)
images = jnp.asarray(rng.uniform(0, 255, (C, H, W)).astype(np.float32))

# put cams on device once
cams_dev = jax.tree_util.tree_map(jnp.asarray, cams)

f = extract_features_jit
r = f(images, cams_dev, settings); jax.block_until_ready(r)
t0 = time.perf_counter()
for _ in range(20): r = f(images, cams_dev, settings)
jax.block_until_ready(r)
print("extract_features_jit cams-on-device:", (time.perf_counter()-t0)/20*1000, "ms")

g = jax.jit(lambda im: extract_features(im, cams_dev, settings))
r = g(images); jax.block_until_ready(r)
t0 = time.perf_counter()
for _ in range(20): r = g(images)
jax.block_until_ready(r)
print("extract cams-as-consts:", (time.perf_counter()-t0)/20*1000, "ms")
print("cache size:", f._cache_size() if hasattr(f,'_cache_size') else 'n/a')
