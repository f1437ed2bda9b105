import time, numpy as np, jax, jax.numpy as jnp
from multicol_slam_tpu.models.camera import OmniCamera
from multicol_slam_tpu.slam.features import extract_features
from multicol_slam_tpu.slam.tracking_kernels import LocalPoints, track_stage
from multicol_slam_tpu.utils.config import ExtractorSettings

rng = np.random.default_rng(0)
C, H, W = 3, 480, 754
settings = ExtractorSettings(n_features=400, n_levels=8, scale_factor=1.2, fast_th=20)
cams = OmniCamera.from_params(
    [[-209.2, 0.0, 0.0021, -4.2e-06, 1.77e-08]] * C,
    [[293.7, 150.0, -10.4, 28.2, 7.1, 0.06, 10.4, 0.17, -5.9, 1.18, 3.1, 0.81]] * C,
    [[1.0, 0.0, 0.0]] * C, [[W/2., H/2.]] * C, [[W, H]] * C)
cams = jax.tree_util.tree_map(jnp.asarray, cams)
mc = np.zeros((C,6), np.float32); mc[:,3] = [-0.2,0.0,0.2]
mc6 = jnp.asarray(mc)
intr = jnp.asarray(cams.to_vector())
L = 4096
pts = LocalPoints(
    X=jnp.asarray(rng.normal(size=(L,3)).astype(np.float32)*3 + np.array([0,0,6],np.float32)),
    desc=jnp.asarray(rng.integers(0,256,(L,32),dtype=np.uint8)),
    min_dist=jnp.full((L,),0.5), max_dist=jnp.full((L,),25.0), valid=jnp.ones((L,),bool))

def frame_fn(images_u8, pose0, mc6, intr, cams, pts):
    images = images_u8.astype(jnp.float32)
    feats = extract_features(images, cams, settings)
    o1 = track_stage(mc6, intr, cams, feats, pose0, pts, radius=15.0, th_desc=96.0)
    o2 = track_stage(mc6, intr, cams, feats, o1.pose, pts, radius=4.0, th_desc=96.0)
    return o2.pose, o2.n_inliers

frame = jax.jit(frame_fn)
frames = [jnp.asarray(rng.integers(0,255,(C,H,W),dtype=np.uint8)) for _ in range(10)]
pose = jnp.zeros(6, jnp.float32)
p, n = frame(frames[0], pose, mc6, intr, cams, pts); jax.block_until_ready((p,n))
t0 = time.perf_counter()
N = 100
for i in range(N):
    pose, n = frame(frames[i % 10], pose, mc6, intr, cams, pts)
jax.block_until_ready((pose, n))
dt = time.perf_counter()-t0
print(f"fused frame: {dt/N*1000:.3f} ms/frame -> {N/dt:.1f} fps")

# per-frame with a host fetch of the scalars each frame (realistic SLAM loop)
pose = jnp.zeros(6, jnp.float32)
t0 = time.perf_counter()
N2 = 30
for i in range(N2):
    pose, n = frame(frames[i % 10], pose, mc6, intr, cams, pts)
    ni = int(n)  # host fetch
dt = time.perf_counter()-t0
print(f"with scalar fetch: {dt/N2*1000:.3f} ms/frame -> {N2/dt:.1f} fps")

# image upload cost per frame
imgs_np = [np.asarray(rng.integers(0,255,(C,H,W),dtype=np.uint8)) for _ in range(10)]
pose = jnp.zeros(6, jnp.float32)
t0 = time.perf_counter()
for i in range(N2):
    im = jnp.asarray(imgs_np[i % 10])
    pose, n = frame(im, pose, mc6, intr, cams, pts)
jax.block_until_ready((pose, n))
dt = time.perf_counter()-t0
print(f"with per-frame upload: {dt/N2*1000:.3f} ms/frame -> {N2/dt:.1f} fps")
