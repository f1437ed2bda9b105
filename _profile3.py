import time, numpy as np, jax, jax.numpy as jnp
from multicol_slam_tpu.models.camera import OmniCamera, in_mirror_mask, img_to_world
from multicol_slam_tpu.ops import fast as fast_ops, image as image_ops, brief as brief_ops
from multicol_slam_tpu.utils.config import ExtractorSettings

rng = np.random.default_rng(0)
C, H, W = 3, 480, 754
settings = ExtractorSettings(n_features=400, n_levels=8, scale_factor=1.2, fast_th=20)
cams = OmniCamera.from_params(
    [[-209.2, 0.0, 0.0021, -4.2e-06, 1.77e-08]] * C,
    [[293.7, 150.0, -10.4, 28.2, 7.1, 0.06, 10.4, 0.17, -5.9, 1.18, 3.1, 0.81]] * C,
    [[1.0, 0.0, 0.0]] * C, [[W/2., H/2.]] * C, [[W, H]] * C)
images = jnp.asarray(rng.uniform(0, 255, (C, H, W)).astype(np.float32))
quotas = fast_ops.level_quota(400, 8, 1.2)

def bench(name, f, *a):
    g = jax.jit(f)
    r = g(*a); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(20): r = g(*a)
    jax.block_until_ready(r)
    print(f"{name}: {(time.perf_counter()-t0)/20*1000:.2f} ms")
    return r

def detect_all(im):
    outs=[]
    pyr = image_ops.build_pyramid(im, 8, 1.2)
    for lvl, l in enumerate(pyr):
        _,h,w = l.shape
        is_c, fs = fast_ops.fast_corners(l, 20.0)
        score = jnp.where(is_c, image_ops.harris_response(l), -jnp.inf)
        nms = score >= image_ops.max_pool_3x3(score)
        valid = nms & fast_ops.border_mask(h,w,19)[None] & jnp.isfinite(score)
        outs.append(fast_ops.select_topk_grid(score, valid, int(quotas[lvl])))
    return outs
bench("detect+topk all levels", detect_all, images)

def angles_all(im):
    pyr = image_ops.build_pyramid(im, 8, 1.2)
    outs=[]
    for lvl, l in enumerate(pyr):
        K = int(quotas[lvl])
        uv = jnp.asarray(rng.integers(20, 100, (C, K, 2)), jnp.int32)
        outs.append(jax.vmap(brief_ops.ic_angles)(l, uv))
    return outs
bench("ic_angles all levels", angles_all, images)

def orb_all(im):
    pyr = image_ops.build_pyramid(im, 8, 1.2)
    outs=[]
    for lvl, l in enumerate(pyr):
        b = image_ops.box_filter(l, 5)
        K = int(quotas[lvl])
        uv = jnp.asarray(rng.integers(20, 100, (C, K, 2)), jnp.int32)
        ang = jnp.zeros((C, K))
        outs.append(jax.vmap(lambda i,u,a: brief_ops.compute_orb(i,u,a,32))(b, uv, ang))
    return outs
bench("compute_orb all levels", orb_all, images)

def rays_all(uv):
    cam_ids = jnp.arange(C)[:, None]
    return img_to_world(cams.pol[cam_ids], cams.cde[cam_ids], cams.pp[cam_ids], uv)
uv400 = jnp.asarray(rng.integers(20, 400, (C, 400, 2)), jnp.float32)
bench("rays 400", rays_all, uv400)
