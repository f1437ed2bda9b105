import time, numpy as np, jax, jax.numpy as jnp
from multicol_slam_tpu.models.camera import OmniCamera, in_mirror_mask
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

def bench(name, f, *a):
    g = jax.jit(f)
    r = g(*a); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(20): r = g(*a)
    jax.block_until_ready(r)
    print(f"{name}: {(time.perf_counter()-t0)/20*1000:.2f} ms")
    return r

pyr = bench("pyramid(8)", lambda im: image_ops.build_pyramid(im, 8, 1.2), images)
bench("boxfilter all levels", lambda im: [image_ops.box_filter(l,5) for l in image_ops.build_pyramid(im,8,1.2)], images)
bench("fast all levels", lambda im: [fast_ops.fast_corners(l, 20.0) for l in image_ops.build_pyramid(im,8,1.2)], images)
bench("harris all levels", lambda im: [image_ops.harris_response(l) for l in image_ops.build_pyramid(im,8,1.2)], images)
def mmasks(im):
    out=[]
    for lvl,l in enumerate(image_ops.build_pyramid(im,8,1.2)):
        _,h,w=l.shape
        yy,xx=jnp.meshgrid(jnp.arange(h,dtype=jnp.float32),jnp.arange(w,dtype=jnp.float32),indexing="ij")
        grid=jnp.stack([xx,yy],-1)[None].repeat(C,0)
        out.append(in_mirror_mask(cams,jnp.arange(C)[:,None,None],grid,lvl))
    return out
bench("mirror masks all levels", mmasks, images)
# descriptors: 400 kps x 3 cams, mdBRIEF on
uv = jnp.asarray(rng.integers(30, 400, (C, 108, 2)), jnp.int32)
def desc_one(im):
    l0 = image_ops.box_filter(im, 5)
    def per_cam(img, uv_c, pol, invpol, cde, pp):
        ang = brief_ops.ic_angles(img, uv_c)
        undist = brief_ops.undistort_keypoints(pol, cde, pp, pol[0], uv_c.astype(jnp.float32))
        return brief_ops.compute_dbrief(img, uv_c, undist, ang, invpol, cde, pp, pol[0], 32, True)
    return jax.vmap(per_cam)(l0, uv, cams.pol, cams.invpol, cams.cde, cams.pp)
bench("mdBRIEF(108kp/cam lvl0)", desc_one, images)
