import time, numpy as np, jax, jax.numpy as jnp
from multicol_slam_tpu.ops import image as image_ops, brief as brief_ops

rng = np.random.default_rng(0)
H, W = 480, 754
img = jnp.asarray(rng.uniform(0, 255, (H, W)).astype(np.float32))
uv = jnp.asarray(rng.integers(20, 400, (108, 2)), jnp.int32)

def bench(name, f, *a):
    g = jax.jit(f)
    r = g(*a); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(20): r = g(*a)
    jax.block_until_ready(r)
    print(f"{name}: {(time.perf_counter()-t0)/20*1000:.2f} ms")

bench("gather_patches 108x31x31 traced-uv", lambda im, u: image_ops.gather_patches(im, u, 15), img, uv)
bench("ic_angles 108 traced-uv", brief_ops.ic_angles, img, uv)
ang = jnp.zeros(108)
bench("compute_orb 108 traced", lambda im,u,a: brief_ops.compute_orb(im,u,a,32), img, uv, ang)
# and a no-op dispatch baseline
bench("dispatch overhead", lambda im: im + 1.0, img)
bench("topk_grid", lambda s: jax.lax.top_k(s.reshape(-1), 400), img)
