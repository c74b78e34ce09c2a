"""Stage-level frontend timing on TPU (sync-differencing, chained dispatch).

Measures: detect_and_describe (one image), associate, full fused step, and
a batched-2 (L+R stacked) detect to see if batching the two views helps.
"""
import time
import numpy as np

from stereo_orb_slam_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from stereo_orb_slam_tpu.config import FrontendConfig, RansacConfig
from stereo_orb_slam_tpu.frontend.odometer import (
    empty_slots, frontend_step_fused, _detect_and_describe_impl, associate,
)
from stereo_orb_slam_tpu.geometry import camera
from stereo_orb_slam_tpu.ops import orb

fe = FrontendConfig()
rc = RansacConfig()
fx, cx, cy, b = 718.856, 607.1928, 185.2157, 0.5371657
left = camera.Pinhole.create(fx, fx, cx, cy)
pose_r = np.eye(4, dtype=np.float32)
pose_r[0, 3] = b
right = camera.Pinhole.create(fx, fx, cx, cy, pose=pose_r)
rig = camera.StereoRig.create(left, right, rectified=True, baseline=b)
maxd = jnp.float32(fx * b)

rng = np.random.default_rng(0)
h, w = 376, 1241
base = rng.uniform(0, 255, (h // 8, (w + 64) // 8 + 2)).astype(np.float32)
base = np.kron(base, np.ones((8, 8), np.float32))[:h, : w + 64]
img_l = jnp.asarray(base[:, 32 : 32 + w])
img_r = jnp.asarray(base[:, 26 : 26 + w])
key = jax.random.key(0)
steer = orb._STEER
TRUE = jnp.asarray(True)

prev = empty_slots(fe.num_features)
res = frontend_step_fused(img_l, img_r, prev, jnp.asarray(False), key, rig,
                          maxd, fe, rc, True, steer)
prev = res.slots
jax.block_until_ready(prev.desc)

CHAIN = 32


@jax.jit
def chain_detect(img, steer):
    def body(c, _):
        xy, v, d = _detect_and_describe_impl(c, steer, fe)
        # data-dependence: perturb image by first descriptor bit
        return c + d[0, 0].astype(jnp.float32) * 1e-9, xy[0, 0]
    out, xs = jax.lax.scan(body, img, None, length=CHAIN)
    return xs[-1]


@jax.jit
def chain_assoc(xy_l, v_l, d_l, xy_r, v_r, d_r, prev, key, steer):
    def body(p, _):
        r = associate(xy_l, v_l, d_l, xy_r, v_r, d_r, p, TRUE, key, rig,
                      maxd, fe, rc, True)
        return r.slots, r.transform
    last, tfs = jax.lax.scan(body, prev, None, length=CHAIN)
    return tfs[-1]


@jax.jit
def chain_full(img_l, img_r, prev, key, steer):
    def body(p, _):
        r = frontend_step_fused(img_l, img_r, p, TRUE, key, rig, maxd,
                                fe, rc, True, steer)
        return r.slots, r.transform
    last, tfs = jax.lax.scan(body, prev, None, length=CHAIN)
    return tfs[-1]


xy_l, v_l, d_l = _detect_and_describe_impl(img_l, steer, fe)
xy_r, v_r, d_r = _detect_and_describe_impl(img_r, steer, fe)
jax.block_until_ready(d_r)

# warm all chains
a = chain_detect(img_l, steer)
b2 = chain_assoc(xy_l, v_l, d_l, xy_r, v_r, d_r, prev, key, steer)
c = chain_full(img_l, img_r, prev, key, steer)
jax.block_until_ready((a, b2, c))

noop = jax.jit(lambda x: x + 1.0)
zz = jnp.ones((8, 8), jnp.float32)
_ = np.asarray(noop(zz))


def sync_min(fn, n=12):
    ts = []
    for i in range(n):
        t0 = time.perf_counter()
        r = fn(i)
        _ = np.asarray(jax.tree.leaves(r)[0]).ravel()[0]
        ts.append(time.perf_counter() - t0)
    return float(np.min(ts[1:]))


rtt = sync_min(lambda i: noop(zz))
t_detect = (sync_min(lambda i: chain_detect(img_l, steer)) - rtt) / CHAIN
t_assoc = (sync_min(lambda i: chain_assoc(xy_l, v_l, d_l, xy_r, v_r, d_r,
                                          prev, key, steer)) - rtt) / CHAIN
t_full = (sync_min(lambda i: chain_full(img_l, img_r, prev, key, steer))
          - rtt) / CHAIN

print(f"rtt            {rtt*1e3:8.2f} ms")
print(f"detect (1 img) {t_detect*1e3:8.3f} ms")
print(f"associate      {t_assoc*1e3:8.3f} ms")
print(f"full step      {t_full*1e3:8.3f} ms  (2*detect+assoc = "
      f"{(2*t_detect+t_assoc)*1e3:.3f})")
