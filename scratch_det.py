import time
import numpy as np
from stereo_orb_slam_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp
from functools import partial
from stereo_orb_slam_tpu.ops import detect as D

def synth(rng, h=376, w=1241):
    base = rng.uniform(0, 255, (h // 8, w // 8 + 2)).astype(np.float32)
    return np.kron(base, np.ones((8, 8), np.float32))[:h, :w]
imgs = jnp.stack([jnp.asarray(synth(np.random.default_rng(i))) for i in range(4)] * 4)
CH = 16

def mk(fn):
    @jax.jit
    def run(imgs):
        def body(c, img):
            return c + fn(img), None
        c, _ = jax.lax.scan(body, jnp.float32(0), imgs)
        return c
    return run

full = mk(lambda im: jnp.sum(D.detect_corners(im, 1024, min_distance=10)[0]))
nosub = mk(lambda im: jnp.sum(D.detect_corners(im, 1024, min_distance=10, subpix=False)[0]))

def detect_novalid(im):
    resp = D.shi_tomasi_response(im, 5)
    H, W = resp.shape
    keep = D.nms(resp, 5)
    masked = jnp.where(keep, resp, -jnp.inf)
    tile = 4
    Hp = -(-H // tile) * tile; Wp = -(-W // tile) * tile
    padded = jnp.pad(masked, ((0, Hp - H), (0, Wp - W)), constant_values=-jnp.inf)
    tiles = padded.reshape(Hp // tile, tile, Wp // tile, tile)
    tiles = tiles.transpose(0, 2, 1, 3).reshape(-1, tile * tile)
    tile_max = jnp.max(tiles, axis=1)
    top_vals, tidx = jax.lax.top_k(tile_max, 1024)
    return jnp.sum(top_vals) + jnp.sum(tidx)
novalid = mk(detect_novalid)

outs = [full(imgs), nosub(imgs), novalid(imgs)]
jax.block_until_ready(outs)
noop = jax.jit(lambda x: x * 1.0)
zz = jnp.ones((8, 8), jnp.float32)
_ = np.asarray(noop(zz))
def sync_min(fn, n=6):
    ts = []
    for i in range(n):
        t0 = time.perf_counter()
        r = fn(i)
        _ = np.asarray(jax.tree.leaves(r)[0]).ravel()[0]
        ts.append(time.perf_counter() - t0)
    return float(np.min(ts[1:]))
rtt = sync_min(lambda i: noop(zz), 8)
print(f"detect full        {(sync_min(lambda i: full(imgs))-rtt)/CH*1e3:7.3f} ms")
print(f"detect no-subpix   {(sync_min(lambda i: nosub(imgs))-rtt)/CH*1e3:7.3f} ms")
print(f"resp->topk only    {(sync_min(lambda i: novalid(imgs))-rtt)/CH*1e3:7.3f} ms")
