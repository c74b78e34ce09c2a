import time
import numpy as np
from stereo_orb_slam_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp

rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(16, 29234)).astype(np.float32))
CH = 16

def mk(fn):
    @jax.jit
    def run(x):
        def body(c, row):
            v, i = fn(row)
            return c + jnp.sum(v) + jnp.sum(i), None
        c, _ = jax.lax.scan(body, jnp.float32(0), x)
        return c
    return run

exact = mk(lambda r: jax.lax.top_k(r, 1024))
approx = mk(lambda r: jax.lax.approx_max_k(r, 1024, recall_target=0.95))
approx99 = mk(lambda r: jax.lax.approx_max_k(r, 1024, recall_target=0.99))
outs = [exact(x), approx(x), approx99(x)]
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
print(f"top_k exact   {(sync_min(lambda i: exact(x))-rtt)/CH*1e3:7.3f} ms")
print(f"approx 0.95   {(sync_min(lambda i: approx(x))-rtt)/CH*1e3:7.3f} ms")
print(f"approx 0.99   {(sync_min(lambda i: approx99(x))-rtt)/CH*1e3:7.3f} ms")
