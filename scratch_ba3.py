"""Honest BA phase timings: scan with VARYING inputs (no hoisting)."""
import time
import numpy as np
from stereo_orb_slam_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp
from stereo_orb_slam_tpu.backend.ba import (
    BAProblem, build_normal_equations, _damp_blocks, _inv3, _inv6_gj,
    _seg_sum, _seg_sum_points, pcg, lm_iteration, lm_init)
from stereo_orb_slam_tpu.backend import schur_dense
from stereo_orb_slam_tpu.config import BAConfig

rng = np.random.default_rng(0)
fx, cx, cy, b = 718.856, 607.1928, 185.2157, 0.5371657
P_l = np.array([[fx, 0, cx, 0], [0, fx, cy, 0], [0, 0, 1, 0]], np.float32)
P_r = P_l.copy(); P_r[0, 3] = -fx * b
C, P, obs_per_cam = 200, 20000, 600
O = C * obs_per_cam
P_pad = 32768
pts = np.stack([rng.uniform(-20, 20, P), rng.uniform(-5, 5, P),
                rng.uniform(5, 60, P)], 1).astype(np.float32)
pose6 = rng.normal(0, 0.01, (C, 6)).astype(np.float32)
obs_cam = np.repeat(np.arange(C, dtype=np.int32), obs_per_cam)
obs_point = rng.integers(0, P, O).astype(np.int32)
order = np.argsort(obs_point, kind="stable")
obs_point = obs_point[order]; obs_cam = obs_cam[order]
X = pts[obs_point]
def proj(Pm):
    Xh = np.concatenate([X, np.ones((O, 1), np.float32)], 1)
    uvw = Xh @ Pm.T
    return uvw[:, :2] / np.maximum(uvw[:, 2:3], 1e-6)
obs_uv = (np.concatenate([proj(P_l), proj(P_r)], 1)
          + rng.normal(0, 0.5, (O, 4))).astype(np.float32)
pts_pad = np.zeros((P_pad, 3), np.float32); pts_pad[:P] = pts
pm = np.zeros(P_pad, np.float32); pm[:P] = 1.0
prob = BAProblem(
    pose6=jnp.asarray(pose6), points=jnp.asarray(pts_pad),
    obs_cam=jnp.asarray(obs_cam), obs_point=jnp.asarray(obs_point),
    obs_uv=jnp.asarray(obs_uv), obs_weight=jnp.ones(O, jnp.float32),
    cam_mask=jnp.asarray([0.0] + [1.0] * (C - 1), jnp.float32),
    point_mask=jnp.asarray(pm), P_l=jnp.asarray(P_l), P_r=jnp.asarray(P_r))
sto, scam, smask, K = schur_dense.group_slots(obs_point, obs_cam, P_pad, O)
slots = (jnp.asarray(sto), jnp.asarray(scam), jnp.asarray(smask))
cfg = BAConfig(cg_iterations=100)
lam = jnp.float32(1e-4)
CH = 8

# Precompute one NE for solve-phase timings.
NE = jax.jit(lambda p: build_normal_equations(p, 1.0, None, slots))(prob)
H_cc, H_pp, W, b_c, b_p, cost0 = NE

def scanv(fn):
    """Chain CH executions, each with a perturbed input (defeats hoisting)."""
    @jax.jit
    def run(eps):
        def body(c, i):
            return c + fn(c * 1e-30 + eps * i), None
        c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(CH, dtype=jnp.float32))
        return c
    return run

f_build = scanv(lambda d: sum(jnp.sum(t) for t in build_normal_equations(
    prob._replace(points=prob.points + d), 1.0, None, slots)))
f_build_flat = scanv(lambda d: sum(jnp.sum(t) for t in build_normal_equations(
    prob._replace(points=prob.points + d), 1.0, None, None)))

def asm(d):
    Hpp_inv = _inv3(_damp_blocks(H_pp + d, lam))
    S = schur_dense.assemble_schur(_damp_blocks(H_cc, lam), W + d, Hpp_inv,
                                   slots[0], slots[1], slots[2], prob.cam_mask)
    return jnp.sum(S) + jnp.sum(S * S)
f_asm = scanv(asm)

def solve(d):
    H_cc_l = _damp_blocks(H_cc + d, lam)
    H_pp_l = _damp_blocks(H_pp + d, lam)
    eye3 = jnp.eye(3)
    H_pp_l = jnp.where(prob.point_mask[:, None, None] > 0, H_pp_l, eye3[None])
    Hpp_inv = _inv3(H_pp_l)
    eye6 = jnp.eye(6)
    H_cc_safe = jnp.where(prob.cam_mask[:, None, None] > 0, H_cc_l, eye6[None])
    M_inv = _inv6_gj(H_cc_safe + 1e-8 * eye6[None])
    hp_bp = jnp.einsum("nij,nj->ni", Hpp_inv, b_p)
    rhs = b_c - _seg_sum(jnp.einsum("oij,oj->oi", W, hp_bp[prob.obs_point]),
                         prob.obs_cam, b_c.shape[0], None)
    rhs = rhs * prob.cam_mask[:, None]
    S = schur_dense.assemble_schur(H_cc_safe, W, Hpp_inv, slots[0], slots[1],
                                   slots[2], prob.cam_mask)
    dc = pcg(lambda x: (S @ x.reshape(-1)).reshape(x.shape), rhs, M_inv,
             cfg.cg_iterations, cfg.cg_tol)
    dc = dc * prob.cam_mask[:, None]
    u = jnp.einsum("oij,oi->oj", W, dc[prob.obs_cam])
    dp = jnp.einsum("nij,nj->ni", Hpp_inv,
                    b_p - _seg_sum_points(u, prob.obs_point, b_p.shape[0], None, slots))
    return jnp.sum(dc) + jnp.sum(dp)
f_solve = scanv(solve)

runs = {"build (dense red)": f_build, "build (segsum)": f_build_flat,
        "assembly": f_asm, "solve-after-NE": f_solve}
eps = jnp.float32(1e-6)
outs = [r(eps) for r in runs.values()]
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
for name, r in runs.items():
    t = (sync_min(lambda i: r(eps)) - rtt) / CH
    print(f"{name:20s} {t*1e3:7.2f} ms")

# assembly variants: bf16 big-matmul, less padding, no-onehot-transpose
def asm_var(dtype, P_use):
    Wv = W; Hpp = H_pp
    stov, scamv, smaskv = slots
    if P_use != P_pad:
        stov = stov[:P_use]; scamv = scamv[:P_use]; smaskv = smaskv[:P_use]
        Hpp = H_pp[:P_use]
    def f(d):
        Hpp_inv = _inv3(_damp_blocks(Hpp + d, lam))
        H_cc_safe = _damp_blocks(H_cc, lam)
        Pq, K = stov.shape
        Wpad = jnp.concatenate([Wv + d, jnp.zeros((1, 6, 3), jnp.float32)], 0)
        Wg = schur_dense.slot_gather(Wpad.reshape(-1, 18)[:-1+Wpad.shape[0]*0+Wpad.shape[0]-Wpad.shape[0]+Wpad.shape[0]] if False else Wpad.reshape(-1,18), stov, smaskv).reshape(Pq, K, 6, 3)
        Pc = 2048
        n_chunks = Pq // Pc
        cam_range = jnp.arange(200, dtype=scamv.dtype)
        def body(S_acc, chunk):
            cam_c, Wg_c, Minv_c = chunk
            oh = (cam_c[..., None] == cam_range).astype(dtype)
            A = jnp.einsum("pkc,pkia->paci", oh, Wg_c.astype(dtype),
                           preferred_element_type=jnp.float32)
            A2 = A.reshape(Pc * 3, 1200)
            T = jnp.einsum("pab,pbx->pax", Minv_c, A.reshape(Pc, 3, 1200))
            S_acc = S_acc + jax.lax.dot_general(
                A2.astype(dtype), T.reshape(Pc * 3, 1200).astype(dtype),
                (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
            return S_acc, None
        chunks = (scamv.reshape(n_chunks, Pc, K), Wg.reshape(n_chunks, Pc, K, 6, 3),
                  Hpp_inv.reshape(n_chunks, Pc, 3, 3))
        S, _ = jax.lax.scan(body, jnp.zeros((1200, 1200), jnp.float32), chunks)
        return jnp.sum(S) + jnp.sum(S * S)
    return scanv(f)

vs = {
    "asm f32 P=32768": asm_var(jnp.float32, 32768),
    "asm bf16 P=32768": asm_var(jnp.bfloat16, 32768),
    "asm f32 P=20480": asm_var(jnp.float32, 20480),
    "asm bf16 P=20480": asm_var(jnp.bfloat16, 20480),
}
outs = [r(eps) for r in vs.values()]
jax.block_until_ready(outs)
for name, r in vs.items():
    t = (sync_min(lambda i: r(eps)) - rtt) / CH
    print(f"{name:18s} {t*1e3:7.2f} ms")

# backsub reduction: segsum vs gather-reduce
dc0 = jnp.ones((200, 6), jnp.float32)
def backsub_seg(d):
    u = jnp.einsum("oij,oi->oj", W + d, dc0[prob.obs_cam])
    return jnp.sum(_seg_sum(u, prob.obs_point, P_pad, None))
def backsub_gr(d):
    u = jnp.einsum("oij,oi->oj", W + d, dc0[prob.obs_cam])
    return jnp.sum(_seg_sum_points(u, prob.obs_point, P_pad, None, slots))
for name, fn in [("backsub segsum", backsub_seg), ("backsub gather-red", backsub_gr)]:
    r = scanv(fn); o = r(eps); jax.block_until_ready(o)
    t = (sync_min(lambda i: r(eps)) - rtt) / CH
    print(f"{name:18s} {t*1e3:7.2f} ms")
