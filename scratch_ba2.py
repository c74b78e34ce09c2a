"""Clean lm_iteration breakdown (scalar outputs, scan-fused)."""
import time
import numpy as np
from stereo_orb_slam_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp
from stereo_orb_slam_tpu.backend.ba import (
    BAProblem, lm_init, lm_iteration, build_normal_equations, _damp_blocks,
    _inv3, _inv6_gj)
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

def scan8(fn):
    @jax.jit
    def run(prob, slots):
        def body(c, _):
            return c + fn(prob, slots), None
        c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(CH))
        return c
    return run

def f_ne(prob, slots):
    H_cc, H_pp, W, b_c, b_p, cost = build_normal_equations(prob, 1.0, None, slots)
    return (jnp.sum(H_cc) + jnp.sum(H_pp) + jnp.sum(W) + jnp.sum(b_c)
            + jnp.sum(b_p) + cost)

def f_ne_nodense(prob, slots):
    H_cc, H_pp, W, b_c, b_p, cost = build_normal_equations(prob, 1.0, None, None)
    return (jnp.sum(H_cc) + jnp.sum(H_pp) + jnp.sum(W) + jnp.sum(b_c)
            + jnp.sum(b_p) + cost)

def f_ne_asm(prob, slots):
    H_cc, H_pp, W, b_c, b_p, cost = build_normal_equations(prob, 1.0, None, slots)
    H_pp_l = _damp_blocks(H_pp, lam)
    eye3 = jnp.eye(3)
    H_pp_l = jnp.where(prob.point_mask[:, None, None] > 0, H_pp_l, eye3[None])
    Hpp_inv = _inv3(H_pp_l)
    S = schur_dense.assemble_schur(_damp_blocks(H_cc, lam), W, Hpp_inv,
                                   slots[0], slots[1], slots[2], prob.cam_mask)
    return jnp.sum(S) + jnp.sum(S * S) + jnp.sum(b_c)

runs = {"NE (dense reductions)": scan8(f_ne),
        "NE (segsum reductions)": scan8(f_ne_nodense),
        "NE+assembly": scan8(f_ne_asm)}
outs = [r(prob, slots) for r in runs.values()]
jax.block_until_ready(outs)

carry = lm_init(prob, cfg, dense_slots=slots)
c2 = lm_iteration(carry, cfg, dense_slots=slots)
jax.block_until_ready(c2[0].prob.pose6)

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
    t = (sync_min(lambda i: r(prob, slots)) - rtt) / CH
    print(f"{name:24s} {t*1e3:7.2f} ms")
state = {"c": carry}
def it_once(i):
    c2, acc, c0, c1 = lm_iteration(state["c"], cfg, dense_slots=slots)
    state["c"] = c2
    return c2.prob.pose6
print(f"{'lm_iteration full':24s} {(sync_min(it_once)-rtt)*1e3:7.2f} ms")

@jax.jit
def chain_iter(carry, slots):
    def body(c, _):
        c2, acc, c0, c1 = lm_iteration(c, cfg, dense_slots=slots)
        return c2, c1
    c2, costs = jax.lax.scan(body, carry, jnp.arange(CH))
    return c2.prob.pose6, costs

o = chain_iter(carry, slots)
jax.block_until_ready(o)
t = (sync_min(lambda i: chain_iter(carry, slots)) - rtt) / CH
print(f"lm_iteration scan-chained: {t*1e3:.2f} ms/iter ({1/t:.1f} it/s)")

from stereo_orb_slam_tpu.backend.ba import _seg_sum, _seg_sum_points, pcg
from functools import partial as _part

def solve_ablate(prob, lam_, slots, *, do_inv6=True, do_pcg=True,
                 do_backsub=True, do_rhs=True, do_asm=True):
    H_cc, H_pp, W, b_c, b_p, cost0 = build_normal_equations(prob, 1.0, None, slots)
    H_cc_l = _damp_blocks(H_cc, lam_)
    H_pp_l = _damp_blocks(H_pp, lam_)
    eye3 = jnp.eye(3)
    H_pp_l = jnp.where(prob.point_mask[:, None, None] > 0, H_pp_l, eye3[None])
    Hpp_inv = _inv3(H_pp_l)
    eye6 = jnp.eye(6)
    H_cc_safe = jnp.where(prob.cam_mask[:, None, None] > 0, H_cc_l, eye6[None])
    M_inv = _inv6_gj(H_cc_safe + 1e-8 * eye6[None]) if do_inv6 else jnp.broadcast_to(eye6, H_cc_safe.shape)
    if do_rhs:
        hp_bp = jnp.einsum("nij,nj->ni", Hpp_inv, b_p)
        rhs = b_c - _seg_sum(jnp.einsum("oij,oj->oi", W, hp_bp[prob.obs_point]),
                             prob.obs_cam, b_c.shape[0], None)
        rhs = rhs * prob.cam_mask[:, None]
    else:
        rhs = b_c
    if do_asm:
        S = schur_dense.assemble_schur(H_cc_safe, W, Hpp_inv, slots[0], slots[1],
                                       slots[2], prob.cam_mask)
    if do_pcg:
        mv = lambda x: (S @ x.reshape(-1)).reshape(x.shape)
        dc = pcg(mv, rhs, M_inv, 100, 1e-6)
    else:
        dc = jnp.einsum("cij,cj->ci", M_inv, rhs)
    dc = dc * prob.cam_mask[:, None]
    if do_backsub:
        u = jnp.einsum("oij,oi->oj", W, dc[prob.obs_cam])
        dp = jnp.einsum("nij,nj->ni", Hpp_inv,
                        b_p - _seg_sum_points(u, prob.obs_point, b_p.shape[0], None, slots))
    else:
        dp = b_p
    dp = dp * prob.point_mask[:, None]
    pose6_new = prob.pose6 + dc
    points_new = jnp.clip(prob.points + dp, -1e4, 1e4)
    return jnp.sum(pose6_new) + jnp.sum(points_new) + cost0

variants = {
    "solve full": {},
    "no inv6": dict(do_inv6=False),
    "no pcg": dict(do_pcg=False),
    "no backsub": dict(do_backsub=False),
    "no rhs": dict(do_rhs=False),
}
jits = {k: scan8(lambda p, s, kw=kw: solve_ablate(p, lam, s, **kw))
        for k, kw in variants.items()}
outs = [f(prob, slots) for f in jits.values()]
jax.block_until_ready(outs)
for k, f in jits.items():
    t = (sync_min(lambda i: f(prob, slots)) - rtt) / CH
    print(f"{k:12s} {t*1e3:7.2f} ms")

from stereo_orb_slam_tpu.backend.ba import lm_iteration_impl, LMCarry, lm_init_impl

@jax.jit
def chain_impl_scalar(carry, slots):
    def body(c, _):
        c2, acc, c0, c1 = lm_iteration_impl(c, cfg, dense_slots=slots)
        return c2, c1
    c2, costs = jax.lax.scan(body, carry, jnp.arange(CH))
    return jnp.sum(costs) + jnp.sum(c2.prob.pose6)

o = chain_impl_scalar(carry, slots)
jax.block_until_ready(o)
t = (sync_min(lambda i: chain_impl_scalar(carry, slots)) - rtt) / CH
print(f"impl scan scalar: {t*1e3:.2f} ms/iter")

# solve + trial NE + selects, scalar out (mimic lm_iteration exactly)
def full_manual(c, slots):
    c2, acc, c0, c1 = lm_iteration_impl(c, cfg, dense_slots=slots)
    return (jnp.sum(c2.prob.pose6) + jnp.sum(c2.W) + jnp.sum(c2.H_pp)
            + jnp.sum(c2.b_c) + c1)
f_fm = scan8(lambda p, s: 0.0)  # placeholder to reuse harness shape
@jax.jit
def chain_manual(carry, slots):
    def body(c, _):
        c2, acc, c0, c1 = lm_iteration_impl(c, cfg, dense_slots=slots)
        return c2, c1
    def once(c):
        c2, acc, c0, c1 = lm_iteration_impl(c, cfg, dense_slots=slots)
        return c2
    c2 = once(carry)
    return jnp.sum(c2.prob.pose6)
o = chain_manual(carry, slots)
jax.block_until_ready(o)
t = sync_min(lambda i: chain_manual(carry, slots)) - rtt
print(f"impl single scalar: {t*1e3:.2f} ms")

from stereo_orb_slam_tpu.backend.ba import _solve_lm

@jax.jit
def v1(carry, slots):
    p = carry.prob
    pose6_new, points_new = _solve_lm(p, carry.H_cc, carry.H_pp, carry.W,
                                      carry.b_c, carry.b_p, carry.lam, cfg,
                                      None, slots)
    return jnp.sum(pose6_new) + jnp.sum(points_new)

@jax.jit
def v2(carry, slots):
    p = carry.prob
    pose6_new, points_new = _solve_lm(p, carry.H_cc, carry.H_pp, carry.W,
                                      carry.b_c, carry.b_p, carry.lam, cfg,
                                      None, slots)
    p_try = p._replace(pose6=pose6_new, points=points_new)
    H2, Hp2, W2, bc2, bp2, ct = build_normal_equations(p_try, 1.0, None, slots)
    return jnp.sum(H2) + jnp.sum(W2) + ct + jnp.sum(Hp2) + jnp.sum(bc2) + jnp.sum(bp2)

for name, f in [("v1 solve only", v1), ("v2 +trial NE", v2)]:
    o = f(carry, slots); jax.block_until_ready(o)
    t = sync_min(lambda i: f(carry, slots)) - rtt
    print(f"{name:14s} {t*1e3:7.2f} ms")

@jax.jit
def v3(carry, slots):  # two INDEPENDENT builds
    p = carry.prob
    a = build_normal_equations(p, 1.0, None, slots)
    p2 = p._replace(points=p.points + 1.0)
    b = build_normal_equations(p2, 1.0, None, slots)
    return sum(jnp.sum(t) for t in a) + sum(jnp.sum(t) for t in b)

@jax.jit
def v4(carry, slots):  # second build depends on solve via a zero coupling
    p = carry.prob
    pose6_new, points_new = _solve_lm(p, carry.H_cc, carry.H_pp, carry.W,
                                      carry.b_c, carry.b_p, carry.lam, cfg,
                                      None, slots)
    p_try = p._replace(points=p.points + 0.0 * jnp.sum(pose6_new))
    b = build_normal_equations(p_try, 1.0, None, slots)
    return sum(jnp.sum(t) for t in b) + jnp.sum(points_new)

@jax.jit
def v5(carry, slots):  # solve WITHOUT pcg while_loop + dependent trial build
    p = carry.prob
    H_cc_l = _damp_blocks(carry.H_cc, carry.lam)
    H_pp_l = _damp_blocks(carry.H_pp, carry.lam)
    eye3 = jnp.eye(3)
    H_pp_l = jnp.where(p.point_mask[:, None, None] > 0, H_pp_l, eye3[None])
    Hpp_inv = _inv3(H_pp_l)
    eye6 = jnp.eye(6)
    H_cc_safe = jnp.where(p.cam_mask[:, None, None] > 0, H_cc_l, eye6[None])
    M_inv = _inv6_gj(H_cc_safe + 1e-8 * eye6[None])
    S = schur_dense.assemble_schur(H_cc_safe, carry.W, Hpp_inv, slots[0],
                                   slots[1], slots[2], p.cam_mask)
    dc = jnp.einsum("cij,cj->ci", M_inv, carry.b_c) + 1e-9 * jnp.sum(S)
    u = jnp.einsum("oij,oi->oj", carry.W, dc[p.obs_cam])
    dp = jnp.einsum("nij,nj->ni", Hpp_inv,
                    carry.b_p - _seg_sum_points(u, p.obs_point, carry.b_p.shape[0], None, slots))
    p_try = p._replace(pose6=p.pose6 + dc, points=jnp.clip(p.points + dp, -1e4, 1e4))
    b = build_normal_equations(p_try, 1.0, None, slots)
    return sum(jnp.sum(t) for t in b)

for name, f in [("v3 two indep builds", v3), ("v4 zero-coupled", v4),
                ("v5 no-while + dep build", v5)]:
    o = f(carry, slots); jax.block_until_ready(o)
    t = sync_min(lambda i: f(carry, slots)) - rtt
    print(f"{name:24s} {t*1e3:7.2f} ms")
