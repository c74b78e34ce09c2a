"""Measure the reference's CPU performance envelope with OpenCV + NumPy/SciPy.

The reference binary is not buildable in this container (absent
`ransac_solver` submodule, prebuilt g2o at a sibling path), but its entire
front end is ~30 lines of OpenCV (ref src/visual_odometer.cpp:232-289) and
its BA solver envelope is a standard Schur-complement LM iteration (ref
src/bundle_adjuster.cpp:13-36). This script reproduces both with cv2 5.0 /
vectorized NumPy / scipy.sparse — giving the reference the benefit of the
doubt everywhere (batched RANSAC instead of its sequential 100-trial loop,
vectorized Jacobians instead of Ceres autodiff) — and records MEASURED
numbers into BASELINE_MEASURED.json for bench.py's vs_baseline.

Front-end stages mirrored exactly:
  - cv2.goodFeaturesToTrack(1000, 0.01, 10, blockSize=5) x2
      (ref visual_odometer.cpp:234-235, params.h:9)
  - cv2.cornerSubPix(win 5x5, EPS+COUNT, 40, 0.001) x2  (ref :239-242)
  - cv2.ORB.compute on those corners x2                 (ref :256-259)
  - BFMatcher(HAMMING).knnMatch(k=2) stereo + temporal  (ref :263-289,316-333)
  - rectified triangulation (closed-form disparity)     (ref camera_model.cpp:203)
  - RANSAC rigid transform: 100 hypotheses, minimal set 3, Horn/Kabsch
    alignment, stereo-reprojection scoring               (ref params.h:27, C8)

BA yardstick: one LM iteration on the same problem size bench.py uses
(C=200 cams, P=20k points, O=120k observations): analytic Jacobian blocks,
normal-equation assembly, Schur elimination of points, sparse Cholesky on the
6Cx6C reduced camera system (what Ceres SPARSE_SCHUR does per iteration,
ref bundle_adjuster.cpp:23-27).

Usage:  python benchmarks/reference_baseline.py [--frames 30] [--out FILE]
"""

import argparse
import json
import platform
import time

import numpy as np


# --------------------------------------------------------------------- frames
def synth_sequence(rng, n_frames, h=376, w=1241, shift=6, step=4):
    """Synthetic stereo SEQUENCE (same generator family as bench.py).

    One fixed texture; frame i's left view is a window slid `step` px right,
    the right view shifts content LEFT by `shift` px (u_r = u_l - shift, so
    disparity d = u_l - u_r = +shift > 0 => valid depth). Consecutive frames
    overlap, so stereo AND temporal matching + RANSAC all run on real
    correspondences — the full reference per-frame path.
    """
    span = w + 2 * 32 + shift + step * n_frames
    base = rng.uniform(0, 255, (h // 8, span // 8 + 2)).astype(np.float32)
    base = np.kron(base, np.ones((8, 8), np.float32))[:h, :span]
    out = []
    for i in range(n_frames):
        o = 32 + step * i
        out.append((base[:, o : o + w], base[:, o + shift : o + shift + w]))
    return out


# ------------------------------------------------------------------ front end
def frontend_frame(cv2, img_l, img_r, prev, state):
    """One reference front-end frame. Returns (per-stage ms dict, new prev)."""
    t = {}

    def tick(name, t0):
        t[name] = t.setdefault(name, 0.0) + (time.perf_counter() - t0) * 1e3

    t0 = time.perf_counter()
    c_l = cv2.goodFeaturesToTrack(img_l, 1000, 0.01, 10, blockSize=5)
    c_r = cv2.goodFeaturesToTrack(img_r, 1000, 0.01, 10, blockSize=5)
    tick("detect", t0)

    t0 = time.perf_counter()
    crit = (cv2.TERM_CRITERIA_EPS + cv2.TERM_CRITERIA_COUNT, 40, 0.001)
    c_l = cv2.cornerSubPix(img_l, c_l, (5, 5), (-1, -1), crit)
    c_r = cv2.cornerSubPix(img_r, c_r, (5, 5), (-1, -1), crit)
    tick("subpix", t0)

    t0 = time.perf_counter()
    kp_l = [cv2.KeyPoint(float(x), float(y), 5) for x, y in c_l.reshape(-1, 2)]
    kp_r = [cv2.KeyPoint(float(x), float(y), 5) for x, y in c_r.reshape(-1, 2)]
    kp_l, d_l = state["orb"].compute(img_l, kp_l)
    kp_r, d_r = state["orb"].compute(img_r, kp_r)
    tick("orb", t0)

    t0 = time.perf_counter()
    knn = state["bf"].knnMatch(d_l, d_r, k=2)
    stereo = [
        m[0] for m in knn
        if len(m) == 2 and m[0].distance < 30
        and m[0].distance / max(m[1].distance, 1e-9) < 0.5
    ]
    tick("stereo_match", t0)

    # Rectified triangulation: z = fx*b/disparity (ref camera_model.cpp:203-228)
    t0 = time.perf_counter()
    fx, cx, cy, b = state["intrinsics"]
    uv_l = np.array([kp_l[m.queryIdx].pt for m in stereo], np.float32).reshape(-1, 2)
    uv_r = np.array([kp_r[m.trainIdx].pt for m in stereo], np.float32).reshape(-1, 2)
    disp = np.maximum(uv_l[:, 0] - uv_r[:, 0], 1e-3) if len(uv_l) else np.zeros(0)
    z = fx * b / np.maximum(disp, 1e-3) if len(uv_l) else np.zeros(0)
    pts = np.stack(
        [(uv_l[:, 0] - cx) * z / fx, (uv_l[:, 1] - cy) * z / fx, z], 1
    ) if len(uv_l) else np.zeros((0, 3))
    keep = (z > 0) & (z < fx * b)
    uv4 = np.concatenate([uv_l, uv_r], 1)[keep] if len(uv_l) else np.zeros((0, 4))
    pts = pts[keep]
    desc = d_l[[m.queryIdx for m in stereo]][keep] if len(stereo) else np.zeros((0, 32), np.uint8)
    tick("triangulate", t0)

    # Temporal matching against the previous frame's left descriptors.
    if prev is not None and len(prev["desc"]) >= 2 and len(desc) >= 2:
        t0 = time.perf_counter()
        knn = state["bf"].knnMatch(desc, prev["desc"], k=2)
        pairs = [
            (m[0].queryIdx, m[0].trainIdx) for m in knn
            if len(m) == 2 and m[0].distance < 30
            and m[0].distance / max(m[1].distance, 1e-9) < 0.5
        ]
        tick("temporal_match", t0)

        if len(pairs) >= 10:
            t0 = time.perf_counter()
            qi = np.array([p[0] for p in pairs])
            ti = np.array([p[1] for p in pairs])
            ransac_rigid(
                pts[qi], prev["pts"][ti], uv4[qi], prev["uv4"][ti], state
            )
            tick("ransac", t0)

    return t, {"desc": desc, "pts": pts, "uv4": uv4}


def ransac_rigid(pts_c, pts_p, uv_c, uv_p, state, iters=100):
    """Reference RANSAC envelope (ref params.h:18-27): 100 hypotheses from
    minimal sets of 3, Horn/Kabsch closed-form alignment, scored by stereo
    reprojection error over all pairs. Vectorized across hypotheses — the
    reference loops sequentially in C++, so this is an upper bound on its
    speed."""
    rng = state["rng"]
    n = len(pts_c)
    fx, cx, cy, b = state["intrinsics"]
    sets = rng.integers(0, n, (iters, 3))
    A = pts_c[sets]  # [K,3,3] curr
    B = pts_p[sets]  # [K,3,3] prev
    Am = A - A.mean(1, keepdims=True)
    Bm = B - B.mean(1, keepdims=True)
    H = np.einsum("kij,kil->kjl", Am, Bm)
    U, _, Vt = np.linalg.svd(H)
    d = np.sign(np.linalg.det(np.einsum("kij,kjl->kil", U, Vt).transpose(0, 2, 1)))
    S = np.tile(np.eye(3, dtype=np.float64), (iters, 1, 1))
    S[:, 2, 2] = d
    R = np.einsum("kij,kjl,klm->kmi", U, S, Vt)  # [K,3,3] rotation
    tvec = B.mean(1) - np.einsum("kij,kj->ki", R, A.mean(1))
    # Score: project transformed curr pts into prev stereo views.
    Xp = np.einsum("kij,nj->kni", R, pts_c) + tvec[:, None, :]
    zc = np.maximum(Xp[..., 2], 1e-6)
    ul = fx * Xp[..., 0] / zc + cx
    vl = fx * Xp[..., 1] / zc + cy
    ur = fx * (Xp[..., 0] - b) / zc + cx
    err = (
        np.abs(ul - uv_p[None, :, 0]) + np.abs(vl - uv_p[None, :, 1])
        + np.abs(ur - uv_p[None, :, 2])
    )
    inliers = (err < 3.0).sum(1)
    return int(inliers.argmax())


def measure_frontend(frames=30):
    import cv2

    state = {
        "orb": cv2.ORB_create(1000),
        "bf": cv2.BFMatcher(cv2.NORM_HAMMING),
        "intrinsics": (718.856, 607.1928, 185.2157, 0.5371657),
        "rng": np.random.default_rng(0),
    }
    seq = synth_sequence(np.random.default_rng(0), frames + 2)
    imgs = [(il.astype(np.uint8), ir.astype(np.uint8)) for il, ir in seq]

    prev = None
    stage_ms = {}
    per_frame = []
    for i in range(frames + 2):
        il, ir = imgs[i]
        t0 = time.perf_counter()
        t, prev = frontend_frame(cv2, il, ir, prev, state)
        dt = (time.perf_counter() - t0) * 1e3
        if i >= 2:  # warmup
            per_frame.append(dt)
            for k, v in t.items():
                stage_ms[k] = stage_ms.get(k, 0.0) + v
    n = len(per_frame)
    return {
        "frontend_ms_per_frame_median": round(float(np.median(per_frame)), 2),
        "frontend_ms_per_frame_mean": round(float(np.mean(per_frame)), 2),
        "frontend_fps": round(1e3 / float(np.median(per_frame)), 2),
        "stage_ms": {k: round(v / n, 2) for k, v in sorted(stage_ms.items())},
        "frames_timed": n,
    }


# ------------------------------------------------------------------------- BA
def measure_ba(C=200, P=20000, obs_per_cam=600, iters=3):
    """One Schur-LM iteration, the Ceres SPARSE_SCHUR per-iteration kernel
    (ref bundle_adjuster.cpp:23-27): residuals + analytic Jacobians for the
    4-residual stereo cost (ref reprojection_error.h:20-38), normal-equation
    blocks, point marginalization, sparse Cholesky on the reduced camera
    system, back-substitution. Vectorized NumPy + scipy.sparse (double
    precision like Ceres)."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    rng = np.random.default_rng(0)
    fx, cx, cy, b = 718.856, 607.1928, 185.2157, 0.5371657
    O = C * obs_per_cam
    pts = np.stack(
        [rng.uniform(-20, 20, P), rng.uniform(-5, 5, P), rng.uniform(5, 60, P)], 1
    )
    obs_cam = np.repeat(np.arange(C), obs_per_cam)
    obs_point = rng.integers(0, P, O)
    # Ground-truth-ish observations with noise (identical distribution to
    # bench.py's BA problem).
    X = pts[obs_point]
    ul = fx * X[:, 0] / X[:, 2] + cx
    vl = fx * X[:, 1] / X[:, 2] + cy
    ur = fx * (X[:, 0] - b) / X[:, 2] + cx
    obs = np.stack([ul, vl, ur, vl], 1) + rng.normal(0, 0.5, (O, 4))

    def lm_iteration():
        # Identity camera poses (angle-axis ~ 0): J_point and J_cam analytic.
        Xo = pts[obs_point]
        z = Xo[:, 2]
        inv_z = 1.0 / z
        # residuals
        r = np.stack(
            [
                fx * Xo[:, 0] * inv_z + cx - obs[:, 0],
                fx * Xo[:, 1] * inv_z + cy - obs[:, 1],
                fx * (Xo[:, 0] - b) * inv_z + cx - obs[:, 2],
                fx * Xo[:, 1] * inv_z + cy - obs[:, 3],
            ],
            1,
        )
        # d(proj)/d(point) for the 4 residuals  [O,4,3]
        Jp = np.zeros((O, 4, 3))
        Jp[:, 0, 0] = fx * inv_z
        Jp[:, 0, 2] = -fx * Xo[:, 0] * inv_z**2
        Jp[:, 1, 1] = fx * inv_z
        Jp[:, 1, 2] = -fx * Xo[:, 1] * inv_z**2
        Jp[:, 2, 0] = fx * inv_z
        Jp[:, 2, 2] = -fx * (Xo[:, 0] - b) * inv_z**2
        Jp[:, 3, 1] = fx * inv_z
        Jp[:, 3, 2] = -fx * Xo[:, 1] * inv_z**2
        # d(point-in-cam)/d(cam 6dof): [I | -[X]x] => chain through Jp  [O,4,6]
        Xx = np.zeros((O, 3, 3))
        Xx[:, 0, 1] = -Xo[:, 2]
        Xx[:, 0, 2] = Xo[:, 1]
        Xx[:, 1, 0] = Xo[:, 2]
        Xx[:, 1, 2] = -Xo[:, 0]
        Xx[:, 2, 0] = -Xo[:, 1]
        Xx[:, 2, 1] = Xo[:, 0]
        Jc = np.concatenate([np.einsum("oij,ojk->oik", Jp, -Xx), Jp], 2)

        # Normal equation blocks.
        Hpp = np.einsum("ori,orj->oij", Jp, Jp)  # [O,3,3] per-obs
        Hcc = np.einsum("ori,orj->oij", Jc, Jc)  # [O,6,6]
        Hcp = np.einsum("ori,orj->oij", Jc, Jp)  # [O,6,3]
        gp = np.einsum("ori,or->oi", Jp, r)
        gc = np.einsum("ori,or->oi", Jc, r)

        # Reduce per point / per camera.
        Hpp_pt = np.zeros((P, 3, 3))
        np.add.at(Hpp_pt, obs_point, Hpp)
        gp_pt = np.zeros((P, 3))
        np.add.at(gp_pt, obs_point, gp)
        Hcc_cam = np.zeros((C, 6, 6))
        np.add.at(Hcc_cam, obs_cam, Hcc)
        gc_cam = np.zeros((C, 6))
        np.add.at(gc_cam, obs_cam, gc)
        lam = 1e-3
        Hpp_pt += lam * np.eye(3)
        Hpp_inv = np.linalg.inv(Hpp_pt)

        # Schur: S = Hcc - sum_o Hcp Hpp^-1 Hpc  (off-diagonal cam-cam blocks
        # via per-point outer products across its observing cameras).
        W = np.einsum("oij,ojk->oik", Hcp, Hpp_inv[obs_point])  # [O,6,3]
        # S diag blocks
        Sd = Hcc_cam.copy()
        np.add.at(Sd, obs_cam, -np.einsum("oij,okj->oik", W, Hcp))
        # Off-diagonal: pairs of observations of the same point. Build sparse
        # S by outer product over same-point obs pairs (cap pair count for
        # memory; typical O/P=6 -> ~30 pairs/pt).
        order = np.argsort(obs_point, kind="stable")
        op, oc = obs_point[order], obs_cam[order]
        Ws, Hs = W[order], Hcp[order]
        starts = np.searchsorted(op, np.arange(P))
        ends = np.searchsorted(op, np.arange(P) + 1)
        rows, cols, blocks = [], [], []
        # vectorize over pair offsets instead of points
        cnt = ends - starts
        maxc = cnt.max() if len(cnt) else 0
        for a in range(maxc):
            for bb in range(maxc):
                if a == bb:
                    continue
                selp = (cnt > a) & (cnt > bb)
                ia = starts[selp] + a
                ib = starts[selp] + bb
                ok = (ia < ends[selp]) & (ib < ends[selp])
                ia, ib = ia[ok], ib[ok]
                if not len(ia):
                    continue
                rows.append(oc[ia])
                cols.append(oc[ib])
                blocks.append(-np.einsum("oij,okj->oik", Ws[ia], Hs[ib]))
        g_rhs = gc_cam.copy()
        np.add.at(g_rhs, obs_cam, -np.einsum("oij,oj->oi", W, gp_pt[obs_point]))

        # Assemble sparse S (BSR) and solve.
        diag_r = np.arange(C)
        all_r = np.concatenate([diag_r] + [r_ for r_ in rows])
        all_c = np.concatenate([diag_r] + [c_ for c_ in cols])
        all_b = np.concatenate([Sd] + blocks, 0)
        # sum duplicates via coo on block-flattened layout
        S = sp.coo_matrix(
            (
                all_b.reshape(len(all_b), -1).ravel(),
                (
                    np.repeat(all_r * 6, 36) + np.tile(np.repeat(np.arange(6), 6), len(all_r)),
                    np.repeat(all_c * 6, 36) + np.tile(np.tile(np.arange(6), 6), len(all_r)),
                ),
            ),
            shape=(6 * C, 6 * C),
        ).tocsc()
        S = S + lam * sp.eye(6 * C, format="csc")
        dc = spla.splu(S).solve(-g_rhs.ravel())
        # back-substitute points
        dp = np.einsum(
            "pij,pj->pi",
            Hpp_inv,
            -(gp_pt + np.zeros_like(gp_pt)),
        )
        return dc, dp

    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        lm_iteration()
        ts.append(time.perf_counter() - t0)
    best = float(np.min(ts))
    return {
        "ba_lm_iteration_sec": round(best, 3),
        "ba_lm_iterations_per_sec": round(1.0 / best, 3),
        "ba_problem": {"C": C, "P": P, "O": C * obs_per_cam},
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--out", default="BASELINE_MEASURED.json")
    ap.add_argument("--skip-ba", action="store_true")
    args = ap.parse_args()

    import cv2

    result = {
        "what": "reference CPU pipeline measured via cv2+numpy/scipy "
                "(ref src/visual_odometer.cpp:232-289, src/bundle_adjuster.cpp:13-36)",
        "cv2_version": cv2.__version__,
        "cpu": platform.processor() or platform.machine(),
        "image_size": "376x1241",
        "num_features": 1000,
    }
    result.update(measure_frontend(args.frames))
    if not args.skip_ba:
        result.update(measure_ba())
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
