"""Descriptor-quality parity vs OpenCV's ORB (VERDICT round-1 item 7).

ops/orb.py deliberately uses a seeded isotropic test pattern instead of
OpenCV's learned `bit_pattern_31_` (see its module docstring). This test
pins the design bet: on identical corners, matching recall with our
descriptors must be within 5% of cv2.ORB's (reference descriptor stage:
ref src/visual_odometer.cpp:256-259).

Protocol: a PlaneScene under pure lateral translation gives EXACT uniform
ground truth for every pixel (stereo disparity fx*b/z, temporal flow
dx*fx/z), so a match is verifiably correct regardless of which texture
corner it sits on. Both descriptor families run through the same numpy
brute-force matcher on the same corners.
"""

import numpy as np
import pytest

from synth import PlaneScene

cv2 = pytest.importorskip("cv2")


def _our_descriptors(img, xy, valid):
    import jax.numpy as jnp

    from stereo_orb_slam_tpu.ops import orb

    d, _ = orb.compute_descriptors(jnp.asarray(img), jnp.asarray(xy),
                                   jnp.asarray(valid))
    # bitpacked uint32[N,8] -> uint8[N,32] for the shared matcher
    return np.asarray(d).view(np.uint8).reshape(len(xy), 32)


def _cv2_descriptors(img, xy, valid, shuffle_rng=None):
    """cv2.ORB descriptors re-associated by a coordinate hash-map join:
    cv2 drops border keypoints and gives no order guarantee, so a
    positional walk silently zeroes rows if it ever reorders (r2 verdict
    weak #6). `shuffle_rng` feeds the keypoints in a random order to PROVE
    order-independence (test_cv2_join_order_independent)."""
    orb_cv = cv2.ORB_create(nfeatures=len(xy))
    order = np.arange(len(xy))
    if shuffle_rng is not None:
        shuffle_rng.shuffle(order)
    kps = [cv2.KeyPoint(float(xy[i][0]), float(xy[i][1]), 31) for i in order]
    img8 = np.clip(img, 0, 255).astype(np.uint8)
    kept, desc = orb_cv.compute(img8, kps)
    out = np.zeros((len(xy), 32), np.uint8)
    ok = np.zeros(len(xy), bool)
    if desc is None:
        return out, ok
    lut = {(round(k.pt[0], 2), round(k.pt[1], 2)): j
           for j, k in enumerate(kept)}
    for i, (x, y) in enumerate(xy):
        j = lut.get((round(float(x), 2), round(float(y), 2)))
        if j is not None:
            out[i] = desc[j]
            ok[i] = True
    return out, ok & valid


def test_cv2_join_order_independent(rng):
    """The hash-map join must yield identical rows however cv2 orders its
    output (fed shuffled keypoints as the adversarial case)."""
    import jax.numpy as jnp

    from stereo_orb_slam_tpu.ops import detect

    scene = PlaneScene(rng)
    img = scene.render(0.0)
    xy, _, v = detect.detect_corners(jnp.asarray(img), num_features=128)
    xy, v = np.asarray(xy), np.asarray(v)
    d0, ok0 = _cv2_descriptors(img, xy, v)
    d1, ok1 = _cv2_descriptors(img, xy, v, np.random.default_rng(5))
    assert ok0.sum() > 50
    np.testing.assert_array_equal(ok0, ok1)
    np.testing.assert_array_equal(d0, d1)


def _match_recall(d_q, ok_q, d_t, ok_t, gt_du, gt_dv, xy_q, xy_t, ratio=0.8):
    """Brute-force Hamming kNN(2) + ratio test; recall = correct / queries."""
    bits_q = np.unpackbits(d_q, axis=1).astype(np.int32)
    bits_t = np.unpackbits(d_t, axis=1).astype(np.int32)
    # Hamming via dot products on +-1 representation.
    dist = (bits_q[:, None, :] != bits_t[None, :, :]).sum(-1)
    dist = np.where(ok_t[None, :], dist, 10 ** 6)
    n_q = len(d_q)
    correct = 0
    queries = 0
    for i in range(n_q):
        if not ok_q[i]:
            continue
        order = np.argsort(dist[i])
        d1, d2 = dist[i][order[0]], dist[i][order[1]]
        if d1 >= 10 ** 6:
            continue
        queries += 1
        if d2 > 0 and d1 / max(d2, 1) > ratio:
            continue
        j = order[0]
        du = xy_q[i, 0] - xy_t[j, 0]
        dv = xy_q[i, 1] - xy_t[j, 1]
        if abs(du - gt_du) < 1.5 and abs(dv - gt_dv) < 1.5:
            correct += 1
    return correct / max(queries, 1)


def test_matching_recall_within_5pct_of_cv2(rng):
    import jax.numpy as jnp

    from stereo_orb_slam_tpu.ops import detect

    scene = PlaneScene(rng)  # depth 10, fx 200, b 0.5
    img_l = scene.render(0.0)
    img_r = scene.render(0.0, right=True)
    img_t = scene.render(0.3)  # temporal step 0.3 m laterally

    def corners(img):
        xy, _, v = detect.detect_corners(jnp.asarray(img), num_features=384)
        return np.asarray(xy), np.asarray(v)

    xy_l, v_l = corners(img_l)
    xy_r, v_r = corners(img_r)
    xy_t, v_t = corners(img_t)

    results = {}
    for name, desc_fn in (("ours", _our_descriptors),
                          ("cv2", lambda i, x, v: _cv2_descriptors(i, x, v))):
        if name == "ours":
            d_l, ok_l = desc_fn(img_l, xy_l, v_l), v_l
            d_r, ok_r = desc_fn(img_r, xy_r, v_r), v_r
            d_t, ok_t = desc_fn(img_t, xy_t, v_t), v_t
            d_l, d_r, d_t = d_l, d_r, d_t
        else:
            d_l, ok_l = _cv2_descriptors(img_l, xy_l, v_l)
            d_r, ok_r = _cv2_descriptors(img_r, xy_r, v_r)
            d_t, ok_t = _cv2_descriptors(img_t, xy_t, v_t)
        # GT: right view content sits at u - fx*b/z; temporal at u - dx*fx/z.
        disp = scene.fx * scene.baseline / scene.depth       # 10 px
        flow = 0.3 * scene.fx / scene.depth                  # 6 px
        stereo = _match_recall(d_l, ok_l, d_r, ok_r, disp, 0.0, xy_l, xy_r)
        temporal = _match_recall(d_l, ok_l, d_t, ok_t, flow, 0.0, xy_l, xy_t)
        results[name] = (stereo, temporal)

    s_ours, t_ours = results["ours"]
    s_cv2, t_cv2 = results["cv2"]
    # Sanity: both descriptor families must actually work on this scene.
    assert s_cv2 > 0.5 and t_cv2 > 0.5, results
    assert s_ours >= s_cv2 - 0.05, f"stereo recall: {results}"
    assert t_ours >= t_cv2 - 0.05, f"temporal recall: {results}"
