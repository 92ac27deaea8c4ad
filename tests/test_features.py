"""GFTT + pyramidal LK fidelity tests against OpenCV on simulator frames.

The comparison is statistical, not index-by-index (SURVEY.md §7 "Hard parts"):
GFTT is compared as corner-set coverage, LK as endpoint agreement on the same
input corners.
"""

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from video_stabilization_tpu.config import GFTTConfig, LKConfig
from video_stabilization_tpu.ops import build_pyramid
from video_stabilization_tpu.ops.gftt import good_features_to_track, min_eig_response
from video_stabilization_tpu.ops.lk import lk_track
from video_stabilization_tpu.sim import (
    DEFAULT_APP_PARAMS,
    make_default_texture,
    move_right,
    render_frame,
    roll_clockwise,
)

H, W = 360, 640


def sim_pair():
    tex = make_default_texture(jax.random.key(0), size=512)
    pa = DEFAULT_APP_PARAMS
    pb = roll_clockwise(move_right(pa, 0.3), 0.25)  # ~3.2px shift + 0.5 deg
    fa = np.asarray(render_frame(tex, pa, H, W))
    fb = np.asarray(render_frame(tex, pb, H, W))
    ga = cv2.cvtColor(fa, cv2.COLOR_BGR2GRAY)
    gb = cv2.cvtColor(fb, cv2.COLOR_BGR2GRAY)
    return ga, gb


class TestMinEigResponse:
    def test_rank_correlates_with_cv2(self):
        ga, _ = sim_pair()
        ours = np.asarray(min_eig_response(jnp.asarray(ga, jnp.float32)))
        ref = cv2.cornerMinEigenVal(ga, blockSize=3, ksize=3)
        # identical up to a global positive scale -> near-perfect correlation
        inner = (slice(8, -8), slice(8, -8))
        corr = np.corrcoef(ours[inner].ravel(), ref[inner].ravel())[0, 1]
        assert corr > 0.99


class TestGFTT:
    def test_covers_cv2_corners(self):
        ga, _ = sim_pair()
        cfg = GFTTConfig(max_features=1280)
        ours = good_features_to_track(jnp.asarray(ga, jnp.float32), cfg)
        pts = np.asarray(ours.points)[np.asarray(ours.mask)]
        assert len(pts) > 300

        ref = cv2.goodFeaturesToTrack(
            ga, maxCorners=1300, qualityLevel=0.01, minDistance=5,
            mask=None, blockSize=3,
        ).reshape(-1, 2)
        # every strong cv2 corner should have one of ours nearby (<= cell diag)
        from scipy.spatial import cKDTree

        tree = cKDTree(pts)
        d, _ = tree.query(ref[:200])  # 200 strongest cv2 corners
        assert np.median(d) < 4.0
        assert (d < 8.0).mean() > 0.9

    def test_min_spacing_within_cells(self):
        ga, _ = sim_pair()
        ours = good_features_to_track(jnp.asarray(ga, jnp.float32))
        pts = np.asarray(ours.points)[np.asarray(ours.mask)]
        # cell-based suppression: no two corners share a cell => count bounded
        # by number of cells, and average nearest-neighbor spacing >= ~cell/2
        from scipy.spatial import cKDTree

        d, _ = cKDTree(pts).query(pts, k=2)
        assert np.median(d[:, 1]) >= 2.5  # cell=5 at 360p

    def test_jit_static_shapes(self):
        ga, _ = sim_pair()
        f = jax.jit(lambda x: good_features_to_track(x, GFTTConfig(max_features=512)))
        out = f(jnp.asarray(ga, jnp.float32))
        assert out.points.shape == (512, 2)
        assert out.mask.shape == (512,)


class TestLK:
    def test_accuracy_vs_ground_truth(self):
        """Score against the ANALYTIC motion (the referee cv2 never had).

        The SSD-sweep redesign finds global minima where cv2's local Newton
        iterations can lock onto aliased ones, so endpoints are compared to
        the simulator's exact homography; the tracker must be at least as
        accurate as cv2 on the same corners (non-inferiority), and strongly
        accurate in absolute terms.
        """
        from video_stabilization_tpu.motion.similarity import transform_points
        from video_stabilization_tpu.sim import inter_frame_homography

        tex = make_default_texture(jax.random.key(0), size=512)
        pa = DEFAULT_APP_PARAMS
        pb = roll_clockwise(move_right(pa, 0.3), 0.25)
        fa = np.asarray(render_frame(tex, pa, H, W))
        fb = np.asarray(render_frame(tex, pb, H, W))
        ga = cv2.cvtColor(fa, cv2.COLOR_BGR2GRAY)
        gb = cv2.cvtColor(fb, cv2.COLOR_BGR2GRAY)
        h_true = np.asarray(inter_frame_homography(pa, pb, H, W), np.float64)

        corners = cv2.goodFeaturesToTrack(
            ga, maxCorners=200, qualityLevel=0.01, minDistance=10,
            mask=None, blockSize=3,
        ).reshape(-1, 2)
        true_dst = np.asarray(
            transform_points(jnp.asarray(h_true, jnp.float32), jnp.asarray(corners))
        )
        in_frame = (
            (true_dst[:, 0] >= 5) & (true_dst[:, 0] < W - 5)
            & (true_dst[:, 1] >= 5) & (true_dst[:, 1] < H - 5)
        )

        ref_pts, ref_st, _ = cv2.calcOpticalFlowPyrLK(
            ga, gb, corners.reshape(-1, 1, 2), None,
            winSize=(21, 21), maxLevel=3,
            criteria=(cv2.TERM_CRITERIA_COUNT | cv2.TERM_CRITERIA_EPS, 50, 0.01),
            minEigThreshold=1e-4,
        )
        ref_pts = ref_pts.reshape(-1, 2)
        ref_st = ref_st.reshape(-1).astype(bool)

        pyr_a = build_pyramid(jnp.asarray(ga, jnp.float32), 3)
        pyr_b = build_pyramid(jnp.asarray(gb, jnp.float32), 3)
        res = lk_track(pyr_a, pyr_b, jnp.asarray(corners), jnp.ones(len(corners), bool))
        ours_pts = np.asarray(res.points)
        ours_st = np.asarray(res.status)

        sel_ours = ours_st & in_frame
        sel_ref = ref_st & in_frame
        e_ours = np.linalg.norm(ours_pts[sel_ours] - true_dst[sel_ours], axis=-1)
        e_ref = np.linalg.norm(ref_pts[sel_ref] - true_dst[sel_ref], axis=-1)

        assert sel_ours.mean() > 0.8
        assert np.median(e_ours) < 0.5
        assert (e_ours < 2.0).mean() > 0.9
        # non-inferiority vs OpenCV on the identical problem
        assert (e_ours < 0.5).mean() >= (e_ref < 0.5).mean() - 0.05

    def test_known_translation(self):
        ga, _ = sim_pair()
        shift = np.float32([[1, 0, 3.25], [0, 1, -2.5]])
        gb = cv2.warpAffine(ga.astype(np.float32), shift, (W, H)).astype(np.uint8)
        corners = cv2.goodFeaturesToTrack(ga, 150, 0.01, 10).reshape(-1, 2)
        keep = (
            (corners[:, 0] > 30) & (corners[:, 0] < W - 30)
            & (corners[:, 1] > 30) & (corners[:, 1] < H - 30)
        )
        corners = corners[keep]

        pyr_a = build_pyramid(jnp.asarray(ga, jnp.float32), 3)
        pyr_b = build_pyramid(jnp.asarray(gb, jnp.float32), 3)
        res = lk_track(pyr_a, pyr_b, jnp.asarray(corners), jnp.ones(len(corners), bool))
        st = np.asarray(res.status)
        flow = np.asarray(res.points)[st] - corners[st]
        assert st.mean() > 0.8
        np.testing.assert_allclose(np.median(flow, axis=0), [3.25, -2.5], atol=0.1)

    def test_lost_points_flagged(self):
        ga, gb = sim_pair()
        # points in a flat synthetic region + out of bounds
        flat = np.full((H, W), 128, np.uint8)
        pts = np.array([[50.0, 50.0], [630.0, 350.0], [5.0, 5.0]], np.float32)
        pyr_a = build_pyramid(jnp.asarray(flat, jnp.float32), 3)
        pyr_b = build_pyramid(jnp.asarray(flat, jnp.float32), 3)
        res = lk_track(pyr_a, pyr_b, jnp.asarray(pts), jnp.ones(3, bool))
        assert not np.any(np.asarray(res.status))  # no texture -> min-eig fail

    def test_masked_input_stays_masked(self):
        ga, gb = sim_pair()
        pts = np.array([[100.0, 100.0], [200.0, 200.0]], np.float32)
        pyr_a = build_pyramid(jnp.asarray(ga, jnp.float32), 3)
        pyr_b = build_pyramid(jnp.asarray(gb, jnp.float32), 3)
        res = lk_track(pyr_a, pyr_b, jnp.asarray(pts), jnp.asarray([True, False]))
        assert not bool(res.status[1])
        np.testing.assert_allclose(res.points[1], pts[1])  # untouched


class TestCv2ExactTracker:
    def test_matches_cv2_endpoints(self):
        """LKConfig(method='cv2exact') — gradient-descent LK with OpenCV's
        iteration schedule — must agree with cv2.calcOpticalFlowPyrLK
        endpoints to sub-0.1px median on identical corners (the fidelity
        referee used by bench.py's reference-compat drift gate)."""
        from video_stabilization_tpu.sim import move_right

        tex = make_default_texture(jax.random.key(0), size=512)
        pa = DEFAULT_APP_PARAMS
        pb = roll_clockwise(move_right(pa, 0.3), 0.25)
        ga = cv2.cvtColor(np.asarray(render_frame(tex, pa, H, W)), cv2.COLOR_BGR2GRAY)
        gb = cv2.cvtColor(np.asarray(render_frame(tex, pb, H, W)), cv2.COLOR_BGR2GRAY)
        corners = cv2.goodFeaturesToTrack(ga, 150, 0.01, 10).reshape(-1, 2)
        ref_pts, ref_st, _ = cv2.calcOpticalFlowPyrLK(
            ga, gb, corners.reshape(-1, 1, 2), None, winSize=(21, 21),
            maxLevel=3,
            criteria=(cv2.TERM_CRITERIA_COUNT | cv2.TERM_CRITERIA_EPS, 50, 0.01),
            minEigThreshold=1e-4,
        )
        ref_pts = ref_pts.reshape(-1, 2)
        ref_st = ref_st.reshape(-1).astype(bool)

        pyr_a = build_pyramid(jnp.asarray(ga, jnp.float32), 3)
        pyr_b = build_pyramid(jnp.asarray(gb, jnp.float32), 3)
        res = lk_track(pyr_a, pyr_b, jnp.asarray(corners),
                       jnp.ones(len(corners), bool), LKConfig(method="cv2exact"))
        sel = np.asarray(res.status) & ref_st
        d = np.linalg.norm(np.asarray(res.points)[sel] - ref_pts[sel], axis=-1)
        assert sel.sum() > 100
        assert np.median(d) < 0.05
        assert (d < 0.2).mean() > 0.85
