"""Preprocessing filter fidelity vs OpenCV."""

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from video_stabilization_tpu.ops.filters import (
    clahe,
    median_blur,
    preprocess_for_registration,
    sharpen3,
)


def rand_u8(rng, h=96, w=128):
    return rng.integers(0, 256, (h, w), np.uint8)


class TestMedian:
    def test_matches_cv2(self, rng):
        img = rand_u8(rng)
        ours = np.asarray(median_blur(jnp.asarray(img, jnp.float32), 5))
        ref = cv2.medianBlur(img, 5).astype(np.float32)
        inner = (slice(2, -2), slice(2, -2))
        np.testing.assert_array_equal(ours[inner], ref[inner])

    def test_borders_close(self, rng):
        img = rand_u8(rng, 32, 32)
        ours = np.asarray(median_blur(jnp.asarray(img, jnp.float32), 5))
        ref = cv2.medianBlur(img, 5).astype(np.float32)
        # border rows: replicate-pad median may differ slightly from cv2's
        # specialized border handling; demand near-equality
        assert np.median(np.abs(ours - ref)) == 0
        assert (ours == ref).mean() > 0.9


class TestSharpen:
    def test_matches_cv2(self, rng):
        img = rand_u8(rng).astype(np.float32)
        k = np.array([[0, -1, 0], [-1, 5, -1], [0, -1, 0]], np.float32)
        ref = cv2.filter2D(img, -1, k)
        ours = np.asarray(sharpen3(jnp.asarray(img)))
        np.testing.assert_allclose(ours, ref, atol=1e-3)


class TestClahe:
    def test_matches_cv2(self, rng):
        img = rand_u8(rng, 120, 160)
        # blur first so histograms aren't pathological white noise
        img = cv2.GaussianBlur(img, (5, 5), 1.5)
        ref = cv2.createCLAHE(clipLimit=2.0, tileGridSize=(8, 8)).apply(img)
        ours = np.asarray(clahe(jnp.asarray(img, jnp.float32), 2.0, (8, 8)))
        diff = np.abs(ours - ref.astype(np.float32))
        assert np.median(diff) <= 1.0
        assert (diff <= 2.0).mean() > 0.95

    def test_divisible_size(self, rng):
        img = rand_u8(rng, 128, 128)
        img = cv2.GaussianBlur(img, (5, 5), 1.5)
        ref = cv2.createCLAHE(clipLimit=2.0, tileGridSize=(8, 8)).apply(img)
        ours = np.asarray(clahe(jnp.asarray(img, jnp.float32), 2.0, (8, 8)))
        assert (np.abs(ours - ref.astype(np.float32)) <= 2.0).mean() > 0.97

    def test_uniform_image_unchanged(self):
        img = np.full((64, 64), 100, np.uint8)
        out = np.asarray(clahe(jnp.asarray(img, jnp.float32)))
        # equalizing a constant image must stay (nearly) constant
        assert np.ptp(out) <= 1.0


class TestChain:
    def test_runs_and_jits(self, rng):
        img = jnp.asarray(rand_u8(rng, 90, 160), jnp.float32)
        f = jax.jit(preprocess_for_registration)
        out = f(img)
        assert out.shape == img.shape
        assert np.isfinite(np.asarray(out)).all()
