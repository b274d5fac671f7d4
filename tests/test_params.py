import numpy as np
import pytest

import jax.numpy as jnp

from lcgp_tpu.models import params as P

# pre-commit smoke set: oracle-parity + model-API (pytest -m quick, <3 min)
pytestmark = pytest.mark.quick


class TestSoftClip:
    @pytest.mark.parametrize('clip', [P.LLMB_CLIP, P.LLMB0_CLIP, P.LNUG_CLIP])
    def test_range(self, clip):
        x = np.linspace(-50, 50, 201)
        y = np.asarray(clip.forward(x))
        # strict bounds up to fp saturation at the clip edges
        assert (y >= clip.low).all() and (y <= clip.high).all()
        assert (np.diff(y) >= 0).all()

    @pytest.mark.parametrize('clip', [P.LLMB_CLIP, P.LLMB0_CLIP, P.LNUG_CLIP])
    def test_inverse_roundtrip(self, clip):
        # forward(inverse(y)) == y across the constrained range
        lo, hi = clip.low, clip.high
        y = lo + (hi - lo) * np.linspace(1e-6, 1 - 1e-6, 101)
        x = np.asarray(clip.inverse(y))
        assert np.isfinite(x).all()
        y2 = np.asarray(clip.forward(x))
        np.testing.assert_allclose(y2, y, rtol=1e-9, atol=1e-12)

    def test_identity_in_interior(self):
        clip = P.SoftClip(0.0, 100.0)
        np.testing.assert_allclose(np.asarray(clip.forward(50.0)), 50.0,
                                   rtol=1e-12)

    def test_extreme_bounds_no_overflow(self):
        clip = P.LLMB_CLIP  # [1e-6, 1e4]
        vals = np.array([1e-5, 1.0, 9.9e3])
        x = np.asarray(clip.inverse(vals))
        assert np.isfinite(x).all()
        np.testing.assert_allclose(np.asarray(clip.forward(x)), vals, rtol=1e-9)


class TestSigmaMap:
    def test_expand(self):
        idx = P.sigma_index_map([2, 1, 3])
        np.testing.assert_array_equal(idx, [0, 0, 1, 2, 2, 2])
        out = np.asarray(P.expand_sigma(jnp.array([10.0, 20.0, 30.0]), idx))
        np.testing.assert_allclose(out, [10, 10, 20, 30, 30, 30])


class TestInit:
    def test_reference_formulas(self):
        """Mirror reference init_params (lcgp.py:490-513)."""
        rng = np.random.default_rng(0)
        x = rng.uniform(0, 1, (50, 3))
        y = rng.standard_normal((4, 50)) * 2.0
        q = 2
        err = [2, 2]
        free = P.init_values(x, y, q, err)
        lLmb, lLmb0, lsig, lnug = P.constrain(free)

        llmb_expected = np.exp(0.5 * np.log(3) + np.log(x.std(axis=0)))
        np.testing.assert_allclose(np.asarray(lLmb),
                                   np.tile(llmb_expected, (q, 1)), rtol=1e-9)
        np.testing.assert_allclose(np.asarray(lLmb0), np.ones(q), rtol=1e-9)
        np.testing.assert_allclose(np.asarray(lnug),
                                   np.exp(-10) * np.ones(q), rtol=1e-9)
        np.testing.assert_allclose(
            np.asarray(lsig),
            [np.log(np.var(y[0:2])), np.log(np.var(y[2:4]))], rtol=1e-9)
