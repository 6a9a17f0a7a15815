"""Kernel parity tests (SURVEY.md section 5, item 2): every Pallas kernel vs
its jax.numpy reference on random inputs. On CPU these run the kernels under
the Pallas interpreter; the TPU-compiled path is exercised by bench.py and
the TPU smoke script (benchmarks/tpu_smoke.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sert_tpu.ops.exact_topk import exact_topk
from sert_tpu.ops.score_binmax import LANES, score_binmax


def _data(rng, Q=8, E=1000, d=32):
    R = jnp.asarray(rng.normal(size=(Q, d)).astype(np.float32))
    M = jnp.asarray(rng.normal(size=(E, d)).astype(np.float32))
    return R, M


def _ref_scores(R, M, bias=None, alpha=None):
    s = np.asarray(R, np.float32).astype(np.float64) @ np.asarray(
        M, np.float32).astype(np.float64).T
    if bias is not None:
        a = np.ones(s.shape[0]) if alpha is None else np.asarray(alpha)
        s = s + a[:, None] * np.asarray(bias)[None, :]
    return s


def _bf16_tol(s_ref):
    # kernel multiplies in bf16: |err| <~ d * |x|max^2 * 2^-8
    return 0.05


class TestScoreBinmax:
    @pytest.mark.parametrize("E", [256, 1000, 2048, 2049])
    def test_matches_reference(self, E):
        rng = np.random.default_rng(E)
        R, M = _data(rng, E=E)
        bins = np.asarray(score_binmax(R, M))
        s = _ref_scores(R.astype(jnp.bfloat16).astype(jnp.float32),
                        M.astype(jnp.bfloat16).astype(jnp.float32))
        n_bins = -(-E // LANES)
        assert bins.shape == (8, n_bins)
        for b in range(n_bins):
            lo, hi = b * LANES, min((b + 1) * LANES, E)
            want = s[:, lo:hi].max(axis=1)
            # tail bin may be inflated by padding: only >= is guaranteed
            if hi - lo < LANES:
                assert (bins[:, b] >= want - _bf16_tol(s)).all()
            else:
                np.testing.assert_allclose(bins[:, b], want,
                                           atol=_bf16_tol(s))

    def test_bias_and_alpha(self):
        rng = np.random.default_rng(0)
        R, M = _data(rng, E=512)
        bias = jnp.asarray(rng.normal(size=512).astype(np.float32))
        alpha = jnp.asarray(rng.integers(1, 5, size=8).astype(np.float32))
        bins = np.asarray(score_binmax(R, M, bias, alpha))
        s = _ref_scores(R.astype(jnp.bfloat16).astype(jnp.float32),
                        M.astype(jnp.bfloat16).astype(jnp.float32),
                        bias, alpha)
        want = s.reshape(8, 4, LANES).max(axis=-1)
        np.testing.assert_allclose(bins, want, atol=_bf16_tol(s))


class TestExactTopk:
    @pytest.mark.parametrize("E,k", [(1000, 10), (2048, 100), (300, 50)])
    def test_exact_vs_dense(self, E, k):
        """The bf16 prefilter only PRUNES; the rescore uses original fp32
        inputs, so results must match the fp32 dense oracle (mismatches
        allowed only inside prefilter noise at the boundary)."""
        rng = np.random.default_rng(E + k)
        R, M = _data(rng, E=E)
        got_s, got_i = exact_topk(R, M, k=k)
        dense = _ref_scores(R, M).astype(np.float32)
        want_i = np.argsort(-dense, axis=1)[:, :k]
        want_s = np.take_along_axis(dense, want_i, axis=1)
        got_from_dense = np.take_along_axis(dense, np.asarray(got_i), axis=1)
        np.testing.assert_allclose(np.asarray(got_s), got_from_dense,
                                   rtol=1e-5, atol=1e-5)  # scores are honest
        # ranking: allow index mismatch only within bf16 prefilter noise
        miss = (np.asarray(got_i) != want_i)
        if miss.any():
            d_scores = np.abs(got_from_dense[miss] - want_s[miss])
            assert d_scores.max() < 0.1

    def test_with_bias(self):
        rng = np.random.default_rng(5)
        R, M = _data(rng, E=640)
        bias = jnp.asarray(rng.normal(size=640).astype(np.float32) * 3)
        alpha = jnp.asarray(np.full(8, 2.0, np.float32))
        got_s, got_i = exact_topk(R, M, bias=bias, alpha=alpha, k=20)
        Rb = R.astype(jnp.bfloat16).astype(jnp.float32)
        Mb = M.astype(jnp.bfloat16).astype(jnp.float32)
        dense = np.asarray(jnp.dot(Rb, Mb.T)) + 2.0 * np.asarray(bias)[None, :]
        want_i = np.argsort(-dense, axis=1)[:, :20]
        got_sc = np.take_along_axis(dense, np.asarray(got_i), axis=1)
        want_sc = np.take_along_axis(dense, want_i, axis=1)
        np.testing.assert_allclose(got_sc, want_sc, rtol=1e-3, atol=2e-2)

    def test_k_clamped(self):
        rng = np.random.default_rng(6)
        R, M = _data(rng, E=200)
        s, i = exact_topk(R, M, k=500)
        assert s.shape == (8, 200)
        # every entity present exactly once
        assert (np.sort(np.asarray(i), axis=1) == np.arange(200)).all()
