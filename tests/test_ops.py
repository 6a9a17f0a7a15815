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

    def test_packed_winners_trigger_exact_fallback(self):
        """Adversarial case for the hierarchical final selection: >m true
        winners packed into ONE 128-entity bin (duplicated vectors) must
        still return the exact top-k via the verified fallback."""
        rng = np.random.default_rng(8)
        d, E, k = 16, 640, 30
        M = rng.normal(size=(E, d)).astype(np.float32) * 0.01
        q = rng.normal(size=(d,)).astype(np.float32)
        # plant 40 near-identical high-scoring entities inside bin 2
        lo = 2 * 128
        M[lo:lo + 40] = (q / np.linalg.norm(q))[None, :] * 10.0
        M[lo:lo + 40] += rng.normal(size=(40, d)).astype(np.float32) * 1e-4
        R = jnp.asarray(np.stack([q] * 8))
        got_s, got_i = exact_topk(R, jnp.asarray(M), k=k)
        dense = np.asarray(R @ jnp.asarray(M).T)
        want_i = np.argsort(-dense, axis=1)[:, :k]
        want_s = np.take_along_axis(dense, want_i, axis=1)
        np.testing.assert_allclose(np.sort(np.asarray(got_s), axis=1),
                                   np.sort(want_s, axis=1), rtol=1e-5,
                                   atol=1e-5)
        # all 30 winners come from the packed bin
        assert set(np.asarray(got_i)[0]) == set(want_i[0])

    def test_k_clamped(self):
        rng = np.random.default_rng(6)
        R, M = _data(rng, E=200)
        s, i = exact_topk(R, M, k=500)
        assert s.shape == (8, 200)
        # every entity present exactly once
        assert (np.sort(np.asarray(i), axis=1) == np.arange(200)).all()

    @pytest.mark.parametrize("with_bias", [False, True])
    def test_clustered_layout_matches_natural(self, with_bias):
        """layout="clustered" permutes the staged rows; results must be
        IDENTICAL to the natural layout (indices mapped back, bias paired
        with the permuted rows in both kernels)."""
        from sert_tpu.ops.exact_topk import (exact_topk_prepared,
                                             prepare_entities)
        rng = np.random.default_rng(17)
        R, M = _data(rng, E=1500)
        bias = (jnp.asarray(rng.normal(size=1500).astype(np.float32))
                if with_bias else None)
        alpha = (jnp.asarray(np.full(8, 1.5, np.float32))
                 if with_bias else None)
        nat = prepare_entities(M)
        clu = prepare_entities(M, layout="clustered")
        assert clu.perm is not None and sorted(np.asarray(clu.perm)) == \
            list(range(1500))
        s0, i0 = exact_topk_prepared(R, nat, bias, alpha, k=40)
        s1, i1 = exact_topk_prepared(R, clu, bias, alpha, k=40)
        np.testing.assert_allclose(np.asarray(s0), np.asarray(s1),
                                   rtol=1e-5, atol=1e-5)
        # continuous random scores: winners are unique -> same entities
        np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))

    @pytest.mark.parametrize("na", [2, 64])
    def test_adaptive_bins_exact_both_branches(self, na):
        """adaptive_bins must be exact whether the quick path suffices
        (large na) or the verified fallback fires (tiny na)."""
        from sert_tpu.ops.exact_topk import (exact_topk_prepared,
                                             prepare_entities)
        rng = np.random.default_rng(100 + na)
        R, M = _data(rng, E=2048)
        prep = prepare_entities(M, layout="clustered")
        s0, i0 = exact_topk_prepared(R, prep, k=30)
        s1, i1 = exact_topk_prepared(R, prep, k=30, adaptive_bins=na)
        np.testing.assert_allclose(np.asarray(s0), np.asarray(s1),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))

    @pytest.mark.slow
    def test_adaptive_bins_fuzz(self):
        from sert_tpu.ops.exact_topk import (exact_topk_prepared,
                                             prepare_entities)
        rng = np.random.default_rng(7)
        for trial in range(6):
            E = int(rng.integers(300, 3000))
            k = int(rng.integers(5, 80))
            na = int(rng.integers(1, k + 12))
            layout = "clustered" if trial % 2 else "natural"
            R, M = _data(rng, Q=4, E=E)
            prep = prepare_entities(M, layout=layout)
            s0, i0 = exact_topk_prepared(R, prep, k=k)
            s1, i1 = exact_topk_prepared(R, prep, k=k, adaptive_bins=na)
            np.testing.assert_allclose(np.asarray(s0), np.asarray(s1),
                                       rtol=1e-5, atol=1e-5,
                                       err_msg=f"E={E} k={k} na={na}")
            np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))


class TestPrepSweepTileConsistency:
    """Regression: the sweep tile size must come from the prepare stage.

    prepare_binmax_matrix pads entity rows to a multiple of ITS te; a sweep
    run with a LARGER te floors the grid and silently skips the tail rows —
    their bins read back as uninitialized memory (NaN under the
    interpreter, garbage on HBM), so true winners living there are lost."""

    def test_non_default_prep_te_keeps_tail_rows(self):
        # E=5000 pads to 6144 under te=2048 — an odd multiple of 2048, NOT
        # a multiple of the old hardcoded sweep te=4096, which dropped rows
        # 4096..4999. Winners planted there must be found.
        from sert_tpu.ops.exact_topk import (exact_topk_prepared,
                                             prepare_entities)
        rng = np.random.default_rng(11)
        d, E, k = 32, 5000, 10
        M = rng.normal(size=(E, d)).astype(np.float32) * 0.01
        q = rng.normal(size=(d,)).astype(np.float32)
        M[4500:4500 + k] = (q / np.linalg.norm(q))[None, :] * 5.0
        R = jnp.asarray(np.stack([q] * 8))
        prep = prepare_entities(jnp.asarray(M), te=2048)
        assert prep.te == 2048
        got_s, got_i = exact_topk_prepared(R, prep, k=k)
        assert np.isfinite(np.asarray(got_s)).all()
        assert set(np.asarray(got_i)[0]) == set(range(4500, 4500 + k))

    def test_mismatched_sweep_te_rejected(self):
        from sert_tpu.ops.score_binmax import (prepare_binmax_matrix,
                                               score_binmax_prepared)
        M = jnp.zeros((5000, 32), jnp.float32)
        Mp = prepare_binmax_matrix(M, te=2048)   # 6144 rows
        with pytest.raises(ValueError, match="multiple of te"):
            score_binmax_prepared(jnp.zeros((4, 32), jnp.float32), Mp,
                                  5000, te=4096)


class TestFusedXent:
    def _ref(self, pooled, W, b, labels, layout):
        z = (pooled @ W if layout == "de" else pooled @ W.T) + b
        lse = jax.scipy.special.logsumexp(z, axis=-1)
        gold = jnp.take_along_axis(z, labels[:, None], axis=1)[:, 0]
        return jnp.sum(lse - gold)

    @pytest.mark.parametrize("layout", ["de", "ed"])
    @pytest.mark.parametrize("B,d,E", [(20, 24, 300), (8, 128, 256)])
    def test_loss_and_grads_match_xla(self, layout, B, d, E):
        from sert_tpu.ops.xent import xent_loss
        rng = np.random.default_rng(B + E)
        pooled = jnp.asarray(rng.normal(size=(B, d)).astype(np.float32))
        Wde = jnp.asarray(rng.normal(size=(d, E)).astype(np.float32) * 0.3)
        W = Wde if layout == "de" else Wde.T
        b = jnp.asarray(rng.normal(size=(E,)).astype(np.float32) * 0.1)
        labels = jnp.asarray(rng.integers(0, E, size=B).astype(np.int32))
        f = lambda p, W, b: xent_loss(p, W, b, labels, layout, 8, 128)
        r = lambda p, W, b: self._ref(p, W, b, labels, layout)
        assert float(f(pooled, W, b)) == pytest.approx(
            float(r(pooled, W, b)), rel=1e-5)
        gf = jax.grad(f, argnums=(0, 1, 2))(pooled, W, b)
        gr = jax.grad(r, argnums=(0, 1, 2))(pooled, W, b)
        for a, c in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                       rtol=1e-3, atol=1e-4)

    def test_auto_te_parity(self):
        """te=None (the production default) resolves the VMEM-budgeted
        tile and matches the XLA composition, values and grads."""
        from sert_tpu.ops.xent import xent_loss
        rng = np.random.default_rng(7)
        B, d, E = 16, 48, 700
        pooled = jnp.asarray(rng.normal(size=(B, d)).astype(np.float32))
        W = jnp.asarray(rng.normal(size=(d, E)).astype(np.float32) * 0.3)
        b = jnp.asarray(rng.normal(size=(E,)).astype(np.float32) * 0.1)
        labels = jnp.asarray(rng.integers(0, E, size=B).astype(np.int32))
        f = lambda p, W, b: xent_loss(p, W, b, labels, "de")   # te=None
        r = lambda p, W, b: self._ref(p, W, b, labels, "de")
        assert float(f(pooled, W, b)) == pytest.approx(
            float(r(pooled, W, b)), rel=1e-5)
        gf = jax.grad(f, argnums=(0, 1, 2))(pooled, W, b)
        gr = jax.grad(r, argnums=(0, 1, 2))(pooled, W, b)
        for a, c in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                       rtol=1e-3, atol=1e-4)

    def test_model_losses_match_unfused(self):
        """loglinear + lse_full with fused_softmax='on' equal the XLA path,
        values and gradients."""
        from sert_tpu.models import api
        from sert_tpu.utils.config import ModelConfig
        rng = np.random.default_rng(3)
        batch = {"windows": rng.integers(0, 50, size=(16, 5)).astype(np.int32),
                 "lengths": np.full(16, 5, np.int32),
                 "entities": rng.integers(0, 33, size=16).astype(np.int32)}
        for model in ("loglinear", "lse_full"):
            base = ModelConfig(model=model, vocab_size=50, num_entities=33,
                               word_dim=8, entity_dim=8)
            params = api.init_params(jax.random.key(1), base)
            on = base.replace(fused_softmax="on")
            off = base.replace(fused_softmax="off")
            l_on = float(api.loss_fn(params, batch, on))
            l_off = float(api.loss_fn(params, batch, off))
            assert l_on == pytest.approx(l_off, rel=1e-5), model
            g_on = jax.grad(api.loss_fn)(params, batch, on)
            g_off = jax.grad(api.loss_fn)(params, batch, off)
            for key in g_on:
                np.testing.assert_allclose(np.asarray(g_on[key]),
                                           np.asarray(g_off[key]),
                                           rtol=1e-3, atol=1e-5,
                                           err_msg=f"{model}/{key}")


@pytest.mark.slow
class TestPrefilterTrainedGeometry:
    """Round-2 VERDICT weak item 4: the bf16-prefilter boundary caveat
    (ops/exact_topk.py docstring) was only ever tested on RANDOM matrices,
    whose top-k margins are comfortable. Trained, clustered embeddings are
    the risk case. This trains a real (small) LSE — sibling entities share
    signature terms, so their embeddings converge to near-duplicates with
    sub-bf16 margins — then audits both prefilter dtypes against a float64
    oracle, mirroring the 1M-scale audit (benchmarks/stress_1m.py --audit;
    measured 0 misses on the trained 1M matrix, NOTES.md)."""

    def _train_clustered(self, E=768, V=2048, d=32, group=8, steps=240):
        from sert_tpu.models import api
        from sert_tpu.train.step import init_state, make_train_step
        from sert_tpu.utils.config import ModelConfig, TrainConfig

        cfg = ModelConfig(model="lse", vocab_size=V, num_entities=E,
                          word_dim=d, entity_dim=d,
                          objective="sampled_softmax", num_negatives=64)
        tcfg = TrainConfig(batch_size=256, learning_rate=5e-2,
                           optimizer="adagrad", donate_state=False)
        state = init_state(jax.random.key(0), cfg, tcfg)
        step = make_train_step(cfg, tcfg,
                               noise=jnp.zeros((E,), jnp.float32))
        rng = np.random.default_rng(0)
        n_groups = E // group
        # group g owns an 8-term signature; every entity in g draws windows
        # from it -> siblings become near-duplicate embeddings.
        sig = rng.integers(0, V, size=(n_groups, 8)).astype(np.int32)
        for _ in range(steps):
            ents = rng.integers(0, E, size=256).astype(np.int32)
            g = ents // group
            cols = rng.integers(0, 8, size=(256, 5))
            batch = {"windows": sig[g[:, None], cols].astype(np.int32),
                     "lengths": np.full(256, 5, np.int32),
                     "entities": ents}
            state, _ = step(state, {k: jnp.asarray(v)
                                    for k, v in batch.items()})
        M = api.entity_matrix(state.params, cfg).astype(jnp.float32)
        M = M / jnp.maximum(jnp.linalg.norm(M, axis=-1, keepdims=True), 1e-9)
        # queries: one per group, the signature window itself
        from sert_tpu.models import lse
        qw = jnp.asarray(sig[:, :5])
        R = lse.window_rep(state.params, qw,
                           jnp.full((n_groups,), 5, jnp.int32), cfg)
        R = R / jnp.maximum(jnp.linalg.norm(R, axis=-1, keepdims=True), 1e-9)
        return np.asarray(R), np.asarray(M)

    def test_trained_margins_vs_float64_oracle(self):
        from sert_tpu.ops.exact_topk import (exact_topk_prepared,
                                             prepare_entities)
        k = 24
        R, M = self._train_clustered()
        scores = R.astype(np.float64) @ M.astype(np.float64).T
        order = np.argsort(-scores, axis=1)
        oracle = order[:, :k]
        # sanity: the geometry IS the risk case — the top-k boundary margin
        # must be tiny for a meaningful audit (siblings nearly tie).
        kth = np.take_along_axis(scores, order[:, k - 1:k], axis=1)
        k1 = np.take_along_axis(scores, order[:, k:k + 1], axis=1)
        assert np.median(kth - k1) < 0.05, "generator no longer clustered"

        for dtype, tol in (("bfloat16", 6e-3), ("float32", 1e-5)):
            prep = prepare_entities(jnp.asarray(M), prefilter_dtype=dtype)
            _, idx = exact_topk_prepared(jnp.asarray(R), prep, k=k)
            got = np.asarray(idx)
            for q in range(got.shape[0]):
                miss = set(oracle[q].tolist()) - set(got[q].tolist())
                # a miss is only REAL if its margin below the k-th value
                # exceeds the dtype's resolution-scaled tolerance
                real = [m for m in miss
                        if scores[q, m] < kth[q, 0] - tol]
                assert not real, (
                    f"{dtype} prefilter missed {real} at margins "
                    f"{[float(kth[q, 0] - scores[q, m]) for m in real]}")


class TestAdaptiveAcceptanceMargin:
    """The adaptive two-phase acceptance cut must carry prefilter-dtype
    slack: bf16 bin maxima round, so an unrescored bin whose TRUE max
    beats the provisional theta by less than bf16 resolution would
    otherwise be skipped — unlike bin selection, there is no pad_bins to
    absorb the reshuffle (regression test for the margin)."""

    def test_near_tie_bin_falls_back_not_skipped(self):
        from sert_tpu.ops.exact_topk import (exact_topk_prepared,
                                             prepare_entities)
        d, bw = 8, 128
        # Bin 0: scores 1.0 + i*1e-5 (i = 0..127). Bin 1: one entity at
        # 1.001265 — truly the SECOND best overall, but bf16 collapses
        # every bin-max to 1.0, so a margin-less acceptance cut at
        # theta ~ 1.00124 (the phase-1 k-th) would skip bin 1 entirely.
        s_bin0 = 1.0 + np.arange(128) * 1e-5
        s_bin1 = np.zeros(128)
        s_bin1[0] = 1.001265
        scores = np.concatenate([s_bin0, s_bin1]).astype(np.float32)
        M = np.zeros((256, d), np.float32)
        M[:, 0] = scores
        R = np.zeros((1, d), np.float32)
        R[0, 0] = 1.0
        prep = prepare_entities(jnp.asarray(M))
        assert prep.bin_width == bw
        k = 4
        top_s, top_i = exact_topk_prepared(jnp.asarray(R), prep, k=k,
                                           adaptive_bins=1)
        order = np.argsort(scores)[::-1][:k]
        np.testing.assert_array_equal(np.sort(np.asarray(top_i[0])),
                                      np.sort(order))
        np.testing.assert_allclose(np.asarray(top_s[0]),
                                   np.sort(scores[order])[::-1],
                                   rtol=1e-6, atol=1e-6)

    def test_adaptive_bins_too_small_for_k_raises(self):
        from sert_tpu.ops.exact_topk import (exact_topk_prepared,
                                             prepare_entities)
        rng = np.random.default_rng(3)
        R, M = _data(rng, Q=2, E=2048)
        prep = prepare_entities(M)
        with pytest.raises(ValueError, match="adaptive_bins"):
            exact_topk_prepared(R, prep, k=200, adaptive_bins=1)


class TestSampledLse:
    """ops/sampled_lse: the flash masked-lse over shared sampled-softmax
    candidates (the [B, k] logits never reach HBM) vs the XLA composition
    models/lse.loss_sampled_softmax builds."""

    def _ref(self, reps, cand, corr, ids, pos):
        z = (reps.astype(jnp.float32) @ cand.astype(jnp.float32).T
             - corr[None, :])
        z = jnp.where(ids[None, :] == pos[:, None], -1e30, z)
        return jax.scipy.special.logsumexp(z, axis=-1)

    def _case(self, seed, B, k, d, E=500, hits=True):
        rng = np.random.default_rng(seed)
        reps = jnp.asarray(rng.normal(size=(B, d)).astype(np.float32))
        cand = jnp.asarray(rng.normal(size=(k, d)).astype(np.float32) * 0.3)
        corr = jnp.asarray(rng.normal(size=(k,)).astype(np.float32))
        ids = rng.integers(0, E, size=k).astype(np.int32)
        pos = rng.integers(0, E, size=B).astype(np.int32)
        if hits:  # force accidental hits: some candidates ARE row positives
            ids[: min(B, k)] = pos[: min(B, k)]
        return reps, cand, corr, jnp.asarray(ids), jnp.asarray(pos)

    @pytest.mark.parametrize("B,k,d", [(20, 300, 24), (8, 256, 128),
                                       (16, 129, 40)])
    def test_fwd_and_grads_match_xla(self, B, k, d):
        from sert_tpu.ops.sampled_lse import sampled_lse
        reps, cand, corr, ids, pos = self._case(B + k, B, k, d)
        w = jnp.asarray(np.random.default_rng(1).normal(size=(B,))
                        .astype(np.float32))
        f = lambda r, c, co: jnp.sum(w * sampled_lse(r, c, co, ids, pos,
                                                     8, 128))
        r_ = lambda r, c, co: jnp.sum(w * self._ref(r, c, co, ids, pos))
        np.testing.assert_allclose(np.asarray(f(reps, cand, corr)),
                                   np.asarray(r_(reps, cand, corr)),
                                   rtol=1e-5)
        gf = jax.grad(f, argnums=(0, 1, 2))(reps, cand, corr)
        gr = jax.grad(r_, argnums=(0, 1, 2))(reps, cand, corr)
        for a, c in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                       rtol=1e-3, atol=1e-4)

    def test_auto_te_and_default_tb(self):
        """Production defaults (tb=256, te=None) on a ragged-k case."""
        from sert_tpu.ops.sampled_lse import sampled_lse
        reps, cand, corr, ids, pos = self._case(5, 12, 700, 48)
        out = sampled_lse(reps, cand, corr, ids, pos)
        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(self._ref(reps, cand, corr,
                                                        ids, pos)),
                                   rtol=1e-5)

    def test_all_masked_row_softplus_loss_and_grad_zero(self):
        """A row whose EVERY candidate is an accidental hit contributes
        ~zero loss and exactly-zero gradient through the softplus form the
        model uses (the documented contract; the raw lse is ~-1e30)."""
        from sert_tpu.ops.sampled_lse import sampled_lse
        reps, cand, corr, ids, pos = self._case(9, 6, 40, 16, hits=False)
        ids = jnp.full_like(ids, 7)
        pos = pos.at[2].set(7)  # row 2: all 40 candidates masked
        s_pos = jnp.asarray(np.random.default_rng(2).normal(size=(6,))
                            .astype(np.float32))

        def loss(r, c, co):
            return jnp.sum(jax.nn.softplus(
                sampled_lse(r, c, co, ids, pos, 8, 128) - s_pos))

        def ref(r, c, co):
            return jnp.sum(jax.nn.softplus(
                self._ref(r, c, co, ids, pos) - s_pos))

        out = sampled_lse(reps, cand, corr, ids, pos, 8, 128)
        assert float(out[2]) < -1e29
        np.testing.assert_allclose(np.asarray(loss(reps, cand, corr)),
                                   np.asarray(ref(reps, cand, corr)),
                                   rtol=1e-5)
        gf = jax.grad(loss, argnums=(0, 1, 2))(reps, cand, corr)
        gr = jax.grad(ref, argnums=(0, 1, 2))(reps, cand, corr)
        assert not np.any(np.asarray(gf[0][2]))  # row 2's dreps is exactly 0
        for a, c in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                       rtol=1e-3, atol=1e-4)

    def test_bf16_candidates_and_compute(self):
        """bf16 storage + bf16 MXU tiles stay within bf16 tolerance of the
        fp32 XLA reference (same numeric class as ops/xent's dtype knob)."""
        from sert_tpu.ops.sampled_lse import sampled_lse
        reps, cand, corr, ids, pos = self._case(11, 8, 200, 32)
        cand16 = cand.astype(jnp.bfloat16)
        out = sampled_lse(reps, cand16, corr, ids, pos, 8, 128, None,
                          "bfloat16")
        ref = self._ref(reps, cand16, corr, ids, pos)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=0.02, atol=0.05)
        g = jax.grad(lambda c: jnp.sum(sampled_lse(reps, c, corr, ids, pos,
                                                   8, 128, None,
                                                   "bfloat16")))(cand16)
        assert g.dtype == jnp.bfloat16 and bool(jnp.isfinite(
            g.astype(jnp.float32)).all())

    def test_model_sampled_loss_fused_matches_unfused(self):
        """loss_sampled_softmax with fused_softmax='on' equals the XLA
        composition, values and gradients (the lse.py integration)."""
        from sert_tpu.models import lse
        from sert_tpu.utils.config import ModelConfig
        rng = np.random.default_rng(13)
        B, V, E, k = 16, 60, 40, 12
        batch = {"windows": rng.integers(0, V, size=(B, 5)).astype(np.int32),
                 "lengths": np.full(B, 5, np.int32),
                 "entities": rng.integers(0, E, size=B).astype(np.int32)}
        negatives = jnp.asarray(rng.integers(0, E, size=k).astype(np.int32))
        base = ModelConfig(model="lse", objective="sampled_softmax",
                           vocab_size=V, num_entities=E, word_dim=12,
                           entity_dim=8, num_negatives=k)
        params = lse.init(jax.random.key(4), base)
        on, off = base.replace(fused_softmax="on"), base.replace(
            fused_softmax="off")
        f_on = lambda p: lse.loss_sampled_softmax(p, batch, on,
                                                  negatives=negatives)
        f_off = lambda p: lse.loss_sampled_softmax(p, batch, off,
                                                   negatives=negatives)
        assert float(f_on(params)) == pytest.approx(float(f_off(params)),
                                                    rel=1e-5)
        g_on, g_off = jax.grad(f_on)(params), jax.grad(f_off)(params)
        for key in g_on:
            np.testing.assert_allclose(np.asarray(g_on[key]),
                                       np.asarray(g_off[key]),
                                       rtol=1e-3, atol=1e-5, err_msg=key)


class TestRescoreDtype:
    """ScoreConfig.rescore_dtype="auto" (round-5): the 10M train-then-score
    OOM fix. Policy unit test + bf16-staged ranking agreement."""

    def test_auto_policy_thresholds(self):
        from sert_tpu.ops.exact_topk import (RESCORE_AUTO_FP32_LIMIT,
                                             resolve_rescore_dtype)
        # The measured configs: 1M stays fp32-exact, 10M drops to bf16.
        assert resolve_rescore_dtype("auto", 1_000_000, 128) == "float32"
        assert resolve_rescore_dtype("auto", 10_000_000, 128) == "bfloat16"
        e_at = RESCORE_AUTO_FP32_LIMIT // (128 * 4)
        assert resolve_rescore_dtype("auto", e_at, 128) == "float32"
        assert resolve_rescore_dtype("auto", e_at + 1, 128) == "bfloat16"
        # Explicit choices pass through regardless of size.
        assert resolve_rescore_dtype("float32", 10**9, 128) == "float32"
        assert resolve_rescore_dtype("bfloat16", 10, 8) == "bfloat16"
        with pytest.raises(ValueError):
            resolve_rescore_dtype("float16", 10, 8)

    def test_bf16_rescore_ranking_agrees(self):
        """bf16-staged rescore must return the same winner SET as fp32 on
        continuous random data (scores are bf16-rounded, so compare the
        index sets and fp64-recomputed score agreement, not raw scores)."""
        from sert_tpu.ops.exact_topk import (exact_topk_prepared,
                                             prepare_entities)
        rng = np.random.default_rng(23)
        R, M = _data(rng, E=1500)
        p32 = prepare_entities(M)
        p16 = prepare_entities(M, rescore_dtype="bfloat16")
        assert p16.M_binned.dtype == jnp.bfloat16
        assert p32.M_binned.dtype == jnp.float32
        s0, i0 = exact_topk_prepared(R, p32, k=40)
        s1, i1 = exact_topk_prepared(R, p16, k=40)
        ref = _ref_scores(R, M)
        for q in range(R.shape[0]):
            want = set(np.argsort(-ref[q])[:40].tolist())
            got16 = set(np.asarray(i1[q]).tolist())
            # bf16 rescore can swap entries whose fp64 margin is below bf16
            # resolution; on N(0,1) dot products at d=32 that is rare —
            # allow at most 2 boundary swaps out of 40.
            assert len(want - got16) <= 2, (q, sorted(want - got16))
        np.testing.assert_allclose(np.asarray(s1, np.float32),
                                   np.take_along_axis(
                                       ref, np.asarray(i1), axis=1),
                                   rtol=2e-2, atol=2e-2)

    def test_score_topics_resolves_auto(self, monkeypatch):
        """score_topics must thread the RESOLVED dtype into staging."""
        import importlib
        # sert_tpu.ops.__init__ re-exports a FUNCTION named exact_topk, so
        # fetch the module object itself for patching.
        et = importlib.import_module("sert_tpu.ops.exact_topk")
        from sert_tpu.scoring import run as srun
        seen = {}
        real = et.prepare_entities

        def spy(M, **kw):
            seen.update(kw)
            return real(M, **kw)

        monkeypatch.setattr(srun, "resolve_engine", lambda sc, E: "pallas")
        monkeypatch.setattr(et, "prepare_entities", spy)
        from sert_tpu.models import api
        from sert_tpu.scoring.run import score_topics
        from sert_tpu.utils.config import ModelConfig, ScoreConfig
        cfg = ModelConfig(model="lse", vocab_size=60, num_entities=300,
                          word_dim=9, entity_dim=8)
        params = api.init_params(jax.random.key(0), cfg)
        enc = {"q1": [3, 5], "q2": [7]}
        names = [f"e{i}" for i in range(300)]
        score_topics(params, cfg, enc, names,
                     ScoreConfig(top_k=10, rescore_dtype="bfloat16"))
        assert seen.get("rescore_dtype") == "bfloat16"
