"""Model parity tests: JAX losses vs pure-numpy twins + finite-difference
gradient checks (SURVEY.md section 5, test item 1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sert_tpu.models import api, loglinear, lse, numpy_ref
from sert_tpu.utils.config import ModelConfig


def _batch(rng, B=8, w=5, V=40, E=11, short=True):
    windows = rng.integers(0, V, size=(B, w)).astype(np.int32)
    lengths = np.full(B, w, np.int32)
    if short:
        lengths[0] = 2  # exercise the padding mask
        windows[0, 2:] = 0
    entities = rng.integers(0, E, size=B).astype(np.int32)
    return {"windows": windows, "lengths": lengths, "entities": entities}


def _np_params(params):
    return {k: np.asarray(v) for k, v in params.items()}


CFG_LL = ModelConfig(model="loglinear", vocab_size=40, num_entities=11,
                     word_dim=7)
CFG_LSE = ModelConfig(model="lse", vocab_size=40, num_entities=11,
                      word_dim=7, entity_dim=6, num_negatives=3)


class TestLogLinear:
    def test_loss_matches_numpy(self):
        rng = np.random.default_rng(0)
        batch = _batch(rng)
        params = loglinear.init(jax.random.key(0), CFG_LL)
        got = float(loglinear.loss(params, batch, CFG_LL))
        want = numpy_ref.loglinear_loss(_np_params(params), batch["windows"],
                                        batch["lengths"], batch["entities"])
        assert got == pytest.approx(want, rel=1e-5)

    def test_grad_matches_finite_difference(self):
        rng = np.random.default_rng(1)
        batch = _batch(rng, B=4)
        params = loglinear.init(jax.random.key(1), CFG_LL)
        g = jax.grad(loglinear.loss)(params, batch, CFG_LL)
        npp = _np_params(params)
        eps = 1e-4
        for (i, j) in [(0, 0), (3, 2)]:
            for key in ("proj_w", "word_emb"):
                p_plus = {k: v.copy() for k, v in npp.items()}
                p_minus = {k: v.copy() for k, v in npp.items()}
                p_plus[key][i, j] += eps
                p_minus[key][i, j] -= eps
                fd = (numpy_ref.loglinear_loss(p_plus, batch["windows"],
                                               batch["lengths"], batch["entities"])
                      - numpy_ref.loglinear_loss(p_minus, batch["windows"],
                                                 batch["lengths"], batch["entities"])) / (2 * eps)
                assert float(g[key][i, j]) == pytest.approx(fd, rel=1e-3, abs=1e-5)

    def test_query_scores_match_numpy(self):
        params = loglinear.init(jax.random.key(2), CFG_LL)
        term_ids = np.array([3, 17, 5], np.int32)
        got = loglinear.query_scores(params, jnp.asarray(term_ids),
                                     jnp.int32(3), CFG_LL)
        want = numpy_ref.loglinear_query_scores(_np_params(params), term_ids)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)

    def test_query_padding_masked(self):
        params = loglinear.init(jax.random.key(2), CFG_LL)
        s2 = loglinear.query_scores(params, jnp.array([3, 17], jnp.int32),
                                    jnp.int32(2), CFG_LL)
        s2_padded = loglinear.query_scores(
            params, jnp.array([3, 17, 9, 9], jnp.int32), jnp.int32(2), CFG_LL)
        np.testing.assert_allclose(np.asarray(s2), np.asarray(s2_padded),
                                   rtol=1e-6)


class TestLSE:
    def test_nce_loss_matches_numpy(self):
        rng = np.random.default_rng(3)
        batch = _batch(rng)
        params = lse.init(jax.random.key(3), CFG_LSE)
        negatives = rng.integers(0, 11, size=(8, 3)).astype(np.int32)
        got = float(lse.loss(params, batch, CFG_LSE, negatives=jnp.asarray(negatives)))
        want = numpy_ref.lse_nce_loss(_np_params(params), batch["windows"],
                                      batch["lengths"], batch["entities"], negatives)
        assert got == pytest.approx(want, rel=1e-5)

    def test_full_softmax_matches_numpy(self):
        rng = np.random.default_rng(4)
        batch = _batch(rng)
        params = lse.init(jax.random.key(4), CFG_LSE)
        got = float(lse.loss_full_softmax(params, batch, CFG_LSE))
        want = numpy_ref.lse_full_softmax_loss(_np_params(params), batch["windows"],
                                               batch["lengths"], batch["entities"])
        assert got == pytest.approx(want, rel=1e-5)

    def test_nce_grad_matches_finite_difference(self):
        rng = np.random.default_rng(5)
        batch = _batch(rng, B=4)
        params = lse.init(jax.random.key(5), CFG_LSE)
        negatives = jnp.asarray(rng.integers(0, 11, size=(4, 3)).astype(np.int32))
        g = jax.grad(lambda p: lse.loss(p, batch, CFG_LSE, negatives=negatives))(params)
        npp = _np_params(params)
        negs = np.asarray(negatives)
        eps = 1e-4
        for key, idx in [("entity_emb", (2, 1)), ("proj_w", (0, 3)),
                         ("word_emb", (5, 0))]:
            p_plus = {k: v.copy() for k, v in npp.items()}
            p_minus = {k: v.copy() for k, v in npp.items()}
            p_plus[key][idx] += eps
            p_minus[key][idx] -= eps
            fd = (numpy_ref.lse_nce_loss(p_plus, batch["windows"], batch["lengths"],
                                         batch["entities"], negs)
                  - numpy_ref.lse_nce_loss(p_minus, batch["windows"], batch["lengths"],
                                           batch["entities"], negs)) / (2 * eps)
            assert float(g[key][idx]) == pytest.approx(fd, rel=1e-3, abs=1e-5)

    def test_sampled_softmax_matches_numpy(self):
        rng = np.random.default_rng(6)
        batch = _batch(rng)
        params = lse.init(jax.random.key(6), CFG_LSE)
        negatives = rng.integers(0, 11, size=5).astype(np.int32)  # shared [k]
        noise = np.linspace(0.0, 1.0, 11).astype(np.float32)      # non-uniform q
        logq = noise - (noise.max() + np.log(np.exp(noise - noise.max()).sum()))
        got = float(lse.loss_sampled_softmax(
            params, batch, CFG_LSE, negatives=jnp.asarray(negatives),
            noise=jnp.asarray(noise)))
        want = numpy_ref.lse_sampled_softmax_loss(
            _np_params(params), batch["windows"], batch["lengths"],
            batch["entities"], negatives, logq)
        assert got == pytest.approx(want, rel=1e-5)

    def test_sampled_softmax_grad_matches_finite_difference(self):
        rng = np.random.default_rng(7)
        batch = _batch(rng, B=4)
        params = lse.init(jax.random.key(7), CFG_LSE)
        negatives = rng.integers(0, 11, size=4).astype(np.int32)
        logq = np.full(11, -np.log(11.0))
        g = jax.grad(lambda p: lse.loss_sampled_softmax(
            p, batch, CFG_LSE, negatives=jnp.asarray(negatives)))(params)
        npp = _np_params(params)
        eps = 1e-4
        for key, idx in [("entity_emb", (2, 1)), ("proj_w", (0, 3)),
                         ("word_emb", (5, 0))]:
            p_plus = {k: v.copy() for k, v in npp.items()}
            p_minus = {k: v.copy() for k, v in npp.items()}
            p_plus[key][idx] += eps
            p_minus[key][idx] -= eps
            fd = (numpy_ref.lse_sampled_softmax_loss(
                      p_plus, batch["windows"], batch["lengths"],
                      batch["entities"], negatives, logq)
                  - numpy_ref.lse_sampled_softmax_loss(
                      p_minus, batch["windows"], batch["lengths"],
                      batch["entities"], negatives, logq)) / (2 * eps)
            assert float(g[key][idx]) == pytest.approx(fd, rel=1e-3, abs=1e-5)

    def test_sampled_softmax_converges_to_full(self):
        """The importance-corrected estimator is value-consistent: as the
        shared candidate count grows, the sampled loss approaches the full
        softmax cross-entropy (binary NCE never does — it optimizes a
        different objective at any k). Non-uniform q exercises the
        importance weights, not just the uniform constant."""
        rng = np.random.default_rng(8)
        batch = _batch(rng, B=16)
        params = lse.init(jax.random.key(8), CFG_LSE)
        full = float(lse.loss_full_softmax(params, batch, CFG_LSE))
        counts = rng.integers(1, 50, size=11).astype(np.float64)
        cfg_u = CFG_LSE.replace(negative_distribution="unigram")
        noise = lse.noise_logits(counts, cfg_u)
        errs = []
        for k in (8, 8192):
            cfg_k = cfg_u.replace(num_negatives=k)
            vals = [float(lse.loss_sampled_softmax(
                        params, batch, cfg_k, rng=jax.random.key(100 + r),
                        noise=noise)) for r in range(4)]
            errs.append(abs(np.mean(vals) - full))
        assert errs[-1] < 0.02
        assert errs[-1] < errs[0]

    def test_api_dispatches_objective(self):
        rng = np.random.default_rng(9)
        batch = _batch(rng)
        cfg = CFG_LSE.replace(objective="sampled_softmax", num_negatives=6)
        params = lse.init(jax.random.key(9), cfg)
        l = api.loss_fn(params, batch, cfg, rng=jax.random.key(1))
        assert np.isfinite(float(l))
        with pytest.raises(ValueError, match="objective"):
            api.loss_fn(params, batch, CFG_LSE.replace(objective="nope"),
                        rng=jax.random.key(1))

    def test_negative_sampling_distribution(self):
        # unigram^power distribution: empirical frequencies track counts^p.
        counts = np.array([1, 8, 27, 64], np.float64)
        cfg = CFG_LSE.replace(num_entities=4, negative_distribution="unigram",
                              unigram_power=0.75, num_negatives=4)
        noise = lse.noise_logits(counts, cfg)
        draws = lse.sample_negatives(jax.random.key(0), noise, 4000, cfg)
        freq = np.bincount(np.asarray(draws).ravel(), minlength=4) / (4000 * 4)
        want = counts ** 0.75
        want /= want.sum()
        np.testing.assert_allclose(freq, want, atol=0.02)

    def test_uniform_noise_default(self):
        cfg = CFG_LSE.replace(num_entities=5)
        np.testing.assert_array_equal(np.asarray(lse.noise_logits(None, cfg)),
                                      np.zeros(5))

    def test_sampled_vs_full_softmax_ranking_agreement(self):
        """SURVEY.md section 8 hard part 1: with enough negatives the sampled
        objective must learn the same planted ranking as the full softmax."""
        rng = np.random.default_rng(7)
        V, E, B = 30, 6, 64
        cfg_s = ModelConfig(model="lse", vocab_size=V, num_entities=E,
                            word_dim=8, entity_dim=8, num_negatives=5)
        # planted: word w belongs to entity w % E; windows are drawn from
        # their entity's word class with 25% uniform noise.
        entities = rng.integers(0, E, size=512).astype(np.int32)
        base = entities[:, None] + E * rng.integers(0, V // E, size=(512, 4))
        noise_mask = rng.random((512, 4)) < 0.25
        windows = np.where(noise_mask, rng.integers(0, V, size=(512, 4)),
                           base).astype(np.int32)
        lengths = np.full(512, 4, np.int32)
        import optax
        params = lse.init(jax.random.key(8), cfg_s)
        opt = optax.adam(5e-2)
        state = opt.init(params)
        noise = jnp.zeros((E,), jnp.float32)

        @jax.jit
        def step(params, state, batch, key):
            l, g = jax.value_and_grad(
                lambda p: lse.loss(p, batch, cfg_s, rng=key, noise=noise))(params)
            updates, state = opt.update(g, state)
            return optax.apply_updates(params, updates), state, l

        key = jax.random.key(9)
        for i in range(60):
            key, sub = jax.random.split(key)
            lo = (i * B) % 512
            batch = {"windows": windows[lo:lo + B], "lengths": lengths[lo:lo + B],
                     "entities": entities[lo:lo + B]}
            params, state, l = step(params, state, batch, sub)

        # Queries: single planted word must rank its entity first.
        hits = 0
        for w in range(12):
            scores = lse.query_scores(params, jnp.array([w], jnp.int32),
                                      jnp.int32(1), cfg_s)
            hits += int(np.argmax(np.asarray(scores)) == w % E)
        assert hits >= 10  # sampled softmax learned the planted structure


class TestApi:
    def test_dispatch_and_shapes(self):
        rng = np.random.default_rng(0)
        batch = _batch(rng)
        for cfg in (CFG_LL, CFG_LSE, CFG_LSE.replace(model="lse_full")):
            params = api.init_params(jax.random.key(0), cfg)
            l = api.loss_fn(params, batch, cfg, rng=jax.random.key(1))
            assert np.isfinite(float(l))
            scores = api.all_entity_scores(params, batch["windows"],
                                           batch["lengths"], cfg)
            assert scores.shape == (8, 11)
            q = api.query_scores(params, jnp.array([1, 2], jnp.int32),
                                 jnp.int32(2), cfg)
            assert q.shape == (11,)

    def test_unknown_family(self):
        with pytest.raises(ValueError):
            api.init_params(jax.random.key(0), CFG_LL.replace(model="bogus"))

    def test_zero_length_window_no_nan(self):
        params = api.init_params(jax.random.key(0), CFG_LL)
        batch = {"windows": np.zeros((2, 5), np.int32),
                 "lengths": np.array([0, 5], np.int32),
                 "entities": np.array([0, 1], np.int32)}
        l = api.loss_fn(params, batch, CFG_LL)
        assert np.isfinite(float(l))

    def test_bfloat16_compute_close_to_fp32(self):
        rng = np.random.default_rng(0)
        batch = _batch(rng, B=16)
        cfg32 = CFG_LL
        cfg16 = CFG_LL.replace(compute_dtype="bfloat16")
        params = api.init_params(jax.random.key(0), cfg32)
        l32 = float(api.loss_fn(params, batch, cfg32))
        l16 = float(api.loss_fn(params, batch, cfg16))
        assert l16 == pytest.approx(l32, rel=0.05)
