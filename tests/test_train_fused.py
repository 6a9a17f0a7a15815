"""Optimizer-in-backward fused step vs the dense step (train/fused.py).

Parity contract (module docstring there): the fused step replicates optax
adam/adagrad/sgd exactly — sgd and adagrad match the dense path to float
reassociation (observed ~1e-8), adam through the bias-correction powers
(~1e-5 over several steps) — and the optax state layout is UNCHANGED, so
checkpoints interoperate with fused_update flipped between runs.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sert_tpu.train.fused import fused_applicable, fused_enabled
from sert_tpu.train.step import init_state, make_train_step
from sert_tpu.utils.config import ModelConfig, TrainConfig

V, E, D, B, W = 300, 1000, 128, 256, 5


def _mcfg(model="loglinear", **kw):
    if model == "loglinear":
        return ModelConfig(model=model, vocab_size=V, num_entities=E,
                           word_dim=D, fused_softmax="on", **kw)
    return ModelConfig(model="lse_full", vocab_size=V, num_entities=E,
                       word_dim=D, entity_dim=D, fused_softmax="on", **kw)


def _tcfg(**kw):
    kw.setdefault("batch_size", B)
    kw.setdefault("donate_state", False)
    kw.setdefault("learning_rate", 0.05)
    return TrainConfig(**kw)


def _batches(n, batch=B, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        out.append({
            "windows": rng.integers(0, V, size=(batch, W)).astype(np.int32),
            "lengths": rng.integers(1, W + 1, size=batch).astype(np.int32),
            "entities": rng.integers(0, E, size=batch).astype(np.int32)})
    return out


def _run(mcfg, tcfg, n_steps, seed_key=0, batch=B):
    state = init_state(jax.random.key(seed_key), mcfg, tcfg)
    step = make_train_step(mcfg, tcfg)
    metrics = None
    bs = _batches(n_steps, batch=batch)
    if tcfg.steps_per_call > 1:
        k = tcfg.steps_per_call
        for i in range(0, n_steps, k):
            stacked = {key: jnp.stack([jnp.asarray(b[key])
                                       for b in bs[i:i + k]])
                       for key in bs[0]}
            state, metrics = step(state, stacked)
        return state, metrics
    for b in bs:
        state, metrics = step(state, {k: jnp.asarray(v)
                                      for k, v in b.items()})
    return state, metrics


class TestGating:
    def test_auto_requires_applicable_and_fused_softmax(self):
        assert fused_applicable(_mcfg(), _tcfg())
        assert fused_applicable(_mcfg("lse_full"), _tcfg())
        assert not fused_applicable(_mcfg(), _tcfg(optimizer="adafactor"))
        assert not fused_applicable(_mcfg(), _tcfg(weight_decay=0.01))
        assert not fused_applicable(_mcfg(), _tcfg(grad_clip_norm=1.0))
        assert not fused_applicable(_mcfg(), _tcfg(mesh_shape=(2, 4)))
        assert not fused_applicable(
            ModelConfig(model="loglinear", vocab_size=V, num_entities=E,
                        word_dim=120), _tcfg())          # d % 128 != 0
        assert not fused_applicable(_mcfg(), _tcfg(batch_size=1 << 15))
        # the kernel bakes adagrad's eps; a non-default eps must gate off
        # (the initial accumulator flows through optax init and is fine)
        assert not fused_applicable(
            _mcfg(), _tcfg(optimizer="adagrad", adagrad_eps=1e-4))
        assert fused_applicable(
            _mcfg(), _tcfg(optimizer="adagrad",
                           adagrad_init_accumulator=1.0))
        assert not fused_applicable(
            ModelConfig(model="lse", vocab_size=V, num_entities=E,
                        word_dim=D, entity_dim=D), _tcfg())

    def test_on_rejects_inapplicable(self):
        with pytest.raises(ValueError, match="fused_update"):
            fused_enabled(_mcfg(), _tcfg(optimizer="adafactor",
                                         fused_update="on"))

    def test_off_is_off(self):
        assert not fused_enabled(_mcfg(), _tcfg(fused_update="off"))


class TestParity:
    # adam tolerance: the dense comparison runs the same kernels at a
    # different tile width (te 4096 vs 512), so the lse partial maxes
    # reassociate; adam amplifies that near v~0 into ~1e-4 absolute wobbles
    # on a handful of elements (observed 3/128000 at 1.2e-4).
    @pytest.mark.parametrize("optn,tol", [("adam", 3e-4),
                                          ("adagrad", 1e-6),
                                          ("sgd", 0.0)])
    def test_matches_dense_step_loglinear(self, optn, tol):
        mcfg = _mcfg()
        s0, m0 = _run(mcfg, _tcfg(optimizer=optn, fused_update="off"), 4)
        s1, m1 = _run(mcfg, _tcfg(optimizer=optn, fused_update="on"), 4)
        for k in s0.params:
            np.testing.assert_allclose(np.asarray(s0.params[k]),
                                       np.asarray(s1.params[k]),
                                       rtol=tol, atol=tol, err_msg=k)
        np.testing.assert_allclose(float(m0["loss"]), float(m1["loss"]),
                                   rtol=1e-5)
        np.testing.assert_allclose(float(m0["grad_norm"]),
                                   float(m1["grad_norm"]), rtol=1e-4)

    def test_matches_dense_step_lse_full(self):
        mcfg = _mcfg("lse_full")
        s0, m0 = _run(mcfg, _tcfg(fused_update="off"), 3)
        s1, m1 = _run(mcfg, _tcfg(fused_update="on"), 3)
        for k in s0.params:
            np.testing.assert_allclose(np.asarray(s0.params[k]),
                                       np.asarray(s1.params[k]),
                                       rtol=3e-4, atol=3e-4, err_msg=k)
        np.testing.assert_allclose(float(m0["loss"]), float(m1["loss"]),
                                   rtol=1e-5)

    def test_padded_batch_rows(self):
        """B not a multiple of the kernel's 256-row tile: padded rows must
        contribute nothing (lse poisoning + label masking)."""
        mcfg = _mcfg()
        s0, _ = _run(mcfg, _tcfg(batch_size=100, fused_update="off"), 3,
                     batch=100)
        s1, _ = _run(mcfg, _tcfg(batch_size=100, fused_update="on"), 3,
                     batch=100)
        for k in s0.params:
            np.testing.assert_allclose(np.asarray(s0.params[k]),
                                       np.asarray(s1.params[k]),
                                       rtol=3e-4, atol=3e-4, err_msg=k)

    def test_steps_per_call_scan(self):
        mcfg = _mcfg()
        s0, _ = _run(mcfg, _tcfg(fused_update="on"), 4)
        s1, _ = _run(mcfg, _tcfg(fused_update="on", steps_per_call=2), 4)
        for k in s0.params:
            np.testing.assert_allclose(np.asarray(s0.params[k]),
                                       np.asarray(s1.params[k]),
                                       rtol=1e-6, atol=1e-6, err_msg=k)

    def test_opt_state_count_advances(self):
        mcfg = _mcfg()
        s1, _ = _run(mcfg, _tcfg(fused_update="on"), 3)
        assert int(s1.opt_state[0].count) == 3
        assert int(s1.step) == 3


class TestCheckpointInterop:
    def test_state_layout_identical_and_resumable_across_modes(self,
                                                               tmp_path):
        """fused_update on/off produce the SAME opt_state pytree, so a
        checkpoint from one resumes under the other (no flavor logic)."""
        from sert_tpu.train import checkpoint as ckpt
        mcfg = _mcfg()
        tc_on = _tcfg(fused_update="on")
        tc_off = _tcfg(fused_update="off")
        assert (jax.tree_util.tree_structure(
                    init_state(jax.random.key(0), mcfg, tc_on))
                == jax.tree_util.tree_structure(
                    init_state(jax.random.key(0), mcfg, tc_off)))
        state, _ = _run(mcfg, tc_on, 2)
        path = ckpt.save_checkpoint(str(tmp_path), 2, state)
        assert not ckpt.has_sparse_opt_state(path)
        template = jax.eval_shape(
            lambda: init_state(jax.random.key(0), mcfg, tc_off))
        restored, _ = ckpt.load_checkpoint(path, template)
        step_off = make_train_step(mcfg, tc_off)
        b = _batches(1, seed=7)[0]
        new_state, m = step_off(restored, {k: jnp.asarray(v)
                                           for k, v in b.items()})
        assert np.isfinite(float(m["loss"]))
        assert int(new_state.opt_state[0].count) == 3


class TestBf16Params:
    def test_bf16_one_step_parity_with_dense(self):
        """bf16 master weights, ONE step: the kernel casts tiles f32 for
        the update and stores back in the param dtype exactly like optax —
        mu/nu agree to the te-reassociation floor (~5e-7: the dense
        comparison runs the same kernels at tile width 4096 vs 512, so the
        lse partials reorder) and W within bf16 rounding.

        Multi-step elementwise parity is NOT a valid contract in bf16:
        after step 1 the two paths' W differ by storage rounding (~5e-4),
        and on near-zero-gradient elements adam's m_hat/sqrt(v_hat) is a
        ratio of two near-zero quantities — step 2 chaotically amplifies
        the rounding into O(lr) differences on isolated elements
        (measured: 641/128000 W elements past 1e-3 at step 2 while mu/nu
        agree to ~5e-7). The same happens between any two bf16 runs that
        reassociate differently; the meaningful multi-step contract is the
        loss trajectory, below."""
        mcfg = _mcfg(param_dtype="bfloat16", compute_dtype="bfloat16")
        s0, _ = _run(mcfg, _tcfg(fused_update="off"), 1)
        s1, _ = _run(mcfg, _tcfg(fused_update="on"), 1)
        for k in s0.params:
            # atol: one bf16 ulp at |param| ~ 0.5 (dpooled reassociation
            # can flip a rounding boundary on isolated elements).
            np.testing.assert_allclose(np.asarray(s0.params[k], np.float32),
                                       np.asarray(s1.params[k], np.float32),
                                       atol=2e-3, err_msg=k)
        for tree in ("mu", "nu"):
            for k, a in getattr(s0.opt_state[0], tree).items():
                np.testing.assert_allclose(
                    np.asarray(a, np.float32),
                    np.asarray(getattr(s1.opt_state[0], tree)[k],
                               np.float32),
                    atol=1e-5, err_msg=f"{tree}/{k}")
        assert s1.params["proj_w"].dtype == jnp.bfloat16
        assert s1.opt_state[0].mu["proj_w"].dtype == jnp.bfloat16

    def test_bf16_multistep_loss_trajectory_matches(self):
        mcfg = _mcfg(param_dtype="bfloat16", compute_dtype="bfloat16")
        _, m0 = _run(mcfg, _tcfg(fused_update="off"), 6)
        _, m1 = _run(mcfg, _tcfg(fused_update="on"), 6)
        np.testing.assert_allclose(float(m0["loss"]), float(m1["loss"]),
                                   rtol=5e-3)


class TestVmemPlan:
    def test_accum_gate_counts_whole_working_set(self):
        """The review scenario: d=256, B=4096 at the default te=4096 holds
        ~16MB of W/dW blocks alone — the dpooled accumulator must NOT be
        added on top (the HBM-transient envelope is the proven one)."""
        from sert_tpu.ops.xent import _accum_dpool_ok
        assert not _accum_dpool_ok(4096, 256, 4096)
        assert _accum_dpool_ok(1024, 128, 4096)      # the common config

    def test_fused_te_shrinks_with_dim_and_batch(self):
        from sert_tpu.ops.xent import fused_update_te
        assert fused_update_te("adam", 256, 1024) == 512
        assert fused_update_te("adam", 512, 1024) <= 256
        assert fused_update_te("sgd", 128, 1024) == 2048
        # gigantic accumulator: inapplicable, not a Mosaic crash
        assert fused_update_te("adam", 1024, 1 << 15) is None

    def test_plain_te_budget(self):
        """The on-chip failure this budget fixes: d=256 fp32 at te=4096
        holds 16MB of W-in + dW-out streams alone, 512K over the
        terminal-pinned scoped-VMEM limit. d=128 (the measured round-2
        rows) must keep resolving to the full 4096 tile."""
        from sert_tpu.ops.xent import _resolve_te, plain_xent_te
        assert plain_xent_te(128) == 4096
        assert plain_xent_te(256) == 2048
        assert plain_xent_te(512) == 1024
        # explicit te wins; auto pads d to LANES before budgeting
        assert _resolve_te(640, 256) == 640
        assert _resolve_te(None, 200) == plain_xent_te(256)
        # fwd (raw d) and bwd (padded dp) must resolve identically
        assert _resolve_te(None, 250) == _resolve_te(None, 256)
        # widths where even te=128 is over budget fail LOUDLY (an
        # unchecked 128 would just defer to an opaque Mosaic error)...
        with pytest.raises(ValueError, match="VMEM plan"):
            plain_xent_te(4096)

    def test_auto_gate_falls_back_for_wide_models(self, monkeypatch):
        """fused_softmax='auto' uses the XLA composition when the kernel
        cannot budget the model width, instead of surfacing the
        plain_xent_te error. The backend check short-circuits on CPU, so
        pin it to 'tpu' to reach the width gate."""
        from sert_tpu.models import loglinear as ll
        monkeypatch.setattr(ll.jax, "default_backend", lambda: "tpu")
        wide = ModelConfig(model="loglinear", vocab_size=V,
                           num_entities=100_000, word_dim=4096)
        assert not ll._use_fused(wide)
        ok = ModelConfig(model="loglinear", vocab_size=V,
                         num_entities=100_000, word_dim=128)
        assert ll._use_fused(ok)
        # lse_full budgets entity_dim, not word_dim
        wide_lse = ModelConfig(model="lse_full", vocab_size=V,
                               num_entities=100_000, word_dim=128,
                               entity_dim=4096)
        assert not ll._use_fused(wide_lse)

    def test_applicability_rejects_oversized_geometry(self):
        mcfg = ModelConfig(model="loglinear", vocab_size=V,
                           num_entities=E, word_dim=1024,
                           fused_softmax="on")
        assert not fused_applicable(mcfg, _tcfg(batch_size=1 << 15))
        assert fused_applicable(mcfg, _tcfg(batch_size=1024))


@pytest.mark.slow
class TestFuzz:
    def test_random_geometry_parity(self):
        """Random (E, B, optimizer) through fused-vs-dense: OOB entity
        tails at arbitrary E, padded batch rows, every optimizer."""
        rng = np.random.default_rng(11)
        for trial in range(5):
            e = int(rng.integers(300, 3000))
            b = int(rng.integers(33, 400))
            optn = ("adam", "adagrad", "sgd")[trial % 3]
            mcfg = ModelConfig(model="loglinear", vocab_size=V,
                               num_entities=e, word_dim=D,
                               fused_softmax="on")
            s0, m0 = _run(mcfg, _tcfg(optimizer=optn, batch_size=b,
                                      fused_update="off"), 2, batch=b)
            s1, m1 = _run(mcfg, _tcfg(optimizer=optn, batch_size=b,
                                      fused_update="on"), 2, batch=b)
            # adam amplifies te-reassociation on near-zero-v elements
            # (see TestParity's tolerance note); adagrad/sgd stay tight.
            tol = {"adam": 2e-3, "adagrad": 1e-6, "sgd": 1e-7}[optn]
            for k in s0.params:
                np.testing.assert_allclose(
                    np.asarray(s0.params[k]), np.asarray(s1.params[k]),
                    rtol=tol, atol=tol,
                    err_msg=f"E={e} B={b} {optn} {k}")
            np.testing.assert_allclose(float(m0["loss"]),
                                       float(m1["loss"]), rtol=1e-5)


@pytest.mark.slow
class TestPipeline:
    def test_end_to_end_with_fused_update(self, tmp_path):
        """train -> resume under the other mode -> query -> evaluate at the
        pipeline surface (the checkpoint-interop contract, end to end)."""
        from sert_tpu import pipeline, recipes

        recipe = recipes.tiny_recipe("loglinear")
        recipe = dataclasses.replace(
            recipe,
            model=dataclasses.replace(recipe.model, word_dim=128,
                                      fused_softmax="on"),
            train=dataclasses.replace(recipe.train, fused_update="on"))
        col = recipes.tiny_spec(seed=11).build()
        res = pipeline.run_end_to_end(col, recipe, str(tmp_path))
        assert res["all"]["ndcg@100"] > 0.9
        # resume the finished run with fused_update off: same state layout
        recipe_off = dataclasses.replace(
            recipe, train=dataclasses.replace(
                recipe.train, fused_update="off",
                num_epochs=recipe.train.num_epochs + 1))
        pipeline.train_from_dir(recipe_off, str(tmp_path / "data"),
                                str(tmp_path / "run"), resume=True)
