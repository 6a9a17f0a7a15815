"""Where do the flagship's ~250 s of pre-epoch-0 `step_sync` go?

Round-4 VERDICT weak #4: the 1M flagship spends ~310 s before epoch 0;
round 5's stage split pinned ~255 s of it inside the first
`int(state.step)` device sync — i.e. on device work enqueued by
`init_state` that the `block_until_ready(params leaf)` in the loop did
NOT cover. The suspect is eager dispatch: `init_state` issues each
param/optimizer-moment init as its OWN tiny program, and on the
remote-compile TPU platform every one of those pays a server-side
compile that is too cheap for JAX's persistent-cache threshold (so it
repeats every process) yet expensive over the tunnel.

This probe times, on the real chip at flagship shapes (E=1M, V=250k,
d=128, fp32 + dense adam — the exact run10k16f configuration):

  eager   : init_state as the train loop called it through round 4,
            then a full block_until_ready on the WHOLE state tree
  jitted  : jax.jit(init_state-as-closure) — ONE program, one compile
            (persisted by the cache), one execution — then the same
            full-tree block; run twice in fresh jit contexts is not
            possible in-process, so the second call's cost is the
            cache-hit floor a repeat PROCESS would pay

Run AFTER any training job has released the chip (the dense state is
~1.9 GB).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sert_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402

from sert_tpu.train.step import init_state  # noqa: E402
from sert_tpu.utils.config import ModelConfig, TrainConfig  # noqa: E402

E = int(os.environ.get("PROBE_E", 1_000_000))
mcfg = ModelConfig(model="lse", vocab_size=250_000, num_entities=E,
                   word_dim=128, entity_dim=128,
                   objective="sampled_softmax", num_negatives=16384,
                   negative_distribution="unigram",
                   compute_dtype="bfloat16", param_dtype="float32")
tcfg = TrainConfig(batch_size=4096, num_epochs=1, optimizer="adam",
                   learning_rate=3e-3)


def block_all(state):
    jax.block_until_ready(jax.tree_util.tree_leaves(state))


def timed(tag, fn):
    t0 = time.perf_counter()
    state = fn()
    t_dispatch = time.perf_counter() - t0
    block_all(state)
    t_total = time.perf_counter() - t0
    print(f"{tag:18s} dispatch {t_dispatch:7.2f}s   materialized "
          f"{t_total:7.2f}s", flush=True)
    del state
    return t_total


print(f"platform={jax.devices()[0].platform} E={E}", flush=True)

eager_s = timed("eager init_state",
                lambda: init_state(jax.random.key(0), mcfg, tcfg))

jit_init = jax.jit(lambda seed: init_state(jax.random.key(seed), mcfg, tcfg),
                   static_argnums=())
first_s = timed("jit (compile)", lambda: jit_init(0))
repeat_s = timed("jit (warm)", lambda: jit_init(1))

print(f"verdict: eager {eager_s:.1f}s vs jitted-first {first_s:.1f}s vs "
      f"jitted-warm {repeat_s:.1f}s", flush=True)
