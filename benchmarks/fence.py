"""Honest timing fences for the tunneled TPU platform.

Two hazards, both measured (benchmarks/NOTES.md round-3):

1. ``jax.block_until_ready`` has been observed returning EARLY through
   the axon relay (an adam run "measured" 0.17 ms/step while a later
   ``float()`` blocked for the full compute) — so every fence here is a
   HOST FETCH, never block_until_ready.
2. A train step's loss is ready BEFORE the final call's optimizer
   writes land (observed ~2s of escaping work), so fencing a timed
   region that ends in a state update must also fetch from the updated
   params, not just the loss.

Usage::

    pfence = make_param_fence(state)   # pre-compiles OUTSIDE the timed
    pfence(state)                      # region; call inside to fence
"""

import jax
import jax.numpy as jnp


def make_param_fence(state):
    """Build ``fence(state) -> float`` that host-fetches a scalar read
    from the largest param leaf (forcing its buffer to be defined, i.e.
    every pending write to it complete). The fetch expression is jitted
    and warmed HERE so its one-time compile never pollutes a timed
    region. ``state`` is any object with a ``.params`` dict."""
    big = max(state.params, key=lambda k: state.params[k].size)
    probe = jax.jit(lambda p: jnp.sum(p.ravel()[:8].astype(jnp.float32)))

    def fence(st) -> float:
        return float(probe(st.params[big]))

    fence(state)  # warm the compile
    return fence
