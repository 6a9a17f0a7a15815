"""Wire-format packing for the host->device training feed.

The training batch is three int32 planes — windows [.., B, w], lengths
[.., B], entities [.., B] — 4 bytes per id regardless of how many bits
the id actually needs. On feed-bandwidth-bound hosts that waste is wall
time: the tunneled chip this repo benchmarks on moves ~5.6 MB/s (23
ms/MB measured — benchmarks/NOTES.md round-3), and even PCIe- or
DCN-fed pods pay linearly for feed bytes.

Packing (host side, numpy, on the feeder thread):

- every id plane splits into a uint16 LOW half and, only when the id
  space needs >16 bits, a HIGH plane of ``hb`` bits per id with ``hb``
  rounded up to {1, 2, 4, 8} so a whole number of ids pack per byte.
  Window HIGH bits pack along the window axis (never sharded); the
  entity HIGH plane stays one byte per row to keep the batch axis
  intact for GSPMD sharding.
- lengths (<= window size <= 255) travel as uint8.

At vocab 250k / 1M entities / w=8 this is 18 + 3 + 1 = 22 bytes per
instance vs 40 raw (1.8x fewer feed bytes). Ids must fit 24 bits
(16.7M) — wider spaces fall back to raw transfer.

Unpacking runs on-device inside the jitted train step (shifts and ors —
VPU noise vs the matmuls). Roundtrip is bit-exact; parity is tested in
tests/test_wirepack.py, end-to-end equality in tests/test_train.py.

SERT parity note: the reference's multiprocessing feeders (SURVEY.md
section 4.2) ship raw int32 Theano batches; this module is new
TPU-platform capability, not a port.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

_MAX_BITS = 24          # hi plane must fit uint8
_MAX_WINDOW = 255       # lengths travel as uint8


def hi_bits(n: int) -> int:
    """Bits needed above the low uint16 for ids in [0, n), rounded up to
    a byte-aligned group size (0, 1, 2, 4 or 8). Raises if ids cannot be
    packed at all."""
    if n <= 0:
        raise ValueError(f"id space must be positive, got {n}")
    bits = max(int(n - 1).bit_length(), 1)
    if bits > _MAX_BITS:
        raise ValueError(
            f"id space {n} needs {bits} bits; wire packing supports up "
            f"to {_MAX_BITS} (uint8 hi plane) — use raw transfer")
    extra = max(bits - 16, 0)
    for g in (0, 1, 2, 4, 8):
        if extra <= g:
            return g
    raise AssertionError  # unreachable: extra <= 8 by the check above


def packable(vocab_size: int, num_entities: int) -> bool:
    """True when both id spaces fit the packed wire format."""
    try:
        hi_bits(vocab_size)
        hi_bits(num_entities)
        return True
    except ValueError:
        return False


def _pack_hi_axis(hi: np.ndarray, hb: int) -> np.ndarray:
    """Pack the trailing axis of ``hi`` (< 2**hb values) ``8 // hb`` ids
    per byte. Trailing axis is padded with zeros to a whole byte."""
    g = 8 // hb
    w = hi.shape[-1]
    wp = -(-w // g) * g
    if wp != w:
        pad = [(0, 0)] * (hi.ndim - 1) + [(0, wp - w)]
        hi = np.pad(hi, pad)
    grouped = hi.reshape(hi.shape[:-1] + (wp // g, g)).astype(np.uint32)
    shifts = (np.arange(g, dtype=np.uint32) * hb)
    return (grouped << shifts).sum(axis=-1).astype(np.uint8)


def pack_batch(batch: Dict[str, np.ndarray], vocab_size: int,
               num_entities: int) -> Dict[str, np.ndarray]:
    """Host-side: int32 batch -> packed wire batch (numpy, cheap)."""
    windows = np.asarray(batch["windows"])
    entities = np.asarray(batch["entities"])
    lengths = np.asarray(batch["lengths"])
    if windows.shape[-1] > _MAX_WINDOW:
        # feed_enabled gates on window size, so reaching here means a
        # caller bypassed it; failing is mandatory — uint8 lengths would
        # WRAP (300 -> 44) and silently corrupt the pooling masks.
        raise ValueError(
            f"wire packing supports windows up to {_MAX_WINDOW} tokens "
            f"(uint8 lengths); got {windows.shape[-1]}")
    out = {
        "wlo": (windows & 0xFFFF).astype(np.uint16),
        "elo": (entities & 0xFFFF).astype(np.uint16),
        "len": lengths.astype(np.uint8),
    }
    hb_w = hi_bits(vocab_size)
    if hb_w:
        out["whi"] = _pack_hi_axis((windows >> 16).astype(np.uint8), hb_w)
    hb_e = hi_bits(num_entities)
    if hb_e:
        # one byte per row: the batch axis must stay shardable
        out["ehi"] = (entities >> 16).astype(np.uint8)
    return out


def unpack_batch_jnp(packed: Dict, vocab_size: int,
                     num_entities: int) -> Dict:
    """Device-side (inside jit): packed wire batch -> the standard int32
    batch dict. Pure shifts/ors — negligible next to the step's matmuls.
    The window width comes from the packed arrays themselves (wlo's last
    axis), so the unpacker cannot disagree with whatever width the
    dataset was actually prepared with."""
    import jax.numpy as jnp

    wlo = packed["wlo"]
    window = wlo.shape[-1]
    windows = wlo.astype(jnp.int32)
    hb_w = hi_bits(vocab_size)
    if hb_w:
        g = 8 // hb_w
        whi = packed["whi"].astype(jnp.int32)          # [.., ceil(w/g)]
        shifts = jnp.arange(g, dtype=jnp.int32) * hb_w
        mask = (1 << hb_w) - 1
        hi = (whi[..., None] >> shifts) & mask          # [.., wp/g, g]
        hi = hi.reshape(whi.shape[:-1] + (-1,))[..., :window]
        windows = windows | (hi << 16)
    entities = packed["elo"].astype(jnp.int32)
    if hi_bits(num_entities):
        entities = entities | (packed["ehi"].astype(jnp.int32) << 16)
    return {
        "windows": windows,
        "lengths": packed["len"].astype(jnp.int32),
        "entities": entities,
    }


def packed_nbytes(batch: Dict[str, np.ndarray]) -> int:
    return sum(np.asarray(v).nbytes for v in batch.values())


def feed_enabled(mode: str, vocab_size: int, num_entities: int,
                 window_size: int = 1) -> bool:
    """Resolve TrainConfig.packed_feed for a single-device dense step.
    "on" validates loudly; "auto" requires the TPU backend (the packing
    exists for feed-bandwidth-bound links; CPU test runs opt in
    explicitly so parity stays covered) and both id spaces plus the
    window width to fit the wire format."""
    if mode == "off":
        return False
    fits = (packable(vocab_size, num_entities)
            and window_size <= _MAX_WINDOW)
    if mode == "on":
        if not fits:
            raise ValueError(
                f"packed_feed='on' but the geometry exceeds the wire "
                f"format (vocab={vocab_size}, entities={num_entities} "
                f"must fit {_MAX_BITS} bits; window_size={window_size} "
                f"must be <= {_MAX_WINDOW}); use 'off'")
        return True
    if mode != "auto":
        raise ValueError(f"unknown packed_feed mode: {mode!r}")
    import jax
    return fits and jax.default_backend() == "tpu"
