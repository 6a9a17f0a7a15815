"""Multi-host initialization (SURVEY.md section 6, comm-backend row).

Single-slice multi-chip needs nothing beyond the mesh; MULTI-HOST runs
(v5e pods, DCN-connected slices) need ``jax.distributed.initialize`` before
any backend use, and every host must execute the same program. This wrapper
standardizes that plus the derived global mesh.

Untested on real multi-host hardware in this environment (one host, one
chip — see BASELINE.md); the code paths it feeds (pjit shardings,
shard_map collectives) are the ones validated on the fake-device mesh.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax

from sert_tpu.parallel.mesh import make_mesh
from sert_tpu.utils.logging import get_logger

log = get_logger("multihost")


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Call once at program start on EVERY host. Arguments default from the
    standard JAX env vars (JAX_COORDINATOR_ADDRESS etc.) / cluster
    auto-detection; explicit values win."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    log.info("distributed: process %d/%d, %d local / %d global devices",
             jax.process_index(), jax.process_count(),
             jax.local_device_count(), jax.device_count())


def global_mesh(mesh_shape: Tuple[int, int]):
    """Build the ("data", "model") mesh over ALL processes' devices.

    Layout rule: keep the ``model`` axis within a slice whenever possible so
    the entity-axis collectives (psum/all_gather/ppermute in the top-k
    merge) ride ICI; the ``data`` axis (one gradient all-reduce per step)
    tolerates DCN. jax.devices() orders devices process-major, so putting
    ``data`` first achieves exactly that split for (hosts, chips-per-host)
    shaped meshes.
    """
    return make_mesh(mesh_shape, devices=jax.devices())
