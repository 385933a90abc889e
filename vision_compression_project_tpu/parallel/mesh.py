"""Device mesh construction — the framework's communication backend.

The reference's "distributed" story is host thread pools over HTTPS
(reference: backend/app/pipeline/pdf_extract.py:328,
supermemory_ingest.py:215).  Here the equivalent is a `jax.sharding.Mesh`
over TPU chips: data parallelism over the `data` axis carries page batches,
tensor parallelism over `model` shards the VLM matmuls, `expert` carries MoE
experts, and `seq` shards long sequences (evidence packs / whole-document
attention).  All communication is XLA collectives over ICI (intra-slice) or
DCN (multi-slice via jax.distributed), never hand-rolled transports.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh

# Canonical mesh axis names, ordered outer-to-inner (DCN-friendly to
# ICI-friendly): data-parallel replicas change weights never (pure psum of
# grads) so they tolerate the slowest links; tensor/expert sharding
# communicates per-layer and must ride ICI.
AXIS_DATA = "data"
AXIS_SEQ = "seq"
AXIS_EXPERT = "expert"
AXIS_MODEL = "model"
MESH_AXES = (AXIS_DATA, AXIS_SEQ, AXIS_EXPERT, AXIS_MODEL)


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Mesh axis sizes. 0 for `data` means "absorb all remaining devices"."""

    data: int = 0
    seq: int = 1
    expert: int = 1
    model: int = 1

    def resolve(self, n_devices: int) -> "MeshConfig":
        fixed = self.seq * self.expert * self.model
        if fixed <= 0 or n_devices % fixed != 0:
            raise ValueError(
                f"mesh axes seq*expert*model={fixed} do not divide {n_devices} devices"
            )
        data = self.data if self.data > 0 else n_devices // fixed
        if data * fixed != n_devices:
            raise ValueError(
                f"mesh {data}x{self.seq}x{self.expert}x{self.model} != {n_devices} devices"
            )
        return MeshConfig(data=data, seq=self.seq, expert=self.expert, model=self.model)

    @property
    def shape(self) -> tuple:
        return (self.data, self.seq, self.expert, self.model)


def build_mesh(
    config: Optional[MeshConfig] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build the 4-axis framework mesh over the given (default: all) devices.

    Uses `mesh_utils.create_device_mesh` so the physical ICI topology is
    respected on real TPU slices; falls back to a plain reshape for host
    (CPU-simulated) device sets where there is no topology to exploit.
    """
    devices = list(devices if devices is not None else jax.devices())
    config = (config or MeshConfig()).resolve(len(devices))
    try:
        device_array = mesh_utils.create_device_mesh(
            config.shape, devices=np.asarray(devices)
        )
    except (ValueError, AssertionError, NotImplementedError):
        device_array = np.asarray(devices).reshape(config.shape)
    return Mesh(device_array, MESH_AXES)


def local_mesh() -> Mesh:
    """Default mesh from environment (VCP_MESH_*), all spare devices -> data."""
    cfg = MeshConfig(
        data=int(os.environ.get("VCP_MESH_DATA", 0) or 0),
        seq=int(os.environ.get("VCP_MESH_SEQ", 1) or 1),
        expert=int(os.environ.get("VCP_MESH_EXPERT", 1) or 1),
        model=int(os.environ.get("VCP_MESH_MODEL", 1) or 1),
    )
    return build_mesh(cfg)


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-slice / multi-host init (DCN).  No-op when single-process.

    Call before `build_mesh` on multi-host deployments; afterwards
    `jax.devices()` spans the full slice set and the `data` axis naturally
    maps across DCN.
    """
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
