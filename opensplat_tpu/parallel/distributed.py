"""Multi-host bootstrap: `jax.distributed.initialize` wiring + a mesh
that spans processes.

The reference has no distributed story at all (README.md:268 lists
"distributed computation" as an open project goal; its NCCL use is
single-process). The TPU-native shape of multi-host training:

  * every host runs THE SAME program; `jax.distributed.initialize`
    connects them through a coordinator (process 0);
  * on TPU pods the coordinator/process-id/process-count are
    auto-detected from the TPU metadata — `initialize()` with no
    arguments is correct; on CPU/GPU fleets they come from env vars;
  * a `Mesh` built from `jax.devices()` (ALL processes' devices) spans
    hosts; GSPMD inserts DCN collectives at the process boundary and ICI
    collectives within a host. Camera-DP (dp_trainer.py) then scales
    across hosts with the data axis laid out host-major so the one
    gradient psum rides ICI first and crosses DCN once, pre-reduced;
  * per-process data loading: each process feeds only the cameras for
    ITS mesh rows (`process_camera_slice`), and `jax.make_array_from_
    process_local_data` assembles the global batch.

Launch recipe (2 hosts):

    # host 0
    OPENSPLAT_COORDINATOR=10.0.0.1:9876 OPENSPLAT_NUM_PROCESSES=2 \
    OPENSPLAT_PROCESS_ID=0 python -m opensplat_tpu.cli ... --distributed
    # host 1
    OPENSPLAT_COORDINATOR=10.0.0.1:9876 OPENSPLAT_NUM_PROCESSES=2 \
    OPENSPLAT_PROCESS_ID=1 python -m opensplat_tpu.cli ... --distributed

On a TPU pod slice, omit the env vars — auto-detection fills them in.
Tested by tests/test_distributed.py with two real CPU processes.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np


def initialize_from_env(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Connect this process to the training fleet.

    Arguments default to OPENSPLAT_COORDINATOR / OPENSPLAT_NUM_PROCESSES /
    OPENSPLAT_PROCESS_ID; with none present, falls back to
    `jax.distributed.initialize()` auto-detection (TPU pods). Returns
    True when running multi-process after initialization.
    """
    import jax

    coordinator = coordinator or os.environ.get("OPENSPLAT_COORDINATOR")
    if num_processes is None:
        num_processes = int(os.environ.get("OPENSPLAT_NUM_PROCESSES", 0)) or None
    if process_id is None:
        pid = os.environ.get("OPENSPLAT_PROCESS_ID")
        process_id = int(pid) if pid is not None else None

    if coordinator:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    else:
        try:
            jax.distributed.initialize()  # TPU-pod auto-detection
        except Exception:
            return False  # single-process run (no cluster metadata)
    return jax.process_count() > 1


def global_dp_mesh(n_model: int = 1):
    """A ('data', 'model') mesh over ALL processes' devices, data axis
    host-major: devices of one process are contiguous along 'data', so
    the DP gradient psum reduces over ICI within each host before
    crossing DCN once (the scaling-book layout rule: collectives ride
    the fastest network that contains them)."""
    import jax
    from jax.sharding import Mesh

    devices = sorted(
        jax.devices(), key=lambda d: (d.process_index, d.id)
    )
    n = len(devices)
    assert n % n_model == 0, (n, n_model)
    arr = np.asarray(devices).reshape(n // n_model, n_model)
    return Mesh(arr, axis_names=("data", "model"))


def process_camera_slice(n_cameras_per_step: int):
    """(start, count) of the camera batch rows THIS process must feed,
    for a host-major data axis: rows are dealt to processes in contiguous
    blocks, matching global_dp_mesh's device order."""
    import jax

    per = n_cameras_per_step // jax.process_count()
    return jax.process_index() * per, per


def make_global_batch(mesh, spec, local_rows):
    """Assemble a globally-sharded array from this process's rows
    (jax.make_array_from_process_local_data wrapper)."""
    import jax
    from jax.sharding import NamedSharding

    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, spec), np.asarray(local_rows)
    )
