"""Multi-host (pod) plumbing: jax.distributed init + (host, device) meshes.

The reference is single-GPU single-process (SURVEY.md §2.5); multi-host
distribution is a north-star capability (BASELINE.json config 5). The TPU
recipe: initialize the JAX distributed runtime once per process, build a
mesh whose leading axis is the process (host) and whose trailing axis is
the local device, and shard the data axes over the flattened mesh — XLA
then routes the psum hierarchy over ICI within a slice and DCN across
slices on its own.

On a pod, running the tracker is then literally a flag: every host calls
``initialize_from_env()`` then builds the same program; arrays sharded with
``P((HOST_AXIS, KP_AXIS))`` live distributed, and the existing
``optimize_level_sharded`` psums assemble globally.

Testable without a pod: a single process with 8 virtual CPU devices
reshaped to a (2, 4) mesh exercises exactly the same shardings and
collectives (tests/test_parallel.py::TestPodMesh).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

from .mesh import KP_AXIS

HOST_AXIS = "host"


def initialize_from_env() -> bool:
    """Initialize jax.distributed from standard env vars; returns True when
    a multi-process runtime was actually initialized.

    Env contract (the usual JAX pod launch):
      JAX_COORDINATOR_ADDRESS  host:port of process 0
      JAX_NUM_PROCESSES        total process count
      JAX_PROCESS_ID           this process's rank

    A no-op (returns False) when the variables are absent — single-process
    runs, tests, and the virtual CPU mesh never pay for it.
    """
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not addr:
        return False
    num = int(os.environ["JAX_NUM_PROCESSES"])
    pid = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(
        coordinator_address=addr, num_processes=num, process_id=pid
    )
    return True


def make_pod_mesh(
    n_hosts: Optional[int] = None,
    devices_per_host: Optional[int] = None,
    axes: Tuple[str, str] = (HOST_AXIS, KP_AXIS),
) -> Mesh:
    """(host, device) mesh over the whole pod, host-major.

    Defaults read the actual topology (jax.process_count x local devices).
    For single-process tests, pass explicit factors to fold the virtual
    device list into a fake pod, e.g. (2, 4) on 8 CPU devices.
    """
    devs = jax.devices()
    if n_hosts is None:
        n_hosts = jax.process_count()
    if devices_per_host is None:
        devices_per_host = len(devs) // n_hosts
    grid = np.asarray(devs[: n_hosts * devices_per_host]).reshape(
        n_hosts, devices_per_host
    )
    return Mesh(grid, axes)


def pod_axis_names(mesh: Mesh) -> Tuple[str, ...]:
    """The axis-name tuple to psum over for fully-global reductions."""
    return tuple(mesh.axis_names)
