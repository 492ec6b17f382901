"""Multi-host (multi-process) runtime glue.

The reference is strictly single-process/single-GPU (SURVEY §2.6); this
is the net-new DCN layer of the TPU design: ``jax.distributed``
initialization, process-aware mesh construction that keeps model-parallel
traffic on ICI (intra-host/slice) and data-parallel traffic on DCN
(across hosts), and a helper to build global arrays from per-host shards.

The same code runs single-process unchanged — ``initialize_distributed``
is a no-op without multi-process configuration, and
``make_hybrid_mesh`` degenerates to a plain mesh. A 2-process CPU smoke
test lives in ``tests/test_multihost.py``; on a real N-host TPU slice the
identical commands apply:

    # on every host (env usually injected by the TPU runtime):
    python scripts/bench_sharded.py --multihost --dp <N*dp_local> --mp 4
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import numpy as np


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize the JAX distributed runtime (idempotent).

    Resolution order: explicit args > ``FBTT_COORDINATOR`` /
    ``FBTT_NUM_PROCESSES`` / ``FBTT_PROCESS_ID`` env vars > cloud-TPU
    auto-detection (``jax.distributed.initialize()`` with no args). When
    nothing indicates a multi-process launch, this is a no-op so the same
    entry point runs single-host.

    Returns True when the distributed runtime was (or already is) live.
    """
    import jax

    if getattr(jax.distributed, "is_initialized", None) and \
            jax.distributed.is_initialized():
        return True
    coordinator_address = coordinator_address or os.environ.get(
        "FBTT_COORDINATOR")
    if num_processes is None and os.environ.get("FBTT_NUM_PROCESSES"):
        num_processes = int(os.environ["FBTT_NUM_PROCESSES"])
    if process_id is None and os.environ.get("FBTT_PROCESS_ID"):
        process_id = int(os.environ["FBTT_PROCESS_ID"])
    if coordinator_address is None and num_processes is None:
        # single-process (or TPU-pod auto-config via env the runtime set)
        if os.environ.get("TPU_WORKER_HOSTNAMES") or os.environ.get(
                "MEGASCALE_COORDINATOR_ADDRESS"):
            jax.distributed.initialize()
            return True
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def make_hybrid_mesh(
    dp: Optional[int] = None,
    mp: int = 1,
    axis_names: Tuple[str, str] = ("dp", "mp"),
):
    """Process-aware 2-D mesh: 'mp' packed within each process's devices
    (ICI), 'dp' spanning the rest including the cross-host dimension
    (DCN). Single-process: an ordinary mesh of the local devices.

    ``mp`` must divide the per-process device count — the all_to_all
    embedding exchange then never crosses DCN, which is the layout rule
    the whole sharded design is built around (SURVEY §2.6 / scaling-book
    recipe: collectives ride ICI, gradients ride DCN).
    """
    import jax
    from jax.sharding import Mesh

    n_proc = jax.process_count()
    local = jax.local_device_count()
    total = n_proc * local
    if dp is None:
        dp = total // mp
    assert dp * mp == total, (dp, mp, total)
    if n_proc == 1:
        devices = np.asarray(jax.devices()).reshape(dp, mp)
        return Mesh(devices, axis_names)
    assert local % mp == 0, (
        f"mp={mp} must divide the per-process device count {local} so "
        "model-parallel collectives stay on ICI"
    )
    # jax.devices() is globally ordered process-major; reshape to
    # [process, local] then fold (process, local/mp) into dp and keep mp
    # innermost.
    devs = np.empty((n_proc, local), dtype=object)
    # one pass: per-process ordinal = rank of device.id within its
    # process (ids are globally unique; sort once per process, not once
    # per device — a pod has thousands of devices)
    by_proc = {}
    for d in jax.devices():
        by_proc.setdefault(d.process_index, []).append(d)
    for pi, ds in by_proc.items():
        for li, d in enumerate(sorted(ds, key=lambda d: d.id)):
            devs[pi, li] = d
    devices = devs.reshape(n_proc * (local // mp), mp).reshape(dp, mp)
    return Mesh(devices, axis_names)


def host_local_to_global(mesh, spec, host_arrays):
    """Assemble a global jax.Array from per-host shards.

    ``host_arrays``: this process's slice of the global batch (pytree of
    numpy/jax arrays, already the LOCAL shape). Uses
    ``jax.make_array_from_process_local_data`` — each host feeds only its
    own data; no host ever materializes the global batch.
    """
    import jax
    from jax.sharding import NamedSharding

    sharding = NamedSharding(mesh, spec)

    def one(x):
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))

    return jax.tree.map(one, host_arrays)
