"""Multi-host entry: process bootstrap + host-level work sharding.

The reference's multi-machine story is "split the scene list by hand
and run the script once per GPU" (``/root/reference/README.md:167-169``)
plus example-only torch DDP (``MinkowskiEngine/examples/multigpu_ddp.py:
82-91``). Here it is one SPMD program: ``maybe_initialize()`` turns N
launched processes into one JAX runtime (collectives ride ICI within a
slice, DCN across slices), and ``shard_items`` deals host-level work
(scenes, fragment pairs) round-robin by ``jax.process_index()`` —
SURVEY.md §5.8's prescription.

Single-process runs are unaffected: ``maybe_initialize`` is a no-op
without coordinator env vars and ``shard_items`` returns its input.
"""

from __future__ import annotations

import os


def maybe_initialize() -> bool:
    """Call ``jax.distributed.initialize()`` iff launched multi-process.

    Triggers on the standard JAX coordination env vars
    (``JAX_COORDINATOR_ADDRESS`` [+ ``JAX_NUM_PROCESSES`` /
    ``JAX_PROCESS_ID``]) so the same CLI entry points work 1-process
    and N-process. Returns True when distributed mode was initialized.
    """
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not addr:
        return False
    import jax

    n = os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("JAX_PROCESS_ID")
    jax.distributed.initialize(
        coordinator_address=addr,
        num_processes=int(n) if n else None,
        process_id=int(pid) if pid else None,
    )
    return True


def shard_items(items):
    """This process's slice of host-level work, round-robin by
    ``jax.process_index()`` (deterministic: every process sees the same
    ordering of ``items``)."""
    import jax

    if jax.process_count() == 1:
        return list(items)
    return list(items)[jax.process_index() :: jax.process_count()]


def barrier(name: str = "yoho") -> None:
    """Block until every process reaches this point (no-op when
    single-process). Used between the extraction stages (each process
    writes its scene shard's cache files) and the RR benchmark (process
    0 reads all of them)."""
    import jax

    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)
