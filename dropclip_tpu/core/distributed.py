"""Multi-host (multi-process) JAX initialization behind config keys.

The reference plumbs ``dist_url`` / ``world_size`` / ``rank`` for a
multi-node NCCL TCP rendezvous it never actually uses beyond one node
(reference config/DistilBlender.yaml:81-86, tools/train_distil.py:98-101;
SURVEY §2.3 "multi-node: plumbed but unused"). The TPU-native equivalent
is ``jax.distributed.initialize`` — after it, the SPMD mesh spans all
processes' devices and the same pjit train step all-reduces over
ICI within a slice and DCN across slices; no other code changes.

Config keys (all optional; nothing initializes when absent):
  dist_coordinator: "host:port" of process 0   (reference: dist_url)
  num_processes:    total process count        (reference: world_size)
  process_id:       this process's rank        (reference: rank)

``num_processes``/``process_id`` may be omitted on platforms where JAX
can infer them (TPU pods, SLURM); on CPU/manual launches they are
required. Must be called BEFORE the first device use.
"""

from __future__ import annotations


def maybe_initialize_distributed(cfg) -> bool:
    """Initialize multi-process JAX if cfg asks for it. Returns True if
    initialization ran. Idempotent (second call is a no-op)."""
    coord = cfg.dist_coordinator
    if not coord:
        return False
    import jax

    # idempotency probe that does NOT touch backends (jax.process_count()
    # would initialize them, defeating call-before-first-device-use)
    try:
        from jax._src import distributed as _dist

        if getattr(_dist.global_state, "client", None) is not None:
            return False
    except ImportError:
        pass
    kwargs = {"coordinator_address": str(coord)}
    if cfg.num_processes is not None:
        kwargs["num_processes"] = int(cfg.num_processes)
    if cfg.process_id is not None:
        kwargs["process_id"] = int(cfg.process_id)
    jax.distributed.initialize(**kwargs)
    return True
