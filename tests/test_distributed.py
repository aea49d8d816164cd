"""Multi-PROCESS (multi-host) smoke: 2 CPU processes rendezvous via
``jax.distributed.initialize`` (behind the config keys the trainer
plumbs — core/distributed.py; reference dist_url/world_size/rank,
config/DistilBlender.yaml:81-86), shard the loader disjointly, all-gather
across processes, and write checkpoints single-writer.

This is the cross-PROCESS analogue of the 8-virtual-device in-process
mesh tests (SURVEY §4d: "multi-node without a cluster")."""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
sys.path.insert(0, os.environ["DCT_REPO"])
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
from dropclip_tpu.core.config import CfgNode
from dropclip_tpu.core.distributed import maybe_initialize_distributed

pid = int(os.environ["DCT_PID"])
cfg = CfgNode({"dist_coordinator": os.environ["DCT_COORD"],
               "num_processes": 2, "process_id": pid})
assert maybe_initialize_distributed(cfg)
assert maybe_initialize_distributed(cfg) is False  # idempotent
assert jax.process_count() == 2, jax.process_count()
assert jax.process_index() == pid

# disjoint loader shards covering the dataset (process-sharded loading
# replaces the reference's DistributedSampler, train_distil.py:160-161)
from dropclip_tpu.data.loader import DataLoader

ds = list(range(8))
loader = DataLoader(ds, batch_size=1, collate=lambda s: np.asarray(s),
                    shuffle=False, num_workers=1, drop_last=False,
                    shard_index=jax.process_index(), num_shards=2)
mine = np.concatenate([b for b in loader])
assert len(mine) == 4, mine

from jax.experimental import multihost_utils

allitems = np.asarray(multihost_utils.process_allgather(
    jax.numpy.asarray(np.sort(mine)))).reshape(-1)
assert sorted(allitems.tolist()) == list(range(8)), allitems

# metric mean across processes (replaces dist.all_reduce / world_size)
from dropclip_tpu.core.mesh import all_reduce_mean_host

m = all_reduce_mean_host([float(pid)])
assert abs(float(np.asarray(m)[0]) - 0.5) < 1e-6, m

# checkpoint: ALL ranks call save (orbax's multihost contract — it syncs
# internally and only process 0 writes); then both ranks read back
from dropclip_tpu.core.checkpoint import restore_checkpoint, save_checkpoint

ckpt_dir = os.environ["DCT_CKPT"]
payload = {"step": np.full((), 7, np.int64), "x": np.arange(3, dtype=np.float32)}
save_checkpoint(ckpt_dir, payload)
multihost_utils.sync_global_devices("ckpt_written")
restored = restore_checkpoint(ckpt_dir, payload)
assert restored is not None and int(restored["step"]) == 7

# ---- the trainer's cross-process batch assembly + one SPMD train step.
# Each process loads a DIFFERENT local slice; to_batch must assemble them
# into one global batch-sharded array (a plain device_put would require
# identical values on both ranks), and the train-step loss must come out
# identical on every rank because it was computed over the global batch.
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from dropclip_tpu.core.config import CfgNode as _C
from dropclip_tpu.core.mesh import make_mesh
from dropclip_tpu.distill.engine import (DistilBatch, build_student_for,
                                         build_topology, make_eval_step,
                                         make_train_step)
from dropclip_tpu.distill.train_state import create_train_state, make_optimizer
from dropclip_tpu.tools.train_distil import to_batch

mesh = make_mesh()
assert mesh.devices.size == 2  # one CPU device per process

cfg = _C({"sparse_backend": "gather", "arch_3d": "tiny", "feat_dim": 16,
          "loss_type": "cosine", "base_lr": 1e-3, "min_lr": 1e-4,
          "epochs": 1, "weight_decay": 0.0, "max_norm": 5.0})
cap = 64
r = np.random.RandomState(100 + pid)  # DIFFERENT data per process
coords = np.zeros((1, cap, 3), np.int32)
coords[0, :20] = np.unique(r.randint(0, 8, size=(40, 3)), axis=0)[:20]
mask = np.zeros((1, cap), bool)
mask[0, :20] = True
b = {"coords": coords, "mask": mask,
     "in_feats": (r.randn(1, cap, 6) * mask[..., None]).astype(np.float32),
     "targets": (r.randn(1, cap, 16) * mask[..., None]).astype(np.float32),
     "labels": r.randint(0, 4, size=(1, cap)).astype(np.int32)}

gb = to_batch(b, mesh)
assert gb.coords.shape[0] == 2, gb.coords.shape  # global batch = sum of shards
# this process's addressable shard is exactly its own local data
np.testing.assert_array_equal(
    np.asarray(gb.in_feats.addressable_data(0)), b["in_feats"])

model = build_student_for(cfg)
topo0 = build_topology(cfg, jnp.asarray(b["coords"]), jnp.asarray(b["mask"]))
tx = make_optimizer(cfg, 1)
state = create_train_state(model, topo0, jnp.asarray(b["in_feats"]), tx,
                           rng=jax.random.PRNGKey(0))
state = jax.tree.map(
    lambda x: multihost_utils.host_local_array_to_global_array(
        np.asarray(x), mesh, P()) if hasattr(x, "shape") else x, state)
step = jax.jit(make_train_step(cfg), donate_argnums=0)
state, metrics = step(state, gb, jax.random.PRNGKey(1))
loss = float(np.asarray(metrics["distil_loss"]))
assert np.isfinite(loss)
ls = np.asarray(multihost_utils.process_allgather(jax.numpy.float32(loss)))
assert abs(ls[0] - ls[1]) < 1e-6, ls  # same global loss on both ranks

# local-shard eval with a host copy of the replicated params (the
# trainer's multi-process eval path)
pull = lambda x: jax.device_get(x.addressable_data(0)) \
    if isinstance(x, jax.Array) else x
local_state = state.replace(
    step=pull(state.step), params=jax.tree.map(pull, state.params),
    batch_stats=jax.tree.map(pull, state.batch_stats), opt_state=None)
out, m = jax.jit(make_eval_step(cfg))(
    local_state, DistilBatch(
        coords=jnp.asarray(b["coords"]), mask=jnp.asarray(b["mask"]),
        in_feats=jnp.asarray(b["in_feats"]),
        targets=jnp.asarray(b["targets"]),
        labels=jnp.asarray(b["labels"]), labels_cls=jnp.asarray(b["labels"])))
assert out.shape == (1, cap, 16) and np.isfinite(float(m["distil_loss"]))

print(f"proc {pid} OK", flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_cpu_rendezvous(tmp_path):
    coord = f"127.0.0.1:{_free_port()}"
    env_base = {**os.environ, "DCT_REPO": REPO, "DCT_COORD": coord,
                "DCT_CKPT": str(tmp_path / "ckpt"),
                "JAX_PLATFORMS": "cpu"}
    env_base.pop("XLA_FLAGS", None)  # 1 local device per process
    procs = []
    for pid in (0, 1):
        procs.append(subprocess.Popen(
            [sys.executable, "-c", WORKER],
            env={**env_base, "DCT_PID": str(pid)},
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"proc {pid} OK" in out
