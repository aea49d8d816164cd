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
