"""Worker for the 2-process jax.distributed CPU test (test_distributed.py).

Run as: python tests/_dist_worker.py <process_id> <num_processes> <port> <tmpdir>

Exercises the real multi-host stack the TPU pod path uses
(`tools/train.py:26-27`): ``jax.distributed.initialize`` with a
coordinator, a global mesh spanning both processes' devices,
``make_array_from_process_local_data`` batch assembly, a cross-process
collective (global mean), the loader's per-host strided sharding, and
the ``collect_results_fs`` eval gather (`eval/runner.py`).
"""
import os
import sys

pid, nproc, port, tmpdir = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=nproc, process_id=pid
)
assert jax.process_count() == nproc, jax.process_count()
assert jax.process_index() == pid

import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

devs = jax.devices()
assert len(devs) == 2 * nproc, devs  # 2 local CPU devices per process
mesh = Mesh(np.asarray(devs).reshape(-1), ("data",))
sharding = NamedSharding(mesh, P("data"))

# global batch of 8 rows, each process contributes its local 4
local = np.arange(pid * 4, pid * 4 + 4, dtype=np.float32)[:, None] * np.ones(
    (1, 3), np.float32
)
garr = jax.make_array_from_process_local_data(sharding, local, global_shape=(8, 3))
mean = jax.jit(lambda x: x.mean(), out_shardings=NamedSharding(mesh, P()))(garr)
got = float(np.asarray(mean))
assert abs(got - 3.5) < 1e-6, got  # mean of 0..7 — the cross-process psum worked

# loader: per-host strided shard must be deterministic and disjoint
from attentionshift_tpu.data.loader import TrainLoader

loader = TrainLoader(
    dataset=list(range(11)), pipeline=None, batch_size=2, seed=3,
    process_index=pid, process_count=nproc,
)
my_shard = [int(i) for i in loader._epoch_indices(epoch=0)]

# eval gather: each process publishes its shard; rank 0 merges
from attentionshift_tpu.eval.runner import collect_results_fs

merged = collect_results_fs(tmpdir, pid, nproc, {"pid": pid, "shard": my_shard})
if pid == 0:
    assert merged is not None and len(merged) == nproc
    all_idx = sorted(sum((p["shard"] for p in merged), []))
    assert all_idx == list(range(11)), all_idx  # disjoint cover of the dataset
else:
    assert merged is None

print(f"WORKER {pid} OK")
