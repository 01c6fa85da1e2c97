"""Multi-host (DCN-style) smoke test: two OS processes, each with two
virtual CPU devices, joined via jax.distributed (Gloo collectives) — the
TPU-native replacement for the reference's torch.distributed
init_process_group (evaluate.py:68-79). Exercises initialize_distributed,
make_mesh over the 4 global devices, process-local data placement, and a
cross-process reduction inside jit.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
proc_id = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")
import jax
os.environ["JAX_PLATFORMS"] = "cpu"
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, %(repo)r)
from shapy_tpu.parallel import initialize_distributed, make_mesh

initialize_distributed(coordinator_address=f"localhost:{port}",
                       num_processes=nproc, process_id=proc_id)
assert jax.process_count() == nproc
assert jax.device_count() == 2 * nproc

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

mesh = make_mesh(data=jax.device_count(), model=1)
sharding = NamedSharding(mesh, P("data"))
local = np.full((2, 4), proc_id + 1.0, np.float32)
garr = jax.make_array_from_process_local_data(sharding, local,
                                              (2 * nproc, 4))

@jax.jit
def global_mean(x):
    return jnp.mean(x)  # GSPMD inserts the cross-process reduction

out = float(global_mean(garr))
expect = sum(i + 1.0 for i in range(nproc)) / nproc
assert abs(out - expect) < 1e-6, (out, expect)
print(f"RANK{proc_id} OK {out}")
"""


@pytest.mark.slow
def test_two_process_distributed_mesh(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER % {"repo": repo})

    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()

    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
        assert p.returncode == 0, out[-2000:]
    assert "RANK0 OK" in outs[0]
    assert "RANK1 OK" in outs[1]


_LOADER_WORKER = r"""
import os, sys, json
proc_id = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
root = sys.argv[4]; out_path = sys.argv[5]
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=1")
import jax
os.environ["JAX_PLATFORMS"] = "cpu"
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, %(repo)r)
from shapy_tpu.parallel import initialize_distributed

initialize_distributed(coordinator_address=f"localhost:{port}",
                       num_processes=nproc, process_id=proc_id)
assert jax.process_count() == nproc

from shapy_tpu.data.build import build_all_data_loaders

cfg = {
    "datasets": {
        "batch_size": 4,  # global; each process gets 2
        "pose_shape_ratio": 1.0,
        "pose": {
            "splits": {"test": ["openpose"]},
            "transforms": {"crop_size": 32},
            "openpose": {"data_folder": root},
        },
    },
}
loaders = build_all_data_loaders(cfg, split="test")
fnames = []
for batch in loaders["pose"]:
    fnames.extend(batch["fnames"])
    assert batch["images"].shape[0] == 2, batch["images"].shape
with open(out_path, "w") as f:
    json.dump(fnames, f)
print(f"RANK{proc_id} OK {len(fnames)}")
"""


@pytest.mark.slow
def test_two_process_sharded_loader(tmp_path):
    """True two-OS-process input sharding (ADVICE r3 rescope of VERDICT
    item 7): each process's build_all_data_loaders consumes a DISJOINT
    strided shard of every global batch and together they cover the
    dataset exactly once (ShardedSampler via shard_sampler_by_process,
    data/build.py shard_by_process default)."""
    import json

    sys.path.insert(0, os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    from bench import _make_fake_openpose_tree

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    data_root = tmp_path / "openpose"
    os.makedirs(data_root, exist_ok=True)
    _make_fake_openpose_tree(str(data_root), 8, size=(64, 48))

    worker = tmp_path / "loader_worker.py"
    worker.write_text(_LOADER_WORKER % {"repo": repo})

    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()

    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    out_files = [tmp_path / f"rank{i}.json" for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), "2", str(port),
             str(data_root), str(out_files[i])],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for i in range(2)
    ]
    for p in procs:
        out, _ = p.communicate(timeout=300)
        assert p.returncode == 0, out[-2000:]

    shards = [json.load(open(f)) for f in out_files]
    assert len(shards[0]) == len(shards[1]) == 4
    assert not (set(shards[0]) & set(shards[1])), shards
    assert len(set(shards[0]) | set(shards[1])) == 8
