"""True multi-process distributed training (SURVEY.md §4: 'multi-process via
jax.distributed spawned subprocesses').

Two OS processes, each owning 2 virtual CPU devices, form a process group
over localhost (jax.distributed / Gloo) and run the FULL sharded VBPR
training epoch (collective lookup + DP psum + sharded Adam) on the global
(data=2, model=2) mesh; the loss must agree across processes and match the
same epoch on a single-process 4-device mesh — collectives riding a real
process boundary produce the numbers the virtual mesh produces.
"""

import pytest
import os
import socket
import subprocess
import sys

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import os, sys
sys.path.insert(0, os.environ["FVX_REPO"])
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
pid, n, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
if n > 1:
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=n, process_id=pid)
import jax.numpy as jnp
from fashionvisualexpl_tpu.core.mesh import make_mesh
from fashionvisualexpl_tpu.core.train_state import (
    create_train_state, tf_parity_adam,
)
from fashionvisualexpl_tpu.data.features import synthetic_features
from fashionvisualexpl_tpu.data.interactions import synthetic_interactions
from fashionvisualexpl_tpu.models.vbpr import VBPR
from fashionvisualexpl_tpu.parallel.spmd import make_spmd_epoch_fn, shard_params

assert len(jax.devices()) == 4, jax.devices()
mesh = make_mesh(data=2, model=2, devices=jax.devices())
feats = synthetic_features(128, 32, seed=0)
model = VBPR(64, 128, feats, embed_k=16, embed_d=4)
params, frozen = model.init(jax.random.PRNGKey(0))
params, frozen = shard_params(model, params, frozen, mesh)
tx = tf_parity_adam(0.001)
state = create_train_state(params, tx)
data = synthetic_interactions(64, 128, interactions_per_user=6, seed=0)
epoch = make_spmd_epoch_fn(model, mesh, tx, reg=0.01, num_items=128,
                           steps=2, batch=16)
state, loss = epoch(
    state, frozen, jax.random.PRNGKey(0),
    jnp.asarray(data.train_pairs), jnp.asarray(data.padded_pos),
    jnp.asarray(data.pos_counts),
)
print(f"RESULT loss={float(loss):.8f}", flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _spawn(script, pid, n, port, devices_per_proc):
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={devices_per_proc}"
    )
    env["JAX_PLATFORMS"] = "cpu"
    env["FVX_REPO"] = _REPO
    return subprocess.Popen(
        [sys.executable, script, str(pid), str(n), str(port)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
    )


def _loss_from(out: str) -> float:
    for line in out.splitlines():
        if line.startswith("RESULT loss="):
            return float(line.split("=")[1])
    raise AssertionError(f"no RESULT line in output:\n{out[-2000:]}")


@pytest.mark.slow
def test_two_process_epoch_matches_single_process(tmp_path):
    script = tmp_path / "child.py"
    script.write_text(_CHILD)
    port = _free_port()

    procs = [_spawn(str(script), pid, 2, port, devices_per_proc=2)
             for pid in (0, 1)]
    outs = [p.communicate(timeout=540) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, err[-3000:]
    losses = [_loss_from(out) for out, _ in outs]

    single = _spawn(str(script), 0, 1, port, devices_per_proc=4)
    out, err = single.communicate(timeout=540)
    assert single.returncode == 0, err[-3000:]
    single_loss = _loss_from(out)

    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-6)
    np.testing.assert_allclose(losses[0], single_loss, rtol=1e-5)
