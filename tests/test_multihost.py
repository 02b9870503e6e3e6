"""Real two-process multihost test: jax.distributed on CPU.

SURVEY.md §5.8 / round-1 verdict: ``parallel/multihost.py`` must be
exercised against an actual multi-process ``jax.distributed`` cluster, not
just single-process semantics. Two local worker processes initialise a
coordinator, build the global (data, spatial) mesh (2 hosts × 2 local
devices), feed per-host batch shards, and check a cross-host reduction.
"""

import os
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_workers(tmp_dir=None, local_devices=2, timeout=150):
    port = _free_port()
    coordinator = f"localhost:{port}"
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # a clean slate for the workers: no inherited device-count flags
    env.pop("XLA_FLAGS", None)
    procs = []
    for i in range(2):
        cmd = [sys.executable, WORKER, coordinator, "2", str(i)]
        if tmp_dir is not None:
            cmd += [os.path.join(tmp_dir, f"params_{i}.npz"),
                    str(local_devices)]
        procs.append(subprocess.Popen(
            cmd, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True,
        ))
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("distributed CPU init timed out in this environment")
    for i, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0 and (
            "UNIMPLEMENTED" in out or "not supported" in out.lower()
        ):
            pytest.skip(f"jax.distributed unsupported here: {out[-200:]}")
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert "global sum 112.0 ok" in out
    return outs


def test_two_process_distributed_cpu():
    _run_workers()


def test_two_process_train_step_matches_single_process(tmp_path):
    """Gradient equivalence across the process boundary (VERDICT r4 item 4):
    one dp×sp train step on a 2-process × 4-device global mesh (per-host
    batch feeding through shard_task_multihost) must produce the SAME
    updated parameters as the single-process 8-device mesh run of the
    identical step — and both hosts must agree bit-for-bit with each other."""
    import dataclasses

    import jax
    import numpy as np

    outs = _run_workers(tmp_dir=str(tmp_path), local_devices=4, timeout=420)
    assert all("params dumped" in o for o in outs), outs
    w0 = np.load(tmp_path / "params_0.npz")
    w1 = np.load(tmp_path / "params_1.npz")

    # reference: the SAME step on this process's own 8-device mesh
    from __graft_entry__ import _build
    from deepsensornz_tpu.models.convnp import ConvNP
    from deepsensornz_tpu.parallel.mesh import (
        DATA_AXIS, SPATIAL_AXIS, make_mesh, shard_task,
    )
    from deepsensornz_tpu.train.trainer import init_state, make_train_step

    model, params, _, task = _build(
        model_kwargs={"unet_channels": (8, 8), "rank": 8, "likelihood": "cnp",
                      "internal_density": 32, "compute_dtype": "float32"},
        loader_density=32, n_times=4,
    )
    model_mesh = ConvNP(dataclasses.replace(
        model.cfg, mesh_axes=(DATA_AXIS, SPATIAL_AXIS)))
    mesh = make_mesh(n_data=2, n_spatial=4)
    with jax.set_mesh(mesh):
        state = init_state(model_mesh, jax.random.key(0), task, params=params)
        step = make_train_step(model_mesh, donate=False)
        new_state, loss = step(state, shard_task(task, mesh), 1e-4)
        ref = {
            "/".join(map(str, path)): np.asarray(leaf)
            for path, leaf in jax.tree_util.tree_flatten_with_path(
                new_state.params)[0]
        }
        ref["loss"] = np.float32(float(loss))

    assert set(w0.files) == set(ref.keys())
    for k in w0.files:
        np.testing.assert_array_equal(w0[k], w1[k], err_msg=f"hosts disagree: {k}")
        np.testing.assert_allclose(
            w0[k], ref[k], rtol=2e-5, atol=1e-6,
            err_msg=f"multi-process != single-process: {k}")
