"""Worker process for the real two-process multihost test.

Launched (twice) by ``tests/test_multihost.py``:

    python tests/_multihost_worker.py <coordinator> <num_processes> <process_id>

Initialises jax.distributed on CPU with 2 virtual local devices, builds the
global (data, spatial) mesh via ``parallel.multihost``, assembles a
globally-sharded array from per-process shards, and verifies a cross-host
reduction (the gradient-psum path) produces the global answer on every host.
"""

import os
import sys


def main(coordinator: str, num_processes: int, process_id: int,
         out_npz: str = "", local_devices: int = 2) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={local_devices}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")

    from deepsensornz_tpu.parallel.multihost import (
        initialize_multihost,
        make_global_mesh,
        shard_batch_for_host,
    )

    info = initialize_multihost(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    assert info["process_count"] == num_processes, info
    assert info["process_index"] == process_id, info
    assert info["local_devices"] == local_devices, info
    assert info["global_devices"] == local_devices * num_processes, info

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_global_mesh(n_spatial=local_devices)
    assert mesh.shape["spatial"] == local_devices
    assert mesh.shape["data"] == num_processes

    # per-host input pipeline: each host materialises ONLY its batch shard
    global_batch = 8
    per, off = shard_batch_for_host(global_batch)
    assert per == global_batch // num_processes and off == process_id * per
    local = np.arange(off, off + per, dtype=np.float32)[:, None] * np.ones(
        (per, 4), np.float32
    )
    sharding = NamedSharding(mesh, P("data", None))
    garr = jax.make_array_from_process_local_data(sharding, local)
    assert garr.shape == (global_batch, 4)

    # cross-host reduction (the dp gradient-psum path rides this)
    total = jax.jit(lambda x: jnp.sum(x), out_shardings=NamedSharding(mesh, P()))(garr)
    expect = float(np.arange(global_batch).sum() * 4)
    got = float(total)
    assert got == expect, (got, expect)
    print(f"proc {process_id}/{num_processes}: global sum {got} ok", flush=True)

    if out_npz:
        train_step_equivalence(mesh, out_npz)


def train_step_equivalence(mesh, out_npz: str) -> None:
    """ONE full dp×sp train step on the multi-process global mesh, per-host
    batch feeding, updated params dumped for the parent to compare against
    its single-process 8-device run (VERDICT r4 item 4: gradient
    equivalence across the process boundary, not just a psum)."""
    import dataclasses

    import jax
    import numpy as np

    from __graft_entry__ import _build
    from deepsensornz_tpu.models.convnp import ConvNP
    from deepsensornz_tpu.parallel.mesh import DATA_AXIS, SPATIAL_AXIS
    from deepsensornz_tpu.parallel.multihost import (
        replicate_multihost, shard_task_multihost,
    )
    from deepsensornz_tpu.train.trainer import init_state, make_train_step

    model, params, _, task = _build(
        model_kwargs={"unet_channels": (8, 8), "rank": 8, "likelihood": "cnp",
                      "internal_density": 32, "compute_dtype": "float32"},
        loader_density=32, n_times=4,
    )
    model_mesh = ConvNP(dataclasses.replace(
        model.cfg, mesh_axes=(DATA_AXIS, SPATIAL_AXIS)))
    with jax.set_mesh(mesh):
        state = init_state(model_mesh, jax.random.key(0), task, params=params)
        state = dataclasses.replace(
            state,
            params=replicate_multihost(state.params, mesh),
            opt_state=replicate_multihost(state.opt_state, mesh),
            step=replicate_multihost(state.step, mesh),
        )
        gtask = shard_task_multihost(task, mesh)
        step = make_train_step(model_mesh, donate=False)
        new_state, loss = step(state, gtask, 1e-4)
        loss_val = float(loss)
        flat = {
            "/".join(map(str, path)): np.asarray(leaf)
            for path, leaf in jax.tree_util.tree_flatten_with_path(
                new_state.params)[0]
        }
    np.savez(out_npz, loss=np.float32(loss_val), **flat)
    print(f"train step loss {loss_val:.6f} params dumped", flush=True)


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]),
         sys.argv[4] if len(sys.argv) > 4 else "",
         int(sys.argv[5]) if len(sys.argv) > 5 else 2)
