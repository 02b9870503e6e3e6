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


def main(coordinator: str, num_processes: int, process_id: int) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=2"
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
    assert info["local_devices"] == 2, info
    assert info["global_devices"] == 2 * num_processes, info

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_global_mesh(n_spatial=2)
    assert mesh.shape["spatial"] == 2
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


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))
