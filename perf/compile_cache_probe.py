"""Probe: does JAX's persistent compilation cache work through the axon relay?

Compilation through the HTTP relay is the dominant fixed cost of every TPU
process (first program ~2-3 min healthy, 26 min measured on a degraded
relay — ROUND5_NOTES.md). If the persistent cache can serialise the
compiled executable client-side and rehydrate it in a fresh process, every
CLI/bench invocation skips the relay compile.

Run TWICE in fresh processes with the same ``--cache_dir``:
  PYTHONPATH=/root/repo:/root/.axon_site python perf/compile_cache_probe.py /tmp/jaxcache
First run = cold compile + cache write; second = cache hit (or a measured
statement that the axon backend does not support executable serialisation).

Prints one JSON line: {"cache_dir", "files_before", "files_after",
"compile_s", "exec_ok"}.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main():
    cache_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxcache"
    os.makedirs(cache_dir, exist_ok=True)

    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    import jax.numpy as jnp

    def n_files():
        return len([f for f in os.listdir(cache_dir) if not f.startswith(".")])

    before = n_files()

    # A distinctive program (constants matter: they key the cache).
    @jax.jit
    def f(x):
        y = jnp.tanh(x @ x.T) * 1.000123
        return jnp.sum(y) + 41.5

    x = jnp.ones((384, 384), jnp.float32)
    t0 = time.time()
    out = float(f(x))
    compile_s = time.time() - t0
    after = n_files()

    print(json.dumps({
        "cache_dir": cache_dir,
        "files_before": before,
        "files_after": after,
        "compile_s": round(compile_s, 2),
        "exec_ok": bool(out != 0.0),
        "platform": jax.devices()[0].platform,
    }), flush=True)


if __name__ == "__main__":
    main()
