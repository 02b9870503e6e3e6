"""The DEEPSENSORNZ_COMPILE_CACHE knob enables JAX's persistent cache.

Runs in a subprocess so the env var is seen at package import, the way a
CLI invocation would. CPU-only (backend support on the relay is probed
separately by ``perf/compile_cache_probe.py``).
"""

import json
import os
import subprocess
import sys


def test_env_knob_populates_cache_dir(tmp_path):
    cache_dir = str(tmp_path / "jaxcache")
    code = """
import jax
jax.config.update("jax_platforms", "cpu")
import os, json
import deepsensornz_tpu  # env knob fires at import
import jax.numpy as jnp

@jax.jit
def f(x):
    return jnp.sum(jnp.tanh(x @ x.T) * 1.2345)

_ = float(f(jnp.ones((64, 64), jnp.float32)))
d = os.environ["DEEPSENSORNZ_COMPILE_CACHE"]
print(json.dumps({"n": len(os.listdir(d))}))
"""
    env = dict(os.environ)
    env["DEEPSENSORNZ_COMPILE_CACHE"] = cache_dir
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = "/root/repo"
    out = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True, text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    n = json.loads(out.stdout.strip().splitlines()[-1])["n"]
    assert n >= 1, "persistent cache dir is empty after a jitted call"


def test_default_off_no_config_touch():
    # Without the env var the import must not set a cache dir.
    code = """
import jax
jax.config.update("jax_platforms", "cpu")
import deepsensornz_tpu
print(repr(jax.config.jax_compilation_cache_dir))
"""
    env = dict(os.environ)
    env.pop("DEEPSENSORNZ_COMPILE_CACHE", None)
    env["PYTHONPATH"] = "/root/repo"
    out = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True, text=True,
        timeout=120,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert out.stdout.strip().splitlines()[-1] == "None"
