"""Device / relay health-check CLI.

The production TPU in this environment sits behind an HTTP relay whose
failure modes are NOT all-or-nothing: round 5 measured a state where
cached dispatch stayed normal (~30 ms round trip) while the COMPILE path
degraded 50-100× (554-1168 s for a trivial program —
``docs/results/compile_cache_probe_r5.json``). An operator deciding
whether to launch a training run or a month of inference needs to know
which of the three legs is sick:

- **dispatch** — per-call round trip of an already-compiled program
  (bounds every synchronous fetch; healthy ≈ 30 ms through the relay,
  ≈ 1 ms local),
- **compile** — time to build one tiny program (bounds process startup;
  healthy ≈ 10 s through the relay, minutes = degraded, no result =
  down),
- **transfer** — host→device and device→host bandwidth on a ~4 MB array
  (bounds operational-month downloads; healthy ≈ 10 MB/s through the
  relay — CLAUDE.md hardware notes).

Role parity: the reference has no equivalent (its GPU is local); this is
the failure-detection subsystem (SURVEY §5.3) applied to the serving
environment itself.

    python -m deepsensornz_tpu.cli.health            # all three legs
    python -m deepsensornz_tpu.cli.health --quick    # skip the compile leg

Prints ONE JSON line so it can be polled by cron/watchdogs; exits 1 if
any measured leg exceeds its ``--max_*`` budget (defaults are lenient:
only a genuinely sick leg fails).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def run_health(quick=False, reps=5, transfer_mb=4.0):
    """Measure dispatch / compile / transfer legs; returns a dict."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    report = {}
    dev = jax.devices()[0]
    report["platform"] = dev.platform
    report["device"] = str(dev)
    report["n_devices"] = jax.device_count()

    # --- compile leg (also warms the program the dispatch leg reuses) ---
    @jax.jit
    def f(x):
        return jnp.sum(jnp.tanh(x @ x.T) * 1.000789)

    x = jnp.ones((256, 256), jnp.float32)
    t0 = time.perf_counter()
    float(f(x))  # scalar fetch forces execution through the relay
    report["compile_s"] = round(time.perf_counter() - t0, 3)

    # --- dispatch leg: cached program, 4-byte sync fetch per call ---
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f(x))
        times.append(time.perf_counter() - t0)
    report["dispatch_ms_p50"] = round(float(np.median(times)) * 1e3, 2)

    if not quick:
        # --- transfer leg: ~transfer_mb each way, f32 ---
        n = int(transfer_mb * 1e6 / 4)
        host = np.ones((n,), np.float32)
        t0 = time.perf_counter()
        on_dev = jax.device_put(host)
        on_dev.block_until_ready()
        # block_until_ready can return early through the relay; a 4-byte
        # scalar fetch of a value that DEPENDS on the upload is the
        # honest sync (CLAUDE.md / perf/harness.py convention).
        float(jnp.sum(on_dev[:8]))
        up_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        back = np.asarray(on_dev)
        down_s = time.perf_counter() - t0
        assert back.shape == host.shape
        report["upload_mb_s"] = round(transfer_mb / up_s, 2)
        report["download_mb_s"] = round(transfer_mb / down_s, 2)

    return report


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="skip the transfer leg")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--transfer_mb", type=float, default=4.0)
    ap.add_argument("--max_compile_s", type=float, default=300.0,
                    help="fail (exit 1) if the tiny compile exceeds this")
    ap.add_argument("--max_dispatch_ms", type=float, default=1000.0)
    ap.add_argument("--min_transfer_mb_s", type=float, default=0.5)
    ns = ap.parse_args(argv)

    report = run_health(quick=ns.quick, reps=ns.reps, transfer_mb=ns.transfer_mb)

    failures = []
    if report["compile_s"] > ns.max_compile_s:
        failures.append("compile")
    if report["dispatch_ms_p50"] > ns.max_dispatch_ms:
        failures.append("dispatch")
    if "download_mb_s" in report and (
        report["upload_mb_s"] < ns.min_transfer_mb_s
        or report["download_mb_s"] < ns.min_transfer_mb_s
    ):
        failures.append("transfer")
    report["healthy"] = not failures
    if failures:
        report["failed_legs"] = failures

    print(json.dumps(report))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
