"""Generate data-mirroring scripts between hosts.

Role parity with the reference's HPC data-movement helpers
(``bs_to_nesi.py``, ``move_*.sh``): emits an rsync/scp script that mirrors
the ERA5 / WRF / station / topography stores described by the local
``data_paths`` config onto a remote machine.

    python tools/mirror_data.py --remote user@host:/data --out sync.sh
"""

from __future__ import annotations

import argparse
import os
import stat


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--remote", required=True, help="user@host:/dest/root")
    ap.add_argument("--out", default="sync_data.sh")
    ap.add_argument("--tool", choices=["rsync", "scp"], default="rsync")
    ns = ap.parse_args(argv)

    from deepsensornz_tpu.paths import get_data_paths

    paths = get_data_paths()
    sources = []
    for key in ("era5", "wrf", "stations"):
        parent = paths.get(key, {}).get("parent")
        if parent:
            sources.append((key, parent))
    topo = paths.get("topography", {}).get("file")
    if topo:
        sources.append(("topography", topo))

    lines = ["#!/bin/bash", "set -euo pipefail", ""]
    for name, src in sources:
        dest = f"{ns.remote.rstrip('/')}/{name}/"
        if ns.tool == "rsync":
            lines.append(f"rsync -avP --partial {src.rstrip('/')}/ {dest}")
        else:
            lines.append(f"scp -r {src} {dest}")
    with open(ns.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    os.chmod(ns.out, os.stat(ns.out).st_mode | stat.S_IXUSR)
    print(f"wrote {ns.out} ({len(sources)} sources)")


if __name__ == "__main__":
    main()
