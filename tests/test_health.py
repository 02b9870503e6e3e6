"""Health-check CLI: legs measured, JSON contract, budget gating."""

import json

from deepsensornz_tpu.cli.health import main, run_health


def test_report_has_all_legs():
    r = run_health(reps=2, transfer_mb=0.5)
    for k in ("platform", "compile_s", "dispatch_ms_p50",
              "upload_mb_s", "download_mb_s"):
        assert k in r
    assert r["compile_s"] > 0 and r["dispatch_ms_p50"] > 0


def test_quick_skips_transfer_and_gates(capsys):
    rc = main(["--quick", "--reps", "2"])
    report = json.loads(capsys.readouterr().out.strip())
    assert rc == 0 and report["healthy"]
    assert "upload_mb_s" not in report

    rc = main(["--quick", "--reps", "2", "--max_compile_s", "1e-9"])
    report = json.loads(capsys.readouterr().out.strip())
    assert rc == 1 and report["failed_legs"] == ["compile"]
