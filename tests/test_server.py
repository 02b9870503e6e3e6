"""Inference HTTP server: health + predict round-trip in-process."""

import json
import threading
import urllib.request

import numpy as np
import pytest

from deepsensornz_tpu.data.synthetic import synthetic_bundle
from deepsensornz_tpu.pipeline.preprocess import PreprocessForDownscaling
from deepsensornz_tpu.pipeline.train import Train


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    base, dem, stations = synthetic_bundle(
        n_times=6, base_hw=(16, 16), dem_hw=(32, 32), n_stations=10
    )
    pre = PreprocessForDownscaling(variable="temperature")
    out = pre.run_processing_sequence(
        dem, {"temperature": base}, stations, highres_factor=2, lowres_factor=4,
    )
    tr = Train(out)
    tr.setup_task_loader(station_as_context="all", internal_density=24)
    tr.initialise_model(unet_channels=(8, 8), likelihood="cnp",
                        compute_dtype="float32", decoder_channels=8, mlp_hidden=8)
    model_dir = str(tmp_path_factory.mktemp("srv") / "model")
    tr.train_model(n_epochs=1, batch_size=4, lr=1e-3, model_dir=model_dir,
                   verbose=False)

    from deepsensornz_tpu.infer.server import serve

    httpd = serve(model_dir, dem, port=0, highres_factor=2)
    port = httpd.server_address[1]
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    yield port, base, httpd
    httpd.shutdown()


def test_health(served):
    port, base, _ = served
    with urllib.request.urlopen(f"http://127.0.0.1:{port}/health") as r:
        body = json.loads(r.read())
    assert body["status"] == "ok"
    assert body["variable"] == "temperature"


def test_predict_endpoint(served):
    port, base, _ = served
    t = str(base.coords["time"][0])
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/predict",
        data=json.dumps({"times": [t]}).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req) as r:
        body = json.loads(r.read())
    mean = np.asarray(body["mean"])
    assert mean.shape == (1, 16, 16)
    land = mean != body["missing_value"]
    assert land.any()
    assert np.isfinite(mean[land]).all()


def test_predict_bad_request(served):
    port, _, _ = served
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/predict",
        data=json.dumps({"nope": 1}).encode(),
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req)
    assert e.value.code == 400


def test_service_applies_shipped_recalibration(served):
    # the serving path must carry the artifact's std_scale — without it
    # every /predict response reports the raw (uncalibrated) spread
    _, _, httpd = served
    svc = httpd.service
    assert svc.predictor.std_scale == pytest.approx(
        float(svc.run["std_scale"])
    )
    assert svc.run["std_scale"] != 1.0  # fixture run actually fit one
