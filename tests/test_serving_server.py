"""HTTP model server (serving/server.py): endpoint behavior, encoded and
raw prediction parity with the Predictor, error handling."""

import json
import urllib.request

import numpy as np
import pandas as pd
import pytest

from tests.test_serving import DATA_DIR, _train_tiny


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    from fuxictr_tpu.serving import (PredictionServer, Predictor,
                                     export_model)
    tmp_path = tmp_path_factory.mktemp("server")
    model, fm = _train_tiny(tmp_path)
    bundle = export_model(model, str(tmp_path / "bundle"),
                          params=dict(model="DeepFM", embedding_dim=4,
                                      hidden_units=[16, 8]))
    pred = Predictor(bundle, batch_buckets=(1, 8, 64), aot=False)
    server = PredictionServer(pred, host="127.0.0.1", port=0)
    server.start_background()
    yield server, pred
    server.shutdown()


def _call(port, path, payload=None):
    url = f"http://127.0.0.1:{port}{path}"
    if payload is None:
        req = urllib.request.Request(url)
    else:
        req = urllib.request.Request(
            url, data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as err:
        return err.code, json.loads(err.read())


def test_healthz_and_info(served):
    server, pred = served
    code, body = _call(server.port, "/healthz")
    assert code == 200 and body["status"] == "ok"
    code, body = _call(server.port, "/info")
    assert code == 200 and body["model"] == "DeepFM"
    code, body = _call(server.port, "/nope")
    assert code == 404


def test_predict_rows_and_columns_match_predictor(served):
    server, pred = served
    df = pd.read_parquet(f"{DATA_DIR}/train.parquet").head(5)
    feat_cols = [c for c in df.columns if c != "label"]
    cols = {c: df[c].to_numpy().tolist() for c in feat_cols}
    want = pred.predict({c: np.asarray(v) for c, v in cols.items()})

    code, body = _call(server.port, "/predict", {"columns": cols})
    assert code == 200 and body["n"] == 5
    np.testing.assert_allclose(body["probabilities"], want, rtol=1e-6)
    assert body["latency_ms"] > 0

    rows = [{c: cols[c][i] for c in cols} for i in range(5)]
    code, body = _call(server.port, "/predict", {"rows": rows})
    assert code == 200
    np.testing.assert_allclose(body["probabilities"], want, rtol=1e-6)


def test_predict_raw_roundtrip(tmp_path):
    """Server "raw": true routes untokenized csv rows through the bundle's
    offline processor artifacts and matches Predictor.predict_raw."""
    from fuxictr_tpu.config import load_config
    from fuxictr_tpu.experiment import run_expid
    from fuxictr_tpu.serving import (PredictionServer, Predictor,
                                     export_model)

    params = load_config("./configs/tiny", "DeepFM_csv_test")
    params["model_root"] = str(tmp_path / "ckpt")
    params["data_root"] = str(tmp_path / "data")
    params["epochs"] = 1
    model = run_expid("./configs/tiny", "DeepFM_csv_test",
                      params=params)["model"]
    bundle = export_model(model, str(tmp_path / "bundle"), params=params)
    pred = Predictor(bundle, batch_buckets=(8,), aot=False)
    server = PredictionServer(pred, host="127.0.0.1", port=0)
    server.start_background()
    try:
        raw = pd.read_csv(
            "/root/reference/data/tiny_csv/train_sample.csv").head(3)
        feat_cols = [c for c in raw.columns if c != "label"]
        rows = [{c: (v.item() if hasattr(v, "item") else v)
                 for c in feat_cols for v in [raw[c].iloc[i]]}
                for i in range(3)]
        code, body = _call(server.port, "/predict",
                           {"rows": rows, "raw": True})
        assert code == 200 and len(body["probabilities"]) == 3
        want = pred.predict_raw({c: raw[c].to_numpy() for c in feat_cols})
        np.testing.assert_allclose(body["probabilities"], want, rtol=1e-5,
                                   atol=1e-6)
    finally:
        server.shutdown()


def test_bad_requests(served):
    server, _ = served
    code, body = _call(server.port, "/predict", {})
    assert code == 400 and "rows" in body["error"]
    code, body = _call(server.port, "/predict",
                       {"columns": {"a": [1, 2], "b": [1]}})
    assert code == 400 and "ragged" in body["error"]
    code, body = _call(server.port, "/predict",
                       {"rows": []})
    assert code == 400


def _bundle_predictor(tmp_path):
    """Fresh Predictor + an encoded 16-row feature batch."""
    from fuxictr_tpu.serving import Predictor, export_model
    model, fm = _train_tiny(tmp_path)
    bundle = export_model(model, str(tmp_path / "mb_bundle"),
                          params=dict(model="DeepFM", embedding_dim=4,
                                      hidden_units=[16, 8]))
    pred = Predictor(bundle, batch_buckets=(1, 8, 64), aot=False)
    df = pd.read_parquet(f"{DATA_DIR}/train.parquet").head(16)
    batch = {c: df[c].to_numpy() for c in df.columns}
    return pred, fm, batch


def test_microbatch_coalesces_and_matches(tmp_path):
    """Concurrent MicroBatcher.predict calls must return exactly the
    per-request Predictor results while coalescing them into fewer device
    batches."""
    import threading

    import numpy as np

    from fuxictr_tpu.serving.microbatch import MicroBatcher

    pred, fm, batch = _bundle_predictor(tmp_path)
    feats = {k: np.asarray(v) for k, v in batch.items()
             if k in fm.features}
    want = pred.predict(feats)

    mb = MicroBatcher(pred, linger_ms=20)
    n = len(next(iter(feats.values())))
    results = [None] * n
    errors = []

    def one(i):
        try:
            row = {k: v[i:i + 1] for k, v in feats.items()}
            results[i] = mb.predict(row)
        except Exception as exc:          # noqa: BLE001
            errors.append(exc)

    threads = [threading.Thread(target=one, args=(i,)) for i in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    mb.close()
    assert not errors, errors
    got = np.concatenate([np.atleast_1d(r) for r in results])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    assert mb.batches_run < n             # actually coalesced
    assert mb.rows_run == n


def test_server_microbatch_mode(tmp_path):
    """HTTP server with --microbatch returns per-request results identical
    to lock mode under concurrent clients."""
    import http.client
    import json as jsonlib
    import threading

    import numpy as np

    from fuxictr_tpu.serving.server import PredictionServer

    pred, fm, batch = _bundle_predictor(tmp_path)
    feats = {k: np.asarray(v) for k, v in batch.items() if k in fm.features}
    want = pred.predict(feats)

    server = PredictionServer(pred, port=0, microbatch=True, linger_ms=10)
    server.start_background()
    n = len(next(iter(feats.values())))
    results = [None] * n

    def one(i):
        conn = http.client.HTTPConnection("127.0.0.1", server.port,
                                          timeout=30)
        body = jsonlib.dumps({"columns": {
            k: v[i:i + 1].tolist() for k, v in feats.items()}})
        conn.request("POST", "/predict", body,
                     {"Content-Type": "application/json"})
        resp = conn.getresponse()
        assert resp.status == 200, resp.read()
        results[i] = jsonlib.loads(resp.read())["probabilities"]
        conn.close()

    threads = [threading.Thread(target=one, args=(i,)) for i in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    server.shutdown()
    got = np.concatenate([np.atleast_1d(r) for r in results])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_microbatch_oversize_request_fails_only_itself(tmp_path):
    """A request larger than the largest AOT bucket errors back to ITS
    caller; concurrent normal requests in the same window still succeed."""
    import threading

    import numpy as np

    from fuxictr_tpu.serving.microbatch import MicroBatcher

    pred, fm, batch = _bundle_predictor(tmp_path)
    feats = {k: np.asarray(v) for k, v in batch.items() if k in fm.features}
    mb = MicroBatcher(pred, linger_ms=20)
    big = {k: np.concatenate([v] * 5) for k, v in feats.items()}  # 80 > 64
    out = {}

    def ok():
        out["ok"] = mb.predict({k: v[:2] for k, v in feats.items()})

    def too_big():
        try:
            mb.predict(big)
            out["big"] = "no error"
        except ValueError as exc:
            out["big"] = exc

    threads = [threading.Thread(target=f) for f in (ok, too_big)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    mb.close()
    assert isinstance(out["big"], ValueError)
    assert np.shape(out["ok"]) == (2,)


def test_microbatch_close_drains_queue(tmp_path):
    """close() after in-flight requests must not deadlock and must leave
    every caller answered."""
    import threading

    import numpy as np

    from fuxictr_tpu.serving.microbatch import MicroBatcher

    pred, fm, batch = _bundle_predictor(tmp_path)
    feats = {k: np.asarray(v)[:1] for k, v in batch.items()
             if k in fm.features}
    mb = MicroBatcher(pred, linger_ms=50)
    done = []

    def one():
        done.append(np.shape(mb.predict(feats)))

    threads = [threading.Thread(target=one) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    mb.close()
    assert len(done) == 4
    with pytest.raises(RuntimeError):
        mb.predict(feats)             # closed batcher refuses new work
