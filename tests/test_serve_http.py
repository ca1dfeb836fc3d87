"""HTTP serving front (cli/serve_http.py): health, array sampling,
file-based sampling, and error paths — over a real socket."""
import json
import threading
import urllib.request
import urllib.error

import numpy as np
import pytest
import yaml

from tests.test_cli import TINY_CONFIG, _write_synthetic_complex_pdb_sdf


def _post(base, path, obj):
    req = urllib.request.Request(
        base + path, data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    with urllib.request.urlopen(req, timeout=600) as r:
        return r.status, json.loads(r.read())


@pytest.mark.slow
def test_serve_http_endpoints(tmp_path):
    from kpdiff_tpu.cli.train import main as train_main
    from kpdiff_tpu.cli.serve_http import make_server
    from kpdiff_tpu.serve import KeypointSampler

    cfg = dict(TINY_CONFIG)
    cfg["experiment"] = {"name": "srvhttp", "results_dir": str(tmp_path)}
    cfg_path = tmp_path / "cfg.yml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    run_dir, _ = train_main(["--config", str(cfg_path), "--synthetic", "8", "--n_devices", "1"])

    sampler = KeypointSampler(run_dir, batch_size=4, seed=0)
    server = make_server(sampler, port=0)
    port = server.server_address[1]
    base = f"http://127.0.0.1:{port}"
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(base + "/health", timeout=60) as r:
            health = json.loads(r.read())
        assert health["status"] == "ok" and health["lig_buckets"] == [8, 16]

        rng = np.random.default_rng(0)
        rec_pos = (rng.normal(size=(24, 3)) * 4).tolist()
        rec_feat = np.eye(10, dtype=np.float32)[rng.integers(0, 10, 24)].tolist()
        status, out = _post(base, "/sample",
                            {"rec_pos": rec_pos, "rec_feat": rec_feat,
                             "n_mols": 4, "ligand_size": 6})
        assert status == 200 and out["n"] == len(out["molecules"])
        for m in out["molecules"]:
            assert len(m["coords"]) == len(m["elements"]) >= 1
            assert np.isfinite(np.asarray(m["coords"])).all()
        if out["n"]:
            assert "V2000" in out["sdf"] and out["sdf"].count("$$$$") == out["n"]

        # file-based entry (BYOP pipeline over HTTP)
        pdb_path, sdf_path = _write_synthetic_complex_pdb_sdf(tmp_path)
        status, out2 = _post(base, "/sample_files",
                             {"receptor_pdb": open(pdb_path).read(),
                              "ref_ligand_sdf": open(sdf_path).read(),
                              "n_mols": 4, "ligand_size": "ref"})
        assert status == 200 and out2["n"] == len(out2["molecules"])

        # error paths keep the server alive and respond with JSON errors
        for path, body, want in [
            ("/sample", {"rec_feat": [[0.0]]}, 400),            # missing rec_pos
            ("/sample", {"rec_pos": [1, 2, 3], "rec_feat": [[0]]}, 400),  # bad shape
            ("/nope", {}, 404),
        ]:
            try:
                status, out3 = _post(base, path, body)
            except urllib.error.HTTPError as e:
                status, out3 = e.code, json.loads(e.read())
            assert status == want and "error" in out3
        with urllib.request.urlopen(base + "/health", timeout=60) as r:
            assert json.loads(r.read())["status"] == "ok"
    finally:
        server.shutdown()
        server.server_close()
