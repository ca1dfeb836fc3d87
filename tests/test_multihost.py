"""Two-process multi-host smoke (VERDICT r2 item 9): the production
train step under `jax.distributed.initialize` with 2 localhost CPU
processes x 2 devices reproduces the single-process 4-device numbers.
Exercises parallel/distributed.py end-to-end (initialize_multihost,
global_data_mesh, process_local_batch_slice)."""
import json
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
WORKER = REPO / "tests" / "multihost_worker.py"


def _run_workers(nproc, tmp_path, timeout=600):
    out = tmp_path / f"out_{nproc}.json"
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(nproc), str(pid), str(out)],
            cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(nproc)
    ]
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=timeout)
        logs.append(stdout)
        assert p.returncode == 0, f"worker failed:\n{stdout}"
    return json.loads(out.read_text()), logs


@pytest.mark.slow
def test_two_process_train_step_matches_single_process(tmp_path):
    multi, logs_m = _run_workers(2, tmp_path)
    single, _ = _run_workers(1, tmp_path)
    assert multi["l2"] == pytest.approx(single["l2"], rel=1e-5), (multi, single, logs_m)
    assert multi["checksum"] == pytest.approx(single["checksum"], rel=1e-5), (multi, single)
