"""Misc subsystem tests: config overrides, profiling timers, resume."""
import pytest
import numpy as np


def test_apply_overrides():
    from kpdiff_tpu.cli.train import apply_overrides

    cfg = {"dynamics": {"n_layers": 6}, "training": {"learning_rate": 1e-4}}
    apply_overrides(cfg, ["dynamics.n_layers=2", "training.learning_rate=0.001",
                          "graph.graph_cutoffs.ll=5.0", "experiment.name=sweep1"])
    assert cfg["dynamics"]["n_layers"] == 2
    assert cfg["training"]["learning_rate"] == 0.001
    assert cfg["graph"]["graph_cutoffs"]["ll"] == 5.0
    assert cfg["experiment"]["name"] == "sweep1"


def test_phase_timer():
    import time

    from kpdiff_tpu.utils.profiling import PhaseTimer

    t = PhaseTimer()
    with t.phase("a"):
        time.sleep(0.01)
    with t.phase("a"):
        pass
    rep = t.report()
    assert rep["a"]["count"] == 2
    assert rep["a"]["total_s"] >= 0.01
    assert "a:" in str(t)


@pytest.mark.slow
def test_train_resume_continues_step_count(tmp_path):
    import yaml

    from kpdiff_tpu.cli.train import main as train_main
    from tests.test_cli import TINY_CONFIG

    cfg = dict(TINY_CONFIG)
    cfg["experiment"] = {"name": "resume", "results_dir": str(tmp_path)}
    cfg_path = tmp_path / "cfg.yml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    run_dir, state1 = train_main(["--config", str(cfg_path), "--synthetic", "8", "--n_devices", "1"])
    step1 = int(state1.step)
    run_dir2, state2 = train_main(["--resume", str(run_dir), "--synthetic", "8",
                                   "--epochs", "2", "--n_devices", "1"])
    assert run_dir2 == run_dir
    assert int(state2.step) > step1


def test_prefetcher_yields_all_and_propagates_errors():
    from kpdiff_tpu.data.prefetch import prefetch

    assert list(prefetch(range(10))) == list(range(10))

    def gen():
        yield 1
        raise ValueError("boom")

    import pytest

    it = prefetch(gen())
    assert next(it) == 1
    with pytest.raises(ValueError):
        list(it)


def test_process_local_batch_slice():
    from kpdiff_tpu.parallel.distributed import process_local_batch_slice

    s = process_local_batch_slice(32)  # single process -> full batch
    assert s == slice(0, 32)
