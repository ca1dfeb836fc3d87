"""Bucketed ligand padding: every complex lands in the smallest fitting
bucket; all items served; shapes static per bucket."""
import pytest
import numpy as np

from kpdiff_tpu.config import PaddingConfig
from kpdiff_tpu.data.dataset import PaddedLoader, synthetic_dataset


def test_bucketed_loader():
    ds = synthetic_dataset(40, seed=0, rec_range=(16, 40), lig_range=(4, 24))
    pad = PaddingConfig(n_rec=40, n_lig=24, n_kp=40, n_ip=16)
    loader = PaddedLoader(ds, pad, batch_size=4, n_kp=40, kp_feat_dim=10,
                          lig_buckets=[8, 16, 24], seed=1)
    seen = 0
    shapes = set()
    for batch in loader.epoch():
        nl = batch.lig_x.shape[1]
        shapes.add(nl)
        assert nl in (8, 16, 24)
        # every real ligand fits its bucket and would NOT fit the next-smaller one... at least fits
        counts = np.asarray(batch.lig_mask).sum(axis=1)
        assert (counts <= nl).all()
        seen += int((counts > 0).sum())
    assert seen == 40 - loader.n_dropped
    assert loader.n_dropped == 0
    assert len(shapes) >= 2  # multiple buckets actually used


def test_bucket_mismatch_raises():
    import pytest

    ds = synthetic_dataset(4, seed=0)
    pad = PaddingConfig(n_rec=96, n_lig=24, n_kp=8, n_ip=16)
    with pytest.raises(ValueError):
        PaddedLoader(ds, pad, batch_size=2, n_kp=8, kp_feat_dim=10, lig_buckets=[8, 16])


def test_derive_lig_buckets():
    from kpdiff_tpu.data.dataset import derive_lig_buckets

    rng = np.random.default_rng(0)
    # BindingMOAD-like: median ~18, tail to 48
    sizes = np.clip(rng.gamma(6, 3.2, size=5000).astype(int) + 2, 2, 48)
    buckets = derive_lig_buckets(sizes, 48)
    assert buckets[-1] == 48 and len(buckets) <= 3
    assert all(b % 8 == 0 for b in buckets)
    bs = np.asarray(buckets)
    cost = np.mean(bs[np.searchsorted(bs, sizes)] ** 2)
    assert cost < 48 ** 2 * 0.6  # real savings vs single-capacity padding

    # degenerate inputs fall back to the single capacity
    assert derive_lig_buckets(np.array([]), 48) == [48]
    assert derive_lig_buckets(np.array([48] * 10), 48) == [48]


@pytest.mark.slow
def test_cli_bucketed_train_and_sample(tmp_path):
    """lig_buckets: auto flows through the train and sample CLIs."""
    import yaml
    from tests.test_cli import TINY_CONFIG
    from kpdiff_tpu.cli.train import main as train_main
    from kpdiff_tpu.cli.sample import main as sample_main

    cfg = dict(TINY_CONFIG)
    cfg["experiment"] = {"name": "bkt", "results_dir": str(tmp_path)}
    cfg["padding"] = dict(cfg["padding"], lig_buckets="auto")
    cfg_path = tmp_path / "bkt.yml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    run_dir, _ = train_main(["--config", str(cfg_path), "--synthetic", "12", "--n_devices", "1"])

    out = tmp_path / "sampled"
    sample_main([
        "--model_dir", str(run_dir), "--synthetic", "2", "--samples_per_pocket", "2",
        "--max_batch_size", "2", "--max_tries", "1", "--out", str(out),
    ])
    assert (out / "pocket_0" / "raw_ligands.sdf").exists()


def test_resolve_lig_buckets_validates_capacity():
    from kpdiff_tpu.data.dataset import resolve_lig_buckets, synthetic_dataset

    ds = synthetic_dataset(8, seed=0)
    assert resolve_lig_buckets({}, ds, 48) is None
    assert resolve_lig_buckets({"padding": {"lig_buckets": [48, 16]}}, ds, 48) == [16, 48]
    with pytest.raises(ValueError):
        resolve_lig_buckets({"padding": {"lig_buckets": [16, 64]}}, ds, 48)
    auto = resolve_lig_buckets({"padding": {"lig_buckets": "auto"}}, ds, 48)
    assert auto[-1] == 48
