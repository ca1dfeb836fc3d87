"""Bucketed ligand padding: every complex lands in the smallest fitting
bucket; all items served; shapes static per bucket."""
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
