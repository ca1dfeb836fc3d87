"""In-training molecule-quality analyzer — reference ModelAnalyzer
(analysis/metrics.py:36-206): periodically sample a few test pockets and
report validity/connectivity/uniqueness/atom-type-KL + timing.
"""
from __future__ import annotations

import time
from typing import Dict, List, Optional

import numpy as np


class ModelAnalyzer:
    def __init__(
        self,
        model,
        dataset,
        pad,
        lig_elements: List[str],
        n_receptors: int = 4,
        n_replicates: int = 8,
        train_type_counts: Optional[np.ndarray] = None,
        train_keys: Optional[set] = None,
        seed: int = 0,
        diff_batch_size: int = 0,
    ):
        self.model = model
        self.ds = dataset
        self.pad = pad
        self.lig_elements = lig_elements
        self.n_receptors = n_receptors
        self.n_replicates = n_replicates
        self.train_type_counts = train_type_counts
        self.train_keys = train_keys
        self.rng = np.random.default_rng(seed)
        # Device batch per sampler launch (reference sampling_config.diff_batch_size,
        # test.py:149). 0 = one launch for all n_receptors*n_replicates molecules.
        # The heavy GVP variants hold (B, K, K, chain) pair tensors inside the
        # reverse-diffusion scan; at K=128+ a 96-molecule launch exceeds the
        # 16G v5e HBM, so in-training analysis must chunk like the CLIs do.
        self.diff_batch_size = int(diff_batch_size)
        self._jitted = None

    def sample_and_analyze(self, params, rng) -> Dict[str, object]:
        import jax

        from kpdiff_tpu.analysis.metrics import evaluate_samples
        from kpdiff_tpu.cli.sample import _to_complex
        from kpdiff_tpu.data.dataset import pad_item

        t0 = time.time()
        idxs = self.rng.choice(len(self.ds), size=min(self.n_receptors, len(self.ds)), replace=False)
        items = []
        for i in idxs:
            it = pad_item(self.ds.get(int(i)), self.pad, n_lig_feat_out=self.model.cfg.atom_nf)
            if it is not None:
                items.extend([it] * self.n_replicates)
        if not items:
            return {"analyzer_error": "no pockets fit the padding capacity"}
        kp_vec = self.model.cfg.rec_encoder.get("vector_size", 16) if self.model.cfg.architecture == "gvp" else None

        if self._jitted is None:
            model = self.model

            @jax.jit
            def run(params, rng, cpx):
                enc, kk = model.encode(params, cpx)
                return model.sample(params, rng, enc, kk, init_com=None)

            self._jitted = run

        n_items = len(items)
        # one executable for all launches: with diff_batch_size set, the
        # launch shape is ALWAYS diff_batch_size — even when fewer items
        # remain (pad_item can drop a varying number of pockets per call,
        # and a varying fallback shape would trigger a fresh jit compile
        # per invocation); repeats are discarded below
        cs = self.diff_batch_size if self.diff_batch_size > 0 else n_items
        while len(items) % cs:
            items.append(items[0])
        outs = []
        for start in range(0, len(items), cs):
            rng, sub = jax.random.split(rng)
            cpx = _to_complex(items[start:start + cs], self.pad, self.model, kp_vec)
            outs.append(jax.device_get(self._jitted(params, sub, cpx)))
        lig_x = np.concatenate([o["lig_x"] for o in outs])[:n_items]
        lig_h = np.concatenate([o["lig_h"] for o in outs])[:n_items]
        lig_mask = np.concatenate([o["lig_mask"] for o in outs])[:n_items]

        positions, elements = [], []
        for b in range(lig_x.shape[0]):
            m = lig_mask[b]
            if m.sum() == 0:
                continue
            feats = lig_h[b][m][:, : len(self.lig_elements)]
            positions.append(lig_x[b][m])
            elements.append([self.lig_elements[j] for j in feats.argmax(1)])

        metrics = evaluate_samples(
            positions, elements,
            train_keys=self.train_keys,
            train_type_counts=self.train_type_counts,
            element_list=self.lig_elements,
        )
        dt = time.time() - t0
        metrics["sample_time"] = dt
        # divide by molecules actually LAUNCHED (incl. pad duplicates), not
        # kept positions — the padded duplicates consume real device time,
        # so this is the true per-molecule throughput of the launches
        metrics["sec_per_mol"] = dt / max(len(items), 1)
        return metrics
