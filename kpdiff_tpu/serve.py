"""Programmatic serving API: load a trained run once, sample many pockets.

The reference's only serving story is re-running CLI scripts per pocket
(byop.py / test.py). This wraps the same pipeline as a resident object:
one jitted encode+scan executable is compiled per (ligand-size bucket,
kk cap) actually used and reused across requests, with host chemistry on
the way out. Each request batch is padded to the smallest bucket that
fits its largest requested ligand (the same ~30% win the CLIs get from
cli/sample.py's bucketing); buckets come from the run config's
padding.lig_buckets when it is an explicit list, else a multiples-of-8
ladder up to the padding capacity.

    from kpdiff_tpu.serve import KeypointSampler
    s = KeypointSampler("runs/egnn_40kp_.../", batch_size=64)
    mols = s.sample_for_pocket("prot.pdb", "ref_ligand.sdf", n_mols=100)
    # -> list of BuiltMolecule (positions, elements, perceived bonds)
"""
from __future__ import annotations

from pathlib import Path
from typing import List, Optional

import numpy as np


class KeypointSampler:
    def __init__(
        self,
        model_dir: str | Path,
        checkpoint_step: Optional[int] = None,
        batch_size: int = 64,
        seed: int = 0,
        sample_steps: int = 0,
        eta: float = 1.0,
        lig_buckets: Optional[List[int]] = None,
        kp_shard_devices: int = 0,
    ):
        """sample_steps: opt-in strided sampling (K < n_timesteps ancestral
        steps, ~T/K x faster at some quality cost); 0 = full chain.
        eta: DDIM noise scale — 1.0 (default) keeps the reference's ancestral
        chain bit-exact; 0.0 is deterministic DDIM (pair with sample_steps).
        lig_buckets: ascending ligand-padding buckets (last must equal the
        config's padding.n_lig); None resolves from the run config or falls
        back to a multiples-of-8 ladder.
        kp_shard_devices: > 1 shards the KEYPOINT axis of the reverse
        diffusion over that many devices (parallel/kp_shard.py) — the
        latency mode: per-chip kk pair traffic divides by the mesh size
        even at batch 1, where data parallelism does nothing."""
        import jax

        from kpdiff_tpu.utils.cache import enable_persistent_cache

        enable_persistent_cache()

        from kpdiff_tpu.config import PaddingConfig, load_config, model_from_config, resolve_feature_sizes
        from kpdiff_tpu.training.trainer import TrainConfig, init_train_state, load_checkpoint, make_optimizer

        self.model_dir = Path(model_dir)
        self.config = load_config(self.model_dir / "config.yml")
        self.model = model_from_config(self.config)
        self.pad = PaddingConfig.from_config(self.config)
        self.n_rec_feat, self.n_lig_feat, _ = resolve_feature_sizes(self.config)
        self.lig_elements = self.config["dataset"]["lig_elements"]
        self.batch_size = batch_size
        self.kp_vec_dim = (
            self.model.cfg.rec_encoder.get("vector_size", 16) if self.model.cfg.architecture == "gvp" else None
        )

        if lig_buckets is None:
            cfg_buckets = self.config.get("padding", {}).get("lig_buckets")
            if isinstance(cfg_buckets, (list, tuple)) and cfg_buckets:
                lig_buckets = sorted(int(b) for b in cfg_buckets)
            else:  # 'auto'/absent: no histogram at serving time -> 8-ladder
                lig_buckets = list(range(8, self.pad.n_lig + 1, 8))
                if not lig_buckets or lig_buckets[-1] != self.pad.n_lig:
                    lig_buckets.append(self.pad.n_lig)
        if lig_buckets[-1] != self.pad.n_lig:
            raise ValueError(
                f"largest lig bucket {lig_buckets[-1]} must equal padding.n_lig {self.pad.n_lig}")
        self.lig_buckets = lig_buckets

        from kpdiff_tpu.models.complex import synthetic_batch

        example = synthetic_batch(
            0, batch=batch_size, n_rec_pad=self.pad.n_rec, n_lig_pad=self.pad.n_lig,
            n_rec_feat=self.n_rec_feat, n_lig_feat=self.model.cfg.atom_nf,
            n_kp=self.pad.n_kp, kp_feat_dim=self.model.cfg.rec_nf,
            kp_vec_dim=self.kp_vec_dim, n_ip_pad=self.pad.n_ip,
        )
        opt = make_optimizer(TrainConfig())
        state = init_train_state(self.model, opt, jax.random.key(0), example)
        state = load_checkpoint(self.model_dir / "checkpoints", state, step=checkpoint_step)
        self.params = state.params

        model = self.model

        # encode once per batch, compact the static kk edges to the exact
        # capped neighbor list (kk pair work dominates flagship step time),
        # then run the jitted reverse-diffusion scan
        encode_fn = jax.jit(model.encode)
        sample_fn = jax.jit(lambda params, rng, enc, kk, init_com:
                            model.sample(params, rng, enc, kk, init_com=init_com,
                                         sample_steps=sample_steps, eta=eta))

        self._kk_cap = 0  # grow-only: one scan compile per cap increase

        self._mesh = None
        if kp_shard_devices > 1:
            from kpdiff_tpu.parallel.mesh import make_mesh, replicated

            self._mesh = make_mesh(kp_shard_devices, axis_names=("model",))
            self.params = jax.device_put(self.params, replicated(self._mesh))

        def _run(params, rng, cpx, init_com):
            enc, kk = encode_fn(params, cpx)
            kk = model.compact_kk(enc, kk, min_cap=self._kk_cap)
            if isinstance(kk, tuple):
                self._kk_cap = max(self._kk_cap, int(kk[0].shape[-1]))
            if self._mesh is not None:
                from kpdiff_tpu.parallel.kp_shard import shard_encoded

                enc, kk = shard_encoded(enc, kk, self._mesh, axis="model")
            return sample_fn(params, rng, enc, kk, init_com)

        self._run = _run
        self._rng = jax.random.key(seed)
        self._np_rng = np.random.default_rng(seed)

    # ------------------------------------------------------------------ API

    def sample_for_pocket(
        self,
        receptor_file: str | Path,
        ref_ligand_file: str | Path,
        n_mols: int = 32,
        ligand_size: str | int = "random",
    ) -> List:
        """PDB + reference-ligand SDF -> valid molecules (BYOP pipeline)."""
        from kpdiff_tpu.cli.byop import process_ligand_and_pocket

        data = process_ligand_and_pocket(str(receptor_file), str(ref_ligand_file), self.config)
        return self.sample_for_arrays(
            rec_pos=data["rec_pos"], rec_feat=data["rec_feat"], rec_res_idx=data["rec_res_idx"],
            interface_points=data["interface_points"],
            init_com=data["lig_pos"].mean(0),
            ref_n_atoms=data["lig_pos"].shape[0],
            n_mols=n_mols, ligand_size=ligand_size,
        )

    def sample_for_arrays(
        self,
        rec_pos: np.ndarray,
        rec_feat: np.ndarray,
        rec_res_idx: Optional[np.ndarray] = None,
        interface_points: Optional[np.ndarray] = None,
        init_com: Optional[np.ndarray] = None,
        ref_n_atoms: Optional[int] = None,
        n_mols: int = 32,
        ligand_size: str | int = "random",
    ) -> List:
        import jax

        from kpdiff_tpu.analysis.molecule_builder import build_molecule
        from kpdiff_tpu.cli.sample import _to_complex
        from kpdiff_tpu.data.dataset import pad_item

        n_rec = rec_pos.shape[0]
        if rec_res_idx is None:
            rec_res_idx = np.zeros(n_rec, np.int32)
        if interface_points is None:
            interface_points = np.zeros((0, 3), np.float32)

        if ligand_size == "random":
            from kpdiff_tpu.models.size_dist import LigandSizeDistribution

            try:
                dist = LigandSizeDistribution(Path(self.config["dataset"]["location"]))
            except (ValueError, FileNotFoundError):
                dist = LigandSizeDistribution("/root/reference/data/bindingmoad_processed")
            sizes = dist.sample(np.array([n_rec]), n_mols, self._np_rng)[0]
        elif ligand_size == "ref":
            sizes = np.full(n_mols, int(ref_n_atoms))
        else:
            sizes = np.full(n_mols, int(ligand_size))
        sizes = np.clip(sizes, 2, self.pad.n_lig)

        import dataclasses

        mols: List = []
        done = 0
        # process larger ligands first so each chunk's bucket is as tight as
        # possible (one executable per bucket actually used)
        sizes = np.sort(sizes)[::-1]
        while done < n_mols:
            bs = min(self.batch_size, n_mols - done)
            chunk = sizes[done : done + bs]
            bucket = next(b for b in self.lig_buckets if int(chunk.max()) <= b)
            pad_b = dataclasses.replace(self.pad, n_lig=bucket)
            items = []
            for j in range(bs):
                n = int(chunk[j])
                item = dict(
                    lig_pos=np.zeros((n, 3), np.float32),
                    lig_feat=np.zeros((n, len(self.lig_elements)), np.float32),
                    rec_pos=rec_pos.astype(np.float32), rec_feat=rec_feat.astype(np.float32),
                    rec_res_idx=rec_res_idx.astype(np.int32),
                    interface_points=interface_points.astype(np.float32),
                )
                padded = pad_item(item, pad_b, n_lig_feat_out=self.n_lig_feat)
                if padded is None:
                    raise ValueError(f"pocket ({n_rec} atoms) exceeds padding capacity {self.pad.n_rec}")
                items.append(padded)
            while len(items) < self.batch_size:
                items.append(items[-1])
            cpx = _to_complex(items, pad_b, self.model, self.kp_vec_dim)

            com = None
            if init_com is not None:
                com = np.broadcast_to(np.asarray(init_com, np.float32), (self.batch_size, 3))
            self._rng, k = jax.random.split(self._rng)
            out = self._run(self.params, k, cpx, com)
            lig_x, lig_h, lig_mask = map(np.asarray, (out["lig_x"], out["lig_h"], out["lig_mask"]))
            for b in range(bs):
                m = lig_mask[b]
                if m.sum() == 0:
                    continue
                feats = lig_h[b][m][:, : len(self.lig_elements)]
                elements = [self.lig_elements[j] for j in feats.argmax(1)]
                mol = build_molecule(lig_x[b][m], elements)
                if mol is not None:
                    mols.append(mol)
            done += bs
        return mols
