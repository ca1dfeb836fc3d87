"""Train-step throughput microbenchmark (loss+grad+Adam, one chip).

Usage: python benchmarks/micro_gvp_train.py [config=gvp_40kp] [batch=32] [n_lig=32]
Behind the BASELINE.md training-throughput table rows.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/kpdiff_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from kpdiff_tpu.config import PaddingConfig, load_config, model_from_config
from kpdiff_tpu.models.complex import synthetic_batch
from kpdiff_tpu.training.scheduler import SchedulerConfig
from kpdiff_tpu.training.trainer import TrainConfig, init_train_state, make_optimizer, make_train_step

config = sys.argv[1] if len(sys.argv) > 1 else "gvp_40kp"
batch = int(sys.argv[2]) if len(sys.argv) > 2 else 32
n_lig = int(sys.argv[3]) if len(sys.argv) > 3 else 32

cfg = load_config(f"/root/repo/configs/{config}.yml")
model = model_from_config(cfg)
pad = PaddingConfig.from_config(cfg)
kp_vec = 16 if model.cfg.architecture == "gvp" else None
cpx = synthetic_batch(0, batch=batch, n_rec_pad=pad.n_rec, n_lig_pad=n_lig,
    n_rec_feat=10, n_lig_feat=10, n_kp=pad.n_kp, kp_feat_dim=model.cfg.rec_nf,
    kp_vec_dim=kp_vec, n_ip_pad=pad.n_ip, min_rec=260, min_lig=18, min_sep=1.8)
tc = TrainConfig(scheduler=SchedulerConfig(base_lr=1e-4))
opt = make_optimizer(tc)
state = init_train_state(model, opt, jax.random.key(0), cpx)
step = make_train_step(model, tc, opt, iters_per_epoch=100)
state, m = step(state, jax.random.key(1), cpx); float(m["l2"])
N = 10; t0 = time.time()
for i in range(N):
    state, m = step(state, jax.random.key(2 + i), cpx)
float(m["l2"]); dt = (time.time() - t0) / N
print(f"{config} train step (b{batch}, lig{n_lig}): {dt*1000:.0f} ms -> {batch/dt:.0f} complexes/s")
