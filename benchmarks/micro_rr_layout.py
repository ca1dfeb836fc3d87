import time, sys, numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/tmp/kpdiff_jax_cache")
from kpdiff_tpu.config import PaddingConfig, load_config, model_from_config
from kpdiff_tpu.models.complex import synthetic_batch
from kpdiff_tpu.training.trainer import TrainConfig, init_train_state, make_optimizer, make_train_step
from kpdiff_tpu.training.scheduler import SchedulerConfig

layout = sys.argv[1]; cap = int(sys.argv[2]) if len(sys.argv) > 2 else 32
cfg = load_config("/root/repo/configs/egnn_40kp.yml")
cfg["rec_encoder"]["rr_layout"] = layout
cfg["rec_encoder"]["rr_max_neighbors"] = cap
model = model_from_config(cfg)
pad = PaddingConfig.from_config(cfg)
cpx = synthetic_batch(0, batch=64, n_rec_pad=pad.n_rec, n_lig_pad=32,
    n_rec_feat=10, n_lig_feat=10, n_kp=pad.n_kp, kp_feat_dim=model.cfg.rec_nf,
    n_ip_pad=pad.n_ip, min_rec=260, min_lig=18, min_sep=1.8)
tc = TrainConfig(scheduler=SchedulerConfig(base_lr=1e-4))
opt = make_optimizer(tc)
state = init_train_state(model, opt, jax.random.key(0), cpx)
step = make_train_step(model, tc, opt, iters_per_epoch=100)
state, m = step(state, jax.random.key(1), cpx); float(m["l2"])
N=10; t0=time.time()
for i in range(N):
    state, m = step(state, jax.random.key(2+i), cpx)
float(m["l2"]); dt=(time.time()-t0)/N
print(f"egnn_40kp train step b64 rr_layout={layout}(cap{cap}): {dt*1000:.0f} ms -> {64/dt:.0f} complexes/s")
