"""LR / loss-weight scheduling as pure functions of fractional epoch.

Reproduces the reference Scheduler (models/scheduler.py:7-85): linear
warmup, optional linear/cosine LR restarts, and sigmoid decay of the
receptor-encoder loss weight. Pure functions -> usable both host-side
(logging) and inside a jitted train step.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SchedulerConfig:
    base_lr: float = 1e-4
    warmup_length: float = 0.0  # epochs
    restart_interval: float = 0.0  # epochs; 0 -> no restarts
    restart_type: str = "cosine"  # 'linear' | 'cosine'
    rec_enc_loss_weight: float = 0.1
    rec_enc_weight_decay_midpoint: float = 0.0  # 0 -> constant weight
    rec_enc_weight_decay_scale: float = 1.0


def learning_rate(cfg: SchedulerConfig, epoch_exact):
    """LR at fractional epoch (scheduler.py:42-62).

    During warmup: base_lr * epoch/warmup. After warmup with restarts the
    reference anchors each interval at the moment the previous one ended;
    for a fixed restart_interval that is equivalent to cycling on
    (epoch - warmup) mod interval, which is the form used here so the
    function stays stateless and jittable.
    """
    e = jnp.asarray(epoch_exact, jnp.float32)
    base = jnp.asarray(cfg.base_lr, jnp.float32)

    warm = base * e / max(cfg.warmup_length, 1e-9)

    if cfg.restart_interval > 0:
        into = jnp.mod(e - cfg.warmup_length, cfg.restart_interval)
        if cfg.restart_type == "linear":
            after = base * (1.0 - into / cfg.restart_interval)
        elif cfg.restart_type == "cosine":
            after = 0.5 * base * (1.0 + jnp.cos(into * np.pi / cfg.restart_interval))
        else:
            raise NotImplementedError(cfg.restart_type)
    else:
        after = base

    if cfg.warmup_length > 0:
        return jnp.where(e <= cfg.warmup_length, warm, after)
    return after


def rec_encoder_weight(cfg: SchedulerConfig, epoch_exact):
    """Sigmoid decay of the OT-loss weight (scheduler.py:65-74)."""
    if cfg.rec_enc_weight_decay_midpoint == 0:
        return jnp.asarray(cfg.rec_enc_loss_weight, jnp.float32)
    e = jnp.asarray(epoch_exact, jnp.float32)
    mid = cfg.rec_enc_weight_decay_midpoint
    scale = cfg.rec_enc_weight_decay_scale
    coeff = 1.0 - 1.0 / (1.0 + jnp.exp(-(e - mid) * scale))
    return coeff * cfg.rec_enc_loss_weight


def is_restart_boundary(cfg: SchedulerConfig, prev_epoch: float, epoch: float) -> bool:
    """Host-side check for 'save a checkpoint at each restart' (scheduler.py:60-62)."""
    if cfg.restart_interval <= 0:
        return False
    if epoch <= cfg.warmup_length:
        return False
    k_prev = int(max(prev_epoch - cfg.warmup_length, 0) // cfg.restart_interval)
    k_now = int(max(epoch - cfg.warmup_length, 0) // cfg.restart_interval)
    return k_now > k_prev
