"""Optimizer construction (train/loop.py make_optimizer): the reference's
clip->Adam chain (train_qsub.py:95,121) plus the per-epoch lr-decay
staircase (lr_decay < 1.0 — the knob the time-domain literature's recipes
need, e.g. DPRNN's 0.98-every-2-epochs)."""

import jax.numpy as jnp
import pytest

from speech_separation_tpu.train.loop import TrainLoopConfig, make_optimizer


def _update_magnitudes(opt, n):
    """Adam with constant unit grads steps by exactly the current lr
    (m_hat/sqrt(v_hat) == sign(g) for constant g), so the update magnitude
    reads the schedule directly."""
    params = {"w": jnp.zeros(3)}
    s = opt.init(params)
    grads = {"w": jnp.ones(3)}
    mags = []
    for _ in range(n):
        u, s = opt.update(grads, s, params)
        mags.append(float(jnp.abs(u["w"]).max()))
    return mags


def test_lr_decay_staircase_steps_per_epoch():
    cfg = TrainLoopConfig(learning_rate=1.0, grad_clip=1e9, lr_decay=0.5)
    mags = _update_magnitudes(make_optimizer(cfg, steps_per_epoch=2), 6)
    # epochs of 2 steps: lr 1.0, 0.5, 0.25
    assert mags[0] == pytest.approx(1.0, rel=1e-4)
    assert mags[1] == pytest.approx(1.0, rel=1e-4)
    assert mags[2] == pytest.approx(0.5, rel=1e-4)
    assert mags[3] == pytest.approx(0.5, rel=1e-4)
    assert mags[4] == pytest.approx(0.25, rel=1e-4)


def test_lr_constant_by_default():
    cfg = TrainLoopConfig(learning_rate=1.0, grad_clip=1e9)
    mags = _update_magnitudes(make_optimizer(cfg, steps_per_epoch=2), 4)
    assert all(m == pytest.approx(1.0, rel=1e-4) for m in mags)
    # decay requested but no steps_per_epoch (step-factory callers):
    # constant lr, the reference behavior
    cfg = TrainLoopConfig(learning_rate=1.0, grad_clip=1e9, lr_decay=0.5)
    mags = _update_magnitudes(make_optimizer(cfg), 4)
    assert all(m == pytest.approx(1.0, rel=1e-4) for m in mags)


def test_grad_clip_still_first_in_chain():
    # clip 0.25 on a unit-norm gradient: Adam sees the clipped direction;
    # with constant grads the step magnitude is still lr (sign preserved)
    cfg = TrainLoopConfig(learning_rate=0.1, grad_clip=0.25)
    mags = _update_magnitudes(make_optimizer(cfg), 2)
    assert mags[0] == pytest.approx(0.1, rel=1e-4)
