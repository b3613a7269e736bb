"""Reference mixed-batch RSH semantics (VERDICT round-1 missing #3).

The reference draws ONE shuffled batch, splits it into speaker-count
sub-batches (archs/RSH.py:46-70), sums loss/norm across them, and takes ONE
optimizer step (steps/train_qsub.py:116-122). reference_batching=True
reproduces that with per-sub-batch gradient accumulation; this test pins a
multi-step trajectory on a 1/2/3-speaker corpus against the torch
transcription, and runs the full train() driver in that mode.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from speech_separation_tpu.models import rsh
from speech_separation_tpu.train.data import (BatchPlan, FeatureDataset,
                                              collate_mixed_batch,
                                              plan_batches)
from speech_separation_tpu.train.loop import (TrainLoopConfig, make_optimizer,
                                              make_apply_step, make_grad_step)

from torch_ref import TorchRSH, copy_params_to_torch, make_combo, rsh_loss

F, H, L = 9, 6, 2
N_UTTS, BATCH = 18, 6


def _write_corpus(root):
    """Mixed 1/2/3-speaker npz feature corpus in the reference format
    (keys mix,s1..sN as (freq, time) float32)."""
    rng = np.random.default_rng(0)
    os.makedirs(root, exist_ok=True)
    scp, u2s = [], []
    for i in range(N_UTTS):
        s = 1 + i % 3
        # lengths quantized to multiples of 4: with time_pad_multiple=4 the
        # padded T equals the sub-batch max exactly (BN parity with torch's
        # pad_packed_sequence) while keeping the number of distinct compiled
        # shapes small enough for the 1-CPU test host
        t = int(rng.choice([8, 12]))
        arrs = {"mix": np.abs(rng.standard_normal((F, t))).astype(np.float32)}
        for k in range(s):
            arrs[f"s{k + 1}"] = np.abs(
                rng.standard_normal((F, t))).astype(np.float32)
        path = os.path.join(root, f"u{i:02d}.npz")
        np.savez(path, **arrs)
        scp.append(f"u{i:02d} {path}")
        u2s.append(f"u{i:02d} {s}")
    with open(os.path.join(root, "feats_train.scp"), "w") as f:
        f.write("\n".join(scp) + "\n")
    with open(os.path.join(root, "utt2num_spk"), "w") as f:
        f.write("\n".join(u2s) + "\n")


def _torch_subbatch(sb):
    """Device sub-batch dict -> (combo, sources, lengths) for torch_ref,
    restricted to the real rows (torch has no shape-padding dummies)."""
    n = int(np.sum(np.asarray(sb["row_mask"]) > 0))
    mix = torch.tensor(np.asarray(sb["mix"][:n]))
    sources = torch.tensor(np.asarray(sb["sources"][:n]))
    lengths = [int(x) for x in np.asarray(sb["lengths"][:n])]
    return make_combo(mix, lengths), sources, lengths


def test_mixed_batch_trajectory_matches_torch(tmp_path):
    _write_corpus(str(tmp_path / "feats"))
    ds = FeatureDataset(str(tmp_path / "feats"), "train")
    plan = BatchPlan(batch_size=BATCH, time_pad_multiple=4)

    cfg = rsh.Config(feat_dim=F, hidden=H, num_layers=L, zero_init_hidden=True)
    params, state = rsh.init(jax.random.PRNGKey(0), cfg)
    tm = TorchRSH(F, H, L)
    copy_params_to_torch(params, tm)
    topt = torch.optim.Adam(tm.parameters(), lr=1e-3)

    optimizer = make_optimizer(TrainLoopConfig())
    opt_state = optimizer.init(params)
    grad_step = make_grad_step(rsh, cfg)
    apply_step = make_apply_step(optimizer)

    key = jax.random.PRNGKey(1)
    j_losses, t_losses = [], []
    for epoch in range(2):
        for idxs in plan_batches(ds, plan, epoch, num_spks=None):
            subs = collate_mixed_batch(ds, idxs, plan, ds.num_spks)
            # speaker counts really are mixed within one batch
            if epoch == 0 and len(j_losses) == 0:
                assert len(subs) > 1

            total_sum, norm_sum, acc = 0.0, 0.0, None
            for sb in subs:
                key, sub_key = jax.random.split(key)
                dev = {k: jnp.asarray(v) for k, v in sb.items()
                       if isinstance(v, np.ndarray)}
                total, norm, state, grads = grad_step(params, state, dev,
                                                      sub_key)
                total_sum += float(total)
                norm_sum += float(norm)
                acc = (grads if acc is None else
                       jax.tree_util.tree_map(jnp.add, acc, grads))
            params, opt_state = apply_step(params, opt_state, acc,
                                           jnp.float32(norm_sum))
            j_losses.append(total_sum / norm_sum)

            tm.train()
            tm.zero_grad()
            tloss, _ = rsh_loss(tm, [_torch_subbatch(sb) for sb in subs])
            tloss.backward()
            torch.nn.utils.clip_grad_norm_(tm.parameters(), 0.25)
            topt.step()
            t_losses.append(float(tloss))

    assert len(j_losses) == 6  # 2 epochs x 3 mixed batches
    np.testing.assert_allclose(j_losses[0], t_losses[0], rtol=1e-5)
    np.testing.assert_allclose(j_losses, t_losses, rtol=2e-3)


def test_train_driver_reference_batching(tmp_path):
    """The full train() loop runs in reference_batching mode: one step per
    mixed batch, decreasing loss, CV computed over sub-batches."""
    from speech_separation_tpu.train.loop import train

    _write_corpus(str(tmp_path / "feats"))
    cfg = TrainLoopConfig(arch="RSH", batch_size=BATCH, num_epochs=2,
                          time_pad_multiple=4, reference_batching=True,
                          cv_every=2, make_plots=False, seed=0)
    out = train(str(tmp_path / "feats"), str(tmp_path / "exp"), cfg,
                cv_data_dir=str(tmp_path / "feats"),
                model_kwargs={"feat_dim": str(F), "hidden": str(H),
                              "num_layers": str(L)},
                use_mesh=False)
    losses = [float(l.split()[1]) for l in
              open(tmp_path / "exp" / "train_stats" / "train_loss.txt")]
    assert len(losses) == 2
    assert losses[-1] < losses[0]
    cv = open(tmp_path / "exp" / "train_stats" / "cv_loss.txt").read().split()
    assert cv[0] == "002" and np.isfinite(float(cv[1]))


def test_train_driver_reference_batching_on_mesh(tmp_path):
    """Mixed-batch mode on the 8-device mesh: sub-batches with indivisible
    row counts go through shard_batch's dummy-row padding (round-3 change:
    they previously replicated silently); per-epoch losses must match the
    single-device run exactly up to reduction order."""
    import jax
    from speech_separation_tpu.train.loop import train

    assert len(jax.devices()) == 8
    _write_corpus(str(tmp_path / "feats"))
    kwargs = {"feat_dim": str(F), "hidden": str(H), "num_layers": str(L),
              "zero_init_hidden": "true"}  # random hidden is shape-dependent

    def run(tag, use_mesh):
        cfg = TrainLoopConfig(arch="RSH", batch_size=BATCH, num_epochs=2,
                              time_pad_multiple=4, reference_batching=True,
                              cv_every=2, make_plots=False, seed=0)
        train(str(tmp_path / "feats"), str(tmp_path / f"exp_{tag}"), cfg,
              cv_data_dir=str(tmp_path / "feats"), model_kwargs=kwargs,
              use_mesh=use_mesh)
        stats = tmp_path / f"exp_{tag}" / "train_stats"
        return ([float(l.split()[1]) for l in open(stats / "train_loss.txt")],
                [float(l.split()[1]) for l in open(stats / "cv_loss.txt")])

    mesh_tr, mesh_cv = run("mesh", True)
    single_tr, single_cv = run("single", False)
    np.testing.assert_allclose(mesh_tr, single_tr, rtol=2e-4)
    np.testing.assert_allclose(mesh_cv, single_cv, rtol=2e-4)
