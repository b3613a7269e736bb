"""Training-trajectory parity: starting from identical weights and data,
N full optimization steps (forward, PIT loss, backward, global-norm clip
0.25, Adam 1e-3) must track the reference-semantics torch implementation.
This is the strongest CPU-runnable evidence that training will reproduce
the reference's learning dynamics (and hence its SI-SDR) on real corpora."""

import itertools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from speech_separation_tpu.models import upit
from speech_separation_tpu.train.loop import (TrainLoopConfig, make_optimizer,
                                              make_update_step)


class TorchRef(torch.nn.Module):
    def __init__(self, F, S, H, L):
        super().__init__()
        self.blstm = torch.nn.LSTM(F, H, num_layers=L, bidirectional=True,
                                   batch_first=True)
        self.lin = torch.nn.Linear(2 * H, F * S)
        self.bn = torch.nn.BatchNorm1d(2 * H)
        self.F, self.S, self.H, self.L = F, S, H, L

    def forward(self, x, lengths):
        from torch.nn.utils.rnn import pack_padded_sequence, pad_packed_sequence
        packed = pack_padded_sequence(x, lengths, batch_first=True)
        B = x.shape[0]
        h0 = torch.zeros(self.L * 2, B, self.H)
        out, _ = self.blstm(packed, (h0, h0.clone()))
        out, _ = pad_packed_sequence(out, batch_first=True)
        out = self.bn(out.permute(0, 2, 1).contiguous()).permute(0, 2, 1)
        return torch.sigmoid(self.lin(out))


def _copy_params(params, model):
    sd = model.state_dict()
    for li, layer in enumerate(params["blstm"]):
        for direction, sfx in (("fwd", ""), ("bwd", "_reverse")):
            p = layer[direction]
            sd[f"blstm.weight_ih_l{li}{sfx}"] = torch.tensor(np.asarray(p["w_ih"]).T.copy())
            sd[f"blstm.weight_hh_l{li}{sfx}"] = torch.tensor(np.asarray(p["w_hh"]).T.copy())
            sd[f"blstm.bias_ih_l{li}{sfx}"] = torch.tensor(np.asarray(p["b"]).copy())
            sd[f"blstm.bias_hh_l{li}{sfx}"] = torch.tensor(np.zeros_like(np.asarray(p["b"])))
    sd["lin.weight"] = torch.tensor(np.asarray(params["lin"]["w"]).T.copy())
    sd["lin.bias"] = torch.tensor(np.asarray(params["lin"]["b"]).copy())
    sd["bn.weight"] = torch.tensor(np.asarray(params["bn"]["gamma"]).copy())
    sd["bn.bias"] = torch.tensor(np.asarray(params["bn"]["beta"]).copy())
    model.load_state_dict(sd)


def test_five_step_loss_trajectory_matches_torch():
    F, S, H, L = 9, 2, 6, 2
    B, T = 4, 14
    lengths = [14, 11, 8, 5]  # descending, as the reference collator sorts
    cfg = upit.Config(feat_dim=F, num_spk=S, hidden=H, num_layers=L,
                      zero_init_hidden=True)
    params, state = upit.init(jax.random.PRNGKey(0), cfg)

    tm = TorchRef(F, S, H, L)
    _copy_params(params, tm)
    topt = torch.optim.Adam(tm.parameters(), lr=1e-3)

    rng = np.random.default_rng(0)
    mix = np.abs(rng.standard_normal((B, T, F))).astype(np.float32)
    sources = np.abs(rng.standard_normal((B, S, T, F))).astype(np.float32)
    for b, n in enumerate(lengths):
        mix[b, n:] = 0.0
        sources[b, :, n:] = 0.0

    batch = {"mix": jnp.asarray(mix), "sources": jnp.asarray(sources),
             "lengths": jnp.asarray(lengths, dtype=jnp.int32),
             "row_mask": jnp.ones((B,), jnp.float32)}
    optimizer = make_optimizer(TrainLoopConfig())
    opt_state = optimizer.init(params)
    step = make_update_step(upit, cfg, optimizer)

    perms = list(itertools.permutations(range(S)))
    mix_t = torch.tensor(mix)
    srcs_t = [torch.tensor(sources[:, i]) for i in range(S)]
    norm = float(sum(lengths)) * F

    jax_losses, torch_losses = [], []
    key = jax.random.PRNGKey(1)
    for it in range(5):
        params, state, opt_state, loss, _ = step(params, state, opt_state,
                                                 batch, key)
        jax_losses.append(float(loss))

        tm.train()
        tm.zero_grad()
        mask = tm(mix_t, lengths)
        masked = mask * torch.cat([mix_t] * S, dim=2)
        losses = torch.stack([
            torch.sum(((masked - torch.cat([srcs_t[i] for i in p], dim=2)) ** 2
                       ).reshape(B, -1), dim=1) for p in perms])
        mins, _ = torch.min(losses, 0)
        tloss = torch.sum(mins) / S / norm
        tloss.backward()
        torch.nn.utils.clip_grad_norm_(tm.parameters(), 0.25)
        topt.step()
        torch_losses.append(float(tloss))

    # step 0 is the identical forward (same weights, no update yet): exact
    np.testing.assert_allclose(jax_losses[0], torch_losses[0], rtol=1e-6)
    # later steps drift by float32 reduction-order noise amplified through
    # the global-norm clip rescale (~1e-4 relative per step)
    np.testing.assert_allclose(jax_losses, torch_losses, rtol=2e-3)
    # and the loss is actually decreasing in both
    assert jax_losses[-1] < jax_losses[0]
    assert torch_losses[-1] < torch_losses[0]
