"""Reference-semantics torch transcriptions shared by the parity tests.

These re-state the reference architectures and loss rules
(/root/reference/archs/uPIT.py, /root/reference/archs/RSH.py) with modern
torch APIs so the JAX implementation can be compared step for step:

- uPIT: packed BLSTM -> pad -> BatchNorm1d(2H) -> Linear(2H -> F*S) ->
  sigmoid (archs/uPIT.py:97-147); loss = min over permutations of the summed
  elementwise MSE, (sum_b min)/S / (sum len * F) (archs/uPIT.py:157-206).
- RSH: packed BLSTM(2F) -> pad -> BN -> Linear(2H -> F) -> sigmoid, ONE mask
  per pass (archs/RSH.py:141-187); compute_loss runs num_spk passes with
  greedy +Inf source exclusion and ALWAYS relus the residual attention
  update (archs/RSH.py:197-259 — the relu at :256 is unconditional, CV
  included); compute_masks subtracts without relu (archs/RSH.py:262-287).
  Loss/norm accumulate ACROSS speaker-count sub-batches of one batch and
  the trainer takes a single optimizer step (steps/train_qsub.py:116-122).

All transcriptions use zero initial hidden state; the reference's random
init (archs/uPIT.py:121-127) is config-gated off on the JAX side for
deterministic comparison.
"""

import numpy as np
import torch
import torch.nn.functional as torchF
from torch.nn.utils.rnn import pack_padded_sequence, pad_packed_sequence


class TorchUPIT(torch.nn.Module):
    def __init__(self, F, S, H, L):
        super().__init__()
        self.blstm = torch.nn.LSTM(F, H, num_layers=L, bidirectional=True,
                                   batch_first=True)
        self.lin = torch.nn.Linear(2 * H, F * S)
        self.bn = torch.nn.BatchNorm1d(2 * H)
        self.F, self.S, self.H, self.L = F, S, H, L

    def forward(self, x_pad, lengths):
        packed = pack_padded_sequence(x_pad, lengths, batch_first=True,
                                      enforce_sorted=False)
        B = x_pad.shape[0]
        h0 = torch.zeros(self.L * 2, B, self.H)
        out, _ = self.blstm(packed, (h0, h0.clone()))
        out, _ = pad_packed_sequence(out, batch_first=True,
                                     total_length=x_pad.shape[1])
        out = self.bn(out.permute(0, 2, 1).contiguous()).permute(0, 2, 1)
        return torch.sigmoid(self.lin(out))


class TorchRSH(torch.nn.Module):
    """Reference RSH SepDNN (archs/RSH.py:141-187): hidden state is an
    attribute that each forward reuses and overwrites (:172), carrying
    state between extraction passes within a sub-batch."""

    def __init__(self, F, H, L):
        super().__init__()
        self.blstm = torch.nn.LSTM(2 * F, H, num_layers=L, bidirectional=True,
                                   batch_first=True)
        self.lin = torch.nn.Linear(2 * H, F)
        self.bn = torch.nn.BatchNorm1d(2 * H)
        self.F, self.H, self.L = F, H, L
        self.hidden = None

    def init_hidden(self, B):
        h = torch.zeros(self.L * 2, B, self.H)
        self.hidden = (h, h.clone())

    def forward(self, packed, total_length):
        out, self.hidden = self.blstm(packed, self.hidden)
        out, _ = pad_packed_sequence(out, batch_first=True,
                                     total_length=total_length)
        out = self.bn(out.permute(0, 2, 1).contiguous()).permute(0, 2, 1)
        return torch.sigmoid(self.lin(out))


def copy_blstm_to_torch(sd, params_blstm, prefix="blstm"):
    for li, layer in enumerate(params_blstm):
        for direction, sfx in (("fwd", ""), ("bwd", "_reverse")):
            p = layer[direction]
            sd[f"{prefix}.weight_ih_l{li}{sfx}"] = torch.tensor(
                np.asarray(p["w_ih"]).T.copy())
            sd[f"{prefix}.weight_hh_l{li}{sfx}"] = torch.tensor(
                np.asarray(p["w_hh"]).T.copy())
            sd[f"{prefix}.bias_ih_l{li}{sfx}"] = torch.tensor(
                np.asarray(p["b"]).copy())
            sd[f"{prefix}.bias_hh_l{li}{sfx}"] = torch.tensor(
                np.zeros_like(np.asarray(p["b"])))


def copy_params_to_torch(params, model):
    """JAX param pytree (upit/rsh layout) -> torch state dict."""
    sd = model.state_dict()
    copy_blstm_to_torch(sd, params["blstm"])
    sd["lin.weight"] = torch.tensor(np.asarray(params["lin"]["w"]).T.copy())
    sd["lin.bias"] = torch.tensor(np.asarray(params["lin"]["b"]).copy())
    sd["bn.weight"] = torch.tensor(np.asarray(params["bn"]["gamma"]).copy())
    sd["bn.bias"] = torch.tensor(np.asarray(params["bn"]["beta"]).copy())
    model.load_state_dict(sd)


def upit_loss(model, mix_pad, sources_pad, lengths):
    """archs/uPIT.py:157-206. mix_pad (B,T,F) zero-padded; sources_pad
    (B,S,T,F); lengths list[int]. Returns (loss, norm) torch scalars."""
    import itertools
    B, T, F = mix_pad.shape
    S = sources_pad.shape[1]
    mask = model(mix_pad, lengths)
    masked = mask * torch.cat([mix_pad] * S, dim=2)
    perms = list(itertools.permutations(range(S)))
    losses = torch.stack([
        torch.sum(((masked - torch.cat([sources_pad[:, i] for i in p], dim=2))
                   ** 2).reshape(B, -1), dim=1) for p in perms])
    mins, _ = torch.min(losses, 0)
    norm = float(sum(lengths)) * F
    return torch.sum(mins) / S / norm, norm


def rsh_subbatch_loss(model, combo_pad, sources_pad, lengths):
    """One speaker-count sub-batch of archs/RSH.py:197-259 compute_loss.

    combo_pad: (B, T, 2F) = concat(mix magnitude, ones-within-length);
    sources_pad: (B, S, T, F) zero-padded; lengths: list[int].
    Returns (loss_unnormalized, norm) — the caller accumulates across
    sub-batches and divides once, like the reference.
    """
    B, T, _ = combo_pad.shape
    S = sources_pad.shape[1]
    F = model.F
    model.init_hidden(B)
    combo = pack_padded_sequence(combo_pad, lengths, batch_first=True,
                                 enforce_sorted=False)
    sources = [sources_pad[:, i] for i in range(S)]
    source_usage = [[] for _ in range(S)]
    loss = 0.0
    norm = 0.0
    for _ in range(S):
        mask_out = model(combo, T)
        combos, lens = pad_packed_sequence(combo, batch_first=True,
                                           total_length=T)
        mixes = combos[..., :F]
        masked = mask_out * mixes
        losses = torch.stack([
            torch.sum(((masked - src) ** 2).reshape(B, -1), dim=1)
            for src in sources])
        for si in range(S):
            for idx in source_usage[si]:
                losses[si][idx] = float("inf")
        min_losses, indices = torch.min(losses, 0)
        for b in range(B):
            source_usage[int(indices[b])].append(b)
        loss = loss + torch.sum(min_losses) / S
        norm += float(sum(lengths)) * F
        # archs/RSH.py:254-257 — relu'd residual update, unconditionally
        residual = torch.cat((torch.zeros_like(mask_out), mask_out), 2)
        combos = torchF.relu(combos - residual)
        combo = pack_padded_sequence(combos, lens, batch_first=True,
                                     enforce_sorted=False)
    return loss, norm


def rsh_loss(model, sub_batches):
    """Full MultiSpkBatch compute_loss: accumulate loss/norm across
    speaker-count sub-batches, return (loss/norm, norm)
    (archs/RSH.py:204-259)."""
    loss = 0.0
    norm = 0.0
    for combo_pad, sources_pad, lengths in sub_batches:
        l, n = rsh_subbatch_loss(model, combo_pad, sources_pad, lengths)
        loss = loss + l
        norm += n
    return loss / norm, norm


def rsh_masks(model, combo_pad, lengths, num_spk):
    """archs/RSH.py:262-287 compute_masks: no relu on the residual update.
    Returns (B, num_spk, T, F) mask tensor (padded positions included)."""
    B, T, _ = combo_pad.shape
    model.init_hidden(B)
    combo = pack_padded_sequence(combo_pad, lengths, batch_first=True,
                                 enforce_sorted=False)
    out = []
    for _ in range(num_spk):
        mask_out = model(combo, T)
        combos, lens = pad_packed_sequence(combo, batch_first=True,
                                           total_length=T)
        residual = torch.cat((torch.zeros_like(mask_out), mask_out), 2)
        combos = combos - residual
        combo = pack_padded_sequence(combos, lens, batch_first=True,
                                     enforce_sorted=False)
        out.append(mask_out)
    return torch.stack(out, dim=1)


def make_combo(mix_pad, lengths):
    """Reference combo input: concat(mix, attention) where attention is ones
    over the true length (archs/RSH.py:108-109 builds per-utterance ones;
    packing zero-pads them past each length)."""
    B, T, F = mix_pad.shape
    atten = torch.zeros(B, T, F)
    for b, n in enumerate(lengths):
        atten[b, :n] = 1.0
    return torch.cat([mix_pad, atten], dim=2)
