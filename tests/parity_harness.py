"""Multi-epoch training-trajectory parity harness (shared by the pytest
suite and tools/run_parity.py, which writes PARITY.md).

Runs the SAME synthetic corpus through this framework's jit'd update/eval
steps and through the torch reference-semantics transcription
(tests/torch_ref.py), with identical batch order, and returns the per-step
train-loss and per-CV-epoch loss curves from both sides.

Reference semantics reproduced per step (steps/train_qsub.py:116-141):
forward -> loss -> backward -> clip_grad_norm_(0.25) -> Adam(1e-3); CV every
cv_every epochs in eval mode (BN running stats), full pass over the CV set,
norm-weighted average. Lengths are multiples of the pad quantum so padded T
equals the batch max exactly (BN statistics parity with pad_packed_sequence).
"""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from speech_separation_tpu.models import rsh, upit
from speech_separation_tpu.train.loop import (TrainLoopConfig, make_eval_step,
                                              make_optimizer, make_update_step)

from torch_ref import (TorchRSH, TorchUPIT, copy_params_to_torch, make_combo,
                       rsh_subbatch_loss, upit_loss)


def make_corpus(n_utts, F, S, length_choices, seed):
    """List of {'mix': (T,F), 'sources': (S,T,F), 'length': int} float32."""
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n_utts):
        t = int(rng.choice(length_choices))
        mix = np.abs(rng.standard_normal((t, F))).astype(np.float32)
        sources = np.abs(rng.standard_normal((S, t, F))).astype(np.float32)
        out.append({"mix": mix, "sources": sources, "length": t})
    return out


def _batches(corpus, batch_size, epoch, seed, shuffle=True, pad_multiple=1):
    order = (np.random.default_rng(seed * 100003 + epoch).permutation(len(corpus))
             if shuffle else np.arange(len(corpus)))
    for s in range(0, len(order), batch_size):
        idxs = order[s: s + batch_size]
        samples = [corpus[i] for i in idxs]
        T = max(s_["length"] for s_ in samples)
        T = ((T + pad_multiple - 1) // pad_multiple) * pad_multiple
        B = len(samples)
        F = samples[0]["mix"].shape[1]
        S = samples[0]["sources"].shape[0]
        mix = np.zeros((B, T, F), np.float32)
        sources = np.zeros((B, S, T, F), np.float32)
        lengths = np.zeros((B,), np.int32)
        for i, s_ in enumerate(samples):
            n = s_["length"]
            mix[i, :n] = s_["mix"]
            sources[i, :, :n] = s_["sources"]
            lengths[i] = n
        yield mix, sources, lengths


def _jax_batch(mix, sources, lengths):
    return {"mix": jnp.asarray(mix), "sources": jnp.asarray(sources),
            "lengths": jnp.asarray(lengths),
            "row_mask": jnp.ones((mix.shape[0],), jnp.float32)}


class _TorchSide:
    def __init__(self, arch_name, params, F, S, H, L):
        if arch_name == "uPIT":
            self.model = TorchUPIT(F, S, H, L)
        else:
            self.model = TorchRSH(F, H, L)
        copy_params_to_torch(params, self.model)
        self.opt = torch.optim.Adam(self.model.parameters(), lr=1e-3)
        self.arch_name = arch_name

    def loss(self, mix, sources, lengths):
        lens = [int(x) for x in lengths]
        if self.arch_name == "uPIT":
            loss, norm = upit_loss(self.model, torch.tensor(mix),
                                   torch.tensor(sources), lens)
        else:
            combo = make_combo(torch.tensor(mix), lens)
            loss, norm = rsh_subbatch_loss(self.model, combo,
                                           torch.tensor(sources), lens)
            loss = loss / norm
        return loss, norm

    def train_step(self, mix, sources, lengths):
        self.model.train()
        self.model.zero_grad()
        loss, _ = self.loss(mix, sources, lengths)
        loss.backward()
        torch.nn.utils.clip_grad_norm_(self.model.parameters(), 0.25)
        self.opt.step()
        return float(loss.detach())

    def cv_pass(self, cv_corpus, batch_size, seed, pad_multiple=1):
        self.model.eval()
        tot, nrm = 0.0, 0.0
        with torch.no_grad():
            for mix, sources, lengths in _batches(cv_corpus, batch_size, 0,
                                                  seed, shuffle=False,
                                                  pad_multiple=pad_multiple):
                loss, norm = self.loss(mix, sources, lengths)
                tot += float(loss) * norm
                nrm += norm
        return tot / nrm


def run_parity(arch_name, corpus, cv_corpus, *, F, S, H, L, batch_size,
               n_epochs, cv_every=5, seed=0, pad_multiple=1, with_torch=True,
               model_extra=None, step_fns=None, log=lambda s: None):
    """Returns dict with per-step 'j_train'/'t_train' and per-CV-point
    'j_cv'/'t_cv' loss lists, plus the final models ('params'/'state' on the
    JAX side, 'torch_model' when with_torch). with_torch=False runs only the
    JAX side (for seed-to-seed run-noise yardsticks). model_extra adds
    arch-Config kwargs to the JAX side only (e.g. compute_dtype='bfloat16'
    for the perf path; torch_ref has no such knob). step_fns, if given, is
    the (optimizer, step, eval_step) triple from a previous run with the
    same config — reusing it across seeds keeps the jit cache warm (one
    compile per shape per *config*, which matters on backends where each
    compile costs tens of seconds)."""
    arch = upit if arch_name == "uPIT" else rsh
    kwargs = dict(feat_dim=F, hidden=H, num_layers=L, zero_init_hidden=True)
    if arch_name == "uPIT":
        kwargs["num_spk"] = S
    kwargs.update(model_extra or {})
    cfg = arch.Config(**kwargs)
    params, state = arch.init(jax.random.PRNGKey(seed), cfg)

    tside = _TorchSide(arch_name, params, F, S, H, L) if with_torch else None

    if step_fns is None:
        optimizer = make_optimizer(TrainLoopConfig())
        step = make_update_step(arch, cfg, optimizer)
        eval_step = make_eval_step(arch, cfg)
    else:
        optimizer, step, eval_step = step_fns
    opt_state = optimizer.init(params)

    key = jax.random.PRNGKey(seed + 1)
    j_train, t_train, j_cv, t_cv = [], [], [], []
    for epoch in range(n_epochs):
        for mix, sources, lengths in _batches(corpus, batch_size, epoch, seed,
                                              pad_multiple=pad_multiple):
            key, sk = jax.random.split(key)
            batch = _jax_batch(mix, sources, lengths)
            params, state, opt_state, loss, _ = step(params, state, opt_state,
                                                     batch, sk)
            j_train.append(float(loss))
            if tside:
                t_train.append(tside.train_step(mix, sources, lengths))
        if (epoch + 1) % cv_every == 0 and cv_corpus:
            tot, nrm = 0.0, 0.0
            for mix, sources, lengths in _batches(cv_corpus, batch_size, 0,
                                                  seed, shuffle=False,
                                                  pad_multiple=pad_multiple):
                key, sk = jax.random.split(key)
                loss, norm = eval_step(params, state,
                                       _jax_batch(mix, sources, lengths), sk)
                tot += float(loss) * float(norm)
                nrm += float(norm)
            j_cv.append(tot / nrm)
            if tside:
                t_cv.append(tside.cv_pass(cv_corpus, batch_size, seed,
                                          pad_multiple=pad_multiple))
        log(f"{arch_name} epoch {epoch + 1}: step {len(j_train)} "
            f"jax {j_train[-1]:.6f}"
            + (f" torch {t_train[-1]:.6f}" if tside else ""))
    return {"j_train": j_train, "t_train": t_train,
            "j_cv": j_cv, "t_cv": t_cv,
            "params": params, "state": state, "cfg": cfg,
            "step_fns": (optimizer, step, eval_step),
            "torch_model": tside.model if tside else None}


def deviation_table(j, t, ranges):
    """Max relative deviation per 1-indexed step range [(lo, hi), ...]."""
    j, t = np.asarray(j), np.asarray(t)
    rows = []
    for lo, hi in ranges:
        sl = slice(lo - 1, min(hi, len(j)))
        dev = np.max(np.abs(j[sl] - t[sl]) / np.abs(t[sl]))
        rows.append(((lo, min(hi, len(j))), float(dev)))
    return rows
