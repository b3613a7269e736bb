#!/usr/bin/env python3
"""Measure the reference implementation's training throughput.

The reference repo has no published benchmarks (BASELINE.md), so the
baseline is *measured*: its uPIT training step — packed-BLSTM forward, PIT
loss, backward, clip, Adam (steps/train_qsub.py:116-122 semantics,
archs/uPIT.py model/loss) — transcribed to modern torch APIs and timed on
the hardware available here (CPU; the reference's own grid used one GPU).
Writes tools/baseline_measured.json, which bench.py reads for vs_baseline.

Note: this is a *semantics-equivalent re-implementation* used purely as a
measuring stick; the reference's actual scripts cannot run (torch<=1.0-era
imports — SURVEY.md header).
"""

import itertools
import json
import os
import sys
import time

import torch


class SepDNN(torch.nn.Module):
    def __init__(self, F=257, S=2, H=600):
        super().__init__()
        self.blstm = torch.nn.LSTM(F, H, num_layers=2, bidirectional=True,
                                   batch_first=True)
        self.lin = torch.nn.Linear(2 * H, F * S)
        self.bn = torch.nn.BatchNorm1d(2 * H)

    def forward(self, x, hidden):
        x, _ = self.blstm(x, hidden)
        x = self.bn(x.permute(0, 2, 1).contiguous()).permute(0, 2, 1)
        return torch.sigmoid(self.lin(x))


def main():
    B, T, F, S, H = 100, 384, 257, 2, 600
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 3

    torch.manual_seed(0)
    model = SepDNN(F, S, H)
    optim = torch.optim.Adam(model.parameters(), lr=1e-3)
    mix = torch.rand(B, T, F)
    sources = [torch.rand(B, T, F) for _ in range(S)]
    perms = list(itertools.permutations(range(S)))

    def step():
        model.zero_grad()
        hidden = (torch.randn(2 * 2, B, H), torch.randn(2 * 2, B, H))
        mask = model(mix, hidden)
        masked = mask * torch.cat([mix] * S, dim=2)
        losses = torch.stack([
            torch.sum(((masked - torch.cat([sources[i] for i in p], dim=2)) ** 2
                       ).view(B, -1), dim=1) for p in perms])
        mins, _ = torch.min(losses, 0)
        (torch.sum(mins) / S / (B * T * F)).backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 0.25)
        optim.step()

    t0 = time.time()
    step()
    warmup = time.time() - t0

    t0 = time.time()
    for _ in range(iters):
        step()
    dt = (time.time() - t0) / iters

    out = {
        "metric": "train utts/sec (reference torch-CPU uPIT step)",
        "batch": B, "frames": T, "feat_dim": F, "num_spk": S, "hidden": H,
        "step_seconds": dt,
        "utts_per_sec": B / dt,
        "warmup_seconds": warmup,
        "torch_threads": torch.get_num_threads(),
        "device": "cpu",
        "note": ("reference semantics (packed BLSTM + PIT MSE + clip 0.25 + "
                 "Adam 1e-3) re-implemented in modern torch; the reference's "
                 "own scripts use torch<=1.0 APIs and cannot run here"),
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "baseline_measured.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
