#!/usr/bin/env python3
"""Analytic roofline for the uPIT train step (VERDICT round-2 #7).

Computes, component by component, the machine lower bound for the
reference-scale update step (B=100, T=384, F=257, H=600, L=2, S=2,
bf16+Pallas) on one TPU v5e core, and compares against the measured
anatomy (tools/step_anatomy.py). Pure arithmetic — runs anywhere.

Hardware model (public v5e figures):
  - MXU peak: 197 TFLOP/s bf16, ~49 TFLOP/s f32 (4x 128x128 MXUs @ ~1.5 GHz)
  - HBM: 819 GB/s
  - recurrence critical path: the LSTM cell is a strict serial chain
    matmul(h_t) -> VPU gate chain -> h_{t+1}; per-grid-step floors are
    taken from the stripped-kernel probes (docs/performance.md round-2):
    ~3 us matmul issue+execute, ~4.5 us VPU chain, ~3 us DMA (overlapped).

Every matmul bound is max(FLOP time, HBM time) — at these shapes all the
bulk matmuls are FLOP-bound in bf16 except the head (which is close).

Usage: python tools/roofline.py [--measured /tmp/anatomy_out.json]
"""

import argparse
import json

PEAK_BF16 = 197e12        # FLOP/s
PEAK_F32 = 49e12
HBM = 819e9               # B/s
# measured per-grid-step floors of the recurrence kernel (both directions
# batched in one grid step), docs/performance.md "Pallas kernel results"
MM_US = 3.0               # recurrent matmul (2,B,H)x(2,H,4H), issue+execute
VPU_US = 4.5              # gate chain: 2 sigmoid + 2 tanh + 4 mul + add, f32
DMA_US = 3.0              # xw stream-in + ys store, overlapped with compute


def matmul(m, k, n, dtype_bytes=2, peak=PEAK_BF16, batch=1):
    """Returns (ms_flop, ms_hbm, ms_bound) for batch x (m,k)@(k,n)."""
    flops = 2.0 * m * k * n * batch
    bytes_ = dtype_bytes * batch * (m * k + k * n + m * n * 2)  # out f32
    return flops / peak * 1e3, bytes_ / HBM * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--measured", default=None,
                    help="step_anatomy.py JSON to print alongside")
    ap.add_argument("--B", type=int, default=100)
    ap.add_argument("--T", type=int, default=384)
    ap.add_argument("--F", type=int, default=257)
    ap.add_argument("--H", type=int, default=600)
    ap.add_argument("--L", type=int, default=2)
    ap.add_argument("--S", type=int, default=2)
    args = ap.parse_args()
    B, T, F, H, L, S = args.B, args.T, args.F, args.H, args.L, args.S
    BT = B * T
    rows = []

    def add(name, ms_flop, ms_hbm):
        rows.append((name, ms_flop, ms_hbm, max(ms_flop, ms_hbm)))

    # ---- bulk (time-parallel) matmuls ----------------------------------
    # gate-input projections, both directions batched (einsum dbtf,dfg->tdbg)
    f1, h1 = matmul(BT, F, 4 * H, batch=2)
    add("gate-input L1 fwd", f1, h1)
    f2, h2 = matmul(BT, 2 * H, 4 * H, batch=2)
    add("gate-input L2 fwd", f2, h2)
    fh, hh = matmul(BT, 2 * H, F * S)
    add("head fwd", fh, hh)
    # backward: dx = g@W^T and dW = x^T@g per matmul -> 2x the fwd FLOPs
    add("gate-input L1 bwd (dx+dW)", 2 * f1, 2 * h1)
    add("gate-input L2 bwd (dx+dW)", 2 * f2, 2 * h2)
    add("head bwd (dx+dW)", 2 * fh, 2 * hh)
    # dW_hh: (T*B, H)^T @ (T*B, 4H) per direction pair, both layers
    fw, hw = matmul(H, BT, 4 * H, batch=2 * L)
    add("dW_hh einsums", fw, hw)

    # ---- the recurrence (serial chain; FLOPs are NOT the bound) --------
    # fwd: T steps x L layers, both directions per grid step. The chain
    # matmul->VPU cannot overlap with itself (h_t feeds step t+1); DMA
    # rides under compute.
    fwd_rec = T * L * (MM_US + VPU_US) / 1e3
    rows.append(("recurrence fwd (serial floor)", None, None, fwd_rec))
    # bwd: same chain plus the gate-grad VPU work (~2x VPU) and the
    # dh carry matmul — measured kernels run ~1.05x the fwd+fwd cost;
    # floor: T*L*(mm + 2*vpu)
    bwd_rec = T * L * (MM_US + 2 * VPU_US) / 1e3
    rows.append(("recurrence bwd (serial floor)", None, None, bwd_rec))

    # ---- bandwidth-bound elementwise stages ----------------------------
    # BatchNorm fwd+bwd over (BT, 2H) f32: ~3 read+write passes each way
    bn_bytes = 6 * BT * 2 * H * 4.0
    add("batchnorm fwd+bwd", 0.0, bn_bytes / HBM * 1e3)
    # PIT loss fwd+bwd: masks/sigmoid (BT, F*S) + S^2 pairwise MSE reads of
    # (BT, F) pairs + bwd writes — ~8 passes of (BT, F*S) f32
    pit_bytes = 8 * BT * F * S * 4.0
    add("PIT loss fwd+bwd", 0.0, pit_bytes / HBM * 1e3)
    # optimizer: 13.4M params x (p, g, m, v) read + (p, m, v) write, f32
    n_params = 0
    for layer in range(L):
        fin = F if layer == 0 else 2 * H
        n_params += 2 * (fin * 4 * H + H * 4 * H + 4 * H)
    n_params += 2 * H * F * S + F * S
    opt_bytes = 7 * n_params * 4.0
    add("clip+Adam", 0.0, opt_bytes / HBM * 1e3)

    total = sum(r[3] for r in rows)
    print(f"# uPIT step roofline  B={B} T={T} F={F} H={H} L={L} S={S}"
          f"  ({n_params/1e6:.1f}M params)")
    print(f"{'component':34s} {'flop-ms':>8s} {'hbm-ms':>8s} {'bound-ms':>9s}")
    for name, mf, mh, mb in rows:
        sf = f"{mf:8.2f}" if mf is not None else "       -"
        sh = f"{mh:8.2f}" if mh is not None else "       -"
        print(f"{name:34s} {sf} {sh} {mb:9.2f}")
    print(f"{'TOTAL (serialized lower bound)':34s} {'':8s} {'':8s} {total:9.2f}")
    if args.measured:
        with open(args.measured) as f:
            m = json.load(f)
        print(f"# measured: {json.dumps(m)}")


if __name__ == "__main__":
    main()
