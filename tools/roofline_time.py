#!/usr/bin/env python3
"""Analytic rooflines for the non-uPIT archs (VERDICT round-4 #3).

Per arch, enumerates the train step's components, computes each one's
machine lower bound on one TPU v5e core, and sums them into a serialized
floor to compare against the measured step (bench.py phases). uPIT's
roofline lives in tools/roofline.py (round-2); this tool covers RSH, TCN,
ConvTasNet, DPRNN, SepFormer at the bench shapes. Pure arithmetic — runs
anywhere.

Hardware model (public v5e figures + stated assumptions):
  - MXU peak 197 TFLOP/s bf16; a matmul only reaches it when its
    contraction (K) and output (N) dims fill the 128-wide systolic array,
    so each matmul's effective peak is scaled by
    (K/ceil128(K)) * (N/ceil128(N)) — the dominant effect for these
    narrow models (d_model 64-128 => 25-50% of peak is the CEILING).
  - HBM 819 GB/s; elementwise/norm components are charged
    passes * bytes of their activation tensor (assumes XLA fuses each
    op chain into ~the stated number of material passes).
  - VPU ~2e12 f32 elementwise ops/s for transcendental-heavy chains
    (sigmoid/tanh/exp), which can bind instead of HBM for fused chains.
  - backward = 2x forward matmul FLOPs (dx + dW) and ~2x elementwise
    traffic; optimizer = 7 f32 passes over the parameters (p,g,m,v read
    + p,m,v write).
  - recurrences (DPRNN/RSH BLSTMs) additionally carry a serial floor:
    steps x max(per-step matmul time, per-step gate-chain time) — the
    hidden-state dependence cannot be batched away (ops/lstm_pallas.py).

Usage:
  python tools/roofline_time.py [--arch all|rsh|tcn|convtasnet|dprnn|sepformer]
                                [--measured-ms X]
"""

import argparse
import math

PEAK_BF16 = 197e12   # FLOP/s
HBM = 819e9          # B/s
VPU = 2e12           # elementwise f32 ops/s (transcendental chains)
ACT_BYTES = 2        # bf16 activations on the perf path


def ceil128(x):
    return 128 * math.ceil(x / 128)


class Sheet:
    def __init__(self, title, params=0):
        self.title = title
        self.rows = []          # (name, ms_flop, ms_hbm, ms_bound)
        self.matmul_flops = 0.0
        self.params = params

    def mm(self, name, M, K, N, n=1, bwd_factor=3.0):
        """n x (M,K)@(K,N) matmul, forward+backward (bwd_factor=3 => fwd
        plus dx+dW). Tile efficiency scales the FLOP bound."""
        flops = 2.0 * M * K * N * n * bwd_factor
        eff = (K / ceil128(K)) * (N / ceil128(N))
        ms_flop = flops / (PEAK_BF16 * eff) * 1e3
        bytes_ = n * bwd_factor * (M * K + K * N + M * N) * ACT_BYTES
        ms_hbm = bytes_ / HBM * 1e3
        self.matmul_flops += flops
        self.rows.append((name, ms_flop, ms_hbm, max(ms_flop, ms_hbm)))

    def ew(self, name, elems, passes=2.0, ops_per_elem=4.0, dtype_bytes=ACT_BYTES):
        """Elementwise/norm chain over `elems` activations: HBM passes vs
        VPU ops, forward+backward included in `passes`."""
        ms_hbm = passes * elems * dtype_bytes / HBM * 1e3
        ms_vpu = passes / 2.0 * elems * ops_per_elem / VPU * 1e3
        self.rows.append((name, None, ms_hbm, max(ms_hbm, ms_vpu)))

    def serial(self, name, ms):
        self.rows.append((name, None, None, ms))

    def optimizer(self):
        ms = 7.0 * self.params * 4.0 / HBM * 1e3
        self.rows.append(("clip+Adam (%.1fM params)" % (self.params / 1e6),
                          None, ms, ms))

    def report(self, measured_ms=None):
        total = sum(r[3] for r in self.rows)
        print(f"\n# {self.title}")
        print(f"{'component':42s} {'flop-ms':>8s} {'hbm-ms':>8s} {'bound-ms':>9s}")
        for name, mf, mh, mb in self.rows:
            sf = f"{mf:8.2f}" if mf is not None else "       -"
            sh = f"{mh:8.2f}" if mh is not None else "       -"
            print(f"{name:42s} {sf} {sh} {mb:9.2f}")
        print(f"{'TOTAL (serialized lower bound)':42s} {'':8s} {'':8s} {total:9.2f}")
        if measured_ms:
            mfu = self.matmul_flops / (measured_ms / 1e3) / PEAK_BF16
            gap = measured_ms / total
            worst = max(self.rows, key=lambda r: r[3])
            print(f"measured {measured_ms:.1f} ms = {gap:.2f}x the floor; "
                  f"MFU {100*mfu:.1f}% of bf16 peak; "
                  f"largest bound component: {worst[0]} ({worst[3]:.2f} ms)")
        return total


# --------------------------------------------------------------- LSTM pieces

def lstm_cell_flops(in_dim, hidden):
    """One timestep, one direction: input + recurrent gate matmuls."""
    return 2.0 * (in_dim * 4 * hidden + hidden * 4 * hidden)


def blstm_serial_floor_ms(steps, batch, in_dim, hidden, bwd=True):
    """steps x per-step floor. Per grid step both directions run batched
    (ops/lstm_pallas.py): matmul (2*batch, in+H)@(in+H, 4H) on the MXU,
    then the gate chain (~10 VPU ops over 2*batch*4H elements). Backward
    re-runs the chain with ~2x the gate work."""
    K = in_dim + hidden
    N = 4 * hidden
    eff = (K / ceil128(K)) * (N / ceil128(N))
    mm_s = 2.0 * (2 * batch) * K * N / (PEAK_BF16 * eff)
    mm_s = max(mm_s, 2e-6)  # issue latency floor per grid step (measured ~2-3 us)
    gate_s = 10.0 * (2 * batch) * N / VPU
    per_fwd = max(mm_s, gate_s)
    per_bwd = max(mm_s, 2 * gate_s)
    total = steps * (per_fwd + (per_bwd if bwd else 0.0))
    return total * 1e3


# -------------------------------------------------------------------- archs

def sheet_rsh(B=100, T=384, F=257, H=600, L=2, S=2):
    """RSH train step at the bench shape (models/rsh.py; reference
    archs/RSH.py:155-157): S sequential full BLSTM passes over the
    2F-wide combo input, each pass 2 layers x T steps."""
    n_params = 2 * ((2 * F) * 4 * H + H * 4 * H + 4 * H) \
        + 2 * (2 * H * 4 * H + H * 4 * H + 4 * H) + 2 * H * F + F
    s = Sheet(f"RSH train step  B={B} T={T} F={F} H={H} S={S} passes", n_params)
    BT = B * T
    for p in range(S):
        s.mm(f"pass{p+1} gate-input L1", BT, 2 * F, 4 * H, n=2)
        s.mm(f"pass{p+1} gate-input L2", BT, 2 * H, 4 * H, n=2)
        s.mm(f"pass{p+1} head", BT, 2 * H, F)
        s.serial(f"pass{p+1} recurrence (serial floor)",
                 blstm_serial_floor_ms(T * L, B, 2 * H, H))
        s.ew(f"pass{p+1} BN+sigmoid+residual", BT * 2 * H, passes=8)
    s.ew("greedy assignment + MSE losses", BT * F * S, passes=6)
    s.optimizer()
    return s


def sheet_tcn(B=100, T=384, F=257, Bc=256, H=512, P=3, X=8, R=4, S=2):
    """TCN train step at the bench shape (models/tcn.py)."""
    n_blocks = X * R
    n_params = F * Bc + n_blocks * (Bc * H + P * H + 2 * H * Bc) \
        + Bc * F * S
    s = Sheet(f"TCN train step  B={B} T={T} F={F} B={Bc} H={H} "
              f"{n_blocks} blocks", n_params)
    BT = B * T
    s.mm("bottleneck (F->B)", BT, F, Bc)
    s.mm("expand 1x1 (B->H)", BT, Bc, H, n=n_blocks)
    s.ew("depthwise convs", BT * H * P, passes=4)
    s.mm("res+skip 1x1 (H->B)", BT, H, Bc, n=2 * n_blocks)
    s.ew("norms+PReLU (per block)", BT * H, passes=6 * n_blocks)
    s.mm("mask head (B->F*S)", BT, Bc, F * S)
    s.ew("PIT loss", BT * F * S, passes=8, dtype_bytes=4)
    s.optimizer()
    return s


def sheet_convtasnet(B=32, n_sec=4.0, N=256, Lw=32, stride=16, Bc=128,
                     H=512, P=3, X=8, R=3, S=2):
    """Conv-TasNet train step at the bench shape (models/convtasnet.py)."""
    T = int(n_sec * 8000) // stride
    n_blocks = X * R
    n_params = Lw * N + N * Bc + n_blocks * (Bc * H + P * H + 2 * H * Bc) \
        + Bc * N * S + N * Lw
    s = Sheet(f"Conv-TasNet train step  B={B} {n_sec:.0f}s T'={T} N={N} "
              f"B={Bc} H={H} {n_blocks} blocks", n_params)
    BT = B * T
    s.mm("encoder (L->N)", BT, Lw, N)
    s.mm("bottleneck (N->B)", BT, N, Bc)
    s.mm("expand 1x1 (B->H)", BT, Bc, H, n=n_blocks)
    s.ew("depthwise convs", BT * H * P, passes=4)
    s.mm("res+skip 1x1 (H->B)", BT, H, Bc, n=2 * n_blocks)
    # gLN stats+apply, 2x PReLU per block; fwd+bwd
    s.ew("norms+PReLU (per block)", BT * H, passes=6 * n_blocks)
    s.mm("mask head (B->N*S)", BT, Bc, N * S)
    s.mm("decoder (N->L), S sources", BT, N, Lw, n=S)
    s.ew("mask*latents + OLA + SI-SNR PIT", B * S * int(n_sec * 8000),
         passes=10, dtype_bytes=4)
    s.optimizer()
    return s


def sheet_dprnn(B=32, n_sec=4.0, N=64, Lw=16, stride=8, C=64, H=128,
                K=100, blocks=6, S=2):
    """DPRNN train step at the bench shape (models/dprnn.py): per block an
    intra-chunk BLSTM over K steps (batch B*nC) and an inter-chunk BLSTM
    over nC steps (batch B*K)."""
    T = int(n_sec * 8000) // stride
    hop = K // 2
    nC = math.ceil(T / hop)
    n_params = Lw * N + N * C + blocks * 2 * (
        2 * ((C + H) * 4 * H + 4 * H) + 2 * H * C) + C * N * S + N * Lw
    s = Sheet(f"DPRNN train step  B={B} {n_sec:.0f}s T'={T} chunks={nC}x{K} "
              f"C={C} H={H} {blocks} blocks", n_params)
    BT = B * T
    s.mm("encoder (L->N)", BT, Lw, N)
    s.mm("bottleneck (N->C)", BT, N, C)
    cell = lstm_cell_flops(C, H)
    for which, batch, steps in (("intra", B * nC, K), ("inter", B * K, nC)):
        # bulk gate matmuls are part of the scan; the serial floor below
        # is the binding constraint, but the FLOPs still occupy the MXU
        flops_ms = blocks * steps * 2 * batch * cell * 3 / PEAK_BF16 * 1e3
        eff = ((C + H) / ceil128(C + H)) * (4 * H / ceil128(4 * H))
        s.rows.append((f"{which} BLSTM FLOPs ({blocks} blocks)",
                       flops_ms / eff, None, flops_ms / eff))
        s.matmul_flops += blocks * steps * 2 * batch * cell * 3
        s.serial(f"{which} serial floor ({blocks} blocks)",
                 blocks * blstm_serial_floor_ms(steps, batch, C, H))
        s.mm(f"{which} proj (2H->C)", B * nC * K, 2 * H, C, n=blocks)
        s.ew(f"{which} LN+residual", B * nC * K * C, passes=6 * blocks)
    s.mm("mask head (C->N*S)", BT, C, N * S)
    s.mm("decoder (N->L), S sources", BT, N, Lw, n=S)
    s.ew("overlap-add both levels + SI-SNR PIT", B * S * int(n_sec * 8000),
         passes=12, dtype_bytes=4)
    s.optimizer()
    return s


def sheet_sepformer(B=32, n_sec=4.0, N=64, Lw=16, stride=8, C=64, heads=4,
                    d_ff=256, K=100, blocks=4, S=2):
    """SepFormer train step at the bench shape (models/sepformer.py): per
    block one intra-chunk and one inter-chunk transformer layer (MHA+FFN)."""
    T = int(n_sec * 8000) // stride
    hop = K // 2
    nC = math.ceil(T / hop)
    n_params = Lw * N + N * C + blocks * 2 * (4 * C * C + 2 * C * d_ff) \
        + C * N * S + N * Lw
    s = Sheet(f"SepFormer train step  B={B} {n_sec:.0f}s T'={T} "
              f"chunks={nC}x{K} d={C} heads={heads} {blocks} blocks",
              n_params)
    BT = B * T
    tokens = B * nC * K          # same token count for intra and inter
    s.mm("encoder (L->N)", BT, Lw, N)
    s.mm("bottleneck (N->C)", BT, N, C)
    for which, qlen in (("intra", K), ("inter", nC)):
        s.mm(f"{which} QKVO (4 matmuls x{blocks})", tokens, C, C,
             n=4 * blocks)
        # scores + AV: per head (qlen x d_head) @ (d_head x qlen) and back
        nseq = tokens // qlen
        s.mm(f"{which} QK^T+AV x{blocks}", qlen, C // heads, qlen,
             n=2 * heads * nseq * blocks)
        s.ew(f"{which} softmax+masks x{blocks}",
             nseq * heads * qlen * qlen, passes=4 * blocks, ops_per_elem=8)
        s.mm(f"{which} FFN (C->ff->C) x{blocks}", tokens, C, d_ff,
             n=2 * blocks)
        s.ew(f"{which} LN+residual x{blocks}", tokens * C, passes=8 * blocks)
    s.mm("mask head (C->N*S)", BT, C, N * S)
    s.mm("decoder (N->L), S sources", BT, N, Lw, n=S)
    s.ew("overlap-add both levels + SI-SNR PIT", B * S * int(n_sec * 8000),
         passes=12, dtype_bytes=4)
    s.optimizer()
    return s


SHEETS = {"rsh": sheet_rsh, "tcn": sheet_tcn, "convtasnet": sheet_convtasnet,
          "dprnn": sheet_dprnn, "sepformer": sheet_sepformer}

# measured step times from the round-5 bench run (bf16+Pallas, bench.py
# shapes, healthy-window steady state); refresh from BENCH_r05.json
MEASURED_MS = {"rsh": 78.66, "tcn": 70.37, "convtasnet": 97.19,
               "dprnn": 165.17, "sepformer": 127.84}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="all", choices=["all", *SHEETS])
    ap.add_argument("--measured-ms", type=float, default=None,
                    help="override the recorded measured step time")
    args = ap.parse_args()
    names = list(SHEETS) if args.arch == "all" else [args.arch]
    for name in names:
        sheet = SHEETS[name]()
        sheet.report(args.measured_ms or MEASURED_MS.get(name))


if __name__ == "__main__":
    main()
