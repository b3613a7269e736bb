"""Fused end-to-end separation: waveform -> separated waveforms, one XLA
program per shape bucket.

The reference runs five processes with file hand-offs between them
(features -> masks -> reconstruction, SURVEY.md §3.2). Here the whole
inference path — framing + windowed DFT, magnitude, BLSTM mask estimation,
mask x complex spectrum, inverse DFT + overlap-add — compiles into ONE jit
program: raw audio streams in, separated audio streams out, with no host
round-trips and no complex dtypes anywhere on device.

This is the serving API; the staged mask-npz/wav-file path (infer.py,
reconstruct.py) remains for reference interface compatibility.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..dsp.stft import (STFTConfig, num_frames, istft_output_length,
                        reflect_pad_center, stft_centered_batch, istft_batch)
from .infer import load_model


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _best_source_perm(prev: np.ndarray, cur: np.ndarray,
                      margin: float = 1e-3) -> np.ndarray:
    """Permutation of ``cur``'s source rows best matching ``prev`` over a
    shared overlap region, by summed normalized correlation. (S, ov)
    arrays; S! is tiny (S <= 3-4 in practice).

    (Near-)silent rows carry no evidence: their correlations are noise,
    so they are zeroed rather than allowed to tie-break, and the identity
    permutation wins unless an alternative beats it by ``margin`` — a
    speaker pausing across a window boundary must not flip the output
    tracks for the rest of the recording."""
    import itertools
    S = prev.shape[0]
    ov = prev.shape[1]
    na = np.linalg.norm(prev, axis=1)
    nb = np.linalg.norm(cur, axis=1)
    # silence threshold: RMS below ~1e-4 of full scale has no speaker
    # evidence at int16-origin amplitudes
    floor = 1e-4 * np.sqrt(ov)
    corr = (prev @ cur.T) / np.outer(na + 1e-12, nb + 1e-12)
    corr[na < floor, :] = 0.0
    corr[:, nb < floor] = 0.0
    scores = {p: sum(corr[i, p[i]] for i in range(S))
              for p in itertools.permutations(range(S))}
    identity = tuple(range(S))
    best = max(scores, key=lambda p: scores[p])
    if scores[best] <= scores[identity] + margin:
        best = identity
    return np.asarray(best)


class SeparationPipeline:
    """Batched waveform-to-waveforms separation with shape bucketing.

    One executable is compiled per (batch, padded-length) bucket; repeated
    calls with similar-length audio reuse the cache.
    """

    def __init__(self, model_path: str, arch_name: str = "",
                 model_kwargs: dict | None = None,
                 stft_cfg: STFTConfig = STFTConfig(),
                 batch_size: int = 16, length_quantum: int = 16384,
                 num_spk: int | None = None, seed: int = 0,
                 mesh=None):
        self.arch, self.cfg, self.params, self.state = load_model(
            model_path, arch_name, model_kwargs)
        # 'time' archs (models/convtasnet.py) map waveforms to waveforms
        # directly — no STFT/masks/iSTFT anywhere in the fused program
        self.domain = getattr(self.arch, "DOMAIN", "spectrum")
        self.stft_cfg = stft_cfg
        self.batch_size = batch_size
        self.length_quantum = length_quantum
        self.num_spk = num_spk or getattr(self.cfg, "num_spk", 2)
        self._rng = jax.random.PRNGKey(seed)
        self._fns = {}
        # data-parallel inference: batch rows sharded over the mesh's 'data'
        # axis, parameters replicated. Inference is row-independent (eval-
        # mode BN uses running stats), so DP needs zero collectives — XLA
        # partitions the whole fused program from the input sharding alone.
        self.mesh = mesh
        self._batch_sharding = self._rep_sharding = None
        if mesh is not None and mesh.size > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P
            n_data = mesh.shape["data"]
            if self.batch_size % n_data != 0:
                bp = ((self.batch_size + n_data - 1) // n_data) * n_data
                print(f"note: pipeline batch_size {self.batch_size} -> {bp} "
                      f"(must divide over {n_data} data-parallel devices)")
                self.batch_size = bp
            self._batch_sharding = NamedSharding(mesh, P("data"))
            self._rep_sharding = NamedSharding(mesh, P())
            rep = lambda t: jax.tree_util.tree_map(
                lambda x: jax.device_put(x, self._rep_sharding), t)
            self.params, self.state = rep(self.params), rep(self.state)
        else:
            self.mesh = None

    def _fused_fn(self, n_t: int, num_spk: int):
        """One compiled program per shape key: (frame count, S) for
        spectral archs, (padded sample count, S) for time-domain archs."""
        key = (n_t, num_spk)
        if key in self._fns:
            return self._fns[key]
        cfg, params, state = self.cfg, self.params, self.state
        arch = self.arch
        scfg = self.stft_cfg
        F = scfg.num_bins

        if self.domain == "time":
            @jax.jit
            def fused_time(xp, sample_counts, rng):
                return arch.separate(cfg, params, state, xp, sample_counts)

            self._fns[key] = fused_time
            return fused_time

        @jax.jit
        def fused(xp, frame_counts, rng):
            B = xp.shape[0]
            re, im = stft_centered_batch(xp, scfg.n_fft, scfg.hop, n_t)
            tmask = (jnp.arange(n_t)[None, :] < frame_counts[:, None]
                     ).astype(jnp.float32)[:, :, None]
            mag = jnp.sqrt(re * re + im * im) * tmask
            batch = {"mix": mag, "lengths": frame_counts,
                     "row_mask": jnp.ones((B,), jnp.float32)}
            if arch.NAME == "RSH":
                masks = arch.infer_masks(cfg, params, state, batch, rng,
                                         num_spk)  # (B, S, T, F)
            else:
                flat = arch.infer_masks(cfg, params, state, batch, rng)
                masks = flat.reshape(B, n_t, num_spk, F).transpose(0, 2, 1, 3)
            # masked iSTFT over (B*S) rows
            re_s = (re[:, None] * masks).reshape(B * num_spk, n_t, F)
            im_s = (im[:, None] * masks).reshape(B * num_spk, n_t, F)
            counts = jnp.repeat(frame_counts, num_spk)
            y = istft_batch(re_s, im_s, counts, hop=scfg.hop)
            return y.reshape(B, num_spk, -1)

        self._fns[key] = fused
        return fused

    def separate_stream(self, loader, lengths, num_spk: int | None = None,
                        prefetch: int = 2, pad_batches: bool = False):
        """Streaming separation core: yields ``(index, [tracks])`` per input
        with BOUNDED host memory — at most ``prefetch`` length-sorted
        batches of audio are resident at once, loaded by background threads
        while the device separates the current batch.

        ``loader(i)`` returns waveform i; ``lengths[i]`` is its (possibly
        approximate) sample count, used only to order/bucket — the padded
        buffer is sized from the actually loaded audio. This is the memory
        shape that survives 100k-utterance test sets; ``separate`` wraps it
        for in-memory lists.

        ``pad_batches=True`` zero-pads every group's batch dimension to the
        full ``batch_size``, so ONE executable per (time-bucket, num_spk)
        serves any request size — the serving mode, where a 1-file request
        must reuse the warmed-up full-batch program instead of compiling a
        fresh B=1 shape. Pad rows are dead compute (milliseconds) and never
        yielded; outputs are row-independent (inference BN uses running
        stats), so results are unchanged.

        With a ``mesh``, batches are always padded to ``batch_size`` (which
        divides the data axis) and sharded over it — every chip separates
        ``batch_size / n_data`` rows of the same executable."""
        from concurrent.futures import ThreadPoolExecutor

        scfg = self.stft_cfg
        S = num_spk or self.num_spk
        model_S = getattr(self.cfg, "num_spk", S)
        if self.arch.NAME != "RSH" and S != model_S:
            # fixed-head archs (uPIT/TCN) emit exactly cfg.num_spk masks;
            # only RSH's iterative extraction takes a per-call count.
            # Fail with intent, not a reshape-size TypeError from inside jit
            raise ValueError(
                f"this {self.arch.NAME} model separates exactly {model_S} "
                f"speakers (num_spk={S} requested); per-request speaker "
                "counts need an RSH model")
        pad_batches = pad_batches or self.mesh is not None
        order = sorted(range(len(lengths)), key=lambda i: lengths[i])
        groups = [order[s: s + self.batch_size]
                  for s in range(0, len(order), self.batch_size)]

        def load_group(idxs):
            group = [np.asarray(loader(i), np.float32) for i in idxs]
            max_len = _round_up(max(len(s) for s in group), self.length_quantum)
            B = self.batch_size if pad_batches else len(group)
            if self.domain == "time":
                # no STFT centering: raw zero-padded samples; the shape
                # key is the padded sample count itself
                xp = np.zeros((B, max_len), np.float32)
                counts = np.ones((B,), np.int32)
                for r, s in enumerate(group):
                    xp[r, : len(s)] = s
                    counts[r] = len(s)
                return xp, counts, max_len
            n_t = num_frames(max_len, scfg.hop)
            Lp = max_len + scfg.n_fft
            xp = np.zeros((B, Lp), np.float32)
            counts = np.ones((B,), np.int32)  # pad rows: 1 frame of silence
            for r, s in enumerate(group):
                padded = reflect_pad_center(s, scfg.n_fft)
                xp[r, : len(padded)] = padded
                counts[r] = num_frames(len(s), scfg.hop)
            return xp, counts, n_t

        with ThreadPoolExecutor(max_workers=2) as pool:
            futs = [pool.submit(load_group, g) for g in groups[:prefetch]]
            for k, idxs in enumerate(groups):
                xp, counts, n_t = futs[k].result()
                futs[k] = None  # release the batch buffers after use
                if k + prefetch < len(groups):
                    futs.append(pool.submit(load_group, groups[k + prefetch]))
                self._rng, step_rng = jax.random.split(self._rng)
                fused = self._fused_fn(n_t, S)
                if self.mesh is not None:
                    xp_d = jax.device_put(xp, self._batch_sharding)
                    counts_d = jax.device_put(counts, self._batch_sharding)
                    step_rng = jax.device_put(step_rng, self._rep_sharding)
                else:
                    xp_d, counts_d = jnp.asarray(xp), jnp.asarray(counts)
                y = np.asarray(fused(xp_d, counts_d, step_rng))
                if self.domain == "time":
                    for r, i in enumerate(idxs):
                        n = int(counts[r])
                        yield i, [y[r, s, :n] for s in range(S)]
                    continue
                half = scfg.n_fft // 2
                for r, i in enumerate(idxs):
                    L_out = istft_output_length(int(counts[r]), scfg.hop)
                    yield i, [y[r, s, half: half + L_out] for s in range(S)]

    def separate(self, signals: list[np.ndarray],
                 num_spk: int | None = None) -> list[list[np.ndarray]]:
        """Separate a list of waveforms. Returns, per input, a list of
        num_spk estimated source waveforms of length hop*(T_i - 1)."""
        out: list[list[np.ndarray]] = [None] * len(signals)
        for i, tracks in self.separate_stream(
                signals.__getitem__, [len(s) for s in signals], num_spk):
            out[i] = tracks
        return out

    def separate_long(self, signal: np.ndarray, num_spk: int | None = None,
                      window_sec: float = 8.0, overlap_sec: float = 1.0
                      ) -> list[np.ndarray]:
        """Long-form separation: window + batch + align + crossfade.

        A minutes-long recording as one XLA shape would compile a new
        executable per length, blow past the model's training-length
        distribution, and waste the batch dimension. Instead the signal is
        cut into overlapping windows (all the same shape -> ONE compiled
        executable, full batch utilization), every window is separated in
        one batched call, and the per-window source tracks are stitched:

        - source ORDER is arbitrary per window (the model has no speaker
          identity), so each window's tracks are permutation-aligned to
          the previous window by normalized correlation over the shared
          overlap region (greedy chain, exact min over S! permutations);
        - the overlap is linearly crossfaded (weights renormalized by the
          accumulated window coverage, so edges and a short final window
          are handled uniformly).

        Returns num_spk tracks covering the whole input with no silent
        tail: window and overlap are rounded to STFT-hop multiples and the
        mix is zero-padded to a hop multiple, so every window's iSTFT
        (hop*(T-1) samples) spans its window exactly and every joint gets a
        true crossfade; the up-to-hop-1 pad samples are trimmed off the
        output.
        """
        sr = self.stft_cfg.sample_rate
        S = num_spk or self.num_spk
        x = np.asarray(signal, np.float32)
        stft_hop = self.stft_cfg.hop
        if not 0 < overlap_sec < window_sec:
            raise ValueError(f"need 0 < overlap ({overlap_sec}) < window "
                             f"({window_sec}) seconds")
        W = max(_round_up(int(window_sec * sr), stft_hop), 2 * stft_hop)
        V = min(max(_round_up(int(overlap_sec * sr), stft_hop), stft_hop),
                W - stft_hop)
        orig_len = len(x)
        x = np.pad(x, (0, -len(x) % stft_hop))
        if len(x) <= W:
            tracks = self.separate([x], S)[0]
            # hop-multiple input => full-length iSTFT output
            return [np.asarray(t, np.float32)[:orig_len] for t in tracks]
        hop = W - V
        starts = list(range(0, max(len(x) - V, 1), hop))
        outs = self.separate([x[s: s + W] for s in starts], S)

        acc = np.zeros((S, len(x)), np.float64)
        wacc = np.zeros(len(x), np.float64)
        prev_tail = None        # previous window's tracks over the overlap
        last = len(starts) - 1
        for k, (s0, tracks) in enumerate(zip(starts, outs)):
            t = np.stack(tracks)                       # (S, Lk), Lk <= W
            Lk = t.shape[1]
            if prev_tail is not None:
                ov = min(prev_tail.shape[1], Lk)
                if ov > 0:
                    t = t[_best_source_perm(prev_tail[:, :ov], t[:, :ov])]
            wgt = np.ones(Lk)
            if k > 0:
                r = min(V, Lk)
                wgt[:r] = np.arange(r) / r             # ramp up
            if k < last:
                r = min(V, Lk)
                wgt[Lk - r:] = np.minimum(wgt[Lk - r:],
                                          1.0 - np.arange(r) / r)  # ramp down
            acc[:, s0: s0 + Lk] += t * wgt
            wacc[s0: s0 + Lk] += wgt
            prev_tail = t[:, hop:] if Lk > hop else t[:, :0]
        return [(acc[s, :orig_len]
                 / np.maximum(wacc[:orig_len], 1e-12)).astype(np.float32)
                for s in range(S)]
