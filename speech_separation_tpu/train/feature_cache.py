"""Packed mmap feature cache: repeated-epoch training input at memcpy speed.

The reference stores one compressed npz per utterance and re-inflates every
file every epoch (archs/uPIT.py:64-70 via np.load per __getitem__). At 20k+
utterances on a TPU host — where the CPU is the scarce resource — zlib
inflate and per-file open/seek dominate the input pipeline. This module
packs a whole feats_train.scp into ONE flat binary file at extract time;
training then memory-maps it and collation becomes straight slice copies
out of the OS page cache (no decompression, no file-per-utt syscalls, no
Python inner loop over array elements).

Layout
------
- ``<cache>.bin``: per utterance, the arrays ``mix, s1..sS`` concatenated,
  each stored (time, freq) C-contiguous — exactly the layout the padded
  device batch wants, so collation is ``buf[i, :T] = record[k]``.
- ``<cache>.idx.npz``: utt ids, byte offsets, num_frames, num_spk,
  feat_dim, dtype.
- ``<data_dir>/feats_<kind>.cache``: one-line pointer file naming the bin,
  so data dirs stay small-metadata-only (big data lives with the features,
  like the reference's feat_dir convention).

Storage dtype is float32 by default; float16 halves bytes and disk
bandwidth at ~1e-3 relative magnitude error (magnitudes are non-negative
and well-scaled, so fp16 is safe — it is an opt-in, tested trade).

Train-kind only: test features are complex spectra read once per eval, so
a repeated-epoch cache buys nothing there.
"""

from __future__ import annotations

import os

import numpy as np

from ..datadir.scp import read_scp

_MAGIC = "SEPSEP_FEATURE_CACHE_V1"


def pointer_path(data_dir: str, kind: str) -> str:
    return os.path.join(data_dir, f"feats_{kind}.cache")


def pack_features(data_dir: str, kind: str = "train",
                  cache_path: str | None = None,
                  dtype: str = "float32", log=print) -> str:
    """Pack every utterance of feats_<kind>.scp into one flat cache.

    Returns the bin path; writes the pointer file into the data dir.
    ``cache_path`` defaults to ``<feat_dir>/feats_<kind>.cache.bin`` where
    feat_dir is the directory of the first feature file.
    """
    if kind != "train":
        raise ValueError("feature cache supports kind='train' only "
                         "(test features are read once per eval)")
    dt = np.dtype(dtype)
    if dt not in (np.dtype(np.float32), np.dtype(np.float16)):
        raise ValueError(f"unsupported cache dtype {dtype}")
    entries = read_scp(os.path.join(data_dir, f"feats_{kind}.scp"))
    if not entries:
        raise ValueError(f"empty feats_{kind}.scp in {data_dir}")
    if cache_path is None:
        cache_path = os.path.join(os.path.dirname(entries[0][1]),
                                  f"feats_{kind}.cache.bin")

    ids, offsets, n_frames, n_spk = [], [], [], []
    feat_dim = None
    off = 0
    tmp = cache_path + ".partial"
    with open(tmp, "wb") as out:
        for utt, path in entries:
            feat = np.load(path)
            mix = np.ascontiguousarray(feat["mix"].T, dtype=dt)  # (T, F)
            src_keys = sorted(k for k in feat.files if k != "mix")
            # degenerate single-source rule: source1 = mix (uPIT.py:72-73)
            srcs = ([np.ascontiguousarray(feat[k].T, dtype=dt)
                     for k in src_keys] if src_keys else [mix])
            if feat_dim is None:
                feat_dim = mix.shape[1]
            elif mix.shape[1] != feat_dim:
                raise ValueError(f"{utt}: feat_dim {mix.shape[1]} != {feat_dim}")
            ids.append(utt)
            offsets.append(off)
            n_frames.append(mix.shape[0])
            n_spk.append(len(srcs))
            out.write(mix.tobytes())
            off += mix.nbytes
            for s in srcs:
                if s.shape != mix.shape:
                    raise ValueError(f"{utt}: source shape {s.shape} != mix {mix.shape}")
                out.write(s.tobytes())
                off += s.nbytes
    os.replace(tmp, cache_path)

    np.savez(cache_path + ".idx",
             magic=_MAGIC, ids=np.asarray(ids),
             offsets=np.asarray(offsets, np.int64),
             num_frames=np.asarray(n_frames, np.int32),
             num_spk=np.asarray(n_spk, np.int32),
             feat_dim=np.int32(feat_dim), dtype=str(dt.name))
    ptr = pointer_path(data_dir, kind)
    with open(ptr + ".partial", "w") as f:
        f.write(cache_path + "\n")
    os.replace(ptr + ".partial", ptr)
    log(f"packed {len(ids)} utterances ({off / 1e9:.2f} GB, {dt.name}) "
        f"-> {cache_path}")
    return cache_path


class FeatureCache:
    """mmap view over a packed cache; collation = slice copies."""

    def __init__(self, data_dir: str, kind: str = "train"):
        with open(pointer_path(data_dir, kind)) as f:
            self.bin_path = f.read().strip()
        idx = np.load(self.bin_path + ".idx.npz")
        if str(idx["magic"]) != _MAGIC:
            raise ValueError(f"bad cache magic in {self.bin_path}.idx.npz")
        self.ids = [str(u) for u in idx["ids"]]
        self.offsets = idx["offsets"]
        self.num_frames = idx["num_frames"]
        self.num_spk = idx["num_spk"]
        self.feat_dim = int(idx["feat_dim"])
        self.dtype = np.dtype(str(idx["dtype"]))
        # pread, not mmap: per-page minor faults make mapped reads ~2-3x
        # slower than one bulk pread per record on 1-CPU TPU hosts
        # (measured in the 20k scale run, docs/performance.md)
        self._fd = os.open(self.bin_path, os.O_RDONLY)
        size = os.fstat(self._fd).st_size
        expect = int(self.offsets[-1]) + (1 + int(self.num_spk[-1])) * \
            int(self.num_frames[-1]) * self.feat_dim * self.dtype.itemsize
        if size != expect:
            os.close(self._fd)
            raise ValueError(
                f"cache {self.bin_path} is {size} bytes, "
                f"index expects {expect} (stale or truncated cache)")

    def __del__(self):
        if getattr(self, "_fd", None) is not None:
            try:
                os.close(self._fd)
            except OSError:
                pass
            self._fd = None

    def __len__(self):
        return len(self.ids)

    def record(self, i: int) -> np.ndarray:
        """(1+S, T, F) array for one utterance (mix first, then sources)."""
        T = int(self.num_frames[i])
        S = int(self.num_spk[i])
        nbytes = (1 + S) * T * self.feat_dim * self.dtype.itemsize
        buf = os.pread(self._fd, nbytes, int(self.offsets[i]))
        if len(buf) != nbytes:
            raise IOError(f"short read at record {i} of {self.bin_path}")
        return np.frombuffer(buf, dtype=self.dtype).reshape(
            1 + S, T, self.feat_dim)

    def load(self, i: int) -> dict:
        """Same contract as FeatureDataset.load (train kind)."""
        rec = np.asarray(self.record(i), dtype=np.float32)
        return {"mix": rec[0], "sources": rec[1:], "name": self.ids[i]}

    def collate(self, idxs: list[int], time_pad_multiple: int,
                pad_rows_to: int) -> dict:
        """Padded device batch straight from the map (no intermediates).

        Batches carry the cache's own dtype: an f16 cache ships f16 to the
        device (half the page-cache traffic AND half the host->device
        bytes; collation stays a pure memcpy) — the train/eval steps upcast
        on device. Packing f16 is the opt-in to that ~1e-3 quantization,
        which sits inside the bf16 compute path's existing envelope."""
        B = pad_rows_to
        F = self.feat_dim
        T = max(int(self.num_frames[i]) for i in idxs)
        T = ((T + time_pad_multiple - 1) // time_pad_multiple) * time_pad_multiple
        S = max(int(self.num_spk[i]) for i in idxs)
        mix = np.zeros((B, T, F), self.dtype)
        sources = np.zeros((B, S, T, F), self.dtype)
        lengths = np.zeros((B,), np.int32)
        row_mask = np.zeros((B,), np.float32)
        names = [""] * len(idxs)
        # one preadv per record scatters the file bytes straight into the
        # padded buffers (mix row, then each source row) — no intermediate
        # arrays; offset order maximizes readahead
        for row in sorted(range(len(idxs)),
                          key=lambda r: int(self.offsets[idxs[r]])):
            i = idxs[row]
            t = int(self.num_frames[i])
            s_i = int(self.num_spk[i])
            bufs = [mix[row, :t]] + [sources[row, s, :t] for s in range(s_i)]
            nbytes = (1 + s_i) * t * F * self.dtype.itemsize
            if os.preadv(self._fd, bufs, int(self.offsets[i])) != nbytes:
                raise IOError(f"short read at record {i} of {self.bin_path}")
            lengths[row] = t
            row_mask[row] = 1.0
            names[row] = self.ids[i]
        return {"mix": mix, "sources": sources, "lengths": lengths,
                "row_mask": row_mask, "names": names}


def open_cache(data_dir: str, kind: str) -> FeatureCache | None:
    """FeatureCache if a valid pointer exists (and matches the scp), else
    None. A cache that fails to open (moved bin, stale index) is skipped
    with a warning rather than failing the run."""
    if not os.path.isfile(pointer_path(data_dir, kind)):
        return None
    import warnings
    try:
        cache = FeatureCache(data_dir, kind)
    except Exception as e:  # stale/moved cache: fall back to npz path
        warnings.warn(f"ignoring unusable feature cache for {data_dir}: {e}")
        return None
    scp_ids = [u for u, _ in read_scp(os.path.join(data_dir, f"feats_{kind}.scp"))]
    if cache.ids != scp_ids:
        warnings.warn(f"feature cache for {data_dir} is stale "
                      f"(utterance list changed); re-run pack-features")
        return None
    return cache
