"""Host-side input pipeline: npz features -> static-shape device batches.

Replaces the reference's DataLoader + Collator + pack_sequence stack
(archs/uPIT.py:23-94, steps/train_qsub.py:81) with a pipeline built for
XLA's static-shape world (SURVEY.md §5 long-context note):

- utterances are shuffled per epoch (seeded, reproducible) and grouped into
  fixed-size batches; optional *length bucketing* sorts by length first so
  batches have homogeneous lengths (less padding waste — the TPU analog of
  pack_sequence's effect);
- every batch is padded: time to a multiple of ``time_pad_multiple`` (bounds
  the number of distinct compiled shapes) and batch to the full batch size
  with dummy rows (row_mask=0) so the final partial batch reuses the same
  executable;
- for RSH, batches are additionally grouped by speaker count so each device
  batch has one static S (the host-side replacement for the reference's
  MultiSpkBatch sub-batching, archs/RSH.py:50-69);
- a background prefetch thread overlaps npz decompression with device
  compute (replacing DataLoader's worker process, train_qsub.py:81).

Feature files are the reference's exact npz format: key 'mix' plus
's1'..'sN' for train (magnitude, (freq, time)); complex 'mix' for test
(steps/extract_feats.py:76-78,98). The degenerate single-source case maps
source1 = mix (archs/uPIT.py:72-73).
"""

from __future__ import annotations

import dataclasses
import queue
import threading

import numpy as np

from ..datadir.scp import read_scp


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class FeatureDataset:
    """Indexable view over a feats_train.scp / feats_test.scp file.

    When the data dir carries ``utt2num_frames`` (written by this
    framework's extractor) and the native loader is available, batches are
    assembled by the C++ runtime decompressing each npz member directly
    into the padded batch buffer (no intermediate arrays, no Python inner
    loop) — see utils/native.py / native/sepio.cpp.
    """

    def __init__(self, data_dir: str, kind: str = "train",
                 copy_location: str = ""):
        import os
        self.kind = kind
        self.entries = read_scp(f"{data_dir}/feats_{kind}.scp")
        if not self.entries:
            raise ValueError(f"empty feats_{kind}.scp in {data_dir}")
        if copy_location:
            # reference TrainSet staging (archs/uPIT.py:56-58): copy the
            # feature files to fast local storage and read from there
            from ..datadir.stage import stage_scp_data
            mapping = stage_scp_data(f"{data_dir}/feats_{kind}.scp",
                                     copy_location)
            self.entries = [(utt, mapping.get(path, path))
                            for utt, path in self.entries]
        self.cache = None
        if not copy_location:
            # packed mmap cache (train/feature_cache.py): collation becomes
            # slice copies from the page cache — the 100k-scale path
            from .feature_cache import open_cache
            try:
                self.cache = open_cache(data_dir, kind)
            except Exception:
                self.cache = None
        if self.cache is not None:
            self.num_frames = self.cache.num_frames
            self.num_spks = self.cache.num_spk
            self._feat_dim = self.cache.feat_dim
            return
        self.num_frames = None
        nf_path = os.path.join(data_dir, "utt2num_frames")
        if os.path.isfile(nf_path):
            nf = {k: int(v) for k, v in read_scp(nf_path)}
            if all(utt in nf for utt, _ in self.entries):
                self.num_frames = np.asarray(
                    [nf[utt] for utt, _ in self.entries], np.int32)
        self.num_spks = None
        ns_path = os.path.join(data_dir, "utt2num_spk")
        if os.path.isfile(ns_path):
            ns = {k: int(v) for k, v in read_scp(ns_path)}
            if all(utt in ns for utt, _ in self.entries):
                self.num_spks = np.asarray(
                    [ns[utt] for utt, _ in self.entries], np.int32)
        self._feat_dim = None

    def __len__(self):
        return len(self.entries)

    def utt_id(self, idx: int) -> str:
        return self.entries[idx][0]

    @property
    def feat_dim(self) -> int:
        if self._feat_dim is None:
            self._feat_dim = int(np.load(self.entries[0][1])["mix"].shape[0])
        return self._feat_dim

    def load(self, idx: int) -> dict:
        """Returns {'mix': (T, F) float32, 'sources': (S, T, F) float32}
        for train; {'mix': (T, F) float32 magnitude, 'spec': (F, T)
        complex64, 'name': str} for test."""
        if self.cache is not None:
            return self.cache.load(idx)
        utt, path = self.entries[idx]
        feat = np.load(path)
        if self.kind == "train":
            mix = feat["mix"].T.astype(np.float32)  # (T, F)
            src_keys = sorted(k for k in feat.files if k != "mix")
            if not src_keys:
                sources = mix[None]
            else:
                sources = np.stack([feat[k].T.astype(np.float32) for k in src_keys])
            return {"mix": mix, "sources": sources, "name": utt}
        spec = feat["mix"]  # (F, T) complex
        return {"mix": np.abs(spec).T.astype(np.float32), "spec": spec, "name": utt}


@dataclasses.dataclass(frozen=True)
class BatchPlan:
    batch_size: int = 100
    time_pad_multiple: int = 128
    bucket_by_length: bool = False
    group_by_num_spk: bool = False  # RSH needs one static S per batch
    seed: int = 0


def _pow2_ceil(n: int, cap: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return min(p, cap)


def collate_mixed_batch(dataset: FeatureDataset, idxs: list[int],
                        plan: BatchPlan,
                        num_spks: np.ndarray | None) -> list[dict]:
    """Reference mixed-batch collation (archs/RSH.py:46-70): one shuffled
    batch split into speaker-count sub-batches, ascending by count like the
    reference's range(max_spk) iteration (archs/RSH.py:204). The trainer
    accumulates gradients across the sub-batches and takes ONE optimizer
    step (steps/train_qsub.py:116-122).

    Each sub-batch is padded to its own static shape; rows go to the next
    power of two (bounds the number of compiled executables) and time to
    time_pad_multiple.
    """
    samples = {i: dataset.load(i) for i in idxs}
    groups: dict[int, list[int]] = {}
    for i in idxs:
        s = (int(num_spks[i]) if num_spks is not None
             else samples[i]["sources"].shape[0])
        groups.setdefault(s, []).append(i)
    out = []
    for s in sorted(groups):
        rows = [samples[i] for i in groups[s]]
        out.append(make_device_batch(
            rows, plan, pad_rows_to=_pow2_ceil(len(rows), plan.batch_size)))
    return out


def plan_batches(dataset: FeatureDataset, plan: BatchPlan, epoch: int,
                 lengths: np.ndarray | None = None,
                 num_spks: np.ndarray | None = None,
                 shuffle: bool = True) -> list[list[int]]:
    """Return the epoch's batches as lists of dataset indices."""
    n = len(dataset)
    rng = np.random.default_rng(plan.seed * 100003 + epoch)
    order = rng.permutation(n) if shuffle else np.arange(n)

    groups: dict[int, list[int]] = {}
    if plan.group_by_num_spk and num_spks is not None:
        for i in order:
            groups.setdefault(int(num_spks[i]), []).append(int(i))
    else:
        groups[0] = [int(i) for i in order]

    batches = []
    for idxs in groups.values():
        if plan.bucket_by_length and lengths is not None:
            idxs = sorted(idxs, key=lambda i: int(lengths[i]))
        for s in range(0, len(idxs), plan.batch_size):
            batches.append(idxs[s: s + plan.batch_size])
    if shuffle and plan.bucket_by_length:
        rng.shuffle(batches)
    return batches


def make_device_batch(samples: list[dict], plan: BatchPlan,
                      pad_rows_to: int | None = None) -> dict:
    """Collate loaded samples into padded numpy arrays ready for device.

    Returns {'mix': (B,T,F), 'sources': (B,S,T,F), 'lengths': (B,),
    'row_mask': (B,), 'names': [...]} with B = pad_rows_to (default the plan
    batch size) and T the max length rounded up to time_pad_multiple.
    """
    B = pad_rows_to or plan.batch_size
    n_real = len(samples)
    assert n_real <= B
    F = samples[0]["mix"].shape[1]
    S = max(s["sources"].shape[0] for s in samples) if "sources" in samples[0] else 0
    T = _round_up(max(s["mix"].shape[0] for s in samples), plan.time_pad_multiple)

    mix = np.zeros((B, T, F), np.float32)
    lengths = np.zeros((B,), np.int32)
    row_mask = np.zeros((B,), np.float32)
    names = []
    sources = np.zeros((B, S, T, F), np.float32) if S else None
    for i, s in enumerate(samples):
        t = s["mix"].shape[0]
        mix[i, :t] = s["mix"]
        lengths[i] = t
        row_mask[i] = 1.0
        names.append(s.get("name", str(i)))
        if S:
            src = s["sources"]
            sources[i, : src.shape[0], :t] = src
    out = {"mix": mix, "lengths": lengths, "row_mask": row_mask, "names": names}
    if S:
        out["sources"] = sources
    return out


def collate_native(dataset: FeatureDataset, idxs: list[int],
                   plan: BatchPlan) -> dict:
    """Collate a batch by decompressing npz members straight into the padded
    batch buffers via the native runtime. Requires utt2num_frames."""
    from ..utils import native

    B = plan.batch_size
    F = dataset.feat_dim
    lengths_true = [int(dataset.num_frames[i]) for i in idxs]
    T = _round_up(max(lengths_true), plan.time_pad_multiple)
    train = dataset.kind == "train"
    S = 0
    if train:
        S = max(1, max(int(dataset.num_spks[i]) for i in idxs)
                if dataset.num_spks is not None else 1)

    mix = np.zeros((B, T, F), np.float32)
    sources = np.zeros((B, S, T, F), np.float32) if train else None
    lengths = np.zeros((B,), np.int32)
    row_mask = np.zeros((B,), np.float32)
    names = []
    for row, i in enumerate(idxs):
        utt, path = dataset.entries[i]
        # mode 1 takes |.| of complex test spectra and passes f32 through
        native.load_npz_2d_transposed(path, "mix", mix[row],
                                      mode=0 if train else 1)
        lengths[row] = lengths_true[row]
        row_mask[row] = 1.0
        names.append(utt)
        if train:
            n_spk = (int(dataset.num_spks[i])
                     if dataset.num_spks is not None else S)
            for s in range(n_spk):
                try:
                    native.load_npz_2d_transposed(path, f"s{s + 1}",
                                                  sources[row, s], mode=0)
                except IOError:
                    if s == 0:  # degenerate single-source: source1 = mix
                        sources[row, 0] = mix[row]
                    else:
                        raise
    out = {"mix": mix, "lengths": lengths, "row_mask": row_mask, "names": names}
    if train:
        out["sources"] = sources
    return out


def _collate(dataset: FeatureDataset, idxs: list[int], plan: BatchPlan) -> dict:
    if getattr(dataset, "cache", None) is not None and dataset.kind == "train":
        return dataset.cache.collate(idxs, plan.time_pad_multiple,
                                     pad_rows_to=plan.batch_size)
    from ..utils import native
    if dataset.num_frames is not None and native.available():
        return collate_native(dataset, idxs, plan)
    return make_device_batch([dataset.load(i) for i in idxs], plan)


def iter_batches(dataset, plan: BatchPlan, epoch: int,
                 shuffle: bool = True, prefetch: int = 2,
                 lengths: np.ndarray | None = None,
                 num_spks: np.ndarray | None = None,
                 collate_fn=None, transfer_fn=None):
    """Yield collated batches, loading + collating in a background thread.

    `dataset` is any indexable with __len__; collate_fn(idxs) overrides the
    default FeatureDataset collation (used by the waveform-direct pipeline).
    `transfer_fn(batch)` (e.g. device_put with sharding) also runs in the
    producer thread, so host->device transfers overlap device compute —
    on hosts where the device link is slow, the epoch wall approaches
    max(transfer, compute) instead of their sum.
    """
    if lengths is None:
        lengths = getattr(dataset, "num_frames", None)
    batches = plan_batches(dataset, plan, epoch, lengths=lengths,
                           num_spks=num_spks, shuffle=shuffle)
    if collate_fn is None:
        collate_fn = lambda idxs: _collate(dataset, idxs, plan)

    _SENTINEL = object()
    q_collated: queue.Queue = queue.Queue(maxsize=prefetch)

    def collate_producer():
        try:
            for idxs in batches:
                q_collated.put(collate_fn(idxs))
        except Exception as e:  # surface loader errors on the consumer side
            q_collated.put(e)
            return
        q_collated.put(_SENTINEL)

    threading.Thread(target=collate_producer, daemon=True).start()
    q_out = q_collated

    if transfer_fn is not None:
        # second pipeline stage: device transfer overlaps both collation
        # and device compute (three-deep pipeline)
        q_dev: queue.Queue = queue.Queue(maxsize=prefetch)

        def transfer_producer():
            while True:
                item = q_collated.get()
                if item is _SENTINEL or isinstance(item, Exception):
                    q_dev.put(item)
                    return
                try:
                    q_dev.put(transfer_fn(item))
                except Exception as e:
                    q_dev.put(e)
                    return

        threading.Thread(target=transfer_producer, daemon=True).start()
        q_out = q_dev

    while True:
        item = q_out.get()
        if item is _SENTINEL:
            break
        if isinstance(item, Exception):
            raise item
        yield item
