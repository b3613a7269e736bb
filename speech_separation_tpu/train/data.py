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
    """Indexable view over a feats_train.scp / feats_test.scp file."""

    def __init__(self, data_dir: str, kind: str = "train"):
        self.kind = kind
        self.entries = read_scp(f"{data_dir}/feats_{kind}.scp")
        if not self.entries:
            raise ValueError(f"empty feats_{kind}.scp in {data_dir}")

    def __len__(self):
        return len(self.entries)

    def utt_id(self, idx: int) -> str:
        return self.entries[idx][0]

    def load(self, idx: int) -> dict:
        """Returns {'mix': (T, F) float32, 'sources': (S, T, F) float32}
        for train; {'mix': (T, F) float32 magnitude, 'spec': (F, T)
        complex64, 'name': str} for test."""
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


def iter_batches(dataset: FeatureDataset, plan: BatchPlan, epoch: int,
                 shuffle: bool = True, prefetch: int = 2,
                 lengths: np.ndarray | None = None,
                 num_spks: np.ndarray | None = None):
    """Yield collated batches, loading + collating in a background thread."""
    batches = plan_batches(dataset, plan, epoch, lengths=lengths,
                           num_spks=num_spks, shuffle=shuffle)
    q: queue.Queue = queue.Queue(maxsize=prefetch)
    _SENTINEL = object()

    def producer():
        try:
            for idxs in batches:
                samples = [dataset.load(i) for i in idxs]
                q.put(make_device_batch(samples, plan))
        except Exception as e:  # surface loader errors on the consumer side
            q.put(e)
            return
        q.put(_SENTINEL)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            break
        if isinstance(item, Exception):
            raise item
        yield item
