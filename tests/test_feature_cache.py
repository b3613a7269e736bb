"""Packed mmap feature cache (train/feature_cache.py): the 100k-scale
repeated-epoch input path. Pinned property: cached collation is bit-equal
(f32) / tolerance-equal (f16) to the per-npz path, and stale caches are
refused rather than silently served."""

import os

import numpy as np
import pytest

from speech_separation_tpu.datadir import DatasetRegistry, prepare_data_dir
from speech_separation_tpu.dsp import STFTConfig
from speech_separation_tpu.dsp.extract import extract_features
from speech_separation_tpu.train.data import (BatchPlan, FeatureDataset,
                                              iter_batches)
from speech_separation_tpu.train.feature_cache import (FeatureCache,
                                                       open_cache,
                                                       pack_features,
                                                       pointer_path)
from speech_separation_tpu.utils.synthetic import (make_synthetic_corpus,
                                                   write_id_list)


@pytest.fixture(scope="module")
def featdir(tmp_path_factory):
    root = tmp_path_factory.mktemp("cache")
    corpus = str(root / "corpus")
    ids = make_synthetic_corpus(corpus, 6, seed=3, prefix="c")
    id_lists = str(root / "id_lists")
    write_id_list(id_lists, "cache_tr", ids)
    reg = DatasetRegistry({"cache_tr": corpus})
    data_dir = prepare_data_dir("cache_tr", reg, data_root=str(root / "data"),
                                id_lists_dir=id_lists)
    extract_features(data_dir, "train", str(root / "feats"), STFTConfig())
    return data_dir


def _epoch_batches(data_dir, plan):
    ds = FeatureDataset(data_dir, "train")
    return ds, list(iter_batches(ds, plan, epoch=0, shuffle=True,
                                 num_spks=ds.num_spks))


def test_cached_batches_bit_equal_npz_path(featdir):
    plan = BatchPlan(batch_size=4, time_pad_multiple=16)
    ds_npz, ref = _epoch_batches(featdir, plan)
    assert ds_npz.cache is None

    pack_features(featdir, "train", log=lambda *_: None)
    ds_c, got = _epoch_batches(featdir, plan)
    assert ds_c.cache is not None
    assert len(got) == len(ref)
    for b_ref, b_got in zip(ref, got):
        assert b_got["names"] == b_ref["names"]
        for k in ("mix", "sources", "lengths", "row_mask"):
            np.testing.assert_array_equal(b_got[k], b_ref[k], err_msg=k)


def test_cache_load_matches_npz_load(featdir):
    pack_features(featdir, "train", log=lambda *_: None)
    ds = FeatureDataset(featdir, "train")
    assert ds.cache is not None
    cache: FeatureCache = ds.cache
    # bypass the cache for the reference loads
    ds_ref = FeatureDataset(featdir, "train")
    ds_ref.cache = None
    for i in range(len(ds_ref)):
        ref = ds_ref.load(i)
        got = cache.load(i)
        assert got["name"] == ref["name"]
        np.testing.assert_array_equal(got["mix"], ref["mix"])
        np.testing.assert_array_equal(got["sources"], ref["sources"])


def test_float16_cache_within_tolerance(featdir, tmp_path):
    pack_features(featdir, "train", cache_path=str(tmp_path / "c16.bin"),
                  dtype="float16", log=lambda *_: None)
    ds = FeatureDataset(featdir, "train")
    assert ds.cache is not None and ds.cache.dtype == np.float16
    ds_ref = FeatureDataset(featdir, "train")
    ds_ref.cache = None
    for i in range(len(ds_ref)):
        ref, got = ds_ref.load(i), ds.cache.load(i)
        scale = np.abs(ref["mix"]).max()
        assert np.abs(got["mix"] - ref["mix"]).max() <= 1e-3 * scale
    # restore the f32 cache for other tests
    pack_features(featdir, "train", log=lambda *_: None)


def test_f16_batches_ship_f16_and_train_step_upcasts(featdir, tmp_path):
    """An f16 cache ships f16 batches; the jit'd step upcasts on device and
    lands within the quantization envelope of the f32 path."""
    import jax
    from speech_separation_tpu.models import upit
    from speech_separation_tpu.train.loop import (TrainLoopConfig,
                                                  make_optimizer,
                                                  make_update_step)

    plan = BatchPlan(batch_size=6, time_pad_multiple=16)
    ds_f32, (b32,) = _epoch_batches(featdir, plan)
    assert b32["mix"].dtype == np.float32

    pack_features(featdir, "train", cache_path=str(tmp_path / "s16.bin"),
                  dtype="float16", log=lambda *_: None)
    try:
        _, (b16,) = _epoch_batches(featdir, plan)
        assert b16["mix"].dtype == np.float16
        assert b16["sources"].dtype == np.float16

        cfg = upit.Config(hidden=8, num_layers=1, zero_init_hidden=True)
        opt = make_optimizer(TrainLoopConfig())
        step = make_update_step(upit, cfg, opt)
        key = jax.random.PRNGKey(1)

        def run(b):
            # fresh params per run: the step donates its param/state buffers
            params, state = upit.init(jax.random.PRNGKey(0), cfg)
            batch = {k: v for k, v in b.items() if k != "names"}
            *_, loss, norm = step(params, state, opt.init(params), batch, key)
            return float(loss), float(norm)

        l32, n32 = run(b32)
        l16, n16 = run(b16)
        assert n16 == n32
        assert abs(l16 - l32) <= 2e-3 * abs(l32)
    finally:
        pack_features(featdir, "train", log=lambda *_: None)


def test_stale_cache_refused(featdir, tmp_path):
    pack_features(featdir, "train", log=lambda *_: None)
    assert open_cache(featdir, "train") is not None

    scp = os.path.join(featdir, "feats_train.scp")
    with open(scp) as f:
        lines = f.readlines()
    with open(scp, "w") as f:
        f.writelines(lines[:-1])  # drop an utterance -> cache is stale
    try:
        with pytest.warns(UserWarning, match="stale"):
            assert open_cache(featdir, "train") is None
        ds = FeatureDataset(featdir, "train")  # falls back to npz path
        assert ds.cache is None and len(ds) == len(lines) - 1
    finally:
        with open(scp, "w") as f:
            f.writelines(lines)

    # moved/deleted bin -> refused, not crashed
    with open(pointer_path(featdir, "train")) as f:
        bin_path = f.read().strip()
    os.rename(bin_path, bin_path + ".gone")
    try:
        with pytest.warns(UserWarning, match="unusable"):
            assert open_cache(featdir, "train") is None
    finally:
        os.rename(bin_path + ".gone", bin_path)


def test_pack_features_train_only(featdir):
    with pytest.raises(ValueError, match="train"):
        pack_features(featdir, "test")
