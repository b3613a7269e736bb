"""Torch .mdl import (VERDICT round-1 missing #5): a reference user's
trained state-dicts evaluate in this framework. Round-trip: torch model ->
torch.save(state_dict) -> import -> masks identical to the torch forward."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from speech_separation_tpu.models import rsh, upit
from speech_separation_tpu.utils.import_torch import (import_reference_model,
                                                      load_torch_state_dict,
                                                      params_from_state_dict)

from torch_ref import TorchRSH, TorchUPIT, make_combo, rsh_masks

F, S, H, L = 11, 2, 8, 2
LENGTHS = [14, 10, 6]


def _mix_batch(seed=0):
    rng = np.random.default_rng(seed)
    B, T = len(LENGTHS), max(LENGTHS)
    mix = np.abs(rng.standard_normal((B, T, F))).astype(np.float32)
    for b, n in enumerate(LENGTHS):
        mix[b, n:] = 0.0
    return mix


def _warm_bn(tm, mix):
    """Push nontrivial BN running stats through a torch train-mode pass."""
    tm.train()
    if isinstance(tm, TorchUPIT):
        tm(torch.tensor(mix), LENGTHS)
    else:
        tm.init_hidden(mix.shape[0])
        from torch.nn.utils.rnn import pack_padded_sequence
        combo = make_combo(torch.tensor(mix), LENGTHS)
        tm(pack_padded_sequence(combo, LENGTHS, batch_first=True,
                                enforce_sorted=False), mix.shape[1])
    tm.eval()


def test_upit_mdl_roundtrip(tmp_path):
    tm = TorchUPIT(F, S, H, L)
    mix = _mix_batch()
    _warm_bn(tm, mix)
    mdl = str(tmp_path / "final.mdl")
    torch.save(tm.state_dict(), mdl)

    params, state, info = params_from_state_dict(load_torch_state_dict(mdl))
    assert info == {"arch": "uPIT", "feat_dim": F, "num_spk": S,
                    "hidden": H, "num_layers": L}

    with torch.no_grad():
        ref = tm(torch.tensor(mix), LENGTHS).numpy()

    cfg = upit.Config(feat_dim=F, num_spk=S, hidden=H, num_layers=L,
                      zero_init_hidden=True)
    batch = {"mix": jnp.asarray(mix),
             "lengths": jnp.asarray(LENGTHS, dtype=jnp.int32),
             "row_mask": jnp.ones((len(LENGTHS),), jnp.float32)}
    masks = np.asarray(upit.infer_masks(cfg, params, state, batch,
                                        jax.random.PRNGKey(0)))
    for b, n in enumerate(LENGTHS):
        np.testing.assert_allclose(masks[b, :n], ref[b, :n], atol=1e-5)


def test_rsh_mdl_roundtrip(tmp_path):
    tm = TorchRSH(F, H, L)
    mix = _mix_batch(seed=1)
    _warm_bn(tm, mix)
    mdl = str(tmp_path / "final.mdl")
    torch.save(tm.state_dict(), mdl)

    params, state, info = params_from_state_dict(load_torch_state_dict(mdl))
    assert info["arch"] == "RSH" and info["feat_dim"] == F

    tm.eval()
    with torch.no_grad():
        combo = make_combo(torch.tensor(mix), LENGTHS)
        ref = rsh_masks(tm, combo, LENGTHS, S).numpy()

    cfg = rsh.Config(feat_dim=F, hidden=H, num_layers=L, zero_init_hidden=True)
    batch = {"mix": jnp.asarray(mix),
             "lengths": jnp.asarray(LENGTHS, dtype=jnp.int32),
             "row_mask": jnp.ones((len(LENGTHS),), jnp.float32)}
    masks = np.asarray(rsh.infer_masks(cfg, params, state, batch,
                                       jax.random.PRNGKey(0), num_spk=S))
    for b, n in enumerate(LENGTHS):
        np.testing.assert_allclose(masks[b, :, :n], ref[b, :, :n], atol=1e-5)


def test_import_model_evaluates_end_to_end(tmp_path):
    """import-model produces a checkpoint that eval/infer.generate_masks
    consumes directly (the steps/eval_qsub.py migration path)."""
    from speech_separation_tpu.eval.infer import generate_masks

    tm = TorchUPIT(F, S, H, L)
    mix = _mix_batch(seed=2)
    _warm_bn(tm, mix)
    mdl = str(tmp_path / "ref.mdl")
    torch.save(tm.state_dict(), mdl)
    out_mdl = str(tmp_path / "imported.mdl")
    info = import_reference_model(mdl, out_mdl, log=lambda *_: None)
    assert info["arch"] == "uPIT"

    # tiny test feature dir (complex mix spectra, reference test format)
    feats = tmp_path / "data"
    os.makedirs(feats, exist_ok=True)
    rng = np.random.default_rng(3)
    lines = []
    for i, n in enumerate(LENGTHS):
        spec = (rng.standard_normal((F, n)) +
                1j * rng.standard_normal((F, n))).astype(np.complex64)
        p = str(feats / f"u{i}.npz")
        np.savez(p, mix=spec)
        lines.append(f"u{i} {p}")
    (feats / "feats_test.scp").write_text("\n".join(lines) + "\n")

    out_dir = str(tmp_path / "masks")
    generate_masks(out_mdl, str(feats), out_dir, batch_size=3,
                   time_pad_multiple=2, log=lambda *_: None)
    for i, n in enumerate(LENGTHS):
        m = np.load(os.path.join(out_dir, f"u{i}.npz"))
        assert set(m.files) == {"s1", "s2"}
        assert m["s1"].shape == (F, n)
        assert np.all((m["s1"] >= 0) & (m["s1"] <= 1))


def _randomize_bn_state(state, seed):
    """Non-trivial running stats so export parity exercises them."""
    rng = np.random.default_rng(seed)
    mean = rng.standard_normal(state["bn"]["mean"].shape).astype(np.float32)
    var = (0.5 + rng.random(state["bn"]["var"].shape)).astype(np.float32)
    return {"bn": {"mean": jnp.asarray(mean), "var": jnp.asarray(var)}}


def test_export_model_upit_torch_forward_parity(tmp_path):
    """export-model (the reverse migration): a framework-trained uPIT
    checkpoint torch.load()s into the reference SepDNN layout and the torch
    forward matches the framework forward."""
    from speech_separation_tpu.train.checkpoint import save_checkpoint
    from speech_separation_tpu.utils.import_torch import export_reference_model

    cfg = upit.Config(feat_dim=F, num_spk=S, hidden=H, num_layers=L,
                      zero_init_hidden=True)
    params, state = upit.init(jax.random.PRNGKey(7), cfg)
    state = _randomize_bn_state(state, seed=11)
    ckpt = str(tmp_path / "final.native")
    save_checkpoint(ckpt, params=params, state=state,
                    meta={"arch": "uPIT",
                          "model_kwargs": {"feat_dim": str(F),
                                           "num_spk": str(S),
                                           "hidden": str(H),
                                           "num_layers": str(L)}})
    mdl = str(tmp_path / "exported.mdl")
    info = export_reference_model(ckpt, mdl, log=lambda *_: None)
    assert info == {"arch": "uPIT", "feat_dim": F, "num_spk": S,
                    "hidden": H, "num_layers": L}

    tm = TorchUPIT(F, S, H, L)
    tm.load_state_dict(torch.load(mdl, map_location="cpu"))  # strict
    tm.eval()
    mix = _mix_batch(seed=4)
    with torch.no_grad():
        ref = tm(torch.tensor(mix), LENGTHS).numpy()

    batch = {"mix": jnp.asarray(mix),
             "lengths": jnp.asarray(LENGTHS, dtype=jnp.int32),
             "row_mask": jnp.ones((len(LENGTHS),), jnp.float32)}
    masks = np.asarray(upit.infer_masks(cfg, params, state, batch,
                                        jax.random.PRNGKey(0)))
    for b, n in enumerate(LENGTHS):
        np.testing.assert_allclose(masks[b, :n], ref[b, :n], atol=1e-5)


def test_export_model_rsh_torch_forward_parity(tmp_path):
    from speech_separation_tpu.train.checkpoint import save_checkpoint
    from speech_separation_tpu.utils.import_torch import export_reference_model

    cfg = rsh.Config(feat_dim=F, hidden=H, num_layers=L,
                     zero_init_hidden=True)
    params, state = rsh.init(jax.random.PRNGKey(8), cfg)
    state = _randomize_bn_state(state, seed=12)
    ckpt = str(tmp_path / "final.native")
    save_checkpoint(ckpt, params=params, state=state,
                    meta={"arch": "RSH",
                          "model_kwargs": {"feat_dim": str(F),
                                           "hidden": str(H),
                                           "num_layers": str(L)}})
    mdl = str(tmp_path / "exported.mdl")
    info = export_reference_model(ckpt, mdl, log=lambda *_: None)
    assert info["arch"] == "RSH" and info["feat_dim"] == F

    tm = TorchRSH(F, H, L)
    tm.load_state_dict(torch.load(mdl, map_location="cpu"))
    tm.eval()
    mix = _mix_batch(seed=5)
    with torch.no_grad():
        combo = make_combo(torch.tensor(mix), LENGTHS)
        ref = rsh_masks(tm, combo, LENGTHS, S).numpy()

    batch = {"mix": jnp.asarray(mix),
             "lengths": jnp.asarray(LENGTHS, dtype=jnp.int32),
             "row_mask": jnp.ones((len(LENGTHS),), jnp.float32)}
    masks = np.asarray(rsh.infer_masks(cfg, params, state, batch,
                                       jax.random.PRNGKey(0), num_spk=S))
    for b, n in enumerate(LENGTHS):
        np.testing.assert_allclose(masks[b, :, :n], ref[b, :, :n], atol=1e-5)


def test_export_import_roundtrip_bitexact(tmp_path):
    """import(export(ckpt)) reproduces every weight bit-for-bit (the bias
    split is sum-preserving)."""
    from speech_separation_tpu.train.checkpoint import (load_checkpoint,
                                                        save_checkpoint)
    from speech_separation_tpu.utils.import_torch import export_reference_model

    cfg = upit.Config(feat_dim=F, num_spk=S, hidden=H, num_layers=L)
    params, state = upit.init(jax.random.PRNGKey(9), cfg)
    state = _randomize_bn_state(state, seed=13)
    ckpt = str(tmp_path / "a.native")
    save_checkpoint(ckpt, params=params, state=state, meta={"arch": "uPIT"})
    mdl = str(tmp_path / "a.mdl")
    export_reference_model(ckpt, mdl, log=lambda *_: None)
    back = str(tmp_path / "b.native")
    import_reference_model(mdl, back, log=lambda *_: None)

    a, b = load_checkpoint(ckpt), load_checkpoint(back)
    flat_a = jax.tree_util.tree_leaves_with_path(
        {"params": a["params"], "state": a["state"]})
    flat_b = dict(jax.tree_util.tree_leaves_with_path(
        {"params": b["params"], "state": b["state"]}))
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        np.testing.assert_array_equal(np.asarray(leaf),
                                      np.asarray(flat_b[path]), err_msg=str(path))


def test_export_model_rejects_time_domain(tmp_path):
    """Only the reference archs have a .mdl counterpart; a Conv-TasNet
    checkpoint must fail loudly, not emit a garbage state dict."""
    from speech_separation_tpu.models import convtasnet
    from speech_separation_tpu.train.checkpoint import save_checkpoint
    from speech_separation_tpu.utils.import_torch import export_reference_model

    cfg = convtasnet.Config(n_filters=8, channels=4, hidden=8,
                            blocks=2, repeats=1, kernel=3, num_spk=2)
    params, state = convtasnet.init(jax.random.PRNGKey(1), cfg)
    ckpt = str(tmp_path / "tasnet.native")
    save_checkpoint(ckpt, params=params, state=state,
                    meta={"arch": "ConvTasNet"})
    with pytest.raises(ValueError, match="ConvTasNet"):
        export_reference_model(ckpt, str(tmp_path / "x.mdl"),
                               log=lambda *_: None)
