"""Numerical parity of the lax.scan BLSTM / padded BN against torch.

torch (CPU) is a test-only dependency used as the oracle for the reference's
semantics: nn.LSTM over PackedSequence (reference archs/uPIT.py:115,132) and
nn.BatchNorm1d over the padded output (archs/uPIT.py:119,138). The same
weights are loaded into both implementations and outputs compared.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from speech_separation_tpu.models.blstm import init_blstm_params, blstm_forward
from speech_separation_tpu.ops.batchnorm import init_batchnorm, batchnorm_apply


def _torch_lstm_from_params(params, input_dim, hidden, num_layers):
    """Copy our param pytree into a torch.nn.LSTM."""
    lstm = torch.nn.LSTM(input_dim, hidden, num_layers=num_layers,
                         bidirectional=True)
    sd = {}
    for layer_idx, layer in enumerate(params):
        for direction, suffix in (("fwd", ""), ("bwd", "_reverse")):
            p = layer[direction]
            sd[f"weight_ih_l{layer_idx}{suffix}"] = torch.tensor(
                np.asarray(p["w_ih"]).T.copy())
            sd[f"weight_hh_l{layer_idx}{suffix}"] = torch.tensor(
                np.asarray(p["w_hh"]).T.copy())
            # our single bias = torch's b_ih + b_hh; split arbitrarily
            b = np.asarray(p["b"])
            sd[f"bias_ih_l{layer_idx}{suffix}"] = torch.tensor(b.copy())
            sd[f"bias_hh_l{layer_idx}{suffix}"] = torch.tensor(np.zeros_like(b))
    lstm.load_state_dict(sd)
    return lstm


def _run_torch_packed(lstm, xs, h0, c0):
    """Run torch LSTM over a packed batch (sorted desc by length, like the
    reference collator), return padded output (B, T, 2H) and (h_n, c_n)."""
    from torch.nn.utils.rnn import pack_sequence, pad_packed_sequence
    packed = pack_sequence([torch.tensor(x) for x in xs])
    out, (h_n, c_n) = lstm(packed, (h0, c0))
    padded, lens = pad_packed_sequence(out, batch_first=True)
    return padded.detach().numpy(), h_n.detach().numpy(), c_n.detach().numpy()


@pytest.mark.parametrize("num_layers", [1, 2])
def test_blstm_matches_torch_packed(num_layers):
    input_dim, hidden = 20, 32
    lengths = [17, 11, 5]  # already descending, as after the reference sort
    B, T = len(lengths), max(lengths)
    rng = np.random.default_rng(0)
    xs = [rng.standard_normal((n, input_dim)).astype(np.float32) for n in lengths]

    params = init_blstm_params(jax.random.PRNGKey(1), input_dim, hidden, num_layers)
    lstm = _torch_lstm_from_params(params, input_dim, hidden, num_layers)

    h0 = rng.standard_normal((num_layers * 2, B, hidden)).astype(np.float32)
    c0 = rng.standard_normal((num_layers * 2, B, hidden)).astype(np.float32)
    ref, ref_hn, ref_cn = _run_torch_packed(
        lstm, xs, torch.tensor(h0), torch.tensor(c0))

    x_pad = np.zeros((B, T, input_dim), np.float32)
    for i, x in enumerate(xs):
        x_pad[i, : len(x)] = x
    # torch layout (num_layers*2, B, H) -> ours (num_layers, 2, B, H)
    h0_j = h0.reshape(num_layers, 2, B, hidden)
    c0_j = c0.reshape(num_layers, 2, B, hidden)
    out, (h_n, c_n) = blstm_forward(params, jnp.asarray(x_pad),
                                    jnp.asarray(lengths, dtype=jnp.int32),
                                    jnp.asarray(h0_j), jnp.asarray(c0_j))
    out = np.asarray(out)

    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-5)
    np.testing.assert_allclose(np.asarray(h_n).reshape(ref_hn.shape), ref_hn, atol=2e-5)
    np.testing.assert_allclose(np.asarray(c_n).reshape(ref_cn.shape), ref_cn, atol=2e-5)


def test_batchnorm_matches_torch_padded_semantics():
    """BN over (B, T, C) with stats over B*T incl. padding — the reference
    applies BatchNorm1d to pad_packed output (archs/uPIT.py:138)."""
    B, T, C = 4, 9, 6
    rng = np.random.default_rng(2)
    x = rng.standard_normal((B, T, C)).astype(np.float32)
    lengths = np.array([9, 7, 4, 2])
    for i, n in enumerate(lengths):
        x[i, n:] = 0.0  # packed-LSTM padding is exact zeros

    bn_params, bn_state = init_batchnorm(C)
    # give gamma/beta nontrivial values
    gamma = rng.standard_normal(C).astype(np.float32)
    beta = rng.standard_normal(C).astype(np.float32)
    bn_params = {"gamma": jnp.asarray(gamma), "beta": jnp.asarray(beta)}

    tbn = torch.nn.BatchNorm1d(C)
    with torch.no_grad():
        tbn.weight.copy_(torch.tensor(gamma))
        tbn.bias.copy_(torch.tensor(beta))

    xt = torch.tensor(x).permute(0, 2, 1)  # (B, C, T)
    ref_train = tbn(xt).permute(0, 2, 1).detach().numpy()

    row_mask = jnp.ones((B,), jnp.float32)
    y, new_state = batchnorm_apply(bn_params, bn_state, jnp.asarray(x),
                                   row_mask, train=True)
    np.testing.assert_allclose(np.asarray(y), ref_train, atol=1e-4)
    np.testing.assert_allclose(np.asarray(new_state["mean"]),
                               tbn.running_mean.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_state["var"]),
                               tbn.running_var.numpy(), rtol=1e-4)

    # eval mode: normalize with running stats
    tbn.eval()
    ref_eval = tbn(xt).permute(0, 2, 1).detach().numpy()
    y_eval, _ = batchnorm_apply(bn_params, new_state, jnp.asarray(x),
                                row_mask, train=False)
    np.testing.assert_allclose(np.asarray(y_eval), ref_eval, atol=1e-4)


def test_batchnorm_row_mask_excludes_dummy_rows():
    """A dummy (all-zero, row_mask=0) row must not change the statistics
    vs running the smaller real batch."""
    B, T, C = 3, 5, 4
    rng = np.random.default_rng(3)
    x = rng.standard_normal((B, T, C)).astype(np.float32)
    bn_params, bn_state = init_batchnorm(C)

    y_small, st_small = batchnorm_apply(bn_params, bn_state, jnp.asarray(x),
                                        jnp.ones((B,)), train=True)

    x_padded = np.concatenate([x, np.zeros((1, T, C), np.float32)])
    mask = jnp.asarray([1.0, 1.0, 1.0, 0.0])
    y_pad, st_pad = batchnorm_apply(bn_params, bn_state, jnp.asarray(x_padded),
                                    mask, train=True)
    np.testing.assert_allclose(np.asarray(y_pad)[:B], np.asarray(y_small), atol=1e-6)
    np.testing.assert_allclose(np.asarray(st_pad["mean"]),
                               np.asarray(st_small["mean"]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(st_pad["var"]),
                               np.asarray(st_small["var"]), rtol=1e-5)
