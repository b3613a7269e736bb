"""End-to-end forward parity of the uPIT model against a torch model with
the reference SepDNN's exact composition (archs/uPIT.py:97-147):
packed BLSTM -> pad -> BatchNorm1d(1200) -> Linear -> sigmoid."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from speech_separation_tpu.models import upit


class TorchSepDNN(torch.nn.Module):
    """The reference architecture, transcribed with modern torch APIs."""

    def __init__(self, feat_dim, num_spk, hidden, num_layers):
        super().__init__()
        self.blstm = torch.nn.LSTM(feat_dim, hidden, num_layers=num_layers,
                                   bidirectional=True)
        self.lin = torch.nn.Linear(hidden * 2, feat_dim * num_spk)
        self.bn = torch.nn.BatchNorm1d(hidden * 2)

    def forward(self, packed, hidden):
        from torch.nn.utils.rnn import pad_packed_sequence
        x, _ = self.blstm(packed, hidden)
        x, lens = pad_packed_sequence(x, batch_first=True)
        x = self.bn(x.permute(0, 2, 1).contiguous()).permute(0, 2, 1)
        x = self.lin(x)
        return torch.sigmoid(x), lens


def _copy_params_to_torch(params, model, num_layers):
    sd = model.state_dict()
    for layer_idx, layer in enumerate(params["blstm"]):
        for direction, suffix in (("fwd", ""), ("bwd", "_reverse")):
            p = layer[direction]
            sd[f"blstm.weight_ih_l{layer_idx}{suffix}"] = torch.tensor(
                np.asarray(p["w_ih"]).T.copy())
            sd[f"blstm.weight_hh_l{layer_idx}{suffix}"] = torch.tensor(
                np.asarray(p["w_hh"]).T.copy())
            b = np.asarray(p["b"])
            sd[f"blstm.bias_ih_l{layer_idx}{suffix}"] = torch.tensor(b.copy())
            sd[f"blstm.bias_hh_l{layer_idx}{suffix}"] = torch.tensor(np.zeros_like(b))
    sd["lin.weight"] = torch.tensor(np.asarray(params["lin"]["w"]).T.copy())
    sd["lin.bias"] = torch.tensor(np.asarray(params["lin"]["b"]).copy())
    sd["bn.weight"] = torch.tensor(np.asarray(params["bn"]["gamma"]).copy())
    sd["bn.bias"] = torch.tensor(np.asarray(params["bn"]["beta"]).copy())
    model.load_state_dict(sd)


@pytest.mark.parametrize("train_mode", [True, False])
def test_upit_forward_matches_torch(train_mode):
    from torch.nn.utils.rnn import pack_sequence

    cfg = upit.Config(feat_dim=11, num_spk=2, hidden=8, num_layers=2,
                      zero_init_hidden=True)
    params, state = upit.init(jax.random.PRNGKey(0), cfg)

    tm = TorchSepDNN(cfg.feat_dim, cfg.num_spk, cfg.hidden, cfg.num_layers)
    _copy_params_to_torch(params, tm, cfg.num_layers)

    lengths = [14, 10, 6]
    B, T = len(lengths), max(lengths)
    rng = np.random.default_rng(0)
    xs = [np.abs(rng.standard_normal((n, cfg.feat_dim))).astype(np.float32)
          for n in lengths]

    if not train_mode:
        # push nontrivial running stats through first so eval is meaningful
        tm.train()
        warm = pack_sequence([torch.tensor(x) for x in xs])
        h0 = torch.zeros(cfg.num_layers * 2, B, cfg.hidden)
        tm(warm, (h0, h0.clone()))
        state = {"bn": {"mean": jnp.asarray(tm.bn.running_mean.numpy()),
                        "var": jnp.asarray(tm.bn.running_var.numpy())}}
        tm.eval()
    else:
        tm.train()

    packed = pack_sequence([torch.tensor(x) for x in xs])
    h0 = torch.zeros(cfg.num_layers * 2, B, cfg.hidden)
    ref, _ = tm(packed, (h0, h0.clone()))
    ref = ref.detach().numpy()

    x_pad = np.zeros((B, T, cfg.feat_dim), np.float32)
    for i, x in enumerate(xs):
        x_pad[i, : len(x)] = x
    masks, _ = upit.forward(cfg, params, state, jnp.asarray(x_pad),
                            jnp.asarray(lengths, dtype=jnp.int32),
                            jnp.ones((B,), jnp.float32),
                            jax.random.PRNGKey(1), train=train_mode)
    masks = np.asarray(masks)
    np.testing.assert_allclose(masks, ref, atol=3e-5)
