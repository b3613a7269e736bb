"""remat=True must not change losses or gradients (only memory/compute)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speech_separation_tpu.models import upit, rsh


def _batch(B=3, T=10, F=7, S=2, seed=0):
    rng = np.random.default_rng(seed)
    lengths = np.array([T, 7, 4], np.int32)
    mix = np.abs(rng.standard_normal((B, T, F))).astype(np.float32)
    sources = np.abs(rng.standard_normal((B, S, T, F))).astype(np.float32)
    for b in range(B):
        mix[b, lengths[b]:] = 0.0
        sources[b, :, lengths[b]:] = 0.0
    return {"mix": jnp.asarray(mix), "sources": jnp.asarray(sources),
            "lengths": jnp.asarray(lengths),
            "row_mask": jnp.ones((B,), jnp.float32)}


@pytest.mark.parametrize("mod", [upit, rsh])
def test_remat_equivalence(mod):
    base = dict(feat_dim=7, hidden=6, num_layers=1, zero_init_hidden=True)
    cfg_plain = mod.Config(**base)
    cfg_remat = mod.Config(remat=True, **base)
    params, state = mod.init(jax.random.PRNGKey(0), cfg_plain)
    batch = _batch()
    rng = jax.random.PRNGKey(1)

    def loss(cfg, p):
        return mod.loss_fn(cfg, p, state, batch, rng, True)[0]

    l_plain, g_plain = jax.value_and_grad(lambda p: loss(cfg_plain, p))(params)
    l_remat, g_remat = jax.value_and_grad(lambda p: loss(cfg_remat, p))(params)
    np.testing.assert_allclose(float(l_plain), float(l_remat), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g_plain),
                    jax.tree_util.tree_leaves(g_remat)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
