"""Loss-semantics tests: the PIT and RSH objectives are validated against
direct numpy transcriptions of the reference formulas (archs/uPIT.py:157-206,
archs/RSH.py:197-259), using arbitrary masks so the test isolates the loss
math from the network."""

import itertools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speech_separation_tpu.ops.pit import (
    pairwise_mse, permutation_min_loss, make_permutations)


def _rand(shape, seed):
    return np.random.default_rng(seed).standard_normal(shape).astype(np.float32)


def _np_upit_loss(masked, sources, lengths, feat_dim, num_spk):
    """Direct transcription of the reference objective: for every
    permutation, sum of squared errors over all elements; min over perms;
    loss = sum_b min / num_spk; norm = sum(lengths)*feat_dim."""
    B = masked.shape[0]
    total = 0.0
    for b in range(B):
        best = np.inf
        for perm in itertools.permutations(range(num_spk)):
            err = 0.0
            for i, j in enumerate(perm):
                err += np.sum((masked[b, :, i, :] - sources[b, j]) ** 2)
            best = min(best, err)
        total += best
    loss = total / num_spk
    norm = np.sum(lengths) * feat_dim
    return loss / norm, norm


@pytest.mark.parametrize("num_spk", [2, 3])
def test_pit_loss_matches_reference_formula(num_spk):
    B, T, F = 3, 12, 7
    lengths = np.array([12, 9, 5], np.int32)
    mix = np.abs(_rand((B, T, F), 0))
    masks = 1.0 / (1.0 + np.exp(-_rand((B, T, num_spk, F), 1)))
    sources = np.abs(_rand((B, num_spk, T, F), 2))
    # zero-pad beyond each row's length (as the pipeline guarantees)
    for b in range(B):
        mix[b, lengths[b]:] = 0.0
        sources[b, :, lengths[b]:] = 0.0

    masked = masks * mix[:, :, None, :]
    pair = pairwise_mse(jnp.asarray(masked), jnp.asarray(sources))
    min_losses, best = permutation_min_loss(pair, num_spk)
    loss = float(jnp.sum(min_losses)) / num_spk / (np.sum(lengths) * F)

    ref_loss, _ = _np_upit_loss(masked, sources, lengths, F, num_spk)
    np.testing.assert_allclose(loss, ref_loss, rtol=1e-5)


def test_pit_min_leq_any_fixed_assignment():
    """Property: min-over-permutations <= identity assignment."""
    B, T, F, S = 4, 10, 6, 2
    masked = np.abs(_rand((B, T, S, F), 3))
    sources = np.abs(_rand((B, S, T, F), 4))
    pair = pairwise_mse(jnp.asarray(masked), jnp.asarray(sources))
    min_losses, _ = permutation_min_loss(pair, S)
    identity = jnp.sum(jnp.stack([pair[:, i, i] for i in range(S)]), axis=0)
    assert bool(jnp.all(min_losses <= identity + 1e-6))


def test_permutation_order_matches_itertools():
    perms = make_permutations(3)
    assert perms.tolist() == [list(p) for p in itertools.permutations(range(3))]


def test_rsh_greedy_assignment_semantics():
    """The RSH per-pass greedy assignment (+Inf exclusion of used sources,
    archs/RSH.py:232-238) — validated on the loss_fn with a tiny model by
    checking each pass's chosen sources are distinct per sample and the
    loss equals the numpy recomputation from the masks it emitted."""
    from speech_separation_tpu.models import rsh

    cfg = rsh.Config(feat_dim=5, hidden=4, num_layers=1, zero_init_hidden=True)
    key = jax.random.PRNGKey(0)
    params, state = rsh.init(key, cfg)

    B, T, F, S = 3, 8, 5, 2
    lengths = np.array([8, 6, 4], np.int32)
    mix = np.abs(_rand((B, T, F), 5))
    sources = np.abs(_rand((B, S, T, F), 6))
    for b in range(B):
        mix[b, lengths[b]:] = 0.0
        sources[b, :, lengths[b]:] = 0.0
    batch = {
        "mix": jnp.asarray(mix), "sources": jnp.asarray(sources),
        "lengths": jnp.asarray(lengths), "row_mask": jnp.ones((B,), jnp.float32),
    }
    loss, aux = rsh.loss_fn(cfg, params, state, batch, jax.random.PRNGKey(1), train=True)

    assignments = np.asarray(aux["assignments"])  # (B, S)
    for b in range(B):
        assert sorted(assignments[b].tolist()) == list(range(S))

    # recompute the loss from the emitted masks with numpy greedy logic
    masks = np.asarray(aux["masks"])  # (B, S_pass, T, F)
    total = 0.0
    for b in range(B):
        used = set()
        for p in range(S):
            errs = [np.sum((masks[b, p] * mix[b] - sources[b, j]) ** 2)
                    if j not in used else np.inf for j in range(S)]
            j = int(np.argmin(errs))
            used.add(j)
            total += errs[j] / S
    norm = S * np.sum(lengths) * F
    np.testing.assert_allclose(float(loss), total / norm, rtol=1e-4)


def test_rsh_loss_differentiable():
    from speech_separation_tpu.models import rsh

    cfg = rsh.Config(feat_dim=5, hidden=4, num_layers=1, zero_init_hidden=True)
    params, state = rsh.init(jax.random.PRNGKey(0), cfg)
    B, T, F, S = 2, 6, 5, 2
    batch = {
        "mix": jnp.abs(jnp.asarray(_rand((B, T, F), 7))),
        "sources": jnp.abs(jnp.asarray(_rand((B, S, T, F), 8))),
        "lengths": jnp.asarray([6, 4], dtype=jnp.int32),
        "row_mask": jnp.ones((B,), jnp.float32),
    }
    grads = jax.grad(lambda p: rsh.loss_fn(cfg, p, state, batch,
                                           jax.random.PRNGKey(1), True)[0])(params)
    flat, _ = jax.tree_util.tree_flatten(grads)
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in flat)
    assert any(float(jnp.max(jnp.abs(g))) > 0 for g in flat)
