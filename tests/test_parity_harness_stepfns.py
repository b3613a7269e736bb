"""step_fns reuse in the parity harness is trajectory-identical.

tools/run_convergence_tpu.py shares one (optimizer, step, eval_step)
triple across seeds of the same config so each shape compiles once per
config instead of once per seed (tens of seconds per compile on the TPU
backend). That is only sound if a reused jit'd step gives bit-identical
training to a freshly built one — pinned here on CPU.
"""

import numpy as np

from parity_harness import make_corpus, run_parity


def test_step_fns_reuse_is_bit_identical():
    F, S, H, L = 9, 2, 6, 2
    corpus = make_corpus(8, F, S, (10, 14), seed=3)
    cv = make_corpus(4, F, S, (10, 14), seed=4)
    kw = dict(F=F, S=S, H=H, L=L, batch_size=4, n_epochs=5, cv_every=5,
              with_torch=False)

    fresh0 = run_parity("uPIT", corpus, cv, seed=0, **kw)
    # seed 1 twice: once fresh, once reusing seed 0's compiled steps
    fresh1 = run_parity("uPIT", corpus, cv, seed=1, **kw)
    reused1 = run_parity("uPIT", corpus, cv, seed=1,
                         step_fns=fresh0["step_fns"], **kw)

    np.testing.assert_array_equal(np.asarray(fresh1["j_train"]),
                                  np.asarray(reused1["j_train"]))
    np.testing.assert_array_equal(np.asarray(fresh1["j_cv"]),
                                  np.asarray(reused1["j_cv"]))
    for (ka, a), (kb, b) in zip(
            sorted(_leaves(fresh1["params"])), sorted(_leaves(reused1["params"]))):
        assert ka == kb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def _leaves(tree, prefix=""):
    if isinstance(tree, dict):
        out = []
        for k, v in tree.items():
            out += _leaves(v, f"{prefix}/{k}")
        return out
    if isinstance(tree, (list, tuple)):
        out = []
        for i, v in enumerate(tree):
            out += _leaves(v, f"{prefix}/{i}")
        return out
    return [(prefix, tree)]
