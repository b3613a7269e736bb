"""Multi-epoch trajectory parity (VERDICT round-1 missing #1a): >=100
optimizer steps / multiple epochs, train AND CV loss curves, for BOTH uPIT
and RSH, against the torch reference-semantics implementation at realistic
sequence lengths.

The full-size (2x600, F=257) few-step parity run and the PARITY.md table
live in tools/run_parity.py; these tests keep the same harness green at a
size the 1-CPU test host can run routinely.
"""

import numpy as np
import pytest

pytest.importorskip("torch")

from parity_harness import deviation_table, make_corpus, run_parity

F, S, H, L = 17, 2, 24, 2
LENGTHS = [192, 224, 256]  # realistic frame counts (seconds of 8 kHz audio)


@pytest.mark.parametrize("arch_name", ["uPIT", "RSH"])
def test_hundred_step_trajectory_and_cv_parity(arch_name):
    corpus = make_corpus(40, F, S, LENGTHS, seed=0)
    cv_corpus = make_corpus(8, F, S, LENGTHS, seed=1)
    # 40 utts / batch 8 = 5 steps per epoch; 21 epochs = 105 steps,
    # CV at epochs 5, 10, 15, 20
    res = run_parity(arch_name, corpus, cv_corpus, F=F, S=S, H=H, L=L,
                     batch_size=8, n_epochs=21, cv_every=5, seed=0)
    assert len(res["j_train"]) == 105
    assert len(res["j_cv"]) == 4

    # step 1 is the identical forward: exact to float32 roundoff
    np.testing.assert_allclose(res["j_train"][0], res["t_train"][0], rtol=1e-5)
    # float32 reduction-order drift compounds through Adam; bounds are
    # empirical (observed ~1e-4..1e-3 in each range) with ~3x headroom
    for (lo, hi), dev in deviation_table(res["j_train"], res["t_train"],
                                         [(1, 10), (11, 50), (51, 105)]):
        assert dev < 5e-3, f"steps {lo}-{hi}: max rel deviation {dev}"
    np.testing.assert_allclose(res["j_cv"], res["t_cv"], rtol=5e-3)
    # and the loss is actually decreasing on both sides (the random-spectra
    # corpus has limited learnable structure; direction matters, not depth)
    assert res["j_train"][-1] < 0.9 * res["j_train"][0]
    assert res["t_train"][-1] < 0.9 * res["t_train"][0]
