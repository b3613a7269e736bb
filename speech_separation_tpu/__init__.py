"""speech_separation_tpu — a TPU-native speech-separation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the Kaldi-style
``mmaciej2/speech-separation`` recipe (see SURVEY.md at the repo root for the
structural analysis it was designed from):

- ``datadir``   — Kaldi-style data-dir toolkit (wav.scp / segments /
                  feats_*.scp / utt2num_spk; prepare, validate, split).
- ``dsp``       — librosa-semantics STFT / iSTFT as jit-compiled XLA programs,
                  batched over length-bucketed utterances, with a Pallas
                  fused framing+window+DFT kernel on the hot path.
- ``models``    — architecture plugins: ``upit`` (utterance-level
                  permutation-invariant training) and ``rsh`` (recurrent
                  selective-hearing iterative extraction), built on a
                  lax.scan BLSTM with fused gate matmuls.
- ``ops``       — hot ops: PIT loss, padded batch-norm, Pallas kernels.
- ``parallel``  — device-mesh construction and sharding for data-parallel
                  (and optional tensor-parallel) training via jit/pjit.
- ``train``     — the training driver: jit'd update step, Adam + global-norm
                  clipping, every-5-epoch checkpoints, loss logs compatible
                  with the reference's train_loss.txt/cv_loss.txt format.
- ``eval``      — mask inference fused with masked-iSTFT resynthesis,
                  BSS-eval (SDR/SIR/SAR) + SI-SDR scoring, oracle-mask
                  upper-bound evaluation, reference-format result files.
- ``cli``       — staged run_train / run_eval recipes replacing the
                  reference's SGE/qsub orchestration on a single TPU host.
"""

__version__ = "0.1.0"
