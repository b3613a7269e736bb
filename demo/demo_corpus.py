"""The shared demo corpus: one definition of its seeds/sizes so every
arch section in RESULTS.md stays comparable (the generator is
deterministic). Used by run_demo.py / run_demo_rsh.py / run_demo_tcn.py."""
import os


def ensure_demo_corpus():
    """Build corpus + data dirs + features if absent (idempotent)."""
    if os.path.isfile("data/syn_tt/feats_test.scp"):
        return
    from speech_separation_tpu.datadir import DatasetRegistry, prepare_data_dir
    from speech_separation_tpu.dsp import STFTConfig
    from speech_separation_tpu.dsp.extract import extract_features
    from speech_separation_tpu.utils.synthetic import (make_synthetic_corpus,
                                                       write_id_list)
    print("== corpus ==", flush=True)
    ids_tr = make_synthetic_corpus("corpus/tr", 256, seed=0, min_sec=0.8,
                                   max_sec=1.6, prefix="tr")
    ids_cv = make_synthetic_corpus("corpus/cv", 32, seed=1, min_sec=0.8,
                                   max_sec=1.6, prefix="cv")
    ids_tt = make_synthetic_corpus("corpus/tt", 32, seed=2, min_sec=0.8,
                                   max_sec=1.6, prefix="tt")
    write_id_list("id_lists", "syn_tr", ids_tr)
    write_id_list("id_lists", "syn_cv", ids_cv)
    write_id_list("id_lists", "syn_tt", ids_tt)
    reg = DatasetRegistry({"syn_tr": "corpus/tr", "syn_cv": "corpus/cv",
                           "syn_tt": "corpus/tt"})
    for ds in ("syn_tr", "syn_cv", "syn_tt"):
        prepare_data_dir(ds, reg)
    print("== features ==", flush=True)
    cfg = STFTConfig()
    extract_features("data/syn_tr", "train", "feats/syn_tr_train", cfg,
                     compress=False)
    extract_features("data/syn_cv", "train", "feats/syn_cv_train", cfg,
                     compress=False)
    extract_features("data/syn_tt", "test", "feats/syn_tt_test", cfg,
                     compress=False)


def replace_results_section(header: str, lines: list) -> None:
    """Append (or replace, if present) a '## ...' section in RESULTS.md —
    re-running a demo must not duplicate its section. Only the named
    section (up to the next '## ' heading) is replaced; everything else
    is preserved."""
    text = ""
    if os.path.isfile("RESULTS.md"):
        text = open("RESULTS.md").read()
        if header in text:
            start = text.index(header)
            end = text.find("\n## ", start + len(header))
            tail = "" if end == -1 else text[end + 1:]
            text = text[:start].rstrip() + "\n" + tail
    with open("RESULTS.md", "w") as f:
        f.write(text)
        f.writelines(lines)
