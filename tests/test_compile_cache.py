"""Persistent compile cache: cross-process hits (VERDICT r04 #4).

The whole point of utils/compile_cache.py is that a SECOND process pays
~zero compile for a program a first process already compiled (the driver's
bench, `sepsep warmup`, every CLI invocation). These tests prove the
cross-process contract on the CPU backend — the same JAX facility serves
the TPU backend, where the hit was verified manually (run 2 of the probe
compiled in 0.67 s vs 4.0 s cold with 16 'Persistent compilation cache
hit' log lines; docs/performance.md compile table).
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# The child pins CPU via jax.config (JAX_PLATFORMS is force-set to the TPU
# plugin in this environment), points the cache at argv[1], drops the
# min-compile-time floor so even a small test program is cached, and logs
# jax._src.compiler at DEBUG so the parent can grep for the hit message.
CHILD = r"""
import logging, sys
logging.basicConfig(level=logging.WARNING, stream=sys.stderr)
logging.getLogger("jax._src.compiler").setLevel(logging.DEBUG)
import jax
jax.config.update("jax_platforms", "cpu")
from speech_separation_tpu.utils.compile_cache import enable_compilation_cache
d = enable_compilation_cache(sys.argv[1])
assert d == sys.argv[1], (d, sys.argv[1])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp

@jax.jit
def f(x):
    for _ in range(8):
        x = jnp.tanh(x @ x) + x
    return x.sum()

print("RESULT", float(f(jnp.ones((32, 32), jnp.float32))))
"""


def _run_child(cache_dir: str) -> subprocess.CompletedProcess:
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
    r = subprocess.run([sys.executable, "-c", CHILD, cache_dir],
                       capture_output=True, text=True, timeout=300, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    return r


def test_second_process_hits_cache(tmp_path):
    cache = str(tmp_path / "cache")
    r1 = _run_child(cache)
    assert "RESULT" in r1.stdout
    entries = [f for f in os.listdir(cache) if f.startswith("jit_f-")]
    assert entries, f"first process wrote no jit_f cache entry: {os.listdir(cache)}"
    assert "Persistent compilation cache hit for 'jit_f'" not in r1.stderr

    r2 = _run_child(cache)
    assert "RESULT" in r2.stdout
    assert "Persistent compilation cache hit for 'jit_f'" in r2.stderr, (
        "second process recompiled instead of hitting the persistent "
        "cache:\n" + r2.stderr[-2000:])
    # both processes computed the same value through the same executable
    assert r1.stdout.strip().splitlines()[-1] == r2.stdout.strip().splitlines()[-1]


def test_cache_disabled_by_env(tmp_path, monkeypatch):
    from speech_separation_tpu.utils.compile_cache import enable_compilation_cache
    monkeypatch.setenv("SEPSEP_COMPILE_CACHE", "off")
    assert enable_compilation_cache(str(tmp_path / "nope")) == ""
    assert not (tmp_path / "nope").exists()


def test_warmup_cli_reports_hit(tmp_path):
    """`sepsep warmup` run twice: first cold (entries written), second a
    cache hit — the user-facing pre-pay-the-compile workflow."""
    cache = str(tmp_path / "cache")
    conf = tmp_path / "m.conf"
    conf.write_text("hidden=8\nnum_layers=1\nfeat_dim=16\n")
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["SEPSEP_COMPILE_CACHE"] = cache
    env.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
    cmd = [sys.executable, "-c",
           "import jax; jax.config.update('jax_platforms','cpu');"
           "from speech_separation_tpu.cli.main import main; main()",
           "warmup", "--archs", "uPIT", "--batch-size", "2", "--frames",
           "64", "--model-config", str(conf)]
    r1 = subprocess.run(cmd, capture_output=True, text=True, timeout=300,
                        env=env)
    assert r1.returncode == 0, r1.stderr[-2000:]
    assert "cold compile" in r1.stdout, r1.stdout
    r2 = subprocess.run(cmd, capture_output=True, text=True, timeout=300,
                        env=env)
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "cache hit" in r2.stdout, r2.stdout
