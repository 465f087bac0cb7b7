"""Import sweep: every module imports cleanly; CLIs respond to --help."""

import importlib
import os
import pkgutil
import subprocess
import sys

import pytest

import tacotron2_tpu

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _all_modules():
    mods = []
    for info in pkgutil.walk_packages(tacotron2_tpu.__path__,
                                      prefix="tacotron2_tpu."):
        mods.append(info.name)
    return mods


@pytest.mark.parametrize("name", _all_modules())
def test_module_imports(name):
    importlib.import_module(name)


@pytest.mark.parametrize("cli", [
    ["-m", "tacotron2_tpu.train"],
    ["-m", "tacotron2_tpu.infer"],
    ["-m", "tacotron2_tpu.http_server"],
    ["tools/cache_mels.py"],
    ["tools/make_ljspeech_filelists.py"],
    ["tools/train_demo.py"],
    ["tools/synthesis_check.py"],
])
def test_cli_help(cli):
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    r = subprocess.run([sys.executable] + cli + ["--help"],
                       capture_output=True, text=True, env=env, cwd=REPO,
                       timeout=120)
    assert r.returncode == 0, r.stderr[-500:]
    assert "usage" in r.stdout.lower()
