"""The examples/ scripts must stay runnable (they are the switching-user
documentation; a stale example is worse than none)."""

import os
import subprocess
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args):
    return subprocess.run(
        [sys.executable] + args,
        capture_output=True, text=True, timeout=900, cwd=_ROOT,
    )


def test_serve_torch_checkpoint_demo():
    r = _run(["examples/serve_torch_checkpoint.py", "--demo",
              "--tier", "bf16w", "--platform", "cpu"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "demo[bottleneck]" in r.stdout and "demo[basic]" in r.stdout
    assert "rel_err vs torch" in r.stdout


def test_train_and_deploy_tiny():
    r = _run(["examples/train_and_deploy.py", "--tiny", "--steps", "3",
              "--platform", "cpu"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "deployed int8 classes" in r.stdout
