"""CLI end-to-end tests (reference flag contract)."""
import os
import subprocess
import sys

import numpy as np
import pytest

from raytracers_tpu.image import read_ppm

REPO = os.path.join(os.path.dirname(__file__), os.pardir)


def _run(args):
    env = dict(os.environ)
    # Drop any TPU-plugin site hook: subprocess tests must never touch the
    # (possibly busy) accelerator, and JAX_PLATFORMS=cpu only holds when no
    # plugin overrides it at import time.
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PYTHONPATH", None)
    return subprocess.run(
        [sys.executable, "-m", "raytracers_tpu.cli"] + args,
        capture_output=True, text=True, cwd=REPO, env=env, timeout=300)


def test_cli_renders_ppm(tmp_path):
    out = tmp_path / "out.ppm"
    r = _run(["-m", "24", "-n", "32", "-s", "rgbbox", "-r", "1",
              "-f", str(out), "--cpu", "--mode", "brute"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Using scene rgbbox" in r.stdout
    assert "Scene BVH construction in" in r.stdout
    assert "Rendering in" in r.stdout
    img = read_ppm(str(out))
    assert img.shape == (24, 32)


def test_cli_unknown_scene():
    r = _run(["-s", "nope", "--cpu", "-r", "1"])
    assert r.returncode != 0
    assert "Unknown scene" in (r.stderr + r.stdout)


def test_cli_native_backend(tmp_path):
    lib = os.path.join(REPO, "native", "libraytracer_native.so")
    if not os.path.exists(lib):
        pytest.skip("native library not built")
    out = tmp_path / "n.ppm"
    r = _run(["-m", "24", "-n", "24", "-s", "irreg", "-r", "1",
              "--native", "-f", str(out)])
    assert r.returncode == 0, r.stderr[-2000:]
    assert read_ppm(str(out)).shape == (24, 24)
