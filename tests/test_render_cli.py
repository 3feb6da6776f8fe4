"""render.py CLI drives the multi-device sharded path end to end.

VERDICT r1 #8: `render.py --num_views N` must actually use all local
devices. Runs the real CLI as a subprocess on the 8-device virtual CPU
mesh against the shipped demo checkpoint.
"""
import os
import subprocess
import sys

import pytest

REPO = os.path.join(os.path.dirname(__file__), "..")

pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    not os.path.exists(os.path.join(REPO, "pretrained",
                                    "demo_volsdf_cpu.npz")),
    reason="demo checkpoint missing")]


def test_render_cli_shards_over_devices(tmp_path):
    env = dict(os.environ,
               JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=8")
    out = subprocess.run(
        [sys.executable, "render.py",
         "--config", "configs/demo_volsdf_cpu.yaml",
         "--load_pt", "pretrained/demo_volsdf_cpu.npz",
         "--num_views", "2", "--H", "32", "--W", "24",
         "--rayschunk", "768", "--exp_name", "cli_shard_test",
         "--outbase", str(tmp_path)],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=570)
    assert out.returncode == 0, out.stderr[-2000:]
    log = out.stdout + out.stderr
    assert "Rendering on 8 devices" in log
    assert "view 2/2 rendered" in log
