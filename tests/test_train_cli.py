"""train.py CLI end-to-end: train -> checkpoint -> resume, as a real
subprocess on the 8-device virtual CPU mesh (the train CLI auto-builds
the mesh, so this also exercises the sharded step from the CLI)."""
import os
import subprocess
import sys
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.join(os.path.dirname(__file__), "..")


def _run(extra, timeout=570):
    env = dict(os.environ,
               JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=8")
    return subprocess.run(
        [sys.executable, "train.py",
         "--config", "configs/smoke_volsdf.yaml"] + extra,
        env=env, cwd=REPO, capture_output=True, text=True, timeout=timeout)


def test_train_cli_trains_and_resumes(tmp_path):
    logdir = str(tmp_path)
    out = _run(["--expname", "cli_train_test",
                "--training:log_root_dir", logdir,
                "--training:num_iters", "3"])
    assert out.returncode == 0, out.stderr[-2000:]
    log = out.stdout + out.stderr
    assert "Device mesh: 8 devices" in log
    assert "Everything done" in log
    ckpt_dir = os.path.join(logdir, "cli_train_test", "ckpts")
    assert any(f.startswith("final_") for f in os.listdir(ckpt_dir)), \
        os.listdir(ckpt_dir)

    # resume continues from the saved global step
    out2 = _run(["--expname", "cli_train_test",
                 "--training:log_root_dir", logdir,
                 "--training:num_iters", "5"])
    assert out2.returncode == 0, out2.stderr[-2000:]
    assert "it=3" in (out2.stdout + out2.stderr)
