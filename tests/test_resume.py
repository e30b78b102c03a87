"""Checkpoint resume + kill->restart requeue (VERDICT r1 item 10).

Exercises the real drivers end-to-end in subprocesses:
  * train_mm trains, saves a full checkpoint, and a second run with
    MODEL.RESUME continues from the saved epoch/optimizer state.
  * tools/launch.py restarts a killed training run and the restart resumes
    from the latest checkpoint (IR_ADS_RESUME path, launch.py:51-66).
"""

import os
import signal
import subprocess
import sys
import threading
import time

import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_cfg(tmp_path, save_dir, epochs, resume=""):
    with open(os.path.join(REPO, "configs/synthetic_smoke.yaml")) as f:
        cfg = yaml.safe_load(f)
    cfg["SAVE_DIR"] = str(save_dir)
    cfg["TRAIN"]["EPOCHS"] = epochs
    cfg["MODEL"]["RESUME"] = resume
    path = tmp_path / f"cfg_{epochs}_{bool(resume)}.yaml"
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    return str(path)


def _env():
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    return env


def _ckpt_dir(save_dir):
    for root, dirs, files in os.walk(save_dir):
        if "manifest.json" in files:
            return root
    return None


@pytest.mark.slow
def test_train_resume_continues_epoch_and_optimizer(tmp_path):
    save1 = tmp_path / "run"
    cfg1 = _write_cfg(tmp_path, save1, epochs=1)
    r = subprocess.run(
        [sys.executable, "train_mm.py", "--cfg", cfg1],
        cwd=REPO, env=_env(), capture_output=True, text=True, timeout=1800,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    ckpt = _ckpt_dir(save1)
    assert ckpt, "no checkpoint written"

    cfg2 = _write_cfg(tmp_path, save1, epochs=2, resume=ckpt)
    r2 = subprocess.run(
        [sys.executable, "train_mm.py", "--cfg", cfg2],
        cwd=REPO, env=_env(), capture_output=True, text=True, timeout=1800,
    )
    assert r2.returncode == 0, r2.stderr[-2000:]
    log = r2.stdout + r2.stderr
    assert "resumed from" in log, log[-2000:]
    # epoch counter continued: the resumed run trains epoch 2 only
    assert "epoch 2" in log, log[-2000:]


@pytest.mark.slow
def test_launcher_requeues_after_kill(tmp_path):
    """Kill training mid-run; tools/launch.py must restart it and the
    restart must resume from the latest checkpoint."""
    save = tmp_path / "run"
    # 6 epochs (not 3): the first checkpoint lands after epoch 1 and the
    # kill below must win the race against run completion — smoke epochs
    # are only a few seconds each
    cfg = _write_cfg(tmp_path, save, epochs=6)
    proc = subprocess.Popen(
        [sys.executable, "tools/launch.py", "--max-restarts", "2",
         "--backoff", "1", "--save-dir", str(save), "--",
         sys.executable, "train_mm.py", "--cfg", cfg],
        cwd=REPO, env=_env(), stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True, start_new_session=True,
    )
    # Drain stdout CONCURRENTLY: the training child inherits this pipe and
    # XLA's per-load compile-cache warnings alone exceed the 64KB pipe
    # capacity — without a reader the child blocks on write before it ever
    # reaches a checkpoint and the poll below times out.
    chunks: list = []
    reader = threading.Thread(
        target=lambda: chunks.append(proc.stdout.read()), daemon=True
    )
    reader.start()
    # wait until the first checkpoint exists, then kill the python child
    deadline = time.time() + 1500
    while time.time() < deadline and _ckpt_dir(save) is None:
        if proc.poll() is not None:
            break
        time.sleep(2)
    assert _ckpt_dir(save), "no checkpoint appeared before timeout"
    # kill the training child (not the launcher): signal the process group
    # spares nothing, so find the child pid via /proc
    killed = False
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as f:
                cmd = f.read().decode().replace("\x00", " ")
        except OSError:
            continue
        if "train_mm.py" in cmd and cfg in cmd and int(pid) != proc.pid:
            os.kill(int(pid), signal.SIGKILL)
            killed = True
            break
    assert killed, "training child process not found"
    proc.wait(timeout=1800)
    reader.join(timeout=60)
    out = chunks[0] if chunks else ""
    assert "restart 1: resuming from" in out, out[-3000:]
    assert proc.returncode == 0, out[-3000:]
