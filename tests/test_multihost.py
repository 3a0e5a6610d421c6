"""Multi-process (multi-host) execution path.

Launches a REAL 2-process CPU job (the no-pod recipe: 2 × 4 virtual CPU
devices form an 8-device global mesh with Gloo collectives), trains the
flagship model through the ordinary Trainer, and asserts:

  - both processes agree exactly on the resulting metrics (SPMD: the jitted
    computation is global, outputs are replicated);
  - only host 0 wrote artifacts (CSV/npz/checkpoint/logs);
  - the multi-process result matches a single-process run on the same
    8-device mesh with identical data (the distributed path changes the
    execution, not the math).

The reference has no distributed anything (SURVEY §2.6) — this is the
new-capability axis.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _launch_worker(pid, nproc, port, outdir, devices_per_proc=4,
                   n_model=1, extra_args=()):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={devices_per_proc}")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    return subprocess.Popen(
        [sys.executable, "-m", "gnn_rul_tpu.parallel._dist_worker",
         "--pid", str(pid), "--nproc", str(nproc), "--port", str(port),
         "--outdir", outdir, "--n_model", str(n_model), *extra_args],
        cwd=REPO, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)


def _run_pair(outdir, extra_args=()):
    port = _free_port()
    procs = [_launch_worker(pid, 2, port, outdir, extra_args=extra_args)
             for pid in (0, 1)]
    outputs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outputs.append(out)
    for p, out in zip(procs, outputs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"
    r0 = json.load(open(os.path.join(outdir, "result_p0.json")))
    r1 = json.load(open(os.path.join(outdir, "result_p1.json")))
    return r0, r1, outputs


def test_two_process_training(tmp_path):
    outdir = str(tmp_path)
    port = _free_port()
    procs = [_launch_worker(pid, 2, port, outdir) for pid in (0, 1)]
    outputs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outputs.append(out)
    for p, out in zip(procs, outputs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"

    r0 = json.load(open(os.path.join(outdir, "result_p0.json")))
    r1 = json.load(open(os.path.join(outdir, "result_p1.json")))

    # A real 2-process job formed: 8 global devices, 4 local each.
    assert r0["process_count"] == 2 and r1["process_count"] == 2
    assert r0["global_devices"] == 8
    assert r0["local_devices"] == 4
    assert r0["process_index"] == 0 and r1["process_index"] == 1

    # Every process computed the same (replicated) results.
    b0 = np.asarray(r0["best"]["None"])
    b1 = np.asarray(r1["best"]["None"])
    np.testing.assert_allclose(b0, b1, rtol=1e-6)

    # Host-0-only artifacts: p0's tree has CSV + npz + checkpoint + log;
    # p1 wrote nothing at all.
    run_dir = os.path.join(outdir, "artifacts_p0", "dist", "run",
                           "FC_STGNN_run_0")
    for fname in ("results.csv", "results.npz", "checkpoint.pkl",
                  "logs_run_0.log"):
        assert os.path.exists(os.path.join(run_dir, fname)), fname
    assert not os.path.exists(os.path.join(outdir, "artifacts_p1"))

    # The distributed run matches a single-process run of the same job on
    # the same global mesh shape (this pytest process: 8 virtual CPU
    # devices). Collective reduction orders differ, so tolerance is loose
    # but tight enough to catch any semantic drift.
    from gnn_rul_tpu.parallel._dist_worker import run_training
    sp_results, _ = run_training(str(tmp_path / "single"), epochs=2)
    sp = np.asarray(sp_results[0][None])
    np.testing.assert_allclose(b0, sp, rtol=1e-3, atol=1e-3)


@pytest.mark.slow
def test_two_process_training_with_model_axis(tmp_path):
    """2 processes x (data=4, model=2) global mesh: cross-process data
    parallelism combined with the within-process model axis (FC_STGNN's
    node-sharded graph engine is injected by the Trainer for model>1)."""
    outdir = str(tmp_path)
    port = _free_port()
    procs = [_launch_worker(pid, 2, port, outdir, n_model=2)
             for pid in (0, 1)]
    outputs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outputs.append(out)
    for p, out in zip(procs, outputs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"

    r0 = json.load(open(os.path.join(outdir, "result_p0.json")))
    r1 = json.load(open(os.path.join(outdir, "result_p1.json")))
    np.testing.assert_allclose(np.asarray(r0["best"]["None"]),
                               np.asarray(r1["best"]["None"]), rtol=1e-6)
    # And it matches plain single-process DP on the same data.
    from gnn_rul_tpu.parallel._dist_worker import run_training
    sp_results, _ = run_training(str(tmp_path / "single"), epochs=2)
    np.testing.assert_allclose(np.asarray(r0["best"]["None"]),
                               np.asarray(sp_results[0][None]),
                               rtol=1e-3, atol=1e-3)


@pytest.mark.slow
def test_two_process_resume_broadcasts_from_host0(tmp_path):
    """Resume in a multi-process job with a NON-shared filesystem: only
    process 0's save_dir holds the periodic checkpoint (host-0-only
    writes), so the restore must broadcast state AND start-epoch from
    process 0 — a desync here hangs or diverges the job (r4 ADVICE
    medium)."""
    outdir = str(tmp_path)
    # Phase A: 2 epochs with periodic checkpoints (host 0 only).
    _run_pair(outdir, extra_args=("--epochs", "2"))
    ckpt = os.path.join(outdir, "artifacts_p0", "dist", "run",
                        "FC_STGNN_run_0", "checkpoint.pkl")
    assert os.path.exists(ckpt)
    assert not os.path.exists(os.path.join(outdir, "artifacts_p1"))

    # Phase B: fresh 2-process job resumes to 4 epochs. Process 1 has no
    # checkpoint file at all — it must receive state+epoch by broadcast.
    r0, r1, outputs = _run_pair(outdir,
                                extra_args=("--epochs", "4", "--resume"))
    b0 = np.asarray(r0["best"]["None"])
    b1 = np.asarray(r1["best"]["None"])
    np.testing.assert_allclose(b0, b1, rtol=1e-6)
    log = open(os.path.join(outdir, "artifacts_p0", "dist", "run",
                            "FC_STGNN_run_0", "logs_run_0.log")).read()
    assert "Resumed from epoch 2" in log
