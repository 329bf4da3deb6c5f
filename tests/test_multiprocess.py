"""Multi-process runtime test: a real 2-process x 2-device CPU cluster
(jax.distributed local rendezvous) running the SPMD train step with
process-local batch feeding and the cross-process confusion reduction —
the reference's multi-GPU torch.distributed.launch story
(engine.py:38-93, evaluate.py:370-372) exercised end-to-end without TPU
hardware.  The per-process checks live in tests/mp_worker.py."""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_cpu_cluster(tmp_path):
    worker = os.path.join(os.path.dirname(__file__), "mp_worker.py")
    port = _free_port()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(worker)))
    # some sandboxes pre-import jax (hardware platform pinned) from a
    # sitecustomize; that would initialize the backend before
    # jax.distributed.initialize can run — shadow it with an empty one
    shadow = tmp_path / "shadow_site"
    shadow.mkdir()
    (shadow / "sitecustomize.py").write_text("")
    env = dict(os.environ)
    env["PYTHONPATH"] = (str(shadow) + os.pathsep + repo + os.pathsep
                         + env.get("PYTHONPATH", ""))
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(port), str(pid), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out.decode(errors="replace"))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        report = tmp_path / f"proc{pid}.txt"
        detail = report.read_text() if report.exists() else out[-4000:]
        assert p.returncode == 0, f"proc{pid} failed:\n{detail}"
        assert detail.startswith("OK"), f"proc{pid}:\n{detail}"
    # both processes observed the identical distributed loss trajectory
    lines0 = (tmp_path / "proc0.txt").read_text().splitlines()
    lines1 = (tmp_path / "proc1.txt").read_text().splitlines()
    assert lines0[1] == lines1[1], (lines0[1], lines1[1])
    # and agreed on the SAME preemption stop step although the SIGTERM
    # was delivered to rank 1 only (log-boundary consensus)
    assert lines0[2].startswith("stop="), lines0[2]
    assert lines0[2] == lines1[2], (lines0[2], lines1[2])
