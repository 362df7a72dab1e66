"""Real 2-process `jax.distributed` execution (SURVEY §4 item 5 /
BASELINE config 5's "1 host -> N hosts" axis): two OS processes, a
localhost coordinator, a GLOBAL 8-device mesh spanning both, cross-process
gather + psum + one train step.  See tests/_multihost_worker.py for what
each worker asserts.  Skips (not fails) where the sandbox forbids the
coordinator socket."""
import os
import socket
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_WORKER = os.path.join(_REPO, "tests", "_multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed():
    # the communicate(timeout=540) below is the hang guard — workers are
    # killed and the test fails with their partial output
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH", "JAX_PLATFORMS", "XLA_FLAGS",
                        "PALLAS_AXON_POOL_IPS")}
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen([sys.executable, _WORKER, str(port), str(i)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env, cwd=_REPO)
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("distributed workers timed out:\n"
                    + "\n---\n".join(o or "" for o in outs))

    if any("INIT_UNAVAILABLE" in o for o in outs):
        pytest.skip("jax.distributed coordinator unavailable in this "
                    "sandbox: " + outs[0].splitlines()[-1][:200])
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} rc={p.returncode}:\n{out}"
        assert "INIT_OK" in out and "PSUM_OK" in out and "ALL_OK" in out, \
            f"worker {i}:\n{out}"
    assert "GATHER_OK" in outs[0]
    # both controllers computed the identical cross-process train loss
    losses = [next(ln for ln in o.splitlines() if ln.startswith("TRAIN_LOSS"))
              for o in outs]
    assert losses[0] == losses[1], losses
