"""Real 2-process ``jax.distributed`` execution (VERDICT r3 missing #2):
spawns two coordinator-connected CPU processes (2 virtual devices each)
and asserts the full multi-process stack works — ``maybe_initialize``,
``shard_items`` disjointness, a cross-process collective, a pmean'd
data-parallel FCGF train step with bit-exact replicated params, and
``barrier``. Reference analog: torch DDP over NCCL, example-only
(``MinkowskiEngine/examples/multigpu_ddp.py:82-91``); the reference has
no multi-process test at all (SURVEY.md §4).
"""

import os
import re
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed():
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(
            os.environ,
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
            PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, os.path.join(REPO, "tests", "multihost_worker.py")],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for p in procs:
        try:
            # 600 s flaked once when 4 xdist workers + a TPU training
            # run shared the host (passes in ~110 s uncontended)
            out, _ = p.communicate(timeout=1200)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert f"OK {pid}" in out, out

    def grab(pat):
        vals = []
        for out in outs:
            m = re.search(pat, out)
            assert m, f"{pat!r} missing in:\n{out}"
            vals.append(m.group(1))
        return vals

    # shard_items: disjoint round-robin shards covering all 10 items
    shards = [eval(s) for s in grab(r"SHARD \d+ (\[[^\]]*\])")]
    assert sorted(shards[0] + shards[1]) == list(range(10))
    assert set(shards[0]).isdisjoint(shards[1])
    # pmean'd loss and updated params agree bit-exactly across processes
    assert grab(r"LOSS \d+ ([-\d.e]+)")[0] == grab(r"LOSS \d+ ([-\d.e]+)")[1]
    d0, d1 = grab(r"DIGEST \d+ ([-\d.e+]+)")
    assert d0 == d1, f"params diverged: {d0} vs {d1}"
