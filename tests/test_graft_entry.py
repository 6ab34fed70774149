"""The driver's entry points must work in a pinned-TPU-platform shell.

Round 1's multichip check failed (MULTICHIP_r01.json rc=1) because
dryrun_multichip assumed the caller had pre-configured the 8-device CPU mesh;
it must self-configure instead. Run it in a subprocess with the same pinned
env the driver uses so the fix is exercised the way it will be invoked.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_subprocess():
    env = dict(os.environ)
    # simulate the driver's shell: no CPU-mesh flags prepared for us
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    out = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1200)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "mesh=(2, 2, 2, 1, 1)" in out.stdout
    assert "t2v_loss=" in out.stdout
    assert "tp-decode ok" in out.stdout
    assert "tp-spec ok" in out.stdout
    assert "pp-train ok" in out.stdout
    assert "pp-t2v ok" in out.stdout
    assert "ring-attn ok" in out.stdout
