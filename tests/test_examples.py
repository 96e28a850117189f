"""Examples smoke gate (slow tier): every shipped demo must RUN clean
on CPU — the demo surface is product surface (the migration guide and
README point users at these), so a refactor that breaks an example
should fail the suite, not a user.

scaling_bench and multihost_demo spawn their own process fleets and are
covered by tests/test_scaling.py and tests/test_multihost.py; ber_sweep
is a long statistical sweep covered by tests/test_ber_sweep.py.
"""
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.join(os.path.dirname(__file__), "..")
EXAMPLES = ["fm_demo.py", "iq_stream_demo.py", "qam_serving.py",
            "serving_loop.py", "protocols_demo.py",
            "debug_report_demo.py", "doa_demo.py"]


@pytest.mark.parametrize("name", EXAMPLES)
def test_example_runs(name, tmp_path):
    env = {**os.environ,
           "PYTHONPATH": os.path.abspath(REPO),
           "JAX_PLATFORMS": "cpu",
           # examples write reports/WAVs relative to cwd or repo; keep
           # stray artifacts out of the repo tree where possible
           "MPLBACKEND": "Agg"}
    r = subprocess.run([sys.executable,
                        os.path.join(REPO, "examples", name)],
                       env=env, cwd=str(tmp_path), timeout=900,
                       capture_output=True, text=True)
    assert r.returncode == 0, (name, r.stdout[-2000:], r.stderr[-2000:])
