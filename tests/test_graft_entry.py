"""Driver-contract tests for ``__graft_entry__``.

Round 1 regression: the driver runs ``dryrun_multichip(n)`` in an
environment whose sitecustomize pre-imports jax on a non-CPU backend
(``JAX_PLATFORMS=axon``), and the round-1 dryrun silently ran on that
backend and died on a libtpu version mismatch (MULTICHIP_r01.json
ok=false).  The fix re-execs the dryrun in a CPU-forced subprocess; these
tests pin that behavior from a fresh interpreter so the in-process pytest
CPU config can't mask it.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_dryrun(n, extra_env):
    env = dict(os.environ)
    env.pop("GGAN_DRYRUN_CHILD", None)
    env.update(extra_env)
    return subprocess.run(
        [sys.executable, "-c",
         f"import __graft_entry__ as g; g.dryrun_multichip({n})"],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=560)


@pytest.mark.slow
def test_dryrun_reexecs_off_non_cpu_platform():
    # Parent believes it's on a TPU-ish backend; the axon plugin itself is
    # NOT registered (PALLAS_AXON_POOL_IPS unset) so any attempt to actually
    # initialize that backend would raise — passing proves the parent never
    # touched it and re-execed into a CPU child instead.
    # GGAN_DRYRUN_QUICK: the mechanism under test is the re-exec, asserted
    # via the family-1 dp/tp lines — no need to compile all seven programs
    # (the full set runs in the driver's own dryrun and blew this test's
    # subprocess timeout under a loaded host)
    res = _run_dryrun(8, {"JAX_PLATFORMS": "axon",
                          "PALLAS_AXON_POOL_IPS": "",
                          "GGAN_DRYRUN_QUICK": "1",
                          "XLA_FLAGS": ""})
    assert res.returncode == 0, res.stderr[-2000:]
    assert "dp: " in res.stdout and " ok" in res.stdout
    assert "tp(2x4)" in res.stdout


@pytest.mark.slow
def test_dryrun_child_refuses_to_recurse():
    # If the child env is still broken, it must fail loudly, not fork-bomb.
    res = _run_dryrun(8, {"JAX_PLATFORMS": "axon",
                          "PALLAS_AXON_POOL_IPS": "",
                          "GGAN_DRYRUN_CHILD": "1"})
    assert res.returncode != 0
    assert "refusing to recurse" in res.stderr
