"""CLI surface: optimize.py end-to-end tiny run (reference optimize.py UX)."""

import json
import os
import subprocess
import sys

import pytest


@pytest.mark.slow
def test_optimize_cli_end_to_end(tmp_path):
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    out = str(tmp_path / "cliout")
    r = subprocess.run(
        [
            sys.executable, "optimize.py", "torus",
            "--optconfig", "no-tex-3", "--configs", "warp",
            "--n_iter", "3", "--refspp", "8", "--outputdir", out, "--cpu",
            "--spp=2", "--resx=16", "--resy=16", "--sdf_res=8",
            "--upsample_iter=()", "--use_multiscale_rendering=false",
        ],
        capture_output=True, text=True, timeout=900, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert r.returncode == 0, r.stderr[-800:]
    run_dir = os.path.join(out, "torus", "no-tex-3", "warp")
    meta = json.load(open(os.path.join(run_dir, "metadata.json")))
    assert len(meta["loss_values"]) == 3
    assert os.path.exists(os.path.join(run_dir, "params", "sdf-final.vol"))
    assert os.path.exists(os.path.join(run_dir, "loss.png"))
    # re-running without --force skips
    r2 = subprocess.run(
        [sys.executable, "optimize.py", "torus", "--optconfig", "no-tex-3",
         "--configs", "warp", "--outputdir", out, "--cpu"],
        capture_output=True, text=True, timeout=120, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert "[skip]" in r2.stdout
