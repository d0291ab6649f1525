"""End-to-end experiment CLI tests (tiny configs, synthetic data)."""
import os
import subprocess
import sys

import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))
ENV = dict(
    os.environ,
    JAX_PLATFORMS="cpu",
    PXMCMC_PLATFORM="cpu",
    PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
)


def run_cli(script, args, cwd):
    return subprocess.run(
        [sys.executable, script] + args,
        cwd=cwd,
        env=ENV,
        capture_output=True,
        text=True,
        timeout=600,
    )


@pytest.mark.parametrize("algo", ["myula", "pxmala"])
def test_earthtopography_cli(tmp_path, algo):
    r = run_cli(
        os.path.join(REPO, "experiments/earthtopography/main.py"),
        [
            "--infile", "nonexistent.fits", "--outdir", str(tmp_path),
            "--algo", algo, "--L", "16", "--nsamples", "5", "--ngap", "2",
            "--makenoise", "--delta", "1e-6",
        ],
        cwd=str(tmp_path),
    )
    assert r.returncode == 0, r.stderr[-3000:]
    outs = [f for f in os.listdir(str(tmp_path)) if f.endswith(".hdf5")]
    assert len(outs) == 1
    assert algo in outs[0]


def test_earthtopography_plot_cli(tmp_path):
    r = run_cli(
        os.path.join(REPO, "experiments/earthtopography/main.py"),
        ["--infile", "nonexistent.fits", "--outdir", str(tmp_path),
         "--L", "16", "--nsamples", "5", "--ngap", "2"],
        cwd=str(tmp_path),
    )
    assert r.returncode == 0, r.stderr[-3000:]
    out = [f for f in os.listdir(str(tmp_path)) if f.endswith(".hdf5")][0]
    plots = os.path.join(str(tmp_path), "plots")
    r = run_cli(
        os.path.join(REPO, "experiments/earthtopography/plot.py"),
        [os.path.join(str(tmp_path), out), plots, "--infile", "nonexistent.fits"],
        cwd=os.path.join(REPO, "experiments/earthtopography"),
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert os.path.exists(os.path.join(plots, "MAP.png"))
    assert os.path.exists(os.path.join(plots, "ci_map.png"))
    assert "MAP SNR" in r.stdout


def test_phasevel_cli(tmp_path):
    r = run_cli(
        os.path.join(REPO, "experiments/phasevel/main.py"),
        [
            "nonexistent.txt", os.path.join(str(tmp_path), "paths.npz"),
            "--outdir", str(tmp_path), "--L", "16", "--nsamples", "4",
        ],
        cwd=str(tmp_path),
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert os.path.exists(os.path.join(str(tmp_path), "paths.npz"))
    outs = [f for f in os.listdir(str(tmp_path)) if f.endswith(".hdf5")]
    assert len(outs) == 1


def test_weaklensing_cli(tmp_path):
    r = run_cli(
        os.path.join(REPO, "experiments/weaklensing/main.py"),
        [
            "nonexistent.fits", "--outdir", str(tmp_path), "--L", "16",
            "--nsamples", "4", "--nchains", "2",
        ],
        cwd=str(tmp_path),
    )
    assert r.returncode == 0, r.stderr[-3000:]
    outs = [f for f in os.listdir(str(tmp_path)) if f.endswith(".hdf5")]
    assert len(outs) == 1
