"""Dry-run of the released-checkpoint parity harness.

scripts/released_parity.sh executes the reference's published eval protocol
(README.md:25-57: convert .pt -> sample 10k -> featurize with the released
eval classifier -> Frechet vs released dataset stats) the moment the
artifact files are available. The real .pt files are not in this image, so
this test builds TINY local stand-ins with the reference torch package and
runs the whole pipeline end-to-end at N=4 / 2 steps — proving the harness
is executable, not just written.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REFERENCE = "/root/reference"
if not os.path.isdir(os.path.join(REFERENCE, "vq_voice_swap")):
    pytest.skip("reference repo not available", allow_module_level=True)
if REFERENCE not in sys.path:
    sys.path.append(REFERENCE)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_released_parity_harness_dry_run(tmp_path):
    from vq_voice_swap.diffusion_model import DiffusionModel as TorchDM
    from vq_voice_swap.models.classifier import Classifier as TorchClf

    torch.manual_seed(3)
    # Stand-in for the released unet64 diffusion checkpoint (wavegrad is
    # the cheap architecture; the harness is architecture-agnostic).
    tdm = TorchDM(pred_name="wavegrad", base_channels=2)
    diff_pt = str(tmp_path / "model_ema_unet64_tiny.pt")
    torch.save(
        {"kwargs": tdm.save_kwargs(), "state_dict": tdm.state_dict()},
        diff_pt,
    )
    # Stand-in for the released eval classifier.
    tclf = TorchClf(num_labels=3, base_channels=2)
    tclf.eval()
    clf_pt = str(tmp_path / "model_classifier.pt")
    torch.save(
        {"kwargs": tclf.save_kwargs(), "state_dict": tclf.state_dict()},
        clf_pt,
    )
    # Stand-in for train_clean_360.npz, with the classifier's real feature
    # dimension (stat_compare asserts shape agreement).
    with torch.no_grad():
        feats = tclf.stem(torch.randn(2, 1, 64000), torch.zeros(2))
    dim = int(feats.shape[1])
    data_stats = str(tmp_path / "train_clean_360.npz")
    rng = np.random.RandomState(0)
    a = rng.randn(dim, dim).astype(np.float64) * 0.01
    np.savez(data_stats, mean=np.zeros(dim), cov=np.eye(dim) + a @ a.T)

    out = str(tmp_path / "parity_out")
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        N="4",
        STEPS="2",
        BATCH="2",
    )
    # The axon sitecustomize hook routes compiles through the TPU tunnel
    # even under JAX_PLATFORMS=cpu; drop it so the dry-run is tunnel-free.
    env.pop("PALLAS_AXON_POOL_IPS", None)
    res = subprocess.run(
        ["bash", os.path.join(ROOT, "scripts", "released_parity.sh"),
         diff_pt, clf_pt, data_stats, out],
        capture_output=True, text=True, env=env, timeout=1500, cwd=ROOT,
    )
    assert res.returncode == 0, res.stdout[-3000:] + res.stderr[-3000:]

    report = open(os.path.join(out, "report.txt")).read()
    assert "class score" in report and "Frechet" in report
    # The Frechet line is the stat_compare output: one finite float.
    lines = [ln.strip() for ln in report.splitlines() if ln.strip()]
    fre_idx = next(i for i, ln in enumerate(lines)
                   if ln.startswith("--- Frechet"))
    assert np.isfinite(float(lines[fre_idx + 1]))
    # The published-numbers context line fires on the model name.
    assert "published (unet64)" in report
    assert os.path.exists(os.path.join(out, "stats.npz"))
