import json
import os

import numpy as np
import pytest

from rustic_tpu.cli import main
from rustic_tpu.config import NextEventEstimation, TracingConfig
from rustic_tpu.utils.compare import compare_engines, reference_compare, rmse
from tests.conftest import scene_path


def test_rmse_basics():
    a = np.zeros((4, 4, 3))
    assert rmse(a, a) == 0.0
    b = a + 0.1
    assert abs(rmse(a, b) - 0.1) < 1e-12


def test_engines_rmse_near_zero(cornell_scene):
    cfg = TracingConfig(width=24, height=16, nee=NextEventEstimation.MIS, max_bounces=2)
    out = compare_engines(cornell_scene, cfg, samples=2)
    for pair, value in out.items():
        assert value < 1e-4, (pair, value)


def test_reference_compare_roundtrip(cornell_scene, tmp_path):
    cfg = TracingConfig(width=16, height=16, max_bounces=2)
    ref = os.path.join(tmp_path, "ref.npy")
    out = reference_compare(
        cornell_scene, cfg, samples=4, reference_path=ref, reference_samples=8
    )
    assert os.path.exists(ref)
    assert out["rmse"] >= 0.0
    # same spp as reference -> identical sampler prefix differences only
    out2 = reference_compare(cornell_scene, cfg, samples=8, reference_path=ref)
    assert out2["rmse"] < 1e-6


@pytest.mark.slow  # CLI end-to-end render
def test_cli_compare(tmp_path, capsys):
    rc = main(
        [
            "compare",
            scene_path("DarkCornell.glb"),
            "--spp",
            "2",
            "--size",
            "16x16",
        ]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert "engines" in out
    assert all(v < 1e-4 for v in out["engines"].values())
