"""Bounded closed-loop SDS efficacy smoke (round-4 verdict Next #4).

Runs benchmarks/efficacy_sds.py's pipeline at reduced scale: train a
tiny dual-branch diffusion prior on renders of a red-recolored target
body, then drive the REAL GaussianDreamerSystem.train_step from the
gray init against it and require the scene to move toward the prior's
data — rendered PSNR-to-target must not degrade and the alpha-weighted
red-minus-green channel gap must increase. The full-scale trajectory
artifact lives in benchmarks/efficacy_r5.json.
"""
import os
import sys

import pytest

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "benchmarks"),
)


@pytest.mark.slow
def test_sds_moves_scene_toward_prior():
    from efficacy_sds import run

    # the validated recipe at reduced SDS length (round-5 ablation:
    # shorter prior training leaves the score field too weak to beat
    # eval noise; 300/150 reproduced +0.037 red_gap in diagnostics)
    r = run(prior_steps=300, sds_steps=150, eval_every=50)
    assert r["red_gap_end"] > r["red_gap_start"] + 1e-4, r
    assert r["psnr_end"] >= r["psnr_start"] - 0.05, r
    # the trajectory is non-trivial: the SDS loss actually flowed
    assert any("loss" in t for t in r["sds_trajectory"])
