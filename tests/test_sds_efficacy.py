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

    r = run(prior_steps=120, sds_steps=60, eval_every=30)
    assert r["red_gap_end"] > r["red_gap_start"] + 1e-4, r
    assert r["psnr_end"] >= r["psnr_start"] - 0.05, r
    # the trajectory is non-trivial: the SDS loss actually flowed
    assert any("loss" in t for t in r["sds_trajectory"])
