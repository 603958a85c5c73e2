"""Tier-3 warm start: torch Kinetics-style checkpoint -> flax, mismatch deletion."""

import pickle

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from video_classification_tpu.engine.checkpoint import load_torch_warmstart
from video_classification_tpu.models import MISMATCH_LAYERS, SlowFast, flax_to_torch
from video_classification_tpu.utils import StepTimer


@pytest.mark.slow
def test_load_torch_warmstart(tmp_path):
    # Build a donor state_dict in torch naming from a randomly-initialized model,
    # wrap it like the Kinetics file ({'model_state': ...}), and load it into a
    # fresh model.
    donor = SlowFast(num_classes=7, depths=(1, 1, 1, 1))
    xs = [jnp.zeros((1, 4, 64, 64, 5)), jnp.zeros((1, 4, 64, 64, 15))]
    donor_vars = jax.tree.map(
        np.asarray, donor.init(jax.random.PRNGKey(1), xs, train=False)
    )
    sd = flax_to_torch(donor_vars, arch="slowfast")
    ckpt = tmp_path / "SLOWFAST_8x8_R50.pyth"
    with ckpt.open("wb") as f:
        pickle.dump({"model_state": sd}, f)

    target_vars = jax.tree.map(
        np.asarray, donor.init(jax.random.PRNGKey(2), xs, train=False)
    )
    out = load_torch_warmstart(ckpt, target_vars)

    # Mismatch-listed layers keep the target's init (train.py:93-123 deletes them).
    stem = out["params"]["blocks_0_pathway_0"]["conv"]["kernel"]
    np.testing.assert_array_equal(
        stem, target_vars["params"]["blocks_0_pathway_0"]["conv"]["kernel"]
    )
    proj = out["params"]["head"]["proj"]["kernel"]
    np.testing.assert_array_equal(proj, target_vars["params"]["head"]["proj"]["kernel"])
    # Non-mismatched layers come from the donor.
    donor_k = donor_vars["params"]["blocks_1_pathway_1"]["res_block_0"]["branch2"]["conv_a"]["kernel"]
    got_k = out["params"]["blocks_1_pathway_1"]["res_block_0"]["branch2"]["conv_a"]["kernel"]
    np.testing.assert_array_equal(got_k, donor_k)
    # BN stats restored too.
    donor_m = donor_vars["batch_stats"]["blocks_2_pathway_0"]["res_block_0"]["branch2"]["norm_a"]["mean"]
    got_m = out["batch_stats"]["blocks_2_pathway_0"]["res_block_0"]["branch2"]["norm_a"]["mean"]
    np.testing.assert_array_equal(got_m, donor_m)
    # The mismatch list covers exactly the 12 reference keys.
    assert len(MISMATCH_LAYERS) == 12


def test_step_timer():
    t = StepTimer(warmup=1)
    for _ in range(4):
        with t:
            pass
    assert len(t.times) == 3
    assert t.mean >= 0.0
