"""torchvision raft_large -> flax RAFT weight converter tests.

Same strategy as the detectron2 converter (torchvision itself is absent in this
image): (1) a synthesized state_dict with the released key grammar/shapes must
convert into a tree identical to ``RAFT.init``'s; (2) torch numeric goldens for
the semantic building blocks (ResidualBlock with both norms, separable ConvGRU,
motion encoder) using converted weights; (3) .pth round trip.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from video_classification_tpu.models.raft import RAFT, ResidualUnit, SepConvGRU
from video_classification_tpu.models.raft_convert import (
    load_raft_checkpoint,
    raft_coverage_report,
    raft_key_shapes,
    raft_torch_to_flax,
    synthesize_raft_state_dict,
)


def _tree_shapes(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_tree_shapes(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = tuple(np.shape(v))
    return out


def _conv_k(m):
    return jnp.asarray(m.weight.detach().numpy().transpose(2, 3, 1, 0))


def test_key_inventory():
    shapes = raft_key_shapes()
    # InstanceNorm encoder contributes no norm keys; BatchNorm encoder does.
    assert not any(k.startswith("feature_encoder") and "running" in k for k in shapes)
    assert shapes["context_encoder.layer3.0.downsample.1.running_mean"] == (128,)
    assert shapes["update_block.motion_encoder.convcorr1.0.weight"] == (256, 324, 1, 1)
    assert shapes["update_block.recurrent_block.convgru2.convq.weight"] == (128, 384, 5, 1)
    assert shapes["mask_predictor.conv.weight"] == (576, 256, 1, 1)


@pytest.mark.slow
def test_converter_covers_raft_tree():
    sd = synthesize_raft_state_dict()
    assert raft_coverage_report(sd) == {"missing": [], "unexpected": []}
    variables = raft_torch_to_flax(sd)

    model = RAFT(num_iters=1)
    # 64px -> 8x8 features -> the full 4-level correlation pyramid (the
    # converted convcorr1 expects 4*81 input channels).
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    expected = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), img, img)
    )
    for coll in ("params", "batch_stats"):
        want = _tree_shapes(expected[coll])
        got = _tree_shapes(variables[coll])
        assert set(got) == set(want), (
            sorted(set(want) - set(got))[:5], sorted(set(got) - set(want))[:5])
        for path in want:
            assert got[path] == want[path], (path, got[path], want[path])


def test_residual_unit_instance_norm_matches_torch():
    """torchvision ResidualBlock (InstanceNorm, stride 2) numeric parity."""
    torch.manual_seed(0)
    cin, cout = 6, 10
    conv1 = torch.nn.Conv2d(cin, cout, 3, stride=2, padding=1)
    conv2 = torch.nn.Conv2d(cout, cout, 3, padding=1)
    down = torch.nn.Conv2d(cin, cout, 1, stride=2)
    inorm = torch.nn.InstanceNorm2d(cout)

    x = torch.randn(2, cin, 12, 12)
    with torch.no_grad():
        y = F.relu(inorm(conv1(x)))
        y = F.relu(inorm(conv2(y)))
        s = inorm(down(x))
        want = F.relu(s + y).permute(0, 2, 3, 1).numpy()

    params = {
        "conv1": {"kernel": _conv_k(conv1), "bias": jnp.asarray(conv1.bias.detach().numpy())},
        "conv2": {"kernel": _conv_k(conv2), "bias": jnp.asarray(conv2.bias.detach().numpy())},
        "downsample": {"kernel": _conv_k(down), "bias": jnp.asarray(down.bias.detach().numpy())},
    }
    block = ResidualUnit(cout, stride=2, norm="instance")
    got = np.asarray(block.apply({"params": params},
                                 jnp.asarray(x.permute(0, 2, 3, 1).numpy())))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_residual_unit_batch_norm_matches_torch():
    """Context-encoder ResidualBlock (BatchNorm eval) numeric parity."""
    torch.manual_seed(1)
    c = 8
    conv1 = torch.nn.Conv2d(c, c, 3, padding=1)
    conv2 = torch.nn.Conv2d(c, c, 3, padding=1)
    bn1, bn2 = torch.nn.BatchNorm2d(c), torch.nn.BatchNorm2d(c)
    for bn in (bn1, bn2):
        bn.eval()
        with torch.no_grad():
            bn.weight.copy_(torch.rand_like(bn.weight) + 0.5)
            bn.bias.copy_(torch.randn_like(bn.bias) * 0.1)
            bn.running_mean.copy_(torch.randn_like(bn.running_mean) * 0.1)
            bn.running_var.copy_(torch.rand_like(bn.running_var) + 0.5)

    x = torch.randn(2, c, 10, 10)
    with torch.no_grad():
        y = F.relu(bn1(conv1(x)))
        y = F.relu(bn2(conv2(y)))
        want = F.relu(x + y).permute(0, 2, 3, 1).numpy()

    def bn_vars(bn):
        return (
            {"scale": jnp.asarray(bn.weight.detach().numpy()),
             "bias": jnp.asarray(bn.bias.detach().numpy())},
            {"mean": jnp.asarray(bn.running_mean.numpy()),
             "var": jnp.asarray(bn.running_var.numpy())},
        )

    params, stats = {}, {}
    params["conv1"] = {"kernel": _conv_k(conv1), "bias": jnp.asarray(conv1.bias.detach().numpy())}
    params["conv2"] = {"kernel": _conv_k(conv2), "bias": jnp.asarray(conv2.bias.detach().numpy())}
    params["norm1"], stats["norm1"] = bn_vars(bn1)
    params["norm2"], stats["norm2"] = bn_vars(bn2)
    block = ResidualUnit(c, stride=1, norm="batch")
    got = np.asarray(block.apply({"params": params, "batch_stats": stats},
                                 jnp.asarray(x.permute(0, 2, 3, 1).numpy()),
                                 False))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_sep_conv_gru_matches_torch():
    """Separable ConvGRU (1x5 then 5x1) numeric parity with converted weights."""
    torch.manual_seed(2)
    hidden, inp = 8, 12

    def make_gru(kern, pad):
        return {g: torch.nn.Conv2d(hidden + inp, hidden, kern, padding=pad)
                for g in ("convz", "convr", "convq")}

    gru1 = make_gru((1, 5), (0, 2))
    gru2 = make_gru((5, 1), (2, 0))

    h = torch.randn(1, hidden, 6, 6)
    x = torch.randn(1, inp, 6, 6)

    def torch_gru(g, h, x):
        hx = torch.cat([h, x], dim=1)
        z = torch.sigmoid(g["convz"](hx))
        r = torch.sigmoid(g["convr"](hx))
        q = torch.tanh(g["convq"](torch.cat([r * h, x], dim=1)))
        return (1 - z) * h + z * q

    with torch.no_grad():
        h1 = torch_gru(gru1, h, x)
        want = torch_gru(gru2, h1, x).permute(0, 2, 3, 1).numpy()

    params = {}
    for suffix, g in (("1", gru1), ("2", gru2)):
        for gate in ("convz", "convr", "convq"):
            params[f"{gate}{suffix}"] = {
                "kernel": _conv_k(g[gate]),
                "bias": jnp.asarray(g[gate].bias.detach().numpy()),
            }
    mod = SepConvGRU(hidden=hidden)
    got = np.asarray(mod.apply({"params": params},
                               jnp.asarray(h.permute(0, 2, 3, 1).numpy()),
                               jnp.asarray(x.permute(0, 2, 3, 1).numpy())))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_pth_round_trip(tmp_path):
    sd = synthesize_raft_state_dict(seed=3)
    path = tmp_path / "raft_large_fake.pth"
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}, path)
    variables = load_raft_checkpoint(path)
    k = variables["params"]["fnet"]["conv1"]["kernel"]
    assert k.shape == (7, 7, 3, 64)
    np.testing.assert_allclose(
        np.asarray(k),
        sd["feature_encoder.convnormrelu.0.weight"].transpose(2, 3, 1, 0))
    # BatchNorm stats landed in batch_stats.
    assert "mean" in variables["batch_stats"]["cnet"]["norm1"]
