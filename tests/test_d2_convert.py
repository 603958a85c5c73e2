"""detectron2 -> flax DensePose weight converter tests.

The real ``model_final_844d15.pkl`` is unreachable offline, so the converter is
validated three ways (the strategy VERDICT r1 prescribes):

 1. key coverage: a synthesized state_dict with the released model's exact key
    grammar + shapes converts into a variable tree identical (paths and shapes)
    to ``DensePoseRCNN.init``'s — nothing missing, nothing extra;
 2. numeric goldens vs torch (cpu) for every layout-sensitive transform:
    ConvTranspose2d adjoint kernels, the C-major->HWC fc1 re-layout, the
    stride-in-1x1 bottleneck, bilinear align_corners=False upsampling;
 3. pkl round trip through ``load_densepose_variables``.
"""

import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from video_classification_tpu.detect import (
    DensePoseRCNN,
    coverage_report,
    d2_key_shapes,
    d2_to_flax,
    load_densepose_variables,
    synthesize_state_dict,
)
from video_classification_tpu.detect.d2_convert import _deconv_to_flax, _fc1_to_flax
from video_classification_tpu.detect.densepose import TorchConvTranspose, _upsample2x
from video_classification_tpu.models.resnet2d import Bottleneck2d


def _tree_shapes(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_tree_shapes(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = tuple(v.shape)
    return out


def test_key_inventory_sizes():
    shapes = d2_key_shapes(101)
    # R101: 33 bottlenecks x 3 convs + 4 shortcuts + stem = 104 frozen BNs.
    n_bn_stats = sum(1 for k in shapes if k.endswith("running_mean"))
    assert n_bn_stats == 104
    assert shapes["backbone.bottom_up.res4.22.conv3.weight"] == (1024, 256, 1, 1)
    assert shapes["roi_heads.densepose_head.ASPP.project.0.weight"] == (256, 1280, 1, 1)
    assert shapes["roi_heads.densepose_predictor.index_uv_lowres.weight"] == (512, 25, 4, 4)


@pytest.mark.slow
def test_converter_covers_model_tree():
    sd = synthesize_state_dict(depth=101)
    assert coverage_report(sd, 101) == {"missing": [], "unexpected": []}
    variables = d2_to_flax(sd)

    model = DensePoseRCNN(depth=101)
    img = jnp.zeros((64, 64, 3), jnp.float32)
    expected = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), img, train=False)
    )
    for coll in ("params", "batch_stats"):
        want = _tree_shapes(expected[coll])
        got = _tree_shapes(variables[coll])
        assert set(got) == set(want), (
            sorted(set(want) - set(got))[:5], sorted(set(got) - set(want))[:5])
        for path in want:
            assert got[path] == want[path], (path, got[path], want[path])


def test_deconv_matches_torch():
    torch.manual_seed(0)
    deconv = torch.nn.ConvTranspose2d(3, 5, 4, stride=2, padding=1)
    x = torch.randn(2, 3, 9, 9)
    with torch.no_grad():
        want = deconv(x).permute(0, 2, 3, 1).numpy()

    mod = TorchConvTranspose(5)
    variables = {"params": {
        "kernel": jnp.asarray(_deconv_to_flax(deconv.weight.detach().numpy())),
        "bias": jnp.asarray(deconv.bias.detach().numpy()),
    }}
    got = np.asarray(mod.apply(variables, jnp.asarray(x.permute(0, 2, 3, 1).numpy())))
    assert got.shape == (2, 18, 18, 5)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_fc1_layout_matches_torch():
    torch.manual_seed(1)
    fc = torch.nn.Linear(256 * 7 * 7, 32)
    roi = torch.randn(4, 256, 7, 7)
    with torch.no_grad():
        want = fc(roi.flatten(1)).numpy()
    kernel = _fc1_to_flax(fc.weight.detach().numpy())
    roi_hwc = roi.permute(0, 2, 3, 1).numpy().reshape(4, -1)
    got = roi_hwc @ kernel + fc.bias.detach().numpy()
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_upsample2x_matches_torch():
    torch.manual_seed(2)
    x = torch.randn(1, 3, 7, 9)
    with torch.no_grad():
        want = F.interpolate(x, scale_factor=2, mode="bilinear",
                             align_corners=False).permute(0, 2, 3, 1).numpy()
    got = np.asarray(_upsample2x(jnp.asarray(x.permute(0, 2, 3, 1).numpy())))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_bottleneck_stride_in_1x1_matches_torch():
    """caffe2-style bottleneck (stride on first 1x1, frozen BN) numeric parity."""
    torch.manual_seed(3)
    cin, inner, cout, stride = 8, 4, 16, 2

    conv1 = torch.nn.Conv2d(cin, inner, 1, stride=stride, bias=False)
    conv2 = torch.nn.Conv2d(inner, inner, 3, padding=1, bias=False)
    conv3 = torch.nn.Conv2d(inner, cout, 1, bias=False)
    shortcut = torch.nn.Conv2d(cin, cout, 1, stride=stride, bias=False)
    bns = [torch.nn.BatchNorm2d(c) for c in (inner, inner, cout, cout)]
    for bn in bns:
        bn.eval()
        with torch.no_grad():
            bn.weight.copy_(torch.rand_like(bn.weight) + 0.5)
            bn.bias.copy_(torch.randn_like(bn.bias) * 0.1)
            bn.running_mean.copy_(torch.randn_like(bn.running_mean) * 0.1)
            bn.running_var.copy_(torch.rand_like(bn.running_var) + 0.5)

    x = torch.randn(1, cin, 10, 10)
    with torch.no_grad():
        y = F.relu(bns[0](conv1(x)))
        y = F.relu(bns[1](conv2(y)))
        y = bns[2](conv3(y))
        s = bns[3](shortcut(x))
        want = F.relu(y + s).permute(0, 2, 3, 1).numpy()

    def conv_k(m):
        return jnp.asarray(m.weight.detach().numpy().transpose(2, 3, 1, 0))

    def bn_vars(bn):
        return (
            {"scale": jnp.asarray(bn.weight.detach().numpy()),
             "bias": jnp.asarray(bn.bias.detach().numpy())},
            {"mean": jnp.asarray(bn.running_mean.numpy()),
             "var": jnp.asarray(bn.running_var.numpy())},
        )

    params, stats = {}, {}
    for name, conv, bn in (("conv1", conv1, bns[0]), ("conv2", conv2, bns[1]),
                           ("conv3", conv3, bns[2])):
        params[name] = {"kernel": conv_k(conv)}
        bn_name = f"bn{name[-1]}"
        params[bn_name], stats[bn_name] = bn_vars(bn)
    params["downsample_conv"] = {"kernel": conv_k(shortcut)}
    params["downsample_norm"], stats["downsample_norm"] = bn_vars(bns[3])

    block = Bottleneck2d(inner, cout, stride=stride, use_downsample=True,
                         stride_in_1x1=True)
    got = np.asarray(block.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x.permute(0, 2, 3, 1).numpy()), False))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_pkl_round_trip(tmp_path):
    sd = synthesize_state_dict(depth=50, seed=7)
    pkl = tmp_path / "model_final_fake.pkl"
    with pkl.open("wb") as f:
        pickle.dump({"model": sd, "__author__": "test"}, f)
    variables = load_densepose_variables(pkl, depth=50)
    k = variables["params"]["backbone"]["stem_conv"]["kernel"]
    assert k.shape == (7, 7, 3, 64)
    np.testing.assert_allclose(
        np.asarray(k),
        sd["backbone.bottom_up.stem.conv1.weight"].transpose(2, 3, 1, 0))


def test_coverage_report_flags_gaps():
    sd = synthesize_state_dict(depth=50)
    sd.pop("roi_heads.box_head.fc1.weight")
    sd["made.up.key"] = np.zeros((1,), np.float32)
    report = coverage_report(sd, 50)
    assert report["missing"] == ["roi_heads.box_head.fc1.weight"]
    assert report["unexpected"] == ["made.up.key"]


@pytest.mark.slow
def test_converted_variables_drive_the_provider(tmp_path):
    """Converted (synthesized) weights load into the live inference graph: the
    provider runs the full detect path with them — the exact deployment wiring
    of `preprocess --densepose-pkl`."""
    from video_classification_tpu.detect import DensePoseIUVProvider

    sd = synthesize_state_dict(depth=50, seed=11)
    pkl = tmp_path / "model_final_fake.pkl"
    with pkl.open("wb") as f:
        pickle.dump({"model": sd}, f)
    provider = DensePoseIUVProvider(
        weights_pkl=str(pkl), depth=50, pre_nms_topk=32, post_nms_topk=8,
        max_detections=2, chart_pooler_size=14, min_size=0,
        compute_dtype="float32")
    frames = (np.random.RandomState(0).rand(1, 64, 96, 3) * 255).astype(np.uint8)
    out = provider.detect(frames, ["f0"])
    assert len(out) == 1
    det = out[0]
    assert det.boxes_xyxy.shape[1] == 4 if det.boxes_xyxy.size else True
    if det.boxes_xyxy.shape[0]:
        assert det.uv.min() >= 0.0 and det.uv.max() <= 1.0
