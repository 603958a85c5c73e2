"""Detection op + DensePose-equivalent network tests.

ROIAlign and NMS are golden-checked against straightforward numpy references;
the R-CNN is checked for contract conformance (shapes, jit-ability, provider
output) — accuracy parity requires converted detectron2 weights (see
detect/densepose.py docstring).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_classification_tpu.detect import (
    DensePoseRCNN,
    apply_deltas,
    box_iou,
    nms,
    roi_align,
)
from video_classification_tpu.detect.densepose import generate_anchors


def _np_iou(a, b):
    area_a = np.maximum(a[2] - a[0], 0) * np.maximum(a[3] - a[1], 0)
    area_b = np.maximum(b[2] - b[0], 0) * np.maximum(b[3] - b[1], 0)
    ix = max(0, min(a[2], b[2]) - max(a[0], b[0]))
    iy = max(0, min(a[3], b[3]) - max(a[1], b[1]))
    inter = ix * iy
    return inter / max(area_a + area_b - inter, 1e-9)


def _np_nms(boxes, scores, iou_th):
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order:
            if not suppressed[j] and _np_iou(boxes[i], boxes[j]) > iou_th:
                suppressed[j] = True
    return keep


def test_box_iou_matches_numpy():
    rng = np.random.RandomState(0)
    pts = rng.rand(6, 4) * 50
    boxes = np.stack(
        [np.minimum(pts[:, 0], pts[:, 2]), np.minimum(pts[:, 1], pts[:, 3]),
         np.maximum(pts[:, 0], pts[:, 2]) + 1, np.maximum(pts[:, 1], pts[:, 3]) + 1],
        axis=1,
    ).astype(np.float32)
    got = np.asarray(box_iou(jnp.asarray(boxes), jnp.asarray(boxes)))
    for i in range(6):
        for j in range(6):
            assert abs(got[i, j] - _np_iou(boxes[i], boxes[j])) < 1e-5


def test_nms_matches_numpy():
    rng = np.random.RandomState(1)
    n = 20
    centers = rng.rand(n, 2) * 40
    sizes = 5 + rng.rand(n, 2) * 15
    boxes = np.concatenate([centers - sizes / 2, centers + sizes / 2], 1).astype(np.float32)
    scores = rng.rand(n).astype(np.float32)
    keep_idx, keep_mask = nms(jnp.asarray(boxes), jnp.asarray(scores), n, 0.5)
    got = list(np.asarray(keep_idx)[np.asarray(keep_mask)])
    want = _np_nms(boxes, scores, 0.5)
    assert got == want


def test_nms_static_output():
    boxes = jnp.asarray([[0, 0, 10, 10], [100, 100, 110, 110]], jnp.float32)
    scores = jnp.asarray([0.9, 0.8])
    keep_idx, keep_mask = nms(boxes, scores, 5, 0.5)
    assert keep_idx.shape == (5,)
    assert list(np.asarray(keep_mask)) == [True, True, False, False, False]


def _np_roi_align(feat, box, out_size, scale, ratio=2):
    """Direct numpy ROIAlign (aligned=True) reference."""
    H, W, C = feat.shape

    def sample(y, x):
        y = min(max(y, 0.0), H - 1.0)
        x = min(max(x, 0.0), W - 1.0)
        y0, x0 = int(np.floor(y)), int(np.floor(x))
        y1, x1 = min(y0 + 1, H - 1), min(x0 + 1, W - 1)
        wy, wx = y - y0, x - x0
        return (
            feat[y0, x0] * (1 - wy) * (1 - wx)
            + feat[y0, x1] * (1 - wy) * wx
            + feat[y1, x0] * wy * (1 - wx)
            + feat[y1, x1] * wy * wx
        )

    x1, y1, x2, y2 = np.asarray(box) * scale
    bw = max(x2 - x1, 1e-6) / out_size
    bh = max(y2 - y1, 1e-6) / out_size
    out = np.zeros((out_size, out_size, C), np.float32)
    for i in range(out_size):
        for j in range(out_size):
            acc = np.zeros(C, np.float32)
            for ky in range(ratio):
                for kx in range(ratio):
                    sy = y1 + (i + (ky + 0.5) / ratio) * bh - 0.5
                    sx = x1 + (j + (kx + 0.5) / ratio) * bw - 0.5
                    acc += sample(sy, sx)
            out[i, j] = acc / (ratio * ratio)
    return out


def test_roi_align_matches_numpy():
    rng = np.random.RandomState(2)
    feat = rng.rand(16, 16, 3).astype(np.float32)
    boxes = np.asarray([[4.0, 4.0, 44.0, 36.0], [0.0, 0.0, 64.0, 64.0]], np.float32)
    got = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(boxes), 7, 0.25))
    for b in range(2):
        want = _np_roi_align(feat, boxes[b], 7, 0.25)
        np.testing.assert_allclose(got[b], want, atol=1e-5)


def test_apply_deltas_identity():
    anchors = jnp.asarray([[10.0, 10.0, 30.0, 50.0]])
    out = np.asarray(apply_deltas(anchors, jnp.zeros((1, 4))))
    np.testing.assert_allclose(out, np.asarray(anchors), atol=1e-5)


def test_generate_anchors():
    a = np.asarray(generate_anchors((2, 3), 8, 32.0))
    assert a.shape == (2 * 3 * 3, 4)
    # detectron2 offset-0 convention: cell (0,0)'s ratio-1 anchor is centered
    # on the cell corner (0, 0), 32x32.
    centered = a[1]  # ratios (0.5, 1, 2) -> index 1 is ratio 1.0
    np.testing.assert_allclose(centered, [-16, -16, 16, 16], atol=1e-4)
    # detectron2 ratio convention: ratio = h/w, w = scale/sqrt(r).
    tall = a[2]  # ratio 2.0
    w = tall[2] - tall[0]
    h = tall[3] - tall[1]
    np.testing.assert_allclose(h / w, 2.0, atol=1e-4)


@pytest.mark.slow
def test_densepose_rcnn_contract():
    model = DensePoseRCNN(depth=50, pre_nms_topk=64, post_nms_topk=8,
                          max_detections=4, chart_pooler_size=14)
    img = jnp.asarray(np.random.RandomState(0).randn(64, 64, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), img, train=False)
    out = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, img)
    assert out["boxes"].shape == (4, 4)
    assert out["scores"].shape == (4,)
    assert out["charts"].shape == (4, 56, 56)  # pooler 14 -> heatmap 4x14
    assert out["u"].shape == (4, 56, 56)
    assert int(out["charts"].max()) <= 24
    assert float(out["u"].min()) >= 0.0 and float(out["u"].max()) <= 1.0


@pytest.mark.slow
def test_densepose_rcnn_odd_size_input():
    """Inputs not divisible by the FPN stride pad bottom-right (detectron2
    ImageList semantics); boxes clip to the true frame."""
    model = DensePoseRCNN(depth=50, pre_nms_topk=32, post_nms_topk=8,
                          max_detections=2, chart_pooler_size=14)
    img = jnp.asarray(np.random.RandomState(0).randn(100, 172, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), img, train=False)
    out = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, img)
    assert out["boxes"].shape == (2, 4)
    assert float(out["boxes"][:, 2].max()) <= 172.0
    assert float(out["boxes"][:, 3].max()) <= 100.0


def test_multilevel_roi_align_matches_per_level_select():
    """Flat-pyramid ROIAlign == pool-every-level + take_along_axis selection."""
    from video_classification_tpu.detect.ops import multilevel_roi_align

    rng = np.random.RandomState(3)
    feats = [jnp.asarray(rng.rand(1, 32 // (2 ** i), 48 // (2 ** i), 5)
                         .astype(np.float32)) for i in range(4)]
    strides = [4, 8, 16, 32]
    # Box sizes spanning all levels: index = clamp(floor(4 + log2(
    # sqrt(wh)/224)), 2, 5) - 2, so P2 < 112px <= P3 < 224px <= P4 < 448px <= P5.
    boxes = jnp.asarray([
        [4.0, 4.0, 40.0, 40.0],       # 36px -> P2
        [0.0, 0.0, 150.0, 150.0],     # -> P3
        [0.0, 0.0, 300.0, 300.0],     # -> P4
        [0.0, 0.0, 1000.0, 900.0],    # huge -> P5
    ], jnp.float32)

    got = np.asarray(multilevel_roi_align(feats, boxes, 7))

    pooled = [np.asarray(roi_align(f[0], boxes, 7, 1.0 / s))
              for f, s in zip(feats, strides)]
    bw = np.maximum(np.asarray(boxes)[:, 2] - np.asarray(boxes)[:, 0], 1.0)
    bh = np.maximum(np.asarray(boxes)[:, 3] - np.asarray(boxes)[:, 1], 1.0)
    # detectron2 assign_boxes_to_levels: clamp(floor(4 + log2(sqrt(wh)/224)),
    # 2, 5) - 2.
    level = np.clip(np.floor(4 + np.log2(np.sqrt(bw * bh) / 224.0 + 1e-8)) - 2,
                    0, 3).astype(int)
    # Pin the absolute assignments, not just self-consistency (a shared wrong
    # formula in got/want would otherwise cancel out).
    np.testing.assert_array_equal(level, [0, 1, 2, 3])
    want = np.stack([pooled[level[i]][i] for i in range(4)])
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_nms_pallas_matches_xla():
    """VMEM NMS kernel (interpret mode on CPU) == the XLA fixed-trip NMS."""
    rng = np.random.RandomState(7)
    n = 64
    centers = rng.rand(n, 2) * 60
    sizes = 5 + rng.rand(n, 2) * 20
    boxes = np.concatenate([centers - sizes / 2, centers + sizes / 2], 1).astype(np.float32)
    scores = rng.rand(n).astype(np.float32)
    for max_out, thr in ((16, 0.5), (n, 0.7)):
        want_idx, want_mask = nms(jnp.asarray(boxes), jnp.asarray(scores),
                                  max_out, thr, backend="xla")
        got_idx, got_mask = nms(jnp.asarray(boxes), jnp.asarray(scores),
                                max_out, thr, backend="pallas_interpret")
        np.testing.assert_array_equal(np.asarray(got_mask), np.asarray(want_mask))
        np.testing.assert_array_equal(
            np.asarray(got_idx)[np.asarray(want_mask)],
            np.asarray(want_idx)[np.asarray(want_mask)])


@pytest.mark.slow
def test_provider_batched_matches_single():
    """detect() in vmapped chunks == frame-by-frame inference (same weights,
    same frames), including the padded last chunk."""
    from video_classification_tpu.detect import DensePoseIUVProvider

    rng = np.random.RandomState(0)
    images = rng.randint(0, 256, (5, 64, 64, 3), np.uint8)
    names = [f"f{i}" for i in range(5)]
    kw = dict(depth=50, pre_nms_topk=32, post_nms_topk=8, max_detections=2,
              chart_pooler_size=14, min_size=0, compute_dtype="float32")
    p1 = DensePoseIUVProvider(batch_size=1, **kw)
    d1 = p1.detect(images, names)
    p2 = DensePoseIUVProvider(batch_size=4, **kw)  # 5 = chunk of 4 + padded 1
    p2.variables = p1.variables  # same random init
    d2 = p2.detect(images, names)
    assert len(d1) == len(d2) == 5
    for a, b in zip(d1, d2):
        np.testing.assert_allclose(a.boxes_xyxy, b.boxes_xyxy, atol=1e-4)
        np.testing.assert_allclose(a.scores, b.scores, atol=1e-5)
        # Box ints can flip by 1 ULP at int() boundaries; compare field
        # content only when the rasterized sizes agree.
        if a.labels.size and a.labels.shape == b.labels.shape:
            assert (a.labels == b.labels).mean() > 0.99  # argmax tie-breaks
            np.testing.assert_allclose(a.uv, b.uv, atol=1e-3)


def test_online_densepose_detector_batched(tmp_path):
    """DensePoseOnlineDetector chunked-vmap path == per-frame path."""
    from video_classification_tpu.config import get_cfg
    from video_classification_tpu.pipeline.online import DensePoseOnlineDetector

    cfg = get_cfg()
    cfg.CHALEARN.ROOT = str(tmp_path)
    rng = np.random.RandomState(1)
    frames = rng.randint(0, 256, (3, 64, 64, 3), np.uint8)
    kw = dict(depth=50, pre_nms_topk=32, post_nms_topk=8, max_detections=2,
              chart_pooler_size=14)
    det1 = DensePoseOnlineDetector(cfg, **kw, batch_size=1, allow_random_init=True)
    out1 = det1(frames)
    det2 = DensePoseOnlineDetector(cfg, **kw, batch_size=2, allow_random_init=True)
    det2.variables = det1.variables
    out2 = det2(frames)
    np.testing.assert_allclose(np.asarray(out1.boxes_xyxy),
                               np.asarray(out2.boxes_xyxy), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(out1.valid), np.asarray(out2.valid))
    np.testing.assert_allclose(np.asarray(out1.uv), np.asarray(out2.uv), atol=1e-4)


@pytest.mark.slow
def test_chart_topk_matches_full_prefix():
    """chart_topk=K charts/u/v must equal rows [0:K) of the full run — the
    budget only trims the per-ROI DeepLab head, never changes its math."""
    full = DensePoseRCNN(depth=50, pre_nms_topk=64, post_nms_topk=8,
                         max_detections=4, chart_pooler_size=14)
    img = jnp.asarray(np.random.RandomState(3).randn(64, 64, 3).astype(np.float32))
    variables = full.init(jax.random.PRNGKey(0), img, train=False)
    out_full = jax.jit(lambda v, x: full.apply(v, x, train=False))(variables, img)
    top1 = DensePoseRCNN(depth=50, pre_nms_topk=64, post_nms_topk=8,
                         max_detections=4, chart_pooler_size=14, chart_topk=1)
    out_1 = jax.jit(lambda v, x: top1.apply(v, x, train=False))(variables, img)
    np.testing.assert_array_equal(np.asarray(out_1["boxes"]),
                                  np.asarray(out_full["boxes"]))
    assert out_1["charts"].shape == (1, 56, 56)
    np.testing.assert_array_equal(np.asarray(out_1["charts"][0]),
                                  np.asarray(out_full["charts"][0]))
    # Not bitwise: the K=1 and K=8 head graphs have different batch shapes, so
    # XLA's fusion/summation order differs at the last-ulp level.
    np.testing.assert_allclose(np.asarray(out_1["u"][0]),
                               np.asarray(out_full["u"][0]), atol=5e-6)
    np.testing.assert_allclose(np.asarray(out_1["v"][0]),
                               np.asarray(out_full["v"][0]), atol=5e-6)
