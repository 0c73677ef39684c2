"""Mask subsystem tests: parser precedence (ref src/app.rs:1660-1783),
validation, containment, and tree evaluation."""

import numpy as np
import pytest

from wgpu_3dgs_viewer_app_tpu.mask import (
    MaskEvaluator,
    MaskParseError,
    MaskShape,
    MaskShapeKind,
    evaluate_mask_numpy,
    parse,
    shape_contains,
)


def test_parse_empty_is_none():
    assert parse("") is None
    assert parse("   ") is None


def test_parse_single_shape():
    op = parse("3")
    assert op.kind == "shape" and op.index == 3


def test_parse_precedence_bang_tightest():
    # !0 | 1  ->  (!0) | 1
    op = parse("!0 | 1")
    assert op.kind == "union"
    assert op.left.kind == "complement"


def test_parse_precedence_chain():
    # Reference precedence: ! > ^ > - > & > |
    op = parse("0 | 1 & 2 - 3 ^ 4")
    assert op.kind == "union"
    assert op.right.kind == "intersection"
    assert op.right.right.kind == "difference"
    assert op.right.right.right.kind == "symmetric_difference"


def test_parse_left_associative():
    op = parse("0 - 1 - 2")
    assert op.kind == "difference"
    assert op.left.kind == "difference"
    assert op.left.left.index == 0 and op.left.right.index == 1 and op.right.index == 2


def test_parse_parens_override():
    op = parse("(0 | 1) & 2")
    assert op.kind == "intersection"
    assert op.left.kind == "union"


def test_parse_errors():
    for bad in ("0 |", "(0", "0 1", "&", "a"):
        with pytest.raises(MaskParseError):
            parse(bad)


def test_validate_shapes():
    op = parse("0 | 5")
    op.validate_shapes(6)
    with pytest.raises(MaskParseError):
        op.validate_shapes(5)


def test_box_containment_with_transform():
    shape = MaskShape(
        kind=MaskShapeKind.BOX,
        pos=np.array([1, 0, 0], np.float32),
        rot=np.array([0, 0, 90], np.float32),  # rotate about Z
        scale=np.array([2, 1, 1], np.float32),
    )
    pod = shape.to_pod()
    pts = np.array(
        [
            [1, 0, 0],      # center: inside
            [1, 0.9, 0],    # along rotated long axis (+Y): inside (half-extent 1)
            [1.6, 0, 0],    # along rotated short axis (+X): outside (half-extent .5)
            [1, 1.1, 0],    # beyond long axis: outside
        ],
        np.float32,
    )
    got = np.asarray(shape_contains(pod, pts))
    np.testing.assert_array_equal(got, [True, True, False, False])


def test_ellipsoid_containment():
    shape = MaskShape(kind=MaskShapeKind.ELLIPSOID, scale=np.array([2, 1, 1], np.float32))
    pod = shape.to_pod()
    pts = np.array([[0.9, 0, 0], [0, 0.9, 0], [0.9, 0.4, 0]], np.float32)
    got = np.asarray(shape_contains(pod, pts))
    np.testing.assert_array_equal(got, [True, False, False])


def test_evaluator_set_algebra():
    # Two unit boxes: A at origin, B at x=0.5 (overlapping).
    a = MaskShape(kind=MaskShapeKind.BOX).to_pod()
    b = MaskShape(kind=MaskShapeKind.BOX, pos=np.array([0.5, 0, 0], np.float32)).to_pod()
    pts = np.array(
        [[-0.4, 0, 0], [0.25, 0, 0], [0.8, 0, 0], [2, 0, 0]], np.float32
    )  # A-only, both, B-only, neither
    ev = MaskEvaluator()

    def bits(code):
        return np.asarray(ev.evaluate(parse(code), [a, b], pts)).astype(bool)

    np.testing.assert_array_equal(bits("0 | 1"), [True, True, True, False])
    np.testing.assert_array_equal(bits("0 & 1"), [False, True, False, False])
    np.testing.assert_array_equal(bits("0 - 1"), [True, False, False, False])
    np.testing.assert_array_equal(bits("0 ^ 1"), [True, False, True, False])
    np.testing.assert_array_equal(bits("!0"), [False, False, True, True])
    np.testing.assert_array_equal(bits("!(0 | 1)"), [False, False, False, True])


def test_evaluator_reset_none():
    pts = np.zeros((5, 3), np.float32)
    out = evaluate_mask_numpy(None, [], pts)
    np.testing.assert_array_equal(out, 1)


def test_evaluator_model_transform():
    from wgpu_3dgs_viewer_app_tpu.core import ModelTransform

    box = MaskShape(kind=MaskShapeKind.BOX, pos=np.array([10, 0, 0], np.float32)).to_pod()
    pts = np.zeros((1, 3), np.float32)  # local origin
    t = ModelTransform(pos=np.array([10, 0, 0], np.float32))
    assert evaluate_mask_numpy(parse("0"), [box], pts, t)[0] == 1
    assert evaluate_mask_numpy(parse("0"), [box], pts, None)[0] == 0
