"""ASF skeleton parsing + forward kinematics oracles."""
import textwrap

import numpy as np
import pytest

from dp_gp_lvm_tpu.data import asf

ASF_SAMPLE = textwrap.dedent("""\
    # test skeleton
    :version 1.10
    :name test
    :units
      mass 1.0
      length 0.45
      angle deg
    :root
       order TX TY TZ RX RY RZ
       axis XYZ
       position 0 0 0
       orientation 0 0 0
    :bonedata
      begin
         id 1
         name upper
         direction 0 1 0
         length 2
         axis 0 0 0 XYZ
         dof rx ry rz
      end
      begin
         id 2
         name lower
         direction 1 0 0
         length 3
         axis 0 0 90 XYZ
         dof rz
      end
    :hierarchy
      begin
        root upper
        upper lower
      end
""")


@pytest.fixture
def skeleton(tmp_path):
    p = tmp_path / "test.asf"
    p.write_text(ASF_SAMPLE)
    return asf.parse_asf(str(p))


def test_parse_structure(skeleton):
    assert set(skeleton.bones) == {"upper", "lower"}
    assert skeleton.bones["upper"].children == ["lower"]
    assert skeleton.bones["upper"].length == 2.0
    assert skeleton.joint_names() == ["root", "upper", "lower"]


def test_fk_rest_pose(skeleton):
    """Zero angles: bones extend along direction * length from parent."""
    frame = {"root": [1.0, 2.0, 3.0, 0, 0, 0], "upper": [0, 0, 0],
             "lower": [0]}
    pos, segs = asf.fk_frame(skeleton, frame)
    np.testing.assert_allclose(pos["root"], [1, 2, 3])
    np.testing.assert_allclose(pos["upper"], [1, 4, 3])       # +2 in y
    np.testing.assert_allclose(pos["lower"], [4, 4, 3])       # +3 in x
    assert len(segs) == 2


def test_fk_rotation(skeleton):
    """90-degree rz on 'upper' rotates its (0,1,0)*2 offset to (-2,0,0),
    and rotates the whole subtree (lower goes to -x -> -y direction...)."""
    frame = {"root": [0, 0, 0, 0, 0, 0], "upper": [0, 0, 90.0],
             "lower": [0]}
    pos, _ = asf.fk_frame(skeleton, frame)
    np.testing.assert_allclose(pos["upper"], [-2, 0, 0], atol=1e-12)
    # child inherits parent rotation: (3,0,0) rotated 90deg about z
    np.testing.assert_allclose(pos["lower"], [-2, 3, 0], atol=1e-12)


def test_fk_axis_frame(skeleton):
    """'lower' has axis 0 0 90: its rz dof acts in the rotated frame —
    C Rz C^-1 is still a rotation about z (axis is also z), so a 90deg
    turns (3,0,0) into (0,3,0)."""
    frame = {"root": [0, 0, 0, 0, 0, 0], "upper": [0, 0, 0],
             "lower": [90.0]}
    pos, _ = asf.fk_frame(skeleton, frame)
    np.testing.assert_allclose(pos["lower"], [0, 2 + 3, 0], atol=1e-12)


def test_root_rotation(skeleton):
    frame = {"root": [0, 0, 0, 0, 0, 90.0], "upper": [0, 0, 0],
             "lower": [0]}
    pos, _ = asf.fk_frame(skeleton, frame)
    np.testing.assert_allclose(pos["upper"], [-2, 0, 0], atol=1e-12)


def test_fk_sequence_and_render(skeleton, tmp_path):
    frames = [
        {"root": [0, 0, 0, 0, 0, 0], "upper": [0, 0, 0], "lower": [0]},
        {"root": [0, 0, 0, 0, 0, 0], "upper": [0, 0, 45.0], "lower": [10.0]},
    ]
    seq = asf.fk_sequence(skeleton, frames)
    assert seq.shape == (2, 3, 3)
    from dp_gp_lvm_tpu import viz

    _, segs = asf.fk_frame(skeleton, frames[1])
    out = tmp_path / "skel.png"
    viz.plot_skeleton(segs, path=str(out))
    assert out.exists()
