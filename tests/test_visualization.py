"""Visualization smoke tests (shape/dtype/stability contracts)."""
import numpy as np

from nicr_mtsa_tpu.visualization import (
    InstanceColorGenerator,
    PanopticColorGenerator,
    generate_semantic_colors,
    visualize_heatmap,
    visualize_instance,
    visualize_instance_center,
    visualize_instance_offset,
    visualize_instance_orientations,
    visualize_normal,
    visualize_orientation,
    visualize_panoptic,
    visualize_semantic,
    visualize_depth,
)


def test_semantic_palette():
    colors = generate_semantic_colors(10)
    assert colors.shape == (10, 3)
    assert (colors[0] == 0).all()                      # void black
    assert len({tuple(c) for c in colors}) == 10       # all distinct

    img = visualize_semantic(np.array([[0, 1], [2, 3]]), colors)
    assert img.shape == (2, 2, 3) and img.dtype == np.uint8
    assert (img[0, 0] == 0).all()


def test_instance_colors_stable():
    gen = InstanceColorGenerator()
    c5 = gen.get_color(5)
    assert gen.get_color(5) == c5
    assert gen.get_color(0) == (0, 0, 0)

    seg = np.zeros((8, 8), np.int32)
    seg[:4] = 1
    seg[4:] = 2
    img = visualize_instance(seg, gen)
    assert img.shape == (8, 8, 3)
    assert not (img[0, 0] == img[7, 7]).all()


def test_center_offset_orientation_maps():
    hm = np.random.default_rng(0).random((16, 16)).astype(np.float32)
    assert visualize_heatmap(hm, 0, 1).shape == (16, 16, 3)
    assert visualize_instance_center(center_img=hm).shape == (16, 16, 3)

    cross = visualize_instance_center(centers=[(8, 8)], height=16, width=16)
    assert (cross[8, 8] == (255, 0, 0)).all()

    off = np.random.default_rng(1).normal(size=(16, 16, 2)).astype(np.float32)
    assert visualize_instance_offset(off).shape == (16, 16, 3)

    ori = np.zeros((16, 16, 2), np.float32)
    ori[:8] = [1.0, 0.0]
    img = visualize_orientation(ori)
    assert (img[12, 12] == 0).all()        # zero-vector pixels black


def test_instance_orientations_overlay():
    seg = np.zeros((32, 32), np.int32)
    seg[8:24, 8:24] = 1
    img = visualize_instance_orientations(seg, {1: np.pi / 4})
    assert img.shape == (32, 32, 3)


def test_panoptic_colors():
    M = 1 << 16
    pan = np.zeros((8, 8), np.int64)
    pan[:4] = 2 * M            # stuff class 2
    pan[4:, :4] = 1 * M + 1    # thing class 1 instance 1
    pan[4:, 4:] = 1 * M + 2    # thing class 1 instance 2
    colors = generate_semantic_colors(4)
    img = visualize_panoptic(pan, classes_is_thing=[False, True, False,
                                                    False],
                             classes_colors=colors)
    # stuff pixels use the exact class color
    assert (img[0, 0] == colors[2]).all()
    # two instances of the same class get distinct colors
    assert not (img[5, 0] == img[5, 5]).all()


def test_depth_normal():
    depth = np.random.default_rng(2).integers(
        0, 5000, (16, 16)).astype(np.uint16)
    depth[0, 0] = 0
    img = visualize_depth(depth)
    assert (img[0, 0] == 0).all()          # invalid black

    normal = np.zeros((8, 8, 3), np.float32)
    normal[:4] = [0, 0, 1]
    img = visualize_normal(normal)
    assert (img[7, 7] == 0).all()          # invalid black
    np.testing.assert_array_equal(img[0, 0], [127, 127, 255])
