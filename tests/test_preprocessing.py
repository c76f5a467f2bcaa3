"""Preprocessing behavior tests, modeled on the reference suite
(tests/test_preprocessing.py): resize dtype handling, valid-region
meta, target encodings, augmentations, provenance."""
import numpy as np
import pytest

from nicr_mtsa_tpu.data.preprocessing import (
    APPLIED_PREPROCESSING_KEY,
    Compose,
    FullResCloner,
    InstanceClearStuffIDs,
    InstanceTargetGenerator,
    MultiscaleSupervisionGenerator,
    NormalizeDepth,
    NormalizeRGB,
    OrientationTargetGenerator,
    PanopticTargetGenerator,
    RandomCrop,
    RandomHSVJitter,
    RandomHorizontalFlip,
    RandomResize,
    Resize,
    ScaleDepth,
    SemanticClassMapper,
    ToDeviceArrays,
    get_fullres_key,
    get_valid_region_slices,
)
from nicr_mtsa_tpu.data.preprocessing.augmentation import (
    adjust_hsv, hsv_to_rgb_uint8, rgb_to_hsv_uint8,
)
from nicr_mtsa_tpu.data.preprocessing.resize import (
    resize_image_bilinear, resize_image_nearest,
)
from nicr_mtsa_tpu.testing import get_dummy_sample
from nicr_mtsa_tpu.testing.preprocessing import (
    TEST_CLASSES_IS_THING_WITH_VOID,
)


def test_resize_nearest_dtypes():
    # nearest resize must be exact for bool / uint16 / uint32 labels
    # (replaces the reference's OpenCV dtype workarounds,
    # resize.py:123-139)
    rng = np.random.default_rng(0)
    for dtype in ('bool', 'uint8', 'uint16', 'uint32', 'int32', 'float32'):
        img = rng.integers(0, 2 ** 16, (64, 48)).astype(dtype)
        out = resize_image_nearest(img, 32, 24)
        assert out.dtype == img.dtype
        assert out.shape == (32, 24)
        # every output value must exist in the input
        assert np.isin(out.ravel(), img.ravel()).all()

        # upscale back down is identity for integer upscale factors
        up = resize_image_nearest(img, 128, 96)
        down = resize_image_nearest(up, 64, 48)
        assert (down == img).all()


@pytest.mark.skipif(
    not pytest.importorskip('cv2', reason='cv2 not available'),
    reason='cv2 not available')
def test_resize_matches_opencv():
    import cv2
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (60, 80, 3), dtype=np.uint8)
    labels = rng.integers(0, 1000, (60, 80), dtype=np.uint16)

    for (h, w) in [(30, 40), (45, 60), (120, 160), (37, 53)]:
        ours = resize_image_nearest(labels, h, w)
        cv = cv2.resize(labels, (w, h), interpolation=cv2.INTER_NEAREST)
        assert (ours == cv).all(), (h, w)

        ours_rgb = resize_image_bilinear(img, h, w)
        cv_rgb = cv2.resize(img, (w, h), interpolation=cv2.INTER_LINEAR)
        diff = np.abs(ours_rgb.astype(int) - cv_rgb.astype(int))
        assert diff.max() <= 2, (h, w, diff.max())


def test_resize_preprocessor_and_valid_region():
    sample = get_dummy_sample()
    pre = Resize(height=480, width=640, keep_aspect_ratio=True)
    sample = pre(sample)

    assert sample['rgb'].shape == (480, 640, 3)
    assert sample['depth'].shape == (480, 640)
    assert sample['semantic'].shape == (480, 640)

    # 512x512 -> scale 480/512 -> 480x480 centered in 640
    sy, sx = get_valid_region_slices(sample)
    assert sy == slice(0, 480)
    assert sx == slice(80, 80 + 480)
    # padding region must be zero
    assert (sample['semantic'][:, :80] == 0).all()
    assert (sample['semantic'][:, -80:] == 0).all()


def test_fullres_cloner():
    sample = get_dummy_sample()
    pre = Compose([
        FullResCloner(('rgb', 'depth', 'semantic', 'instance')),
        Resize(height=240, width=320),
    ])
    sample = pre(sample)
    assert sample[get_fullres_key('rgb')].shape == (512, 512, 3)
    assert sample['rgb'].shape == (240, 320, 3)


def test_normalize_rgb_depth():
    sample = get_dummy_sample()
    rgb_orig = sample['rgb'].copy()
    sample = NormalizeRGB()(sample)
    assert sample['rgb'].dtype == np.float32
    expected = (rgb_orig[0, 0].astype('float32')
                - np.array([0.485, 0.456, 0.406]) * 255) \
        / (np.array([0.229, 0.224, 0.225]) * 255)
    np.testing.assert_allclose(sample['rgb'][0, 0], expected, rtol=1e-5)

    sample2 = get_dummy_sample()
    sample2['depth'][:10, :10] = 0    # invalid
    sample2 = NormalizeDepth(depth_mean=3000.0, depth_std=1000.0,
                             raw_depth=True)(sample2)
    assert sample2['depth'].dtype == np.float32
    assert (sample2['depth'][:10, :10] == 0).all()


def test_scale_depth():
    sample = get_dummy_sample()
    sample = ScaleDepth(new_min=0.0, new_max=1.0)(sample)
    assert sample['depth'].min() == 0.0
    assert sample['depth'].max() == 1.0


def test_random_horizontal_flip():
    sample = get_dummy_sample()
    rgb_orig = sample['rgb'].copy()
    ori_orig = dict(sample['orientations'])
    sample = RandomHorizontalFlip(p=1.1)(sample)    # always flip
    assert (sample['rgb'] == rgb_orig[:, ::-1]).all()
    for k, v in sample['orientations'].items():
        np.testing.assert_allclose(
            v, (2 * np.pi - ori_orig[k]) % (2 * np.pi))
    meta = sample[APPLIED_PREPROCESSING_KEY]
    assert meta[-1]['was_flipped']


def test_random_crop():
    sample = get_dummy_sample()
    sample = RandomCrop(crop_height=100, crop_width=120)(sample)
    assert sample['rgb'].shape == (100, 120, 3)
    assert sample['depth'].shape == (100, 120)


def test_hsv_roundtrip_and_jitter():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)

    # rgb -> hsv -> rgb is near-identity (uint8 hue quantization to
    # 2-degree steps loses a few /255, same as OpenCV)
    rt = hsv_to_rgb_uint8(rgb_to_hsv_uint8(img))
    assert np.abs(rt.astype(int) - img.astype(int)).max() <= 5

    out = adjust_hsv(img, 0, 0, 0)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 5

    # value offset shifts brightness
    brighter = adjust_hsv(img, 0, 0, 100)
    assert brighter.astype(int).sum() > img.astype(int).sum()

    sample = get_dummy_sample()
    sample = RandomHSVJitter(hue_jitter=0.1, saturation_jitter=0.2,
                             value_jitter=0.2)(sample)
    assert sample['rgb'].dtype == np.uint8


@pytest.mark.skipif(
    not pytest.importorskip('cv2', reason='cv2 not available'),
    reason='cv2 not available')
def test_hsv_matches_opencv():
    import cv2
    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (48, 48, 3), dtype=np.uint8)
    ours = rgb_to_hsv_uint8(img)
    cv = cv2.cvtColor(img, cv2.COLOR_RGB2HSV)
    # hue may differ by 1 step due to rounding; s/v by 1
    assert np.abs(ours[..., 0].astype(int) - cv[..., 0].astype(int)).max() <= 1
    assert np.abs(ours[..., 1:].astype(int)
                  - cv[..., 1:].astype(int)).max() <= 1

    back_ours = hsv_to_rgb_uint8(cv)
    back_cv = cv2.cvtColor(cv, cv2.COLOR_HSV2RGB)
    assert np.abs(back_ours.astype(int) - back_cv.astype(int)).max() <= 2


def test_semantic_class_mapper():
    sample = get_dummy_sample()
    sample = SemanticClassMapper(classes_to_map=(10,), new_label=0)(sample)
    assert not (sample['semantic'] == 10).any()


def test_instance_clear_stuff_ids():
    sample = get_dummy_sample()
    sample = InstanceClearStuffIDs(
        semantic_classes_is_thing=TEST_CLASSES_IS_THING_WITH_VOID)(sample)
    # instance 3 lies on stuff class 10 -> cleared
    assert not (sample['instance'] == 3).any()
    assert (sample['instance'] == 4).any()


def test_instance_target_generator():
    sample = get_dummy_sample()
    sample = InstanceClearStuffIDs(
        semantic_classes_is_thing=TEST_CLASSES_IS_THING_WITH_VOID)(sample)
    gen = InstanceTargetGenerator(
        sigma=8,
        semantic_classes_is_thing=TEST_CLASSES_IS_THING_WITH_VOID,
        normalized_offset=False,
    )
    sample = gen(sample)

    center = sample['instance_center']
    offset = sample['instance_offset']
    fg = sample['instance_foreground']
    cmask = sample['instance_center_mask']

    assert center.shape == (512, 512)
    assert offset.shape == (512, 512, 2)
    assert fg.dtype == bool

    # foreground = union of thing instances 1, 2, 4
    expected_fg = np.isin(sample['instance'], (1, 2, 4))
    assert (fg == expected_fg).all()

    # heatmap peaks (=1.0) at instance centers
    # instance 1: rows 40:100, cols 40:100 -> center (69, 69)
    assert center[69, 69] == pytest.approx(1.0)
    # instance 2: rows 150:200, cols 40:100 -> center (174, 69)
    assert center[174, 69] == pytest.approx(1.0)
    # instance 4: rows 300:400, cols 200:250 -> center (349, 224)
    assert center[349, 224] == pytest.approx(1.0)

    # offsets point at centers
    assert offset[40, 40, 0] == 69 - 40
    assert offset[40, 40, 1] == 69 - 40
    assert offset[199, 99, 0] == 174 - 199
    assert offset[199, 99, 1] == 69 - 99
    # background has zero offset
    assert (offset[~fg] == 0).all()

    # center mask = foreground + stuff regions (classes 4..10 here: class
    # 10 region)
    assert cmask[0, 200]      # stuff class 10 region
    assert cmask[69, 69]      # instance pixel
    assert not cmask[300, 0]  # void region

    meta = sample[APPLIED_PREPROCESSING_KEY][-1]
    assert sorted(meta['encoded_instances']) == [1, 2, 4]


def test_instance_target_generator_normalized_offsets():
    sample = get_dummy_sample()
    sample = InstanceClearStuffIDs(
        semantic_classes_is_thing=TEST_CLASSES_IS_THING_WITH_VOID)(sample)
    gen = InstanceTargetGenerator(
        sigma=8,
        semantic_classes_is_thing=TEST_CLASSES_IS_THING_WITH_VOID,
        normalized_offset=True,
    )
    sample = gen(sample)
    offset = sample['instance_offset']
    assert offset.dtype == np.float32
    assert offset[40, 40, 0] == pytest.approx((69 - 40) / 512)


def test_orientation_target_generator():
    sample = get_dummy_sample()
    gen = OrientationTargetGenerator(
        semantic_classes_estimate_orientation=TEST_CLASSES_IS_THING_WITH_VOID)
    sample = gen(sample)

    ori = sample['orientation']
    fg = sample['orientation_foreground']
    present = sample['orientations_present']

    # instances 1 and 2 have orientations and thing classes; 3 is stuff
    # (class 10); 4 has no orientation
    assert set(present.keys()) == {1, 2}
    assert fg[69, 69] and fg[174, 69]
    assert not fg[100, 225]    # instance 3 region
    np.testing.assert_allclose(
        ori[69, 69], [np.cos(np.deg2rad(45)), np.sin(np.deg2rad(45))],
        atol=1e-6)
    np.testing.assert_allclose(
        ori[174, 69], [np.cos(np.deg2rad(90)), np.sin(np.deg2rad(90))],
        atol=1e-6)


def test_panoptic_target_generator():
    sample = get_dummy_sample()
    sample = InstanceClearStuffIDs(
        semantic_classes_is_thing=TEST_CLASSES_IS_THING_WITH_VOID)(sample)
    sample['instance'] = sample['instance'].astype('uint16')
    gen = PanopticTargetGenerator(
        semantic_classes_is_thing=TEST_CLASSES_IS_THING_WITH_VOID)
    sample = gen(sample)

    pan = sample['panoptic']
    M = 1 << 16
    assert pan.dtype == np.uint32
    # instance 1 -> class 1, first instance of class 1
    assert pan[69, 69] == 1 * M + 1
    # instance 2 -> class 2
    assert pan[174, 69] == 2 * M + 1
    # instance 4 -> class 3
    assert pan[349, 224] == 3 * M + 1
    # stuff class 10
    assert pan[0, 225] == 10 * M
    # void stays void
    assert pan[300, 0] == 0

    # id mapping: panoptic id -> original instance id
    ids = sample['panoptic_ids_to_instance_dict']
    assert ids[1 * M + 1] == 1
    assert ids[2 * M + 1] == 2
    assert ids[3 * M + 1] == 4

    # segment table: sorted unique ids, int32-max padded
    from nicr_mtsa_tpu.ops.segments import SEGMENT_TABLE_PAD
    table = sample['panoptic_segment_table']
    valid = table[table != SEGMENT_TABLE_PAD]
    np.testing.assert_array_equal(valid, np.unique(pan))


def test_multiscale_supervision():
    sample = get_dummy_sample()
    sample = MultiscaleSupervisionGenerator(
        downscales=(4, 8), keys=('semantic', 'instance'))(sample)
    assert sample['_down_4']['semantic'].shape == (128, 128)
    assert sample['_down_8']['instance'].shape == (64, 64)

    # multiscale fan-out: class mapper with multiscale touches _down too
    sample = SemanticClassMapper(classes_to_map=(10,), new_label=0,
                                 multiscale_processing=True)(sample)
    assert not (sample['_down_4']['semantic'] == 10).any()


def test_to_device_arrays():
    sample = get_dummy_sample()
    sample = ToDeviceArrays()(sample)
    assert sample['rgb'].shape == (512, 512, 3)          # stays HWC
    assert sample['depth'].shape == (512, 512, 1)        # HW -> HW1
    assert sample['depth'].dtype == np.int32             # uint16 -> int32
    assert sample['instance'].dtype == np.uint8          # untouched


def test_random_resize():
    sample = get_dummy_sample()
    sample = RandomResize(min_scale=0.5, max_scale=0.5)(sample)
    assert sample['rgb'].shape == (256, 256, 3)


def test_provenance_meta_accumulates():
    sample = get_dummy_sample()
    pre = Compose([
        Resize(height=240, width=320),
        NormalizeRGB(),
    ])
    sample = pre(sample)
    meta = sample[APPLIED_PREPROCESSING_KEY]
    assert [m['type'] for m in meta] == ['Resize', 'NormalizeRGB']


def test_transform_wrapper_consistent_and_crops():
    from nicr_mtsa_tpu.data.preprocessing import TransformWrapper

    sample = get_dummy_sample()

    # joint transform: horizontal flip applied to the whole stack keeps
    # modalities and labels aligned
    wrapper = TransformWrapper(transform=lambda s: s[:, ::-1])
    rgb_orig = sample['rgb'].copy()
    sem_orig = sample['semantic'].copy()
    out = wrapper(sample)
    np.testing.assert_array_equal(out['rgb'], rgb_orig[:, ::-1])
    np.testing.assert_array_equal(out['semantic'], sem_orig[:, ::-1])
    assert out['semantic'].dtype == sem_orig.dtype
    assert out['some_mask'].dtype == bool

    # five-crop adds a leading crop axis to every spatial entry
    sample2 = get_dummy_sample()
    wrapper5 = TransformWrapper(transform=lambda s: s,
                                final_crop=('five', 128, 128))
    out2 = wrapper5(sample2)
    assert out2['rgb'].shape == (5, 128, 128, 3)
    assert out2['depth'].shape == (5, 128, 128)
    # center crop equals direct center slice
    assert (out2['rgb'][4] ==
            np.asarray(_synthetic_rgb_cache()[192:320, 192:320])).all()


def _synthetic_rgb_cache():
    from nicr_mtsa_tpu.testing.preprocessing import _synthetic_rgb
    return _synthetic_rgb(512, 512)
