"""libraw/dcraw postprocess knobs (readraw, image_formats_libraries.c:
686-720): the production implementation in siriltpu.io.rawproc vs the
literal scalar oracle re-derivations of dcraw.c's scale_colors /
gamma_curve in siriltpu.verify.oracle."""

import numpy as np
import pytest

from siriltpu.core.config import Settings, from_siril_cfg
from siriltpu.io import rawproc
from siriltpu.verify import oracle


def _cfa(h=48, w=64, seed=3, hot=True):
    rng = np.random.default_rng(seed)
    cfa = rng.integers(100, 16000, size=(h, w)).astype(np.uint16)
    if hot:
        cfa[9:12, 9:12] = 65530   # saturated block for the auto-WB skip
        cfa[0, 5] = 0             # zero sample (dcraw skips it)
    return cfa


@pytest.mark.parametrize("gamm0,gamm1,bright", [
    (1.0, 1.0, 1.0),       # reference defaults: identity
    (2.222, 4.5, 1.0),     # BT.709 pair (the GUI's standard preset)
    (1.8, 0.0, 1.0),       # zero slope: pure power curve
    (2.2, 4.5, 1.7),       # brightness raises the linear max
    (0.8, 2.0, 0.5),
])
def test_gamma_curve_matches_oracle(gamm0, gamm1, bright):
    got = rawproc.output_curve(gamm0, gamm1, bright)
    want = oracle.libraw_gamma_curve(1.0 / gamm0, gamm1,
                                     (0x2000 << 3) / bright)
    np.testing.assert_array_equal(got, want)


def test_gamma_curve_default_is_identity():
    lut = rawproc.output_curve(1.0, 1.0, 1.0)
    np.testing.assert_array_equal(lut, np.arange(0x10000, dtype=np.uint16))


@pytest.mark.parametrize("pattern", ["RGGB", "BGGR", "GBRG", "GRBG"])
def test_auto_wb_matches_oracle(pattern):
    cfa = _cfa()
    got = rawproc.auto_wb_multipliers(cfa, pattern, maximum=65535, black=96)
    want = oracle.libraw_auto_wb(cfa, pattern, maximum=65535, black=96)
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_auto_wb_skips_saturated_blocks():
    cfa = _cfa(hot=False)
    base = rawproc.auto_wb_multipliers(cfa, "RGGB")
    cfa2 = cfa.copy()
    cfa2[8:16, 8:16] = 65530          # one fully saturated block
    skipped = rawproc.auto_wb_multipliers(cfa2, "RGGB")
    # the saturated block is excluded entirely, so the estimate moves
    # only by the removal of those samples, never toward the hot values
    want = oracle.libraw_auto_wb(cfa2, "RGGB")
    np.testing.assert_allclose(skipped, want, rtol=1e-12)
    assert not np.allclose(base, skipped)  # the block did matter


@pytest.mark.parametrize("pattern,black", [("RGGB", 0), ("GBRG", 256)])
def test_scale_cfa_matches_oracle(pattern, black):
    cfa = _cfa(seed=11)
    pre = np.array([2.1, 1.0, 1.6, 0.0])
    maximum = 16383
    smul = rawproc.scale_multipliers(pre, maximum=maximum, black=black)
    got = rawproc.scale_cfa(cfa, pattern, smul, black=black)
    want = oracle.libraw_scale_colors(cfa, pattern, pre,
                                      maximum=maximum, black=black)
    np.testing.assert_array_equal(got, want)


def test_choose_multipliers_precedence():
    cfa = _cfa(seed=7)
    user = (1.9, 1.0, 1.3, 1.0)
    # user multipliers only
    p = rawproc.choose_multipliers(user_mul=user, cfa=cfa)
    np.testing.assert_allclose(p, user)
    # auto WB overrides user (dcraw order: use_auto_wb after user_mul)
    p = rawproc.choose_multipliers(user_mul=user, use_auto_wb=True,
                                   cfa=cfa, pattern="RGGB")
    np.testing.assert_allclose(p, oracle.libraw_auto_wb(cfa, "RGGB"))
    # camera WB with valid cam_mul wins over everything
    p = rawproc.choose_multipliers(user_mul=user, use_auto_wb=True,
                                   use_camera_wb=True,
                                   cam_mul=(2.4, 1.0, 1.5, 1.0),
                                   cfa=cfa, pattern="RGGB")
    np.testing.assert_allclose(p, (2.4, 1.0, 1.5, 1.0))
    # camera WB requested but absent -> the auto path (dcraw's
    # cam_mul[0] == -1 join)
    p = rawproc.choose_multipliers(use_camera_wb=True, cam_mul=None,
                                   cfa=cfa, pattern="RGGB")
    np.testing.assert_allclose(p, oracle.libraw_auto_wb(cfa, "RGGB"))


def test_postprocess_default_settings_identity():
    """Reference default knobs (conversion.c:233-245) make every stage
    the identity — the scaled CFA equals the input and the LUT is
    i -> i."""
    cfa = _cfa(seed=5)
    scaled, lut = rawproc.postprocess_cfa(cfa, "RGGB", Settings())
    np.testing.assert_array_equal(scaled, cfa)
    np.testing.assert_array_equal(lut, np.arange(0x10000, dtype=np.uint16))


def test_read_raw_with_settings_end_to_end(tmp_path):
    """read_raw(settings=...) = scale -> debayer(user_qual) -> LUT, and
    default settings reproduce the legacy path bit-for-bit."""
    from siriltpu.io.raw import read_raw
    from siriltpu.ops.demosaic import debayer_buffer
    from test_raw import write_dng

    cfa = _cfa(seed=9, hot=False)
    p = str(tmp_path / "x.dng")
    write_dng(p, cfa, pattern="RGGB")

    legacy = read_raw(p, method="ahd")
    default = read_raw(p, settings=Settings())   # user_qual 1 = AHD
    np.testing.assert_array_equal(default.data, legacy.data)

    s = Settings(raw_auto_mul=False, raw_mul_0=1.8, raw_mul_2=1.4,
                 raw_gamm_0=2.222, raw_gamm_1=4.5, raw_bright=1.2,
                 raw_user_qual=0)
    got = read_raw(p, settings=s)
    pre = np.array([1.8, 1.0, 1.4, 1.0])
    smul = rawproc.scale_multipliers(pre)
    scaled = rawproc.scale_cfa(cfa, "RGGB", smul)
    lut = rawproc.output_curve(2.222, 4.5, 1.2)
    want = lut[debayer_buffer(scaled, "RGGB", "bilinear")]
    np.testing.assert_array_equal(got.data, want[:, ::-1])


def test_from_siril_cfg_libraw_section(tmp_path):
    cfg = tmp_path / "siril.cfg"
    cfg.write_text(
        'working-directory = "/tmp";\n'
        "libraw-settings : {\n"
        "  mul_0 = 1.75;\n  mul_2 = 1.25;\n  bright = 1.5;\n"
        "  auto = 0;\n  cam_wb = 1;\n  auto_wb = 0;\n  user_qual = 2;\n"
        "  gamm_0 = 2.222;\n  gamm_1 = 4.5;\n  user_black = 1;\n"
        "};\n")
    s = from_siril_cfg(str(cfg))
    assert s.raw_mul_0 == 1.75 and s.raw_mul_2 == 1.25
    assert s.raw_bright == 1.5 and s.raw_auto_mul is False
    assert s.raw_cam_wb is True and s.raw_auto_wb is False
    assert s.raw_user_qual == 2
    assert s.raw_gamm_0 == 2.222 and s.raw_gamm_1 == 4.5
    assert s.raw_user_black is True
