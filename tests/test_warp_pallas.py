"""Pallas warp kernel parity vs the XLA path (interpreter mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_warp import synth_depth, synth_img, H, W
from vr_video_generator_tpu.ops.warp import (
    WarpSpec,
    build_plane_tables,
    build_shift_tables,
    warp_composite_static,
    warp_frame,
)
from vr_video_generator_tpu.ops.warp_pallas import (
    warp_composite_pallas,
    warp_frame_pallas,
)
from vr_video_generator_tpu.utils.config import StereoConfig


@pytest.fixture(scope="module")
def setup(rng=None):
    rng = np.random.default_rng(3)
    cfg = StereoConfig().normalized()
    spec = WarpSpec.create(H, W, cfg)
    img = synth_img(rng)
    depth = synth_depth(rng)
    r = spec.frame_offset_range(jnp.asarray(depth))
    tables = build_plane_tables(jnp.asarray(depth), r, cfg, H, spec.max_planes)
    return spec, img, depth, tables


def test_composite_matches_xla(setup):
    spec, img, depth, tables = setup
    st = build_shift_tables(tables, spec.s_neg, spec.s_pos)
    ref_comp, ref_cov = warp_composite_static(jnp.asarray(img),
                                              jnp.asarray(depth), st,
                                              spec.s_neg, spec.s_pos)
    comp, cov = warp_composite_pallas(jnp.asarray(img), jnp.asarray(depth),
                                      st, spec.s_neg, spec.s_pos,
                                      interpret=True)
    np.testing.assert_array_equal(np.asarray(cov), np.asarray(ref_cov))
    np.testing.assert_array_equal(np.asarray(comp), np.asarray(ref_comp))


def test_full_frame_matches_xla(setup):
    spec, img, depth, tables = setup
    ref = warp_frame(jnp.asarray(img), jnp.asarray(depth), tables,
                     spec.kernel_size, spec.cfg.sigma, impl="xla",
                     s_neg=spec.s_neg, s_pos=spec.s_pos)
    out = warp_frame_pallas(jnp.asarray(img), jnp.asarray(depth), tables,
                            spec.kernel_size, spec.cfg.sigma,
                            spec.s_neg, spec.s_pos, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_ragged_height(setup):
    """H=72 is not a multiple of the 8-row block only if block changes; force
    a ragged grid with block_rows=16 (72 = 4*16 + 8)."""
    spec, img, depth, tables = setup
    st = build_shift_tables(tables, spec.s_neg, spec.s_pos)
    ref_comp, ref_cov = warp_composite_static(jnp.asarray(img),
                                              jnp.asarray(depth), st,
                                              spec.s_neg, spec.s_pos)
    comp, cov = warp_composite_pallas(jnp.asarray(img), jnp.asarray(depth),
                                      st, spec.s_neg, spec.s_pos,
                                      block_rows=16, interpret=True)
    np.testing.assert_array_equal(np.asarray(comp), np.asarray(ref_comp))
    np.testing.assert_array_equal(np.asarray(cov), np.asarray(ref_cov))


def test_banded_compositor_matches_classic(setup):
    """The one-rotate banded kernel == the two-rotate classic kernel ==
    XLA, bit for bit (the smooth synth depth crosses many 5%-overlap band
    boundaries, exercising the dual-band byte encoding)."""
    spec, img, depth, tables = setup
    st = build_shift_tables(tables, spec.s_neg, spec.s_pos)
    ref_comp, ref_cov = warp_composite_static(jnp.asarray(img),
                                              jnp.asarray(depth), st,
                                              spec.s_neg, spec.s_pos)
    for banded in (True, False):
        comp, cov = warp_composite_pallas(jnp.asarray(img),
                                          jnp.asarray(depth), st,
                                          spec.s_neg, spec.s_pos,
                                          interpret=True, banded=banded)
        np.testing.assert_array_equal(np.asarray(cov), np.asarray(ref_cov))
        np.testing.assert_array_equal(np.asarray(comp), np.asarray(ref_comp))


def test_banded_unmatched_depth_falls_to_fill(setup):
    """A depth outside every band must hole-fill, not be claimed by the
    rank-0 shift: the unmatched sentinel (254) must avoid the bj == 0
    dual-band compare bj + 127 (a 127 sentinel collides with it)."""
    spec, img, depth, tables = setup
    st = build_shift_tables(tables, spec.s_neg, spec.s_pos)
    depth = np.array(depth, copy=True)
    depth[3, 5:9] = 1e6  # above every band's hi -> matches no band
    ref_comp, ref_cov = warp_composite_static(jnp.asarray(img),
                                              jnp.asarray(depth), st,
                                              spec.s_neg, spec.s_pos)
    comp, cov = warp_composite_pallas(jnp.asarray(img), jnp.asarray(depth),
                                      st, spec.s_neg, spec.s_pos,
                                      interpret=True, banded=True)
    np.testing.assert_array_equal(np.asarray(cov), np.asarray(ref_cov))
    np.testing.assert_array_equal(np.asarray(comp), np.asarray(ref_comp))


def test_banded_fit_policy():
    """4K cap-sized tables (S=133) exceed the 7-bit rank and must fall back."""
    from vr_video_generator_tpu.ops.warp_pallas import banded_compositor_fits

    cfg = StereoConfig().normalized()
    s1080 = WarpSpec.create(1080, 1920, cfg)
    s4k = WarpSpec.create(2160, 3840, cfg)
    assert banded_compositor_fits(s1080.s_neg, s1080.s_pos)
    assert not banded_compositor_fits(s4k.s_neg, s4k.s_pos)


def test_warp_batch_pallas_matches_xla(rng):
    """Fully fused batched path (compositor + blur/select kernels) vs the
    vmapped XLA path, interpreter mode."""
    import numpy as _np
    from vr_video_generator_tpu.ops.temporal import TemporalState, temporal_scan

    cfg = StereoConfig().normalized()
    spec_x = WarpSpec.create(H, W, cfg, impl="xla")
    spec_p = WarpSpec.create(H, W, cfg, impl="pallas")
    rng = _np.random.default_rng(9)
    imgs = _np.stack([synth_img(rng) for _ in range(3)])
    depths = _np.stack([synth_depth(rng, tmax=5.0 + 2 * i) for i in range(3)])
    state = TemporalState.initial(H, W)
    blended, ranges, _ = temporal_scan(jnp.asarray(depths), state, spec_x)

    ref = _np.asarray(spec_x.warp_batch(jnp.asarray(imgs), blended, ranges))
    out = _np.asarray(spec_p.warp_batch(jnp.asarray(imgs), blended, ranges,
                                        interpret=True))
    _np.testing.assert_array_equal(out, ref)


def test_warp_batch_packed_sbs_matches_u8(rng=None):
    """emit='packed' (edge-copy + SBS concat fused into the blur kernel,
    reference PredictAndGenerate.py:184-197) unpacks to exactly the u8 path."""
    import numpy as _np
    from vr_video_generator_tpu.native import unpack_sbs_np
    from vr_video_generator_tpu.ops.temporal import TemporalState, temporal_scan

    cfg = StereoConfig().normalized()
    spec = WarpSpec.create(H, W, cfg, impl="pallas")
    rng = _np.random.default_rng(17)
    imgs = _np.stack([synth_img(rng) for _ in range(2)])
    depths = _np.stack([synth_depth(rng, tmax=4.0 + 3 * i) for i in range(2)])
    state = TemporalState.initial(H, W)
    blended, ranges, _ = temporal_scan(jnp.asarray(depths), state, spec)

    ref = _np.asarray(spec.warp_batch(jnp.asarray(imgs), blended, ranges,
                                      interpret=True))
    packed = _np.asarray(spec.warp_batch(jnp.asarray(imgs), blended, ranges,
                                         emit="packed", interpret=True))
    assert packed.dtype == _np.uint32 and packed.shape == ref.shape[:3]
    _np.testing.assert_array_equal(unpack_sbs_np(packed), ref)


def test_writer_accepts_packed_frames(tmp_path):
    """SubclipWriter transparently unpacks packed-uint32 SBS frames."""
    import cv2
    import numpy as _np
    from vr_video_generator_tpu.native import unpack_sbs_np
    from vr_video_generator_tpu.video.writer import SubclipWriter

    rng = _np.random.default_rng(3)
    u8 = rng.integers(0, 255, (4, 32, 64, 3), dtype=_np.uint8)
    packed = (u8[..., 0].astype(_np.uint32)
              | (u8[..., 1].astype(_np.uint32) << 8)
              | (u8[..., 2].astype(_np.uint32) << 16))
    _np.testing.assert_array_equal(unpack_sbs_np(packed), u8)

    w = SubclipWriter(str(tmp_path), fps=10, width=64, height=32,
                      backend="cv2")
    path = w.write_clip(0, list(packed))
    w.close()
    cap = cv2.VideoCapture(path)
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 4
    ok, frame = cap.read()
    assert ok and frame.shape == (32, 64, 3)


def test_full_frame_random_geometry_sweep():
    """Seeded fuzz of the fused warp kernel vs the XLA path across random
    frame geometries, stereo configs, and block sizes — bit-exact, since
    both consume the same precomputed tables."""
    sweep = np.random.default_rng(99)
    for trial in range(6):
        h = int(sweep.integers(40, 100))
        w = int(sweep.integers(80, 170))
        fg = float(sweep.uniform(0.01, 0.04))
        step = int(sweep.integers(1, 4))
        block_rows = int(sweep.choice([8, 16, 32]))
        cfg = StereoConfig(offset_fg=fg, offset_step_size=step).normalized()
        spec = WarpSpec.create(h, w, cfg)
        img = synth_img(sweep, h=h, w=w)
        depth = synth_depth(sweep, h=h, w=w,
                            tmax=float(sweep.uniform(2.0, 10.0)))
        r = spec.frame_offset_range(jnp.asarray(depth))
        tables = build_plane_tables(jnp.asarray(depth), r, cfg, h,
                                    spec.max_planes)
        tag = (f"trial {trial}: h={h} w={w} fg={fg:.4f} step={step} "
               f"block_rows={block_rows}")
        # compositor at a random block size vs the XLA compositor
        st = build_shift_tables(tables, spec.s_neg, spec.s_pos)
        ref_comp, ref_cov = warp_composite_static(
            jnp.asarray(img), jnp.asarray(depth), st, spec.s_neg, spec.s_pos)
        comp, cov = warp_composite_pallas(
            jnp.asarray(img), jnp.asarray(depth), st, spec.s_neg, spec.s_pos,
            block_rows=block_rows, interpret=True)
        np.testing.assert_array_equal(np.asarray(comp), np.asarray(ref_comp),
                                      err_msg=tag)
        np.testing.assert_array_equal(np.asarray(cov), np.asarray(ref_cov),
                                      err_msg=tag)
        # full fused frame (default blocks) vs the XLA frame
        ref = warp_frame(jnp.asarray(img), jnp.asarray(depth), tables,
                         spec.kernel_size, spec.cfg.sigma, impl="xla",
                         s_neg=spec.s_neg, s_pos=spec.s_pos)
        out = warp_frame_pallas(jnp.asarray(img), jnp.asarray(depth), tables,
                                spec.kernel_size, spec.cfg.sigma,
                                spec.s_neg, spec.s_pos, interpret=True)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref),
                                      err_msg=tag)
