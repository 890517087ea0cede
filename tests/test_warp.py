"""Stereo-core parity tests: JAX warp vs the numpy oracle port of the
reference algorithm (PredictAndGenerate.py:63-198)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.oracle.warp_oracle import OracleSbs
from vr_video_generator_tpu.ops.gaussian import gaussian_blur_u8
from vr_video_generator_tpu.ops.temporal import TemporalState, temporal_scan
from vr_video_generator_tpu.ops.warp import WarpSpec, build_plane_tables
from vr_video_generator_tpu.utils.config import StereoConfig

H, W = 72, 128


def synth_depth(rng, h=H, w=W, tmax=9.0):
    """Smooth synthetic depth field in [0, tmax] (vits-like range)."""
    base = rng.random((h // 8, w // 8))
    import cv2
    d = cv2.resize(base, (w, h), interpolation=cv2.INTER_CUBIC)
    d = (d - d.min()) / max(d.max() - d.min(), 1e-6) * tmax
    return d.astype(np.float32)


def synth_img(rng, h=H, w=W):
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


def test_gaussian_blur_matches_torchvision(rng):
    try:
        from torchvision.transforms.v2.functional import gaussian_blur as tv_blur
    except ImportError:
        pytest.skip("torchvision not installed; oracle path covers semantics")
    import torch
    img = synth_img(rng)
    ours = np.asarray(gaussian_blur_u8(jnp.asarray(img), (9, 7), 3.0))
    ref = tv_blur(torch.from_numpy(img).permute(2, 0, 1), [9, 7],
                  sigma=3.0).permute(1, 2, 0).numpy()
    assert np.array_equal(ours, ref)


def test_gaussian_blur_matches_oracle(rng):
    img = synth_img(rng)
    ours = np.asarray(gaussian_blur_u8(jnp.asarray(img), (9, 7), 3.0))
    ref = OracleSbs().gaussian_blur_u8(img, 9, 7)
    # float32 vs float64 conv accumulation can flip round-to-nearest by 1
    assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 1


def test_plane_tables_match_oracle(rng):
    cfg = StereoConfig().normalized()
    oracle = OracleSbs()
    spec = WarpSpec.create(H, W, cfg)
    depth = synth_depth(rng)

    cutoff_list, offset_range, step_list, limit_step, offset_x_list = \
        oracle.get_cutoff(depth)

    r = spec.frame_offset_range(jnp.asarray(depth))  # first frame: no EWMA
    tables = jax.jit(
        lambda d, r: build_plane_tables(d, r, cfg, H, spec.max_planes)
    )(jnp.asarray(depth), r)

    n_full = len(cutoff_list)
    assert n_full <= spec.max_planes
    np.testing.assert_allclose(np.asarray(tables.cutoffs)[:n_full],
                               cutoff_list, rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(tables.offsets)[:n_full],
                                  offset_x_list)
    assert np.asarray(tables.plane_valid)[:n_full - 1].all()
    assert not np.asarray(tables.plane_valid)[n_full - 1:].any()
    assert int(tables.fill_offset) == offset_x_list[int(n_full * 3 / 5)]
    assert int(tables.edge_width) == round(offset_x_list[n_full - 2] / 3 * 2)


def _run_jax_sequence(imgs, depths, cfg):
    spec = WarpSpec.create(imgs.shape[1], imgs.shape[2], cfg)
    state = TemporalState.initial(imgs.shape[1], imgs.shape[2])
    blended, ranges, state = temporal_scan(jnp.asarray(depths), state, spec)
    warp = jax.jit(jax.vmap(spec.warp))
    return np.asarray(warp(jnp.asarray(imgs), blended, ranges)), state


def test_warp_sequence_matches_oracle(rng):
    """3-frame sequence: exercises temporal smoothing, offset-range EWMA,
    plane compositing, hole fill + blur, edge copy, SBS concat."""
    cfg = StereoConfig().normalized()
    oracle = OracleSbs()
    imgs = np.stack([synth_img(rng) for _ in range(3)])
    depths = np.stack([synth_depth(rng, tmax=6.0 + 2 * i) for i in range(3)])

    ref = np.stack([oracle.process(imgs[i], depths[i]) for i in range(3)])
    ours, _ = _run_jax_sequence(imgs, depths, cfg)

    assert ours.shape == ref.shape == (3, H, 2 * W, 3)
    # Band-boundary pixels may flip under f32-vs-f64 threshold math; demand
    # near-total exactness and small magnitude elsewhere.
    mismatch = (ours != ref).any(axis=-1).mean()
    assert mismatch < 5e-3, f"pixel mismatch fraction {mismatch}"
    assert np.abs(ours.astype(int) - ref.astype(int)).mean() < 0.5


def test_warp_right_half_is_original(rng):
    cfg = StereoConfig().normalized()
    imgs = synth_img(rng)[None]
    depths = synth_depth(rng)[None]
    ours, _ = _run_jax_sequence(imgs, depths, cfg)
    np.testing.assert_array_equal(ours[0, :, W:], imgs[0])


def test_temporal_state_carries_across_batches(rng):
    """Splitting a 4-frame sequence into 2+2 batches with carried state must
    equal the single-batch result (the reference's per-segment state, but
    without its batch boundaries)."""
    cfg = StereoConfig().normalized()
    imgs = np.stack([synth_img(rng) for _ in range(4)])
    depths = np.stack([synth_depth(rng, tmax=5.0 + i) for i in range(4)])

    full, _ = _run_jax_sequence(imgs, depths, cfg)

    spec = WarpSpec.create(H, W, cfg)
    state = TemporalState.initial(H, W)
    outs = []
    warp = jax.jit(jax.vmap(spec.warp))
    for lo in (0, 2):
        blended, ranges, state = temporal_scan(
            jnp.asarray(depths[lo:lo + 2]), state, spec)
        outs.append(np.asarray(warp(jnp.asarray(imgs[lo:lo + 2]), blended, ranges)))
    np.testing.assert_array_equal(np.concatenate(outs), full)


@pytest.mark.parametrize("kwargs", [
    dict(offset_step_size=2),                       # BASELINE config 1
    dict(offset_fg=0.04, offset_bg=-0.02),          # wider disparity range
    dict(offset_fg=0.012, offset_bg=-0.004),        # narrow range
    dict(offset_step_size=3),                       # odd coarse step
    dict(offset_step_size=4, offset_fg=0.03),       # coarsest practical step
    dict(offset_bg=0.0),                            # zero-background edge
])
def test_warp_sequence_matches_oracle_configs(rng, kwargs):
    cfg = StereoConfig(**kwargs).normalized()
    oracle = OracleSbs(offset_fg=cfg.offset_fg, offset_bg=cfg.offset_bg,
                       offset_step_size=cfg.offset_step_size)
    imgs = np.stack([synth_img(rng) for _ in range(2)])
    depths = np.stack([synth_depth(rng, tmax=5.0 + 3 * i) for i in range(2)])
    ref = np.stack([oracle.process(imgs[i], depths[i]) for i in range(2)])
    ours, _ = _run_jax_sequence(imgs, depths, cfg)
    mismatch = (ours != ref).any(axis=-1).mean()
    assert mismatch < 5e-3, f"pixel mismatch fraction {mismatch}"


def test_warp_flat_depth(rng):
    """Degenerate depth (all one plane) must not crash or NaN."""
    cfg = StereoConfig().normalized()
    imgs = synth_img(rng)[None]
    depths = np.full((1, H, W), 4.2, np.float32)
    ours, _ = _run_jax_sequence(imgs, depths, cfg)
    oracle = OracleSbs()
    ref = oracle.process(imgs[0], depths[0])
    mismatch = (ours[0] != ref).any(axis=-1).mean()
    assert mismatch < 5e-3


def test_depth_under_cap_no_overflow(rng):
    """Depth just below limit_step_cap: untouched, overflow counter stays 0."""
    cfg = StereoConfig().normalized()
    spec = WarpSpec.create(H, W, cfg)
    depths = np.stack([synth_depth(rng, tmax=cfg.limit_step_cap - 0.5)
                       for _ in range(2)])
    state = TemporalState.initial(H, W)
    blended, _, state = temporal_scan(jnp.asarray(depths), state, spec)
    assert int(state.overflow) == 0
    w0, w1, w2 = cfg.dampening_weights
    expect0 = (w0 + w1 + w2) * depths[0]
    np.testing.assert_allclose(np.asarray(blended[0]), expect0, rtol=1e-5)


def test_depth_over_cap_clamps_and_counts(rng):
    """Depth above the cap is saturated (== running the clamped depth) and
    every affected frame is counted — no silent OOB table indexing
    (reference's cutoff_list is unbounded, PredictAndGenerate.py:101-118)."""
    cfg = StereoConfig().normalized()
    cap = float(cfg.limit_step_cap)
    imgs = np.stack([synth_img(rng) for _ in range(3)])
    depths = np.stack([synth_depth(rng, tmax=t) for t in (cap + 8, 5.0, cap + 20)])

    ours, state = _run_jax_sequence(imgs, depths, cfg)
    assert int(state.overflow) == 2
    clamped, state2 = _run_jax_sequence(imgs, np.minimum(depths, cap), cfg)
    np.testing.assert_array_equal(ours, clamped)
    assert int(state2.overflow) == 0
    # outputs stay sane: right half is always the original
    np.testing.assert_array_equal(ours[:, :, W:], imgs)


def test_overflow_counter_masks_padding_frames(rng):
    """``n_valid``: host runtimes pad short batches by repeating the last
    frame; those copies must not inflate the overflow diagnostic, and the
    mask must not change the computed output."""
    cfg = StereoConfig().normalized()
    spec = WarpSpec.create(H, W, cfg)
    cap = float(cfg.limit_step_cap)
    depths = np.stack([synth_depth(rng, tmax=cap + 8)] * 4)  # all over cap
    state = TemporalState.initial(H, W)
    blended, ranges, st = temporal_scan(jnp.asarray(depths), state, spec,
                                        n_valid=2)
    assert int(st.overflow) == 2  # only the 2 real frames count
    b2, r2, st2 = temporal_scan(jnp.asarray(depths),
                                TemporalState.initial(H, W), spec)
    assert int(st2.overflow) == 4  # None = every frame is real
    np.testing.assert_array_equal(np.asarray(blended), np.asarray(b2))
    np.testing.assert_array_equal(np.asarray(ranges), np.asarray(r2))


def test_plane_tables_oversized_inputs_saturate(rng):
    """Direct build_plane_tables with over-cap depth/offset_range must yield
    the same (in-bounds) tables as cap-saturated inputs."""
    cfg = StereoConfig().normalized()
    spec = WarpSpec.create(H, W, cfg)
    cap = float(cfg.limit_step_cap)
    depth = synth_depth(rng, tmax=cap + 16.0)
    big_ls = np.ceil(depth.max())
    rng_pair = jnp.asarray([cfg.offset_bg * H * big_ls / 14.0,
                            cfg.offset_fg * H * big_ls / 14.0], jnp.float32)
    t_over = build_plane_tables(jnp.asarray(depth), rng_pair, cfg, H,
                                spec.max_planes)

    d_cap = np.minimum(depth, cap)
    rng_cap = jnp.asarray([cfg.offset_bg * H * cap / 14.0,
                           cfg.offset_fg * H * cap / 14.0], jnp.float32)
    t_cap = build_plane_tables(jnp.asarray(d_cap), rng_cap, cfg, H,
                               spec.max_planes)
    np.testing.assert_array_equal(np.asarray(t_over.cutoffs),
                                  np.asarray(t_cap.cutoffs))
    np.testing.assert_array_equal(np.asarray(t_over.offsets),
                                  np.asarray(t_cap.offsets))
    assert int(np.asarray(t_over.plane_valid).sum()) < spec.max_planes
    # offsets stay inside the static shift bounds used by the compositors
    offs = np.asarray(t_over.offsets)
    assert offs.min() >= -spec.s_neg and offs.max() <= spec.s_pos


def test_warp_zero_depth(rng):
    """All-zero depth (black frame path) — reference would hit ls=0."""
    cfg = StereoConfig().normalized()
    imgs = synth_img(rng)[None]
    depths = np.zeros((1, H, W), np.float32)
    ours, _ = _run_jax_sequence(imgs, depths, cfg)
    assert ours.dtype == np.uint8
    np.testing.assert_array_equal(ours[0, :, W:], imgs[0])


def test_warp_random_config_sweep():
    """Seeded randomized sweep over the stereo config space: random
    disparity offsets, plane steps, depth magnitudes, and odd frame
    geometries, each compared per-pixel against the oracle. Catches table
    construction bugs the hand-picked configs above might straddle."""
    sweep = np.random.default_rng(20260818)
    for trial in range(8):
        h = int(sweep.integers(48, 96))
        w = int(sweep.integers(96, 160))
        fg = float(sweep.uniform(0.008, 0.045))
        bg = float(sweep.uniform(-0.025, min(0.008, fg - 1e-3)))
        step = int(sweep.integers(1, 5))
        tmax = float(sweep.uniform(2.0, 12.0))
        cfg = StereoConfig(offset_fg=fg, offset_bg=bg,
                           offset_step_size=step).normalized()
        oracle = OracleSbs(offset_fg=cfg.offset_fg, offset_bg=cfg.offset_bg,
                           offset_step_size=cfg.offset_step_size)
        imgs = np.stack([synth_img(sweep, h=h, w=w) for _ in range(2)])
        depths = np.stack([synth_depth(sweep, h=h, w=w, tmax=tmax + i)
                           for i in range(2)])
        ref = np.stack([oracle.process(imgs[i], depths[i]) for i in range(2)])
        ours, _ = _run_jax_sequence(imgs, depths, cfg)
        assert ours.shape == ref.shape == (2, h, 2 * w, 3), trial
        mismatch = (ours != ref).any(axis=-1).mean()
        assert mismatch < 5e-3, (
            f"trial {trial} (h={h} w={w} fg={fg:.4f} bg={bg:.4f} "
            f"step={step} tmax={tmax:.2f}): mismatch {mismatch}")
        assert np.abs(ours.astype(int) - ref.astype(int)).mean() < 0.5, trial


def test_warp_random_dampening_sweep():
    """Seeded fuzz over the temporal-dampening knobs (ratio / initial
    value — count stays at the reference's 2, which the jax scan encodes
    structurally): 3-frame sequences vs the oracle with matching weights."""
    sweep = np.random.default_rng(606)
    for trial in range(4):
        init_w = float(sweep.uniform(0.05, 0.6))
        ratio = float(sweep.uniform(0.1, 0.9))
        cfg = StereoConfig(depth_dampening_initial_value=init_w,
                           depth_dampening_ratio=ratio).normalized()
        oracle = OracleSbs(dampening_init=init_w, dampening_ratio=ratio)
        imgs = np.stack([synth_img(sweep) for _ in range(3)])
        depths = np.stack([synth_depth(sweep, tmax=4.0 + 2 * i)
                           for i in range(3)])
        ref = np.stack([oracle.process(imgs[i], depths[i])
                        for i in range(3)])
        ours, _ = _run_jax_sequence(imgs, depths, cfg)
        mismatch = (ours != ref).any(axis=-1).mean()
        assert mismatch < 5e-3, (
            f"trial {trial} (init={init_w:.3f} ratio={ratio:.3f}): "
            f"mismatch {mismatch}")
