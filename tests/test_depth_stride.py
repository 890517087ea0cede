"""Depth-stride production mode: anchored depth + causal interpolation.

Opt-in capability the reference cannot express (its per-frame architecture
recomputes depth for every frame, reference PredictAndGenerate.py:218-231).
Contract under test:

  * anchor frames (the last of each stride group) get their raw depth
    bit-for-bit;
  * in-between frames are an exact linear interpolation of the surrounding
    anchors; group 0 of a cold start holds anchor 0;
  * the anchor carry makes batched processing bit-identical to one long
    batch (no cross-batch lookahead);
  * depth_stride=1 is the untouched parity path;
  * the sharded pipeline runs the identical per-slot semantics.
"""

import jax
import numpy as np
import pytest
import jax.numpy as jnp

from tests.test_pipeline import TINY, H, W
from vr_video_generator_tpu.models.depth_anything_v2 import DepthAnythingV2
from vr_video_generator_tpu.models.factory import random_params
from vr_video_generator_tpu.ops.temporal import TemporalState, stride_interpolate
from vr_video_generator_tpu.pipeline import SbsPipeline
from vr_video_generator_tpu.utils.config import RunConfig


@pytest.fixture(scope="module")
def tiny_model():
    model = DepthAnythingV2(TINY, dtype=jnp.float32)
    return model, random_params(model)


def make_pipeline(tiny_model, stride, batch):
    model, params = tiny_model
    cfg = RunConfig(batch_size=batch, input_size=56, compute_dtype="float32",
                    depth_stride=stride)
    return SbsPipeline(model, params, H, W, run_cfg=cfg)


# ---------------------------------------------------------------- unit level

def test_stride_interpolate_weights_and_anchor_exactness(rng):
    anchors = jnp.asarray(rng.random((3, 4, 5), dtype=np.float32))
    st = TemporalState.initial(4, 5, depth_stride=2)
    st = st._replace(anchor_prev=jnp.asarray(rng.random((4, 5), np.float32)),
                     has_state=jnp.asarray(True))
    depths, last = stride_interpolate(anchors, st, 2)
    assert depths.shape == (6, 4, 5)
    a = np.asarray(anchors)
    prev = np.asarray(st.anchor_prev)
    # odd indices (group ends) are the anchors, bit-for-bit
    np.testing.assert_array_equal(np.asarray(depths)[1::2], a)
    # even indices are the midpoint of (previous anchor, this anchor)
    np.testing.assert_allclose(np.asarray(depths)[0], 0.5 * (prev + a[0]),
                               rtol=0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(depths)[2], 0.5 * (a[0] + a[1]),
                               rtol=0, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(last), a[-1])


def test_stride_interpolate_cold_start_holds_first_anchor(rng):
    anchors = jnp.asarray(rng.random((2, 4, 5), dtype=np.float32))
    st = TemporalState.initial(4, 5, depth_stride=4)
    depths, _ = stride_interpolate(anchors, st, 4)
    a = np.asarray(anchors)
    # group 0: lerp(anchor0, anchor0) = anchor0 for every frame
    for j in range(4):
        np.testing.assert_array_equal(np.asarray(depths)[j], a[0])
    # group 1: proper interpolation toward anchor1
    np.testing.assert_allclose(np.asarray(depths)[5],
                               0.5 * (a[0] + a[1]), rtol=0, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(depths)[7], a[1])


# ------------------------------------------------------------ pipeline level

def test_stride_pipeline_batch_continuity(tiny_model, rng):
    """Two 4-frame batches with carried state == one 8-frame batch."""
    pipe = make_pipeline(tiny_model, stride=2, batch=4)
    frames = rng.integers(0, 256, (8, H, W, 3), dtype=np.uint8)
    full, _ = pipe.step(frames, pipe.initial_state())
    st = pipe.initial_state()
    a, st = pipe.step(frames[:4], st)
    b, _ = pipe.step(frames[4:], st)
    np.testing.assert_array_equal(
        np.asarray(full), np.concatenate([np.asarray(a), np.asarray(b)]))


def test_stride_equals_parity_path_on_static_video(tiny_model, rng):
    """On a static scene every anchor sees the same image, interpolation is
    the identity, and the strided output equals the stride-1 output.

    stride=2 keeps the lerp weights at {0.5, 1.0}, which are exact on equal
    endpoints in f32 (a*0.5 + a*0.5 == a); non-power-of-two weights would
    admit a 1-ulp wobble that could flip a plane-boundary pixel."""
    frame = rng.integers(0, 256, (1, H, W, 3), dtype=np.uint8)
    frames = np.repeat(frame, 8, axis=0)
    parity = make_pipeline(tiny_model, stride=1, batch=8)
    strided = make_pipeline(tiny_model, stride=2, batch=8)
    ref, _ = parity.step(frames, parity.initial_state())
    out, _ = strided.step(frames, strided.initial_state())
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_stride_state_shape_and_validation(tiny_model):
    pipe = make_pipeline(tiny_model, stride=2, batch=4)
    st = pipe.initial_state()
    assert st.anchor_prev.shape == (H, W)
    # parity pipeline carries no anchor
    assert make_pipeline(tiny_model, stride=1, batch=4).initial_state().anchor_prev is None
    with pytest.raises(ValueError, match="divide"):
        make_pipeline(tiny_model, stride=3, batch=4)
    with pytest.raises(ValueError, match=">= 1"):
        make_pipeline(tiny_model, stride=0, batch=4)


# ------------------------------------------------------------- sharded level

def test_sharded_stride_matches_single_device(tiny_model, rng):
    from vr_video_generator_tpu.parallel.mesh import make_mesh
    from vr_video_generator_tpu.parallel.sharded import ShardedSbsPipeline

    model, params = tiny_model
    cfg = RunConfig(batch_size=4, input_size=56, compute_dtype="float32",
                    depth_stride=2)
    mesh = make_mesh((4, 2))
    n_data, b = 4, 4
    sharded = ShardedSbsPipeline(model, params, H, W, mesh, run_cfg=cfg)
    frames = rng.integers(0, 256, (n_data * b, H, W, 3), dtype=np.uint8)
    st = sharded.initial_state()
    assert st.anchor_prev.shape == (n_data, H, W)
    sbs, st = sharded.step(frames, st)
    sbs2, _ = sharded.step(frames, st)
    sbs, sbs2 = np.asarray(sbs), np.asarray(sbs2)

    single = SbsPipeline(model, params, H, W, run_cfg=cfg)
    for slot in range(n_data):
        s = single.initial_state()
        ref, s = single.step(frames[slot * b:(slot + 1) * b], s)
        np.testing.assert_array_equal(sbs[slot * b:(slot + 1) * b],
                                      np.asarray(ref))
        # the per-slot anchor carry survives the sharded state round trip
        ref2, _ = single.step(frames[slot * b:(slot + 1) * b], s)
        np.testing.assert_array_equal(sbs2[slot * b:(slot + 1) * b],
                                      np.asarray(ref2))


def test_stride_primed_state_carries_anchor(tiny_model, rng):
    """Halo warm-up composes with the stride mode: priming on the preceding
    frames puts the carried anchor (and the smoothing state) on the same
    trajectory as processing those frames normally."""
    pipe = make_pipeline(tiny_model, stride=2, batch=4)
    frames = rng.integers(0, 256, (8, H, W, 3), dtype=np.uint8)
    st = pipe.initial_state()
    _, st = pipe.step(frames[:4], st)
    # snapshot before step() consumes (donates) the state buffers
    anchor_after_first = np.asarray(st.anchor_prev).copy()
    ref, _ = pipe.step(frames[4:], st)

    primed = pipe.primed_state(frames[:4], batch_size=4)
    np.testing.assert_array_equal(np.asarray(primed.anchor_prev),
                                  anchor_after_first)
    out, _ = pipe.step(frames[4:], primed)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_sharded_warmup_resets_slot0_to_cold_start(tiny_model, tmp_path):
    """Halo warm-up + stride: a slot with no preceding frames must come out
    of the (globally uniform) warm-up as a true cold start. Its all-pad
    window is a fixed point of the stride-1 smoothing state, but with
    depth_stride > 1 it would prime anchor_prev on frame 0 — diverging from
    the single-chip path, which skips warm-up at begin == 0."""
    from tests.test_video import write_synthetic_video
    from vr_video_generator_tpu.parallel.mesh import make_mesh
    from vr_video_generator_tpu.parallel.sharded import ShardedSbsPipeline
    from vr_video_generator_tpu.runtime.sharded_runner import _primed_states

    model, params = tiny_model
    video = tmp_path / "in.mp4"
    write_synthetic_video(video, 12, h=H, w=W)
    cfg = RunConfig(batch_size=4, input_size=56, compute_dtype="float32",
                    depth_stride=2)
    mesh = make_mesh((2, 1), devices=jax.devices()[:2])
    pipe = ShardedSbsPipeline(model, params, H, W, mesh, run_cfg=cfg)

    states = _primed_states(pipe, [0, 6], str(video), b=4, warmup=4,
                            reader_backend="cv2", multi_host=False,
                            any_preceding=True, global_begins=[0, 6])
    cold = pipe.initial_state()
    # slot 0 (begin == 0): bit-identical to a cold start
    for got, want in zip(jax.tree.leaves(states), jax.tree.leaves(cold)):
        np.testing.assert_array_equal(np.asarray(got)[0], np.asarray(want)[0])
    # slot 1 (begin == 6): genuinely warmed
    assert bool(np.asarray(states.has_state)[1])
    assert np.abs(np.asarray(states.anchor_prev)[1]).max() > 0


# ----------------------------------------------------------------- CLI level

def test_cli_depth_stride_flag():
    from vr_video_generator_tpu.cli import parse_run_config

    cfg, _ = parse_run_config(["--depth_stride", "4"])
    assert cfg.depth_stride == 4
    cfg, _ = parse_run_config([])
    assert cfg.depth_stride == 1


def test_ui_exposes_depth_stride():
    from vr_video_generator_tpu.ui.app import DEFAULT_FIELDS, build_command

    assert DEFAULT_FIELDS["depth_stride"] == "1"
    cmd = build_command(dict(DEFAULT_FIELDS, depth_stride="2"))
    assert "--depth_stride" in cmd and cmd[cmd.index("--depth_stride") + 1] == "2"


# ------------------------------------------------------------- audit level

def test_stride_audit_zero_on_static_video(tiny_model, rng):
    """Identical frames: anchors equal, lerp is the identity -> error at the
    numeric noise floor (XLA doesn't guarantee bitwise row-identical batch
    forwards, so exact 0.0 is not contractual; measured ~1e-11)."""
    pipe = make_pipeline(tiny_model, stride=2, batch=4)
    frames = np.repeat(rng.integers(0, 256, (1, H, W, 3), dtype=np.uint8),
                       4, axis=0)
    rms, mx = pipe.stride_audit(frames, pipe.initial_state())
    assert rms < 1e-8 and mx < 1e-6


def test_stride_audit_detects_motion_and_is_read_only(tiny_model, rng):
    """Changing frames produce a nonzero error; the audit must not perturb
    the state or the step output (it runs before step() in the runtime)."""
    pipe = make_pipeline(tiny_model, stride=2, batch=4)
    frames = rng.integers(0, 256, (4, H, W, 3), dtype=np.uint8)
    ref, _ = pipe.step(frames, pipe.initial_state())

    st = pipe.initial_state()
    rms, mx = pipe.stride_audit(frames, st)
    assert np.isfinite(rms) and np.isfinite(mx)
    assert mx >= rms > 0.0
    out, _ = pipe.step(frames, st)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))

    with pytest.raises(ValueError, match="depth_stride"):
        make_pipeline(tiny_model, stride=1, batch=4).stride_audit(
            frames, pipe.initial_state())


def test_stride_audit_logged_by_segment_runner(tiny_model, tmp_path, rng):
    """--stride_audit_every N: the worker log carries sampled audit lines
    for full batches only (the padded final batch is skipped)."""
    import dataclasses
    import os

    from tests.test_video import write_synthetic_video
    from vr_video_generator_tpu.runtime.segment import process_segment
    from vr_video_generator_tpu.utils.logging import WorkerLog
    from vr_video_generator_tpu.video.reader import VideoReader, probe_video
    from vr_video_generator_tpu.video.writer import SubclipWriter

    video = tmp_path / "in.mp4"
    write_synthetic_video(video, 10, h=H, w=W)  # batches: 4, 4, 2+pad
    model, params = tiny_model
    cfg = RunConfig(batch_size=4, input_size=56, compute_dtype="float32",
                    depth_stride=2, stride_audit_every=2)
    pipe = SbsPipeline(model, params, H, W, run_cfg=cfg)
    log_path = tmp_path / "seg.txt"
    fps, *_ = probe_video(str(video))
    writer = SubclipWriter(str(tmp_path / "out") + os.sep, fps, 2 * W, H,
                           backend="cv2")
    with VideoReader(str(video), begin=0) as reader:
        n = process_segment(pipe, reader, writer, 0, 10, max_frame_count=8,
                            batch_size=4, log=WorkerLog(str(log_path)))
    writer.close()
    assert n == 10
    text = log_path.read_text()
    # every_2 over batches 0,1,2: batch 0 audited, batch 1 skipped (sampling),
    # batch 2 skipped (padded) -> exactly one audit line, for frames [0, 4)
    lines = [ln for ln in text.splitlines() if "stride audit" in ln]
    assert len(lines) == 1
    assert "frames [0, 4)" in lines[0]
    assert "rms=" in lines[0] and "max=" in lines[0]


def test_cli_stride_audit_flag():
    from vr_video_generator_tpu.cli import parse_run_config

    cfg, _ = parse_run_config(["--stride_audit_every", "50"])
    assert cfg.stride_audit_every == 50
    cfg, _ = parse_run_config([])
    assert cfg.stride_audit_every == 0


def test_sharded_stride_audit_matches_single_chip(tiny_model, rng):
    """Per-slot sharded audit == the single-chip audit on that slot's frames
    (same stride_audit_stats math under shard_map)."""
    from vr_video_generator_tpu.parallel.mesh import make_mesh
    from vr_video_generator_tpu.parallel.sharded import ShardedSbsPipeline

    model, params = tiny_model
    cfg = RunConfig(batch_size=4, input_size=56, compute_dtype="float32",
                    depth_stride=2)
    mesh = make_mesh((4, 2))
    sharded = ShardedSbsPipeline(model, params, H, W, mesh, run_cfg=cfg)
    n_data, b = 4, 4
    frames = rng.integers(0, 256, (n_data * b, H, W, 3), dtype=np.uint8)
    stats = sharded.stride_audit(frames, sharded.initial_state())
    assert sorted(stats) == [0, 1, 2, 3]

    single = SbsPipeline(model, params, H, W, run_cfg=cfg)
    for slot in range(n_data):
        rms, mx = single.stride_audit(frames[slot * b:(slot + 1) * b],
                                      single.initial_state())
        s_rms, s_mx = stats[slot]
        np.testing.assert_allclose([s_rms, s_mx], [rms, mx],
                                   rtol=1e-4, atol=1e-6)

    with pytest.raises(ValueError, match="depth_stride"):
        ShardedSbsPipeline(model, params, H, W, mesh,
                           run_cfg=dataclasses_replace(cfg, depth_stride=1)
                           ).stride_audit(frames, None)


def dataclasses_replace(cfg, **kw):
    import dataclasses
    return dataclasses.replace(cfg, **kw)


def test_sharded_runner_logs_stride_audit(tiny_model, tmp_path):
    from tests.test_video import write_synthetic_video
    from vr_video_generator_tpu.parallel.mesh import make_mesh
    from vr_video_generator_tpu.parallel.sharded import ShardedSbsPipeline
    from vr_video_generator_tpu.runtime.sharded_runner import run_sharded
    from vr_video_generator_tpu.utils.logging import WorkerLog

    model, params = tiny_model
    video = tmp_path / "in.mp4"
    write_synthetic_video(video, 16, h=H, w=W)
    cfg = RunConfig(batch_size=4, input_size=56, compute_dtype="float32",
                    depth_stride=2, stride_audit_every=1)
    mesh = make_mesh((2, 1), devices=jax.devices()[:2])
    pipe = ShardedSbsPipeline(model, params, H, W, mesh, run_cfg=cfg)
    log_path = tmp_path / "sharded.txt"
    n = run_sharded(pipe, str(video), str(tmp_path / "sub") + "/", 0, 16,
                    max_frame_count=8, batch_size=4,
                    writer_backend="cv2", log=WorkerLog(str(log_path)))
    assert n == 16
    lines = [ln for ln in log_path.read_text().splitlines()
             if "stride audit" in ln]
    # 2 slots x 2 full steps, audited every step
    assert len(lines) == 4
    assert any("slot 0 frames [0, 4)" in ln for ln in lines)
    assert any("slot 1 frames [8, 12)" in ln for ln in lines)


# ---------------------------------------------- adaptive stride (audit ACTS)

def test_step_audited_matches_parity_output_and_audit_stats(tiny_model, rng):
    """step_audited = the full-depth (stride-1) output PLUS the read-only
    audit's stats, in one program: what the adaptive runtime falls back to
    must be exactly what a per-frame run would have produced, and its
    reported error must be the same signal the observe-only audit logs."""
    frames = rng.integers(0, 256, (8, H, W, 3), dtype=np.uint8)
    strided = make_pipeline(tiny_model, stride=2, batch=8)
    parity = make_pipeline(tiny_model, stride=1, batch=8)
    ref_rms, ref_mx = strided.stride_audit(frames, strided.initial_state())
    ref_sbs, _ = parity.step(frames, parity.initial_state())
    sbs, st, rms, mx = strided.step_audited(frames, strided.initial_state())
    np.testing.assert_array_equal(np.asarray(sbs), np.asarray(ref_sbs))
    assert rms == pytest.approx(ref_rms, abs=1e-6)
    assert mx == pytest.approx(ref_mx, abs=1e-6)
    # the carried anchor stays on the absolute grid: it is the TRUE raw
    # depth of the batch's last frame (an anchor position, since
    # batch % stride == 0), so a later re-raise to stride mode is seamless
    true_last = np.asarray(strided.depth_only(frames))[-1]
    np.testing.assert_allclose(np.asarray(st.anchor_prev), true_last,
                               rtol=0, atol=1e-5)


def test_step_audited_requires_stride(tiny_model):
    with pytest.raises(ValueError, match="depth_stride"):
        make_pipeline(tiny_model, stride=1, batch=4).step_audited(
            np.zeros((4, H, W, 3), np.uint8), None)


def test_cli_adaptive_stride_flags():
    from vr_video_generator_tpu.cli import parse_run_config

    cfg, _ = parse_run_config(["--depth_stride", "2",
                               "--stride_max_rms", "0.25",
                               "--stride_hold", "3"])
    assert cfg.stride_max_rms == 0.25
    assert cfg.stride_hold == 3
    cfg, _ = parse_run_config([])
    assert cfg.stride_max_rms == 0.0  # fixed stride: audit observes only
    assert cfg.stride_hold == 4


def test_adaptive_stride_drops_and_reraises_and_renders_clean(
        tiny_model, tmp_path):
    """The VERDICT r3 'self-protecting stride' contract, end to end: a
    synthetic fast-pan section that diverges under a fixed stride renders
    CLEAN under adaptive mode (bit-equal to a full per-frame run), with the
    drop-to-full-depth and re-raise transitions visible in the worker log.

    Layout (batch 4, stride 2, probe every 2nd batch, hold 2):
      batches 0-1  static scene A   probe b0 passes; b1 runs strided (exact
                                    on a static scene)
      batches 2-3  per-frame noise  probe b2 trips the threshold -> full
      ("fast pan")                  depth; b3 stays full (mode_full)
      batches 4-7  static scene B   b4 still errs (anchor carries motion
                                    depth), b5-b6 subside -> re-raise at b6;
                                    b7 runs strided (exact again)
    Every motion batch therefore renders at full fidelity, and the strided
    batches are exact-on-static, so the WHOLE adaptive output is bit-equal
    to the stride-1 parity run — while the fixed-stride run diverges."""
    import os

    import cv2

    from vr_video_generator_tpu.runtime.segment import process_segment
    from vr_video_generator_tpu.utils.logging import WorkerLog
    from vr_video_generator_tpu.video.combine import sorted_subclips
    from vr_video_generator_tpu.video.reader import VideoReader, probe_video
    from vr_video_generator_tpu.video.writer import SubclipWriter

    rng = np.random.default_rng(11)
    static_a = rng.integers(0, 256, (H, W, 3), dtype=np.uint8)
    static_b = rng.integers(0, 256, (H, W, 3), dtype=np.uint8)
    frames = np.concatenate([
        np.repeat(static_a[None], 8, axis=0),
        rng.integers(0, 256, (8, H, W, 3), dtype=np.uint8),
        np.repeat(static_b[None], 16, axis=0),
    ])
    # FFV1 (lossless): mp4v would re-quantize the "static" sections into
    # slightly different frames per GOP position, breaking the exact-on-
    # static property the strided batches rely on
    video = tmp_path / "in.avi"
    wr = cv2.VideoWriter(str(video), cv2.VideoWriter_fourcc(*"FFV1"),
                         10.0, (W, H))
    assert wr.isOpened()
    for f in frames:
        wr.write(f[:, :, ::-1])
    wr.release()
    with VideoReader(str(video), begin=0) as r:
        dec = np.stack([f for f in r.frames(0, 32)])
    # FFV1 is lossless: the static sections decode bit-for-bit static
    for lo, hi in [(0, 8), (16, 32)]:
        assert (dec[lo:hi] == dec[lo]).all()

    # Rescale the tiny random model's depth (~[0, 0.5)) into the production
    # range (~[0, 14], utils/config.DEPTH_SCALERS comment): sub-plane depth
    # would be quantized away by the warp's integer plane assignment and
    # neither run could diverge visibly. Params are scaler-independent.
    model, params = tiny_model
    model = DepthAnythingV2(
        dataclasses_replace(model.cfg, depth_scaler=30.0), dtype=model.dtype)

    def run(cfg, out_dir, log_path=None):
        pipe = SbsPipeline(model, params, H, W, run_cfg=cfg)
        fps, *_ = probe_video(str(video))
        writer = SubclipWriter(str(out_dir) + os.sep, fps, 2 * W, H,
                               backend="cv2")
        log = WorkerLog(str(log_path)) if log_path else None
        with VideoReader(str(video), begin=0) as reader:
            n = process_segment(pipe, reader, writer, 0, 32,
                                max_frame_count=8, batch_size=4, log=log)
        writer.close()
        assert n == 32
        return pipe

    # pick the threshold from the two regimes, measured with the read-only
    # audit exactly as the probes will see them (post-decode frames, anchor
    # carried from the previous batch's last frame). Magnified stereo
    # offsets: at H=56 the production defaults map the whole 14-unit depth
    # range to ~1.4 px of shift, so unit-scale lerp errors quantize to the
    # SAME integer plane and no stride could ever diverge visibly; 10x
    # offsets make ~1 depth unit ~ 1 plane, the shape of a production-size
    # frame.
    base = RunConfig(batch_size=4, input_size=56, compute_dtype="float32",
                     depth_stride=2, offset_fg=0.25, offset_bg=-0.1)
    probe_pipe = SbsPipeline(model, params, H, W, run_cfg=base)

    def regime_rms(anchor_frame, batch):
        st = probe_pipe.initial_state()._replace(
            anchor_prev=probe_pipe.depth_only(anchor_frame[None])[0],
            has_state=jnp.asarray(True))
        return probe_pipe.stride_audit(batch, st)[0]

    rms_motion = regime_rms(dec[7], dec[8:12])     # what probe b2 sees
    rms_static = regime_rms(dec[19], dec[20:24])   # what probe b5 sees
    assert rms_motion > 10 * max(rms_static, 1e-9), \
        "test premise: the fast-pan section must dominate the static one"
    threshold = float(np.sqrt(max(rms_static, 1e-12) * rms_motion))

    import dataclasses
    adaptive_cfg = dataclasses.replace(base, stride_max_rms=threshold,
                                       stride_audit_every=2, stride_hold=2)
    log_path = tmp_path / "adaptive.txt"
    run(adaptive_cfg, tmp_path / "adaptive", log_path)
    run(dataclasses.replace(base, depth_stride=1), tmp_path / "parity")
    run(base, tmp_path / "fixed")

    # 1. the adaptation is visible in the worker log, at the right frames
    text = log_path.read_text()
    drops = [ln for ln in text.splitlines() if "dropped to full depth" in ln]
    raises_ = [ln for ln in text.splitlines() if "re-raised to stride" in ln]
    assert len(drops) == 1 and "at frame 8" in drops[0]
    assert len(raises_) == 1 and "stride 2" in raises_[0]

    def decode_dir(d):
        out = []
        for name in sorted_subclips(str(d) + os.sep):
            cap = cv2.VideoCapture(os.path.join(str(d), name))
            while True:
                ok, f = cap.read()
                if not ok:
                    break
                out.append(f)
        return np.stack(out)

    adaptive = decode_dir(tmp_path / "adaptive")
    parity = decode_dir(tmp_path / "parity")
    fixed = decode_dir(tmp_path / "fixed")
    assert adaptive.shape == parity.shape == fixed.shape == (32, H, 2 * W, 3)
    # 2. the fixed stride DOES diverge on the fast-pan section ...
    assert (fixed[8:16] != parity[8:16]).any()
    # 3. ... and the adaptive run renders the whole video clean
    np.testing.assert_array_equal(adaptive, parity)
