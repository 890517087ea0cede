from vr_video_generator_tpu.utils.config import (
    DEPTH_SCALERS,
    ModelConfig,
    RunConfig,
    StereoConfig,
)

__all__ = ["DEPTH_SCALERS", "ModelConfig", "RunConfig", "StereoConfig"]
